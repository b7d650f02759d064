"""Multimodal decode-stats pipelines.

Split from the former plans/queries.py (round 9) — pure rearrangement,
every definition verbatim; registry order pinned in ``_registry``.
"""

from __future__ import annotations
import os
from collections.abc import Callable
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from datalake_indexes_spark.index.builder import build_index, with_global_row_number
from datalake_indexes_spark.index.lake_index import LakeIndex
from datalake_indexes_spark.operators.cocoa import COCOA, is_numeric_flags
from datalake_indexes_spark.operators.duplicates import DuplicateDetection
from datalake_indexes_spark.operators.mate import MATE
from datalake_indexes_spark.plans import oracle
from datalake_indexes_spark.functions.text import tokenize_col
from datalake_indexes_spark.sources.catalog import ALL_TABLE_NAMES, TESTDATA_LAKE_SPEC

from datalake_indexes_spark.plans.queries._base import _docs

def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-container metadata extraction: the planted PNG tEXt provenance
    chunk parsed back out (JPEG EXIF shares the dispatch, unit-pinned)."""
    from datalake_indexes_spark.operators.multimodal import (
        attach_binary_payload,
        extract_metadata,
    )

    return extract_metadata(attach_binary_payload(_docs(spark, sf_dir)))


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datalake_indexes_spark.operators.multimodal import (
        attach_binary_payload,
        extract_features,
    )

    return extract_features(attach_binary_payload(_docs(spark, sf_dir)))


def q_multimodal_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel decode end-to-end: every doc gets a genuine 16x4 PNG
    (valid zlib stored-deflate IDAT) whose pixels are its first 64 text
    bytes — GRAYSCALE for most docs, color-type-3 PALETTE (identity
    grayscale PLTE) for every ``doc_id % 4 == 0``, so the driver grades
    BOTH decoder paths (unfilter and PLTE lookup); the engine inflates +
    unfilters with the pure stdlib :func:`multimodal.decode_png` and
    reports per-image pixel stats.  The DuckDB twin recomputes the stats
    straight from ``text`` (palette rows: same bytes, channel count
    tripled) — if the decoder misreads a single byte, the hash fails."""
    from datalake_indexes_spark.operators.multimodal import (
        attach_real_png,
        image_pixel_stats,
    )

    docs = _docs(spark, sf_dir)
    gray = attach_real_png(docs.filter(F.col("doc_id") % 4 != 0))
    pal = attach_real_png(docs.filter(F.col("doc_id") % 4 == 0), palette=True)
    return image_pixel_stats(gray.unionByName(pal))


def q_multimodal_jpeg_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG decode end-to-end: every doc gets a genuine baseline
    JPEG (Huffman entropy coding, DQT/DHT/SOF0/SOS framing) whose 64
    flat 8x8 tiles are its first 64 text bytes; the engine Huffman-
    decodes, dequantizes and runs the IDCT with the pure stdlib+numpy
    :func:`multimodal.decode_jpeg` — flat tiles decode BIT-EXACTLY, so
    the DuckDB twin recomputes the stats straight from ``text``."""
    from datalake_indexes_spark.operators.multimodal import (
        attach_real_jpeg,
        image_pixel_stats,
    )

    return image_pixel_stats(attach_real_jpeg(_docs(spark, sf_dir)))


def q_multimodal_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode end-to-end: every doc gets a genuine MJPEG AVI
    (4 baseline-JPEG frames of flat tiles carrying its first 64 text
    bytes); the engine demuxes the movi chunks, Huffman-decodes + IDCTs
    each frame, and folds per-frame partials natively.  Flat tiles
    decode bit-exactly, so the DuckDB twin recomputes from ``text``."""
    from datalake_indexes_spark.operators.multimodal import (
        attach_real_mjpeg,
        video_frame_stats,
    )

    return video_frame_stats(attach_real_mjpeg(_docs(spark, sf_dir)))


def q_multimodal_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PCM sample decode end-to-end: every doc gets a genuine 16-bit
    mono WAV whose data chunk is its text bytes; the engine unpacks the
    frames with the pure stdlib :func:`multimodal.decode_wav` and reports
    amplitude stats the DuckDB twin recomputes from byte pairs of
    ``text`` — one IEEE division for the mean, no rounding."""
    from datalake_indexes_spark.operators.multimodal import (
        attach_real_wav,
        audio_sample_stats,
    )

    return audio_sample_stats(attach_real_wav(_docs(spark, sf_dir)))


def q_multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Waveform features (rms / mean-crossing rate / peak-to-peak)
    through the real stdlib PCM decode; the twin replays the samples
    from byte pairs of the planted text."""
    from datalake_indexes_spark.operators.multimodal import (
        attach_real_wav,
        audio_waveform_features,
    )

    return audio_waveform_features(attach_real_wav(_docs(spark, sf_dir)))



def q_multimodal_cmyk_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL 4-component Adobe CMYK decode end-to-end (round 9): every
    doc gets a genuine interleaved 4-component baseline JPEG (APP14
    transform 0) whose flat tiles derive all four channels from its
    first 64 text bytes; the engine entropy-decodes all four planes
    with :func:`multimodal.decode_jpeg` — transform 0 applies no color
    math, so each channel is bit-exact and the DuckDB twin recomputes
    the per-channel means straight from ``text``."""
    from datalake_indexes_spark.operators.multimodal import (
        attach_real_cmyk,
        cmyk_channel_stats,
    )

    return cmyk_channel_stats(attach_real_cmyk(_docs(spark, sf_dir)))
