"""Multimodal columns — opaque binary payloads with typed metadata
(training-data-pipeline operator, beyond the reference surface).

A 100 TB multimodal corpus carries image/audio/video as ``binary`` columns
next to typed metadata; the engine's job is the Spark-side plumbing —
schema, Arrow-batched UDF shape, partition-friendly feature extraction —
while the actual codec work belongs to libraries (PIL/ffmpeg/torchaudio)
that are NOT in this container.  The decode step is therefore STUBBED:
:func:`decode_payload` raises ``NotImplementedError`` unless a decoder is
importable, and :func:`extract_features` uses a deterministic fake
derived from the raw bytes — so the distributed pipeline (mapInPandas over
binary Arrow batches) is real and tested end-to-end, and swapping in a real
decoder changes one function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MODALITIES = ["image", "audio", "video"]


def attach_binary_payload(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Simulate a multimodal lake table: (doc_id, modality, payload binary,
    meta struct).  Payload bytes are the UTF-8 text (a deterministic stand-in
    for real media bytes); modality cycles by id."""
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]),
        (F.col(id_col) % len(MODALITIES) + 1).cast("int"),
    )
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        modality.alias("modality"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("n_bytes"),
            F.lit("synthetic/v1").alias("codec"),
        ).alias("meta"),
    )


def decode_payload(payload: bytes, modality: str):
    """Decode a media payload — STUB.

    Real decoders (PIL, soundfile, av) are not available in this
    environment; when they are, this is the single function to replace.
    """
    try:  # pragma: no cover - decoders absent in this container
        if modality == "image":
            import PIL.Image  # noqa: F401
        elif modality == "audio":
            import soundfile  # noqa: F401
        else:
            import av  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            f"no {modality} decoder available in this environment"
        ) from exc
    raise NotImplementedError("real decode not wired yet")


def _fake_dims(n_bytes: int, modality: str) -> tuple[int, int]:
    """Deterministic stand-in for decoded dimensions (width/height for
    image & video; sample-rate/n-frames for audio) derived from the byte
    length — mirrored exactly by the SQL oracle."""
    if modality == "audio":
        return 16000, n_bytes * 251 % 99991
    return 64 + n_bytes % 577, 64 + (n_bytes * 31) % 577


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("sha256", StringType()),
        StructField("dim_1", IntegerType()),
        StructField("dim_2", IntegerType()),
    ]
)


def extract_features(payloads: DataFrame) -> DataFrame:
    """Per-payload feature extraction via ``mapInPandas`` over Arrow batches
    of raw binary — the real distributed shape of a decode/featurize stage
    (one Python worker per partition, zero driver involvement).

    Features: byte length, content sha256, and the (stubbed) decoded
    dimensions; a real deployment swaps :func:`_fake_dims` for
    :func:`decode_payload` output.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payload = pdf["payload"]
            n_bytes = payload.map(len)
            dims = [
                _fake_dims(n, m) for n, m in zip(n_bytes, pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": n_bytes.astype("int32"),
                    "sha256": payload.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                    "dim_1": pd.Series([d[0] for d in dims], dtype="int32"),
                    "dim_2": pd.Series([d[1] for d in dims], dtype="int32"),
                }
            )

    return payloads.select("doc_id", "modality", "payload").mapInPandas(
        batches, schema=FEATURE_SCHEMA
    )
