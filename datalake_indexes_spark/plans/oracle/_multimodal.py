"""Multimodal decode-stats oracle twins.

Split from the former plans/oracle.py (round 9) — pure rearrangement,
every definition verbatim.  Import surface unchanged via the package
``__init__``.
"""

from __future__ import annotations
from datalake_indexes_spark.functions.text import NULLISH_TOKENS, tokenize_sql
from datalake_indexes_spark.sources.catalog import TESTDATA_LAKE_SPEC, LakeTableSpec


def multimodal_pixel_stats_sql() -> str:
    """Twin of ``image_pixel_stats`` over the planted PNGs — grayscale
    for most docs, color-type-3 palette (identity grayscale PLTE) for
    ``doc_id % 4 == 0``.  The engine inflates and unfilters a REAL PNG
    IDAT (and walks the PLTE lookup on palette rows); the oracle
    recomputes the stats straight from the planted pixel source (first
    64 printable-ASCII text chars, space-padded) — palette rows carry
    the SAME bytes tripled across RGB, so n_px gains a x3 and min/max/
    mean are unchanged.  The mean is sum/64 — a dyadic quotient, exact
    on both engines with no rounding step."""
    from datalake_indexes_spark.operators.multimodal import REAL_PNG_H, REAL_PNG_W

    n = REAL_PNG_W * REAL_PNG_H
    return f"""
WITH s AS (
  SELECT doc_id,
         rpad(regexp_replace(coalesce(text, ''), '[^\\x20-\\x7E]', ' ', 'g'),
              {n}, ' ') AS px,
         CASE WHEN doc_id % 4 = 0 THEN 3 ELSE 1 END AS nch
  FROM documents
),
b AS (
  SELECT doc_id, ord(c) AS v
  FROM (SELECT doc_id, unnest(string_split(px, '')) AS c FROM s)
)
SELECT b.doc_id,
       CAST({REAL_PNG_W} AS INT) AS width,
       CAST({REAL_PNG_H} AS INT) AS height,
       CAST({n} * s.nch AS INT) AS n_px,
       CAST(min(v) AS INT) AS px_min,
       CAST(max(v) AS INT) AS px_max,
       CAST(sum(v) AS DOUBLE) / {n} AS px_mean
FROM b JOIN s USING (doc_id) GROUP BY b.doc_id, s.nch
"""


def multimodal_jpeg_pixel_stats_sql() -> str:
    """Twin of ``image_pixel_stats(attach_real_jpeg(documents))`` — the
    engine Huffman-decodes + IDCTs a REAL baseline JPEG whose 64 flat
    8x8 tiles are the first 64 printable-ASCII text chars; flat tiles
    decode bit-exactly, so the oracle recomputes the stats straight
    from ``text``.  Each byte fills a 64-px tile: px_sum = 64·Σv and
    the mean (64·Σv)/4096 is a dyadic quotient — exact on both
    engines, no rounding step."""
    from datalake_indexes_spark.operators.multimodal import (
        JPEG_TILES_H,
        JPEG_TILES_W,
    )

    n_tiles = JPEG_TILES_W * JPEG_TILES_H
    w, h = JPEG_TILES_W * 8, JPEG_TILES_H * 8
    n_px = w * h
    return f"""
WITH s AS (
  SELECT doc_id,
         rpad(regexp_replace(coalesce(text, ''), '[^\\x20-\\x7E]', ' ', 'g'),
              {n_tiles}, ' ') AS px
  FROM documents
),
b AS (
  SELECT doc_id, ord(c) AS v
  FROM (SELECT doc_id, unnest(string_split(px, '')) AS c FROM s)
)
SELECT doc_id,
       CAST({w} AS INT) AS width,
       CAST({h} AS INT) AS height,
       CAST({n_px} AS INT) AS n_px,
       CAST(min(v) AS INT) AS px_min,
       CAST(max(v) AS INT) AS px_max,
       CAST(sum(v) * 64 AS DOUBLE) / {n_px} AS px_mean
FROM b GROUP BY doc_id
"""


def multimodal_frame_stats_sql() -> str:
    """Twin of ``video_frame_stats(attach_real_mjpeg(documents))`` — the
    engine demuxes a REAL MJPEG AVI and JPEG-decodes every frame; flat
    tiles decode bit-exactly, so the oracle recomputes from ``text``.
    64 tiles across 4 frames, 64 px per tile: n_px = 4096 and the mean
    (64·Σv)/4096 is dyadic — exact on both engines."""
    from datalake_indexes_spark.operators.multimodal import (
        MJPEG_FRAMES,
        MJPEG_TILES,
    )

    n_tiles = MJPEG_FRAMES * MJPEG_TILES * MJPEG_TILES
    n_px = n_tiles * 64
    return f"""
WITH s AS (
  SELECT doc_id,
         rpad(regexp_replace(coalesce(text, ''), '[^\\x20-\\x7E]', ' ', 'g'),
              {n_tiles}, ' ') AS px
  FROM documents
),
b AS (
  SELECT doc_id, ord(c) AS v
  FROM (SELECT doc_id, unnest(string_split(px, '')) AS c FROM s)
)
SELECT doc_id,
       CAST({MJPEG_FRAMES} AS BIGINT) AS n_frames,
       CAST({n_px} AS BIGINT) AS n_px,
       CAST(min(v) AS INT) AS px_min,
       CAST(max(v) AS INT) AS px_max,
       CAST(sum(v) * 64 AS DOUBLE) / {n_px} AS px_mean
FROM b GROUP BY doc_id
"""


def multimodal_sample_stats_sql() -> str:
    """Twin of ``audio_sample_stats(attach_real_wav(documents))`` — the
    engine unpacks real 16-bit PCM frames; the oracle recomputes the
    amplitudes from consecutive byte PAIRS of the planted text
    (little-endian: lo + 256·hi; printable ASCII keeps every sample
    positive).  The mean is one IEEE division of an exact integer sum —
    bit-identical across engines, no rounding."""
    from datalake_indexes_spark.operators.multimodal import WAV_SAMPLE_RATE

    return f"""
WITH s AS (
  SELECT doc_id,
         regexp_replace(coalesce(text, ''), '[^\\x20-\\x7E]', ' ', 'g') AS t
  FROM documents
),
p AS (SELECT doc_id, t, CAST(length(t) // 2 AS INT) AS ns FROM s),
i AS (SELECT doc_id, t, unnest(range(1, ns + 1)) AS k FROM p),
v AS (
  SELECT doc_id, ord(t[CAST(2 * k - 1 AS INT)]) + 256 * ord(t[CAST(2 * k AS INT)]) AS a
  FROM i
),
g AS (
  SELECT doc_id,
         CAST(min(a) AS INT) AS amp_min,
         CAST(max(a) AS INT) AS amp_max,
         CAST(sum(a) AS DOUBLE) / count(*) AS amp_mean
  FROM v GROUP BY doc_id
)
SELECT p.doc_id,
       CAST({WAV_SAMPLE_RATE} AS INT) AS sample_rate,
       p.ns AS n_samples,
       g.amp_min, g.amp_max, g.amp_mean
FROM p LEFT JOIN g USING (doc_id)
"""


def multimodal_features_sql() -> str:
    """Twin of extract_features over attach_binary_payload's containers.

    The engine PARSES the planted PNG/WAV/MP4 headers; the oracle
    recomputes the planted values directly — agreement proves the parse.
    The sha256 is over the container-stripped data section (= the text
    bytes for every modality), the one definition expressible in both
    engines (DuckDB sha256 only accepts VARCHAR)."""
    from datalake_indexes_spark.operators.multimodal import (
        MODALITIES,
        MP4_OVERHEAD,
        PNG_OVERHEAD,
        PNG_TEXT_CHUNK_BYTES,
        WAV_BLOCK_ALIGN,
        WAV_HEADER_BYTES,
        WAV_SAMPLE_RATE,
    )

    png_total = PNG_OVERHEAD + PNG_TEXT_CHUNK_BYTES
    arr = "[" + ", ".join(f"'{m}'" for m in MODALITIES) + "]"
    return f"""
WITH p AS (
  SELECT doc_id,
         {arr}[CAST(doc_id % {len(MODALITIES)} + 1 AS INT)] AS modality,
         CAST(octet_length(encode(text)) AS INT) AS n_text,
         sha256(text) AS sha256
  FROM documents
)
SELECT doc_id, modality,
       CAST(n_text + CASE modality WHEN 'image' THEN {png_total}
                                   WHEN 'audio' THEN {WAV_HEADER_BYTES}
                                   ELSE {MP4_OVERHEAD} END AS INT) AS n_bytes,
       sha256,
       CAST(CASE WHEN modality = 'audio' THEN {WAV_SAMPLE_RATE}
            ELSE 64 + n_text % 577 END AS INT) AS dim_1,
       CAST(CASE WHEN modality = 'audio' THEN n_text // {WAV_BLOCK_ALIGN}
            ELSE 64 + (n_text * 31) % 577 END AS INT) AS dim_2
FROM p
"""


def multimodal_metadata_sql() -> str:
    """Twin of extract_metadata over the planted payloads: the engine
    PARSES the PNG tEXt chunk; the oracle recomputes the planted
    (Source, doc:<id>) pair for exactly the image-modality docs."""
    from datalake_indexes_spark.operators.multimodal import (
        MODALITIES,
        PNG_TEXT_ID_DIGITS,
        PNG_TEXT_KEY,
        PNG_TEXT_VALUE_PREFIX,
    )

    arr = "[" + ", ".join(f"'{m}'" for m in MODALITIES) + "]"
    return f"""
SELECT doc_id, '{PNG_TEXT_KEY}' AS meta_key,
       '{PNG_TEXT_VALUE_PREFIX}' ||
         lpad(CAST(doc_id AS VARCHAR), {PNG_TEXT_ID_DIGITS}, '0') AS meta_value
FROM documents
WHERE {arr}[CAST(doc_id % {len(MODALITIES)} + 1 AS INT)] = 'image'
"""


def multimodal_audio_features_sql() -> str:
    """Twin of ``audio_waveform_features(attach_real_wav(documents))`` —
    samples recomputed from consecutive byte pairs of the planted text
    (the :func:`multimodal_sample_stats_sql` trick); rms and the
    mean-crossing rate are single IEEE operations over exact integer
    aggregates, so no rounding is needed."""
    return """
WITH s AS (
  SELECT doc_id,
         regexp_replace(coalesce(text, ''), '[^\\x20-\\x7E]', ' ', 'g') AS t
  FROM documents
),
p AS (SELECT doc_id, t, CAST(length(t) // 2 AS INT) AS ns FROM s),
i AS (SELECT doc_id, t, unnest(range(1, ns + 1)) AS k FROM p),
v AS (
  SELECT doc_id, k,
         ord(t[CAST(2 * k - 1 AS INT)]) + 256 * ord(t[CAST(2 * k AS INT)]) AS a
  FROM i
),
m AS (
  SELECT doc_id,
         count(*) AS n,
         CAST(sum(a) AS DOUBLE) / count(*) AS mean,
         CAST(sum(a * a) AS DOUBLE) AS sq,
         CAST(max(a) - min(a) AS INT) AS p2p
  FROM v GROUP BY doc_id
),
x AS (
  SELECT v.doc_id, (v.a < m.mean) AS lo,
         lead(v.a < m.mean) OVER (PARTITION BY v.doc_id ORDER BY v.k) AS nlo
  FROM v JOIN m USING (doc_id)
),
c AS (
  SELECT doc_id, CAST(count(*) FILTER (lo <> nlo) AS INT) AS crossings
  FROM x WHERE nlo IS NOT NULL GROUP BY doc_id
)
SELECT p.doc_id,
       CAST(p.ns AS INT) AS n_samples,
       CASE WHEN p.ns > 0 THEN sqrt(m.sq / m.n) END AS rms,
       CASE WHEN p.ns > 1
            THEN coalesce(c.crossings, 0) * 1.0 / (p.ns - 1) END
         AS mean_crossing_rate,
       CASE WHEN p.ns > 0 THEN m.p2p END AS peak_to_peak
FROM p LEFT JOIN m USING (doc_id) LEFT JOIN c USING (doc_id)
"""



def multimodal_cmyk_pixel_stats_sql() -> str:
    """Twin of ``cmyk_channel_stats(attach_real_cmyk(documents))`` — the
    engine decodes a REAL 4-component Adobe JPEG (transform 0 = no color
    math) whose channels derive from the first 64 printable-ASCII text
    bytes b as C=b, M=255-b, Y=(b+64) mod 256, K=(2b) mod 256, one flat
    64-px tile per byte.  Channel mean = 64*sum/4096 = sum/64, a dyadic
    quotient — exact on both engines."""
    from datalake_indexes_spark.operators.multimodal import (
        CMYK_TILES_H,
        CMYK_TILES_W,
    )

    n_tiles = CMYK_TILES_W * CMYK_TILES_H
    w, h = CMYK_TILES_W * 8, CMYK_TILES_H * 8
    return f"""
WITH s AS (
  SELECT doc_id,
         rpad(regexp_replace(coalesce(text, ''), '[^\\x20-\\x7E]', ' ', 'g'),
              {n_tiles}, ' ') AS px
  FROM documents
),
b AS (
  SELECT doc_id, ord(c) AS v
  FROM (SELECT doc_id, unnest(string_split(px, '')) AS c FROM s)
)
SELECT doc_id,
       CAST({w} AS INT) AS width,
       CAST({h} AS INT) AS height,
       CAST(sum(v) AS DOUBLE) / {n_tiles} AS c_mean,
       CAST(sum(255 - v) AS DOUBLE) / {n_tiles} AS m_mean,
       CAST(sum((v + 64) % 256) AS DOUBLE) / {n_tiles} AS y_mean,
       CAST(sum((2 * v) % 256) AS DOUBLE) / {n_tiles} AS k_mean
FROM b GROUP BY doc_id
"""
