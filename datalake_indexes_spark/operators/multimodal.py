"""Multimodal columns — opaque binary payloads with typed metadata
(training-data-pipeline operator, beyond the reference surface).

A 100 TB multimodal corpus carries image/audio/video as ``binary`` columns
next to typed metadata; the engine's job is the Spark-side plumbing —
schema, Arrow-batched UDF shape, partition-friendly feature extraction —
plus the *container-header* decode that needs no codec library:

- **image**: real PNG IHDR / JPEG SOF / GIF header parsing
  (:func:`probe_image_dims`) — pure stdlib byte work, executor-side.
- **audio**: real WAV/FLAC/Ogg-Vorbis header parsing (:func:`probe_audio`) for sample
  rate and frame count.
- **video**: real MP4 ``moov/trak/tkhd`` box walking
  (:func:`probe_mp4_dims`) for track width/height — the container header
  is plain big-endian box framing; only *frame decode* needs a demuxer.

The synthetic lake fixture (:func:`attach_binary_payload`) wraps each
document's bytes in a *real* PNG or WAV container built from native Spark
expressions, so the end-to-end query exercises the genuine header parse and
the DuckDB oracle can reconstruct byte-identical payloads.

Full IMAGE pixel decode is real since round 6 — :func:`decode_png` is
pure stdlib (IDAT = zlib + per-scanline unfilter, no codec library) and
:func:`image_pixel_stats` runs it Arrow-batched over a lake column;
audio/video SAMPLE decode (soundfile/av) remains gated behind
:func:`decode_payload`'s import probe."""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MODALITIES = ["image", "audio", "video"]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG signature + IHDR length(13) + "IHDR" — the 16 bytes before width
PNG_HEADER_HEX = "89504E470D0A1A0A0000000D49484452"
# bit depth 8, color type 6 (RGBA), compression/filter/interlace 0 + a
# placeholder CRC (header probes read fields, they don't checksum)
PNG_TRAILER_HEX = "080600000000000000"
PNG_OVERHEAD = len(PNG_HEADER_HEX + "0000000000000000" + PNG_TRAILER_HEX) // 2
# planted tEXt provenance chunk: len(20) + "tEXt" + "Source\0doc:" +
# 9 zero-padded id digits + placeholder CRC — fixed width so container
# overhead stays a constant the oracle can mirror
PNG_TEXT_KEY = "Source"
PNG_TEXT_VALUE_PREFIX = "doc:"
PNG_TEXT_CHUNK_PREFIX_HEX = (
    "00000014"                  # chunk length 20
    + "74455874"                # "tEXt"
    + "536F75726365" + "00"     # "Source" NUL
    + "646F633A"                # "doc:"
)
PNG_TEXT_ID_DIGITS = 9
PNG_TEXT_CHUNK_BYTES = 4 + 4 + 20 + 4

WAV_SAMPLE_RATE = 16000
WAV_BLOCK_ALIGN = 2
WAV_HEADER_BYTES = 44  # canonical PCM header: RIFF(12) + fmt(24) + data(8)

# Minimal real MP4 skeleton: ftyp(16) + moov(8 + trak(8 + tkhd(92))) with
# the planted track dims in tkhd's 16.16 fixed-point width/height, then an
# mdat box carrying the data section.
MP4_FTYP_HEX = "0000001066747970" + "69736F6D" + "00000200"  # isom, v512
# moov(108) > trak(100) > tkhd(92): box headers + tkhd v0 body through the
# identity matrix — everything before the width/height fields is constant
MP4_MOOV_PREFIX_HEX = (
    "0000006C6D6F6F76"          # moov size 108
    + "000000647472616B"        # trak size 100
    + "0000005C746B6864"        # tkhd size 92
    + "00000007"                # version 0, flags: enabled|in-movie|in-preview
    + "00000000" + "00000000"   # creation / modification time
    + "00000001"                # track ID
    + "00000000"                # reserved
    + "00000000"                # duration
    + "0000000000000000"        # reserved
    + "0000" + "0000"           # layer, alternate group
    + "0000" + "0000"           # volume, reserved
    + "000100000000000000000000"  # unity matrix (9 x 32-bit fixed)
    + "000000000001000000000000"
    + "000000000000000040000000"
)
MP4_OVERHEAD = 16 + 108 + 8  # ftyp + moov + mdat header

# dimension formulas planted by the fixture (and mirrored by the oracle);
# the engine recovers them by PARSING the container headers
def _planted_image_dims(n_text: int) -> tuple[int, int]:
    return 64 + n_text % 577, 64 + (n_text * 31) % 577


# ---------------------------------------------------------------------------
# Real container-header probes (stdlib only, run executor-side)
# ---------------------------------------------------------------------------

def probe_image_dims(b: bytes) -> tuple[int, int] | None:
    """(width, height) from PNG IHDR, JPEG SOFn, or GIF header bytes."""
    if len(b) >= 24 and b[:8] == _PNG_SIG and b[12:16] == b"IHDR":
        return struct.unpack(">II", b[16:24])
    if len(b) >= 4 and b[:2] == b"\xff\xd8":  # JPEG
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return w, h
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            i += 2 + seg_len
        return None
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return w, h
    return None


def probe_wav(b: bytes) -> tuple[int, int] | None:
    """(sample_rate, n_frames) from a RIFF/WAVE header — walks the chunk
    list, so non-canonical layouts (extra chunks before ``data``) work."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    sample_rate = block_align = data_size = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= len(b):
            sample_rate = struct.unpack("<I", b[i + 12 : i + 16])[0]
            block_align = struct.unpack("<H", b[i + 20 : i + 22])[0]
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)
    if sample_rate is None or not block_align or data_size is None:
        return None
    return sample_rate, data_size // block_align


def probe_flac(b: bytes) -> tuple[int, int] | None:
    """(sample_rate, n_frames) from a FLAC STREAMINFO block: 'fLaC'
    magic, then metadata blocks; STREAMINFO (type 0) packs sample rate
    in 20 bits at byte offset 10 of its body and total samples in the
    low 36 bits that follow (bit-packed per the FLAC spec)."""
    if len(b) < 8 or b[:4] != b"fLaC":
        return None
    i = 4
    while i + 4 <= len(b):
        hdr = b[i]
        btype, last = hdr & 0x7F, hdr & 0x80
        size = int.from_bytes(b[i + 1 : i + 4], "big")
        if btype == 0 and i + 4 + 18 <= len(b):
            body = b[i + 4 : i + 4 + 18]
            packed = int.from_bytes(body[10:18], "big")  # 64 bits
            sample_rate = packed >> 44
            total = packed & ((1 << 36) - 1)
            if sample_rate == 0:
                return None
            return sample_rate, total
        i += 4 + size
        if last:
            break
    return None


def probe_ogg_vorbis(b: bytes) -> tuple[int, int] | None:
    """(sample_rate, n_frames) from an Ogg/Vorbis stream: first page
    carries the Vorbis identification header (audio sample rate,
    little-endian at offset 12 of the packet); total samples come from
    the LAST page's granule position (absolute sample index) — found by
    scanning for the final 'OggS' capture."""
    if len(b) < 58 or b[:4] != b"OggS":
        return None
    # identification packet starts after the 27-byte page header +
    # segment table (n_segs bytes)
    n_segs = b[26]
    p = 27 + n_segs
    if p + 16 > len(b) or b[p : p + 7] != b"\x01vorbis":
        return None
    sample_rate = struct.unpack("<I", b[p + 12 : p + 16])[0]
    if sample_rate == 0:
        return None
    last = b.rfind(b"OggS")
    granule = struct.unpack("<q", b[last + 6 : last + 14])[0] if last + 14 <= len(b) else 0
    return sample_rate, max(granule, 0)


def probe_audio(b: bytes) -> tuple[int, int] | None:
    """Audio container dispatch: WAV, FLAC, or Ogg/Vorbis."""
    return probe_wav(b) or probe_flac(b) or probe_ogg_vorbis(b)


def _iter_boxes(b: bytes, start: int, end: int):
    """Yield ``(type, body_start, body_end)`` for each ISO-BMFF box in
    ``b[start:end]`` — handles 64-bit largesize and size-0 (to-EOF)."""
    i = start
    while i + 8 <= end:
        size = struct.unpack(">I", b[i : i + 4])[0]
        btype = b[i + 4 : i + 8]
        if size == 1:  # 64-bit largesize follows the type
            if i + 16 > end:
                return
            size = struct.unpack(">Q", b[i + 8 : i + 16])[0]
            yield btype, i + 16, min(i + size, end)
        elif size == 0:  # box extends to end of enclosing scope
            yield btype, i + 8, end
            return
        else:
            yield btype, i + 8, min(i + size, end)
        if size < 8:
            return
        i += size


def _is_mp4(b: bytes) -> bool:
    return len(b) >= 12 and b[4:8] == b"ftyp"


def probe_mp4_dims(b: bytes) -> tuple[int, int] | None:
    """(width, height) from the first MP4 ``moov/trak/tkhd`` box — plain
    big-endian box walking, no demuxer.  tkhd stores dims as 16.16 fixed
    point; version 1 boxes carry 64-bit times, shifting the field offset."""
    if not _is_mp4(b):
        return None
    for t1, s1, e1 in _iter_boxes(b, 0, len(b)):
        if t1 != b"moov":
            continue
        for t2, s2, e2 in _iter_boxes(b, s1, e1):
            if t2 != b"trak":
                continue
            for t3, s3, e3 in _iter_boxes(b, s2, e2):
                if t3 != b"tkhd":
                    continue
                body = b[s3:e3]
                if not body:
                    return None
                off = 88 if body[0] == 1 else 76
                if len(body) < off + 8:
                    return None
                w_fx, h_fx = struct.unpack(">II", body[off : off + 8])
                return w_fx >> 16, h_fx >> 16
    return None


def probe_avi_dims(b: bytes) -> tuple[int, int] | None:
    """(width, height) from an AVI main header — RIFF/'AVI ' chunk walk to
    the ``LIST hdrl`` / ``avih`` chunk; dwWidth/dwHeight are little-endian
    at offsets 32/36 of the avih body."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        return None
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        size = struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"LIST" and b[i + 8 : i + 12] == b"hdrl":
            j = i + 12
            end = min(i + 8 + size, len(b))
            while j + 8 <= end:
                sub = b[j : j + 4]
                ssize = struct.unpack("<I", b[j + 4 : j + 8])[0]
                if sub == b"avih" and j + 8 + 40 <= len(b):
                    w, h = struct.unpack("<II", b[j + 8 + 32 : j + 8 + 40])
                    return w, h
                j += 8 + ssize + (ssize & 1)
        i += 8 + size + (size & 1)
    return None


def probe_video_dims(b: bytes) -> tuple[int, int] | None:
    """Video container dispatch: MP4 tkhd or AVI avih."""
    return probe_mp4_dims(b) or probe_avi_dims(b)


def payload_body(b: bytes, modality: str) -> bytes:
    """The payload's *data section*, container stripped — PNG: everything
    past the IHDR chunk (length-directed, not fixed-offset); WAV: the
    ``data`` chunk contents; MP4: the ``mdat`` box contents; anything
    unrecognized: the whole payload.  Hashing the data section (not the
    file bytes) is the dedup-stable choice: re-containerized copies of the
    same media hash equal."""
    if _is_mp4(b):
        for t, s, e in _iter_boxes(b, 0, len(b)):
            if t == b"mdat":
                return b[s:e]
        return b
    if len(b) >= 16 and b[:8] == _PNG_SIG:
        ihdr_len = struct.unpack(">I", b[8:12])[0]
        i = 8 + 4 + 4 + ihdr_len + 4
        # metadata chunks are container, not data: skip them so
        # re-containerized copies with different provenance hash equal
        while i + 8 <= len(b) and b[i + 4 : i + 8] in (b"tEXt", b"iTXt", b"zTXt"):
            clen = struct.unpack(">I", b[i : i + 4])[0]
            i += 4 + 4 + clen + 4
        return b[i:]
    if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        i = 12
        while i + 8 <= len(b):
            cid = b[i : i + 4]
            size = struct.unpack("<I", b[i + 4 : i + 8])[0]
            if cid == b"data":
                return b[i + 8 : i + 8 + size]
            i += 8 + size + (size & 1)
    return b


# Adam7 pass origins and strides: (x0, y0, dx, dy) per PNG spec §8.2
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def decode_png(b: bytes) -> tuple[int, int, int, bytes]:
    """Pure-stdlib PNG pixel decode: chunk walk → IDAT concat → zlib
    inflate → per-scanline unfilter (filter types 0–4 per the PNG spec).
    Returns (width, height, channels, pixel bytes, row-major).

    No codec library needed — IDAT is just a zlib stream over filtered
    scanlines.  EVERY valid PNG format decodes: grayscale at depth
    1/2/4/8/16, gray+alpha / RGB / RGBA at 8/16, palette at 1/2/4/8
    (PLTE lookup, tRNS alpha when present), both non-interlaced and
    Adam7-interlaced (seven independently filtered sub-images scattered
    back onto the pixel grid).  Output samples are always 8-bit:
    16-bit reduces by its HIGH byte (the spec's
    ``floor(v·255/65535 + 0.5)`` differs from the high byte on no image
    whose 16-bit samples came from 8-bit sources, and the high byte
    keeps the path allocation-free); sub-byte grayscale scales by the
    exact spec factor 255/(2^depth − 1) — an integer (255/85/17), so
    scaling is lossless; palette indices are never scaled.

    The zlib stream is inflated RAW (``wbits=-15`` after the 2-byte zlib
    header) so the Adler-32 trailer is not VERIFIED — a deliberate
    robustness choice for crawl corpora, where truncated/checksum-broken
    images should still yield pixels; valid streams (including the
    fixture's, whose Adler and CRCs are real) inflate identically.
    """
    import zlib

    if bytes(b[:8]) != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    i = 8
    w = h = bd = ct = interlace = None
    idat = bytearray()
    plte: bytes | None = None
    trns: bytes | None = None
    while i + 8 <= len(b):
        clen = struct.unpack(">I", b[i : i + 4])[0]
        ctype = bytes(b[i + 4 : i + 8])
        data = b[i + 8 : i + 8 + clen]
        if ctype == b"IHDR":
            if len(data) < 13:
                raise ValueError("PNG truncated IHDR")
            w, h = struct.unpack(">II", data[:8])
            bd, ct, interlace = data[8], data[9], data[12]
        elif ctype == b"PLTE":
            plte = bytes(data)
        elif ctype == b"tRNS":
            trns = bytes(data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        i += 12 + clen
    if w is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    valid_depths = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                    4: (8, 16), 6: (8, 16)}
    if ct not in valid_depths:
        raise ValueError(f"PNG color type {ct} invalid")
    if bd not in valid_depths[ct]:
        raise ValueError(f"PNG bit depth {bd} invalid for color type {ct}")
    if ct == 3 and (plte is None or len(plte) % 3):
        raise ValueError("palette PNG missing or malformed PLTE")
    if interlace not in (0, 1):
        raise ValueError(f"PNG interlace method {interlace} invalid")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ct]
    try:
        raw = zlib.decompressobj(wbits=-15).decompress(bytes(idat[2:]))
    except zlib.error as exc:  # corrupt deflate stream -> clean contract
        raise ValueError(f"PNG corrupt IDAT stream: {exc}") from exc
    scale = 255 // ((1 << bd) - 1) if (bd < 8 and ct == 0) else 1

    def decode_pass(pos: int, pw: int, ph: int) -> tuple[list[bytes], int]:
        """Unfilter one (sub)image of pw x ph pixels starting at ``pos``
        in the inflated stream; returns its rows as 8-bit sample bytes
        (pw * channels each) plus the new stream position.  The filters
        run over the PACKED scanline bytes with the spec's byte offset
        ``bpp = max(1, channels*depth/8)``; bit unpacking and depth
        scaling happen after."""
        if pw == 0 or ph == 0:
            return [], pos
        stride = (pw * channels * bd + 7) // 8
        bpp = max(1, (channels * bd) // 8)
        if len(raw) - pos < ph * (stride + 1):
            raise ValueError("PNG pixel data truncated")
        rows: list[bytes] = []
        prev = bytes(stride)
        for _ in range(ph):
            ft = raw[pos]
            pos += 1
            row = bytearray(raw[pos : pos + stride])
            pos += stride
            if ft == 1:  # Sub
                for x in range(bpp, stride):
                    row[x] = (row[x] + row[x - bpp]) & 0xFF
            elif ft == 2:  # Up
                for x in range(stride):
                    row[x] = (row[x] + prev[x]) & 0xFF
            elif ft == 3:  # Average
                for x in range(stride):
                    left = row[x - bpp] if x >= bpp else 0
                    row[x] = (row[x] + ((left + prev[x]) >> 1)) & 0xFF
            elif ft == 4:  # Paeth
                for x in range(stride):
                    a = row[x - bpp] if x >= bpp else 0
                    up = prev[x]
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    pred = (
                        a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                    )
                    row[x] = (row[x] + pred) & 0xFF
            elif ft != 0:
                raise ValueError(f"PNG filter type {ft} invalid")
            prev = bytes(row)
            if bd == 16:  # big-endian: the high byte is every even offset
                rows.append(bytes(row[0::2]))
            elif bd == 8:
                rows.append(bytes(row))
            else:  # 1/2/4-bit: unpack MSB-first, drop row-pad bits
                mask = (1 << bd) - 1
                per_byte = 8 // bd
                samples = bytearray()
                for byte in row:
                    for k in range(per_byte - 1, -1, -1):
                        samples.append(((byte >> (k * bd)) & mask) * scale)
                rows.append(bytes(samples[: pw * channels]))
        return rows, pos

    if interlace == 0:
        rows, _ = decode_pass(0, w, h)
        out = bytearray().join(rows)
    else:  # Adam7: seven sub-images scattered back onto the grid
        grid = [bytearray(w * channels) for _ in range(h)]
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx if w > x0 else 0
            ph = (h - y0 + dy - 1) // dy if h > y0 else 0
            rows, pos = decode_pass(pos, pw, ph)
            for j, r in enumerate(rows):
                y = y0 + j * dy
                for px in range(pw):
                    x = x0 + px * dx
                    grid[y][x * channels : (x + 1) * channels] = r[
                        px * channels : (px + 1) * channels
                    ]
        out = bytearray().join(bytes(g) for g in grid)
    if ct == 3:  # palette lookup: index -> RGB (+ tRNS alpha if present)
        n_entries = len(plte) // 3
        if out and max(out) >= n_entries:
            raise ValueError("PNG palette index out of range")
        if trns is not None:
            lut = [
                plte[3 * j : 3 * j + 3]
                + bytes([trns[j] if j < len(trns) else 255])
                for j in range(n_entries)
            ]
            channels = 4
        else:
            lut = [plte[3 * j : 3 * j + 3] for j in range(n_entries)]
            channels = 3
        out = bytearray().join(lut[v] for v in out)
    return int(w), int(h), channels, bytes(out)


def _zigzag_order() -> list[int]:
    """The 64 natural-order indices in JPEG zigzag sequence, generated by
    the diagonal walk (no transcribed table to typo)."""
    order = []
    for s in range(15):
        if s % 2 == 0:
            for y in range(min(s, 7), max(0, s - 7) - 1, -1):
                order.append(y * 8 + (s - y))
        else:
            for x in range(min(s, 7), max(0, s - 7) - 1, -1):
                order.append((s - x) * 8 + x)
    return order


_ZIGZAG = _zigzag_order()


def _build_huffman(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman table: (code_length, code) -> symbol."""
    if sum(bits) > len(vals):
        raise ValueError("JPEG truncated Huffman table")
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _JpegBitReader:
    """MSB-first bit reader over an entropy-coded segment: unstuffs
    0xFF00, stops at any other marker, byte-aligns across restarts."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.i = pos
        self.buf = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.i >= len(self.d):
                raise ValueError("JPEG entropy data truncated")
            byte = self.d[self.i]
            if byte == 0xFF:
                nxt = self.d[self.i + 1] if self.i + 1 < len(self.d) else None
                if nxt != 0x00:  # a real marker: no more entropy bits here
                    raise ValueError("JPEG entropy data truncated at marker")
                self.i += 2
            else:
                self.i += 1
            self.buf = byte
            self.n = 8
        self.n -= 1
        return (self.buf >> self.n) & 1

    def receive(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.bit()
        return v

    def decode(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG invalid Huffman code")

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.n = 0
        if (
            self.i + 2 > len(self.d)
            or self.d[self.i] != 0xFF
            or not 0xD0 <= self.d[self.i + 1] <= 0xD7
        ):
            raise ValueError("JPEG missing restart marker")
        self.i += 2


def _extend(v: int, t: int) -> int:
    """JPEG magnitude decoding (spec EXTEND): t-bit value -> signed."""
    if t and v < (1 << (t - 1)):
        return v - (1 << t) + 1
    return v


def decode_jpeg(b: bytes) -> tuple[int, int, int, bytes]:
    """Pure stdlib+numpy baseline JPEG pixel decode: marker walk → DQT /
    DHT / SOF0-1 / DRI / SOS → per-MCU Huffman entropy decode →
    dequantize → dezigzag → 8x8 IDCT (one numpy matrix triple-product
    per block) → level shift → sample-replication chroma upsample →
    JFIF YCbCr→RGB.  Returns (width, height, channels, pixel bytes,
    row-major interleaved) — the same contract as :func:`decode_png`.

    Supports baseline and extended-sequential Huffman JPEG (SOF0/SOF1),
    progressive Huffman JPEG (SOF2: spectral selection + successive
    approximation per ITU-T T.81 Annex G, including DC/AC refinement
    scans, EOB runs and restart intervals), multi-scan sequential files
    (per-component scans), grayscale and 3-component YCbCr at any
    integer sampling ratio (4:4:4 / 4:2:2 / 4:2:0 / 4:1:1), 8/16-bit
    quant tables, restart intervals, and 4-component Adobe CMYK / YCCK
    (APP14 transform 2 undoes the YCbCr step on the CMY planes; values
    return AS STORED, channels=4 — the Adobe inverted-ink convention is
    the caller's, mirroring libjpeg).  Hierarchical, arithmetic-coded
    and lossless SOFs and 12-bit precision raise
    ``NotImplementedError`` naming the feature.  A DC-only block
    (flat 8x8 tile) decodes BIT-EXACTLY (the IDCT of a lone DC term is
    the constant DC/8, exact in doubles), which is what lets the
    planted fixture's DuckDB twin recompute pixel stats straight from
    text — through the progressive path too (successive approximation
    is exact integer reassembly of the same coefficients).
    """
    import numpy as np

    if len(b) < 4 or bytes(b[:2]) != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    comps: list[dict] | None = None
    w = h = None
    ri = 0
    progressive = False
    # APP14 flag: None = no Adobe marker (JFIF conventions); 0 = Adobe
    # untransformed (3-comp = RGB stored directly, 4-comp = raw CMYK);
    # 1 = YCbCr; 2 = YCCK (CMY ran through YCbCr)
    adobe_transform = None
    coefs = None  # per-component raw coefficient grids (multi-scan path)
    geom = None  # (hmax, vmax, mcux, mcuy)
    i = 2
    while i + 2 <= len(b):
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI
            break
        if i + 4 > len(b):
            break
        seglen = struct.unpack(">H", b[i + 2 : i + 4])[0]
        seg = bytes(b[i + 4 : i + 2 + seglen])
        if marker == 0xDB:  # DQT (one or more tables)
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if j + (128 if pq else 64) > len(seg):
                    raise ValueError("JPEG truncated DQT")
                if pq:  # 16-bit table
                    vals = list(struct.unpack(">64H", seg[j : j + 128]))
                    j += 128
                else:
                    vals = list(seg[j : j + 64])
                    j += 64
                qt[tq] = vals
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext-seq / progressive
            if len(seg) < 6 or len(seg) < 6 + 3 * seg[5]:
                raise ValueError("JPEG truncated SOF")
            if seg[0] != 8:
                raise NotImplementedError(f"JPEG precision {seg[0]} (8 only)")
            progressive = marker == 0xC2
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            if nc not in (1, 3, 4):
                raise NotImplementedError(
                    f"JPEG {nc}-component scan (grayscale/YCbCr/CMYK only)"
                )
            comps = [
                {
                    "id": seg[6 + 3 * c],
                    "h": seg[7 + 3 * c] >> 4,
                    "v": seg[7 + 3 * c] & 15,
                    "tq": seg[8 + 3 * c],
                }
                for c in range(nc)
            ]
            for c in comps:  # T.81 B.2.2: sampling factors are 1..4; a
                # corrupt 0 nibble would ZeroDivisionError the geometry
                if not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4):
                    raise ValueError(
                        f"JPEG invalid sampling factor {c['h']}x{c['v']}"
                    )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} coding "
                "(baseline/ext-sequential/progressive only)"
            )
        elif marker == 0xC4:  # DHT (one or more tables)
            j = 0
            while j + 17 <= len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1 : j + 17])
                nvals = sum(bits)
                vals = seg[j + 17 : j + 17 + nvals]
                huff[(tc, th)] = _build_huffman(bits, vals)
                j += 17 + nvals
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("JPEG truncated DRI")
            ri = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xEE:  # APP14 — Adobe color-transform flag
            if len(seg) >= 12 and bytes(seg[:5]) == b"Adobe":
                adobe_transform = seg[11]
        elif marker == 0xDA:  # SOS
            if comps is None:
                raise ValueError("JPEG SOS before SOF")
            if len(seg) < 1 or len(seg) < 1 + 2 * seg[0] + 3:
                raise ValueError("JPEG truncated SOS")
            ns = seg[0]
            if not 1 <= ns <= 4:
                raise ValueError(f"JPEG SOS with {ns} components")
            tabs = {}
            scomps = []
            by_id = {cc["id"]: k for k, cc in enumerate(comps)}
            for c in range(ns):
                cs = seg[1 + 2 * c]
                tabs[cs] = (seg[2 + 2 * c] >> 4, seg[2 + 2 * c] & 15)
                if cs not in by_id:
                    raise ValueError(f"JPEG SOS references unknown component {cs}")
                scomps.append(by_id[cs])
            if len(set(scomps)) != ns:  # duplicate ids would alias tabs
                raise ValueError("JPEG SOS lists a component twice")
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15
            if ss > 63 or se > 63:
                raise ValueError(f"JPEG invalid spectral band {ss}..{se}")
            if not progressive and ns == len(comps) and coefs is None:
                # single-scan sequential: the original streaming fast path
                return _decode_jpeg_scan(
                    np, b, i + 2 + seglen, w, h, comps, tabs, qt, huff, ri,
                    adobe_transform,
                )
            # progressive or per-component sequential: accumulate raw
            # coefficients across scans, render at EOI
            if coefs is None:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                for c in comps:
                    if hmax % c["h"] or vmax % c["v"]:
                        raise NotImplementedError(
                            "JPEG non-integer chroma sampling ratio"
                        )
                mcux = (w + 8 * hmax - 1) // (8 * hmax)
                mcuy = (h + 8 * vmax - 1) // (8 * vmax)
                geom = (hmax, vmax, mcux, mcuy)
                coefs = [
                    # int64: a corrupt stream can legally-shaped-ly feed
                    # huge DC sums / large Al shifts; the decoder must
                    # raise or decode, never overflow a C long
                    np.zeros(
                        (mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64
                    )
                    for c in comps
                ]
            i = _decode_scan_coefs(
                b, i + 2 + seglen, coefs, comps, scomps, tabs, huff, ri,
                ss, se, ah, al, progressive, w, h, geom,
            )
            continue
        i += 2 + seglen
    if coefs is not None:
        return _render_jpeg_coefs(np, coefs, comps, qt, w, h, geom, adobe_transform)
    raise ValueError("JPEG missing SOS scan")


def _decode_scan_coefs(
    b, pos, coefs, comps, scomps, tabs, huff, ri, ss, se, ah, al,
    progressive, w, h, geom,
):
    """One scan of a multi-scan JPEG decoded into raw coefficient grids
    (ITU-T T.81 Annex G for the four progressive scan kinds; F.2 block
    decode for per-component sequential scans).  Coefficients stay RAW
    (un-dequantized) because successive-approximation refinement edits
    their bits; :func:`_render_jpeg_coefs` dequantizes at the end.
    Returns the byte offset just past the scan's entropy data."""
    hmax, vmax, mcux, mcuy = geom
    reader = _JpegBitReader(b, pos)
    dc_tbl = {}
    ac_tbl = {}
    for ci in scomps:
        td, ta = tabs[comps[ci]["id"]]
        dc_tbl[ci] = huff.get((0, td))
        ac_tbl[ci] = huff.get((1, ta))
    pred = {ci: 0 for ci in scomps}
    state = {"eobrun": 0}

    if progressive:
        if ss == 0 and se != 0:
            raise ValueError("JPEG progressive DC scan with Se != 0")
        if ss > 0 and len(scomps) != 1:
            raise ValueError("JPEG progressive AC scan must be single-component")
        # AC REFINEMENT also Huffman-decodes run/size symbols, so the
        # table is required for ah>0 too, not just first scans
        if ss > 0 and ac_tbl[scomps[0]] is None:
            raise ValueError("JPEG missing Huffman table")
        if ss == 0 and ah == 0 and any(dc_tbl[ci] is None for ci in scomps):
            raise ValueError("JPEG missing Huffman table")

    def block_full(ci, blk):
        # per-component sequential scan: full F.2 block decode, raw coefs
        t = reader.decode(dc_tbl[ci])
        if t > 16:
            raise ValueError(f"JPEG invalid DC category {t}")
        pred[ci] += _extend(reader.receive(t), t)
        blk[0] = pred[ci]
        k = 1
        while k < 64:
            rs = reader.decode(ac_tbl[ci])
            if rs == 0x00:  # EOB
                break
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r != 15:
                    break
                k += 16  # ZRL
                continue
            k += r
            if k > 63:
                raise ValueError("JPEG AC coefficient overrun")
            blk[_ZIGZAG[k]] = _extend(reader.receive(s), s)
            k += 1

    def dc_first(ci, blk):
        t = reader.decode(dc_tbl[ci])
        if t > 16:  # DC categories are 0..16; a corrupt table can hand
            raise ValueError(f"JPEG invalid DC category {t}")  # back any byte
        pred[ci] += _extend(reader.receive(t), t)
        blk[0] = pred[ci] << al

    def dc_refine(ci, blk):
        # append one magnitude bit: OR works on the two's-complement
        # value because bit Al is zero until this scan delivers it
        if reader.bit():
            blk[0] |= 1 << al

    def ac_first(ci, blk):
        if state["eobrun"]:
            state["eobrun"] -= 1
            return
        k = ss
        while k <= se:
            rs = reader.decode(ac_tbl[ci])
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r < 15:  # EOBn: run of 2^r + ext blocks ends HERE
                    state["eobrun"] = (1 << r) - 1
                    if r:
                        state["eobrun"] += reader.receive(r)
                    return
                k += 16  # ZRL
                continue
            k += r
            if k > se:
                raise ValueError("JPEG AC coefficient overrun")
            blk[_ZIGZAG[k]] = _extend(reader.receive(s), s) << al
            k += 1

    def _refine_one(blk, z, p1):
        v = int(blk[z])
        if reader.bit() and not (v & p1):
            blk[z] = v + (p1 if v > 0 else -p1)

    def ac_refine(ci, blk):
        # T.81 G.1.2.3: corrections for already-nonzero coefficients are
        # interleaved positionally with runs/new ±1 coefficients
        p1 = 1 << al
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = reader.decode(ac_tbl[ci])
                r, s = rs >> 4, rs & 15
                newval = 0
                if s == 0:
                    if r < 15:  # EOBn: rest of THIS block still refines
                        state["eobrun"] = 1 << r
                        if r:
                            state["eobrun"] += reader.receive(r)
                        break
                    # ZRL: pass 16 zero-history slots (refining on the way)
                else:
                    if s != 1:
                        raise ValueError("JPEG AC refinement size != 1")
                    newval = p1 if reader.bit() else -p1
                while k <= se:
                    z = _ZIGZAG[k]
                    if blk[z]:
                        _refine_one(blk, z, p1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newval and k <= se:
                    blk[_ZIGZAG[k]] = newval
                k += 1
        if state["eobrun"]:
            while k <= se:
                z = _ZIGZAG[k]
                if blk[z]:
                    _refine_one(blk, z, p1)
                k += 1
            state["eobrun"] -= 1

    if not progressive:
        if any(dc_tbl[ci] is None or ac_tbl[ci] is None for ci in scomps):
            raise ValueError("JPEG missing Huffman table")
        unit = block_full
    elif ss == 0:
        unit = dc_first if ah == 0 else dc_refine
    else:
        unit = ac_first if ah == 0 else ac_refine

    def do_restart():
        reader.restart()
        for ci in scomps:
            pred[ci] = 0
        state["eobrun"] = 0

    if len(scomps) > 1:  # interleaved: MCU order
        for mcu in range(mcux * mcuy):
            if ri and mcu and mcu % ri == 0:
                do_restart()
            my, mx = divmod(mcu, mcux)
            for ci in scomps:
                c = comps[ci]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        unit(ci, coefs[ci][my * c["v"] + by, mx * c["h"] + bx])
    else:  # non-interleaved: the component's own block grid (T.81 A.2.2)
        ci = scomps[0]
        c = comps[ci]
        bw = (-(-(w * c["h"]) // hmax) + 7) // 8
        bh = (-(-(h * c["v"]) // vmax) + 7) // 8
        for u in range(bw * bh):
            if ri and u and u % ri == 0:
                do_restart()
            by, bx = divmod(u, bw)
            unit(ci, coefs[ci][by, bx])
    return reader.i


def _jpeg_color_out(np, full, w, h, adobe_transform=None):
    """Shared color-convert tail: component planes -> interleaved pixel
    bytes.  1 = grayscale; 3 = YCbCr->RGB, UNLESS an Adobe APP14 marker
    said transform 0 (Adobe stores RGB directly then — libjpeg's rule);
    4 = Adobe CMYK/YCCK (APP14 transform 2 undoes the YCbCr step on the
    CMY planes, K passes through; values stay AS STORED — the Adobe
    inverted-ink convention is the caller's to undo, mirroring
    libjpeg).  ``adobe_transform=None`` means no Adobe marker."""
    if len(full) == 1:
        out = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return int(w), int(h), 1, out.tobytes()
    if len(full) == 3 and adobe_transform == 0:  # Adobe RGB: no transform
        out = np.clip(np.rint(np.stack(full, axis=-1)), 0, 255).astype(np.uint8)
        return int(w), int(h), 3, out.tobytes()
    if len(full) == 4:
        if adobe_transform == 2:  # YCCK: invert the YCbCr transform on CMY
            yy, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
            chans = [
                yy + 1.402 * cr,
                yy - 0.344136 * cb - 0.714136 * cr,
                yy + 1.772 * cb,
                full[3],
            ]
        else:
            chans = full
        out = np.clip(np.rint(np.stack(chans, axis=-1)), 0, 255).astype(np.uint8)
        return int(w), int(h), 4, out.tobytes()
    yy, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [
            yy + 1.402 * cr,
            yy - 0.344136 * cb - 0.714136 * cr,
            yy + 1.772 * cb,
        ],
        axis=-1,
    )
    out = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    return int(w), int(h), 3, out.tobytes()


def _render_jpeg_coefs(np, coefs, comps, qt, w, h, geom, adobe_transform=None):
    """Dequantize + IDCT + upsample + color-convert the accumulated
    coefficient grids — batched numpy (one matmul triple-product over
    all blocks), same math as the streaming baseline path."""
    hmax, vmax, _mcux, _mcuy = geom
    u = np.arange(8)
    x = np.arange(8)
    m = 0.5 * np.cos((2 * x[:, None] + 1) * u[None, :] * np.pi / 16)
    m[:, 0] *= 1 / np.sqrt(2.0)
    full = []
    for ci, c in enumerate(comps):
        if c["tq"] not in qt:
            raise ValueError("JPEG missing quantization table")
        q = qt[c["tq"]]
        qnat = np.zeros(64)
        for k in range(64):  # DQT is zigzag-ordered; coefs are natural
            qnat[_ZIGZAG[k]] = q[k]
        arr = coefs[ci].astype(np.float64) * qnat
        bh, bw = arr.shape[:2]
        blocks = arr.reshape(bh * bw, 8, 8)
        spatial = np.matmul(np.matmul(m, blocks), m.T) + 128.0
        plane = (
            spatial.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:  # sample replication (box) upsample
            plane = plane.repeat(fy, axis=0).repeat(fx, axis=1)
        full.append(plane[:h, :w])
    return _jpeg_color_out(np, full, w, h, adobe_transform)


def _decode_jpeg_scan(np, b, pos, w, h, comps, tabs, qt, huff, ri, adobe_transform=None):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if hmax % c["h"] or vmax % c["v"]:
            raise NotImplementedError("JPEG non-integer chroma sampling ratio")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # IDCT basis: M[x, u] = c(u)/2 * cos((2x+1) u pi / 16)
    u = np.arange(8)
    x = np.arange(8)
    m = 0.5 * np.cos((2 * x[:, None] + 1) * u[None, :] * np.pi / 16)
    m[:, 0] *= 1 / np.sqrt(2.0)
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    quant = []
    dc_tbl = []
    ac_tbl = []
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError("JPEG missing quantization table")
        quant.append(qt[c["tq"]])
        td, ta = tabs[c["id"]]
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("JPEG missing Huffman table")
        dc_tbl.append(huff[(0, td)])
        ac_tbl.append(huff[(1, ta)])
    reader = _JpegBitReader(b, pos)
    pred = [0] * len(comps)
    n_mcu = mcux * mcuy
    for mcu in range(n_mcu):
        if ri and mcu and mcu % ri == 0:
            reader.restart()
            pred = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, c in enumerate(comps):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    blk = np.zeros(64, dtype=np.float64)
                    t = reader.decode(dc_tbl[ci])
                    if t > 16:  # categories are 0..16; corrupt tables
                        raise ValueError(f"JPEG invalid DC category {t}")
                    pred[ci] += _extend(reader.receive(t), t)
                    blk[0] = pred[ci] * quant[ci][0]
                    k = 1
                    while k < 64:
                        rs = reader.decode(ac_tbl[ci])
                        if rs == 0x00:  # EOB
                            break
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r != 15:
                                break
                            k += 16  # ZRL
                            continue
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC coefficient overrun")
                        blk[_ZIGZAG[k]] = (
                            _extend(reader.receive(s), s) * quant[ci][k]
                        )
                        k += 1
                    spatial = m @ blk.reshape(8, 8) @ m.T + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
        # blk[0] holds the DC in NATURAL position 0 == zigzag 0: quant[ci][k]
        # above indexes the quant table in ZIGZAG order, matching DQT layout
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:  # sample replication (box) upsample
            p = p.repeat(fy, axis=0).repeat(fx, axis=1)
        full.append(p[:h, :w])
    return _jpeg_color_out(np, full, w, h, adobe_transform)


# IMA/DVI ADPCM constants (public spec: IMA Digital Audio Focus Group,
# "Recommended Practices for Enhancing Digital Audio Compatibility";
# the same tables every reference decoder ships)
_IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]
_IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]


def _ulaw_to_linear(b: int) -> int:
    """ITU-T G.711 mu-law byte -> signed 16-bit sample (the public
    segment/bias expansion: complement, rebuild mantissa with the 0x84
    bias, shift by segment, strip the bias)."""
    u = ~b & 0xFF
    t = ((u & 0x0F) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    return (0x84 - t) if u & 0x80 else (t - 0x84)


def _alaw_to_linear(b: int) -> int:
    """ITU-T G.711 A-law byte -> signed 16-bit sample (the public
    even-bit-inverted segment expansion)."""
    a = b ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t += 0x108
        t <<= seg - 1
    return t if a & 0x80 else -t


# MS-ADPCM constants (public Microsoft WAVE spec): the adaptation table
# and the seven built-in predictor coefficient pairs (files may carry
# their own table in the fmt extension; decode honors it)
_MS_ADAPT = [230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230]
_MS_COEFS = [(256, 0), (512, -256), (0, 0), (192, 64),
             (240, 0), (460, -208), (392, -232)]


def _div256(q: int) -> int:
    """Integer ``q / 256`` truncating toward zero — the C division the
    Microsoft spec pseudocode performs on the (possibly negative)
    predictor sum.  Python's ``>> 8`` floors instead, which differs by 1
    for negative non-multiples and would let the recursion drift from
    division-based decoders (e.g. FFmpeg) on real files."""
    return q // 256 if q >= 0 else -((-q) // 256)


def _ms_adpcm_samples(
    data: bytes, ch: int, block_align: int, coefs: list
) -> list:
    """Decode WAV MS-ADPCM (format code 0x0002) data-chunk bytes to
    interleaved signed-16-bit samples.  Block layout per the spec:
    per-channel predictor index (1 byte), initial delta (int16),
    sample1 and sample2 (int16 each; OUTPUT order is sample2 then
    sample1 — sample2 is the older), then nibbles HIGH-first, channels
    alternating within each byte stream.  The predictor sum divides by
    256 truncating toward zero (C division, the spec pseudocode's
    ``/ 256``) — NOT a flooring ``>> 8``, which differs by 1 on negative
    non-multiples and would drift from division-based decoders."""
    header = 7 * ch
    if block_align < header or ch < 1:
        raise ValueError(f"MS-ADPCM block_align {block_align} invalid for {ch} ch")
    out: list = []
    for boff in range(0, len(data) - block_align + 1, block_align):
        block = data[boff : boff + block_align]
        preds = [block[c] for c in range(ch)]
        if any(p >= len(coefs) for p in preds):
            raise ValueError("MS-ADPCM predictor index out of coef-table range")
        deltas = list(struct.unpack_from(f"<{ch}h", block, ch))
        s1 = list(struct.unpack_from(f"<{ch}h", block, 3 * ch))
        s2 = list(struct.unpack_from(f"<{ch}h", block, 5 * ch))
        # header carries the first two samples per channel, older first:
        # one interleaved frame of sample2s, then one of sample1s
        out.extend(s2)
        out.extend(s1)
        c = 0  # channel cursor: nibbles alternate channels, high first
        for byte in block[header:]:
            for nib in (byte >> 4, byte & 0xF):
                c1, c2 = coefs[preds[c]]
                pred = _div256(s1[c] * c1 + s2[c] * c2)
                signed = nib - 16 if nib >= 8 else nib
                pred += signed * deltas[c]
                pred = max(-32768, min(32767, pred))
                s2[c], s1[c] = s1[c], pred
                deltas[c] = max(16, (_MS_ADAPT[nib] * deltas[c]) >> 8)
                out.append(pred)
                c = (c + 1) % ch
    return out


def _ima_step(pred: int, idx: int, nib: int) -> tuple[int, int]:
    """One IMA ADPCM decode step: nibble -> (new predictor, new index)."""
    step = _IMA_STEP_TABLE[idx]
    diff = step >> 3
    if nib & 4:
        diff += step
    if nib & 2:
        diff += step >> 1
    if nib & 1:
        diff += step >> 2
    pred = pred - diff if nib & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + _IMA_INDEX_TABLE[nib & 7]))
    return pred, idx


def _ima_adpcm_samples(data: bytes, ch: int, block_align: int) -> list:
    """Decode WAV IMA ADPCM (format code 0x0011) data-chunk bytes to
    interleaved signed-16-bit samples.  Block layout per the spec: a
    4-byte state header PER CHANNEL (int16 predictor = the block's
    first sample, step index, reserved), then nibble words interleaved
    in 4-byte groups per channel, LOW nibble first within a byte.  A
    trailing partial block is ignored (the truncation convention the
    PCM path already uses)."""
    if block_align < 4 * ch or ch < 1:
        raise ValueError(f"ADPCM block_align {block_align} invalid for {ch} ch")
    out: list = []
    for boff in range(0, len(data) - block_align + 1, block_align):
        block = data[boff : boff + block_align]
        preds, idxs = [], []
        for c in range(ch):
            p, ix, _ = struct.unpack_from("<hBB", block, 4 * c)
            preds.append(p)
            idxs.append(max(0, min(88, ix)))
        out.extend(preds)  # header predictor = first sample per channel
        nib_bytes = block[4 * ch :]
        n_groups = len(nib_bytes) // (4 * ch)
        chans: list[list] = [[] for _ in range(ch)]
        for g in range(n_groups):
            for c in range(ch):
                off = (g * ch + c) * 4
                for byte in nib_bytes[off : off + 4]:
                    for nib in (byte & 0xF, byte >> 4):
                        preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
                        chans[c].append(preds[c])
        for frame in zip(*chans):
            out.extend(frame)
    return out


def decode_wav(b: bytes) -> tuple[int, int, list]:
    """Pure-stdlib WAV sample decode: chunk walk → LE frames.  Returns
    (sample_rate, n_channels, samples, channel-interleaved).  The whole
    uncompressed family decodes — no codec library needed, the data
    chunk IS the samples:

    - integer PCM (format code 1) at 8/16/24/32 bit.  8-bit WAV is
      UNSIGNED by spec; it is recentred to signed (v − 128) so every
      integer width shares the signed-around-zero convention readers
      expect.  24-bit frames are sign-extended by hand (no struct code).
    - IEEE float (format code 3) at 32/64 bit — samples come back as
      Python floats in their native [−1, 1] domain, not rescaled.
    - WAVE_FORMAT_EXTENSIBLE (0xFFFE) resolves through its SubFormat
      tag to either of the above.

    IMA/DVI ADPCM (0x0011), MS-ADPCM (0x0002) and G.711 A-law / mu-law
    (codes 6 / 7) decode too — predictor/step tables and segment
    expansions are public-spec integer math, no codec library needed;
    other compressed codings (MP3, GSM 6.10, …) raise
    ``NotImplementedError`` naming the format code.  A trailing partial
    frame is ignored, the standard reader behavior for truncation."""
    if len(b) < 12 or bytes(b[:4]) != b"RIFF" or bytes(b[8:12]) != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    fmt_code = ch = rate = bits = None
    data = None
    fact_samples = None
    ms_coefs = list(_MS_COEFS)  # overridden by the fmt extension if present
    i = 12
    while i + 8 <= len(b):
        cid = bytes(b[i : i + 4])
        size = struct.unpack("<I", b[i + 4 : i + 8])[0]
        body = b[i + 8 : i + 8 + size]
        if cid == b"fact" and len(body) >= 4:
            # true per-channel sample count — mandatory for compressed
            # codings, whose last block is PADDED to block_align
            fact_samples = struct.unpack("<I", body[:4])[0]
        elif cid == b"fmt " and len(body) >= 16:
            fmt_code, ch, rate = struct.unpack("<HHI", body[:8])
            block_align = struct.unpack("<H", body[12:14])[0]
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt_code == 2 and len(body) >= 22:
                # MS-ADPCM fmt extension: samplesPerBlock, numCoef,
                # then numCoef (coef1, coef2) int16 pairs
                n_coef = struct.unpack("<H", body[20:22])[0]
                if len(body) >= 22 + 4 * n_coef and n_coef > 0:
                    ms_coefs = [
                        struct.unpack("<hh", body[22 + 4 * j : 26 + 4 * j])
                        for j in range(n_coef)
                    ]
            if fmt_code == 0xFFFE and len(body) >= 26:
                # EXTENSIBLE: the real coding is the SubFormat GUID's
                # leading 16-bit tag (offset 24 of the fmt body)
                fmt_code = struct.unpack("<H", body[24:26])[0]
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)
    if fmt_code is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    data = bytes(data)
    if fmt_code == 3:  # IEEE float
        if bits not in (32, 64):
            raise ValueError(f"WAV float bit depth {bits} invalid (32/64)")
        width = bits // 8
        n = len(data) // width
        return (
            int(rate),
            int(ch),
            list(struct.unpack(f"<{n}{'f' if bits == 32 else 'd'}", data[: n * width])),
        )
    if fmt_code in (6, 7):  # G.711 A-law / mu-law — table-free bit math
        if bits != 8:
            raise ValueError(f"G.711 bit depth {bits} invalid (8 only)")
        conv = _alaw_to_linear if fmt_code == 6 else _ulaw_to_linear
        samples = [conv(v) for v in data]
        if fact_samples is not None:
            samples = samples[: fact_samples * int(ch)]
        return int(rate), int(ch), samples
    if fmt_code == 2:  # MS-ADPCM — spec coefficient/adaptation tables
        if bits != 4:
            raise ValueError(f"MS-ADPCM bit depth {bits} invalid (4 only)")
        samples = _ms_adpcm_samples(data, int(ch), block_align, ms_coefs)
        if fact_samples is not None:
            samples = samples[: fact_samples * int(ch)]
        return int(rate), int(ch), samples
    if fmt_code == 0x11:  # IMA/DVI ADPCM — table-driven, no codec library
        if bits != 4:
            raise ValueError(f"IMA ADPCM bit depth {bits} invalid (4 only)")
        samples = _ima_adpcm_samples(data, int(ch), block_align)
        if fact_samples is not None:
            # drop the padding nibbles of the final block: spec encoders
            # pad to block_align and record the true count in 'fact'
            samples = samples[: fact_samples * int(ch)]
        return int(rate), int(ch), samples
    if fmt_code != 1:
        raise NotImplementedError(
            f"WAV format code {fmt_code} (PCM/float/IMA-ADPCM/MS-ADPCM/G.711 "
            "only; other compressed codings need an audio codec library)"
        )
    if bits == 8:  # unsigned by spec -> recentred signed
        return int(rate), int(ch), [v - 128 for v in data]
    if bits == 16:
        n = len(data) // 2
        return int(rate), int(ch), list(struct.unpack(f"<{n}h", data[: 2 * n]))
    if bits == 24:  # no struct code: assemble + sign-extend by hand
        n = len(data) // 3
        samples = []
        for j in range(n):
            v = data[3 * j] | (data[3 * j + 1] << 8) | (data[3 * j + 2] << 16)
            samples.append(v - (1 << 24) if v & 0x800000 else v)
        return int(rate), int(ch), samples
    if bits == 32:
        n = len(data) // 4
        return int(rate), int(ch), list(struct.unpack(f"<{n}i", data[: 4 * n]))
    raise ValueError(f"WAV PCM bit depth {bits} invalid (8/16/24/32)")


# ---- JPEG fixture tables: Annex K luminance DC (multi-length, public
# spec constants) + a fixed-8-bit canonical AC table over the full
# (run, size) symbol set — valid DHT payloads the generic decoder reads
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = bytes(range(12))
_JPEG_AC_VALS = bytes(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_JPEG_AC_BITS = [0] * 7 + [len(_JPEG_AC_VALS)] + [0] * 8


def _huffman_encode_table(bits: list[int], vals: bytes) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), inverse of :func:`_build_huffman`."""
    return {sym: (code, ln) for (ln, code), sym in _build_huffman(bits, vals).items()}


class _JpegBitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        for k in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s
        return bytes(self.out)


def flat_gray_jpeg(values, tiles_w: int, tiles_h: int) -> bytes:
    """A REAL baseline JPEG whose 8x8 tiles are flat gray values — one
    value per tile, row-major.  Flat tiles are DC-only blocks, which
    :func:`decode_jpeg` reproduces BIT-EXACTLY (quant table of ones, DC
    = 8·(v−128), IDCT of a lone DC = DC/8), so the planted pixel source
    survives the full entropy-decode → IDCT path untouched and a DuckDB
    twin can recompute stats from the source text."""
    assert len(values) == tiles_w * tiles_h
    dc_enc = _huffman_encode_table(_JPEG_DC_BITS, _JPEG_DC_VALS)
    eob_code = _huffman_encode_table(_JPEG_AC_BITS, _JPEG_AC_VALS)[0x00]
    wtr = _JpegBitWriter()
    pred = 0
    for v in values:
        dc = 8 * (int(v) - 128)
        diff = dc - pred
        pred = dc
        t = abs(diff).bit_length()
        wtr.put(*dc_enc[t])
        if t:
            wtr.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        wtr.put(*eob_code)
    entropy = wtr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    return (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + seg(
            0xC0,
            struct.pack(">BHHB", 8, tiles_h * 8, tiles_w * 8, 1)
            + bytes([1, 0x11, 0]),
        )
        + seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS) + _JPEG_DC_VALS)
        + seg(0xC4, bytes([0x10]) + bytes(_JPEG_AC_BITS) + _JPEG_AC_VALS)
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + entropy
        + b"\xff\xd9"
    )


# AC table holding only the EOBn symbols (r<<4, r=0..14) a progressive
# encoder needs for an all-zero-AC spectral band: 15 length-4 codes
_JPEG_EOBN_VALS = bytes(r << 4 for r in range(15))
_JPEG_EOBN_BITS = [0, 0, 0, 15] + [0] * 12


def flat_gray_jpeg_progressive(values, tiles_w: int, tiles_h: int) -> bytes:
    """Progressive (SOF2) twin of :func:`flat_gray_jpeg` — IDENTICAL
    pixels through three spectral-selection / successive-approximation
    scans (ITU-T T.81 Annex G): DC first at Al=1 (diffs of the
    point-transformed dc>>1), a DC refinement scan delivering bit 0,
    and an AC 1..63 first scan that is pure EOB runs (flat tiles have
    no AC energy).  Successive approximation reassembles the exact DC
    integers, so the decoded tiles stay bit-exact and the same DuckDB
    text twin covers both encodings."""
    assert len(values) == tiles_w * tiles_h
    dc_enc = _huffman_encode_table(_JPEG_DC_BITS, _JPEG_DC_VALS)
    dcs = [8 * (int(v) - 128) for v in values]

    w1 = _JpegBitWriter()  # scan 1: DC first, Ah=0 Al=1
    pred = 0
    for dc in dcs:
        t1 = dc >> 1  # the spec's DC point transform (arithmetic shift)
        diff = t1 - pred
        pred = t1
        t = abs(diff).bit_length()
        w1.put(*dc_enc[t])
        if t:
            w1.put(diff if diff >= 0 else diff + (1 << t) - 1, t)

    w2 = _JpegBitWriter()  # scan 2: DC refinement, Ah=1 Al=0 — raw bits
    for dc in dcs:
        w2.put(dc & 1, 1)

    w3 = _JpegBitWriter()  # scan 3: AC 1..63 first, all-EOB runs
    eob_enc = _huffman_encode_table(_JPEG_EOBN_BITS, _JPEG_EOBN_VALS)
    n = len(dcs)
    while n:
        r = min(14, n.bit_length() - 1)
        take = min(n, (1 << r) + ((1 << r) - 1))
        r = take.bit_length() - 1
        w3.put(*eob_enc[r << 4])
        if r:
            w3.put(take - (1 << r), r)
        n -= take

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    return (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + seg(
            0xC2,
            struct.pack(">BHHB", 8, tiles_h * 8, tiles_w * 8, 1)
            + bytes([1, 0x11, 0]),
        )
        + seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS) + _JPEG_DC_VALS)
        + seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))  # DC first Al=1
        + w1.flush()
        + seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))  # DC refine Ah=1
        + w2.flush()
        + seg(0xC4, bytes([0x10]) + bytes(_JPEG_EOBN_BITS) + _JPEG_EOBN_VALS)
        + seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))  # AC first
        + w3.flush()
        + b"\xff\xd9"
    )


def flat_cmyk_jpeg(
    channel_values, tiles_w: int, tiles_h: int, ycck: bool = False
) -> bytes:
    """A REAL 4-component Adobe JPEG whose 8x8 tiles are flat per-channel
    values — ``channel_values`` is four equal-length streams (C, M, Y, K
    as stored), one value per tile, row-major.  All components sample
    1:1, one interleaved baseline scan, quant table of ones, so every
    tile decodes BIT-EXACTLY like :func:`flat_gray_jpeg`'s.  An APP14
    'Adobe' segment carries transform 0 (raw CMYK) or 2 (YCCK,
    ``ycck=True`` — the channel values are then what the DECODER should
    OUTPUT; the encoder applies the forward YCbCr transform to the
    first three so the round trip lands back on them)."""
    assert len(channel_values) == 4
    assert all(len(ch) == tiles_w * tiles_h for ch in channel_values)
    chans = [list(map(float, ch)) for ch in channel_values]
    if ycck:
        # forward transform (JFIF RGB->YCbCr) over the first three
        # channels; flat tiles stay flat so DC-only encoding still holds
        fwd = []
        for r, g, bl in zip(*chans[:3]):
            fwd.append((
                0.299 * r + 0.587 * g + 0.114 * bl,
                128.0 - 0.168736 * r - 0.331264 * g + 0.5 * bl,
                128.0 + 0.5 * r - 0.418688 * g - 0.081312 * bl,
            ))
        chans = [
            [round(v[0]) for v in fwd],
            [round(v[1]) for v in fwd],
            [round(v[2]) for v in fwd],
            chans[3],
        ]
    dc_enc = _huffman_encode_table(_JPEG_DC_BITS, _JPEG_DC_VALS)
    eob_code = _huffman_encode_table(_JPEG_AC_BITS, _JPEG_AC_VALS)[0x00]
    wtr = _JpegBitWriter()
    preds = [0, 0, 0, 0]
    for t in range(tiles_w * tiles_h):
        for ci in range(4):
            dc = 8 * (int(chans[ci][t]) - 128)
            diff = dc - preds[ci]
            preds[ci] = dc
            tt = abs(diff).bit_length()
            wtr.put(*dc_enc[tt])
            if tt:
                wtr.put(diff if diff >= 0 else diff + (1 << tt) - 1, tt)
            wtr.put(*eob_code)
    entropy = wtr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    # 'Adobe' + version(2) + flags0(2) + flags1(2) + transform(1) = 12 bytes
    app14 = b"Adobe" + struct.pack(">HHHB", 100, 0, 0, 2 if ycck else 0)
    sof = struct.pack(">BHHB", 8, tiles_h * 8, tiles_w * 8, 4) + bytes(
        [1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0, 4, 0x11, 0]
    )
    sos = bytes([4, 1, 0x00, 2, 0x00, 3, 0x00, 4, 0x00, 0, 63, 0])
    return (
        b"\xff\xd8"
        + seg(0xEE, app14)
        + seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + seg(0xC0, sof)
        + seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS) + _JPEG_DC_VALS)
        + seg(0xC4, bytes([0x10]) + bytes(_JPEG_AC_BITS) + _JPEG_AC_VALS)
        + seg(0xDA, sos)
        + entropy
        + b"\xff\xd9"
    )


JPEG_TILES_W, JPEG_TILES_H = 16, 4  # 128x32 px: 64 tiles = 64 text bytes


def attach_real_jpeg(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, payload) where payload is a REAL baseline JPEG whose 64
    flat 8x8 tiles carry the doc's first 64 printable-ASCII text bytes
    space-padded (the same planted-pixel contract as
    :func:`attach_real_png`, through the JPEG entropy/IDCT path).  The
    container is built in an Arrow-batched UDF — a Huffman bitstream is
    a sequential bit fold, not a native-expression shape — but the
    PIXEL SOURCE stays the text, so the oracle never parses a JPEG.

    Odd ``doc_id`` rows get the PROGRESSIVE (SOF2) encoding of the SAME
    tiles (:func:`flat_gray_jpeg_progressive`) — byte-different
    container, bit-identical pixels — so every stats query over this
    fixture grades the progressive decode path against the unchanged
    text oracle."""
    from pyspark.sql.functions import pandas_udf

    n_tiles = JPEG_TILES_W * JPEG_TILES_H

    @pandas_udf("binary")
    def _jpeg(ids: pd.Series, texts: pd.Series) -> pd.Series:
        # ONE udf choosing the encoder per row: a F.when over two pandas
        # UDFs would evaluate BOTH (Spark hoists them out of the
        # conditional into unconditional ArrowEvalPython nodes) and
        # double the fixture-build CPU
        import re as _re

        def build(doc_id, text) -> bytes:
            clean = _re.sub(r"[^\x20-\x7E]", " ", text or "")
            vals = list(clean[:n_tiles].ljust(n_tiles).encode())
            enc = (
                flat_gray_jpeg_progressive
                if int(doc_id) % 2 == 1
                else flat_gray_jpeg
            )
            return enc(vals, JPEG_TILES_W, JPEG_TILES_H)

        return pd.Series(
            [build(i, t) for i, t in zip(ids, texts)], dtype=object
        )

    return docs.select(
        F.col(id_col).alias("doc_id"),
        _jpeg(F.col(id_col), F.col(text_col)).alias("payload"),
    )


MJPEG_FRAMES, MJPEG_TILES = 4, 4  # 4 frames of 4x4 tiles = 32x32 px each


def mjpeg_avi(frames: list[bytes], w: int, h: int) -> bytes:
    """A REAL minimal AVI wrapping MJPEG frames: RIFF(AVI ) → LIST hdrl
    (avih with dims, LIST strl with a 'vids'/'MJPG' strh + MJPG
    BITMAPINFOHEADER strf) → LIST movi of ``00dc`` chunks, one complete
    baseline JPEG each.  ``probe_avi_dims`` reads the avih;
    :func:`extract_avi_frames` demuxes the movi chunks back out."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<14I", 40_000, 0, 0, 0x10, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<I", 0) + struct.pack("<HH", 0, 0)
        + struct.pack("<9I", 0, 1, 25, 0, len(frames), 0, 0, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH", 40, w, h, 1, 24) + b"MJPG" + struct.pack(
        "<IiiII", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def attach_real_mjpeg(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, payload) where payload is a REAL MJPEG AVI: 4 frames of
    4x4 flat 8x8 tiles (32x32 px), carrying the doc's first 64
    printable-ASCII text bytes space-padded, 16 per frame — the video
    twin of :func:`attach_real_jpeg`'s planted-pixel contract.  Every
    frame is a complete baseline JPEG, so the demux → decode path runs
    with zero codec libraries and flat tiles keep it bit-exact."""
    from pyspark.sql.functions import pandas_udf

    n_tiles = MJPEG_FRAMES * MJPEG_TILES * MJPEG_TILES

    @pandas_udf("binary")
    def _avi(texts: pd.Series) -> pd.Series:
        import re as _re

        per_frame = MJPEG_TILES * MJPEG_TILES
        side = MJPEG_TILES * 8

        def build(text: str) -> bytes:
            clean = _re.sub(r"[^\x20-\x7E]", " ", text or "")
            vals = clean[:n_tiles].ljust(n_tiles).encode()
            frames = [
                flat_gray_jpeg(
                    list(vals[f * per_frame : (f + 1) * per_frame]),
                    MJPEG_TILES,
                    MJPEG_TILES,
                )
                for f in range(MJPEG_FRAMES)
            ]
            return mjpeg_avi(frames, side, side)

        return texts.map(build)

    return docs.select(
        F.col(id_col).alias("doc_id"), _avi(F.col(text_col)).alias("payload")
    )


def video_frame_stats(
    videos: DataFrame, n_frames: int = 4, payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-video pixel statistics through the REAL demux + decode path:
    :func:`sample_frames` explodes MJPEG frames executor-side, one
    Arrow-batched UDF decodes each frame (:func:`decode_image`), and a
    native aggregate folds the per-frame partials back to one row per
    video — (doc_id, n_frames, n_px, px_min, px_max, px_mean).  The
    mean is ONE IEEE division of exact longs, bit-stable cross-engine;
    undecodable frames contribute nothing (NULL partials drop out)."""
    from pyspark.sql.functions import pandas_udf

    frames = sample_frames(
        videos.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload")),
        n_frames=n_frames,
    )

    @pandas_udf("struct<n_px:long,px_sum:long,px_min:int,px_max:int>")
    def _fx(payloads: pd.Series) -> pd.DataFrame:
        rows = []
        for p in payloads:
            try:
                _w, _h, _ch, pix = decode_image(bytes(p))
                rows.append((len(pix), int(sum(pix)), int(min(pix)), int(max(pix))))
            except (ValueError, NotImplementedError, IndexError, struct.error):
                rows.append((None, None, None, None))
        return pd.DataFrame(rows, columns=["n_px", "px_sum", "px_min", "px_max"])

    per_frame = frames.select("doc_id", _fx(F.col("frame_payload")).alias("s"))
    return per_frame.groupBy("doc_id").agg(
        F.count(F.col("s.n_px")).cast("long").alias("n_frames"),
        F.sum("s.n_px").cast("long").alias("n_px"),
        F.min("s.px_min").cast("int").alias("px_min"),
        F.max("s.px_max").cast("int").alias("px_max"),
        (
            F.sum("s.px_sum").cast("double") / F.sum("s.n_px").cast("double")
        ).alias("px_mean"),
    )


def decode_image(b: bytes) -> tuple[int, int, int, bytes]:
    """Container dispatch for full pixel decode: PNG or baseline JPEG."""
    if bytes(b[:8]) == _PNG_SIG:
        return decode_png(b)
    if bytes(b[:2]) == b"\xff\xd8":
        return decode_jpeg(b)
    raise ValueError("unrecognized image container (PNG/JPEG pixel decode)")


def decode_payload(payload: bytes, modality: str):
    """Full pixel/sample decode.  The IMAGE and AUDIO paths are real —
    :func:`decode_png` (every valid PNG format), :func:`decode_jpeg`
    (baseline/extended-sequential Huffman) and :func:`decode_wav` (the
    whole uncompressed family), stdlib + numpy.  Compressed audio and
    video frame decode still need a codec library (soundfile / av),
    absent in this environment; those paths stay gated behind an import
    probe with an actionable error."""
    if modality == "image":
        return decode_image(bytes(payload))
    if modality == "audio":
        b = bytes(payload)
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            return decode_wav(b)
    try:  # pragma: no cover - decoders absent in this container
        if modality == "audio":
            import soundfile  # noqa: F401
        else:
            import av  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            f"no {modality} decoder available in this environment"
        ) from exc
    raise NotImplementedError("real decode not wired yet")


# ---------------------------------------------------------------------------
# Synthetic multimodal lake fixture (native expressions, real containers)
# ---------------------------------------------------------------------------

def _be32_hex(col: Column) -> Column:
    return F.lpad(F.hex(col), 8, "0")


def _le32_hex(col: Column) -> Column:
    h = _be32_hex(col)
    return F.concat(
        F.substring(h, 7, 2), F.substring(h, 5, 2), F.substring(h, 3, 2), F.substring(h, 1, 2)
    )


def attach_binary_payload(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Simulate a multimodal lake table: (doc_id, modality, payload binary,
    meta struct).  Image payloads are REAL minimal PNGs (signature + IHDR
    carrying planted dimensions + the text bytes as the data section);
    audio payloads are REAL canonical PCM WAV headers; video payloads are
    REAL minimal MP4s (ftyp + moov/trak/tkhd carrying planted track dims +
    an mdat box with the text bytes).  Modality cycles by id."""
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]),
        (F.col(id_col) % len(MODALITIES) + 1).cast("int"),
    )
    text_bytes = F.encode(F.col(text_col), "UTF-8")
    n_text = F.octet_length(text_bytes)

    width = (F.lit(64) + n_text % 577).cast("int")
    height = (F.lit(64) + (n_text * 31) % 577).cast("int")
    png = F.concat(
        F.unhex(
            F.concat(
                F.lit(PNG_HEADER_HEX),
                _be32_hex(width),
                _be32_hex(height),
                F.lit(PNG_TRAILER_HEX),
                # planted provenance tEXt chunk (Source = doc:<id>)
                F.lit(PNG_TEXT_CHUNK_PREFIX_HEX),
                F.hex(
                    F.encode(
                        F.lpad(
                            F.col(id_col).cast("string"),
                            PNG_TEXT_ID_DIGITS,
                            "0",
                        ),
                        "UTF-8",
                    )
                ),
                F.lit("00000000"),  # placeholder CRC
            )
        ),
        text_bytes,
    )

    wav = F.concat(
        F.unhex(
            F.concat(
                F.lit("52494646"),            # RIFF
                _le32_hex((n_text + F.lit(36)).cast("int")),
                F.lit("57415645"),            # WAVE
                F.lit("666D7420"),            # "fmt "
                F.lit("10000000"),            # fmt chunk size 16
                F.lit("0100"),                # PCM
                F.lit("0100"),                # mono
                _le32_hex(F.lit(WAV_SAMPLE_RATE)),
                _le32_hex(F.lit(WAV_SAMPLE_RATE * WAV_BLOCK_ALIGN)),
                F.lit("0200"),                # block align 2
                F.lit("1000"),                # 16-bit
                F.lit("64617461"),            # data
                _le32_hex(n_text.cast("int")),
            )
        ),
        text_bytes,
    )

    # tkhd width/height are 16.16 fixed point: 16-bit integer part (dims
    # are < 641 by construction) + a zero fraction
    mp4 = F.concat(
        F.unhex(
            F.concat(
                F.lit(MP4_FTYP_HEX),
                F.lit(MP4_MOOV_PREFIX_HEX),
                F.lpad(F.hex(width), 4, "0"),
                F.lit("0000"),
                F.lpad(F.hex(height), 4, "0"),
                F.lit("0000"),
                _be32_hex((n_text + F.lit(8)).cast("int")),  # mdat size
                F.lit("6D646174"),                           # "mdat"
            )
        ),
        text_bytes,
    )

    payload = (
        F.when(modality == "image", png)
        .when(modality == "audio", wav)
        .otherwise(mp4)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        modality.alias("modality"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.lit("synthetic/v1").alias("codec"),
        ).alias("meta"),
    )


# Real-IDAT grayscale PNG fixture: 16x4, bit depth 8, color type 0.  The
# IDAT is a genuine zlib stream — 0x78 0x01 header, ONE stored-deflate
# block (BFINAL=1, BTYPE=00, LEN=68, NLEN=~68) over the 4 scanlines
# (filter byte 0 + 16 pixel bytes each).  Every checksum is REAL and
# computed natively: chunk CRCs via Spark's crc32 (same polynomial as
# PNG), the Adler-32 via its closed form — s2 = n + Σ (n−j+1)·d_j lets
# the position-weighted sum collapse to one zip_with over a constant
# weight array, since the filter bytes contribute zero.  The payloads
# therefore pass an external `pngcheck`/PIL open, not just our probes.
# Pixels are the doc's first 64 printable-ASCII text bytes space-padded,
# so the DuckDB twin recomputes the stats from ``text`` without ever
# touching a PNG.
REAL_PNG_W, REAL_PNG_H = 16, 4
_REAL_PNG_DATA_LEN = REAL_PNG_H * (REAL_PNG_W + 1)  # 68: filter byte + row, x4


def _real_png_ihdr_hex(color_type: int = 0) -> str:
    import zlib

    body = struct.pack(">IIBBBBB", REAL_PNG_W, REAL_PNG_H, 8, color_type, 0, 0, 0)
    return (
        PNG_HEADER_HEX
        + body.hex().upper()
        + format(zlib.crc32(b"IHDR" + body), "08X")
    )


def _real_png_plte_hex() -> str:
    """The identity grayscale palette chunk (index i → (i,i,i), 256
    entries): a palette payload carries the SAME IDAT index bytes as the
    grayscale one, so the planted text stays the pixel source and the
    oracle's per-byte stats hold with the channel count tripled."""
    import zlib

    body = bytes(v for i in range(256) for v in (i, i, i))
    return (
        struct.pack(">I", len(body)).hex().upper()
        + (b"PLTE" + body).hex().upper()
        + format(zlib.crc32(b"PLTE" + body), "08X")
    )


REAL_PNG_IHDR_HEX = _real_png_ihdr_hex()
REAL_PNG_IHDR_PAL_HEX = _real_png_ihdr_hex(color_type=3)
REAL_PNG_PLTE_HEX = _real_png_plte_hex()
REAL_PNG_IDAT_LEN_HEX = "0000004F"  # 2 zlib hdr + 5 stored hdr + 68 data + 4 adler
REAL_PNG_IDAT_PREFIX_HEX = (
    "49444154"      # "IDAT"
    + "7801"        # zlib header (deflate, default window)
    + "01"          # stored block, BFINAL=1
    + "4400" + "BBFF"  # LEN=68 LE, NLEN=~LEN LE
)
REAL_PNG_IEND_HEX = "0000000049454E44AE426082"


def attach_real_png(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    palette: bool = False,
) -> DataFrame:
    """(doc_id, payload) where payload is a REAL, externally-valid 16x4
    grayscale PNG — correct signature/IHDR/IDAT/IEND framing, a genuine
    stored-deflate zlib stream, and REAL CRC-32 / Adler-32 checksums —
    whose pixel bytes are the doc's first 64 printable-ASCII text
    characters space-padded.  Built entirely from native expressions
    (crc32 + closed-form Adler), no UDF on the construction side.

    ``palette=True`` emits a color-type-3 PNG instead: the SAME IDAT
    (the text bytes become palette INDICES) plus a constant identity
    grayscale PLTE (index i → (i,i,i)), exercising the decoder's PLTE
    lookup path while keeping the planted text the pixel source — the
    decoded RGB stream is each text byte tripled."""
    n_px = REAL_PNG_W * REAL_PNG_H
    px = F.rpad(
        F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), r"[^\x20-\x7E]", " "),
        n_px,
        " ",
    )
    hx = F.hex(F.encode(px, "UTF-8"))  # 128 hex chars, 2 per pixel byte
    scanlines = F.concat(
        *[
            F.concat(F.lit("00"), F.substring(hx, r * REAL_PNG_W * 2 + 1, REAL_PNG_W * 2))
            for r in range(REAL_PNG_H)
        ]
    )
    # Adler-32 over the 68 raw deflate bytes: s1 = 1 + Σ d_j; the filter
    # bytes are zero, so s2 = 68 + Σ w_i·pixel_i with w_i = 68 − pos_i + 1
    # precomputed per pixel slot (pos_i = row·17 + 2 + col, 1-based)
    # split("(?!^)") keeps a trailing '' element — slice to exactly the 64
    # pixel slots or zip_with would NULL-pad against the weight array
    ords = F.slice(
        F.transform(F.split(px, "(?!^)"), lambda c: F.ascii(c).cast("long")),
        1,
        n_px,
    )
    weights = F.array(
        *[
            F.lit(_REAL_PNG_DATA_LEN - ((i // REAL_PNG_W) * (REAL_PNG_W + 1) + 2 + i % REAL_PNG_W) + 1).cast("long")
            for i in range(n_px)
        ]
    )
    zero = F.lit(0).cast("long")
    s1 = (
        F.lit(1).cast("long")
        + F.aggregate(ords, zero, lambda a, x: a + x)
    ) % 65521
    s2 = (
        F.lit(_REAL_PNG_DATA_LEN).cast("long")
        + F.aggregate(F.zip_with(ords, weights, lambda o, w: o * w), zero, lambda a, x: a + x)
    ) % 65521
    adler_hex = F.lpad(F.hex(s2 * F.lit(65536) + s1), 8, "0")
    idat_body_hex = F.concat(F.lit(REAL_PNG_IDAT_PREFIX_HEX), scanlines, adler_hex)
    idat_crc_hex = F.lpad(F.hex(F.crc32(F.unhex(idat_body_hex))), 8, "0")
    payload = F.unhex(
        F.concat(
            F.lit(REAL_PNG_IHDR_PAL_HEX if palette else REAL_PNG_IHDR_HEX),
            F.lit(REAL_PNG_PLTE_HEX if palette else ""),
            F.lit(REAL_PNG_IDAT_LEN_HEX),
            idat_body_hex,
            idat_crc_hex,
            F.lit(REAL_PNG_IEND_HEX),
        )
    )
    return docs.select(F.col(id_col).alias("doc_id"), payload.alias("payload"))


def attach_real_wav(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, payload) where payload is a REAL decodable 16-bit mono
    PCM WAV whose data chunk is the doc's printable-ASCII text bytes —
    every consecutive byte pair is one little-endian sample (ASCII hi
    bytes < 0x80, so samples land in [0x2020, 0x7E7E], always positive).
    Built from native expressions like :func:`attach_real_png`; a
    trailing odd byte is half a frame, which :func:`decode_wav` ignores."""
    txt = F.regexp_replace(
        F.coalesce(F.col(text_col), F.lit("")), r"[^\x20-\x7E]", " "
    )
    data = F.encode(txt, "UTF-8")
    n = F.octet_length(data)
    payload = F.concat(
        F.unhex(
            F.concat(
                F.lit("52494646"),                      # RIFF
                _le32_hex((n + F.lit(36)).cast("int")),
                F.lit("57415645"),                      # WAVE
                F.lit("666D7420"), F.lit("10000000"),   # "fmt ", size 16
                F.lit("0100"), F.lit("0100"),           # PCM, mono
                _le32_hex(F.lit(WAV_SAMPLE_RATE)),
                _le32_hex(F.lit(WAV_SAMPLE_RATE * WAV_BLOCK_ALIGN)),
                F.lit("0200"), F.lit("1000"),           # block align 2, 16-bit
                F.lit("64617461"),                      # data
                _le32_hex(n.cast("int")),
            )
        ),
        data,
    )
    return docs.select(F.col(id_col).alias("doc_id"), payload.alias("payload"))


def audio_sample_stats(
    audio: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Per-clip sample statistics through the REAL stdlib PCM decode
    path: (doc_id, sample_rate, n_samples, amp_min, amp_max, amp_mean).
    Same contract shape as :func:`image_pixel_stats` — one Arrow-batched
    UDF for the non-relational step, native arithmetic after; clips with
    no complete frame (or undecodable bytes) yield NULL amplitude stats.
    amp_mean = exact-integer sum / count is ONE IEEE division on both
    engines, so the twin matches bit-for-bit with no rounding."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(
        "struct<sample_rate:int,n_samples:int,amp_sum:long,amp_min:int,amp_max:int>"
    )
    def _smp(payloads: pd.Series) -> pd.DataFrame:
        rows = []
        for p in payloads:
            try:
                rate, _ch, samples = decode_wav(bytes(p))
                if samples:
                    rows.append(
                        (rate, len(samples), int(sum(samples)),
                         int(min(samples)), int(max(samples)))
                    )
                else:
                    rows.append((rate, 0, None, None, None))
            except (ValueError, NotImplementedError, IndexError, struct.error):
                rows.append((None, None, None, None, None))
        return pd.DataFrame(
            rows, columns=["sample_rate", "n_samples", "amp_sum", "amp_min", "amp_max"]
        )

    s = audio.select(F.col(id_col).alias("doc_id"), _smp(F.col(payload_col)).alias("s"))
    return s.select(
        "doc_id",
        F.col("s.sample_rate").alias("sample_rate"),
        F.col("s.n_samples").alias("n_samples"),
        F.col("s.amp_min").alias("amp_min"),
        F.col("s.amp_max").alias("amp_max"),
        F.when(
            F.col("s.n_samples") > 0,
            F.col("s.amp_sum").cast("double") / F.col("s.n_samples").cast("double"),
        ).alias("amp_mean"),
    )



def audio_waveform_features(
    audio: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_samples, rms, mean_crossing_rate, peak_to_peak) —
    waveform-shape features through the same REAL stdlib PCM decode as
    :func:`audio_sample_stats`: RMS energy, the rate of crossings of the
    clip's own amplitude mean (the DC-offset-free twin of zero-crossing
    rate — the planted ASCII-byte samples are all positive, so literal
    zero crossings would grade vacuously), and peak-to-peak amplitude.

    Exactness contract: the squared sum and crossing count are exact
    integers (amplitudes <= 0x7E7E, so sums stay far under 2^53); rms =
    sqrt(sq_sum / n) and mcr = crossings / (n - 1) are then single IEEE
    operations on both engines — bit-identical twin, no rounding.
    A crossing is counted when (a_i < mean) != (a_{i+1} < mean) with the
    mean itself one IEEE division of the exact integer sum.

    Scale shape: identical to every decode operator here —
    scan -> project(Arrow UDF) -> project, zero shuffles."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(
        "struct<n_samples:int,sq_sum:long,crossings:int,amp_min:int,amp_max:int>"
    )
    def _wf(payloads: pd.Series) -> pd.DataFrame:
        rows = []
        for p in payloads:
            try:
                _rate, _ch, samples = decode_wav(bytes(p))
                n = len(samples)
                if n:
                    mean = sum(samples) / n
                    lo = [a < mean for a in samples]
                    crossings = sum(
                        1 for i in range(n - 1) if lo[i] != lo[i + 1]
                    )
                    rows.append(
                        (
                            n,
                            int(sum(a * a for a in samples)),
                            crossings,
                            int(min(samples)),
                            int(max(samples)),
                        )
                    )
                else:
                    rows.append((0, None, None, None, None))
            except (ValueError, NotImplementedError, IndexError, struct.error):
                rows.append((None, None, None, None, None))
        return pd.DataFrame(
            rows,
            columns=["n_samples", "sq_sum", "crossings", "amp_min", "amp_max"],
        )

    s = audio.select(F.col(id_col).alias("doc_id"), _wf(F.col(payload_col)).alias("s"))
    n = F.col("s.n_samples")
    return s.select(
        "doc_id",
        n.alias("n_samples"),
        F.when(
            n > 0, F.sqrt(F.col("s.sq_sum").cast("double") / n.cast("double"))
        ).alias("rms"),
        F.when(
            n > 1,
            F.col("s.crossings").cast("double") / (n - 1).cast("double"),
        ).alias("mean_crossing_rate"),
        F.when(n > 0, F.col("s.amp_max") - F.col("s.amp_min")).alias(
            "peak_to_peak"
        ),
    )

CMYK_TILES_W, CMYK_TILES_H = 8, 8  # 64x64 px: 64 tiles/channel = 64 text bytes


def attach_real_cmyk(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, payload) where payload is a REAL 4-component Adobe CMYK
    JPEG (APP14 transform 0) whose flat 8x8 tiles derive all four
    channels from the doc's first 64 printable-ASCII bytes ``b``:
    C = b, M = 255−b, Y = (b+64) mod 256, K = (2b) mod 256 — four
    SQL-recomputable streams through the genuine 4-component entropy
    decode, each bit-exact (transform 0 applies no color math)."""
    from pyspark.sql.functions import pandas_udf

    n_tiles = CMYK_TILES_W * CMYK_TILES_H

    @pandas_udf("binary")
    def _cmyk(texts: pd.Series) -> pd.Series:
        import re as _re

        def build(text: str) -> bytes:
            clean = _re.sub(r"[^\x20-\x7E]", " ", text or "")
            vals = clean[:n_tiles].ljust(n_tiles).encode()
            chans = [
                list(vals),
                [255 - v for v in vals],
                [(v + 64) % 256 for v in vals],
                [(2 * v) % 256 for v in vals],
            ]
            return flat_cmyk_jpeg(chans, CMYK_TILES_W, CMYK_TILES_H)

        return texts.map(build)

    return docs.select(
        F.col(id_col).alias("doc_id"), _cmyk(F.col(text_col)).alias("payload")
    )


def cmyk_channel_stats(
    images: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Per-channel means of 4-component images through the real decode:
    (doc_id, width, height, c_mean, m_mean, y_mean, k_mean).  The means
    are exact dyadic quotients on the tile fixtures (64-px tiles, power-
    of-two pixel counts), so a DuckDB twin recomputes them from text
    with no rounding step.  Non-4-channel or undecodable payloads yield
    NULL stats (crawl corpora contain garbage)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(
        "struct<width:int,height:int,c_sum:long,m_sum:long,y_sum:long,k_sum:long>"
    )
    def _px(payloads: pd.Series) -> pd.DataFrame:
        import numpy as np

        rows = []
        for p in payloads:
            try:
                w, h, ch, pix = decode_image(bytes(p))
                if ch != 4:
                    raise ValueError("not 4-channel")
                a = np.frombuffer(pix, dtype=np.uint8).reshape(-1, 4)
                s = a.sum(axis=0, dtype=np.int64)
                rows.append((w, h, int(s[0]), int(s[1]), int(s[2]), int(s[3])))
            except (ValueError, NotImplementedError, IndexError, struct.error):
                rows.append((None, None, None, None, None, None))
        return pd.DataFrame(
            rows, columns=["width", "height", "c_sum", "m_sum", "y_sum", "k_sum"]
        )

    s = images.select(F.col(id_col).alias("doc_id"), _px(F.col(payload_col)).alias("s"))
    n = (F.col("s.width") * F.col("s.height")).cast("double")
    return s.select(
        "doc_id",
        F.col("s.width").alias("width"),
        F.col("s.height").alias("height"),
        (F.col("s.c_sum").cast("double") / n).alias("c_mean"),
        (F.col("s.m_sum").cast("double") / n).alias("m_mean"),
        (F.col("s.y_sum").cast("double") / n).alias("y_mean"),
        (F.col("s.k_sum").cast("double") / n).alias("k_mean"),
    )


def image_pixel_stats(
    images: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Per-image pixel statistics through the REAL stdlib decode path:
    (doc_id, width, height, n_px, px_min, px_max, px_mean) with the mean
    over all channel values.  One Arrow-batched pandas UDF per payload —
    the sanctioned Python edge for a genuinely non-relational step —
    everything after the struct is native column arithmetic.  Undecodable
    or unsupported payloads yield NULL stats rather than failing the job
    (crawl corpora contain garbage).  The mean is emitted as an exact
    double (sum / n) — for the 64-pixel fixture n is a power of two, so
    the quotient is dyadic and bit-identical across engines with no
    rounding step."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(
        "struct<width:int,height:int,channels:int,px_sum:long,px_min:int,px_max:int>"
    )
    def _px(payloads: pd.Series) -> pd.DataFrame:
        rows = []
        for p in payloads:
            try:
                w, h, ch, pix = decode_image(bytes(p))
                rows.append(
                    (w, h, ch, int(sum(pix)), int(min(pix)), int(max(pix)))
                )
            except (ValueError, NotImplementedError, IndexError, struct.error):
                rows.append((None, None, None, None, None, None))
        return pd.DataFrame(
            rows,
            columns=["width", "height", "channels", "px_sum", "px_min", "px_max"],
        )

    s = images.select(F.col(id_col).alias("doc_id"), _px(F.col(payload_col)).alias("s"))
    n_px = (F.col("s.width") * F.col("s.height") * F.col("s.channels")).cast("int")
    return s.select(
        "doc_id",
        F.col("s.width").alias("width"),
        F.col("s.height").alias("height"),
        n_px.alias("n_px"),
        F.col("s.px_min").alias("px_min"),
        F.col("s.px_max").alias("px_max"),
        (F.col("s.px_sum").cast("double") / n_px.cast("double")).alias("px_mean"),
    )


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


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_images(payloads: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stage — Arrow-batched ``mapInPandas`` over binary
    payloads (the distributed shape: one Python worker per partition,
    payload bytes never touch the driver).

    Pixel resampling needs a decoder (PIL) that is NOT in this container,
    so the pixel step is STUBBED: the output is a REAL PNG container
    carrying the target dimensions in its IHDR with the source's data
    section passed through unchanged — so the plumbing, schema, and
    container writing are genuinely exercised and a deployment swaps one
    function (the body pass-through) for ``PIL.Image.resize``.
    Non-image payloads pass through unchanged with NULL dims.
    """

    header = bytes.fromhex(PNG_HEADER_HEX)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ihdr_tail = bytes.fromhex(PNG_TRAILER_HEX)
        out_hdr = (
            header + struct.pack(">II", width, height) + ihdr_tail
        )
        for pdf in it:
            outs, ws, hs = [], [], []
            for b in pdf["payload"]:
                b = bytes(b)
                if probe_image_dims(b) is not None:
                    outs.append(out_hdr + payload_body(b, "image"))
                    ws.append(width)
                    hs.append(height)
                else:
                    outs.append(b)
                    ws.append(None)
                    hs.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": outs,
                    "width": pd.Series(ws, dtype="Int32"),
                    "height": pd.Series(hs, dtype="Int32"),
                }
            )

    return payloads.select("doc_id", "payload").mapInPandas(
        batches, schema=RESIZED_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def extract_avi_frames(b: bytes) -> list[bytes]:
    """The per-frame payloads of an AVI's ``movi`` list (``##dc``/``##db``
    chunks).  For an MJPEG AVI each returned element is a SELF-CONTAINED
    baseline JPEG — :func:`decode_jpeg` opens it with no codec library.
    Non-AVI bytes return an empty list."""
    if len(b) < 12 or bytes(b[:4]) != b"RIFF" or bytes(b[8:12]) != b"AVI ":
        return []
    frames: list[bytes] = []
    i = 12
    while i + 8 <= len(b):
        cid = bytes(b[i : i + 4])
        size = struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"LIST" and bytes(b[i + 8 : i + 12]) == b"movi":
            j = i + 12
            end = min(i + 8 + size, len(b))
            while j + 8 <= end:
                sub = bytes(b[j : j + 4])
                ssize = struct.unpack("<I", b[j + 4 : j + 8])[0]
                if sub[2:4] in (b"dc", b"db"):
                    frames.append(bytes(b[j + 8 : j + 8 + ssize]))
                j += 8 + ssize + (ssize & 1)
        i += 8 + size + (size & 1)
    return frames


def sample_frames(payloads: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame sampling — one output row per sampled frame, exploded
    executor-side inside the Arrow batch (never a driver-side explode).

    MJPEG-in-AVI is REAL since round 7: the ``movi`` chunks are demuxed
    (:func:`extract_avi_frames`) and ``n_frames`` frames are sampled
    evenly across them — each emitted ``frame_payload`` is a complete
    baseline JPEG that :func:`decode_jpeg` turns into pixels with no
    codec library.  Inter-frame codecs (H.264 etc.) still need a real
    decoder (``av``), absent here, so non-AVI containers keep the
    deterministic byte-range STUB: the data section split into
    ``n_frames`` contiguous ranges standing in for decoded frames.  The
    distributed shape — binary in, multiple binary rows out, stable
    ``frame_idx`` ordering — is identical either way.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(b)
                real = extract_avi_frames(raw)
                if real:
                    take = min(n_frames, len(real))
                    for fi in range(take):
                        ids.append(doc_id)
                        idxs.append(fi)
                        frames.append(real[fi * len(real) // take])
                    continue
                body = payload_body(raw, "video")
                if not body:
                    continue
                step = max(len(body) // n_frames, 1)
                for fi in range(min(n_frames, len(body))):
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(body[fi * step : fi * step + step])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_payload": frames,
                }
            )

    return payloads.select("doc_id", "payload").mapInPandas(
        batches, schema=FRAME_SCHEMA
    )


def extract_features(payloads: DataFrame) -> DataFrame:
    """Per-payload feature extraction via ``mapInPandas`` over Arrow batches
    of raw binary — the real distributed shape of a decode/featurize stage
    (one Python worker per partition, zero driver involvement).

    Features: byte length, data-section sha256 (:func:`payload_body` —
    container-stripped, so re-containerized copies of the same media dedup
    together), and decoded dimensions — REAL header parses for all three
    modalities: PNG/JPEG/GIF, WAV/FLAC/Ogg-Vorbis, and MP4/AVI.  Unparseable payloads
    yield NULL dims (honest failure, no guess)."""

    def dims_for(b: bytes, modality: str) -> tuple[int | None, int | None]:
        if modality == "image":
            return probe_image_dims(bytes(b)) or (None, None)
        if modality == "audio":
            return probe_audio(bytes(b)) or (None, None)
        return probe_video_dims(bytes(b)) or (None, None)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payload = pdf["payload"]
            dims = [
                dims_for(b, m) for b, m in zip(payload, pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": payload.map(len).astype("int32"),
                    "sha256": [
                        hashlib.sha256(payload_body(bytes(b), m)).hexdigest()
                        for b, m in zip(payload, pdf["modality"])
                    ],
                    "dim_1": pd.Series([d[0] for d in dims], dtype="Int32"),
                    "dim_2": pd.Series([d[1] for d in dims], dtype="Int32"),
                }
            )

    return payloads.select("doc_id", "modality", "payload").mapInPandas(
        batches, schema=FEATURE_SCHEMA
    )


def extract_png_text(b: bytes) -> list[tuple[str, str]]:
    """(key, value) pairs from a PNG's ``tEXt`` and uncompressed ``iTXt``
    chunks — the standard in-container metadata channel (author, source
    URL, generator) a multimodal pipeline wants WITHOUT a decoder.  Plain
    chunk walking (length-directed, CRC not validated — we read, not
    verify); stops at IEND or any malformed length."""
    out: list[tuple[str, str]] = []
    if len(b) < 8 or b[:8] != _PNG_SIG:
        return out
    i = 8
    while i + 8 <= len(b):
        (length,) = struct.unpack(">I", b[i : i + 4])
        ctype = b[i + 4 : i + 8]
        data_start = i + 8
        data_end = data_start + length
        if data_end + 4 > len(b):
            break
        data = b[data_start:data_end]
        if ctype == b"IEND":
            break
        if ctype == b"tEXt" and b"\x00" in data:
            k, _, v = data.partition(b"\x00")
            out.append((k.decode("latin-1"), v.decode("latin-1")))
        elif ctype == b"iTXt" and data.count(b"\x00") >= 4:
            k, _, rest = data.partition(b"\x00")
            if len(rest) >= 2 and rest[0] == 0:  # uncompressed only
                after_flags = rest[2:]
                _lang, _, rest2 = after_flags.partition(b"\x00")
                _trans, _, text = rest2.partition(b"\x00")
                out.append((k.decode("latin-1"), text.decode("utf-8", "replace")))
        i = data_end + 4  # skip CRC
    return out


# EXIF IFD0 ASCII tags worth surfacing without a decoder (provenance /
# tooling signals a multimodal curation pipeline filters on)
_EXIF_ASCII_TAGS = {
    0x010E: "ImageDescription",
    0x010F: "Make",
    0x0110: "Model",
    0x0131: "Software",
    0x0132: "DateTime",
    0x013B: "Artist",
    0x8298: "Copyright",
}


def _parse_tiff_ifd0(t: bytes) -> list[tuple[str, str]]:
    """ASCII tags + Orientation from a TIFF IFD0 (both byte orders);
    length-directed walking, malformed structures return what parsed."""
    out: list[tuple[str, str]] = []
    if len(t) < 8:
        return out
    if t[:2] == b"II":
        end = "<"
    elif t[:2] == b"MM":
        end = ">"
    else:
        return out
    (magic,) = struct.unpack(end + "H", t[2:4])
    if magic != 42:
        return out
    (off,) = struct.unpack(end + "I", t[4:8])
    if off + 2 > len(t):
        return out
    (n,) = struct.unpack(end + "H", t[off : off + 2])
    for k in range(n):
        e = off + 2 + 12 * k
        if e + 12 > len(t):
            break
        tag, typ, cnt = struct.unpack(end + "HHI", t[e : e + 8])
        val = t[e + 8 : e + 12]
        if tag in _EXIF_ASCII_TAGS and typ == 2:
            if cnt <= 4:
                raw = val[:cnt]
            else:
                (voff,) = struct.unpack(end + "I", val)
                if voff + cnt > len(t):
                    continue
                raw = t[voff : voff + cnt]
            out.append(
                (
                    _EXIF_ASCII_TAGS[tag],
                    raw.split(b"\x00")[0].decode("latin-1", "replace"),
                )
            )
        elif tag == 0x0112 and typ == 3 and cnt == 1:
            (ori,) = struct.unpack(end + "H", val[:2])
            out.append(("Orientation", str(ori)))
    return out


def extract_jpeg_exif(b: bytes) -> list[tuple[str, str]]:
    """(key, value) pairs from a JPEG's APP1 Exif segment — the other
    standard in-container metadata channel (camera make/model, software,
    timestamps, orientation), read by plain marker-segment walking like
    the PNG chunk walk: stdlib struct only, no codec, stops at SOS or
    any malformed length."""
    out: list[tuple[str, str]] = []
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return out
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            break
        marker = b[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # bare markers
            i += 2
            continue
        if marker == 0xDA:  # SOS: entropy-coded data follows
            break
        (seglen,) = struct.unpack(">H", b[i + 2 : i + 4])
        if seglen < 2 or i + 2 + seglen > len(b):
            break
        seg = b[i + 4 : i + 2 + seglen]
        if marker == 0xE1 and seg[:6] == b"Exif\x00\x00":
            out.extend(_parse_tiff_ifd0(seg[6:]))
        i += 2 + seglen
    return out


METADATA_SCHEMA = (
    "doc_id long, meta_key string, meta_value string"
)


def extract_metadata(payloads: DataFrame) -> DataFrame:
    """In-container metadata as long-form rows (doc_id, meta_key,
    meta_value) — PNG tEXt/iTXt and JPEG APP1 EXIF, dispatched by
    signature; one function per container to extend.  Same
    ``mapInPandas`` Arrow-batch shape as :func:`extract_features`;
    payloads with no metadata contribute no rows."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            keys: list[str] = []
            vals: list[str] = []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(b)
                pairs = (
                    extract_jpeg_exif(raw)
                    if raw[:2] == b"\xff\xd8"
                    else extract_png_text(raw)
                )
                for k, v in pairs:
                    ids.append(doc_id)
                    keys.append(k)
                    vals.append(v)
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "meta_key": pd.Series(keys, dtype="object"),
                 "meta_value": pd.Series(vals, dtype="object")}
            )

    return payloads.select("doc_id", "payload").mapInPandas(
        batches, schema=METADATA_SCHEMA
    )
