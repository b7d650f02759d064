"""Container-header probes (operators/multimodal.py): real PNG/JPEG/GIF/
WAV/MP4 byte parsing, data-section extraction, and the end-to-end Arrow
pipeline."""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import functions as F

from datalake_indexes_spark.operators.multimodal import (
    MP4_OVERHEAD,
    attach_binary_payload,
    extract_features,
    payload_body,
    probe_image_dims,
    probe_mp4_dims,
    probe_wav,
)


def _png(w: int, h: int, body: bytes = b"") -> bytes:
    ihdr = struct.pack(">II", w, h) + b"\x08\x06\x00\x00\x00"
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00\x00\x00\x00"
        + body
    )


def _jpeg_sof(w: int, h: int, progressive: bool = False) -> bytes:
    """SOI + APP0 + (comment) + SOF0/SOF2 — the markers a real camera file
    has before the frame header."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    com = b"\xff\xfe" + struct.pack(">H", 7) + b"hello"
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    sof = sof_marker + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + com + sof


def _wav(rate: int, data: bytes, extra_chunk: bool = False) -> bytes:
    fmt = (
        b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    )
    listc = (b"LIST" + struct.pack("<I", 4) + b"INFO") if extra_chunk else b""
    datac = b"data" + struct.pack("<I", len(data)) + data
    body = fmt + listc + datac
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _mp4(w: int, h: int, body: bytes = b"", version: int = 0, pre_boxes: bytes = b"") -> bytes:
    """Minimal real MP4: ftyp + moov(trak(tkhd carrying w/h)) + mdat.
    ``version=1`` emits 64-bit tkhd times; ``pre_boxes`` injects sibling
    boxes (e.g. ``udta``) before the trak to exercise the box walk."""
    if version:
        tkhd_body = (
            b"\x01\x00\x00\x07" + b"\x00" * 16 + struct.pack(">I", 1)
            + b"\x00" * 4 + b"\x00" * 8 + b"\x00" * 16
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", w << 16, h << 16)
        )
    else:
        tkhd_body = (
            b"\x00\x00\x00\x07" + b"\x00" * 8 + struct.pack(">I", 1)
            + b"\x00" * 4 + b"\x00" * 4 + b"\x00" * 8 + b"\x00" * 8
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", w << 16, h << 16)
        )
    tkhd = struct.pack(">I", 8 + len(tkhd_body)) + b"tkhd" + tkhd_body
    trak = struct.pack(">I", 8 + len(tkhd)) + b"trak" + tkhd
    moov_body = pre_boxes + trak
    moov = struct.pack(">I", 8 + len(moov_body)) + b"moov" + moov_body
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 512)
    mdat = struct.pack(">I", 8 + len(body)) + b"mdat" + body
    return ftyp + moov + mdat


def test_png_dims():
    assert probe_image_dims(_png(640, 480)) == (640, 480)


def test_jpeg_sof_baseline_and_progressive():
    assert probe_image_dims(_jpeg_sof(1024, 768)) == (1024, 768)
    assert probe_image_dims(_jpeg_sof(320, 200, progressive=True)) == (320, 200)


def test_gif_dims():
    gif = b"GIF89a" + struct.pack("<HH", 99, 44) + b"\x00" * 4
    assert probe_image_dims(gif) == (99, 44)


def test_unparseable_image_returns_none():
    assert probe_image_dims(b"not an image at all") is None
    assert probe_image_dims(b"") is None


def test_wav_probe_and_extra_chunk():
    data = b"\x01\x02" * 50
    assert probe_wav(_wav(44100, data)) == (44100, 50)
    # non-canonical layout: LIST chunk between fmt and data still parses
    assert probe_wav(_wav(8000, data, extra_chunk=True)) == (8000, 50)
    assert probe_wav(b"RIFFxxxxNOPE") is None


def test_mp4_tkhd_dims():
    assert probe_mp4_dims(_mp4(1920, 1080)) == (1920, 1080)
    # version-1 tkhd (64-bit times) shifts the width/height offset
    assert probe_mp4_dims(_mp4(640, 360, version=1)) == (640, 360)
    # a sibling box before trak must be skipped, not tripped over
    udta = struct.pack(">I", 12) + b"udta" + b"\x00" * 4
    assert probe_mp4_dims(_mp4(320, 240, pre_boxes=udta)) == (320, 240)
    assert probe_mp4_dims(b"definitely not an mp4") is None
    assert probe_mp4_dims(b"") is None


def test_payload_body_strips_containers():
    body = b"media-bytes"
    assert payload_body(_png(10, 10, body), "image") == body
    assert payload_body(_wav(16000, body), "audio") == body
    assert payload_body(_mp4(64, 64, body), "video") == body
    # container-less bytes pass through whole
    assert payload_body(body, "video") == body


def test_end_to_end_fixture_parses(spark):
    """The planted containers round-trip: dims recovered by PARSING match
    the planted formulas, and sha256 equals the text-bytes hash."""
    docs = spark.createDataFrame(
        [(i, f"document number {i} with some text padding" * (i + 1)) for i in range(9)],
        "doc_id long, text string",
    )
    feats = {
        r["doc_id"]: r
        for r in extract_features(attach_binary_payload(docs)).collect()
    }
    for i in range(9):
        text = f"document number {i} with some text padding" * (i + 1)
        n = len(text.encode())
        r = feats[i]
        assert r["sha256"] == hashlib.sha256(text.encode()).hexdigest()
        mod = ["image", "audio", "video"][i % 3]
        assert r["modality"] == mod
        if mod == "image":
            from datalake_indexes_spark.operators.multimodal import (
                PNG_OVERHEAD,
                PNG_TEXT_CHUNK_BYTES,
            )

            assert (r["dim_1"], r["dim_2"]) == (64 + n % 577, 64 + (n * 31) % 577)
            # PNG container + the planted 32-byte tEXt provenance chunk
            assert r["n_bytes"] == n + PNG_OVERHEAD + PNG_TEXT_CHUNK_BYTES
        elif mod == "audio":
            assert (r["dim_1"], r["dim_2"]) == (16000, n // 2)
            assert r["n_bytes"] == n + 44
        else:  # video: dims parsed back out of the planted MP4 tkhd
            assert (r["dim_1"], r["dim_2"]) == (64 + n % 577, 64 + (n * 31) % 577)
            assert r["n_bytes"] == n + MP4_OVERHEAD


def test_corrupt_image_payload_null_dims(spark):
    """An image payload that is not a parsable container yields NULL dims,
    not fabricated ones."""
    df = spark.createDataFrame(
        [(1, "image", bytearray(b"garbage"))], "doc_id long, modality string, payload binary"
    )
    r = extract_features(df).collect()[0]
    assert r["dim_1"] is None and r["dim_2"] is None
    assert r["sha256"] == hashlib.sha256(b"garbage").hexdigest()


def test_resize_rewrites_container(spark):
    from datalake_indexes_spark.operators.multimodal import resize_images

    body = b"pixels-stand-in"
    df = spark.createDataFrame(
        [(1, bytearray(_png(640, 480, body))), (2, bytearray(b"not an image"))],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in resize_images(df, 128, 96).collect()}
    r1 = out[1]
    assert (r1["width"], r1["height"]) == (128, 96)
    # output is a REAL PNG: parsing it yields the target dims, and the
    # data section survives untouched
    assert probe_image_dims(bytes(r1["payload"])) == (128, 96)
    assert payload_body(bytes(r1["payload"]), "image") == body
    # non-image passes through with NULL dims
    assert bytes(out[2]["payload"]) == b"not an image"
    assert out[2]["width"] is None


def test_sample_frames_deterministic_split(spark):
    from datalake_indexes_spark.operators.multimodal import sample_frames

    payload = bytes(range(40))
    df = spark.createDataFrame(
        [(7, bytearray(payload))], "doc_id long, payload binary"
    )
    frames = sorted(
        (r["frame_idx"], bytes(r["frame_payload"])) for r in sample_frames(df, 4).collect()
    )
    assert [i for i, _ in frames] == [0, 1, 2, 3]
    assert b"".join(b for _, b in frames) == payload  # contiguous cover


def _avi(w: int, h: int) -> bytes:
    """Minimal real AVI: RIFF/'AVI ' + LIST hdrl + avih with dwWidth/dwHeight."""
    avih_body = b"\x00" * 32 + struct.pack("<II", w, h) + b"\x00" * 16
    avih = b"avih" + struct.pack("<I", len(avih_body)) + avih_body
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih)) + b"hdrl" + avih
    movi = b"LIST" + struct.pack("<I", 4) + b"movi"
    body = hdrl + movi
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


def test_avi_dims_and_video_dispatch():
    from datalake_indexes_spark.operators.multimodal import (
        probe_avi_dims,
        probe_video_dims,
    )

    assert probe_avi_dims(_avi(720, 576)) == (720, 576)
    assert probe_avi_dims(_wav(16000, b"x")) is None  # RIFF but WAVE, not AVI
    # the dispatch resolves both container families
    assert probe_video_dims(_avi(720, 576)) == (720, 576)
    assert probe_video_dims(_mp4(1280, 720)) == (1280, 720)
    assert probe_video_dims(b"neither") is None


def _flac(sample_rate: int, total_samples: int) -> bytes:
    """Minimal real FLAC: magic + one (last) STREAMINFO block."""
    packed = (sample_rate << 44) | (2 << 41) | (15 << 36) | total_samples
    body = bytes(10) + packed.to_bytes(8, "big") + bytes(16)  # 34-byte body
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def _ogg(sample_rate: int, granule: int) -> bytes:
    """Two minimal Ogg pages: id-header page + data page with granule."""
    import struct as _s

    ident = b"\x01vorbis" + bytes(4) + b"\x02" + _s.pack("<I", sample_rate) + bytes(16)
    page1 = (
        b"OggS" + bytes([0, 2]) + _s.pack("<q", 0)
        + bytes(12) + bytes([1, len(ident)]) + ident
    )
    page2 = (
        b"OggS" + bytes([0, 4]) + _s.pack("<q", granule)
        + bytes(12) + bytes([1, 1]) + b"\x00"
    )
    return page1 + page2


def test_probe_flac():
    from datalake_indexes_spark.operators.multimodal import probe_audio, probe_flac

    assert probe_flac(_flac(44100, 123456)) == (44100, 123456)
    assert probe_flac(b"fLaCxx") is None
    assert probe_flac(b"NOPE") is None
    assert probe_audio(_flac(22050, 99)) == (22050, 99)


def test_probe_ogg_vorbis():
    from datalake_indexes_spark.operators.multimodal import (
        probe_audio,
        probe_ogg_vorbis,
    )

    assert probe_ogg_vorbis(_ogg(48000, 96000)) == (48000, 96000)
    assert probe_ogg_vorbis(b"OggS" + bytes(60)) is None  # not a vorbis id page
    assert probe_audio(_ogg(8000, 4000)) == (8000, 4000)


class TestPngTextMetadata:
    @staticmethod
    def _png_with_chunks(chunks: list[tuple[bytes, bytes]]) -> bytes:
        import struct as st

        b = b"\x89PNG\r\n\x1a\n"
        ihdr = st.pack(">IIBBBBB", 5, 7, 8, 6, 0, 0, 0)
        b += st.pack(">I", len(ihdr)) + b"IHDR" + ihdr + b"\x00" * 4
        for ctype, data in chunks:
            b += st.pack(">I", len(data)) + ctype + data + b"\x00" * 4
        b += st.pack(">I", 0) + b"IEND" + b"\x00" * 4
        return b

    def test_text_and_itxt_chunks(self):
        from datalake_indexes_spark.operators.multimodal import extract_png_text

        png = self._png_with_chunks(
            [
                (b"tEXt", b"Author\x00alice"),
                (b"tEXt", b"Source\x00https://example.org/cat.png"),
                (b"iTXt", b"Comment\x00\x00\x00en\x00\x00a cat \xf0\x9f\x90\x88"),
                (b"iTXt", b"Zipped\x00\x01\x00en\x00\x00ignored-compressed"),
            ]
        )
        got = extract_png_text(png)
        assert got == [
            ("Author", "alice"),
            ("Source", "https://example.org/cat.png"),
            ("Comment", "a cat \U0001f408"),
        ]

    def test_non_png_and_truncated(self):
        from datalake_indexes_spark.operators.multimodal import extract_png_text

        assert extract_png_text(b"\xff\xd8\xff\xe0 not png") == []
        png = self._png_with_chunks([(b"tEXt", b"K\x00v")])
        assert extract_png_text(png[:20]) == []

    def test_extract_metadata_frame(self, spark):
        from datalake_indexes_spark.operators.multimodal import extract_metadata

        rows = [
            (1, self._png_with_chunks([(b"tEXt", b"Author\x00bob")])),
            (2, b"RIFF....WAVE"),  # no metadata -> contributes nothing
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = [(r["doc_id"], r["meta_key"], r["meta_value"])
               for r in extract_metadata(df).collect()]
        assert got == [(1, "Author", "bob")]


class TestJpegExif:
    @staticmethod
    def _jpeg_with_exif(endian: str = "<") -> bytes:
        import struct as st

        tag_order = "II" if endian == "<" else "MM"
        # IFD0: Make (inline would not fit -> offset), Orientation inline
        make = b"Acme\x00"
        n_entries = 2
        ifd_off = 8
        data_off = ifd_off + 2 + n_entries * 12 + 4  # after next-IFD ptr
        tiff = tag_order.encode() + st.pack(endian + "H", 42)
        tiff += st.pack(endian + "I", ifd_off)
        tiff += st.pack(endian + "H", n_entries)
        tiff += st.pack(endian + "HHII", 0x010F, 2, len(make), data_off)
        tiff += st.pack(endian + "HHI", 0x0112, 3, 1)
        tiff += st.pack(endian + "H", 6) + b"\x00\x00"  # orientation=6 inline
        tiff += st.pack(endian + "I", 0)  # no next IFD
        tiff += make
        payload = b"Exif\x00\x00" + tiff
        app1 = b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload
        return b"\xff\xd8" + app1 + b"\xff\xda\x00\x02" + b"entropy..."

    def test_exif_both_endians(self):
        from datalake_indexes_spark.operators.multimodal import extract_jpeg_exif

        for e in ("<", ">"):
            got = extract_jpeg_exif(self._jpeg_with_exif(e))
            assert got == [("Make", "Acme"), ("Orientation", "6")], e

    def test_exif_robustness(self):
        from datalake_indexes_spark.operators.multimodal import extract_jpeg_exif

        assert extract_jpeg_exif(b"\x89PNG\r\n\x1a\n") == []
        assert extract_jpeg_exif(self._jpeg_with_exif()[:10]) == []
        assert extract_jpeg_exif(b"\xff\xd8\xff\xe0\x00\x04ab") == []

    def test_metadata_dispatch(self, spark):
        from datalake_indexes_spark.operators.multimodal import extract_metadata

        png = TestPngTextMetadata._png_with_chunks([(b"tEXt", b"Author\x00bob")])
        rows = [(1, png), (2, self._jpeg_with_exif())]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = sorted(
            (r["doc_id"], r["meta_key"], r["meta_value"])
            for r in extract_metadata(df).collect()
        )
        assert got == [(1, "Author", "bob"), (2, "Make", "Acme"),
                       (2, "Orientation", "6")]


class TestPngPixelDecode:
    """The real stdlib decode path: zlib inflate + scanline unfilter."""

    @staticmethod
    def _filter_rows(rows, bpp, filters):
        """Independent implementation of the five PNG filters over
        packed scanline bytes (one sub-image's worth)."""
        raw = b""
        prev = bytes(len(rows[0])) if rows else b""
        for r, row in enumerate(rows):
            ft = filters[r % len(filters)]
            enc = bytearray()
            for x in range(len(row)):
                a = row[x - bpp] if x >= bpp else 0
                up = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ft == 0:
                    v = row[x]
                elif ft == 1:
                    v = (row[x] - a) & 0xFF
                elif ft == 2:
                    v = (row[x] - up) & 0xFF
                elif ft == 3:
                    v = (row[x] - ((a + up) >> 1)) & 0xFF
                else:
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                    v = (row[x] - pred) & 0xFF
                enc.append(v)
            raw += bytes([ft]) + bytes(enc)
            prev = row
        return raw

    @staticmethod
    def _real_png(w, h, ch, pixels, filters, bd=8, palette=None, trns=None,
                  interlace=0):
        """Independent PNG encoder.  ``pixels`` semantics by depth:
        bd=16 → the big-endian byte stream (2 bytes per sample);
        bd=8 → one byte per sample; bd<8 → a sequence of sample VALUES
        in [0, 2^bd) (one per pixel; ch must be 1), packed MSB-first
        here.  ``interlace=1`` emits Adam7: the seven sub-images are
        extracted, packed and filtered independently."""
        import zlib

        def chunk(t, d):
            return (
                struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d))
            )

        ct = 3 if palette is not None else {1: 0, 2: 4, 3: 2, 4: 6}[ch]
        ihdr = struct.pack(">IIBBBBB", w, h, bd, ct, 0, 0, 1 if interlace else 0)
        bytes_pp = 2 if bd == 16 else 1  # input units per sample (bd>=8)

        def pack_row(samples):
            """One scanline of per-pixel sample units -> packed bytes."""
            if bd >= 8:
                return bytes(samples)
            out = bytearray()
            acc = nbits = 0
            for v in samples:
                acc = (acc << bd) | v
                nbits += bd
                if nbits == 8:
                    out.append(acc)
                    acc = nbits = 0
            if nbits:
                out.append(acc << (8 - nbits))
            return bytes(out)

        unit = ch * bytes_pp if bd >= 8 else ch  # input units per pixel

        def grid_row(y):
            return pixels[y * w * unit : (y + 1) * w * unit]

        bpp = max(1, (ch * bd) // 8)
        if not interlace:
            rows = [pack_row(grid_row(y)) for y in range(h)]
            raw = TestPngPixelDecode._filter_rows(rows, bpp, filters)
        else:
            raw = b""
            passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                      (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
            for x0, y0, dx, dy in passes:
                pw = (w - x0 + dx - 1) // dx if w > x0 else 0
                ph = (h - y0 + dy - 1) // dy if h > y0 else 0
                if pw == 0 or ph == 0:
                    continue
                rows = []
                for j in range(ph):
                    gr = grid_row(y0 + j * dy)
                    samples = []
                    for px in range(pw):
                        x = x0 + px * dx
                        samples.extend(gr[x * unit : (x + 1) * unit])
                    rows.append(pack_row(samples))
                raw += TestPngPixelDecode._filter_rows(rows, bpp, filters)
        extra = b""
        if palette is not None:
            extra += chunk(b"PLTE", palette)
        if trns is not None:
            extra += chunk(b"tRNS", trns)
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + extra
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b"")
        )

    def test_roundtrip_all_filters_and_channels(self):
        """Real compressed IDATs, every filter type, gray/GA/RGB/RGBA."""
        import random

        from datalake_indexes_spark.operators.multimodal import decode_png

        rng = random.Random(7)
        for ch in (1, 2, 3, 4):
            for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
                w, h = 13, 9
                pixels = bytes(rng.randrange(256) for _ in range(w * h * ch))
                got = decode_png(self._real_png(w, h, ch, pixels, filters))
                assert got == (w, h, ch, pixels), (ch, filters)

    def test_roundtrip_palette(self):
        """Color type 3: PLTE lookup (RGB), and tRNS alpha (RGBA); the
        filter runs over index bytes (bpp=1), the lookup after it."""
        import random

        from datalake_indexes_spark.operators.multimodal import decode_png

        rng = random.Random(11)
        plte = bytes(rng.randrange(256) for _ in range(256 * 3))
        w, h = 13, 9
        idx = bytes(rng.randrange(256) for _ in range(w * h))
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            got = decode_png(self._real_png(w, h, 1, idx, filters, palette=plte))
            exp = b"".join(plte[3 * v : 3 * v + 3] for v in idx)
            assert got == (w, h, 3, exp), filters
        # tRNS: first 40 entries get explicit alpha, the rest default 255
        trns = bytes(rng.randrange(256) for _ in range(40))
        got = decode_png(
            self._real_png(w, h, 1, idx, [4], palette=plte, trns=trns)
        )
        exp = b"".join(
            plte[3 * v : 3 * v + 3] + bytes([trns[v] if v < 40 else 255])
            for v in idx
        )
        assert got == (w, h, 4, exp)

    def test_roundtrip_16bit(self):
        """16-bit samples: the byte-level filters run at bpp=2·ch and the
        decoder reduces to 8-bit by the high (big-endian first) byte."""
        import random

        from datalake_indexes_spark.operators.multimodal import decode_png

        rng = random.Random(13)
        w, h = 7, 5
        for ch in (1, 2, 3, 4):
            raw = bytes(rng.randrange(256) for _ in range(w * h * ch * 2))
            for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
                got = decode_png(self._real_png(w, h, ch, raw, filters, bd=16))
                assert got == (w, h, ch, raw[0::2]), (ch, filters)

    def test_roundtrip_subbyte_gray(self):
        """1/2/4-bit grayscale: filters run over PACKED bytes (bpp=1),
        bit unpacking + the exact 255/(2^bd−1) scaling after."""
        import random

        from datalake_indexes_spark.operators.multimodal import decode_png

        rng = random.Random(17)
        for bd, scale in [(1, 255), (2, 85), (4, 17)]:
            # widths that do AND don't fill the last byte (row padding)
            for w in (8, 13):
                h = 9
                vals = [rng.randrange(1 << bd) for _ in range(w * h)]
                for filters in ([0], [2], [0, 1, 2, 3, 4]):
                    got = decode_png(
                        self._real_png(w, h, 1, vals, filters, bd=bd)
                    )
                    assert got == (w, h, 1, bytes(v * scale for v in vals)), (
                        bd, w, filters,
                    )

    def test_roundtrip_subbyte_palette(self):
        """1/2/4-bit palette indices: packed filtering, unscaled indices,
        PLTE lookup after."""
        import random

        from datalake_indexes_spark.operators.multimodal import decode_png

        rng = random.Random(19)
        for bd in (1, 2, 4):
            n_entries = 1 << bd
            plte = bytes(rng.randrange(256) for _ in range(n_entries * 3))
            w, h = 13, 6
            idx = [rng.randrange(n_entries) for _ in range(w * h)]
            got = decode_png(
                self._real_png(w, h, 1, idx, [0, 1, 2, 3, 4], bd=bd, palette=plte)
            )
            exp = b"".join(plte[3 * v : 3 * v + 3] for v in idx)
            assert got == (w, h, 3, exp), bd

    def test_adam7_pass_table_matches_spec(self):
        """The pass table must PARTITION the pixel grid and reproduce the
        spec's 8x8 pass-number pattern — a roundtrip can't catch a wrong
        table because the test encoder shares it."""
        from datalake_indexes_spark.operators.multimodal import _ADAM7

        spec = [
            "16462646",
            "77777777",
            "56565656",
            "77777777",
            "36463646",
            "77777777",
            "56565656",
            "77777777",
        ]
        grid = [[0] * 8 for _ in range(8)]
        for p, (x0, y0, dx, dy) in enumerate(_ADAM7, start=1):
            for y in range(y0, 8, dy):
                for x in range(x0, 8, dx):
                    assert grid[y][x] == 0, "pass table double-covers a pixel"
                    grid[y][x] = p
        assert ["".join(map(str, row)) for row in grid] == spec

    def test_roundtrip_adam7(self):
        """Adam7: seven independently filtered sub-images scatter back to
        the full grid — every color mode, including dims < 8 where some
        passes are empty."""
        import random

        from datalake_indexes_spark.operators.multimodal import decode_png

        rng = random.Random(23)
        for w, h in [(13, 9), (16, 8), (3, 2), (1, 1), (8, 5)]:
            for ch in (1, 2, 3, 4):
                pixels = bytes(rng.randrange(256) for _ in range(w * h * ch))
                got = decode_png(
                    self._real_png(w, h, ch, pixels, [0, 1, 2, 3, 4], interlace=1)
                )
                assert got == (w, h, ch, pixels), (w, h, ch)
        # 16-bit + Adam7 (high-byte reduction after per-pass unfilter)
        raw = bytes(rng.randrange(256) for _ in range(13 * 9 * 3 * 2))
        got = decode_png(
            self._real_png(13, 9, 3, raw, [4, 3], bd=16, interlace=1)
        )
        # expected: high byte of each pixel's samples, in grid order
        exp = raw[0::2]
        assert got == (13, 9, 3, exp)
        # sub-byte + Adam7 (packed per-pass scanlines)
        vals = [rng.randrange(4) for _ in range(13 * 9)]
        got = decode_png(
            self._real_png(13, 9, 1, vals, [2, 0, 1], bd=2, interlace=1)
        )
        assert got == (13, 9, 1, bytes(v * 85 for v in vals))
        # palette + Adam7
        plte = bytes(rng.randrange(256) for _ in range(16 * 3))
        idx = [rng.randrange(16) for _ in range(13 * 9)]
        got = decode_png(
            self._real_png(13, 9, 1, idx, [1, 4], bd=4, palette=plte, interlace=1)
        )
        assert got == (13, 9, 3, b"".join(plte[3 * v : 3 * v + 3] for v in idx))

    def test_invalid_formats_named(self):
        import pytest

        from datalake_indexes_spark.operators.multimodal import decode_png

        with pytest.raises(ValueError, match="signature"):
            decode_png(b"GIF89a")
        # RGB at sub-byte depth is not a valid PNG combination
        png = bytearray(self._real_png(4, 4, 3, bytes(48), [0]))
        png[24] = 4  # bit depth byte inside IHDR
        with pytest.raises(ValueError, match="invalid for color type"):
            decode_png(bytes(png))
        # 16-bit palette indices don't exist either
        plte = bytes(range(48))
        png = bytearray(self._real_png(4, 4, 1, bytes(16), [0], palette=plte))
        png[24] = 16
        with pytest.raises(ValueError, match="invalid for color type"):
            decode_png(bytes(png))
        # palette index beyond the 16-entry PLTE is data corruption
        png = self._real_png(2, 2, 1, bytes([0, 1, 2, 20]), [0], palette=plte)
        with pytest.raises(ValueError, match="palette index"):
            decode_png(png)

    def test_fixture_roundtrip_via_spark(self, spark):
        """attach_real_png -> image_pixel_stats recovers the exact planted
        text bytes (decode_payload's image path is real end-to-end)."""
        from datalake_indexes_spark.operators.multimodal import (
            attach_real_png,
            decode_payload,
            image_pixel_stats,
        )

        docs = spark.createDataFrame(
            [(1, "hello world"), (2, "x" * 200), (3, None)],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in image_pixel_stats(attach_real_png(docs)).collect()}
        for did, text in [(1, "hello world"), (2, "x" * 200), (3, "")]:
            px = (text[:64] + " " * 64)[:64].encode()
            r = out[did]
            assert (r.width, r.height, r.n_px) == (16, 4, 64)
            assert r.px_min == min(px) and r.px_max == max(px)
            assert r.px_mean == sum(px) / 64
        # the payload itself decodes through the public entry point
        payload = attach_real_png(docs).filter("doc_id = 1").collect()[0]["payload"]
        w, h, ch, pix = decode_payload(bytes(payload), "image")
        assert (w, h, ch) == (16, 4, 1)
        assert pix == ("hello world" + " " * 64)[:64].encode()

    def test_palette_fixture_roundtrip_via_spark(self, spark):
        """attach_real_png(palette=True) plants a color-type-3 PNG whose
        identity-grayscale PLTE makes the decoded RGB stream each text
        byte tripled — stats keep min/max/mean, n_px gains x3."""
        from datalake_indexes_spark.operators.multimodal import (
            attach_real_png,
            decode_payload,
            image_pixel_stats,
        )

        docs = spark.createDataFrame(
            [(1, "hello world"), (2, None)], "doc_id long, text string"
        )
        pal = attach_real_png(docs, palette=True)
        out = {r["doc_id"]: r for r in image_pixel_stats(pal).collect()}
        for did, text in [(1, "hello world"), (2, "")]:
            px = (text[:64] + " " * 64)[:64].encode()
            r = out[did]
            assert (r.width, r.height, r.n_px) == (16, 4, 192)
            assert r.px_min == min(px) and r.px_max == max(px)
            assert r.px_mean == sum(px) / 64
        payload = bytes(pal.filter("doc_id = 1").collect()[0]["payload"])
        w, h, ch, pix = decode_payload(payload, "image")
        assert (w, h, ch) == (16, 4, 3)
        exp = ("hello world" + " " * 64)[:64].encode()
        assert pix == bytes(v for b in exp for v in (b, b, b))


class TestWavSampleDecode:
    """The real stdlib PCM decode path."""

    @staticmethod
    def _wav(fmt_code, ch, rate, bits, data, extensible=False):
        if extensible:
            # fmt body: WAVE_FORMAT_EXTENSIBLE + cbSize(22) + validBits +
            # channelMask + SubFormat GUID whose leading u16 is the code
            body = struct.pack(
                "<HHIIHHHHI", 0xFFFE, ch, rate, rate * ch * bits // 8,
                ch * bits // 8, bits, 22, bits, 0,
            ) + struct.pack("<H", fmt_code) + bytes(14)
        else:
            body = struct.pack(
                "<HHIIHH", fmt_code, ch, rate, rate * ch * bits // 8,
                ch * bits // 8, bits,
            )
        return (
            b"RIFF" + struct.pack("<I", 20 + len(body) + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(body)) + body
            + b"data" + struct.pack("<I", len(data)) + data
        )

    def test_roundtrip_against_stdlib_wave_writer(self, tmp_path):
        """WAVs written by Python's own `wave` module (real canonical
        PCM files) decode to the exact samples at EVERY integer width it
        writes (8 unsigned / 16 / 24 / 32), mono and stereo."""
        import io
        import wave

        from datalake_indexes_spark.operators.multimodal import decode_wav

        cases = {
            1: ([0, 1, 255, 128, 7], lambda s: bytes(s), lambda s: [v - 128 for v in s]),
            2: (
                [0, 1, -1, 32767, -32768, 12345, -12345, 7],
                lambda s: struct.pack(f"<{len(s)}h", *s),
                lambda s: s,
            ),
            3: (
                [0, 1, -1, 8388607, -8388608, 123456, -123456],
                lambda s: b"".join(
                    (v & 0xFFFFFF).to_bytes(3, "little") for v in s
                ),
                lambda s: s,
            ),
            4: (
                [0, 1, -1, 2147483647, -2147483648, 1234567, -7],
                lambda s: struct.pack(f"<{len(s)}i", *s),
                lambda s: s,
            ),
        }
        for width, (base, pack, expect) in cases.items():
            for ch in (1, 2):
                samples = base * ch
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(ch)
                    w.setsampwidth(width)
                    w.setframerate(22050)
                    w.writeframes(pack(samples))
                rate, got_ch, got = decode_wav(buf.getvalue())
                assert (rate, got_ch, got) == (22050, ch, expect(samples)), width

    def test_float_and_extensible(self):
        """IEEE-float WAV (format 3, 32/64-bit) returns native floats;
        WAVE_FORMAT_EXTENSIBLE resolves through its SubFormat tag."""
        from datalake_indexes_spark.operators.multimodal import decode_wav

        vals = [0.0, 1.0, -1.0, 0.25, -0.3125]
        f32 = self._wav(3, 1, 48000, 32, struct.pack("<5f", *vals))
        assert decode_wav(f32) == (48000, 1, vals)
        f64 = self._wav(3, 1, 8000, 64, struct.pack("<5d", *vals))
        assert decode_wav(f64) == (8000, 1, vals)
        # extensible wrapping PCM-16 and float-32
        pcm = self._wav(1, 2, 44100, 16, struct.pack("<4h", 5, -5, 700, -700),
                        extensible=True)
        assert decode_wav(pcm) == (44100, 2, [5, -5, 700, -700])
        fx = self._wav(3, 1, 16000, 32, struct.pack("<2f", 0.5, -0.5),
                       extensible=True)
        assert decode_wav(fx) == (16000, 1, [0.5, -0.5])

    def test_unsupported_features_named(self):
        import pytest

        from datalake_indexes_spark.operators.multimodal import decode_wav

        # MP3-in-WAV stays gated (a real codec; mu-law, A-law, IMA and
        # MS ADPCM all decode as of round 8)
        with pytest.raises(NotImplementedError, match="format code"):
            decode_wav(self._wav(0x55, 1, 8000, 16, b""))
        # nonsense PCM width is data corruption, not a gate
        with pytest.raises(ValueError, match="bit depth"):
            decode_wav(self._wav(1, 1, 8000, 12, b""))
        with pytest.raises(ValueError, match="float bit depth"):
            decode_wav(self._wav(3, 1, 8000, 16, b""))

    def test_fixture_roundtrip_via_spark(self, spark):
        from datalake_indexes_spark.operators.multimodal import (
            attach_real_wav,
            audio_sample_stats,
            decode_payload,
        )

        docs = spark.createDataFrame(
            [(1, "hello world!"), (2, "x"), (3, None)],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in audio_sample_stats(attach_real_wav(docs)).collect()}
        b = b"hello world!"
        exp = [b[2 * i] + 256 * b[2 * i + 1] for i in range(6)]
        r = out[1]
        assert r.sample_rate == 16000 and r.n_samples == 6
        assert (r.amp_min, r.amp_max) == (min(exp), max(exp))
        assert r.amp_mean == sum(exp) / 6
        # 1-byte and empty texts: no complete frame -> NULL stats
        assert out[2].n_samples == 0 and out[2].amp_mean is None
        assert out[3].n_samples == 0 and out[3].amp_min is None
        # decode through the public dispatch
        payload = attach_real_wav(docs).filter("doc_id = 1").collect()[0]["payload"]
        rate, ch, samples = decode_payload(bytes(payload), "audio")
        assert (rate, ch, samples) == (16000, 1, exp)


def test_real_png_fixture_is_externally_valid(spark):
    """The planted PNGs carry REAL checksums: every chunk CRC matches
    zlib.crc32 and strict zlib.decompress (which VERIFIES Adler-32)
    accepts the IDAT — an external pngcheck/PIL would open these."""
    import zlib

    from datalake_indexes_spark.operators.multimodal import attach_real_png

    docs = spark.createDataFrame(
        [(1, "checksummed!"), (2, "y" * 300), (3, None)],
        "doc_id long, text string",
    )
    for palette in (False, True):
        for r in attach_real_png(docs, palette=palette).collect():
            b = bytes(r["payload"])
            i, idat, kinds = 8, b"", []
            while i + 8 <= len(b):
                clen = struct.unpack(">I", b[i : i + 4])[0]
                t, d = b[i + 4 : i + 8], b[i + 8 : i + 8 + clen]
                crc = struct.unpack(">I", b[i + 8 + clen : i + 12 + clen])[0]
                assert crc == zlib.crc32(t + d), (r["doc_id"], t)
                kinds.append(t)
                if t == b"IDAT":
                    idat += d
                i += 12 + clen
                if t == b"IEND":
                    break
            assert (b"PLTE" in kinds) == palette
            assert len(zlib.decompress(idat)) == 68  # strict: Adler verified


def test_decode_png_hypothesis_roundtrip():
    """Property fuzz: arbitrary dims/pixels under a per-row random
    filter assignment round-trip through the real decoder (the encode
    side is an independent implementation of the PNG filters) — every
    valid mode: gray at 1/2/4/8/16 bit, GA/RGB/RGBA at 8/16, palette at
    1/2/4/8 with and without tRNS, non-interlaced AND Adam7."""
    from hypothesis import given, settings, strategies as st

    from datalake_indexes_spark.operators.multimodal import decode_png

    @settings(max_examples=80, deadline=None)
    @given(
        st.integers(1, 12),      # width
        st.integers(1, 10),      # height
        st.sampled_from(
            [(ch, bd) for ch in (1, 2, 3, 4) for bd in (8, 16)]
            + [(1, bd) for bd in (1, 2, 4)]
            + [("p", bd) for bd in (1, 2, 4, 8)]
            + [("pt", 8)]
        ),
        st.booleans(),           # Adam7
        st.data(),
    )
    def check(w, h, mode, adam7, data):
        ch, bd = mode
        interlace = 1 if adam7 else 0
        filters = data.draw(
            st.lists(st.integers(0, 4), min_size=max(h, 1), max_size=max(h, 1))
        )
        byte = st.integers(0, 255)
        if ch in ("p", "pt"):
            n_entries = data.draw(st.integers(1, 1 << bd))
            plte = bytes(
                data.draw(
                    st.lists(byte, min_size=n_entries * 3, max_size=n_entries * 3)
                )
            )
            idx = data.draw(
                st.lists(
                    st.integers(0, n_entries - 1), min_size=w * h, max_size=w * h
                )
            )
            trns = None
            if ch == "pt":
                n_trns = data.draw(st.integers(0, n_entries))
                trns = bytes(
                    data.draw(st.lists(byte, min_size=n_trns, max_size=n_trns))
                )
            png = TestPngPixelDecode._real_png(
                w, h, 1, idx if bd < 8 else bytes(idx), filters,
                bd=bd, palette=plte, trns=trns, interlace=interlace,
            )
            if trns is None:
                exp = (3, b"".join(plte[3 * v : 3 * v + 3] for v in idx))
            else:
                exp = (
                    4,
                    b"".join(
                        plte[3 * v : 3 * v + 3]
                        + bytes([trns[v] if v < len(trns) else 255])
                        for v in idx
                    ),
                )
            assert decode_png(png) == (w, h, *exp)
            return
        if bd < 8:  # sub-byte grayscale: values in [0, 2^bd)
            vals = data.draw(
                st.lists(st.integers(0, (1 << bd) - 1), min_size=w * h, max_size=w * h)
            )
            png = TestPngPixelDecode._real_png(
                w, h, 1, vals, filters, bd=bd, interlace=interlace
            )
            scale = 255 // ((1 << bd) - 1)
            assert decode_png(png) == (w, h, 1, bytes(v * scale for v in vals))
            return
        n = w * h * ch * (2 if bd == 16 else 1)
        pixels = bytes(data.draw(st.lists(byte, min_size=n, max_size=n)))
        png = TestPngPixelDecode._real_png(
            w, h, ch, pixels, filters, bd=bd, interlace=interlace
        )
        expected = pixels[0::2] if bd == 16 else pixels
        assert decode_png(png) == (w, h, ch, expected)

    check()


def test_decode_wav_hypothesis_roundtrip():
    """Property fuzz: arbitrary samples/channel counts at every integer
    width the stdlib `wave` module writes (8 unsigned / 16 / 24 / 32)
    round-trip through the written container."""
    import io
    import wave

    from hypothesis import given, settings, strategies as st

    from datalake_indexes_spark.operators.multimodal import decode_wav

    @settings(max_examples=60, deadline=None)
    @given(
        st.integers(1, 3),
        st.integers(8000, 48000),
        st.sampled_from([1, 2, 3, 4]),
        st.data(),
    )
    def check(ch, rate, width, data):
        lo, hi = (0, 255) if width == 1 else (
            -(1 << (8 * width - 1)), (1 << (8 * width - 1)) - 1
        )
        samples = data.draw(st.lists(st.integers(lo, hi), min_size=0, max_size=120))
        samples = samples[: len(samples) - len(samples) % ch]
        mask = (1 << (8 * width)) - 1
        frames = b"".join((v & mask).to_bytes(width, "little") for v in samples)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wv:
            wv.setnchannels(ch)
            wv.setsampwidth(width)
            wv.setframerate(rate)
            wv.writeframes(frames)
        expect = [v - 128 for v in samples] if width == 1 else samples
        assert decode_wav(buf.getvalue()) == (rate, ch, expect)

    check()


class TestJpegPixelDecode:
    """The real baseline JPEG decode path: Huffman entropy decode →
    dequant → IDCT → upsample → color transform.  The encoder here is an
    independent implementation (explicit-loop FDCT, its own RLE walk);
    general blocks compare within ±1 (two float summation orders can
    round a half-case apart), flat tiles must be bit-exact."""

    @staticmethod
    def _tables():
        from datalake_indexes_spark.operators.multimodal import (
            _JPEG_AC_BITS, _JPEG_AC_VALS, _JPEG_DC_BITS, _JPEG_DC_VALS,
            _huffman_encode_table,
        )

        return (
            _huffman_encode_table(_JPEG_DC_BITS, _JPEG_DC_VALS),
            _huffman_encode_table(_JPEG_AC_BITS, _JPEG_AC_VALS),
            bytes(_JPEG_DC_BITS) + _JPEG_DC_VALS,
            bytes(_JPEG_AC_BITS) + _JPEG_AC_VALS,
        )

    @staticmethod
    def _fdct_loop(block):
        """Explicit O(64^2) loop FDCT (independent of the decoder's
        matrix-product IDCT)."""
        import math

        out = [[0.0] * 8 for _ in range(8)]
        for u in range(8):
            for v in range(8):
                s = 0.0
                for x in range(8):
                    for y in range(8):
                        s += (
                            block[y][x]
                            * math.cos((2 * x + 1) * u * math.pi / 16)
                            * math.cos((2 * y + 1) * v * math.pi / 16)
                        )
                cu = 1 / math.sqrt(2) if u == 0 else 1.0
                cv = 1 / math.sqrt(2) if v == 0 else 1.0
                out[v][u] = s * cu * cv / 4.0
        return out

    @staticmethod
    def _idct_loop(coef):
        import math

        out = [[0.0] * 8 for _ in range(8)]
        for y in range(8):
            for x in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        cu = 1 / math.sqrt(2) if u == 0 else 1.0
                        cv = 1 / math.sqrt(2) if v == 0 else 1.0
                        s += (
                            cu * cv * coef[v][u]
                            * math.cos((2 * x + 1) * u * math.pi / 16)
                            * math.cos((2 * y + 1) * v * math.pi / 16)
                        )
                out[y][x] = s / 4.0
        return out

    @classmethod
    def _encode(cls, planes, sampling, quant, quant_nat, ri=0):
        """Encode component planes (lists of rows, already at their
        subsampled resolutions) as a baseline JPEG.  Returns (jpeg bytes,
        expected decoded planes at subsampled res from the independent
        loop IDCT)."""
        from datalake_indexes_spark.operators.multimodal import (
            _ZIGZAG, _JpegBitWriter,
        )

        dc_enc, ac_enc, dht_dc, dht_ac = cls._tables()
        hmax = max(s[0] for s in sampling)
        vmax = max(s[1] for s in sampling)
        h, w = len(planes[0]), len(planes[0][0])
        mcux = (w + 8 * hmax - 1) // (8 * hmax)
        mcuy = (h + 8 * vmax - 1) // (8 * vmax)

        padded, expected = [], []
        for p, (sh, sv) in zip(planes, sampling):
            ph, pw = mcuy * sv * 8, mcux * sh * 8
            rows = [list(r) + [r[-1]] * (pw - len(r)) for r in p]
            rows += [list(rows[-1])] * (ph - len(rows))
            padded.append(rows)
            expected.append([[0.0] * pw for _ in range(ph)])

        wtr = _JpegBitWriter()
        pred = [0] * len(planes)
        n_mcu = mcux * mcuy
        entropy_parts = []
        rst = 0
        for mcu in range(n_mcu):
            if ri and mcu and mcu % ri == 0:
                entropy_parts.append(wtr.flush())
                entropy_parts.append(bytes([0xFF, 0xD0 + rst % 8]))
                rst += 1
                wtr = _JpegBitWriter()
                pred = [0] * len(planes)
            my, mx = divmod(mcu, mcux)
            for ci, (sh, sv) in enumerate(sampling):
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blk = [
                            [padded[ci][y0 + y][x0 + x] - 128.0 for x in range(8)]
                            for y in range(8)
                        ]
                        coef = cls._fdct_loop(blk)
                        # quantize in natural order, walk zigzag
                        qnat = [
                            int(round(coef[k // 8][k % 8] / quant_nat[k]))
                            for k in range(64)
                        ]
                        zz = [qnat[z] for z in _ZIGZAG]
                        # DC
                        diff = zz[0] - pred[ci]
                        pred[ci] = zz[0]
                        t = abs(diff).bit_length()
                        wtr.put(*dc_enc[t])
                        if t:
                            wtr.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
                        # AC run-length
                        run = 0
                        for k in range(1, 64):
                            if zz[k] == 0:
                                run += 1
                                continue
                            while run > 15:
                                wtr.put(*ac_enc[0xF0])
                                run -= 16
                            s = abs(zz[k]).bit_length()
                            wtr.put(*ac_enc[(run << 4) | s])
                            v = zz[k]
                            wtr.put(v if v >= 0 else v + (1 << s) - 1, s)
                            run = 0
                        if run:
                            wtr.put(*ac_enc[0x00])
                        # independent expectation: dequant + loop IDCT
                        deq = [
                            [qnat[y * 8 + x] * quant_nat[y * 8 + x] for x in range(8)]
                            for y in range(8)
                        ]
                        rec = cls._idct_loop(deq)
                        for y in range(8):
                            for x in range(8):
                                expected[ci][y0 + y][x0 + x] = rec[y][x] + 128.0
        entropy_parts.append(wtr.flush())
        entropy = b"".join(entropy_parts)

        def seg(marker, payload):
            return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

        nc = len(planes)
        sof = struct.pack(">BHHB", 8, h, w, nc)
        sos = bytes([nc])
        for ci, (sh, sv) in enumerate(sampling):
            sof += bytes([ci + 1, (sh << 4) | sv, 0])
            sos += bytes([ci + 1, 0x00])
        out = b"\xff\xd8" + seg(0xDB, bytes([0x00]) + bytes(quant))
        out += seg(0xC0, sof)
        out += seg(0xC4, bytes([0x00]) + dht_dc)
        out += seg(0xC4, bytes([0x10]) + dht_ac)
        if ri:
            out += seg(0xDD, struct.pack(">H", ri))
        out += seg(0xDA, sos + bytes([0, 63, 0])) + entropy + b"\xff\xd9"
        return out, expected

    def test_grayscale_general_blocks(self):
        """Random non-flat blocks, quality-style quant table: decoder
        output matches the independent loop FDCT→quant→dequant→IDCT
        expectation within ±1."""
        import random

        from datalake_indexes_spark.operators.multimodal import decode_jpeg

        rng = random.Random(31)
        w, h = 24, 16
        plane = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
        quant_zig = [1 + (k % 7) for k in range(64)]  # varied, small
        from datalake_indexes_spark.operators.multimodal import _ZIGZAG
        quant_nat = [0] * 64
        for k, z in enumerate(_ZIGZAG):
            quant_nat[z] = quant_zig[k]
        jpg, expected = self._encode([plane], [(1, 1)], quant_zig, quant_nat)
        gw, gh, ch, pix = decode_jpeg(jpg)
        assert (gw, gh, ch) == (w, h, 1)
        for y in range(h):
            for x in range(w):
                exp = min(255, max(0, round(expected[0][y][x])))
                assert abs(pix[y * w + x] - exp) <= 1, (x, y)

    def test_color_420_and_restart(self):
        """3-component 4:2:0 with a restart interval: chroma planes at
        quarter resolution, RST markers every 2 MCUs; decoded RGB
        matches the replicate-upsample + BT.601 transform of the
        independent expectation within ±1."""
        import random

        from datalake_indexes_spark.operators.multimodal import decode_jpeg, _ZIGZAG

        rng = random.Random(37)
        w, h = 32, 16  # 2x1 MCUs at 4:2:0
        quant_zig = [1] * 64
        quant_nat = [1] * 64
        luma = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
        cb = [[rng.randrange(256) for _ in range(w // 2)] for _ in range(h // 2)]
        cr = [[rng.randrange(256) for _ in range(w // 2)] for _ in range(h // 2)]
        jpg, expected = self._encode(
            [luma, cb, cr], [(2, 2), (1, 1), (1, 1)], quant_zig, quant_nat, ri=1
        )
        gw, gh, ch, pix = decode_jpeg(jpg)
        assert (gw, gh, ch) == (w, h, 3)
        for y in range(h):
            for x in range(w):
                yy = expected[0][y][x]
                cbv = expected[1][y // 2][x // 2] - 128.0
                crv = expected[2][y // 2][x // 2] - 128.0
                exp = [
                    yy + 1.402 * crv,
                    yy - 0.344136 * cbv - 0.714136 * crv,
                    yy + 1.772 * cbv,
                ]
                for c in range(3):
                    e = min(255, max(0, round(exp[c])))
                    got = pix[(y * w + x) * 3 + c]
                    assert abs(got - e) <= 1, (x, y, c)

    def test_flat_tiles_bit_exact_and_fixture(self, spark):
        """Flat tiles through the public fixture: bit-exact text bytes,
        end-to-end through Spark."""
        from datalake_indexes_spark.operators.multimodal import (
            attach_real_jpeg,
            decode_payload,
            image_pixel_stats,
        )

        docs = spark.createDataFrame(
            [(1, "jpeg says hi"), (2, "z" * 200), (3, None)],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in
               image_pixel_stats(attach_real_jpeg(docs)).collect()}
        for did, text in [(1, "jpeg says hi"), (2, "z" * 200), (3, "")]:
            px = (text[:64] + " " * 64)[:64].encode()
            r = out[did]
            assert (r.width, r.height, r.n_px) == (128, 32, 4096)
            assert r.px_min == min(px) and r.px_max == max(px)
            assert r.px_mean == sum(px) * 64 / 4096
        payload = attach_real_jpeg(docs).filter("doc_id = 1").collect()[0]["payload"]
        w, h, ch, pix = decode_payload(bytes(payload), "image")
        assert (w, h, ch) == (128, 32, 1)
        exp = ("jpeg says hi" + " " * 64)[:64].encode()
        assert all(
            pix[(ty * 8 + yy) * 128 + tx * 8 + xx] == exp[ty * 16 + tx]
            for ty in range(4) for tx in range(16)
            for yy in range(8) for xx in range(8)
        )

    def test_unsupported_sofs_named(self):
        import pytest

        from datalake_indexes_spark.operators.multimodal import (
            decode_jpeg, flat_gray_jpeg,
        )

        jpg = bytearray(flat_gray_jpeg([100] * 64, 16, 4))
        sof = jpg.find(b"\xff\xc0")
        # SOF2 decodes now (round 9) — but a baseline full-band scan
        # relabelled progressive violates the Annex-G DC-scan constraint
        # (Ss=0 requires Se=0), a malformed-stream ValueError
        jpg[sof + 1] = 0xC2
        with pytest.raises(ValueError, match="Se"):
            decode_jpeg(bytes(jpg))
        jpg[sof + 1] = 0xC9  # arithmetic sequential
        with pytest.raises(NotImplementedError, match="SOF9"):
            decode_jpeg(bytes(jpg))
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"\x89PNG")


class TestMjpegVideo:
    """Real MJPEG-in-AVI demux + per-frame JPEG decode."""

    def test_avi_demux_roundtrip(self):
        from datalake_indexes_spark.operators.multimodal import (
            decode_image, extract_avi_frames, flat_gray_jpeg, mjpeg_avi,
            probe_video_dims,
        )

        import random

        rng = random.Random(41)
        vals = [rng.randrange(256) for _ in range(64)]
        frames = [flat_gray_jpeg(vals[f * 16 : (f + 1) * 16], 4, 4) for f in range(4)]
        avi = mjpeg_avi(frames, 32, 32)
        assert probe_video_dims(avi) == (32, 32)
        assert extract_avi_frames(avi) == frames
        # every demuxed frame is a complete, decodable JPEG
        for f, fr in enumerate(extract_avi_frames(avi)):
            w, h, ch, pix = decode_image(fr)
            assert (w, h, ch) == (32, 32, 1)
            for t in range(16):
                v = vals[f * 16 + t]
                ty, tx = divmod(t, 4)
                assert pix[(ty * 8) * 32 + tx * 8] == v
        # odd-length frames exercise RIFF padding
        odd = frames[0] + b"\x00"  # JPEG ignores trailing byte after EOI
        avi2 = mjpeg_avi([odd, frames[1]], 32, 32)
        assert extract_avi_frames(avi2) == [odd, frames[1]]
        assert extract_avi_frames(b"not an avi") == []

    def test_sample_frames_real_path(self, spark):
        """sample_frames emits the ACTUAL movi chunks for an MJPEG AVI
        (not byte-range stubs) with stable frame_idx ordering."""
        from datalake_indexes_spark.operators.multimodal import (
            flat_gray_jpeg, mjpeg_avi, sample_frames,
        )

        frames = [flat_gray_jpeg([i * 10 + 40] * 16, 4, 4) for i in range(8)]
        avi = mjpeg_avi(frames, 32, 32)
        df = spark.createDataFrame([(1, bytearray(avi))], "doc_id long, payload binary")
        out = sorted(
            (r["frame_idx"], bytes(r["frame_payload"]))
            for r in sample_frames(df, n_frames=4).collect()
        )
        # 4 sampled evenly from 8: strides 0, 2, 4, 6
        assert [ix for ix, _ in out] == [0, 1, 2, 3]
        assert [fp for _, fp in out] == [frames[0], frames[2], frames[4], frames[6]]

    def test_video_frame_stats_end_to_end(self, spark):
        from datalake_indexes_spark.operators.multimodal import (
            attach_real_mjpeg, video_frame_stats,
        )

        docs = spark.createDataFrame(
            [(1, "motion jpeg!"), (2, "q" * 100), (3, None)],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in
               video_frame_stats(attach_real_mjpeg(docs)).collect()}
        for did, text in [(1, "motion jpeg!"), (2, "q" * 100), (3, "")]:
            px = (text[:64] + " " * 64)[:64].encode()
            r = out[did]
            assert (r.n_frames, r.n_px) == (4, 4096)
            assert r.px_min == min(px) and r.px_max == max(px)
            assert r.px_mean == sum(px) * 64 / 4096


def test_audio_waveform_features_hand_computed(spark):
    import math

    import pytest

    from datalake_indexes_spark.operators.multimodal import (
        attach_real_wav,
        audio_waveform_features,
    )

    # text "AzAz" -> byte pairs (0x41,0x7A),(0x41,0x7A): two equal
    # samples a = 0x41 + 256*0x7A = 31297 -> mean = a, no crossings,
    # rms = a, p2p = 0.  text "Az!!Az" alternates high/low samples.
    docs = spark.createDataFrame(
        [(1, "AzAz"), (2, "Az!!Az"), (3, "x")],  # doc 3: half a frame
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in audio_waveform_features(attach_real_wav(docs)).collect()
    }
    hi = 0x41 + 256 * 0x7A
    lo = 0x21 + 256 * 0x21
    assert out[1]["n_samples"] == 2
    assert out[1]["rms"] == pytest.approx(float(hi))
    assert out[1]["mean_crossing_rate"] == 0.0
    assert out[1]["peak_to_peak"] == 0
    assert out[2]["n_samples"] == 3
    assert out[2]["rms"] == pytest.approx(
        math.sqrt((2 * hi * hi + lo * lo) / 3)
    )
    # hi, lo, hi around the mean -> both adjacent pairs cross
    assert out[2]["mean_crossing_rate"] == 1.0
    assert out[2]["peak_to_peak"] == hi - lo
    # a single trailing odd byte is half a frame: zero decodable samples
    assert out[3]["n_samples"] == 0
    assert out[3]["rms"] is None
    assert out[3]["mean_crossing_rate"] is None


# ---------------------------------------------------------------- ADPCM


def _ima_encode(samples_per_ch, block_samples=249):
    """Minimal spec-faithful IMA ADPCM encoder (test-side twin of the
    operator's decoder): quantize each diff against the step table and
    track the decoder's reconstruction so drift can't accumulate."""
    import struct as st

    from datalake_indexes_spark.operators.multimodal import (
        _IMA_INDEX_TABLE,
        _IMA_STEP_TABLE,
    )

    ch = len(samples_per_ch)
    n = len(samples_per_ch[0])
    blocks = b""
    for start in range(0, n, block_samples):
        seg = [s[start : start + block_samples] for s in samples_per_ch]
        if len(seg[0]) < block_samples:
            break  # encoder emits whole blocks only
        header = b""
        preds = [seg[c][0] for c in range(ch)]
        # pick each channel's starting step near its mean |diff| — the
        # standard encoder practice; starting at index 0 slope-overloads
        # for dozens of samples on any non-trivial signal
        idxs = []
        for c in range(ch):
            n_d = len(seg[c]) - 1
            target = max(
                1, sum(abs(seg[c][i + 1] - seg[c][i]) for i in range(n_d)) // n_d
            )
            idxs.append(
                min(range(89), key=lambda i: abs(_IMA_STEP_TABLE[i] - target))
            )
        for c in range(ch):
            header += st.pack("<hBB", preds[c], idxs[c], 0)
        nibs: list[list[int]] = [[] for _ in range(ch)]
        for c in range(ch):
            for x in seg[c][1:]:
                step = _IMA_STEP_TABLE[idxs[c]]
                diff = x - preds[c]
                nib = 0
                if diff < 0:
                    nib = 8
                    diff = -diff
                if diff >= step:
                    nib |= 4
                    diff -= step
                if diff >= step >> 1:
                    nib |= 2
                    diff -= step >> 1
                if diff >= step >> 2:
                    nib |= 1
                # replay the decoder's reconstruction exactly
                rec = _IMA_STEP_TABLE[idxs[c]] >> 3
                if nib & 4:
                    rec += _IMA_STEP_TABLE[idxs[c]]
                if nib & 2:
                    rec += _IMA_STEP_TABLE[idxs[c]] >> 1
                if nib & 1:
                    rec += _IMA_STEP_TABLE[idxs[c]] >> 2
                preds[c] = preds[c] - rec if nib & 8 else preds[c] + rec
                preds[c] = max(-32768, min(32767, preds[c]))
                idxs[c] = max(0, min(88, idxs[c] + _IMA_INDEX_TABLE[nib & 7]))
                nibs[c].append(nib)
        # pack nibbles: 4-byte (8-nibble) groups interleaved per channel
        body = b""
        n_groups = len(nibs[0]) // 8
        for g in range(n_groups):
            for c in range(ch):
                grp = nibs[c][g * 8 : (g + 1) * 8]
                body += bytes(
                    grp[j] | (grp[j + 1] << 4) for j in range(0, 8, 2)
                )
        blocks += header + body
    block_align = 4 * ch + ((block_samples - 1) // 8) * 4 * ch
    return blocks, block_align


def _wav_adpcm(samples_per_ch, rate=8000, block_samples=249):
    import struct as st

    ch = len(samples_per_ch)
    data, block_align = _ima_encode(samples_per_ch, block_samples)
    fmt = st.pack("<HHIIHH", 0x11, ch, rate, rate * block_align, block_align, 4)
    riff = b"WAVE"
    riff += b"fmt " + st.pack("<I", len(fmt)) + fmt
    riff += b"data" + st.pack("<I", len(data)) + data
    return b"RIFF" + st.pack("<I", len(riff)) + riff


def test_ima_adpcm_roundtrip_mono(spark):
    import math

    from datalake_indexes_spark.operators.multimodal import decode_wav

    src = [int(12000 * math.sin(2 * math.pi * 440 * t / 8000)) for t in range(498)]
    rate, ch, out = decode_wav(_wav_adpcm([src]))
    assert (rate, ch) == (8000, 1)
    assert len(out) == 498  # 2 whole blocks of 249
    assert out[0] == src[0]  # header predictor is the first sample verbatim
    # lossy codec: 4-bit quantization of a sine tracks within ~6% fullscale
    err = max(abs(a - b) for a, b in zip(out, src))
    assert err < 2000, err


def test_ima_adpcm_roundtrip_stereo_interleaves(spark):
    import math

    from datalake_indexes_spark.operators.multimodal import decode_wav

    left = [int(9000 * math.sin(2 * math.pi * 200 * t / 8000)) for t in range(249)]
    right = [int(9000 * math.cos(2 * math.pi * 200 * t / 8000)) for t in range(249)]
    rate, ch, out = decode_wav(_wav_adpcm([left, right]))
    assert (rate, ch) == (8000, 2)
    assert len(out) == 2 * 249
    assert out[0] == left[0] and out[1] == right[0]
    l_out, r_out = out[0::2], out[1::2]
    assert max(abs(a - b) for a, b in zip(l_out, left)) < 2000
    assert max(abs(a - b) for a, b in zip(r_out, right)) < 2000


def test_adpcm_trailing_partial_block_ignored(spark):
    import math

    from datalake_indexes_spark.operators.multimodal import decode_wav

    src = [int(8000 * math.sin(t / 5)) for t in range(249)]
    wav = _wav_adpcm([src])
    truncated = wav[:-10]  # chop mid-block; size fields now overshoot
    # rebuild with honest chunk sizes so only the DATA is short
    import struct as st

    data, block_align = _ima_encode([src])
    data = data[: len(data) - 10]
    fmt = st.pack("<HHIIHH", 0x11, 1, 8000, 8000 * block_align, block_align, 4)
    riff = b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
    riff += b"data" + st.pack("<I", len(data)) + data
    rate, ch, out = decode_wav(b"RIFF" + st.pack("<I", len(riff)) + riff)
    assert out == []  # the only block is partial -> ignored, not garbage


def test_unsupported_codec_still_named(spark):
    import struct as st

    import pytest

    from datalake_indexes_spark.operators.multimodal import decode_wav

    fmt = st.pack("<HHIIHH", 0x55, 1, 8000, 8000, 1, 16)  # MP3 tag
    riff = b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
    riff += b"data" + st.pack("<I", 4) + b"\x00" * 4
    with pytest.raises(NotImplementedError, match="85"):
        decode_wav(b"RIFF" + st.pack("<I", len(riff)) + riff)


def test_adpcm_fact_chunk_truncates_padding(spark):
    # spec encoders pad the final block to block_align and record the
    # TRUE per-channel count in the 'fact' chunk; decode must honor it.
    import math
    import struct as st

    from datalake_indexes_spark.operators.multimodal import decode_wav

    src = [int(6000 * math.sin(t / 7)) for t in range(498)]
    data, block_align = _ima_encode([src])
    fmt = st.pack("<HHIIHH", 0x11, 1, 8000, 8000 * block_align, block_align, 4)
    riff = b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
    riff += b"fact" + st.pack("<I", 4) + st.pack("<I", 490)
    riff += b"data" + st.pack("<I", len(data)) + data
    rate, ch, out = decode_wav(b"RIFF" + st.pack("<I", len(riff)) + riff)
    assert len(out) == 490  # 8 padding samples of the last block dropped


def _wav_g711(payload: bytes, code: int, ch: int = 1, rate: int = 8000) -> bytes:
    import struct as st

    fmt = st.pack("<HHIIHH", code, ch, rate, rate * ch, ch, 8)
    riff = b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
    riff += b"data" + st.pack("<I", len(payload)) + payload
    return b"RIFF" + st.pack("<I", len(riff)) + riff


def test_g711_ulaw_spec_constants(spark):
    from datalake_indexes_spark.operators.multimodal import decode_wav

    rate, ch, out = decode_wav(_wav_g711(bytes([0xFF, 0x7F, 0x00, 0x80]), 7))
    assert (rate, ch) == (8000, 1)
    # published mu-law anchor points: both zero codes decode to 0,
    # 0x00 is the negative peak -32124, 0x80 the positive peak +32124
    assert out == [0, 0, -32124, 32124]


def test_g711_ulaw_sign_symmetry_and_monotone(spark):
    from datalake_indexes_spark.operators.multimodal import _ulaw_to_linear

    for b in range(256):
        assert _ulaw_to_linear(b) == -_ulaw_to_linear(b ^ 0x80)
    mags = [_ulaw_to_linear(b) for b in range(0x00, 0x80)]  # negative half
    assert all(a < b for a, b in zip(mags, mags[1:]))  # rises toward 0


def test_g711_alaw_spec_constants(spark):
    from datalake_indexes_spark.operators.multimodal import decode_wav

    rate, ch, out = decode_wav(_wav_g711(bytes([0x55, 0xD5, 0x2A, 0xAA]), 6))
    # published A-law anchor points: 0x55/0xD5 are the +-minimum codes
    # (-8/+8), 0x2A/0xAA the -32256/+32256 peaks
    assert out == [-8, 8, -32256, 32256]


def test_g711_alaw_sign_symmetry(spark):
    from datalake_indexes_spark.operators.multimodal import _alaw_to_linear

    for b in range(256):
        assert _alaw_to_linear(b) == -_alaw_to_linear(b ^ 0x80)


def _ms_encode(samples_per_ch, block_samples=128, predictor=0):
    """Minimal spec-faithful MS-ADPCM encoder (test-side twin): fixed
    predictor choice, initial delta from the early diffs, quantize each
    residual against the replayed decoder state."""
    import struct as st

    from datalake_indexes_spark.operators.multimodal import (
        _MS_ADAPT,
        _MS_COEFS,
        _div256,
    )

    ch = len(samples_per_ch)
    n = len(samples_per_ch[0])
    c1, c2 = _MS_COEFS[predictor]
    blocks = b""
    for start in range(0, n, block_samples):
        seg = [s[start : start + block_samples] for s in samples_per_ch]
        if len(seg[0]) < block_samples:
            break
        s2 = [seg[c][0] for c in range(ch)]
        s1 = [seg[c][1] for c in range(ch)]
        deltas = []
        for c in range(ch):
            d = sum(
                abs(seg[c][i + 1] - seg[c][i]) for i in range(len(seg[c]) - 1)
            ) // max(1, (len(seg[c]) - 1) * 4)
            deltas.append(max(16, d))
        header = bytes([predictor] * ch)
        header += st.pack(f"<{ch}h", *deltas)
        header += st.pack(f"<{ch}h", *s1)
        header += st.pack(f"<{ch}h", *s2)
        nibs: list[int] = []  # channel-alternating stream, high-first pairs
        state_s1, state_s2, state_d = list(s1), list(s2), list(deltas)
        for i in range(2, block_samples):
            for c in range(ch):
                pred = _div256(state_s1[c] * c1 + state_s2[c] * c2)
                resid = seg[c][i] - pred
                nib_signed = max(-8, min(7, round(resid / state_d[c])))
                nib = nib_signed & 0xF
                rec = pred + nib_signed * state_d[c]
                rec = max(-32768, min(32767, rec))
                state_s2[c], state_s1[c] = state_s1[c], rec
                state_d[c] = max(16, (_MS_ADAPT[nib] * state_d[c]) >> 8)
                nibs.append(nib)
        body = bytes(
            (nibs[j] << 4) | nibs[j + 1] for j in range(0, len(nibs) - 1, 2)
        )
        blocks += header + body
    block_align = 7 * ch + ((block_samples - 2) * ch) // 2
    return blocks, block_align


def _wav_ms(samples_per_ch, rate=8000, block_samples=128):
    import struct as st

    from datalake_indexes_spark.operators.multimodal import _MS_COEFS

    ch = len(samples_per_ch)
    data, block_align = _ms_encode(samples_per_ch, block_samples)
    ext = st.pack("<HH", block_samples, len(_MS_COEFS))
    for a, b in _MS_COEFS:
        ext += st.pack("<hh", a, b)
    fmt = st.pack(
        "<HHIIHHH", 2, ch, rate, rate * block_align, block_align, 4, len(ext)
    ) + ext
    riff = b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
    riff += b"data" + st.pack("<I", len(data)) + data
    return b"RIFF" + st.pack("<I", len(riff)) + riff


def _jpeg_seg(marker, payload):
    import struct as st

    return bytes([0xFF, marker]) + st.pack(">H", len(payload) + 2) + payload


def _coef_tables():
    """Test-side Huffman tables: DC standard; AC = EOBn (r<<4) + ZRL +
    every (r<<4)|s for s=1..10, all at length 8 like the module's flat
    table."""
    from datalake_indexes_spark.operators.multimodal import (
        _JPEG_DC_BITS,
        _JPEG_DC_VALS,
        _huffman_encode_table,
    )

    ac_vals = bytes(
        [r << 4 for r in range(15)]
        + [0xF0]
        + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    )
    ac_bits = [0] * 7 + [len(ac_vals)] + [0] * 8
    return (
        _huffman_encode_table(_JPEG_DC_BITS, _JPEG_DC_VALS),
        _huffman_encode_table(ac_bits, bytes(ac_vals)),
        ac_bits,
        ac_vals,
    )


def _put_coded(wtr, v):
    t = abs(v).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def _coef_jpeg_baseline(blocks, bw, bh):
    """Sequential gray JPEG from natural-order 64-coef blocks (quant=1)."""
    from datalake_indexes_spark.operators.multimodal import (
        _JPEG_DC_BITS,
        _JPEG_DC_VALS,
        _ZIGZAG,
        _JpegBitWriter,
    )
    import struct as st

    dc_enc, ac_enc, ac_bits, ac_vals = _coef_tables()
    wtr = _JpegBitWriter()
    pred = 0
    for blk in blocks:
        t, bitsv = _put_coded(wtr, blk[0] - pred)
        pred = blk[0]
        wtr.put(*dc_enc[t])
        if t:
            wtr.put(bitsv, t)
        r = 0
        for k in range(1, 64):
            v = blk[_ZIGZAG[k]]
            if v == 0:
                r += 1
                continue
            while r > 15:
                wtr.put(*ac_enc[0xF0])
                r -= 16
            s, bitsv = _put_coded(wtr, v)
            wtr.put(*ac_enc[(r << 4) | s])
            wtr.put(bitsv, s)
            r = 0
        if r:
            wtr.put(*ac_enc[0x00])
    return (
        b"\xff\xd8"
        + _jpeg_seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + _jpeg_seg(
            0xC0, st.pack(">BHHB", 8, bh * 8, bw * 8, 1) + bytes([1, 0x11, 0])
        )
        + _jpeg_seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS) + _JPEG_DC_VALS)
        + _jpeg_seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
        + _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + wtr.flush()
        + b"\xff\xd9"
    )


def _coef_jpeg_progressive(blocks, bw, bh):
    """Progressive gray JPEG of the SAME blocks: DC first(Al=1)/refine,
    AC 1..63 first(Al=1) then AC refinement(Ah=1,Al=0) — the encoder
    side of T.81 G.1.2.2/G.1.2.3 with per-block EOB, interleaving
    correction bits positionally exactly as the decoder consumes them."""
    from datalake_indexes_spark.operators.multimodal import (
        _JPEG_DC_BITS,
        _JPEG_DC_VALS,
        _ZIGZAG,
        _JpegBitWriter,
    )
    import struct as st

    dc_enc, ac_enc, ac_bits, ac_vals = _coef_tables()

    w1 = _JpegBitWriter()  # DC first, Al=1
    pred = 0
    for blk in blocks:
        t1 = blk[0] >> 1
        t, bitsv = _put_coded(w1, t1 - pred)
        pred = t1
        w1.put(*dc_enc[t])
        if t:
            w1.put(bitsv, t)

    w2 = _JpegBitWriter()  # DC refine, Al=0
    for blk in blocks:
        w2.put(blk[0] & 1, 1)

    w3 = _JpegBitWriter()  # AC first, Al=1: coefficients' a>>1 magnitudes
    for blk in blocks:
        r = 0
        for k in range(1, 64):
            v = blk[_ZIGZAG[k]]
            t = abs(v) >> 1
            if t == 0:
                r += 1
                continue
            while r > 15:
                w3.put(*ac_enc[0xF0])
                r -= 16
            s = t.bit_length()
            w3.put(*ac_enc[(r << 4) | s])
            sv = t if v > 0 else -t
            w3.put(sv if sv >= 0 else sv + (1 << s) - 1, s)
            r = 0
        if r:
            w3.put(*ac_enc[0x00])

    w4 = _JpegBitWriter()  # AC refine, Ah=1 Al=0
    for blk in blocks:
        corr = []
        r = 0
        for k in range(1, 64):
            v = blk[_ZIGZAG[k]]
            a = abs(v)
            if a >> 1:  # history nonzero at the previous precision
                corr.append(a & 1)
            elif a:  # newly significant: must be exactly +-1
                w4.put(*ac_enc[(r << 4) | 1])
                w4.put(1 if v > 0 else 0, 1)
                for bit in corr:
                    w4.put(bit, 1)
                corr = []
                r = 0
            else:
                r += 1
                if r == 16:
                    w4.put(*ac_enc[0xF0])
                    for bit in corr:
                        w4.put(bit, 1)
                    corr = []
                    r = 0
        if r or corr:
            w4.put(*ac_enc[0x00])  # EOB run of 1 covers the block's tail
            for bit in corr:
                w4.put(bit, 1)

    return (
        b"\xff\xd8"
        + _jpeg_seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + _jpeg_seg(
            0xC2, st.pack(">BHHB", 8, bh * 8, bw * 8, 1) + bytes([1, 0x11, 0])
        )
        + _jpeg_seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS) + _JPEG_DC_VALS)
        + _jpeg_seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
        + _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))
        + w1.flush()
        + _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))
        + w2.flush()
        + _jpeg_seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x01]))
        + w3.flush()
        + _jpeg_seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x10]))
        + w4.flush()
        + b"\xff\xd9"
    )


def _lcg_blocks(n_blocks, seed=12345):
    """Deterministic coefficient blocks: sparse AC, values spanning the
    refine-relevant range (zeros, +-1 'newly significant', larger evens
    and odds so correction bits go both ways), DC up to +-1000."""
    state = seed
    blocks = []
    for _ in range(n_blocks):
        blk = [0] * 64
        state = (1103515245 * state + 12345) % (1 << 31)
        blk[0] = (state % 2001) - 1000
        for k in range(1, 64):
            state = (1103515245 * state + 12345) % (1 << 31)
            roll = state % 100
            if roll < 60:
                continue  # zero
            elif roll < 75:
                blk[k] = 1 if state & 1 else -1
            else:
                blk[k] = ((state >> 8) % 79) - 39 or 3
        blocks.append(blk)
    return blocks


def test_progressive_jpeg_equals_baseline_on_general_coefficients(spark):
    """The full Annex-G surface in one equivalence: the SAME coefficient
    blocks encoded sequentially and progressively (DC first+refine, AC
    first+refine with EOB/ZRL/newly-significant/correction bits) must
    decode to IDENTICAL pixels."""
    from datalake_indexes_spark.operators.multimodal import decode_jpeg

    # 64 ordered by zigzag — note _lcg_blocks indexes blk[k] naturally;
    # both encoders read via _ZIGZAG consistently so layouts agree
    blocks = _lcg_blocks(12)
    base = _coef_jpeg_baseline(blocks, 4, 3)
    prog = _coef_jpeg_progressive(blocks, 4, 3)
    wb, hb, cb, pb = decode_jpeg(base)
    wp, hp, cp, pp = decode_jpeg(prog)
    assert (wb, hb, cb) == (wp, hp, cp) == (32, 24, 1)
    assert pb == pp


def test_progressive_flat_tiles_bit_exact(spark):
    """flat_gray_jpeg_progressive: same planted bytes as the baseline
    twin, through DC successive approximation + EOB-run AC scan."""
    import numpy as np

    from datalake_indexes_spark.operators.multimodal import (
        decode_jpeg,
        flat_gray_jpeg,
        flat_gray_jpeg_progressive,
    )

    vals = [(i * 37 + 5) % 256 for i in range(64)]
    w, h, c, px = decode_jpeg(flat_gray_jpeg_progressive(vals, 16, 4))
    assert (w, h, c) == (128, 32, 1)
    assert px == decode_jpeg(flat_gray_jpeg(vals, 16, 4))[3]
    a = np.frombuffer(px, dtype=np.uint8).reshape(32, 128)
    got = [int(a[ty * 8, tx * 8]) for ty in range(4) for tx in range(16)]
    assert got == vals


def _ac_scan_writer(blocks, ac_enc):
    """Entropy bits for one non-interleaved AC 1..63 first scan (Al=0)."""
    from datalake_indexes_spark.operators.multimodal import (
        _ZIGZAG,
        _JpegBitWriter,
    )

    wtr = _JpegBitWriter()
    for blk in blocks:
        r = 0
        for k in range(1, 64):
            v = blk[_ZIGZAG[k]]
            if v == 0:
                r += 1
                continue
            while r > 15:
                wtr.put(*ac_enc[0xF0])
                r -= 16
            s = abs(v).bit_length()
            wtr.put(*ac_enc[(r << 4) | s])
            wtr.put(v if v >= 0 else v + (1 << s) - 1, s)
            r = 0
        if r:
            wtr.put(*ac_enc[0x00])
    return wtr


def test_progressive_color_420_subsampled_grids(spark):
    """4:2:0 color progressive: interleaved DC first+refine over MCUs
    (4 Y + 1 Cb + 1 Cr), then per-component non-interleaved AC scans
    whose block grids DIFFER (Y 4x4, chroma 2x2) — the geometry where
    grid bugs hide.  Expected pixels come from the shared render over
    hand-built coefficient grids, so this pins exactly the entropy +
    scan-geometry layer."""
    import struct as st

    import numpy as np

    from datalake_indexes_spark.operators.multimodal import (
        _JPEG_DC_BITS,
        _JPEG_DC_VALS,
        _JpegBitWriter,
        _render_jpeg_coefs,
        decode_jpeg,
    )

    dc_enc, ac_enc, ac_bits, ac_vals = _coef_tables()
    ybl = _lcg_blocks(16, seed=77)
    cb_bl = [[0] * 64 for _ in range(4)]
    cr_bl = [[0] * 64 for _ in range(4)]
    for i in range(4):
        cb_bl[i][0] = 100 + 2 * i
        cr_bl[i][0] = -81 + 3 * i  # odd negatives: DC refine on negatives
    comps_blocks = [ybl, cb_bl, cr_bl]

    order = []  # MCU-interleaved (ci, block_index): 4 Y, 1 Cb, 1 Cr
    for mcu in range(4):
        my, mx = divmod(mcu, 2)
        for by in range(2):
            for bx in range(2):
                order.append((0, (my * 2 + by) * 4 + (mx * 2 + bx)))
        order.append((1, my * 2 + mx))
        order.append((2, my * 2 + mx))

    w1 = _JpegBitWriter()  # DC first, Al=1
    preds = [0, 0, 0]
    for ci, bi in order:
        t1 = comps_blocks[ci][bi][0] >> 1
        diff = t1 - preds[ci]
        preds[ci] = t1
        t = abs(diff).bit_length()
        w1.put(*dc_enc[t])
        if t:
            w1.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    w2 = _JpegBitWriter()  # DC refine
    for ci, bi in order:
        w2.put(comps_blocks[ci][bi][0] & 1, 1)
    w3 = _ac_scan_writer(ybl, ac_enc)
    w4 = _ac_scan_writer(cb_bl, ac_enc)
    w5 = _ac_scan_writer(cr_bl, ac_enc)

    sof = st.pack(">BHHB", 8, 32, 32, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    dc3 = bytes([3, 1, 0x00, 2, 0x00, 3, 0x00])
    file = (
        b"\xff\xd8"
        + _jpeg_seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + _jpeg_seg(0xC2, sof)
        + _jpeg_seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS) + _JPEG_DC_VALS)
        + _jpeg_seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
        + _jpeg_seg(0xDA, dc3 + bytes([0, 0, 0x01]))
        + w1.flush()
        + _jpeg_seg(0xDA, dc3 + bytes([0, 0, 0x10]))
        + w2.flush()
        + _jpeg_seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
        + w3.flush()
        + _jpeg_seg(0xDA, bytes([1, 2, 0x00, 1, 63, 0x00]))
        + w4.flush()
        + _jpeg_seg(0xDA, bytes([1, 3, 0x00, 1, 63, 0x00]))
        + w5.flush()
        + b"\xff\xd9"
    )
    got = decode_jpeg(file)

    coefs = [
        np.zeros((4, 4, 64), np.int32),
        np.zeros((2, 2, 64), np.int32),
        np.zeros((2, 2, 64), np.int32),
    ]
    for ci, blocks, bw2 in ((0, ybl, 4), (1, cb_bl, 2), (2, cr_bl, 2)):
        for bi, blk in enumerate(blocks):
            coefs[ci][bi // bw2, bi % bw2] = blk
    comps = [
        {"id": 1, "h": 2, "v": 2, "tq": 0},
        {"id": 2, "h": 1, "v": 1, "tq": 0},
        {"id": 3, "h": 1, "v": 1, "tq": 0},
    ]
    exp = _render_jpeg_coefs(np, coefs, comps, {0: [1] * 64}, 32, 32, (2, 2, 2, 2))
    assert got == exp


def test_progressive_restart_intervals(spark):
    """DRI in a progressive file: every scan's entropy data is split by
    RSTn markers each `ri` units, resetting DC predictors and EOB runs.
    Flat tiles (known pixels) with ri=5 over 64 blocks — 12 restarts per
    scan, predictors re-based at each."""
    import struct as st

    from datalake_indexes_spark.operators.multimodal import (
        _JPEG_DC_BITS,
        _JPEG_DC_VALS,
        _JPEG_EOBN_BITS,
        _JPEG_EOBN_VALS,
        _JpegBitWriter,
        _huffman_encode_table,
        decode_jpeg,
        flat_gray_jpeg,
    )

    vals = [(i * 53 + 11) % 256 for i in range(64)]
    dcs = [8 * (v - 128) for v in vals]
    ri = 5
    dc_enc = _huffman_encode_table(_JPEG_DC_BITS, _JPEG_DC_VALS)
    eob_enc = _huffman_encode_table(_JPEG_EOBN_BITS, _JPEG_EOBN_VALS)

    def rst_join(chunks):
        out = b""
        for n, c in enumerate(chunks):
            if n:
                out += bytes([0xFF, 0xD0 + ((n - 1) % 8)])
            out += c
        return out

    def chunked(encode_chunk):
        return rst_join(
            [encode_chunk(dcs[i : i + ri]) for i in range(0, len(dcs), ri)]
        )

    def dc_first_chunk(seg_dcs):
        wtr = _JpegBitWriter()
        pred = 0  # predictor resets at every restart
        for dc in seg_dcs:
            t1 = dc >> 1
            diff = t1 - pred
            pred = t1
            t = abs(diff).bit_length()
            wtr.put(*dc_enc[t])
            if t:
                wtr.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        return wtr.flush()

    def dc_refine_chunk(seg_dcs):
        wtr = _JpegBitWriter()
        for dc in seg_dcs:
            wtr.put(dc & 1, 1)
        return wtr.flush()

    def ac_eob_chunk(seg_dcs):
        wtr = _JpegBitWriter()
        n = len(seg_dcs)  # EOB runs reset at restarts: re-issue per chunk
        while n:
            r = min(14, n.bit_length() - 1)
            take = min(n, (1 << r) + ((1 << r) - 1))
            r = take.bit_length() - 1
            wtr.put(*eob_enc[r << 4])
            if r:
                wtr.put(take - (1 << r), r)
            n -= take
        return wtr.flush()

    file = (
        b"\xff\xd8"
        + _jpeg_seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + _jpeg_seg(
            0xC2, st.pack(">BHHB", 8, 32, 128, 1) + bytes([1, 0x11, 0])
        )
        + _jpeg_seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS) + _JPEG_DC_VALS)
        + _jpeg_seg(0xDD, st.pack(">H", ri))
        + _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))
        + chunked(dc_first_chunk)
        + _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))
        + chunked(dc_refine_chunk)
        + _jpeg_seg(
            0xC4, bytes([0x10]) + bytes(_JPEG_EOBN_BITS) + _JPEG_EOBN_VALS
        )
        + _jpeg_seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
        + chunked(ac_eob_chunk)
        + b"\xff\xd9"
    )
    w, h, c, px = decode_jpeg(file)
    assert (w, h, c) == (128, 32, 1)
    assert px == decode_jpeg(flat_gray_jpeg(vals, 16, 4))[3]


def test_sequential_per_component_scans_decode(spark):
    """A sequential (SOF0) file with THREE scans, one component each —
    the exact shape the former 'JPEG multi-scan file'
    NotImplementedError rejected.  4:4:4 so every grid matches; expected
    pixels from the shared render over the same coefficient grids."""
    import struct as st

    import numpy as np

    from datalake_indexes_spark.operators.multimodal import (
        _JPEG_DC_BITS,
        _JPEG_DC_VALS,
        _ZIGZAG,
        _JpegBitWriter,
        _render_jpeg_coefs,
        decode_jpeg,
    )

    dc_enc, ac_enc, ac_bits, ac_vals = _coef_tables()
    ybl = _lcg_blocks(4, seed=31)
    cb_bl = _lcg_blocks(4, seed=32)
    cr_bl = _lcg_blocks(4, seed=33)

    def full_scan(blocks):
        wtr = _JpegBitWriter()
        pred = 0
        for blk in blocks:
            t, bitsv = _put_coded(wtr, blk[0] - pred)
            pred = blk[0]
            wtr.put(*dc_enc[t])
            if t:
                wtr.put(bitsv, t)
            r = 0
            for k in range(1, 64):
                v = blk[_ZIGZAG[k]]
                if v == 0:
                    r += 1
                    continue
                while r > 15:
                    wtr.put(*ac_enc[0xF0])
                    r -= 16
                s = abs(v).bit_length()
                wtr.put(*ac_enc[(r << 4) | s])
                wtr.put(v if v >= 0 else v + (1 << s) - 1, s)
                r = 0
            if r:
                wtr.put(*ac_enc[0x00])
        return wtr

    sof = st.pack(">BHHB", 8, 16, 16, 3) + bytes(
        [1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    file = (
        b"\xff\xd8"
        + _jpeg_seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + _jpeg_seg(0xC0, sof)
        + _jpeg_seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS) + _JPEG_DC_VALS)
        + _jpeg_seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
        + _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + full_scan(ybl).flush()
        + _jpeg_seg(0xDA, bytes([1, 2, 0x00, 0, 63, 0]))
        + full_scan(cb_bl).flush()
        + _jpeg_seg(0xDA, bytes([1, 3, 0x00, 0, 63, 0]))
        + full_scan(cr_bl).flush()
        + b"\xff\xd9"
    )
    got = decode_jpeg(file)

    coefs = [np.zeros((2, 2, 64), np.int32) for _ in range(3)]
    for ci, blocks in enumerate((ybl, cb_bl, cr_bl)):
        for bi, blk in enumerate(blocks):
            coefs[ci][bi // 2, bi % 2] = blk
    comps = [
        {"id": 1, "h": 1, "v": 1, "tq": 0},
        {"id": 2, "h": 1, "v": 1, "tq": 0},
        {"id": 3, "h": 1, "v": 1, "tq": 0},
    ]
    exp = _render_jpeg_coefs(np, coefs, comps, {0: [1] * 64}, 16, 16, (1, 1, 2, 2))
    assert got == exp


def test_cmyk_jpeg_raw_transform_bit_exact(spark):
    """4-component Adobe CMYK (APP14 transform 0): no color math, each
    channel's flat tiles must come back byte-exact, channels=4
    interleaved."""
    import numpy as np

    from datalake_indexes_spark.operators.multimodal import (
        decode_jpeg,
        flat_cmyk_jpeg,
    )

    n = 12
    chans = [
        [(i * 17 + 3) % 256 for i in range(n)],
        [(i * 31 + 7) % 256 for i in range(n)],
        [(i * 53 + 11) % 256 for i in range(n)],
        [(i * 97 + 13) % 256 for i in range(n)],
    ]
    w, h, c, px = decode_jpeg(flat_cmyk_jpeg(chans, 4, 3))
    assert (w, h, c) == (32, 24, 4)
    a = np.frombuffer(px, dtype=np.uint8).reshape(24, 32, 4)
    for ci in range(4):
        got = [int(a[ty * 8, tx * 8, ci]) for ty in range(3) for tx in range(4)]
        assert got == chans[ci], (ci, got)


def test_ycck_jpeg_transform_roundtrip(spark):
    """APP14 transform 2 (YCCK): the encoder runs the forward YCbCr
    transform over the CMY planes, the decoder must undo it — within
    the +-2 a rounded forward/float inverse pair can differ; K passes
    through untouched, so it stays exact."""
    import numpy as np

    from datalake_indexes_spark.operators.multimodal import (
        decode_jpeg,
        flat_cmyk_jpeg,
    )

    n = 12
    chans = [
        [(i * 19 + 40) % 200 + 20 for i in range(n)],
        [(i * 23 + 60) % 200 + 20 for i in range(n)],
        [(i * 29 + 80) % 200 + 20 for i in range(n)],
        [(i * 41 + 5) % 256 for i in range(n)],
    ]
    w, h, c, px = decode_jpeg(flat_cmyk_jpeg(chans, 4, 3, ycck=True))
    assert (w, h, c) == (32, 24, 4)
    a = np.frombuffer(px, dtype=np.uint8).reshape(24, 32, 4)
    for ci in range(4):
        got = [int(a[ty * 8, tx * 8, ci]) for ty in range(3) for tx in range(4)]
        tol = 0 if ci == 3 else 2
        assert all(abs(g - v) <= tol for g, v in zip(got, chans[ci])), (
            ci, got, chans[ci],
        )


def test_progressive_jpeg_mutation_robustness(spark):
    """Byte-mutation fuzz over a valid progressive file: every mutant
    must either decode or raise a clean ValueError /
    NotImplementedError / struct.error — never hang, never crash the
    interpreter, never IndexError out of the coefficient machinery.
    Deterministic LCG positions; entropy, marker and header bytes all
    get hit."""
    from datalake_indexes_spark.operators.multimodal import (
        decode_jpeg,
        flat_gray_jpeg_progressive,
    )

    base = bytearray(
        flat_gray_jpeg_progressive([(i * 31) % 256 for i in range(64)], 16, 4)
    )
    state = 424242
    outcomes = {"ok": 0, "raised": 0}
    for trial in range(300):
        state = (1103515245 * state + 12345) % (1 << 31)
        pos = 2 + state % (len(base) - 2)  # keep the SOI so it IS a JPEG
        state = (1103515245 * state + 12345) % (1 << 31)
        mut = bytearray(base)
        mut[pos] ^= 1 + (state % 255)
        try:
            w, h, c, px = decode_jpeg(bytes(mut))
            assert len(px) == w * h * c
            outcomes["ok"] += 1
        except (ValueError, NotImplementedError):
            outcomes["raised"] += 1
    # both outcomes must occur: some mutations are benign (pad bits,
    # magnitude bits), some corrupt structure — a fuzz that only ever
    # raises would mean the decoder rejects valid-ish streams
    assert outcomes["ok"] > 0 and outcomes["raised"] > 0, outcomes


def test_progressive_jpeg_truncation_robustness(spark):
    """Every truncation point of a progressive file raises cleanly or
    decodes (EOI-less tails render what accumulated) — no hangs, no
    uncontrolled exceptions from half-read scans."""
    from datalake_indexes_spark.operators.multimodal import (
        decode_jpeg,
        flat_gray_jpeg_progressive,
    )

    full = flat_gray_jpeg_progressive([(i * 13) % 256 for i in range(16)], 4, 4)
    for cut in range(2, len(full), 7):
        try:
            w, h, c, px = decode_jpeg(full[:cut])
            assert len(px) == w * h * c
        except (ValueError, NotImplementedError):
            pass


def _fuzz_decoder(blob, fn, seed, trials=300, step=5):
    """Shared mutation+truncation fuzz driver: every mutant/prefix must
    decode or raise ValueError/NotImplementedError — the per-payload
    contract the mapInPandas stats operators rely on at crawl scale
    (one uncaught exception class fails the whole job, not the row).
    Mutates 1-4 bytes per trial: several of the round-9 review's
    reproductions (zero sampling factors, duplicated SOS ids, refine
    scans pointing at missing tables) need coordinated multi-byte
    corruption a single-flip fuzz can never reach."""
    state = seed
    outcomes = {"ok": 0, "raised": 0}
    for _ in range(trials):
        mut = bytearray(blob)
        state = (1103515245 * state + 12345) % (1 << 31)
        for _flip in range(1 + state % 4):
            state = (1103515245 * state + 12345) % (1 << 31)
            pos = state % len(blob)
            state = (1103515245 * state + 12345) % (1 << 31)
            mut[pos] ^= 1 + (state % 255)
        try:
            fn(bytes(mut))
            outcomes["ok"] += 1
        except (ValueError, NotImplementedError):
            outcomes["raised"] += 1
    for cut in range(1, len(blob), step):
        try:
            fn(blob[:cut])
        except (ValueError, NotImplementedError):
            pass
    return outcomes


def test_jpeg_corrupt_structure_raises_cleanly(spark):
    """The round-9 review's four reproductions, pinned: refine scan
    with a missing AC table, zero sampling factor, duplicated SOS
    component id, and a zero-component SOS must all raise ValueError —
    not AttributeError/ZeroDivisionError/KeyError/IndexError."""
    import pytest

    from datalake_indexes_spark.operators.multimodal import (
        decode_jpeg,
        flat_cmyk_jpeg,
        flat_gray_jpeg,
        flat_gray_jpeg_progressive,
    )

    prog = bytearray(flat_gray_jpeg_progressive([100] * 16, 4, 4))
    # DC-refine scan (Ss=0,Se=0,AhAl=0x10) retargeted to an AC band with
    # a table id that has no DHT: payload [1, 1, 0x01, 1, 63, 0x10]
    sos2 = prog.find(bytes([1, 1, 0x00, 0, 0, 0x10]))
    assert sos2 > 0
    prog[sos2 + 2] = 0x01  # ta=1: undefined AC table
    prog[sos2 + 3] = 1
    prog[sos2 + 4] = 63
    with pytest.raises(ValueError, match="Huffman"):
        decode_jpeg(bytes(prog))

    base = bytearray(flat_gray_jpeg([100] * 16, 4, 4))
    sof = base.find(b"\xff\xc0")
    # FF C0 len(2) prec(1) h(2) w(2) nc(1) id(1) -> hv byte at sof+11
    base[sof + 11] = 0x01  # component h=0 v=1
    with pytest.raises(ValueError, match="sampling factor"):
        decode_jpeg(bytes(base))

    chans = [[100] * 4, [90] * 4, [80] * 4, [70] * 4]
    cmyk = bytearray(flat_cmyk_jpeg(chans, 2, 2))
    sos = cmyk.find(bytes([4, 1, 0x00, 2, 0x00, 3, 0x00, 4, 0x00]))
    assert sos > 0
    cmyk[sos + 3] = 1  # component 2 relabelled 1: duplicate
    with pytest.raises(ValueError, match="twice"):
        decode_jpeg(bytes(cmyk))

    base2 = bytearray(flat_gray_jpeg([100] * 16, 4, 4))
    sos = base2.find(bytes([1, 1, 0x00, 0, 63, 0]))
    assert sos > 0
    base2[sos] = 0  # ns=0
    with pytest.raises(ValueError, match="components"):
        decode_jpeg(bytes(base2))


def test_adobe_rgb_transform0_is_passthrough(spark):
    """3-component Adobe JPEG with APP14 transform 0 stores RGB planes
    directly — libjpeg passes them through, and so must we (previously
    they got a spurious YCbCr inverse).  Flat per-channel tiles, quant
    1: channels must come back bit-exact; without APP14 the same bytes
    must be YCbCr-converted (different pixels)."""
    import struct as st

    import numpy as np

    from datalake_indexes_spark.operators.multimodal import (
        _JPEG_AC_BITS,
        _JPEG_AC_VALS,
        _JPEG_DC_BITS,
        _JPEG_DC_VALS,
        _JpegBitWriter,
        _huffman_encode_table,
        decode_jpeg,
    )

    chans = [[120, 10, 200, 60], [30, 140, 90, 250], [5, 75, 180, 220]]
    dc_enc = _huffman_encode_table(_JPEG_DC_BITS, _JPEG_DC_VALS)
    eob = _huffman_encode_table(_JPEG_AC_BITS, _JPEG_AC_VALS)[0x00]
    wtr = _JpegBitWriter()
    preds = [0, 0, 0]
    for t in range(4):
        for ci in range(3):
            dc = 8 * (chans[ci][t] - 128)
            diff = dc - preds[ci]
            preds[ci] = dc
            tt = abs(diff).bit_length()
            wtr.put(*dc_enc[tt])
            if tt:
                wtr.put(diff if diff >= 0 else diff + (1 << tt) - 1, tt)
            wtr.put(*eob)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + st.pack(">H", len(payload) + 2) + payload

    app14 = seg(0xEE, b"Adobe" + st.pack(">HHHB", 100, 0, 0, 0))
    body = (
        seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + seg(
            0xC0,
            st.pack(">BHHB", 8, 16, 16, 3)
            + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
        )
        + seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS) + _JPEG_DC_VALS)
        + seg(0xC4, bytes([0x10]) + bytes(_JPEG_AC_BITS) + _JPEG_AC_VALS)
        + seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
        + wtr.flush()
        + b"\xff\xd9"
    )
    w, h, c, px = decode_jpeg(b"\xff\xd8" + app14 + body)
    assert (w, h, c) == (16, 16, 3)
    a = np.frombuffer(px, dtype=np.uint8).reshape(16, 16, 3)
    for ci in range(3):
        got = [int(a[(t // 2) * 8, (t % 2) * 8, ci]) for t in range(4)]
        assert got == chans[ci], (ci, got)
    # same stream WITHOUT the Adobe marker: JFIF default = YCbCr convert
    _, _, _, px2 = decode_jpeg(b"\xff\xd8" + body)
    assert px2 != px


def test_cmyk_jpeg_fuzz_contract(spark):
    """The 4-component decode path under the same mutation+truncation
    contract as the grayscale/progressive paths."""
    from datalake_indexes_spark.operators.multimodal import (
        decode_jpeg,
        flat_cmyk_jpeg,
    )

    chans = [[(i * k + 7 * k) % 256 for i in range(16)] for k in (17, 31, 53, 97)]
    for ycck in (False, True):
        blob = flat_cmyk_jpeg(chans, 4, 4, ycck=ycck)
        out = _fuzz_decoder(blob, decode_jpeg, seed=4242 + ycck, trials=250)
        assert out["raised"] > 0


def test_png_decoder_fuzz_contract(spark):
    import struct as st
    import zlib

    from datalake_indexes_spark.operators.multimodal import decode_png

    def chunk(tag, body):
        return (
            st.pack(">I", len(body)) + tag + body
            + st.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    w, h = 16, 8
    raw = b"".join(
        b"\x00" + bytes((x * 7 + y * 3) % 256 for x in range(w))
        for y in range(h)
    )
    ihdr = st.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b"")
    )
    out = _fuzz_decoder(png, decode_png, seed=777)
    assert out["raised"] > 0  # corrupt IDAT/IHDR must raise cleanly


def test_wav_decoder_fuzz_contract(spark):
    import math
    import struct as st

    from datalake_indexes_spark.operators.multimodal import decode_wav

    samples = b"".join(
        st.pack("<h", int(8000 * math.sin(i / 10))) for i in range(200)
    )
    fmt = st.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (
        b"RIFF" + st.pack("<I", 36 + len(samples)) + b"WAVE"
        + b"fmt " + st.pack("<I", 16) + fmt
        + b"data" + st.pack("<I", len(samples)) + samples
    )
    out = _fuzz_decoder(wav, decode_wav, seed=888)
    assert out["ok"] > 0  # sample-byte mutations still decode


def test_avi_demux_fuzz_contract(spark):
    from datalake_indexes_spark.operators.multimodal import (
        extract_avi_frames,
        flat_gray_jpeg,
        mjpeg_avi,
    )

    avi = mjpeg_avi([flat_gray_jpeg([100] * 16, 4, 4)] * 2, 32, 32)
    _fuzz_decoder(avi, extract_avi_frames, seed=999, trials=200, step=11)


def test_ms_adpcm_div256_truncates_toward_zero(spark):
    """The spec's ``/ 256`` is C division (truncate toward zero), which a
    flooring ``>> 8`` gets wrong by 1 on negative non-multiples — the
    exact drift a round-trip test that replays the same convention on
    both sides can never see."""
    from datalake_indexes_spark.operators.multimodal import _div256

    assert _div256(-257) == -1 and (-257 >> 8) == -2  # conventions differ
    assert _div256(-256) == -1 and _div256(256) == 1
    assert _div256(-1) == 0 and _div256(255) == 0
    # matches C division on a sweep, including negative sums
    for q in range(-1000, 1000, 7):
        assert _div256(q) == int(q / 256)


def test_ms_adpcm_roundtrip_mono(spark):
    import math

    from datalake_indexes_spark.operators.multimodal import decode_wav

    src = [int(11000 * math.sin(2 * math.pi * 300 * t / 8000)) for t in range(256)]
    rate, ch, out = decode_wav(_wav_ms([src]))
    assert (rate, ch) == (8000, 1)
    assert len(out) == 256
    assert out[0] == src[0] and out[1] == src[1]  # header samples verbatim
    err = max(abs(a - b) for a, b in zip(out, src))
    assert err < 1500, err


def test_ms_adpcm_roundtrip_stereo_interleaves(spark):
    import math

    from datalake_indexes_spark.operators.multimodal import decode_wav

    left = [int(7000 * math.sin(2 * math.pi * 150 * t / 8000)) for t in range(128)]
    right = [int(7000 * math.cos(2 * math.pi * 150 * t / 8000)) for t in range(128)]
    rate, ch, out = decode_wav(_wav_ms([left, right]))
    assert (rate, ch) == (8000, 2)
    assert len(out) == 2 * 128
    assert out[0] == left[0] and out[1] == right[0]
    assert out[2] == left[1] and out[3] == right[1]
    l_out, r_out = out[0::2], out[1::2]
    assert max(abs(a - b) for a, b in zip(l_out, left)) < 1500
    assert max(abs(a - b) for a, b in zip(r_out, right)) < 1500
