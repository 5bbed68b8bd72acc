"""Stdlib compressed-container decoders: PNG full pixel decode, JPEG/MP3/MP4
metadata decode, and their corruption/dead-letter classes.

The PNG tests pin FULL decode (zlib inflate + all five scanline
reconstruction filters) by recomputing the pixel checksum from the shared
``png_pixel`` generator; the encoder cycles filter types 0..4 by row, so any
de-filter bug breaks the checksum.
"""

import struct
import zlib

import pytest

from elipdotter_spark.operators import multimodal as mm


def _png_checksum(width: int, height: int) -> bytes:
    h = 0
    for y in range(height):
        for x in range(width):
            for c in range(3):
                h = (h * 131 + mm.png_pixel(x, y, c)) % (2**61 - 1)
    return h.to_bytes(8, "big")


@pytest.mark.parametrize("width,height", [(1, 1), (3, 2), (8, 11), (31, 23)])
def test_png_full_pixel_roundtrip(width, height):
    d = mm._real_decode("image", mm.encode_png(width, height))
    assert (d["width"], d["height"], d["n_frames"]) == (width, height, 1)
    assert d["sample_rate"] is None
    # height >= 5 rows exercises every filter type (encoder cycles 0..4)
    assert d["feature"] == _png_checksum(width, height)


def test_png_corruption_classes():
    good = mm.encode_png(9, 9)
    with pytest.raises(ValueError, match="bad b'IDAT' CRC"):
        bad = bytearray(good)
        bad[50] ^= 0xFF
        mm._real_decode("image", bytes(bad))
    with pytest.raises(ValueError):
        mm._real_decode("image", good[:16])
    with pytest.raises(ValueError):
        mm._real_decode("image", good[:-15])  # IEND gone, IDAT truncated
    # interlaced header (legal PNG, unsupported decode) -> NotImplementedError
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)
    interlaced = (b"\x89PNG\r\n\x1a\n" + mm._png_chunk(b"IHDR", ihdr)
                  + mm._png_chunk(b"IDAT", zlib.compress(b"\x00" * 52))
                  + mm._png_chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="Adam7"):
        mm._real_decode("image", interlaced)


def test_png_bounded_inflate_and_header_guards():
    """Zip-bomb / crafted-header hardening: the inflate is bounded by the
    header-declared size, wrong IHDR length is a ValueError (not a
    struct.error task failure), and declared-size overflows are capped."""
    # IDAT encodes MORE rows than IHDR declares -> caught at the +1 sentinel
    # without materializing the excess
    good = mm.encode_png(6, 4)
    ihdr = struct.pack(">IIBBBBB", 6, 2, 8, 2, 0, 0, 0)  # lie: height 2
    idat_start = 8 + 12 + 13
    bomb = (good[:8] + mm._png_chunk(b"IHDR", ihdr) + good[idat_start:])
    with pytest.raises(ValueError, match="size mismatch"):
        mm._real_decode("image", bomb)
    # IHDR chunk with a wrong length but a valid CRC
    bad_ihdr = (b"\x89PNG\r\n\x1a\n" + mm._png_chunk(b"IHDR", b"\x00" * 11)
                + good[idat_start:])
    with pytest.raises(ValueError, match="IHDR length"):
        mm._real_decode("image", bad_ihdr)
    # header declaring a multi-GiB decode -> capped before inflating
    huge = struct.pack(">IIBBBBB", 2**24, 2**10, 8, 2, 0, 0, 0)
    capped = (b"\x89PNG\r\n\x1a\n" + mm._png_chunk(b"IHDR", huge)
              + good[idat_start:])
    with pytest.raises(ValueError, match="decode cap"):
        mm._real_decode("image", capped)


def test_dead_letter_catches_struct_error():
    """Contract guard: even a parse path whose length guard is missed must
    dead-letter, not raise, under on_error='dead_letter' (struct.error is
    caught at the channel)."""
    import pandas as pd

    pdf = pd.DataFrame(
        {"doc_id": [1], "payload": [b"\x89PNG\r\n\x1a\n" + b"\x00" * 40],
         "modality": ["image"]}
    )
    # drive the mapInPandas closure directly (no SparkSession needed)
    out = None
    captured = {}

    class _FakeDF:
        def mapInPandas(self, fn, schema):
            captured["fn"] = fn
            return None

    mm.extract_metadata(_FakeDF(), use_real_decoder=True, on_error="dead_letter")
    out = next(captured["fn"](iter([pdf])))
    assert out["err"][0] is not None and out["width"][0] is None


def test_jpeg_fill_bytes_tolerated():
    j = mm.encode_jpeg(17, 19)
    filled = j[:2] + b"\xff" + j[2:]  # legal fill byte before APP0 marker
    d = mm._real_decode("image", filled)
    assert (d["width"], d["height"]) == (17, 19)


def test_mp4_short_stsz_is_value_error():
    stsz = mm._mp4_box(b"stsz", b"\x00" * 6)  # shorter than the fixed header
    trak = mm._mp4_box(
        b"trak",
        mm._mp4_box(b"tkhd", b"\x00" * 84)
        + mm._mp4_box(b"mdia", mm._mp4_box(b"minf", mm._mp4_box(b"stbl", stsz))),
    )
    payload = (mm._mp4_box(b"ftyp", b"isom\x00\x00\x00\x00isom")
               + mm._mp4_box(b"moov", trak))
    with pytest.raises(ValueError, match="short stsz"):
        mm._real_decode("video", payload)


def test_jpeg_metadata_and_errors():
    d = mm._real_decode("image", mm.encode_jpeg(123, 456))
    assert (d["width"], d["height"], d["n_frames"]) == (123, 456, 1)
    assert d["feature"] is None  # metadata-only tier: no pixel decode
    with pytest.raises(ValueError, match="no SOF"):
        mm._real_decode("image", mm.encode_jpeg(5, 5)[:16])
    with pytest.raises(ValueError, match="desync"):
        mm._real_decode("image", b"\xff\xd8\xff\xe0\x00\x04ab" + b"junk")


def test_mp3_metadata_and_errors():
    for sr_idx, sr in enumerate(mm._MP3_SAMPLE_RATES):
        d = mm._real_decode("audio", mm.encode_mp3(sr_idx, 7))
        assert (d["n_frames"], d["sample_rate"]) == (7, sr)
    # ID3v2 tag skip: 10-byte header + 100-byte body (syncsafe size)
    tagged = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 100]) + b"\x00" * 100 \
        + mm.encode_mp3(1, 3)
    d = mm._real_decode("audio", tagged)
    assert (d["n_frames"], d["sample_rate"]) == (3, 48000)
    with pytest.raises(ValueError, match="partial final frame"):
        mm._real_decode("audio", mm.encode_mp3(0, 2)[:-10])
    with pytest.raises(ValueError, match="lost frame sync"):
        mm._real_decode("audio", mm.encode_mp3(0, 1) + b"\x00garbage")
    # MPEG2 Layer III header (0xFFF3): valid MP3 in the wild, outside the
    # native tier -> NotImplementedError (dead-letters, doesn't mis-decode)
    mpeg2 = bytes([0xFF, 0xF3, 0x90, 0x00]) + b"\x00" * 400
    with pytest.raises(NotImplementedError, match="MPEG1 Layer III"):
        mm._real_decode("audio", mpeg2)


def test_mp4_metadata_and_errors():
    d = mm._real_decode("video", mm.encode_mp4(640, 360, 25))
    assert (d["width"], d["height"], d["n_frames"]) == (640, 360, 25)
    assert d["sample_rate"] is None and d["feature"] is None
    with pytest.raises(ValueError):
        mm._real_decode("video", mm.encode_mp4(64, 64, 5)[:16])
    with pytest.raises(ValueError, match="missing moov"):
        mm._real_decode("video", mm._mp4_box(b"ftyp", b"isom\x00\x00\x00\x00isom"))


def test_unknown_format_still_dead_letters():
    with pytest.raises(NotImplementedError, match="Pillow"):
        mm._real_decode("image", b"GIF89a" + b"\x00" * 64)


@pytest.mark.spark
def test_compressed_decode_through_spark(spark):
    """End-to-end through mapInPandas: PNG rows carry the pixel checksum
    (full decode happened on executors), planted truncations dead-letter."""
    media = mm.synth_real_media_compressed(spark, 64)
    from pyspark.sql import functions as F

    corrupted = media.withColumn(
        "payload",
        F.when(F.col("doc_id") % 7 == 3,
               F.expr("substring(payload, 1, 16)")).otherwise(F.col("payload")),
    )
    rows = {r["doc_id"]: r for r in
            mm.extract_metadata(corrupted, use_real_decoder=True,
                                on_error="dead_letter").collect()}
    assert len(rows) == 64
    for i, r in rows.items():
        if i % 7 == 3:
            assert r["err"] is not None and r["width"] is None
        elif i % 4 == 0:
            w, h = i % 31 + 1, (i // 31) % 23 + 1
            assert (r["width"], r["height"]) == (w, h)
            assert bytes(r["feature"]) == _png_checksum(w, h)
        elif i % 4 == 2:
            assert r["n_frames"] == i % 40 + 1
            assert r["sample_rate"] == mm._MP3_SAMPLE_RATES[i % 3]
