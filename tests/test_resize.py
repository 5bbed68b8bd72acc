"""Image resize plumbing (multimodal.resize_images): real PNG/BMP pixel
resample, tier boundary (JPEG/WAV/unknown dead-letter), fake tier, and the
nearest-neighbor arithmetic incl. upscaling."""

import pytest

from elipdotter_spark.operators import multimodal as mm


def test_resize_nn_upscale_and_downscale():
    # 2x1 RGB image: pixels (0,0)=[0,31,62], (1,0)=[7,38,69]
    px = bytes(mm.png_pixel(x, 0, c) for x in range(2) for c in range(3))
    up = mm._resize_nn(px, 2, 1, 3, 4, 2)
    # sx for i=0..3: 0,0,1,1 ; both output rows read source row 0
    row = px[0:3] + px[0:3] + px[3:6] + px[3:6]
    assert up == row + row
    down = mm._resize_nn(px, 2, 1, 3, 1, 1)
    assert down == px[0:3]


def test_bmp_pixel_decode_roundtrip():
    w, h, d, ch, px = mm._decode_bmp_pixels(mm.encode_bmp(5, 4))
    assert (w, h, ch) == (5, 4, 3) and len(px) == 5 * 4 * 3
    # top row of the decoded image is the LAST stored row (bottom-up undone)
    assert px[0] == ((0 * 3 + 0) * 7 + 3 * 13) % 256


def test_bmp_decode_rejects_truncation_and_depth():
    with pytest.raises(ValueError):
        mm._decode_bmp_pixels(mm.encode_bmp(5, 4)[:16])
    deep = bytearray(mm.encode_bmp(5, 4))
    deep[28] = 32  # claim 32 bpp
    with pytest.raises(NotImplementedError):
        mm._decode_bmp_pixels(bytes(deep))


@pytest.mark.spark
def test_resize_images_real_tier(spark):
    rows = [
        (0, mm.encode_png(10, 6), "image"),
        (1, mm.encode_bmp(9, 5), "image"),
        (2, mm.encode_jpeg(20, 10), "image"),          # metadata tier -> dead-letter
        (3, mm.encode_wav(16000, 40), "audio"),        # not an image -> dead-letter
        (4, b"\x00\x01rubbish", "image"),              # unknown -> dead-letter
        (5, mm.encode_png(10, 6)[:16], "image"),       # truncated -> dead-letter
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary, modality string")
    out = {r["doc_id"]: r for r in
           mm.resize_images(df, 4, 4, use_real_decoder=True,
                            on_error="dead_letter").collect()}
    assert out[0]["err"] is None and (out[0]["src_width"], out[0]["src_height"]) == (10, 6)
    assert out[1]["err"] is None and (out[1]["src_width"], out[1]["src_height"]) == (9, 5)
    exp0 = bytes(mm.png_pixel(i * 10 // 4, j * 6 // 4, c)
                 for j in range(4) for i in range(4) for c in range(3))
    assert bytes(out[0]["feature"]) == mm._pixel_checksum(exp0)
    for bad in (2, 3, 4, 5):
        assert out[bad]["err"] is not None and out[bad]["feature"] is None
    assert "Pillow" in out[2]["err"]  # names the missing dependency


@pytest.mark.spark
def test_resize_images_raise_mode_and_fake_tier(spark):
    bad = spark.createDataFrame(
        [(0, b"junk", "image")], "doc_id long, payload binary, modality string"
    )
    with pytest.raises(Exception):
        mm.resize_images(bad, 4, 4, use_real_decoder=True, on_error="raise").collect()
    # fake tier: dims from payload length, pixels synthesized arithmetically
    fake = mm.resize_images(bad, 4, 4, use_real_decoder=False).collect()[0]
    n = len(b"junk")
    w, h = n % 640 + 1, (n // 640) % 480 + 1
    exp = bytes(mm.png_pixel(i * w // 4, j * h // 4, c)
                for j in range(4) for i in range(4) for c in range(3))
    assert (fake["src_width"], fake["src_height"]) == (w, h)
    assert bytes(fake["feature"]) == mm._pixel_checksum(exp)
    with pytest.raises(ValueError):
        mm.resize_images(bad, 0, 4)
