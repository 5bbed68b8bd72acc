"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Decode support has three tiers:

- **real, stdlib-only, full decode**: BMP images and 16-bit PCM WAV audio
  (header parse via ``struct``), and PNG images — decoded all the way to
  reconstructed pixel bytes (stdlib ``zlib`` inflate + the five PNG scanline
  filters incl. Paeth; ``feature`` carries a rolling checksum of the pixels,
  pinned against the synthesis arithmetic in tests).  Verified cross-engine
  by the ``mm_decode_meta`` / ``mm_decode_compressed`` gates (the oracle
  recomputes the metadata from the synthesis arithmetic); corrupt/truncated
  payloads raise ``ValueError``.
- **real, stdlib-only, metadata decode**: JPEG (SOF marker scan), MP3 (MPEG1
  Layer III frame walk incl. ID3v2 skip; counts complete frames), MP4 (box
  tree walk to tkhd/stsz) — true width/height/frame-count/sample-rate from
  the actual bytes, ``feature`` NULL: the pixel/sample payload decode of
  these formats still needs PIL/soundfile/PyAV (absent here, env-gated via
  ``decode_available``).
- **stubbed**: anything else raises ``NotImplementedError`` naming the
  missing dependency.  The deterministic fake decoder exercises the
  Spark-side contract either way: binary column handling, Arrow batch shape
  through ``mapInPandas``, metadata schema, partition-parallel extraction.

Layout convention (mirrors common lakehouse practice for image/audio/video):
    payload   binary        -- raw encoded bytes (opaque to Spark)
    modality  string        -- "image" | "audio" | "video"
    meta      struct        -- typed, extracted once at ingest
"""

from __future__ import annotations

import struct as _struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("feature", BinaryType(), True),
        # dead-letter channel: decode error (None on success) — populated
        # only with on_error="dead_letter"; on_error="raise" fails the task
        StructField("err", StringType(), True),
    ]
)


def decode_available(modality: str) -> bool:
    """True if an external FULL-payload decoder for the modality is
    importable (Pillow/soundfile/PyAV).  Independently of this, BMP, PCM-WAV
    and PNG always FULL-decode natively, and JPEG/MP3/MP4 always
    metadata-decode natively — see ``_real_decode``."""
    try:
        if modality == "image":
            import PIL  # noqa: F401
        elif modality == "audio":
            import soundfile  # noqa: F401
        elif modality == "video":
            import av  # noqa: F401
        else:
            return False
        return True
    except ImportError:
        return False


def encode_bmp(width: int, height: int) -> bytes:
    """Minimal valid 24-bpp BMP (BITMAPINFOHEADER) with deterministic pixel
    bytes — a real, stdlib-only encodable/decodable image format for testing
    the decode path without Pillow."""
    import struct

    row = (width * 3 + 3) & ~3  # rows padded to 4 bytes
    pixel_bytes = bytes((x * 7 + y * 13) % 256 for y in range(height) for x in range(row))
    size = 14 + 40 + len(pixel_bytes)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(pixel_bytes), 2835, 2835, 0, 0)
    return header + info + pixel_bytes


def encode_wav(sample_rate: int, n_samples: int) -> bytes:
    """Minimal valid 16-bit mono PCM WAV with deterministic samples."""
    import struct

    data = bytes(((i * 31) % 256) for i in range(n_samples * 2))
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"WAVEfmt " + struct.pack("<I", 16) + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks  # size = total - 8


def png_pixel(x: int, y: int, c: int) -> int:
    """Deterministic RGB pixel generator shared by the PNG encoder and the
    pixel-roundtrip tests (decode(encode(w,h)) must reproduce these bytes)."""
    return (x * 7 + y * 13 + c * 31) % 256


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def encode_png(width: int, height: int) -> bytes:
    """Real 8-bit RGB PNG (stdlib zlib), deterministic pixels via
    ``png_pixel``.  Scanline filters cycle 0..4 by row so a decoder must
    implement all five reconstruction filters (None/Sub/Up/Average/Paeth)
    to get the pixels back."""
    import struct
    import zlib

    bpp = 3
    raw_rows = [
        bytes(png_pixel(x, y, c) for x in range(width) for c in range(bpp))
        for y in range(height)
    ]
    out = []
    prior = bytes(width * bpp)
    for y, row in enumerate(raw_rows):
        ft = y % 5
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = bytes((row[i] - (row[i - bpp] if i >= bpp else 0)) % 256
                         for i in range(len(row)))
        elif ft == 2:
            filt = bytes((row[i] - prior[i]) % 256 for i in range(len(row)))
        elif ft == 3:
            filt = bytes((row[i] - ((row[i - bpp] if i >= bpp else 0)
                                    + prior[i]) // 2) % 256
                         for i in range(len(row)))
        else:
            filt = bytes((row[i] - _paeth(row[i - bpp] if i >= bpp else 0,
                                          prior[i],
                                          prior[i - bpp] if i >= bpp else 0)) % 256
                         for i in range(len(row)))
        out.append(bytes([ft]) + filt)
        prior = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"".join(out)))
            + _png_chunk(b"IEND", b""))


def encode_jpeg(width: int, height: int) -> bytes:
    """Minimal structurally-valid JPEG stream: SOI + APP0/JFIF + SOF0
    carrying the real dimensions + EOI.  Enough for any marker-walking
    metadata parser; there is deliberately no entropy-coded scan (pixel
    decode of JPEG stays env-gated on Pillow)."""
    import struct

    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHHB", 8, height, width, 3)
    for comp in range(3):
        sof0 += struct.pack(">BBB", comp + 1, 0x11, 0)
    return (b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
            + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
            + b"\xff\xd9")


_MP3_SAMPLE_RATES = (44100, 48000, 32000)  # MPEG1 samplerate index 0/1/2


def encode_mp3(sample_rate_idx: int, n_frames: int) -> bytes:
    """Real MPEG1 Layer III frame stream (128 kbps, no CRC, no padding) with
    deterministic frame bodies — headers are genuine, so frame length =
    144 * bitrate / samplerate applies; audio sample decode stays env-gated."""
    sr = _MP3_SAMPLE_RATES[sample_rate_idx]
    frame_len = 144 * 128000 // sr
    # 0xFFFB = sync + MPEG1 + Layer III + no CRC; 0x90 = bitrate idx 9
    # (128 kbps); samplerate idx in bits 3-2 of byte 2
    hdr = bytes([0xFF, 0xFB, 0x90 | (sample_rate_idx << 2), 0x00])
    frames = []
    for i in range(n_frames):
        body = bytes(((i * 17 + j * 3) % 256) for j in range(frame_len - 4))
        frames.append(hdr + body)
    return b"".join(frames)


def _mp4_box(btype: bytes, payload: bytes) -> bytes:
    import struct

    return struct.pack(">I", len(payload) + 8) + btype + payload


def encode_mp4(width: int, height: int, n_samples: int) -> bytes:
    """Minimal ISO-BMFF (MP4) with one video track: ftyp + moov holding a
    mvhd, and a trak whose tkhd carries the real 16.16 fixed-point
    dimensions and whose stbl/stsz counts the real sample (frame) number.
    Frame payload decode stays env-gated on PyAV."""
    import struct

    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    mvhd = _mp4_box(b"mvhd", struct.pack(">B3x4I", 0, 0, 0, 1000, n_samples * 40)
                    + b"\x00" * 80)
    tkhd = _mp4_box(
        b"tkhd",
        struct.pack(">B3x5I", 0, 0, 0, 1, 0, 0) + b"\x00" * 52
        + struct.pack(">II", width << 16, height << 16),
    )
    stsz = _mp4_box(b"stsz", struct.pack(">B3xII", 0, 0, n_samples)
                    + b"".join(struct.pack(">I", 100 + (i % 50))
                               for i in range(n_samples)))
    stbl = _mp4_box(b"stbl", stsz)
    minf = _mp4_box(b"minf", stbl)
    hdlr = _mp4_box(b"hdlr", struct.pack(">B3xI", 0, 0) + b"vide" + b"\x00" * 13)
    mdia = _mp4_box(b"mdia", hdlr + minf)
    trak = _mp4_box(b"trak", tkhd + mdia)
    moov = _mp4_box(b"moov", mvhd + trak)
    return ftyp + moov


def _decode_png_pixels(payload: bytes):
    """FULL stdlib PNG decode to pixel bytes: IHDR parse, CRC-checked IDAT
    inflate, all five scanline reconstruction filters.  Returns
    (width, height, depth, channels, recon) with recon the top-down
    row-major reconstructed scanline bytes."""
    import struct
    import zlib

    if len(payload) < 33:
        raise ValueError(f"corrupt/truncated PNG payload ({len(payload)} bytes)")
    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(payload):
        clen, ctype = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8:pos + 8 + clen]
        if len(data) != clen or pos + 12 + clen > len(payload):
            raise ValueError("corrupt/truncated PNG payload (chunk exceeds file)")
        crc = struct.unpack_from(">I", payload, pos + 8 + clen)[0]
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"corrupt PNG payload (bad {ctype!r} CRC)")
        if ctype == b"IHDR":
            if clen != 13:
                raise ValueError("corrupt PNG payload (IHDR length)")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if ihdr is None or not idat:
        raise ValueError("corrupt/truncated PNG payload (missing IHDR/IDAT)")
    width, height, depth, color, comp, filt, interlace = ihdr
    if interlace != 0:
        raise NotImplementedError("PNG Adam7 interlace decode not supported")
    if comp != 0 or filt != 0:
        raise ValueError("corrupt PNG payload (unknown compression/filter method)")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"corrupt PNG payload (color type {color})")
    if width == 0 or height == 0:
        raise ValueError("corrupt PNG payload (zero dimension)")
    bpp = max(1, depth * channels // 8)
    stride = (width * depth * channels + 7) // 8
    expected = (stride + 1) * height
    if expected > 1 << 29:  # 512 MiB decode cap: zip-bomb guard per payload
        raise ValueError(
            f"PNG payload declares {expected} decoded bytes — over the "
            "per-payload decode cap"
        )
    # bounded inflate: never materialize more than the header-declared size
    # (+1 sentinel byte to detect oversized streams) no matter what the
    # compressed stream claims — a crawl-scale zip-bomb guard
    d = zlib.decompressobj()
    try:
        raw = d.decompress(b"".join(idat), expected + 1)
    except zlib.error as e:
        raise ValueError(f"corrupt PNG payload (IDAT inflate: {e})")
    if len(raw) != expected or d.unconsumed_tail or d.decompress(b"", 1):
        raise ValueError("corrupt PNG payload (scanline data size mismatch)")
    recon = bytearray()
    prior = bytes(stride)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ft == 1:
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) % 256
        elif ft == 2:
            for i in range(stride):
                line[i] = (line[i] + prior[i]) % 256
        elif ft == 3:
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (left + prior[i]) // 2) % 256
        elif ft == 4:
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prior[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prior[i], ul)) % 256
        elif ft != 0:
            raise ValueError(f"corrupt PNG payload (filter type {ft})")
        recon += line
        prior = bytes(line)
    return int(width), int(height), int(depth), int(channels), bytes(recon)


def _pixel_checksum(data: bytes) -> bytes:
    """8-byte rolling checksum over pixel bytes (h = h*131 + b mod 2^61-1)
    — the proof the pixels were decoded, not just the header read."""
    h = 0
    for by in data:
        h = (h * 131 + by) % (2**61 - 1)
    return h.to_bytes(8, "big")


def _decode_png(payload: bytes) -> dict:
    """FULL stdlib PNG decode (see _decode_png_pixels); ``feature`` = the
    pixel checksum of the reconstructed scanline bytes."""
    width, height, _depth, _channels, recon = _decode_png_pixels(payload)
    return {"width": width, "height": height, "n_frames": 1,
            "sample_rate": None, "feature": _pixel_checksum(recon)}


def _decode_bmp_pixels(payload: bytes):
    """FULL stdlib BMP decode to pixel bytes (24-bpp BITMAPINFOHEADER, the
    encode_bmp shape): returns (width, height, 8, 3, recon) with recon the
    TOP-DOWN row-major BGR bytes — BMP stores rows bottom-up with 4-byte
    padding; both are undone here so recon is layout-compatible with the
    PNG decoder's output."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError(f"corrupt/truncated BMP payload ({len(payload)} bytes)")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if bpp != 24:
        raise NotImplementedError(
            f"BMP pixel decode only supports 24 bpp (got {bpp}) — other "
            "depths require Pillow"
        )
    if width <= 0 or height == 0:
        raise ValueError("corrupt BMP payload (non-positive dimension)")
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3
    if data_off + stride * height > len(payload):
        raise ValueError("corrupt/truncated BMP payload (pixel data exceeds file)")
    rows = []
    order = range(height - 1, -1, -1) if bottom_up else range(height)
    for y in order:
        base = data_off + y * stride
        rows.append(payload[base:base + width * 3])
    return int(width), int(height), 8, 3, b"".join(rows)


def _decode_jpeg_meta(payload: bytes) -> dict:
    """JPEG metadata via marker walk to the first SOFn segment (real
    dimensions from real bytes); entropy-coded pixel decode needs Pillow."""
    import struct

    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG payload (marker desync)")
        marker = payload[pos + 1]
        if marker == 0xFF:  # legal fill byte before a marker
            pos += 1
            continue
        if marker == 0xD9:  # EOI before any SOF
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD8:  # standalone
            pos += 2
            continue
        seglen = struct.unpack_from(">H", payload, pos + 2)[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 2 + seglen > len(payload) or seglen < 7:
                raise ValueError("corrupt/truncated JPEG payload (short SOF)")
            _prec, height, width = struct.unpack_from(">BHH", payload, pos + 4)
            return {"width": int(width), "height": int(height), "n_frames": 1,
                    "sample_rate": None, "feature": None}
        pos += 2 + seglen
    raise ValueError("corrupt/truncated JPEG payload (no SOF marker)")


def _decode_mp3_meta(payload: bytes) -> dict:
    """MP3 metadata via a complete-frame walk (MPEG1 Layer III): skips a
    leading ID3v2 tag, validates each 4-byte header, counts only frames
    whose full declared length is present; trailing partial bytes are an
    error.  Sample decode needs soundfile."""
    import struct

    pos = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        size = 0
        for b in payload[6:10]:
            size = (size << 7) | (b & 0x7F)
        pos = 10 + size
    bitrates = (None, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                160, 192, 224, 256, 320, None)
    n_frames, sample_rate = 0, None
    while pos < len(payload):
        if pos + 4 > len(payload):
            raise ValueError("corrupt/truncated MP3 payload (partial header)")
        b0, b1, b2, _b3 = struct.unpack_from("BBBB", payload, pos)
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError("corrupt MP3 payload (lost frame sync)")
        if (b1 & 0x18) != 0x18 or (b1 & 0x06) != 0x02:
            raise NotImplementedError(
                "only MPEG1 Layer III metadata decode is supported natively"
            )
        br = bitrates[(b2 >> 4) & 0xF]
        sr_idx = (b2 >> 2) & 0x3
        if br is None or sr_idx == 3:
            raise ValueError("corrupt MP3 payload (bad bitrate/samplerate index)")
        sr = _MP3_SAMPLE_RATES[sr_idx]
        if sample_rate is not None and sr != sample_rate:
            raise ValueError("corrupt MP3 payload (samplerate change mid-stream)")
        sample_rate = sr
        frame_len = 144 * br * 1000 // sr + ((b2 >> 1) & 1)
        if pos + frame_len > len(payload):
            raise ValueError("corrupt/truncated MP3 payload (partial final frame)")
        n_frames += 1
        pos += frame_len
    if n_frames == 0:
        raise ValueError("corrupt/truncated MP3 payload (no complete frame)")
    return {"width": None, "height": None, "n_frames": n_frames,
            "sample_rate": sample_rate, "feature": None}


def _mp4_children(data: bytes, start: int, end: int):
    import struct

    pos = start
    while pos + 8 <= end:
        size, btype = struct.unpack_from(">I4s", data, pos)
        if size < 8 or pos + size > end:
            raise ValueError("corrupt/truncated MP4 payload (bad box size)")
        yield btype, pos + 8, pos + size
        pos += size


def _decode_mp4_meta(payload: bytes) -> dict:
    """MP4 metadata via an ISO-BMFF box walk: tkhd 16.16 dimensions, stsz
    sample (frame) count of the first video track.  Frame payload decode
    needs PyAV."""
    import struct

    width = height = n_frames = None
    for btype, s, e in _mp4_children(payload, 0, len(payload)):
        if btype != b"moov":
            continue
        for t, ts, te in _mp4_children(payload, s, e):
            if t != b"trak":
                continue
            for u, us, ue in _mp4_children(payload, ts, te):
                if u == b"tkhd":
                    if ue - us < 60:
                        raise ValueError("corrupt/truncated MP4 payload (short tkhd)")
                    w, h = struct.unpack_from(">II", payload, ue - 8)
                    width, height = w >> 16, h >> 16
                elif u == b"mdia":
                    for v, vs, ve in _mp4_children(payload, us, ue):
                        if v != b"minf":
                            continue
                        for w_, ws, we in _mp4_children(payload, vs, ve):
                            if w_ != b"stbl":
                                continue
                            for x, xs, xe in _mp4_children(payload, ws, we):
                                if x == b"stsz":
                                    if xe - xs < 12:
                                        raise ValueError(
                                            "corrupt/truncated MP4 payload (short stsz)"
                                        )
                                    n_frames = struct.unpack_from(
                                        ">I", payload, xs + 8
                                    )[0]
    if width is None or n_frames is None:
        raise ValueError("corrupt/truncated MP4 payload (missing moov/tkhd/stsz)")
    return {"width": int(width), "height": int(height),
            "n_frames": int(n_frames), "sample_rate": None, "feature": None}


def _real_decode(modality: str, payload: bytes) -> dict:
    """Decode metadata (and, where stdlib allows, pixels) from REAL encoded
    bytes — no external libs.

    Full decode: BMP, 16-bit PCM WAV, and PNG (zlib inflate + all five
    scanline filters; ``feature`` = pixel checksum).  Metadata decode: JPEG
    (SOF scan), MP3 (frame walk), MP4 (box walk) — real dimensions /
    frame counts / sample rates, ``feature`` NULL (their payload decode
    still needs Pillow/soundfile/PyAV).  Unknown byte formats raise
    NotImplementedError naming the missing dependency — that boundary stays
    honest; the Spark plumbing (binary columns, Arrow batches, schema) is
    identical either way."""
    import struct

    if payload[:2] == b"BM":
        if len(payload) < 30:
            raise ValueError(
                f"corrupt/truncated BMP payload ({len(payload)} bytes)"
            )
        width, height = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        return {"width": int(width), "height": abs(int(height)),
                "n_frames": 1, "sample_rate": None,
                "feature": bytes([bpp, 0])}
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        # walk chunks for fmt + data
        pos, sample_rate, data_len, block_align = 12, None, None, 2
        while pos + 8 <= len(payload):
            cid, clen = payload[pos:pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
            if cid == b"fmt ":
                # guard against the chunk's own declared size, not just the
                # payload tail: a truncated fmt (clen < 16) would otherwise
                # silently overread the next chunk's bytes as sample_rate
                if clen < 16 or pos + 8 + 16 > len(payload):
                    raise ValueError("corrupt/truncated WAV payload (short fmt chunk)")
                _fmt, _ch, sample_rate, _br, block_align, _bits = struct.unpack_from(
                    "<HHIIHH", payload, pos + 8
                )
            elif cid == b"data":
                if pos + 8 + clen > len(payload):
                    raise ValueError(
                        "corrupt/truncated WAV payload (data chunk exceeds file)"
                    )
                data_len = clen
            pos += 8 + clen + (clen & 1)
        if sample_rate is None or data_len is None:
            raise ValueError("corrupt/truncated WAV payload (missing fmt/data chunk)")
        n_samples = data_len // max(block_align, 1)
        return {"width": None, "height": None, "n_frames": int(n_samples),
                "sample_rate": int(sample_rate), "feature": None}
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    if payload[:3] == b"\xff\xd8\xff":
        return _decode_jpeg_meta(payload)
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return _decode_mp4_meta(payload)
    if payload[:3] == b"ID3" or (
        len(payload) >= 4
        and payload[0] == 0xFF
        and (payload[1] & 0xE0) == 0xE0
    ):
        return _decode_mp3_meta(payload)
    raise NotImplementedError(
        f"real {modality} decode of this byte format requires "
        f"{'Pillow' if modality == 'image' else 'soundfile' if modality == 'audio' else 'PyAV'}"
        " which is not installed in this environment (BMP/PCM-WAV/PNG decode "
        "natively, JPEG/MP3/MP4 metadata-decode natively; other formats stay "
        "stubbed)"
    )


def _fake_decode(modality: str, payload: bytes) -> dict:
    """Deterministic stand-in: metadata derived arithmetically from bytes,
    'feature' = 8-byte rolling checksum (stands in for an embedding)."""
    n = len(payload)
    h = 0
    for by in payload[:256]:
        h = (h * 131 + by) % (2**61 - 1)
    feature = h.to_bytes(8, "big")
    if modality == "image":
        return {"width": n % 640 + 1, "height": (n // 640) % 480 + 1,
                "n_frames": 1, "sample_rate": None, "feature": feature}
    if modality == "audio":
        return {"width": None, "height": None, "n_frames": n // 2,
                "sample_rate": 16000, "feature": feature}
    return {"width": n % 640 + 1, "height": (n // 640) % 480 + 1,
            "n_frames": n % 7 + 1, "sample_rate": None, "feature": feature}


def synth_payloads(docs: DataFrame, modality: str = "image") -> DataFrame:
    """Turn a text corpus into a multimodal-shaped table (payload = encoded
    text; stands in for image/audio/video bytes)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit(modality).alias("modality"),
    )


def extract_metadata(
    payloads: DataFrame,
    use_real_decoder: bool = False,
    on_error: str = "raise",
) -> DataFrame:
    """Partition-parallel decode/feature-extract via mapInPandas (Arrow
    batches of binary payloads — the real shape a 100 TB media pipeline
    uses; only the innermost decode call is faked here).

    ``on_error``:
    - ``"raise"`` (default): a corrupt payload raises and fails the task —
      right for tests, wrong for a 100 TB ingest where one bad WARC record
      would kill the job;
    - ``"dead_letter"``: per-row error channel — bad rows keep (doc_id,
      modality, n_bytes) and carry the error message in ``err`` with NULL
      metadata, good rows flow through untouched (err NULL).  Downstream
      splits on ``err IS NULL``; the bad rows are the dead-letter table.
    """
    if on_error not in ("raise", "dead_letter"):
        raise ValueError(f"on_error must be 'raise' or 'dead_letter', got {on_error!r}")
    dead_letter = on_error == "dead_letter"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in META_SCHEMA.fields}
            for doc_id, payload, modality in zip(
                pdf["doc_id"].values, pdf["payload"], pdf["modality"]
            ):
                data = bytes(payload) if payload is not None else b""
                err = None
                try:
                    if use_real_decoder:
                        meta = _real_decode(modality, data)
                    else:
                        meta = _fake_decode(modality, data)
                # struct.error: defense in depth — a crafted container a
                # length guard missed must cost a dead-letter row, not a
                # stage retry
                except (ValueError, NotImplementedError, _struct.error) as e:
                    if not dead_letter:
                        raise
                    err = f"{type(e).__name__}: {e}"
                    meta = {k: None for k in
                            ("width", "height", "n_frames", "sample_rate", "feature")}
                rows["doc_id"].append(int(doc_id))
                rows["modality"].append(modality)
                rows["n_bytes"].append(len(data))
                rows["err"].append(err)
                for k in ("width", "height", "n_frames", "sample_rate", "feature"):
                    rows[k].append(meta[k])
            yield pd.DataFrame(rows)

    return payloads.mapInPandas(run, schema=META_SCHEMA)


def synth_real_media(spark, n: int = 500) -> DataFrame:
    """(doc_id, payload, modality) with REAL encoded bytes: even ids get a
    BMP whose dimensions are arithmetic functions of the id, odd ids a PCM
    WAV likewise — so a decoder's output is independently computable (the
    cross-engine oracle recomputes the same metadata from doc_id arithmetic,
    proving decode(encode(id)) == f(id) end to end)."""
    import pyarrow  # noqa: F401  (Arrow transfer of binary columns)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].values
            payloads, modality = [], []
            for i in ids:
                i = int(i)
                if i % 2 == 0:
                    payloads.append(encode_bmp(i % 63 + 1, (i // 63) % 47 + 1))
                    modality.append("image")
                else:
                    payloads.append(encode_wav(8000 + (i % 8) * 1000, i % 500 + 1))
                    modality.append("audio")
            yield pd.DataFrame(
                {"doc_id": ids.astype("int64"), "payload": payloads, "modality": modality}
            )

    return spark.range(0, n, 1, 16).mapInPandas(
        gen, schema="doc_id long, payload binary, modality string"
    )


def synth_real_media_compressed(spark, n: int = 500) -> DataFrame:
    """(doc_id, payload, modality) with REAL compressed-container bytes —
    PNG / JPEG / MP3 / MP4 round-robin by ``doc_id % 4``, every format
    parameter an arithmetic function of the id, so a cross-engine oracle
    recomputes the decoder's output from doc_id alone (the
    ``mm_decode_compressed`` gate)."""
    import pyarrow  # noqa: F401

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].values
            payloads, modality = [], []
            for i in ids:
                i = int(i)
                if i % 4 == 0:
                    payloads.append(encode_png(i % 31 + 1, (i // 31) % 23 + 1))
                    modality.append("image")
                elif i % 4 == 1:
                    payloads.append(encode_jpeg(i % 63 + 1, (i // 63) % 47 + 1))
                    modality.append("image")
                elif i % 4 == 2:
                    payloads.append(encode_mp3(i % 3, i % 40 + 1))
                    modality.append("audio")
                else:
                    payloads.append(
                        encode_mp4(i % 127 + 16, (i // 127) % 95 + 16, i % 30 + 1)
                    )
                    modality.append("video")
            yield pd.DataFrame(
                {"doc_id": ids.astype("int64"), "payload": payloads, "modality": modality}
            )

    return spark.range(0, n, 1, 16).mapInPandas(
        gen, schema="doc_id long, payload binary, modality string"
    )


def frame_sample(
    payloads: DataFrame, every_nth: int = 2, use_real_decoder: bool = False
) -> DataFrame:
    """Video-style frame sampling plumbing: explode per-payload frame indices
    (from metadata) and keep every n-th.  With ``use_real_decoder`` the frame
    counts come from the actual bytes (WAV sample count / BMP = 1 frame);
    otherwise from the deterministic fake decoder."""
    meta = extract_metadata(payloads, use_real_decoder=use_real_decoder)
    return (
        # n_frames > 0, not just non-null: sequence(0, -1) DESCENDS in Spark,
        # so a zero-frame payload would emit phantom frame indices
        meta.filter(F.col("n_frames").isNotNull() & (F.col("n_frames") > 0))
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
        )
        .filter(F.col("frame_idx") % every_nth == 0)
    )


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("src_width", IntegerType(), True),
        StructField("src_height", IntegerType(), True),
        StructField("out_width", IntegerType(), True),
        StructField("out_height", IntegerType(), True),
        StructField("feature", BinaryType(), True),
        StructField("err", StringType(), True),
    ]
)


def _resize_nn(pixels: bytes, width: int, height: int, ch: int,
               out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resample of top-down row-major pixel bytes:
    output (j, i) reads source (floor(j*H/out_h), floor(i*W/out_w))."""
    out = bytearray()
    for j in range(out_h):
        rowbase = (j * height // out_h) * width * ch
        for i in range(out_w):
            p = rowbase + (i * width // out_w) * ch
            out += pixels[p:p + ch]
    return bytes(out)


def resize_images(
    payloads: DataFrame,
    out_w: int = 8,
    out_h: int = 8,
    use_real_decoder: bool = False,
    on_error: str = "raise",
) -> DataFrame:
    """Partition-parallel image resize via mapInPandas (Arrow batches of
    binary payloads): decode -> nearest-neighbor resample to (out_w, out_h)
    -> 8-byte pixel checksum of the resized bytes in ``feature`` — the
    thumbnail/normalization stage of a multimodal training pipeline, same
    plumbing contract as extract_metadata (schema, batching, dead-letter).

    Real-decoder tier mirrors the decode tiers: PNG and 24-bpp BMP resize
    from their actual decoded pixels (stdlib-only full decode);
    JPEG/MP3/MP4/WAV and unknown formats raise NotImplementedError naming
    the missing dependency (Pillow/PyAV) — with ``on_error='dead_letter'``
    those rows carry the message in ``err``.  The fake tier synthesizes the
    resized pixels arithmetically (png_pixel over fake dims) so pipeline
    plumbing is testable without any codec."""
    if on_error not in ("raise", "dead_letter"):
        raise ValueError(f"on_error must be 'raise' or 'dead_letter', got {on_error!r}")
    dead_letter = on_error == "dead_letter"
    if out_w <= 0 or out_h <= 0:
        raise ValueError("resize dimensions must be positive")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in RESIZE_SCHEMA.fields}
            for doc_id, payload, modality in zip(
                pdf["doc_id"].values, pdf["payload"], pdf["modality"]
            ):
                data = bytes(payload) if payload is not None else b""
                err, w, h, feat = None, None, None, None
                try:
                    if use_real_decoder:
                        if data[:8] == b"\x89PNG\r\n\x1a\n":
                            w, h, depth, ch, px = _decode_png_pixels(data)
                            if depth != 8:
                                raise NotImplementedError(
                                    f"PNG resize only supports 8-bit depth "
                                    f"(got {depth}) — other depths require Pillow"
                                )
                        elif data[:2] == b"BM":
                            w, h, _depth, ch, px = _decode_bmp_pixels(data)
                        else:
                            raise NotImplementedError(
                                "resize of this format's pixel payload "
                                "requires Pillow/PyAV"
                            )
                    else:
                        meta = _fake_decode(modality, data)
                        w, h, ch = meta["width"], meta["height"], 3
                        px = None  # synthesized directly below
                    if px is None:
                        resized = bytes(
                            png_pixel(i * w // out_w, j * h // out_h, c)
                            for j in range(out_h)
                            for i in range(out_w)
                            for c in range(ch)
                        )
                    else:
                        resized = _resize_nn(px, w, h, ch, out_w, out_h)
                    feat = _pixel_checksum(resized)
                except (ValueError, NotImplementedError, _struct.error) as e:
                    if not dead_letter:
                        raise
                    err, w, h = f"{type(e).__name__}: {e}", None, None
                rows["doc_id"].append(int(doc_id))
                rows["modality"].append(modality)
                rows["src_width"].append(w)
                rows["src_height"].append(h)
                rows["out_width"].append(None if err else out_w)
                rows["out_height"].append(None if err else out_h)
                rows["feature"].append(feat)
                rows["err"].append(err)
            yield pd.DataFrame(rows)

    return payloads.mapInPandas(run, schema=RESIZE_SCHEMA)


def synth_images(spark, n: int = 500) -> DataFrame:
    """(doc_id, payload, modality='image') — real encoded images with
    arithmetic dimensions: even doc_ids are PNG (w = id%31+1,
    h = (id//31)%23+1), odd are 24-bpp BMP (w = id%63+1, h = (id//63)%47+1);
    both formats' pixel values are pure arithmetic (png_pixel / encode_bmp's
    padded-row bytes), so a SQL oracle can recompute any pixel-derived
    quantity independently."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"].values:
                i = int(doc_id)
                if i % 2 == 0:
                    payloads.append(encode_png(i % 31 + 1, (i // 31) % 23 + 1))
                else:
                    payloads.append(encode_bmp(i % 63 + 1, (i // 63) % 47 + 1))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads,
                 "modality": ["image"] * len(payloads)}
            )

    return spark.range(0, n, 1, 8).withColumnRenamed("id", "doc_id").mapInPandas(
        gen, schema="doc_id long, payload binary, modality string"
    )
