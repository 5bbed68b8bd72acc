"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Decode support has two tiers:

- **real, stdlib-only**: BMP images and 16-bit PCM WAV audio decode natively
  (header parse via ``struct``) — ``_real_decode`` returns true width/height
  / sample-rate/sample-count, verified cross-engine by the ``mm_decode_meta``
  gate (the oracle recomputes the metadata from the synthesis arithmetic);
  corrupt/truncated payloads of these formats raise ``ValueError``.
- **stubbed**: compressed formats (PNG/JPEG/MP3/MP4) need PIL/soundfile/PyAV,
  which this container lacks — attempting them raises ``NotImplementedError``
  with the dependency named.  The deterministic fake decoder exercises the
  Spark-side contract either way: binary column handling, Arrow batch shape
  through ``mapInPandas``, metadata schema, partition-parallel extraction.

Layout convention (mirrors common lakehouse practice for image/audio/video):
    payload   binary        -- raw encoded bytes (opaque to Spark)
    modality  string        -- "image" | "audio" | "video"
    meta      struct        -- typed, extracted once at ingest
"""

from __future__ import annotations

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
    """True if a FULL (compressed-format) decoder for the modality is
    importable.  Independently of this, BMP (image) and PCM-WAV (audio)
    always decode natively — see ``_real_decode``."""
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


def _real_decode(modality: str, payload: bytes) -> dict:
    """Header-parse metadata from REAL encoded bytes — stdlib only.

    Supported without external libs: BMP (image) and 16-bit PCM WAV (audio).
    Compressed formats (JPEG/PNG/MP3/MP4) still raise NotImplementedError
    naming the missing dependency — that boundary stays honest; the Spark
    plumbing around it (binary columns, Arrow batches, schema) is identical
    either way."""
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
    raise NotImplementedError(
        f"real {modality} decode of this byte format requires "
        f"{'Pillow' if modality == 'image' else 'soundfile' if modality == 'audio' else 'PyAV'}"
        " which is not installed in this environment (BMP and PCM-WAV decode "
        "natively; compressed formats stay stubbed)"
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
                except (ValueError, NotImplementedError) as e:
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
