"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real decoders (PIL/ffmpeg/torchaudio) are not available in this container, so
the decode step is **stubbed** behind ``decode_available()`` — attempting a
real decode raises ``NotImplementedError`` with the dependency named, while
the deterministic fake decoder exercises the full Spark-side contract that
matters at scale: binary column handling, Arrow batch shape through
``mapInPandas``, metadata schema, and partition-parallel feature extraction.

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
    ]
)


def decode_available(modality: str) -> bool:
    """True if a real decoder for the modality is importable."""
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


def _real_decode(modality: str, payload: bytes):
    raise NotImplementedError(
        f"real {modality} decode requires "
        f"{'Pillow' if modality == 'image' else 'soundfile' if modality == 'audio' else 'PyAV'}"
        " which is not installed in this environment; the deterministic fake "
        "decoder below exercises the Spark-side plumbing instead"
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


def extract_metadata(payloads: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """Partition-parallel decode/feature-extract via mapInPandas (Arrow
    batches of binary payloads — the real shape a 100 TB media pipeline
    uses; only the innermost decode call is faked here)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in META_SCHEMA.fields}
            for doc_id, payload, modality in zip(
                pdf["doc_id"].values, pdf["payload"], pdf["modality"]
            ):
                data = bytes(payload) if payload is not None else b""
                if use_real_decoder:
                    meta = _real_decode(modality, data)
                else:
                    meta = _fake_decode(modality, data)
                rows["doc_id"].append(int(doc_id))
                rows["modality"].append(modality)
                rows["n_bytes"].append(len(data))
                for k in ("width", "height", "n_frames", "sample_rate", "feature"):
                    rows[k].append(meta[k])
            yield pd.DataFrame(rows)

    return payloads.mapInPandas(run, schema=META_SCHEMA)


def frame_sample(payloads: DataFrame, every_nth: int = 2) -> DataFrame:
    """Video-style frame sampling plumbing: explode per-payload frame indices
    (from metadata) and keep every n-th — the decode of each frame is the
    same stubbed boundary."""
    meta = extract_metadata(payloads)
    return (
        meta.filter(F.col("n_frames").isNotNull())
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
        )
        .filter(F.col("frame_idx") % every_nth == 0)
    )
