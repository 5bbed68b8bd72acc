"""Deterministic corpus synthesis + table loading.

Two input shapes:
- the BASELINE.json ``input_hint`` pages table
  (url, warc_ts, html binary, text, lang) — synthesized deterministically
  (golden reference docs + seeded lorem-ipsum filler), used by the
  rank-identity tests and the index-build bench;
- the driver-generated ``documents`` parquet
  (doc_id, text, lang, source, n_chars) under /root/testdata/sf*/ — used by
  the ``queries()``/``oracle_sql()`` correctness gate and training-data ops.
"""

from __future__ import annotations

import datetime
import random
from typing import List, Tuple

from pyspark.sql import DataFrame, SparkSession

_LOREM_VOCAB = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit mauris interdum "
    "metus ut ullamcorper velit mi placerat diam vitae rutrum quam magna lacus "
    "curabitur ante pellentesque vel neque nullam luctus varius id porta nisi "
    "morbi hendrerit nunc non consequat eros leo in sem aliquam erat volutpat "
    "proin mollis venenatis tincidunt eget cras libero enim et aliquet duis "
    "auctor ligula cursus porttitor scelerisque ac at condimentum fusce purus "
    "posuere suscipit nulla molestie orci tellus commodo nec mattis efficitur "
    "quisque nisl fermentum finibus feugiat hac habitasse platea dictumst"
).split()


def golden_rows() -> List[Tuple[str, str, str]]:
    """(name, text, lang) for the 9 reference golden docs (FIXTURES.md §2)."""
    from .golden import AN1_CORPUS, LOREM_CORPUS, SV_CORPUS

    rows = []
    for name, text in LOREM_CORPUS:
        rows.append((name, text, "la"))
    for name, text in AN1_CORPUS:
        rows.append((f"an1_{name}", text, "en"))
    for name, text in SV_CORPUS:
        rows.append((f"sv_{name}", text, "sv"))
    return rows


def synth_filler(n: int, seed: int = 42) -> List[Tuple[str, str, str]]:
    """Seeded lorem-ipsum filler so posting lists have realistic lengths."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        length = rng.randint(20, 180)
        text = " ".join(rng.choice(_LOREM_VOCAB) for _ in range(length))
        rows.append((f"synth/{i:08d}", text, "la"))
    return rows


def pages_df(spark: SparkSession, n_filler: int = 0, seed: int = 42) -> DataFrame:
    """The input_hint table: (url, warc_ts, html, text, lang) with a dense
    deterministic doc_id (insertion order, matching the oracle DocumentMap)."""
    rows = golden_rows() + synth_filler(n_filler, seed)
    base = datetime.datetime(2026, 1, 1)
    data = [
        (
            i,
            f"https://test.example/{name}",
            base + datetime.timedelta(seconds=i),
            ("<html><body>" + text + "</body></html>").encode("utf-8"),
            text,
            lang,
        )
        for i, (name, text, lang) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        schema="doc_id long, url string, warc_ts timestamp, html binary, text string, lang string",
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
