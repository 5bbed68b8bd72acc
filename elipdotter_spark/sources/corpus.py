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


def extract_text(pages: DataFrame) -> DataFrame:
    """Extract text from the html payload (input_hint invariant: the result
    must be **byte-identical** to the reference tokenizer's input per url).

    The synthesized pages wrap text as ``<html><body>...</body></html>``
    (FIXTURES.md §1); real-corpus extraction would plug in here behind the
    same contract.  JVM-side: decode + strip the wrapper."""
    from pyspark.sql import functions as F

    return pages.withColumn(
        "extracted",
        F.regexp_replace(
            F.regexp_replace(
                F.decode(F.col("html"), "utf-8"), r"^<html><body>", ""
            ),
            r"</body></html>$",
            "",
        ),
    )


def zipf_corpus(
    spark: SparkSession,
    n_docs: int,
    vocab_size: int = 5000,
    doc_len: int = 80,
    partitions: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Deterministic Zipf(s≈1)-distributed synthetic corpus, generated fully
    JVM-side (no Python in the loop): token rank = floor(V^u) with
    u = xxhash64(doc_id, k, seed)/2^64 — inverse-CDF sampling of p(r) ∝ 1/r.

    Purpose: realistic term-frequency skew (the sf testdata vocabulary is
    only ~31 near-uniform terms, which exercises neither block-max pruning
    nor hot-term skew)."""
    from pyspark.sql import functions as F

    ids = spark.range(0, n_docs, 1, partitions).withColumnRenamed("id", "doc_id")
    toks = ids.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(doc_len - 1))).alias("k"),
    )
    # u in [0, 1): unsigned-normalized xxhash64
    u = (F.xxhash64("doc_id", "k", F.lit(seed)).cast("double") / F.lit(2.0**63) + 1.0) / 2.0
    rank = F.least(
        F.lit(vocab_size),
        F.greatest(F.lit(1), F.floor(F.pow(F.lit(float(vocab_size)), u)) + 1),
    )
    words = toks.select("doc_id", "k", F.concat(F.lit("t"), rank).alias("w"))
    # order by k inside the aggregate for a fully deterministic text
    return (
        words.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("k", "w"))),
                    lambda s: s["w"],
                ),
                " ",
            ).alias("text")
        )
        .select("doc_id", "text")
    )


# ------------------------------------------------------------- JSONL source

# the documents-table shape (TESTDATA.md); JSONL carries it line-per-doc
DOCS_JSONL_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def write_docs_jsonl(docs: DataFrame, path: str) -> None:
    """Write a documents table as line-delimited JSON (one object per doc)
    — the interchange format web-text corpora actually ship in (Common
    Crawl derivatives, HF datasets dumps).  Pass a post-``repartition``
    frame to control shard count/size; Spark applies codecs from the path
    or ``spark.sql.json.compression`` as usual."""
    docs.write.mode("overwrite").json(path)


def read_docs_jsonl(spark: SparkSession, path: str, schema: str = DOCS_JSONL_SCHEMA):
    """Read a line-delimited JSON documents corpus with DEAD-LETTER routing:
    returns ``(docs, dead)`` where ``docs`` carries the schema-clean rows
    and ``dead`` is ``(raw, reason)`` — one row per rejected input line,
    preserving the original text for replay after a fix (the same posture
    as the multimodal decode dead-letter: at 100 TB malformed lines are a
    certainty, and silently dropping OR failing the job are both wrong).

    Rejection reasons: ``corrupt_json`` (unparseable line, or a field whose
    value can't convert to the declared type — Spark's PERMISSIVE reader
    preserves the raw line in the corrupt column for both) and
    ``missing_doc_id`` (valid JSON without the primary key; the raw line is
    reconstructed from the parsed fields).  The reader is scan-parallel
    (JSONL splits on line boundaries; .gz shards are whole-file tasks —
    prefer many shards), the schema is enforced up front (no sampling
    inference pass over 100 TB), and unknown extra fields are ignored by
    construction."""
    from pyspark.sql import functions as F

    raw = (
        spark.read.schema(schema + ", _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    bad = F.col("_corrupt_record").isNotNull() | F.col("doc_id").isNull()
    docs = raw.filter(~bad).drop("_corrupt_record")
    data_cols = [c for c in raw.columns if c != "_corrupt_record"]
    dead = raw.filter(bad).select(
        F.coalesce(
            F.col("_corrupt_record"),
            F.to_json(F.struct(*[F.col(c) for c in data_cols])),
        ).alias("raw"),
        F.when(F.col("_corrupt_record").isNotNull(), "corrupt_json")
        .otherwise("missing_doc_id")
        .alias("reason"),
    )
    return docs, dead
