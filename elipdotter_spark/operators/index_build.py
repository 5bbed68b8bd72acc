"""Distributed inverted-index construction.

Reference semantics: posting-list build == ``insert_word`` grouping
(/root/reference/src/index.rs:1080-1098) — term -> doc -> sorted unique byte
positions; the parallel recipe is the reference's own blessed shape
(src/index.rs:328-330): shard-local digest + merge, which in Spark is
tokenize-per-partition -> shuffle by (term, doc) -> aggregate.

Scale design (SURVEY.md §4.3):
- the groupBy key is ``(term, doc_id)`` — fine-grained enough that hot terms
  (stopwords) spread over many reducers; partial aggregation (map-side
  combine) collapses duplicate positions early;
- the published table is repartitioned by ``term`` (hash bucketing) so that a
  query's posting scan touches few partitions, and sorted within partitions by
  (term, doc_id) for run-length/delta-friendly parquet encoding and
  merge-friendly scans;
- ``df``/``cf`` term stats and doc stats are separate narrow aggregates;
- everything is expressed declaratively — Catalyst chooses hash aggregates
  with partial combine; AQE handles reducer skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.tokenizer import tokens_udf

# number of term-hash buckets used for the published postings layout
DEFAULT_TERM_BUCKETS = 32


def tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exploded token stream: (doc_id, term, pos)."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), tokens_udf(F.col(text_col)).alias("toks"))
        .select("doc_id", F.explode("toks").alias("t"))
        .select("doc_id", F.col("t.term").alias("term"), F.col("t.pos").alias("pos"))
    )


def build_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    term_buckets: int = DEFAULT_TERM_BUCKETS,
    doc_salt: int = 1,
) -> DataFrame:
    """postings(term, doc_id, positions array<long>, tf int), positions sorted
    unique (A1; src/index.rs:1080-1098).

    The (term, doc) grouping happens inside the tokenizer UDF (a doc's tokens
    are already co-located), so the only shuffle in the build is the final
    repartition-by-term for the published layout — the reference's own
    parallel recipe (shard-local digest, then merge; src/index.rs:328-330)."""
    from ..functions.tokenizer import doc_postings_udf

    postings = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(doc_postings_udf(F.col(text_col))).alias("t"),
        )
        .select(
            "doc_id",
            F.col("t.term").alias("term"),
            F.col("t.positions").alias("positions"),
        )
        .withColumn("tf", F.size("positions"))
    )
    # published layout: deterministic hash buckets on term + (term, doc_id)
    # sort within partitions.  Hash bucketing (not repartitionByRange) on
    # purpose: the range partitioner SAMPLES its input, which re-runs the
    # whole tokenize lineage — measured 3.4s of a 4.4s sf0.1 build.  Postings
    # only ever see term-equality scans (expanded term sets), which parquet
    # page stats prune inside each sorted bucket file; prefix/range scans
    # happen on the *terms* dictionary, which the catalog publishes
    # partitioned by first char.
    #
    # Hot-term skew: a degenerate stopword lands in ONE bucket — AQE skew
    # splitting handles the read side, and ``doc_salt > 1`` splits the
    # WRITE side by hashed doc id: the partition key becomes
    # ``bucket * salt + doc-hash salt``, which repartition() re-hashes, so
    # a hot term's ``salt`` distinct key values spread over ~doc_salt
    # writer tasks in expectation (hash collisions can co-locate a few —
    # the spread is probabilistic, not a literal value->partition map), so
    # a 10^11-posting term spreads over ~doc_salt writer tasks/files
    # instead of melting one.  Term-equality scans then touch up to
    # doc_salt files per bucket; each stays (term, doc_id)-sorted, so every
    # downstream consumer (page-stat pruning, codec pack, merge) is
    # unaffected.  Size doc_salt so bucket_bytes/salt ~ the target file
    # size at the corpus scale.
    salt = max(1, int(doc_salt))
    if salt == 1:
        part_expr = F.pmod(F.xxhash64("term"), F.lit(term_buckets))
    else:
        part_expr = F.pmod(F.xxhash64("term"), F.lit(term_buckets)) * salt + F.pmod(
            F.xxhash64("doc_id"), F.lit(salt)
        )
    return postings.repartition(term_buckets * salt, part_expr).sortWithinPartitions(
        "term", "doc_id"
    )


def tokens_jvm(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, term) via the JVM-only tokenizer (lowercase alnum runs) —
    whole-stage-codegen, zero Python transfer.  The fast path for dedup /
    text-analysis operators, which need token *identity*, not the reference
    tokenizer's byte offsets or hyphen compounds (on ASCII corpora the two
    are provably identical)."""
    from ..functions.tokenizer import simple_terms_col

    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(simple_terms_col(F.col(text_col))).alias("term"),
    )


def docstats_from_postings(postings: DataFrame) -> DataFrame:
    """docstats derived from the already-built postings (no second tokenize
    pass over the corpus): doc_len = sum of stored tf per doc."""
    return postings.groupBy("doc_id").agg(F.sum("tf").alias("doc_len"))


def build_terms(postings: DataFrame) -> DataFrame:
    """terms(term, df, cf) — document frequency + collection frequency."""
    return postings.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("cf"),
    )


def merge_postings(a: DataFrame, b: DataFrame) -> DataFrame:
    """Segment merge (S8; ``Lossless::ingest`` src/index.rs:1049-1064):
    union position lists per (term, doc), sort, dedup.  Two-phase at scale:
    the (term, doc_id) grouping key is already salt-fine; Catalyst's partial
    aggregation merges shard-local lists before the shuffle."""
    return (
        a.select("term", "doc_id", "positions")
        .unionByName(b.select("term", "doc_id", "positions"))
        .groupBy("term", "doc_id")
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("positions")))
            ).alias("positions")
        )
        .withColumn("tf", F.size("positions"))
    )


def remove_document(postings: DataFrame, doc_ids) -> DataFrame:
    """S7: delete a document from every posting (src/index.rs:1100-1104).
    Expressed as a filter -> on Iceberg this is a partition-rewrite
    ``DELETE FROM postings WHERE doc_id IN (...)``."""
    return postings.filter(~F.col("doc_id").isin(list(doc_ids)))


def repair_stale(postings: DataFrame, docs: DataFrame) -> DataFrame:
    """S10: stale-entry repair (``MissingOccurrences::apply``,
    src/index.rs:881-954) — drop (term, doc) entries the index claims but the
    current document text lacks.  On Iceberg this is the anti-join rewritten
    as ``MERGE INTO ... WHEN MATCHED THEN DELETE``."""
    fresh = tokens(docs).select("term", "doc_id").distinct()
    return postings.join(fresh, ["term", "doc_id"], "left_semi")


def docmap(docs: DataFrame, name_col: str = "url") -> DataFrame:
    """S2: deterministic dense doc-id assignment at test scale
    (row_number over name — a single-task global sort, so test-scale only;
    ids only need to be stable+unique, SURVEY.md H1 — use
    :func:`docmap_hashed` at web scale)."""
    from pyspark.sql import Window

    w = Window.orderBy(name_col)
    return docs.select(
        (F.row_number().over(w) - F.lit(1)).cast("long").alias("doc_id"),
        F.col(name_col).alias("url"),
    )


def docmap_hashed(docs: DataFrame, name_col: str = "url") -> DataFrame:
    """S2 at web scale: doc_id = xxhash64(url) — stable, shuffle-free,
    embarrassingly parallel (no global sort / window).  Ids are sparse and
    SIGNED (negative ~half the time), which every downstream operator
    tolerates (nothing assumes density; the codec range key is exact floor
    division).  Collision math (birthday bound over 2^64): ~3% total
    collision probability at 10^9 docs, but EXPECTED collisions ~n^2/2^65 ~
    2.7e4 at 10^12 docs — so :func:`docmap_collisions` + re-keying the
    colliding urls is MANDATORY at trillion-doc scale, not a precaution."""
    return docs.select(
        F.xxhash64(F.col(name_col)).alias("doc_id"),
        F.col(name_col).alias("url"),
    )


def docmap_collisions(mapped: DataFrame) -> int:
    """Count colliding hashed ids (0 on healthy corpora) — one aggregate."""
    return (
        mapped.groupBy("doc_id")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .count()
    )


def doc_difference(a: DataFrame, b: DataFrame) -> DataFrame:
    """J3: doc-set difference a \\ b (reference set.rs:107-114 — a utility
    set operator, unused by the reference's own query path where AND-NOT
    keeps the left side at doc level).  Plain anti-join: Catalyst broadcasts
    the small side."""
    return a.select("doc_id").join(b.select("doc_id"), "doc_id", "left_anti")
