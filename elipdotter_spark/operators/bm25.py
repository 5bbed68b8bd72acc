"""BM25 top-k retrieval over the inverted index (north-rule layer).

The reference engine's relevance rating is occurrence-based (replicated in
plans.compiler); the north rule additionally asks for top-k **BM25** over the
same index. Everything here is built-in-expression JVM-side math (no Python in
the hot path):

- ``idf = ln((N - df + 0.5)/(df + 0.5) + 1)`` (Lucene/ATIRE positive variant)
- ``score(d) = sum_t idf_t * tf*(k1+1)/(tf + k1*(1 - b + b*dl/avgdl))``

Scale path: per-(term, doc-block) max-impact metadata (``block_max``) enables
block-max WAND-style pruning: a first pass scores only the most promising
blocks to obtain a threshold theta (the k-th best score), then only blocks
whose upper bound ``sum_t blockmax(t, block) >= theta`` are scored exactly.
At 10^12 docs this skips the long tail of low-impact posting blocks; the
pruned plan is verified equal to the exhaustive one in tests.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

K1 = 1.2
B = 0.75
DEFAULT_BLOCK_SIZE = 128


def corpus_stats(docstats: DataFrame):
    """(N, avgdl) — one tiny job, cache the result driver-side."""
    row = docstats.agg(
        F.count("*").alias("n"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    return int(row.n), float(row.avgdl)


def _idf_col(n: int):
    return F.log((F.lit(float(n)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)


def term_impacts(
    postings: DataFrame,
    docstats: DataFrame,
    terms: DataFrame,
    n: int,
    avgdl: float,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Per-(term, doc) BM25 contribution — all JVM expressions."""
    idf = terms.select("term", "df").withColumn("idf", _idf_col(n))
    return (
        postings.select("term", "doc_id", "tf")
        .join(docstats, "doc_id")
        .join(F.broadcast(idf), "term")
        .withColumn(
            "impact",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("doc_len") / F.lit(float(avgdl)))
            ),
        )
        .select("term", "doc_id", "impact")
    )


def bm25_scores(
    postings: DataFrame,
    docstats: DataFrame,
    terms: DataFrame,
    query_terms: Sequence[str],
    n: Optional[int] = None,
    avgdl: Optional[float] = None,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Exhaustive BM25: (doc_id, score) for docs containing any query term.

    Plan shape: term-pruned posting scan -> broadcast idf join -> docstats
    join -> hash aggregate by doc (partial + final).  ``orderBy().limit(k)``
    on the result becomes TakeOrderedAndProject."""
    if n is None or avgdl is None:
        n, avgdl = corpus_stats(docstats)
    qterms = list(dict.fromkeys(query_terms))
    imp = term_impacts(
        postings.filter(F.col("term").isin(qterms)), docstats, terms, n, avgdl, k1, b
    )
    return imp.groupBy("doc_id").agg(F.sum("impact").alias("score"))


def bm25_topk(
    postings: DataFrame,
    docstats: DataFrame,
    terms: DataFrame,
    query_terms: Sequence[str],
    k: int,
    **kw,
) -> DataFrame:
    return (
        bm25_scores(postings, docstats, terms, query_terms, **kw)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


# ------------------------------------------------------------- block-max WAND


def build_block_max(
    postings: DataFrame,
    docstats: DataFrame,
    terms: DataFrame,
    n: int,
    avgdl: float,
    block_size: int = DEFAULT_BLOCK_SIZE,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Materialized per-(term, block) max impact — the ``block_max_score``
    metadata (index-build side-table, rebuilt with the index)."""
    from .codec import range_expr

    imp = term_impacts(postings, docstats, terms, n, avgdl, k1, b)
    return (
        imp.withColumn("block", range_expr(block_size))
        .groupBy("term", "block")
        .agg(F.max("impact").alias("block_max"))
    )


def bm25_topk_blockmax(
    spark: SparkSession,
    postings: DataFrame,
    docstats: DataFrame,
    terms: DataFrame,
    block_max: DataFrame,
    query_terms: Sequence[str],
    k: int,
    n: int,
    avgdl: float,
    block_size: int = DEFAULT_BLOCK_SIZE,
    probe_blocks: int = 64,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Two-phase block-max pruned top-k.

    Phase 1: score the ``probe_blocks`` blocks with the highest upper bound
    exactly -> threshold theta = k-th best score found.
    Phase 2: exact-score only blocks with upper bound >= theta.
    Result provably equals exhaustive top-k: any doc outside the surviving
    blocks has score <= its block's upper bound < theta <= true k-th score.
    """
    from .codec import range_expr

    qterms = list(dict.fromkeys(query_terms))
    bounds = (
        block_max.filter(F.col("term").isin(qterms))
        .groupBy("block")
        .agg(F.sum("block_max").alias("ub"))
    )

    probe = [r.block for r in bounds.orderBy(F.desc("ub")).limit(probe_blocks).collect()]
    if not probe:
        return bm25_topk(postings, docstats, terms, qterms, k, n=n, avgdl=avgdl)

    block_col = range_expr(block_size)
    phase1 = bm25_scores(
        postings.filter(block_col.isin(probe)),
        docstats,
        terms,
        qterms,
        n=n,
        avgdl=avgdl,
        k1=k1,
        b=b,
    )
    top1 = phase1.orderBy(F.desc("score")).limit(k).collect()
    theta = float(top1[-1].score) if len(top1) >= k else float("-inf")

    surviving = bounds.filter(F.col("ub") >= theta).select("block")
    pruned_postings = postings.withColumn("block", block_col).join(
        F.broadcast(surviving), "block"
    )
    return (
        bm25_scores(pruned_postings, docstats, terms, qterms, n=n, avgdl=avgdl, k1=k1, b=b)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
