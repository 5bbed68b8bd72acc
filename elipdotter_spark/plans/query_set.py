"""Batch query-set execution -> the FIXTURES.md §6 ``results`` contract.

Runs a set of queries against one index and emits one ranked results table:
``(query_id string, rank int, doc_id long, score float, start long)`` —
ratings are the engine's reference-compatible f32 relevance, rank is dense by
(rating desc, doc_id, start) per query (deterministic ties).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

from pyspark.sql import DataFrame, Window, functions as F

from ..core.parser import parse
from .compiler import QueryEngine


def run_query_set(
    engine: QueryEngine,
    queries: Dict[str, Tuple[str, int]],
    k: Optional[int] = None,
) -> DataFrame:
    """``queries`` maps query_id -> (query string, distance_threshold).

    Each query's hits are computed by the rank-identical scorer; per-query
    rank is assigned by (rating desc, doc_id asc, start asc); ``k`` truncates
    per query when given."""
    out = None
    for qid, (qstr, dist) in queries.items():
        hits = engine.hits(parse(qstr), dist).select(
            F.lit(qid).alias("query_id"),
            "doc_id",
            F.col("rating").alias("score"),
            "start",
        )
        out = hits if out is None else out.unionByName(hits)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id"), F.asc("start")
    )
    ranked = out.withColumn("rank", F.row_number().over(w))
    if k is not None:
        ranked = ranked.filter(F.col("rank") <= k)
    return ranked.select("query_id", "rank", "doc_id", "score", "start")
