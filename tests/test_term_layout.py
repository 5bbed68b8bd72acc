"""Physical first-char dictionary layout: expansion scans must prune files
(PartitionFilters), not rows, on a web-scale dictionary (VERDICT r1 #5)."""

import pytest
from pyspark.sql import functions as F

from elipdotter_spark.core.parser import parse
from elipdotter_spark.plans.compiler import QueryEngine
from elipdotter_spark.sources.catalog import write_terms

ALPHA = "abcdefghijklmnopqrstuvwxyz"


@pytest.fixture(scope="module")
def big_dict(spark, tmp_path_factory):
    """130k-term dictionary written first-char partitioned."""
    path = str(tmp_path_factory.mktemp("layout") / "terms")
    terms = spark.range(130_000).select(
        F.concat(
            F.substring(F.lit(ALPHA), (F.col("id") % 26 + 1).cast("int"), 1),
            F.lit("term"),
            F.col("id").cast("string"),
        ).alias("term"),
        F.lit(1).cast("long").alias("df"),
        F.lit(1).cast("long").alias("cf"),
    )
    write_terms(terms, path)
    return path


@pytest.mark.spark
def test_expansion_scan_partition_pruned(spark, big_dict):
    t = spark.read.parquet(big_dict)
    assert "first" in t.columns
    postings = spark.createDataFrame([], schema="term string, doc_id long, positions array<long>, tf int")
    eng = QueryEngine(spark, postings, t, proximity_threshold=0.9,
                      algo="hamming", word_count_limit=1000)
    scan = eng._expansion_scan(["qterm100", "zterm55"], prune=True)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "first" in plan, plan
    # only the q/z directories are read: every surviving term starts q or z
    firsts = {r.term[0] for r in scan.collect()}
    assert firsts <= {"q", "z"} and firsts, firsts
    # and the scan actually pruned: full dictionary is 26x larger
    assert scan.count() == 10_000  # 130k / 26 * 2


@pytest.mark.spark
def test_pruned_expansions_match_unpruned(spark, big_dict):
    """Partition-pruned expansion produces identical ratings to a full scan
    (pruning is sound: rate_candidate rejects cross-first-char anyway)."""
    t = spark.read.parquet(big_dict)
    postings = spark.createDataFrame(
        [("qterm100", 0, [0], 1)], schema="term string, doc_id long, positions array<long>, tf int"
    )
    pruned = QueryEngine(spark, postings, t, proximity_threshold=0.9,
                         algo="hamming", word_count_limit=1000)
    full = QueryEngine(spark, postings, t.drop("first"), proximity_threshold=0.9,
                       algo="hamming", word_count_limit=10**9)  # never prunes
    ast = parse("qterm100")
    assert pruned.expansions(ast) == full.expansions(ast)
