"""Source-level pipeline operators: mixture stats, stratified sampling,
cross-source duplication matrix.  Cross-engine correctness is gated in
test_entry_contract (txt_source_mix / txt_stratified_sample /
dd_cross_source); these tests pin the operator-level contracts the SQL
can't express."""

import pytest
from pyspark.sql import functions as F

from elipdotter_spark.operators import text_analysis as ta

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.spark
def test_stratified_sample_contracts(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    full = ta.stratified_sample(docs, {}, default_fraction=1.0)
    assert full.count() == docs.count()  # fraction 1.0 keeps everything
    none = ta.stratified_sample(docs, {}, default_fraction=0.0)
    assert none.count() == 0

    half = ta.stratified_sample(docs, {}, default_fraction=0.5)
    quarter = ta.stratified_sample(docs, {}, default_fraction=0.25)
    h1 = sorted(r.doc_id for r in half.select("doc_id").collect())
    h2 = sorted(r.doc_id for r in half.select("doc_id").collect())
    assert h1 == h2  # deterministic across runs
    q = set(r.doc_id for r in quarter.select("doc_id").collect())
    assert q <= set(h1)  # nested cutoffs -> nested samples (backfill-safe)

    # scale posture: a pure filter — no Exchange anywhere in the plan
    plan = half._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    # negative (hashed web-scale) ids sample without error, portably
    neg = docs.withColumn("doc_id", F.col("doc_id") - F.lit(10**12))
    assert ta.stratified_sample(neg, {}, default_fraction=0.5).count() > 0


@pytest.mark.spark
def test_source_mix_shares_sum_to_one(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = ta.source_mix(docs).collect()
    assert rows and abs(sum(r.token_share for r in rows) - 1.0) < 1e-4
    total = sum(r.n_tokens for r in rows)
    for r in rows:
        assert abs(r.token_share - r.n_tokens / total) < 1e-6
