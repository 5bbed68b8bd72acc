"""Batched exact cosine top-k (ann.cosine_topk_batch): batch == per-query
bruteforce, deterministic tie-break, dict and DataFrame query inputs."""

import pytest
from pyspark.sql import functions as F

from elipdotter_spark.operators import ann


@pytest.fixture(scope="module")
def emb(spark):
    # 40 deterministic 8-dim vectors, incl. exact duplicates (tie shapes)
    rows = []
    for i in range(40):
        base = [((1103515245 * (i * 8 + d) + 12345) % 2147483648) / 2**30 - 1.0
                for d in range(8)]
        rows.append((i, base))
    rows.append((40, rows[7][1]))  # exact duplicate of vec 7 -> cos tie
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.mark.spark
def test_batch_matches_per_query(emb):
    qvecs = {r["vec_id"]: r["embedding"]
             for r in emb.filter(F.col("vec_id") <= 2).collect()}
    batch = ann.cosine_topk_batch(emb, qvecs, k=5).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["cos"]))
    for qid, qvec in qvecs.items():
        single = [(r["vec_id"], r["cos"])
                  for r in ann.topk_bruteforce(emb, qvec, 5).collect()]
        assert [v for v, _ in by_q[qid]] == [v for v, _ in single], qid
        for (_, ca), (_, cb) in zip(by_q[qid], single):
            assert abs(ca - cb) < 1e-12


@pytest.mark.spark
def test_tie_break_is_vec_id_asc(emb):
    # query = vec 7's direction: vecs 7 and 40 are identical (cos == 1.0)
    qvec = emb.filter(F.col("vec_id") == 7).collect()[0]["embedding"]
    got = ann.cosine_topk_batch(emb, {0: qvec}, k=2, digits=6).collect()
    assert [(r["vec_id"], r["rnk"]) for r in got] == [(7, 1), (40, 2)]


@pytest.mark.spark
def test_dataframe_query_input(spark, emb):
    qdf = emb.filter(F.col("vec_id") == 3).select(
        F.lit(9).cast("long").alias("query_id"),
        F.col("embedding").alias("qvec"),
    )
    got = ann.cosine_topk_batch(emb, qdf, k=1).collect()
    assert len(got) == 1 and got[0]["query_id"] == 9 and got[0]["vec_id"] == 3
