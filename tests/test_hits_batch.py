"""Batched reference-rating scoring: hits_batch/topk_batch are bit-identical
per query to the per-query hits()/topk ordering, across boolean shapes and
both algos (exact + fuzzy expansion), with one posting-scan pipeline for the
whole set.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from elipdotter_spark.core.parser import parse
from elipdotter_spark.operators import index_build
from elipdotter_spark.plans.compiler import QueryEngine

QUERIES = {
    1: "table value",
    2: "table or vector",
    3: "table value -vector",
    4: "(table or vector) value",
    5: "nosuchword value",
}
DIST = 100


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    postings = index_build.build_postings(docs).cache()
    terms = index_build.build_terms(postings).cache()
    return postings, terms


def _engine(spark, postings, terms, algo="exact", threshold=1.0):
    return QueryEngine(
        spark, postings, terms,
        proximity_threshold=threshold, algo=algo, word_count_limit=1000,
    )


def _hit_key(r):
    return (r.doc_id, r.start, float(np.float32(r.rating)), r.word_id, r.merged)


def _want_per_query(eng, queries):
    return {
        qid: sorted(_hit_key(r) for r in eng.hits(parse(q), DIST).collect())
        for qid, q in queries.items()
    }


@pytest.mark.spark
def test_hits_batch_bit_identical_exact(spark, index):
    postings, terms = index
    eng = _engine(spark, postings, terms)
    want = _want_per_query(eng, QUERIES)
    rows = eng.hits_batch(QUERIES, DIST).collect()
    got = {qid: [] for qid in QUERIES}
    for r in rows:
        got[r.query_id].append(_hit_key(r))
    assert {q: sorted(v) for q, v in got.items()} == want
    assert got[5] == []  # unknown word intersected away


@pytest.mark.spark
def test_hits_batch_bit_identical_fuzzy(spark, index):
    postings, terms = index
    eng = _engine(spark, postings, terms, algo="hamming", threshold=0.85)
    queries = {1: "tabl valu", 2: "vecto -fas"}
    want = _want_per_query(eng, queries)
    rows = eng.hits_batch(queries, DIST).collect()
    got = {qid: [] for qid in queries}
    for r in rows:
        got[r.query_id].append(_hit_key(r))
    assert {q: sorted(v) for q, v in got.items()} == want


@pytest.mark.spark
def test_topk_batch_matches_per_query_ordering(spark, index):
    postings, terms = index
    eng = _engine(spark, postings, terms)
    k = 7
    got = eng.topk_batch(QUERIES, DIST, k).collect()
    want = _want_per_query(eng, QUERIES)
    for qid in QUERIES:
        ranked = sorted(
            want[qid], key=lambda h: (-h[2], h[0], h[1])
        )[:k]
        mine = [
            (_hit_key(r), r.rnk)
            for r in sorted(
                (r for r in got if r.query_id == qid), key=lambda r: r.rnk
            )
        ]
        assert [m[0] for m in mine] == ranked, qid
        assert [m[1] for m in mine] == list(range(1, len(ranked) + 1)), qid


@pytest.mark.spark
def test_hits_batch_string_query_ids(spark, index):
    postings, terms = index
    eng = _engine(spark, postings, terms)
    rows = eng.hits_batch({"a": "table value"}, DIST).collect()
    want = sorted(_hit_key(r) for r in eng.hits(parse("table value"), DIST).collect())
    assert sorted(_hit_key(r) for r in rows) == want
    assert {r.query_id for r in rows} == {"a"}


@pytest.mark.spark
def test_hits_batch_single_posting_scan_plan(spark, index):
    """The scoring plan scans postings for the union of terms ONCE (the
    fan-out is a broadcast join), not once per query: the isin pushed
    filter lists every query's terms together."""
    postings, terms = index
    eng = _engine(spark, postings, terms)
    plan = (
        eng.hits_batch({1: "table value", 2: "vector fast"}, DIST)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


@pytest.mark.spark
def test_hits_batch_random_asts_vs_python_oracle(spark):
    """Batch separability under randomized corpora/ASTs: a batch of random
    query trees scored in ONE pipeline is bit-identical to the Python
    reference oracle run per query — the strongest guard that tagging rows
    with query_id changes nothing about any query's arithmetic."""
    import random

    from elipdotter_spark.core import oracle
    from elipdotter_spark.core.similarity import EXACT

    from test_scoring_decomposition import random_ast, random_corpus

    rng = random.Random(1306)
    corpus = random_corpus(rng, 7, 25)
    docs = spark.createDataFrame(
        [(i, t) for i, (_n, t) in enumerate(corpus)],
        schema="doc_id long, text string",
    )
    postings = index_build.build_postings(docs).cache()
    terms = index_build.build_terms(postings).cache()
    eng = QueryEngine(
        spark, postings, terms,
        proximity_threshold=1.0, algo=EXACT, word_count_limit=2500,
    )
    idx = oracle.Index(1.0, EXACT, 2500)
    for i, (_n, t) in enumerate(corpus):
        idx.digest_document(i, t)

    dist = 10
    batch = {}
    want = {}
    while len(batch) < 8:
        ast = random_ast(rng)
        try:
            prox = idx.proximate_map(ast)
            hits = oracle.occurrences_pipeline(
                ast, lambda w: oracle.lossless_occurrences(idx, prox, w), dist
            )
            want[len(batch) + 1] = sorted(
                (h.doc_id, h.start, float(np.float32(h.rating)), h.word_id)
                for h in hits
            )
        except oracle.StrayNot:
            continue
        batch[len(batch) + 1] = ast

    rows = eng.hits_batch(batch, dist).collect()
    got = {qid: [] for qid in batch}
    for r in rows:
        got[r.query_id].append(
            (r.doc_id, r.start, float(np.float32(r.rating)), r.word_id)
        )
    assert {q: sorted(v) for q, v in got.items()} == want
