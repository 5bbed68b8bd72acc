"""The reference query set as one batch -> results table (FIXTURES.md §3/§6)."""

import numpy as np
import pytest

from elipdotter_spark.core import oracle
from elipdotter_spark.core.parser import parse
from elipdotter_spark.core.similarity import HAMMING
from elipdotter_spark.operators import index_build
from elipdotter_spark.plans.compiler import QueryEngine
from elipdotter_spark.plans.query_set import run_query_set

from fixtures import LOREM_CORPUS

QUERIES = {
    "q_and": ("feugiat luctus sem", 100),
    "q_andnot": ("volutpat -hac", 100),
    "q_andnot_rev": ("-hac volutpat", 100),
}


@pytest.mark.spark
def test_reference_query_set_results_table(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, (_n, t) in enumerate(LOREM_CORPUS)],
        schema="doc_id long, text string",
    )
    postings = index_build.build_postings(docs).cache()
    terms = index_build.build_terms(postings).cache()
    engine = QueryEngine(
        spark, postings, terms,
        proximity_threshold=0.85, algo=HAMMING, word_count_limit=2500,
    )
    results = run_query_set(engine, QUERIES, k=10)
    assert results.columns == ["query_id", "rank", "doc_id", "score", "start"]
    rows = results.collect()

    idx = oracle.Index(0.85, HAMMING, 2500)
    for i, (_n, t) in enumerate(LOREM_CORPUS):
        idx.digest_document(i, t)

    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, (qstr, dist) in QUERIES.items():
        got = sorted(by_q[qid], key=lambda r: r.rank)
        ast = parse(qstr)
        prox = idx.proximate_map(ast)
        hits = oracle.occurrences_pipeline(
            ast, lambda w: oracle.lossless_occurrences(idx, prox, w), dist
        )
        want = sorted(
            ((h.doc_id, float(np.float32(h.rating)), h.start) for h in hits),
            key=lambda x: (-x[1], x[0], x[2]),
        )[:10]
        assert [(r.doc_id, r.score, r.start) for r in got] == want, qid
        assert [r.rank for r in got] == list(range(1, len(got) + 1))
    # golden: q_andnot top hit is doc 0 @ 399 rating exactly 2.5
    top = min(by_q["q_andnot"], key=lambda r: r.rank)
    assert (top.doc_id, top.start, top.score) == (0, 399, 2.5)
