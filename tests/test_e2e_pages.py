"""End-to-end north-star pipeline: pages(html) -> extract -> index -> query.

The full input_hint flow on the synthesized Common-Crawl-style table,
rank-identical to the reference semantics on the golden query set.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from elipdotter_spark.core import oracle
from elipdotter_spark.core.parser import parse
from elipdotter_spark.core.similarity import HAMMING, JARO
from elipdotter_spark.operators import bm25, index_build
from elipdotter_spark.plans.compiler import QueryEngine
from elipdotter_spark.sources.corpus import extract_text, pages_df


@pytest.mark.spark
def test_pages_to_rank_identical_hits(spark):
    pages = pages_df(spark, n_filler=50)
    docs = extract_text(pages).select("doc_id", F.col("extracted").alias("text"))

    postings = index_build.build_postings(docs).cache()
    terms = index_build.build_terms(postings).cache()

    # oracle over the same (extracted) texts, same ids
    rows = sorted((r.doc_id, r.text) for r in docs.collect())

    for qstr, algo, threshold, limit, dist in [
        ("volutpat -hac", HAMMING, 0.85, 2500, 100),
        ("vi -planet", JARO, 0.9, 100, 100_000),
        ("feugiat luctus sem", HAMMING, 0.85, 2500, 100),
    ]:
        idx = oracle.Index(threshold, algo, limit)
        for doc_id, text in rows:
            idx.digest_document(doc_id, text)
        eng = QueryEngine(
            spark, postings, terms,
            proximity_threshold=threshold, algo=algo, word_count_limit=limit,
        )
        ast = parse(qstr)
        prox = idx.proximate_map(ast)
        want = sorted(
            (h.doc_id, h.start, float(np.float32(h.rating)), h.word_id)
            for h in oracle.occurrences_pipeline(
                ast, lambda w: oracle.lossless_occurrences(idx, prox, w), dist
            )
        )
        got = sorted(
            (r.doc_id, r.start, float(np.float32(r.rating)), r.word_id)
            for r in eng.hits(ast, dist).collect()
        )
        assert got == want, qstr
        # top-k ordering identical too (rating desc, deterministic ties)
        topk = eng.topk(qstr, dist, 5).collect()
        ranked = sorted(
            want, key=lambda h: (-h[2], h[0], h[1])
        )[:5]
        assert [(r.doc_id, float(np.float32(r.rating))) for r in topk] == [
            (h[0], h[2]) for h in ranked
        ], qstr


@pytest.mark.spark
def test_pages_bm25_flow(spark):
    pages = pages_df(spark, n_filler=200)
    docs = extract_text(pages).select("doc_id", F.col("extracted").alias("text"))
    postings = index_build.build_postings(docs).cache()
    terms = index_build.build_terms(postings)
    docstats = index_build.docstats_from_postings(postings)
    n, avgdl = bm25.corpus_stats(docstats)
    top = bm25.bm25_topk(
        postings, docstats, terms, ["volutpat", "lorem"], 5, n=n, avgdl=avgdl
    ).collect()
    assert len(top) == 5 and top[0].score >= top[-1].score
    # the golden lorem docs (0, 1) must score > 0 (filler is drawn from the
    # same vocabulary and may legitimately outrank them — BM25 favors short
    # docs — so only membership+positivity is asserted)
    scores = {
        r.doc_id: r.score
        for r in bm25.bm25_scores(
            postings, docstats, terms, ["volutpat", "lorem"], n=n, avgdl=avgdl
        ).collect()
    }
    assert scores.get(0, 0) > 0 and scores.get(1, 0) > 0
