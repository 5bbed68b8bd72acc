"""Randomized Spark-vs-oracle rank identity + error paths."""

import random

import numpy as np
import pytest

from elipdotter_spark.core import oracle
from elipdotter_spark.core.parser import Not, Word, parse
from elipdotter_spark.core.similarity import EXACT, HAMMING
from elipdotter_spark.operators import index_build
from elipdotter_spark.plans.compiler import QueryEngine

from test_scoring_decomposition import random_ast, random_corpus

VOCAB_QUERIES = [
    "alpha beta",
    "alpha or zeta",
    "gamma -delta",
    "(alpha or beta) -gamma",
    "eps zeta or theta -alpha",
    "missingword alpha",
    "etaa",
]


def build_both(spark, corpus, threshold, algo, limit):
    docs = spark.createDataFrame(
        [(i, t) for i, (_n, t) in enumerate(corpus)], schema="doc_id long, text string"
    )
    postings = index_build.build_postings(docs).cache()
    terms = index_build.build_terms(postings).cache()
    eng = QueryEngine(
        spark, postings, terms,
        proximity_threshold=threshold, algo=algo, word_count_limit=limit,
    )
    idx = oracle.Index(threshold, algo, limit)
    for i, (_n, t) in enumerate(corpus):
        idx.digest_document(i, t)
    return eng, idx


@pytest.mark.spark
@pytest.mark.parametrize("algo,threshold,limit", [(EXACT, 1.0, 2500), (HAMMING, 0.6, 4)])
def test_random_corpora_rank_identity(spark, algo, threshold, limit):
    rng = random.Random(42)
    corpus = random_corpus(rng, 8, 30)
    eng, idx = build_both(spark, corpus, threshold, algo, limit)
    for qstr in VOCAB_QUERIES:
        ast = parse(qstr)
        dist = rng.choice([0, 5, 50, 10**6])
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
        assert got == want, (qstr, dist, algo)
        docs_want = oracle.documents(ast, idx)
        docs_got = sorted(r.doc_id for r in eng.doc_ids(ast).collect())
        assert docs_got == docs_want, (qstr, algo)


@pytest.mark.spark
def test_random_asts_rank_identity(spark):
    rng = random.Random(7)
    corpus = random_corpus(rng, 6, 20)
    eng, idx = build_both(spark, corpus, 1.0, EXACT, 2500)
    checked = 0
    while checked < 6:
        ast = random_ast(rng)
        dist = rng.choice([0, 10, 10**6])
        prox = idx.proximate_map(ast)
        try:
            want = sorted(
                (h.doc_id, h.start, float(np.float32(h.rating)), h.word_id)
                for h in oracle.occurrences_pipeline(
                    ast, lambda w: oracle.lossless_occurrences(idx, prox, w), dist
                )
            )
        except oracle.StrayNot:
            with pytest.raises(oracle.StrayNot):
                eng.hits(ast, dist)
            continue
        got = sorted(
            (r.doc_id, r.start, float(np.float32(r.rating)), r.word_id)
            for r in eng.hits(ast, dist).collect()
        )
        assert got == want, (ast, dist)
        checked += 1


@pytest.mark.spark
def test_stray_not_raises(spark):
    corpus = [("d", "alpha beta")]
    eng, _ = build_both(spark, corpus, 1.0, EXACT, 2500)
    with pytest.raises(oracle.StrayNot):
        eng.doc_ids(Not(Word("alpha")))
    with pytest.raises(oracle.StrayNot):
        eng.hits(Not(Word("alpha")), 100)


@pytest.mark.spark
def test_missing_words_empty(spark):
    corpus = [("d", "alpha beta")]
    eng, _ = build_both(spark, corpus, 1.0, EXACT, 2500)
    assert eng.doc_ids(parse("nosuchword")).count() == 0
    assert eng.hits(parse("nosuchword alpha"), 100).count() == 0


@pytest.mark.spark
def test_random_asts_node_maxes_match_oracle(spark):
    """The single-pass qword-set algebra must produce the same per-node
    sentinel maxes (iter_nodes order) as the oracle's set algebra — the
    subtle invariant of the round-2 compiler refactor."""
    from test_scoring_decomposition import leaf_docs_fn

    rng = random.Random(99)
    corpus = random_corpus(rng, 6, 20)
    eng, idx = build_both(spark, corpus, 1.0, EXACT, 2500)
    checked = 0
    while checked < 8:
        ast = random_ast(rng)
        try:
            prox = idx.proximate_map(ast)
            want = oracle.node_doc_maxes(ast, leaf_docs_fn(idx, prox))
        except oracle.StrayNot:
            continue
        exp = eng.expansions(ast)
        got = eng.node_max_docs(ast, exp)
        assert got == want, (ast, got, want)
        # and the root doc set itself matches the oracle
        docs_want = oracle.documents(ast, idx)
        docs_got = sorted(r.doc_id for r in eng.doc_ids(ast, exp).collect())
        assert docs_got == docs_want, ast
        checked += 1
