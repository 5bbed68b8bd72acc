"""Spark engine vs oracle: index parity, boolean retrieval, rank-identical scoring."""

import numpy as np
import pytest

from elipdotter_spark.core import oracle
from elipdotter_spark.core.parser import parse
from elipdotter_spark.core.similarity import EXACT, HAMMING, JARO
from elipdotter_spark.operators import index_build
from elipdotter_spark.plans.compiler import QueryEngine

from fixtures import AN1_CORPUS, LOREM_CORPUS, SV_CORPUS


def corpus_df(spark, corpus):
    return spark.createDataFrame(
        [(i, text) for i, (_name, text) in enumerate(corpus)],
        schema="doc_id long, text string",
    )


def oracle_index(corpus, threshold, algo, limit):
    dm = oracle.DocumentMap()
    idx = oracle.Index(threshold, algo, limit)
    for name, text in corpus:
        dm.insert(name, text, idx)
    return dm, idx


def make_engine(spark, corpus, threshold, algo, limit):
    docs = corpus_df(spark, corpus)
    postings = index_build.build_postings(docs).cache()
    terms = index_build.build_terms(postings).cache()
    return QueryEngine(
        spark,
        postings,
        terms,
        proximity_threshold=threshold,
        algo=algo,
        word_count_limit=limit,
    )


def hit_key(h):
    return (h.doc_id, h.start, float(np.float32(h.rating)), h.word_id)


@pytest.mark.spark
def test_postings_match_oracle(spark):
    # unique names (DocumentMap would otherwise alias same-named docs)
    corpus = [
        (f"{i}/{name}", text)
        for i, (name, text) in enumerate(LOREM_CORPUS + AN1_CORPUS + SV_CORPUS)
    ]
    docs = corpus_df(spark, corpus)
    postings = index_build.build_postings(docs)
    got = {
        (r.term, r.doc_id): list(r.positions) for r in postings.collect()
    }
    _dm, idx = oracle_index(corpus, 0.85, HAMMING, 2500)
    want = {
        (term, doc): positions
        for term, docs_ in idx.words.items()
        for doc, positions in docs_.items()
    }
    assert got == want


@pytest.mark.spark
@pytest.mark.parametrize(
    "qstr,algo,threshold",
    [
        ("feugiat luctus sem", HAMMING, 0.85),
        ("feugiat test -sem", HAMMING, 0.85),
        ("volutpat -hac", HAMMING, 0.85),
        ("lorem or feugiat", EXACT, 1.0),
        ("(lorem or hac) -sem", HAMMING, 0.85),
    ],
)
def test_doc_retrieval_matches_oracle(spark, qstr, algo, threshold):
    corpus = LOREM_CORPUS
    engine = make_engine(spark, corpus, threshold, algo, 2500)
    _dm, idx = oracle_index(corpus, threshold, algo, 2500)
    ast = parse(qstr)
    got = sorted(r.doc_id for r in engine.doc_ids(ast).collect())
    want = oracle.documents(ast, idx)
    assert got == want, qstr


@pytest.mark.spark
@pytest.mark.parametrize(
    "corpus,qstr,algo,threshold,limit,dist",
    [
        (LOREM_CORPUS, "feugiat luctus sem", HAMMING, 0.85, 2500, 100),
        (LOREM_CORPUS, "volutpat -hac", HAMMING, 0.85, 2500, 100),
        (LOREM_CORPUS, "-hac volutpat", HAMMING, 0.85, 2500, 100),
        (AN1_CORPUS, "organization -stop", EXACT, 1.0, 100, 1000),
        (SV_CORPUS, "vi -planet", JARO, 0.9, 100, 100_000),
        (LOREM_CORPUS, "lorem", EXACT, 1.0, 100, 100),
        (LOREM_CORPUS, "(feugiat or lorem) (sem -hac)", HAMMING, 0.85, 2500, 1000),
    ],
)
def test_scoring_rank_identical(spark, corpus, qstr, algo, threshold, limit, dist):
    engine = make_engine(spark, corpus, threshold, algo, limit)
    _dm, idx = oracle_index(corpus, threshold, algo, limit)
    ast = parse(qstr)

    prox = idx.proximate_map(ast)
    want = oracle.occurrences_pipeline(
        ast, lambda w: oracle.lossless_occurrences(idx, prox, w), dist
    )
    got = engine.hits(ast, dist).collect()

    got_full = sorted(
        (
            r.doc_id,
            r.start,
            r.rating,
            r.word_id,
            tuple(sorted((m.start, m.word_id) for m in r.matched)),
        )
        for r in got
    )
    want_full = sorted(
        (
            h.doc_id,
            h.start,
            float(np.float32(h.rating)),
            h.word_id,
            tuple(sorted(h.iter_occurrences())),
        )
        for h in want
    )
    assert got_full == want_full, qstr


@pytest.mark.spark
def test_expansions_match_oracle(spark):
    corpus = SV_CORPUS
    engine = make_engine(spark, corpus, 0.9, JARO, 100)
    _dm, idx = oracle_index(corpus, 0.9, JARO, 100)
    ast = parse("vi -planet")
    got = engine.expansions(ast)
    want = idx.proximate_map(ast)
    assert {w: {t: float(r) for t, r in d.items()} for w, d in got.items()} == {
        w: {t: float(r) for t, r in d.items()} for w, d in want.items()
    }


@pytest.mark.spark
def test_topk(spark):
    engine = make_engine(spark, SV_CORPUS, 0.9, JARO, 100)
    rows = engine.topk("vi -planet", 100_000, 2).collect()
    assert len(rows) == 2
    assert rows[0].rating >= rows[1].rating


@pytest.mark.spark
@pytest.mark.parametrize("qstr", ["lorem", "volutpat -hac", "-hac volutpat"])
def test_single_leaf_retrieval_short_circuits(spark, qstr):
    """A bare-Word root (or AND-NOT of a Word, J6) must skip the qword
    membership aggregate: retrieval is one term-pruned distinct (the
    round-1 fast path the round-2 uniform algebra lost — 2.3x on the
    AND-NOT bench).  Result must still equal the general-path doc set.
    (Round 7: the general path's marker is the per-qword flags aggregate
    ``__f0`` — doc_ids no longer collects string arrays.)"""
    engine = make_engine(spark, LOREM_CORPUS, 0.85, HAMMING, 2500)
    ast = parse(qstr)
    df = engine.doc_ids(ast)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "collect_set" not in plan and "__f0" not in plan, qstr

    # general path (no short-circuit): same docs
    exp = engine.expansions(ast)
    general = (
        engine._qword_sets(exp)
        .filter(engine._node_member_exprs(ast)[0])
        .select("doc_id")
    )
    assert sorted(r.doc_id for r in df.collect()) == sorted(
        r.doc_id for r in general.collect()
    )

    # a genuinely multi-leaf root must NOT short-circuit: it runs the
    # per-qword flags membership aggregate
    multi = engine.doc_ids(parse("lorem feugiat"))
    mplan = multi._jdf.queryExecution().executedPlan().toString()
    assert "__f0" in mplan
