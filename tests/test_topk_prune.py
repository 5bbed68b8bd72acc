"""topk() upper-bound prune: bit-identical results, fewer docs in the kernel.

The prune (plans/compiler.py topk/_upper_bound_expr) must be invisible in
results: every case compares prune=True against prune=False.  Comparison is
tie-safe — (rating desc, doc_id, start) can tie at the k boundary, where
LIMIT legitimately picks either twin in either path — so we assert (a) the
rating multisets match exactly (f32), (b) all rows strictly above the
boundary rating match as full-row sets, (c) every returned row exists in the
full unpruned hit set."""

import random

import numpy as np
import pytest

from elipdotter_spark.core.parser import parse
from elipdotter_spark.core.similarity import EXACT, HAMMING, JARO

from fixtures import AN1_CORPUS, LOREM_CORPUS, SV_CORPUS
from test_scoring_decomposition import random_corpus
from test_spark_engine import make_engine


def rows_key(rows):
    return [
        (
            r.doc_id,
            r.start,
            float(np.float32(r.rating)),
            r.word_id,
            r.merged,
            tuple(sorted((m.start, m.word_id) for m in r.matched)),
        )
        for r in rows
    ]


def assert_topk_equivalent(engine, qstr, dist, k):
    want = rows_key(engine.topk(qstr, dist, k, prune=False).collect())
    stats = {}
    got = rows_key(engine.topk(qstr, dist, k, stats_out=stats).collect())
    ctx = (qstr, k, stats)
    assert len(got) == len(want), ctx
    # exact f32 rating multiset (covers the golden +2.5 AND-NOT bonus etc.)
    assert sorted(r[2] for r in got) == sorted(r[2] for r in want), ctx
    # above the boundary rating the row sets must be identical
    if got:
        thr = min(r[2] for r in got)
        assert {r for r in got if r[2] > thr} == {
            r for r in want if r[2] > thr
        }, ctx
    # and nothing fabricated: rows all exist in the full unpruned hit set
    full = set(rows_key(engine.hits(parse(qstr), dist).collect()))
    assert set(got) <= full, ctx
    return stats


CASES = [
    (LOREM_CORPUS, "feugiat luctus sem", HAMMING, 0.85, 2500, 100),
    (LOREM_CORPUS, "volutpat -hac", HAMMING, 0.85, 2500, 100),
    (LOREM_CORPUS, "-hac volutpat", HAMMING, 0.85, 2500, 100),
    (AN1_CORPUS, "organization -stop", EXACT, 1.0, 100, 1000),
    (SV_CORPUS, "vi -planet", JARO, 0.9, 100, 100_000),
    (LOREM_CORPUS, "lorem", EXACT, 1.0, 100, 100),
    (LOREM_CORPUS, "(feugiat or lorem) (sem -hac)", HAMMING, 0.85, 2500, 1000),
]


@pytest.mark.spark
@pytest.mark.parametrize("corpus,qstr,algo,threshold,limit,dist", CASES)
def test_topk_prune_bit_identical_fixtures(
    spark, corpus, qstr, algo, threshold, limit, dist
):
    engine = make_engine(spark, corpus, threshold, algo, limit)
    for k in (1, 2, 5):
        assert_topk_equivalent(engine, qstr, dist, k)


@pytest.mark.spark
@pytest.mark.parametrize(
    "algo,threshold,limit", [(EXACT, 1.0, 2500), (HAMMING, 0.6, 4)]
)
def test_topk_prune_random_corpora(spark, algo, threshold, limit):
    rng = random.Random(1234)
    corpus = random_corpus(rng, 40, 60)
    engine = make_engine(spark, corpus, threshold, algo, limit)
    for qstr in [
        "alpha beta",
        "alpha or zeta",
        "gamma -delta",
        "(alpha or beta) -gamma",
        "eps zeta or theta -alpha",
        "alpha",
    ]:
        for k in (1, 4):
            assert_topk_equivalent(engine, qstr, rng.choice([0, 5, 50, 10**6]), k)


@pytest.mark.spark
def test_topk_prune_skips_hopeless_docs(spark):
    """The artifact the prune exists for: a long tail of low-bound docs
    never reaches the scoring kernel.  50 docs hold one far-apart
    (alpha, beta) pair each — their rating upper bound is ~5 (one
    adjacency-pair cap, no session-merge possible with single
    occurrences) — while 5 dense docs rate ~16; with k=3 the tail is
    provably out of reach and must be skipped."""
    texts = [(i, "alpha " + "filler " * 30 + "beta") for i in range(50)]
    texts += [(100 + i, "alpha beta alpha beta") for i in range(5)]
    engine = make_engine(spark, [(f"d{i}", t) for i, t in texts], 1.0, EXACT, 2500)
    stats = assert_topk_equivalent(engine, "alpha beta", 100, 3)
    assert stats["root_docs"] == 55
    assert stats["theta"] is not None
    assert stats["kernel_docs"] <= 10, stats  # tail of 50 never scored
    # and the winners are the dense docs
    # make_engine assigns dense ids by position: the 5 dense docs are 50..54
    rows = engine.topk("alpha beta", 100, 3).collect()
    assert all(r.doc_id >= 50 for r in rows), [r.doc_id for r in rows]


@pytest.mark.spark
def test_topk_prune_single_word_zero_pair_cap(spark):
    """A single-leaf query earns no adjacency bonus (all occurrences share
    one word id), so its bound must not inflate with occurrence count —
    docs with MANY spread-out occurrences of the word still prune against
    a doc with one tight merged pair."""
    texts = [(i, ("alpha " + "x " * 40) * 3) for i in range(30)]  # 3 spread occs
    texts += [(100, "alpha alpha")]  # session merge: +2.0
    engine = make_engine(spark, [(f"d{i}", t) for i, t in texts], 1.0, EXACT, 2500)
    # dist 20: "alpha alpha" tokenizes to starts (0, 11) — the reference's
    # final-token quirk records the END offset for the last token
    stats = assert_topk_equivalent(engine, "alpha", 20, 1)
    assert stats["root_docs"] == 31
    rows = engine.topk("alpha", 20, 1).collect()
    # positional ids: the merged-pair doc is the 31st (id 30)
    assert rows[0].doc_id == 30 and abs(rows[0].rating - 2.0) < 1e-6


@pytest.mark.spark
def test_topk_prune_spread_corpus_flips_futile(spark):
    """Round-5 position-spread refinement (VERDICT r4 #4): docs whose query
    words each occur TWICE but in SEGREGATED sections (alpha early, beta
    ~2,800 bytes later — the long-web-page shape) defeated the round-4
    bound: +2.0 session (nocc>=2) + 3 pairs x 5.0 put every tail doc's ub
    at ~17 while the dense docs' theta is ~16 — candidate set = everything,
    futile.  With the per-qword position extremes, the words' interval gap
    caps each pair bonus at 0.5/(0.001*gap + 0.1) ~ 0.17, so the tail's ub
    drops to ~2.5 and only the dense docs reach the kernel; results stay
    bit-identical."""
    filler = "filler " * 400  # ~2,800 bytes between the sections
    texts = [(i, f"alpha word alpha {filler} beta word beta") for i in range(300)]
    texts += [(1000 + i, "alpha beta alpha beta") for i in range(5)]
    engine = make_engine(spark, [(f"d{i}", t) for i, t in texts], 1.0, EXACT, 2500)
    stats = assert_topk_equivalent(engine, "alpha beta", 1000, 3)
    assert stats["root_docs"] == 305
    # the round-4 futility condition would have held: theta below the old
    # flat cap (2.0 session + 3 * 5.0 + pad ~ 17) that every tail doc got
    assert stats["theta"] is not None and stats["theta"] < 17.0
    assert stats["pruned"] is True, stats  # NOT futile under the new bound
    assert stats["kernel_docs"] <= 10, stats  # 300-doc tail never scored
    rows = engine.topk("alpha beta", 1000, 3).collect()
    assert all(r.doc_id >= 300 for r in rows), [r.doc_id for r in rows]


@pytest.mark.spark
def test_topk_prune_session_bonus_refuted_by_span(spark):
    """nocc == 2 with the two occurrences farther apart than the distance
    threshold proves no session merge: the +2.0 must drop out of the bound
    (three-occurrence docs keep it — middle position unknown), and results
    stay bit-identical either way."""
    far = "x " * 700  # ~1,400 bytes >> threshold 100
    # tail: two alpha occurrences too far apart to merge (true rating 0)
    texts = [(i, f"alpha {far} alpha") for i in range(40)]
    texts += [(100, "alpha alpha")]  # tight pair: merges, rating 2.0
    engine = make_engine(spark, [(f"d{i}", t) for i, t in texts], 1.0, EXACT, 2500)
    stats = assert_topk_equivalent(engine, "alpha", 100, 1)
    # without the span refutation every tail doc's ub would be >= 2.0 ~
    # theta (the merged doc's rating), keeping all 41 docs in the kernel
    assert stats["pruned"] is True, stats
    assert stats["kernel_docs"] <= 5, stats
    rows = engine.topk("alpha", 100, 1).collect()
    assert rows[0].doc_id == 40 and abs(rows[0].rating - 2.0) < 1e-6


@pytest.mark.spark
def test_topk_prune_mixed_gap_sum_bound(spark):
    """3-word mixed-gap shape (alpha+beta tight early, gamma far): the
    global-min-gap cap is 0 (alpha/beta overlap) so the flat bound stays
    at 2 x 5.0 = 10 > theta ~9.26 — futile.  The per-pair SUM bound
    (cap_ab * min(2c_a, 2c_b, c_a+c_b-1) summed) charges only ONE tight
    adjacency at 5.0 and the far pairs at ~0.17, putting the tail at ~5.3
    — pruned, bit-identical."""
    filler = "filler " * 400
    texts = [(i, f"alpha beta {filler} gamma") for i in range(300)]
    texts += [(1000 + i, "alpha beta gamma") for i in range(5)]
    engine = make_engine(spark, [(f"d{i}", t) for i, t in texts], 1.0, EXACT, 2500)
    stats = assert_topk_equivalent(engine, "alpha beta gamma", 1000, 3)
    assert stats["root_docs"] == 305
    assert stats["theta"] is not None and 5.5 < stats["theta"] < 10.0
    assert stats["pruned"] is True, stats
    assert stats["kernel_docs"] <= 10, stats
    rows = engine.topk("alpha beta gamma", 1000, 3).collect()
    assert all(r.doc_id >= 300 for r in rows), [r.doc_id for r in rows]


@pytest.mark.spark
def test_topk_spam_doc_long_merge_chain(spark):
    # ~1500 same-word repeats within the session distance in ONE doc: the
    # whole doc is a single merge chain through the Arrow kernel.  The
    # recursive chain drop overflowed Python's stack inside the UDF worker
    # on this shape (spam pages); the iterative rewrite must emit exactly
    # the chain head per doc, bit-identically pruned vs unpruned.
    corpus = [
        ("spam", "spam " * 1500),
        ("mixed", ("spam ham " * 400) + "tail"),
        ("normal", "ham and eggs with a little spam on the side"),
    ]
    engine = make_engine(spark, corpus, 1.0, EXACT, 2500)
    for qstr in ("spam", "spam ham", "spam -eggs"):
        for k in (1, 3):
            assert_topk_equivalent(engine, qstr, 100, k)


@pytest.mark.spark
def test_restricted_futile_probe_does_not_poison_global_memo(spark):
    """A site:-restricted probe over a tiny homogeneous subset whose theta
    cannot discriminate must NOT set the engine-global _prune_futile memo
    (round-7 fix, ADVICE r6): a later UNRESTRICTED query on the same
    engine — whose corpus shape the prune handles fine — must still
    prune.  An unrestricted futile probe still memoizes (unchanged)."""
    from pyspark.sql import functions as F

    # prunable corpus: long low-bound tail + dense head (the
    # skips-hopeless-docs shape)
    texts = [(i, "alpha " + "filler " * 30 + "beta") for i in range(50)]
    texts += [(100 + i, "alpha beta alpha beta") for i in range(5)]
    engine = make_engine(spark, [(f"d{i}", t) for i, t in texts], 1.0, EXACT, 2500)
    # restrict to a homogeneous slice of the DENSE docs only (ids 50..54
    # by make_engine's positional assignment): every doc hits the same
    # bound, so theta <= median ub -> futile for this restricted call
    dense = spark.range(50, 55).select(F.col("id").alias("doc_id"))
    rstats = {}
    engine.topk("alpha beta", 100, 1, stats_out=rstats, restrict=dense).collect()
    assert engine._prune_futile is False, rstats
    # the unrestricted query still prunes
    stats = assert_topk_equivalent(engine, "alpha beta", 100, 3)
    assert stats["pruned"] is True, stats
    assert stats["kernel_docs"] <= 10, stats
