"""Hashed-id regression: the scoring kernel must serve doc ids across the
FULL signed int64 range (xxhash64(norm_url) web-scale identity).

The per-doc sentinel mechanism (core/oracle.py SENTINEL_BASE) used base
2^61: every real doc with id >= 2^61 — one eighth of a hashed corpus —
had its hits silently filtered as "sentinels".  Base is now 2^63 (pure-
Python kernel arithmetic, one past Long.MAX, unreachable by real ids).
"""

import pytest
from pyspark.sql import functions as F

from elipdotter_spark.core.parser import parse
from elipdotter_spark.operators import index_build
from elipdotter_spark.plans.compiler import QueryEngine

EXTREME_IDS = [
    2**61,            # the old sentinel base itself
    2**62 + 5,
    2**63 - 3,        # near Long.MAX
    -(2**62) - 7,     # huge negative (hashed ids are signed)
    1000,             # ordinary id alongside
]


def _engine(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    postings = index_build.build_postings(docs)
    terms = index_build.build_terms(postings)
    return QueryEngine(
        spark, postings, terms, proximity_threshold=1.0, algo="exact"
    )


@pytest.mark.spark
def test_hits_survive_extreme_ids(spark):
    rows = [(d, "alpha beta words here") for d in EXTREME_IDS]
    eng = _engine(spark, rows)
    got = {r.doc_id for r in eng.topk("alpha beta", 1000, 10,
                                      prune=False).collect()}
    assert got == set(EXTREME_IDS)


@pytest.mark.spark
def test_pruned_equals_unpruned_on_extreme_ids(spark):
    # heterogeneous corpus so the prune phases actually run: dense docs at
    # extreme ids + a sparse tail; pruned output must stay bit-identical
    rows = [(d, "alpha beta alpha beta") for d in EXTREME_IDS]
    rows += [
        (10_000 + i, "alpha " + "filler " * 25 + "beta") for i in range(300)
    ]
    eng_p = _engine(spark, rows)
    eng_f = _engine(spark, rows)
    key = lambda r: (r.doc_id, r.start)  # noqa: E731
    pruned = sorted(
        ((r.doc_id, r.start, float(r.rating))
         for r in eng_p.topk("alpha beta", 100, 5).collect())
    )
    full = sorted(
        ((r.doc_id, r.start, float(r.rating))
         for r in eng_f.topk("alpha beta", 100, 5, prune=False).collect())
    )
    assert pruned == full
    assert {d for d, _, _ in full} <= set(EXTREME_IDS)  # dense docs win


@pytest.mark.spark
def test_sentinel_injection_still_fires_across_extreme_ids(spark):
    """The multi-doc sentinel semantics (needs_sentinel: node max > current
    doc) must hold when the NODE MAX itself is an extreme id: doc ordering
    below Long.MAX docs still injects trailing sentinels, and AND-NOT
    nearest-NOT distances stay reference-exact."""
    rows = [
        (5, "alpha beta gamma"),
        (2**63 - 1, "alpha beta"),       # the stream max at Long.MAX
        (2**61 + 1, "alpha delta beta"),
    ]
    eng = _engine(spark, rows)
    got = {r.doc_id for r in eng.doc_ids(parse("alpha beta")).collect()}
    assert got == {5, 2**63 - 1, 2**61 + 1}
    hits = eng.topk("alpha beta", 1000, 10, prune=False).collect()
    assert {r.doc_id for r in hits} == {5, 2**63 - 1, 2**61 + 1}
    # every returned rating is a real f32 rating (no sentinel leakage)
    assert all(r.rating > 0 for r in hits)
