"""_MergeProximate chain-drop: the round-6 iterative rewrite must be
bit-identical to the reference's recursive form (src/query.rs:387-431),
and must survive chains far past Python's recursion limit — a doc
repeating one word ~500+ times within the session distance (spam pages)
overflowed the recursive port inside the scoring kernel."""

import sys

import numpy as np
import pytest

from elipdotter_spark.core import oracle
from elipdotter_spark.core.parser import parse

DIST = 100


class _RecursiveMergeProximate(oracle._MergeProximate):
    """The pre-round-6 port, verbatim: recursion depth == chain length."""

    def __next__(self):
        v = self._next_inner()
        if v is None:
            raise StopIteration
        peeked = self._peeked()
        if peeked is None:
            return v
        if peeked.doc_id != v.doc_id:
            return v
        dist = abs(v.start - peeked.start)
        if dist > self.distance_threshold:
            return v
        v.rating = oracle.F(v.rating + oracle.F(2.0))
        v.merge(peeked)
        self._drop_next()
        return v

    def _drop_next(self):
        try:
            next(self)
        except StopIteration:
            pass


def _mk_hits(spec):
    """spec: list of (doc_id, start) in stream order, seed rating 0."""
    return [oracle.Hit(start, doc, 7, np.float32(0.25)) for doc, start in spec]


def _emit(cls, spec):
    out = []
    for h in cls(iter(_mk_hits(spec)), DIST):
        out.append(
            (
                h.doc_id,
                h.start,
                float(h.rating),
                tuple(h.iter_occurrences()),
                h.merged,
            )
        )
    return out


def test_iterative_matches_recursive_randomized():
    rng = np.random.default_rng(11)
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(10000)
    try:
        for _ in range(300):
            spec = []
            for doc in range(int(rng.integers(1, 4))):
                pos, n = 0, int(rng.integers(1, 30))
                for _i in range(n):
                    pos += int(rng.integers(0, 3 * DIST))
                    spec.append((doc, pos))
            assert _emit(oracle._MergeProximate, spec) == _emit(
                _RecursiveMergeProximate, spec
            ), spec
    finally:
        sys.setrecursionlimit(old_limit)


def test_iterative_matches_recursive_chain_edges():
    # exact-threshold gaps, doc boundaries mid-chain, chain at stream end
    cases = [
        [(0, 0), (0, DIST), (0, 2 * DIST), (0, 2 * DIST + DIST + 1)],
        [(0, 0), (0, DIST + 1)],
        [(0, 0), (0, 50), (1, 60), (1, 70)],
        [(0, 0)],
        [(0, 0), (0, 10), (0, 20), (0, 30), (0, 31)],
    ]
    for spec in cases:
        assert _emit(oracle._MergeProximate, spec) == _emit(
            _RecursiveMergeProximate, spec
        ), spec


def test_spam_chain_past_recursion_limit():
    n = 5000  # recursive form dies at ~Python limit / 2 frames
    spec = [(3, i * 10) for i in range(n)]
    out = _emit(oracle._MergeProximate, spec)
    # whole chain collapses to its head: +2.0 once, first follower merged
    assert len(out) == 1
    doc, start, rating, occs, merged = out[0]
    assert (doc, start, merged) == (3, 0, True)
    assert rating == pytest.approx(2.25)
    assert occs == ((0, 7), (10, 7))


def test_spam_doc_full_pipeline_no_overflow():
    positions = [i * 10 for i in range(2000)]

    def stream(word):
        if word != "aa":
            return None
        return [(3, p, np.float32(0.0)) for p in positions]

    hits = oracle.occurrences_pipeline(parse("aa"), stream, DIST)
    assert len(hits) == 1 and hits[0].doc_id == 3
