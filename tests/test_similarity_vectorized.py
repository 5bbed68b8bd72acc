"""Vectorized candidate rating == scalar reference port, property-tested."""

import random

import numpy as np
import pytest

from elipdotter_spark.core.similarity import EXACT, HAMMING, JARO, rate_candidate
from elipdotter_spark.functions.similarity import batch_rate_candidates

ALPHA = "abcdefgåäö01"


def rand_word(rng, lo=1, hi=10):
    return "".join(rng.choice(ALPHA) for _ in range(rng.randint(lo, hi)))


@pytest.mark.parametrize("algo", [HAMMING, EXACT, JARO])
@pytest.mark.parametrize("seed", range(4))
def test_batch_equals_scalar(algo, seed):
    rng = random.Random(seed)
    terms = np.asarray(
        [rand_word(rng) for _ in range(300)] + ["", "a", "ab"], dtype="U"
    )
    for _ in range(12):
        word = rand_word(rng, 1, 8)
        threshold = np.float32(rng.choice([0.3, 0.6, 0.85, 1.0]))
        got = batch_rate_candidates(word, terms, threshold, algo)
        for i, t in enumerate(terms):
            want = rate_candidate(word, str(t), threshold, algo)
            if want is None:
                assert np.isnan(got[i]), (word, t, got[i], algo)
            else:
                assert got[i] == np.float32(want), (word, t, got[i], want, algo)


def test_batch_prefix_formula_exact_values():
    terms = np.asarray(["value", "values", "val", "vvv"], dtype="U")
    got = batch_rate_candidates("val", terms, np.float32(0.85), HAMMING)
    for i, t in enumerate(terms):
        want = rate_candidate("val", str(t), np.float32(0.85), HAMMING)
        if want is None:
            assert np.isnan(got[i])
        else:
            assert got[i] == np.float32(want)
