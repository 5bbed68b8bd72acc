"""Vectorized candidate rating for fuzzy/prefix term expansion.

``batch_rate_candidates`` is the Arrow-batch hot path used by
``plans.compiler.expansions``: one query word against a whole numpy array of
dictionary terms, with identical results to the scalar reference port
(``core.similarity.rate_candidate`` — property-tested in
tests/test_similarity_vectorized.py).

Hamming (the reference's default algorithm) is fully vectorized: a padded
char matrix + prefix-mismatch cumsum gives every candidate's pad-free Hamming
similarity in a handful of numpy ops.  Jaro falls back to the scalar loop
(its per-pair state machine doesn't vectorize cleanly; it is also the
reference's "2x slower, higher quality" option).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..core.similarity import EXACT, HAMMING, rate_candidate


def _char_matrix(terms: np.ndarray, width: int) -> np.ndarray:
    """(n, width) matrix of single chars, '\\0'-padded."""
    fixed = terms.astype(f"U{width}")
    mat = fixed.view("U1").reshape(len(terms), -1)
    if mat.shape[1] < width:  # numpy may shrink if all terms short
        pad = np.full((len(terms), width - mat.shape[1]), "", dtype="U1")
        mat = np.concatenate([mat, pad], axis=1)
    return mat


def batch_rate_candidates(
    word: str, terms: np.ndarray, threshold: np.float32, algo: str
) -> np.ndarray:
    """f32 ratings per term, NaN where rejected — semantics identical to
    ``rate_candidate`` (prefix branch for words >= 3 bytes; strict ``>`` for
    short words; ``>=`` for similarity on long words)."""
    n = len(terms)
    out = np.full(n, np.nan, dtype=np.float32)
    if n == 0:
        return out
    if algo not in (HAMMING, EXACT):
        for i, t in enumerate(terms):
            r = rate_candidate(word, t, threshold, algo)
            if r is not None:
                out[i] = r
        return out

    lens = np.char.str_len(terms.astype("U"))
    wbytes = len(word.encode("utf-8"))
    wchars = len(word)
    short = wbytes < 3

    if algo == EXACT:
        sim = (terms == word).astype(np.float64)
    else:
        width = max(int(lens.max()), wchars, 1)
        mat = _char_matrix(terms, width)
        wv = np.array(list(word) + [""] * (width - wchars), dtype="U1")
        neq = mat != wv[None, :]
        cum = np.cumsum(neq, axis=1)
        m = np.minimum(lens, wchars)
        mism = np.where(m > 0, cum[np.arange(n), np.maximum(m - 1, 0)], 0)
        diff = mism + (np.maximum(lens, wchars) - m)
        with np.errstate(divide="ignore", invalid="ignore"):
            sim = 1.0 / (diff / m + 1.0)  # m==0 -> inf/nan like the scalar path

    sim32 = sim.astype(np.float32)
    if short:
        mask = sim32 > threshold
        out[mask] = sim32[mask]
        return out

    # prefix branch first (takes precedence over similarity)
    len_diff = lens - wbytes
    prefix = np.zeros(n, dtype=bool)
    cand_prefix = len_diff >= 0
    if cand_prefix.any():
        starts = np.char.startswith(terms[cand_prefix].astype("U"), word)
        prefix[np.flatnonzero(cand_prefix)[starts]] = True
    eq_len = prefix & (len_diff == 0)
    longer = prefix & (len_diff > 0)
    out[eq_len] = np.float32(1.0)
    if longer.any():
        ld = len_diff[longer].astype(np.float32)
        out[longer] = (
            np.float32(1.0) / (np.float32(0.05) * ld + np.float32(0.5))
            - np.float32(1.2)
        )
    rest = ~prefix
    accept = rest & (sim32 >= threshold)
    out[accept] = sim32[accept]
    return out
