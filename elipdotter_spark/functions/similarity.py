"""Vectorized candidate rating for fuzzy/prefix term expansion.

``batch_rate_candidates`` is the Arrow-batch hot path used by
``plans.compiler.expansions``: one query word against a whole numpy array of
dictionary terms, with identical results to the scalar reference port
(``core.similarity.rate_candidate`` — property-tested in
tests/test_similarity_vectorized.py).

Hamming (the reference's default algorithm) is fully vectorized: a padded
char matrix + prefix-mismatch cumsum gives every candidate's pad-free Hamming
similarity in a handful of numpy ops.  Jaro is vectorized across the
*candidate* axis (masked state machines over the char matrix); unknown
algorithms fall back to the scalar loop.
"""

from __future__ import annotations

import numpy as np

from ..core.similarity import EXACT, HAMMING, JARO, rate_candidate


def _char_matrix(terms: np.ndarray, width: int) -> np.ndarray:
    """(n, width) matrix of single chars, '\\0'-padded."""
    fixed = terms.astype(f"U{width}")
    mat = fixed.view("U1").reshape(len(terms), -1)
    if mat.shape[1] < width:  # numpy may shrink if all terms short
        pad = np.full((len(terms), width - mat.shape[1]), "", dtype="U1")
        mat = np.concatenate([mat, pad], axis=1)
    return mat


def _batch_jaro(word: str, terms: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """strsim ``generic_jaro(candidate, word)`` vectorized across candidates:
    the per-pair char scan becomes O(max_len * len(word)) masked numpy ops
    over the whole batch (state arrays: consumed matrix, match counters,
    b_match_index for the transposition rule)."""
    n = len(terms)
    wlen = len(word)
    out = np.zeros(n, dtype=np.float64)
    if wlen == 0:
        out[lens == 0] = 1.0
        return out
    W = max(int(lens.max()), 1)
    mat = _char_matrix(terms, W)
    wv = np.array(list(word), dtype="U1")

    # special case: both length 1 -> direct equality (strsim)
    one_one = (lens == 1) & (wlen == 1)

    sr = np.maximum(lens, wlen) // 2 - 1  # search range (>=0 except 1-1 case)
    consumed = np.zeros((n, wlen), dtype=bool)
    matches = np.zeros(n, dtype=np.int64)
    transp = np.zeros(n, dtype=np.int64)
    b_match_index = np.zeros(n, dtype=np.int64)

    for i in range(W):
        active = (i < lens) & ~one_one & (lens > 0)
        if not active.any():
            continue
        min_b = np.where(i > sr, i - sr, 0)
        max_b = np.minimum(wlen - 1, i + sr)
        found = np.zeros(n, dtype=bool)
        ai = mat[:, i]
        for j in range(wlen):
            cond = (
                active
                & ~found
                & (j >= min_b)
                & (j <= max_b)
                & (ai == wv[j])
                & ~consumed[:, j]
            )
            if not cond.any():
                continue
            consumed[cond, j] = True
            matches[cond] += 1
            transp[cond & (j < b_match_index)] += 1
            b_match_index = np.where(cond, j, b_match_index)
            found |= cond

    with np.errstate(divide="ignore", invalid="ignore"):
        m = matches.astype(np.float64)
        sim = (m / lens + m / wlen + (m - transp) / m) / 3.0
    sim = np.where(matches == 0, 0.0, sim)
    sim = np.where(lens == 0, 0.0, sim)
    if wlen == 1:
        sim = np.where(one_one, (mat[:, 0] == word).astype(np.float64), sim)
    return sim


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
    if algo not in (HAMMING, EXACT, JARO):
        for i, t in enumerate(terms):
            r = rate_candidate(word, str(t), threshold, algo)
            if r is not None:
                out[i] = r
        return out

    lens = np.char.str_len(terms.astype("U"))
    wbytes = len(word.encode("utf-8"))
    wchars = len(word)
    short = wbytes < 3

    if algo == EXACT:
        sim = (terms == word).astype(np.float64)
    elif algo == JARO:
        sim = _batch_jaro(word, terms, lens)
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
