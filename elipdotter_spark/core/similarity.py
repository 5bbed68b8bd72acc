"""String similarity + fuzzy/prefix term expansion with reference semantics.

Reference: /root/reference/src/proximity.rs (whole file).  The reference uses
``strsim 0.11``'s ``generic_jaro``/``generic_hamming`` over *normalized* char
sequences; we reimplement the same arithmetic (f64 internally, ratings cast to
f32 like src/proximity.rs:154-155).

``proximate_words`` reproduces:
- short words (< 3 *bytes*): similarity only, strict ``>`` threshold
  (src/proximity.rs:152-161);
- long words: prefix ("starts with") match first — rating 1.0 on equal length,
  else ``1/(0.05*len_diff + 0.5) - 1.2`` (src/proximity.rs:163-182) — then
  similarity with ``>=`` threshold (src/proximity.rs:184-190);
- first-char candidate pruning when the dictionary exceeds ``word_count_limit``
  (src/proximity.rs:199-221).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

EXACT = "exact"
HAMMING = "hamming"
JARO = "jaro"


def jaro_components(a: str, b: str):
    """(matches, transpositions) of strsim 0.11 ``generic_jaro``'s match
    loop — exposed so cross-engine gates can verify the state machine's
    integer outputs independently of the floating fold."""
    a_len, b_len = len(a), len(b)
    search_range = max(a_len, b_len) // 2 - 1
    b_consumed = [False] * b_len
    matches = 0
    transpositions = 0
    b_match_index = 0
    for i, a_elem in enumerate(a):
        min_bound = i - search_range if i > search_range else 0
        max_bound = min(b_len - 1, i + search_range)
        if min_bound > max_bound:
            continue
        for j in range(min_bound, max_bound + 1):
            if a_elem == b[j] and not b_consumed[j]:
                b_consumed[j] = True
                matches += 1
                if j < b_match_index:
                    transpositions += 1
                b_match_index = j
                break
    return matches, transpositions


def jaro(a: str, b: str) -> float:
    """strsim 0.11 ``generic_jaro`` (transpositions counted via match-index
    regressions, not halved — equivalent to classic Jaro on real inputs)."""
    a_len, b_len = len(a), len(b)
    if a_len == 0 and b_len == 0:
        return 1.0
    if a_len == 0 or b_len == 0:
        return 0.0
    if a_len == 1 and b_len == 1:
        return 1.0 if a == b else 0.0
    matches, transpositions = jaro_components(a, b)
    if matches == 0:
        return 0.0
    matches = float(matches)
    transpositions = float(transpositions)
    return (1.0 / 3.0) * (
        matches / a_len + matches / b_len + (matches - transpositions) / matches
    )


def hamming(a: str, b: str) -> float:
    """Reference's pad-free Hamming similarity (src/proximity.rs:341-365):
    differences over the min-length prefix plus the length difference,
    normalized ``1 / (diff/min + 1)``."""
    a_len, b_len = len(a), len(b)
    mn = min(a_len, b_len)
    differences = sum(1 for x, y in zip(a, b) if x != y) + (max(a_len, b_len) - mn)
    if mn == 0:
        # 0/0 -> NaN, n/0 -> inf -> score 0.0 under IEEE; mirror that.
        return float("nan") if differences == 0 else 0.0
    return 1.0 / (differences / mn + 1.0)


def similarity(algo: str, a: str, b: str) -> float:
    if algo == HAMMING:
        return hamming(a, b)
    if algo == JARO:
        return jaro(a, b)
    return 1.0 if a == b else 0.0


def rate_candidate(word: str, other: str, threshold, algo: str):
    """Accept/rate one dictionary term against one query word — the loop body
    of ``ProximateWordIter::next`` (src/proximity.rs:148-194).  Returns the
    f32 rating or None.  ``threshold`` must already be np.float32."""
    if len(word.encode("utf-8")) < 3:
        sim = np.float32(similarity(algo, other, word))
        return sim if sim > threshold else None
    len_diff = len(other) - len(word.encode("utf-8"))
    if len_diff >= 0 and other[: len(word)] == word:
        if len_diff == 0:
            return np.float32(1.0)
        # all-f32 arithmetic: 1/(0.05*len_diff + 0.5) - 1.2 (src/proximity.rs:176-180)
        return np.float32(
            np.float32(1.0)
            / ((np.float32(0.05) * np.float32(len_diff)) + np.float32(0.5))
            - np.float32(1.2)
        )
    sim = np.float32(similarity(algo, other, word))
    return sim if sim >= threshold else None


def proximate_words(
    word: str,
    dictionary: Sequence[str],
    threshold: float,
    algo: str,
    word_count_upper_limit: int,
    word_count_limit: int,
) -> Dict[str, np.float32]:
    """Expansion table for one (already normalized) query word.

    ``dictionary`` must be the full sorted term dictionary; first-char pruning
    is applied here when it exceeds ``word_count_limit``.  Returns
    ``{index_term: rating_f32}`` in sorted-term order (BTreeMap semantics,
    src/proximity.rs:137-147).
    """
    threshold = np.float32(threshold)
    if word and word_count_upper_limit > word_count_limit:
        c = word[0]
        candidates = [t for t in dictionary if t and t[0] == c]
    else:
        candidates = list(dictionary)

    out: Dict[str, np.float32] = {}
    for other in candidates:
        r = rate_candidate(word, other, threshold, algo)
        if r is not None:
            out[other] = r
    return dict(sorted(out.items()))


def build_proximate_map(
    query_words: Sequence[str],
    dictionary: Sequence[str],
    threshold: float,
    algo: str,
    word_count_limit: int,
) -> Dict[str, Dict[str, np.float32]]:
    """``ProximateMap``: query term -> {index term -> rating}
    (src/query.rs:268-282 driving src/proximity.rs:137-147)."""
    n = len(dictionary)
    out: Dict[str, Dict[str, np.float32]] = {}
    for w in query_words:
        out[w] = proximate_words(w, dictionary, threshold, algo, n, word_count_limit)
    return out
