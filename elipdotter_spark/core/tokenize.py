"""Tokenizer with the reference's ``SplitNonAlphanumeric`` semantics.

Reference: /root/reference/src/index.rs:489-576 (iterator), digestion filter at
src/index.rs:464-479.  Semantics reproduced exactly:

- the text is split at *every* non-alphanumeric char; segments between
  consecutive delimiters are the words (empty segments included in the raw
  stream, filtered at digestion);
- positions are **byte** offsets into the UTF-8 encoding of the text;
- *final-token quirk* (src/index.rs:566-573): a trailing word not followed by a
  delimiter is emitted with position == byte-length of the whole text, not its
  own start;
- *hyphen compounds* (src/index.rs:543-553): when a word is terminated by one of
  ``- — –``, the span from that word's start to the delimiter that terminates
  the *next* segment is additionally emitted (e.g. ``next-gen `` emits
  ``next@0, next-gen@0, gen@5``); the compound is emitted *before* its second
  word; a compound is never emitted for a final (EOS-terminated) segment.

The per-string functions here are shared by the pure-Python oracle and by the
vectorized pandas UDFs in :mod:`elipdotter_spark.functions.tokenizer` (which
apply them per Arrow batch — no per-row Python in Spark's row path).
"""

from __future__ import annotations

import re
from typing import Iterator, List, Tuple

from .normalize import HYPHENS, normalize

# One single non-alphanumeric char.  \w == [alnum_] in Python's re with
# str patterns, so [\W_] == "not alphanumeric" == Rust !char::is_alphanumeric().
_DELIM_RE = re.compile(r"[\W_]", re.UNICODE)
# maximal alphanumeric run (a word), and the hyphen-class delimiters
_WORD_RE = re.compile(r"[^\W_]+", re.UNICODE)
_HYPHEN_RE = re.compile("[-—–]")


def split_items(s: str) -> Iterator[Tuple[str, int]]:
    """Yield ``(raw_word, char_pos)`` in the reference's exact stream order.

    ``char_pos`` is a *character* offset (callers map to bytes; see
    :func:`tokenize`).  Empty words are yielded (the reference's raw stream has
    them; digestion filters).  The final-token quirk position is ``len(s)`` in
    characters — the byte mapping must send it to the byte length.
    """
    pending = False
    h_start = 0
    prev_end = 0
    for m in _DELIM_RE.finditer(s):
        dpos = m.start()
        if pending:
            # compound spans word1..delimiter-terminating-the-next-segment
            yield s[h_start:dpos], h_start
            pending = False
        if m.group() in HYPHENS:
            h_start = prev_end
            pending = True
        yield s[prev_end:dpos], prev_end
        prev_end = dpos + 1
    seg = s[prev_end:]
    if seg:
        # final-token quirk: position = end of string (src/index.rs:566-573)
        yield seg, len(s)


def _byte_offsets(s: str) -> List[int]:
    """char index -> byte offset, length len(s)+1."""
    offs = [0] * (len(s) + 1)
    total = 0
    for i, c in enumerate(s):
        offs[i] = total
        total += len(c.encode("utf-8"))
    offs[len(s)] = total
    return offs


def tokenize(s: str) -> List[Tuple[str, int]]:
    """``(normalized_word, byte_pos)`` for every digested token.

    Mirrors ``Provider::digest_document`` (src/index.rs:464-479): empty words
    dropped; words always pass the alnum-or-hyphen admission check by
    construction (segments contain only alphanumerics; compounds additionally
    contain only the hyphen-class delimiters).  Tokens are normalized to the
    index key domain here (``insert_word`` normalizes, src/index.rs:703,1093).

    Hot path: without hyphen-class chars no compounds can occur and the
    nonempty segments are exactly the maximal alphanumeric runs — one
    word-run regex pass instead of the per-delimiter scan (~10x fewer
    Python-level iterations on typical web text).
    """
    if _HYPHEN_RE.search(s) is None:
        ascii_ = s.isascii()
        offs = None if ascii_ else _byte_offsets(s)
        n = len(s)
        out = []
        for m in _WORD_RE.finditer(s):
            p = n if m.end() == n else m.start()  # final-token quirk
            out.append((normalize(m.group()), p if ascii_ else offs[p]))
        return out
    if s.isascii():
        return [(normalize(w), p) for w, p in split_items(s) if w]
    offs = _byte_offsets(s)
    out = []
    for w, p in split_items(s):
        if w:
            out.append((normalize(w), offs[p]))
    return out


def raw_scan(s: str) -> List[Tuple[str, int]]:
    """``(raw_word, byte_pos)`` stream incl. empties — the query-time re-scan
    stream used by ``SimpleOccurrences`` (src/index.rs:802-848)."""
    if s.isascii():
        return list(split_items(s))
    offs = _byte_offsets(s)
    return [(w, offs[p]) for w, p in split_items(s)]
