"""Word normalization with the reference's ``Alphanumeral`` semantics.

Reference: /root/reference/src/index.rs:125-214 (``Alphanumeral``) — equality,
ordering and hashing see only alphanumeric characters, lowercased per-char via
the full Unicode mapping (Rust ``char::to_lowercase``).

Python parity notes (SURVEY.md H3):
- ``str.isalnum()`` matches Rust ``char::is_alphanumeric`` (Alphabetic + Nd/Nl/No)
  for the practical plane; the Swedish corpus + targeted codepoints are covered
  by tests.
- Rust lowercases per *char* (no context), while ``str.lower()`` on a whole
  string applies contextual rules (Greek final sigma).  We therefore lowercase
  per-char, with a fast path for strings where the two agree.
"""

from __future__ import annotations

# Characters whose whole-string lowercase differs from per-char lowercase
# (contextual Greek capital sigma is the only such case in practice).
_SIGMA = "Σ"

HYPHENS = ("-", "—", "–")  # '-', '—', '–'  (src/index.rs:473,554)


def lower_chars(s: str) -> str:
    """Per-char Unicode lowercase (Rust ``char::to_lowercase`` parity)."""
    if _SIGMA not in s:
        return s.lower()
    return "".join(c.lower() for c in s)


def normalize(word: str) -> str:
    """Strip non-alphanumerics and lowercase per-char.

    This is the index key domain: ``normalize("test-is good!") == normalize("TESTIsGood")``
    (src/index.rs:1283-1291).
    """
    if word.isalnum():
        return lower_chars(word)
    return lower_chars("".join(c for c in word if c.isalnum()))


def next_char(c: str) -> str:
    """The next valid unicode scalar after ``c`` (src/index.rs:409-428)."""
    i = ord(c)
    maxc = 0x10FFFF
    while True:
        i += 1
        if 0xD800 <= i <= 0xDFFF:
            i = 0xE000
        if i > maxc:
            return c
        return chr(i)
