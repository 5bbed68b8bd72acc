"""Custom parser rules (reference Rule trait / literal_rule! macros) + fuzz."""

import random
import re
import string

import pytest

from elipdotter_spark.core.parser import (
    AND,
    NOT,
    OR,
    And,
    Not,
    Or,
    ParseError,
    Word,
    ast_eq,
    parse,
    rules_with,
)


def test_swedish_eller_literal():
    # doc example at /root/reference/src/query.rs:1164-1175
    rules = rules_with(extra_literals=[("eller", OR)])
    p = parse("elipdotter eller search", rules)
    assert ast_eq(p, Or(Word("elipdotter"), Word("search")))


def test_custom_not_prefix():
    # doc example at /root/reference/src/query.rs:1220-1231
    rules = rules_with(extra_not_prefixes=["~"])
    p = parse("elipdotter ~search", rules)
    assert ast_eq(p, And(Word("elipdotter"), Not(Word("search"))))


def test_custom_and_literal():
    rules = rules_with(extra_literals=[("och", AND)])
    p = parse("kvarn och icelk", rules)
    assert ast_eq(p, And(Word("kvarn"), Word("icelk")))


def test_default_rules_unchanged_by_extras():
    rules = rules_with(extra_literals=[("eller", OR)])
    assert ast_eq(parse("a and b or c", rules), parse("a and b or c"))


ALPHABET = list("ab c-!()") + ["and", "or", "not", " "]


_KEYWORD_TERM = re.compile(r"(?<![0-9a-z])(and|or|not)(?![0-9a-z])")


def _display_may_reparse_differently(disp):
    """The refereed reference quirk signatures (see core/parser.py module
    docstring), conservative over both divergence classes: (1) a
    group-closing PAIR directly before a binary op (the trailing-NOT-group
    degradation lives inside this shape); (2) a bare lowercase
    and/or/not, which in a display is a TERM whose text is an operator
    keyword (terms render lowercase, operators UPPERCASE) and is re-read
    as an operator.  Outside both signatures the re-parse is refereed
    strict-equal."""
    if ")) AND " in disp or ")) OR " in disp:
        return True
    return _KEYWORD_TERM.search(disp) is not None


@pytest.mark.parametrize("seed", range(6))
def test_parser_fuzz_roundtrip(seed):
    """Random inputs either raise a ParseError or produce an AST whose
    display form re-parses faithfully.  The invariant is the one the
    REFERENCE actually upholds (differentially refereed against its parse
    module — the absolute roundtrip claim is false for the reference too):
    strict equality unless the display carries one of the two refereed
    quirk signatures (trailing-NOT-group before a binary op; keyword-named
    term), and in every case the re-parse CONVERGES to a fixpoint within
    two steps (the classes can chain: a keyword-term re-parse can emit a
    trailing NOT-group that then degrades)."""
    rng = random.Random(seed)
    for _ in range(300):
        s = "".join(rng.choice(ALPHABET) for _ in range(rng.randint(1, 22)))
        try:
            p = parse(s)
        except ParseError:
            continue
        q = parse(str(p))
        if not _display_may_reparse_differently(str(p)):
            assert ast_eq(p, q), repr(s)
        q2 = parse(str(q))
        assert ast_eq(q2, parse(str(q2))), repr(s)  # fixpoint within 2 steps


@pytest.mark.parametrize("seed", range(3))
def test_parser_fuzz_no_crash_unicode(seed):
    rng = random.Random(100 + seed)
    pool = string.printable + "åäöÅÄÖ🏆—–\xa0"
    for _ in range(300):
        s = "".join(rng.choice(pool) for _ in range(rng.randint(0, 20)))
        try:
            parse(s)
        except ParseError:
            pass
