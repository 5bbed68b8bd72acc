"""Parser goldens — transcribed from /root/reference/src/query.rs:1246-1440."""

import pytest

from elipdotter_spark.core.parser import (
    And,
    InputEmpty,
    Not,
    NotEnoughArguments,
    Or,
    Word,
    ast_eq,
    eq_order,
    parse,
)


def w(s):
    return Word(s)


def test_parse_and():
    assert ast_eq(parse("icelk kvarn"), And(w("icelk"), w("kvarn")))


def test_parse_and_chain():
    assert ast_eq(
        parse("icelk kvarn web server"),
        And(And(And(w("icelk"), w("kvarn")), w("web")), w("server")),
    )


def test_parse_plain_not():
    assert ast_eq(parse("not icelk"), Not(w("icelk")))


def test_parse_plain_or():
    assert ast_eq(parse("or"), w("or"))
    assert ast_eq(parse("for me"), And(w("for"), w("me")))


def test_parse_empty():
    with pytest.raises(InputEmpty):
        parse("")


def test_parse_without_ops():
    assert ast_eq(parse("icelk"), w("icelk"))


def test_parse_and_before_or():
    correct = Or(And(w("icelk"), w("kvarn")), w("agde"))
    p1 = parse("icelk and kvarn or agde")
    p2 = parse("agde or icelk and kvarn")
    assert ast_eq(p1, correct) and eq_order(p1, correct)
    assert ast_eq(p2, correct) and not eq_order(p2, correct)
    assert ast_eq(parse("icelk kvarn or agde"), p1)


def test_parse_parentheses_or():
    correct = And(Or(w("icelk"), w("kvarn")), w("code"))
    p1 = parse("(icelk or kvarn) and code")
    p2 = parse("code (kvarn or icelk) ")
    assert ast_eq(p1, correct) and eq_order(p1, correct)
    assert ast_eq(p2, correct) and not eq_order(p2, correct)


def test_parse_parentheses_and():
    assert ast_eq(
        parse(" (icelk or iselk)  (kvarn or agde)))"),
        And(Or(w("icelk"), w("iselk")), Or(w("kvarn"), w("agde"))),
    )


def test_parse_parentheses_and_not():
    expected = And(w("icelk"), Not(Or(w("kvarn"), w("agde"))))
    assert ast_eq(parse("icelk -(agde or kvarn)"), expected)
    assert ast_eq(parse("icelk - (agde or kvarn)"), expected)


def test_parse_not():
    assert ast_eq(parse("not"), w("not"))
    with pytest.raises(NotEnoughArguments):
        parse("not ")


def test_parse_space():
    with pytest.raises(InputEmpty):
        parse(" ")


def test_parse_parentheses_space():
    with pytest.raises(InputEmpty):
        parse(" (  ) ")


def test_parse_binary_one_arg():
    assert ast_eq(parse("or icelk"), And(w("or"), w("icelk")))


def test_parse_parentheses_binary_one_arg():
    assert ast_eq(parse("(or (icelk))"), And(w("or"), w("icelk")))


def test_parse_operation_order():
    assert ast_eq(
        parse("icelk and not kvarn or agde"),
        Or(And(w("icelk"), Not(w("kvarn"))), w("agde")),
    )
    assert ast_eq(
        parse("icelk or not kvarn or agde"),
        Or(Or(w("icelk"), Not(w("kvarn"))), w("agde")),
    )
    assert ast_eq(
        parse("agde not sync or icelk and not kvarn or agde"),
        Or(
            Or(
                And(w("agde"), Not(w("sync"))),
                And(w("icelk"), Not(w("kvarn"))),
            ),
            w("agde"),
        ),
    )


def test_parse_prefix_not():
    assert ast_eq(parse("icelk !kvarn"), parse("icelk -kvarn"))
    assert ast_eq(parse("icelk !kvarn"), And(w("icelk"), Not(w("kvarn"))))
    assert ast_eq(parse("elipdotter -search"), And(w("elipdotter"), Not(w("search"))))


def test_parse_non_alphanumeral():
    assert ast_eq(parse("icelk.dev"), w("icelkdev"))
    assert ast_eq(
        parse("next-generation kvarn"),
        And(And(w("next"), w("generation")), w("kvarn")),
    )


@pytest.mark.parametrize(
    "q",
    [
        "agde not sync or icelk and not kvarn or agde",
        " ( kvarn ) icelk ",
        " (icelk or iselk)  (kvarn or agde)))",
        "(or (icelk))",
    ],
)
def test_parse_display_roundtrip(q):
    p = parse(q)
    assert ast_eq(p, parse(str(p)))


def test_parse_deep_nesting_iterative_and_capped():
    # the sub-parser chain is walked iteratively (the reference recurses;
    # per-char O(depth) Python frames overflowed at ~1000 deep), and depth
    # past MAX_NESTING is a clean ParseError — not a RecursionError — so
    # adversarial input can't crash the query surface or the recursive
    # AST walks downstream
    from elipdotter_spark.core.parser import MAX_NESTING, TooDeeplyNested

    d = MAX_NESTING
    assert ast_eq(parse("(" * d + "hello world" + ")" * d),
                  parse("hello world"))
    with pytest.raises(TooDeeplyNested):
        parse("(" * (d + 1) + "x" + ")" * (d + 1))
    with pytest.raises(TooDeeplyNested):
        parse("(" * 5000 + "x" + ")" * 5000)


def test_parse_flat_chain_depth_capped():
    # depth also comes from flat word chains (left-deep AND); past
    # MAX_NESTING every downstream recursive walk (str, ast_eq,
    # iter_nodes, compile) would overflow — parse rejects cleanly instead
    from elipdotter_spark.core.parser import MAX_NESTING, TooDeeplyNested

    ok = " ".join(f"w{i}" for i in range(MAX_NESTING))
    p = parse(ok)
    assert ast_eq(p, parse(str(p)))  # all walkers survive at the cap
    with pytest.raises(TooDeeplyNested):
        parse(" ".join(f"w{i}" for i in range(3000)))


# ------------------------------------------------- refereed quirk goldens
# Differentially refereed against the reference's own parse module compiled
# standalone (src/query.rs:700-1100; 83,794 random inputs, zero AST or
# error-class divergences).  These pin the two display-roundtrip divergence
# classes the REFERENCE itself exhibits — our parser must reproduce them
# bit-for-bit, not "fix" them.  See core/parser.py module docstring.


def test_quirk_trailing_not_group_degrades_binary_op():
    # refereed: ((a AND (NOT c)) OR b) re-parses with OR degraded to AND
    p = parse("((a AND (NOT c)) OR b)")
    assert ast_eq(p, And(And(w("a"), Not(w("c"))), w("b")))
    # ...and the degraded form is a display fixpoint
    assert ast_eq(parse(str(p)), p)


def test_quirk_trailing_not_group_boundary_is_sharp():
    # refereed faithful: leading NOT-group, NOT over a group operand,
    # trailing PLAIN group — none degrade
    assert ast_eq(parse("((NOT c) OR b)"), Or(Not(w("c")), w("b")))
    assert ast_eq(
        parse("((a AND (NOT (b AND c))) OR d)"),
        Or(And(w("a"), Not(And(w("b"), w("c")))), w("d")),
    )
    assert ast_eq(
        parse("((a AND (b AND c)) OR d)"),
        Or(And(w("a"), And(w("b"), w("c"))), w("d")),
    )
    assert ast_eq(
        parse("(((NOT c) AND a) OR b)"), Or(And(Not(w("c")), w("a")), w("b"))
    )


def test_quirk_keyword_named_term_reparses_as_operator():
    # punctuation contexts admit a term spelling an operator keyword:
    # 'not-a' tokenizes to term 'not' then 'a' (refereed)...
    p = parse(" not-a !!")
    assert ast_eq(p, And(w("not"), w("a")))
    assert str(p) == "(not AND a)"
    # ...and the display's bare lowercase 'not' re-parses as a NOT
    # operator that consumes the following AND keyword as its operand
    q = parse(str(p))
    assert ast_eq(q, And(Not(w("and")), w("a")))
    assert ast_eq(parse(str(q)), q)  # one-step fixpoint


def test_quirk_pipe_ampersand_are_not_operators():
    # refereed: non-alphanumerics are filtered, so '|'/'&' never act as
    # operators — space-separated they fall through to implicit AND,
    # adjacent they vanish inside the token
    assert ast_eq(parse("a | b"), And(w("a"), w("b")))
    assert ast_eq(parse("a & b"), And(w("a"), w("b")))
    assert ast_eq(parse("a|b"), w("ab"))
    assert ast_eq(parse("(a (b)) | c"), And(And(w("a"), w("b")), w("c")))


def test_quirk_classes_chain_fixpoint_within_two_steps():
    # the two quirk classes CHAIN (refereed): the bare keyword term fires
    # first (class 2), producing a display with a trailing NOT-group that
    # the next re-parse degrades (class 1) — convergence takes two steps
    p = parse("((not AND (NOT c)) OR b)")
    assert str(p) == "(((NOT and) AND (NOT c)) OR b)"   # class 2 applied
    q = parse(str(p))
    assert str(q) == "(((NOT and) AND (NOT c)) AND b)"  # class 1 applied
    assert not ast_eq(p, q)
    q2 = parse(str(q))
    assert ast_eq(q, q2) and ast_eq(q2, parse(str(q2)))  # fixpoint
