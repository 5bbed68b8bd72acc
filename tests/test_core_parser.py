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
