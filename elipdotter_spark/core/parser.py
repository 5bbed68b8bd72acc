"""Query parser with the reference grammar.

Reference: /root/reference/src/query.rs:690-1244.  Driver-side pure Python (the
parse is inherently sequential and tiny); the result AST is compiled to a
DataFrame plan by :mod:`elipdotter_spark.plans.compiler`.

Grammar facts reproduced (goldens at src/query.rs:1246-1440):
- whitespace (incl. NBSP) and ``-`` between words are implicit AND;
- literals ``and``/``or``/``not`` are case-insensitive and must be
  whitespace-delimited; a *leading* binary literal is a plain word;
- prefix ``-``/``!`` are NOT; NOT binds to the next word or paren group;
- parentheses recurse via a sub-parser; unbalanced ``)`` at the top level ends
  parsing of the sub-expression;
- AND binds tighter than OR, fixed post-hoc in ``finish_op``'s rotation
  (src/query.rs:891-924) unless the left group was explicit parens;
- every term string is normalized at parse time (src/query.rs:762-775).

Reference QUIRKS reproduced on purpose (differentially refereed against the
reference's own parse module compiled standalone — 83,794 random inputs,
zero AST or error-class divergences, plus targeted boundary sweeps over
four alphabets): the display-roundtrip invariant is NOT absolute, in the
reference either.  Exactly two divergence classes exist, both refereed
bit-identical in both parsers:

1. **Trailing NOT-group**: a group whose LAST element is a NOT of a plain
   word, followed by a binary op — ``((a AND (NOT c)) OR b)`` re-parses
   with the op degraded to AND.  The boundary is sharp: a LEADING
   NOT-group (``((NOT c) OR b)``), a NOT over a group operand
   (``(NOT (b AND c))``), and a trailing plain group (``(a (b c)) OR d``)
   all re-parse faithfully (src/query.rs:818-838 walks the sub-parser,
   src/query.rs:1040-1072 resolves the op-after-group state).
2. **Keyword-named term**: punctuation contexts admit a term whose
   normalized text IS an operator keyword — ``not-a`` tokenizes to term
   ``not`` then ``a`` (src/query.rs:762-775) — and Display renders terms
   lowercase / operators UPPERCASE, so re-parsing ``(not AND a)`` reads
   the bare ``not`` as a NOT operator: ``((NOT and) AND a)``.

(``|``/``&`` are not operators at all: non-alphanumerics are filtered, so
space-separated they fall through to implicit AND.)  The two classes can
CHAIN — a class-2 re-parse can emit a display with a trailing NOT-group
that class 1 then degrades — so the refereed invariant is:
``parse(str(p))`` converges to a fixpoint within at most TWO re-parses,
and strict equality holds whenever ``str(p)`` has neither a group-closing
pair directly before a binary op nor a bare lowercase
``and``/``or``/``not`` term (goldens in tests/test_core_parser.py; fuzz in
tests/test_parser_extensibility.py; rebuildable differential harness in
scripts/referee_parser.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Union

from .normalize import normalize

# ---------------------------------------------------------------- AST


@dataclass(frozen=True)
class Word:
    text: str

    def __str__(self) -> str:
        return self.text


@dataclass(frozen=True)
class And:
    left: "Part"
    right: "Part"

    def __str__(self) -> str:
        return f"({self.left} AND {self.right})"


@dataclass(frozen=True)
class Or:
    left: "Part"
    right: "Part"

    def __str__(self) -> str:
        return f"({self.left} OR {self.right})"


@dataclass(frozen=True)
class Not:
    part: "Part"

    def __str__(self) -> str:
        return f"(NOT {self.part})"


Part = Union[Word, And, Or, Not]


def ast_eq(a: Part, b: Part) -> bool:
    """Operand-order-insensitive equality (src/query.rs:45-51)."""
    if isinstance(a, Word) and isinstance(b, Word):
        return a.text == b.text
    if isinstance(a, Not) and isinstance(b, Not):
        return ast_eq(a.part, b.part)
    if type(a) is type(b) and isinstance(a, (And, Or)):
        return (ast_eq(a.left, b.left) and ast_eq(a.right, b.right)) or (
            ast_eq(a.left, b.right) and ast_eq(a.right, b.left)
        )
    return False


def eq_order(a: Part, b: Part) -> bool:
    """Equality that also checks left/right order (src/query.rs:99-120)."""
    if not ast_eq(a, b):
        return False
    if isinstance(a, (Word, Not)):
        return True
    if isinstance(b, (And, Or)):
        return eq_order(a.left, b.left) and eq_order(a.right, b.right)
    return False


def words_in(part: Part) -> list:
    """All Word strings in left-to-right traversal order (``for_each_string``,
    src/query.rs:88-97)."""
    if isinstance(part, Word):
        return [part.text]
    if isinstance(part, Not):
        return words_in(part.part)
    return words_in(part.left) + words_in(part.right)


# ---------------------------------------------------------------- errors


class ParseError(Exception):
    pass


class InputEmpty(ParseError):
    pass


class NotEnoughArguments(ParseError):
    pass


class UnexpectedParentheses(ParseError):
    pass


class TooDeeplyNested(ParseError):
    """Python-runtime bound, not a reference rule: the reference's native
    stack absorbs arbitrarily deep queries, but every recursive AST walk
    downstream of the parser (``__str__``, ``ast_eq``, plan compile,
    ``oracle.iter_nodes``) overflows Python's interpreter stack —
    ``str()`` dies at ~400 levels.  Depth comes from ``(`` nesting AND
    from flat word chains (``w1 w2 ... w300`` is a ~300-deep left-deep
    AND), so :func:`parse` caps both: parser sub-chain depth at
    ``MAX_NESTING`` during the scan, and the finished AST's depth at
    ``MAX_NESTING`` measured iteratively.  A crash on adversarial input
    becomes a clean, catchable rejection; no realistic query comes close
    to 256 words, let alone 256 nesting levels."""


# ---------------------------------------------------------------- ops / rules

AND, OR, NOT = "and", "or", "not"

MAX_NESTING = 256  # see TooDeeplyNested


def _is_whitespace(c: str) -> bool:
    # char::is_ascii_whitespace + NBSP (src/query.rs:984-988)
    return c in " \t\n\x0c\r "


class _LiteralRule:
    """``and``/``or``/``not`` literal, whitespace-delimited (src/query.rs:1118-1162)."""

    def __init__(self, literal: str, op: str):
        self.literal = literal
        self.op = op
        self.last_was_space = True

    def next(self, parser: "_Parser", rest: str) -> Optional[int]:
        binary = self.op in (AND, OR)
        if binary and not parser.string and parser.left is None:
            self.last_was_space = bool(rest) and _is_whitespace(rest[0])
            return None
        n = len(self.literal)
        matched = (
            self.last_was_space
            and rest[:n].lower() == self.literal
            and len(rest) > n
            and _is_whitespace(rest[n])
        )
        rule = None
        if matched:
            parser.set_op(self.op)
            rule = n
        self.last_was_space = bool(rest) and _is_whitespace(rest[0])
        return rule


class _NotPrefixRule:
    """``-``/``!`` prefix NOT (src/query.rs:1191-1218)."""

    def __init__(self, prefix: str):
        self.prefix = prefix
        self.last_was_space = True

    def next(self, parser: "_Parser", rest: str) -> Optional[int]:
        rule = None
        if self.last_was_space and rest.startswith(self.prefix):
            parser.set_op(NOT)
            rule = len(self.prefix)
        self.last_was_space = bool(rest) and _is_whitespace(rest[0])
        return rule


class _AndSpaceRule:
    """Whitespace / ``-`` between words == implicit AND (src/query.rs:1040-1073)."""

    def __init__(self):
        self.last_was_other_op = False

    def next(self, parser: "_Parser", rest: str) -> Optional[int]:
        if parser.string_marker is not None and not parser.string:
            return None
        if parser.is_empty():
            return None
        if not self.last_was_other_op:
            self.last_was_other_op = parser.op is not None
            if self.last_was_other_op:
                return None
        c = rest[0]
        if self.last_was_other_op:
            if not (_is_whitespace(c) or c == "-"):
                self.last_was_other_op = False
            return None
        if _is_whitespace(c) or c == "-":
            parser.op = AND
            return 1
        return None


def _default_rules():
    # Order matters; AndSpace must be last (src/query.rs:1023-1030).
    return [
        _LiteralRule("not", NOT),
        _LiteralRule("and", AND),
        _LiteralRule("or", OR),
        _NotPrefixRule("-"),
        _NotPrefixRule("!"),
        _AndSpaceRule(),
    ]


# ---------------------------------------------------------------- parser


class _Parser:
    """Port of ``query::parse::Parser`` (src/query.rs:751-950)."""

    def __init__(self, depth: int = 0):
        self.sub: Optional[_Parser] = None
        self.sub_layer = 0
        self.depth = depth
        self.left: Optional[Part] = None
        self.left_group_explicit = False
        self.string = ""
        self.string_marker: Optional[str] = None
        self.old_op: Optional[str] = None
        self.op: Optional[str] = None

    def is_empty(self) -> bool:
        return (
            self.old_op is None
            and self.op is None
            and self.string_marker is None
            and not self.string
            and self.sub is None
            and self.left is None
        )

    def set_op(self, op: str) -> None:
        if op in (AND, OR):
            self.op = op
        else:
            self.string_marker = op

    def take_string(self) -> Part:
        part: Part = Word(normalize(self.string))
        self.string = ""
        if self.string_marker is not None:
            self.string_marker = None
            part = Not(part)
        return part

    def next(self, rules, rest: str) -> int:
        # walk the sub-parser chain iteratively — the reference delegates
        # recursively (src/query.rs:793-812), which in Python costs
        # O(nesting depth) stack frames PER INPUT CHARACTER and overflows
        # the interpreter past ~1000 deep; this loop performs the same
        # node-by-node bookkeeping in the same outer-to-inner order
        node = self
        while node.sub is not None:
            if rest.startswith("("):
                node.sub_layer += 1
            if rest.startswith(")"):
                node.sub_layer -= 1
                if node.sub_layer == 0:
                    parenthesis = node.sub.finish()
                    node.finish_part(node.old_op, parenthesis)
                    node.sub = None
                    node.left_group_explicit = True
                    return 1
            node = node.sub
        return node._next_leaf(rules, rest)

    def _next_leaf(self, rules, rest: str) -> int:
        if rest.startswith("("):
            if self.depth + 1 > MAX_NESTING:
                raise TooDeeplyNested()
            self.sub = _Parser(self.depth + 1)
            self.sub_layer += 1
            return 1

        advance = None
        for rule in rules:
            result = rule.next(self, rest)
            if result is not None:
                assert result > 0
                advance = result
        if advance is not None:
            if self.string:
                if self.op is not None and self.old_op is None:
                    self.left = self.take_string()
                elif self.old_op is not None:
                    right = self.take_string()
                    self.left = self.finish_op(self.old_op, right)
                self.left_group_explicit = False
            if self.op is not None:
                self.old_op = self.op
                self.op = None
            return advance
        c = rest[0]
        if c.isalnum():
            self.string += c
        return 1

    def finish_part(self, op: Optional[str], right: Part) -> None:
        if self.string_marker is not None:
            self.string_marker = None
            right = Not(right)
        if op is not None:
            self.left = self.finish_op(op, right)
        else:
            self.left = right

    def finish_op(self, op: str, right: Part) -> Part:
        if op in (AND, OR) and self.left is None:
            return right
        if op == AND:
            left = self.left
            self.left = None
            if isinstance(left, Or) and not self.left_group_explicit:
                # precedence rotation: `a OR b` AND c -> OR(a, AND(b, c))
                # (src/query.rs:902-912: swap right into pair.left, swap pair)
                or_left = left.left
                return Or(or_left, And(left.right, right))
            return And(left, right)
        if op == OR:
            left = self.left
            self.left = None
            return Or(left, right)
        return Not(right)

    def finish(self) -> Part:
        if self.string:
            right = self.take_string()
            self.finish_part(self.old_op, right)
        if self.left is None:
            if self.is_empty():
                raise InputEmpty()
            raise NotEnoughArguments()
        left, self.left = self.left, None
        return left


def default_rules():
    """The default rule chain; build custom chains with :func:`literal_rule` /
    :func:`not_prefix` and pass to :func:`parse` (the reference's ``Rule``
    trait + ``literal_rule!``/``not_prefix!`` macros, src/query.rs:1031-1243).

    Order matters: literals, NOT prefixes, then AndSpace last."""
    return _default_rules()


def literal_rule(literal: str, op: str):
    """A whitespace-delimited literal operator rule, e.g. Swedish
    ``literal_rule("eller", OR)`` (doc example at src/query.rs:1164-1175)."""
    return _LiteralRule(literal, op)


def not_prefix(prefix: str):
    """A prefix-NOT rule, e.g. ``not_prefix("~")``."""
    return _NotPrefixRule(prefix)


def rules_with(extra_literals=(), extra_not_prefixes=()):
    """Default chain with user rules inserted at the reference's positions
    (custom literals after the built-in ones, custom NOT prefixes after
    ``-``/``!``, AndSpace always last — src/query.rs:997-1030)."""
    return (
        [_LiteralRule("not", NOT), _LiteralRule("and", AND), _LiteralRule("or", OR)]
        + [literal_rule(lit, op) for lit, op in extra_literals]
        + [_NotPrefixRule("-"), _NotPrefixRule("!")]
        + [not_prefix(p) for p in extra_not_prefixes]
        + [_AndSpaceRule()]
    )


def _ast_depth(part: Part) -> int:
    """Max node depth, computed with an explicit stack (works on ASTs far
    deeper than any recursive walk could survive)."""
    stack = [(part, 1)]
    mx = 1
    while stack:
        p, d = stack.pop()
        if d > mx:
            mx = d
        for child in (
            getattr(p, "left", None),
            getattr(p, "right", None),
            getattr(p, "part", None),
        ):
            if child is not None:
                stack.append((child, d + 1))
    return mx


def parse(s: str, rules=None) -> Part:
    """Parse a query string (src/query.rs:715-741) with the default or a
    custom rule chain."""
    if not s:
        raise InputEmpty()
    parser = _Parser()
    if rules is None:
        rules = _default_rules()
    rest = s
    while True:
        advance = parser.next(rules, rest)
        if advance >= len(rest):
            break
        rest = rest[advance:]
        if not rest:
            break
    out = parser.finish()
    if _ast_depth(out) > MAX_NESTING:
        raise TooDeeplyNested()
    return out
