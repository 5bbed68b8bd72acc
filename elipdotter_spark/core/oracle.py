"""Pure-Python reference engine: the rank-identity referee.

Faithful re-implementation of the reference's in-memory engine semantics
(/root/reference/src/index.rs, src/query.rs, src/set.rs) used to verify the
distributed Spark engine, and whose *per-document* pipeline doubles as the
scoring kernel inside Spark grouped UDFs (every merge in the occurrence
pipeline only interacts within one document id, so the computation is exactly
separable by doc — see ``occurrences_pipeline``).

All ratings are IEEE-754 float32 with the reference's accumulation order
(SURVEY.md H2).

This module is itself differentially refereed against the VERBATIM-compiled
reference crate (``scripts/referee_scoring.py``: random corpora + removals +
queries through both engines, comparing parse/stray-NOT error classes, the
retrieval id lists, and every Hit — doc id, start, word id, the f32 rating at
BIT level, and the full associated-occurrence set in emission order — across
both occurrence providers and all three fuzzy algorithms; 200 corpora x 8
configs = 11,248 query sessions incl. 500-800-long spam chains, zero
divergences; 10-corpus smoke in
``tests/test_referee_scoring.py``).
"""

from __future__ import annotations

import bisect
from typing import Callable, Dict, Iterable, Iterator, List, Optional, Tuple

import numpy as np

from .normalize import normalize
from .parser import And, Not, Or, Part, Word, words_in
from .similarity import EXACT, build_proximate_map
from .tokenize import raw_scan, tokenize

F = np.float32


class StrayNot(Exception):
    """A NOT not associated with an AND (src/query.rs:173, IterError::StrayNot)."""


# ---------------------------------------------------------------- DocumentMap


class DocumentMap:
    """Bidirectional name<->id map with dense, gap-reusing ids
    (src/index.rs:300-388)."""

    def __init__(self):
        self.name_to_id: Dict[str, int] = {}
        self.id_to_name: Dict[int, str] = {}

    def _get_first(self) -> int:
        if not self.id_to_name:
            return 0
        last = 0
        for i in sorted(self.id_to_name):
            if i != last and i != last + 1:
                return last + 1
            last = i
        return last + 1

    def reserve_id(self, name: str) -> int:
        if name in self.name_to_id:
            return self.name_to_id[name]
        i = self._get_first()
        self.name_to_id[name] = i
        self.id_to_name[i] = name
        return i

    def insert(self, name: str, content: str, index: "Index") -> int:
        i = self.reserve_id(name)
        index.digest_document(i, content)
        return i

    def get_id(self, name: str) -> Optional[int]:
        return self.name_to_id.get(name)

    def get_name(self, i: int) -> Optional[str]:
        return self.id_to_name.get(i)

    def force_remove(self, doc: int, index: "Index") -> None:
        name = self.id_to_name.pop(doc, None)
        if name is None:
            return
        del self.name_to_id[name]
        index.remove_document(doc)


# ---------------------------------------------------------------- indices


class Index:
    """Positional ("Lossless") index: term -> doc -> sorted byte positions
    (src/index.rs:1017-1170).  The boolean ("Simple") view is a projection."""

    def __init__(self, proximity_threshold=0.85, algo="hamming", word_count_limit=1000):
        # term -> {doc_id -> [sorted positions]}
        self.words: Dict[str, Dict[int, List[int]]] = {}
        self.proximity_threshold = proximity_threshold
        self.algo = algo
        self.word_count_limit = word_count_limit

    def insert_word(self, word: str, doc: int, pos: int) -> None:
        term = normalize(word)
        docs = self.words.setdefault(term, {})
        occ = docs.setdefault(doc, [])
        i = bisect.bisect_left(occ, pos)
        if i >= len(occ) or occ[i] != pos:
            occ.insert(i, pos)

    def digest_document(self, doc: int, content: str) -> None:
        for term, pos in tokenize(content):
            docs = self.words.setdefault(term, {})
            occ = docs.setdefault(doc, [])
            i = bisect.bisect_left(occ, pos)
            if i >= len(occ) or occ[i] != pos:
                occ.insert(i, pos)

    def ingest(self, other: "Index") -> None:
        """Segment merge (src/index.rs:1049-1064)."""
        for term, docs in other.words.items():
            mine = self.words.setdefault(term, {})
            for doc, occs in docs.items():
                if doc in mine:
                    mine[doc] = sorted(set(mine[doc]) | set(occs))
                else:
                    mine[doc] = list(occs)

    def remove_document(self, doc: int) -> None:
        for docs in self.words.values():
            docs.pop(doc, None)

    def contains_word(self, word: str, doc: int) -> bool:
        return doc in self.words.get(normalize(word), {})

    def documents_with_word(self, word: str) -> Optional[List[int]]:
        docs = self.words.get(normalize(word))
        return sorted(docs) if docs is not None else None

    def sorted_terms(self) -> List[str]:
        return sorted(self.words)

    def word_count_upper_limit(self) -> int:
        return len(self.words)

    def proximate_map(self, query: Part) -> Dict[str, Dict[str, np.float32]]:
        """Expansion map for every query word (src/query.rs:268-282)."""
        if self.algo == EXACT:
            return {}
        return build_proximate_map(
            words_in(query),
            self.sorted_terms(),
            self.proximity_threshold,
            self.algo,
            self.word_count_limit,
        )


# ---------------------------------------------------------------- Hit


class Assoc(Tuple[int, int]):
    """AssociatedOccurrence = (start, word_id), ordered lexicographically."""

    __slots__ = ()

    @property
    def start(self):
        return self[0]

    @property
    def word_id(self):
        return self[1]


def _assoc(start: int, word_id: int) -> Assoc:
    return Assoc((start, word_id))


class Hit:
    """src/query.rs:577-662."""

    __slots__ = ("start", "doc_id", "word_id", "rating", "occurrences", "merged", "closest_not")

    def __init__(self, start: int, doc_id: int, word_id: int, rating):
        self.start = start
        self.doc_id = doc_id
        self.word_id = word_id
        self.rating = F(rating)
        self.occurrences: List[Assoc] = []  # BTreeSet: sorted unique
        self.merged = False
        self.closest_not: Optional[Assoc] = None

    def clone(self) -> "Hit":
        h = Hit(self.start, self.doc_id, self.word_id, self.rating)
        h.occurrences = list(self.occurrences)
        h.merged = self.merged
        h.closest_not = self.closest_not
        return h

    def _insert(self, a: Assoc) -> None:
        i = bisect.bisect_left(self.occurrences, a)
        if i >= len(self.occurrences) or self.occurrences[i] != a:
            self.occurrences.insert(i, a)

    def iter_occurrences(self) -> List[Assoc]:
        """Main occurrence (if not merged) chained with the set
        (src/query.rs:637-647)."""
        if self.merged:
            return list(self.occurrences)
        return [_assoc(self.start, self.word_id)] + list(self.occurrences)

    def merge(self, other: "Hit") -> None:
        """src/query.rs:652-661 — same doc id required."""
        if not self.occurrences:
            self._insert(_assoc(self.start, self.word_id))
        for a in other.iter_occurrences():
            self._insert(a)
        self._insert(_assoc(other.start, other.word_id))
        self.merged = True


def _closest(a: Hit, b: Hit) -> Tuple[int, Assoc]:
    """Two-pointer closest pair between two Hits' occurrence sets
    (OccurenceEq::closest, src/query.rs:311-359)."""
    closest = (2**63, _assoc(0, 0))
    a_list = a.iter_occurrences()
    b_list = b.iter_occurrences()
    ai = bi = 0
    av = a_list[ai] if a_list else _assoc(a.start, a.word_id)
    bv = b_list[bi] if b_list else _assoc(b.start, b.word_id)
    if a_list:
        ai = 1
    if b_list:
        bi = 1
    one_completed = False
    while True:
        dist = abs(av.start - bv.start)
        if dist <= closest[0]:  # min_by: new candidate wins ties
            closest = (dist, bv)
        if av < bv:
            if ai < len(a_list):
                av = a_list[ai]
                ai += 1
            elif one_completed:
                break
            else:
                one_completed = True
        elif av == bv:
            return (0, bv)
        else:
            if bi < len(b_list):
                bv = b_list[bi]
                bi += 1
            elif one_completed:
                break
            else:
                one_completed = True
    return closest


# ---------------------------------------------------------------- progressive

LEFT, RIGHT, BOTH = 0, 1, 2


def progressive(
    a: List,
    b: List,
    comparison: Callable,
    matches: Callable,
    minimize_dist_right: Optional[Callable],
    clone: Callable,
) -> Iterator[Tuple[int, object, object]]:
    """Port of ``set::progressive`` (src/set.rs:116-280) — a merge-join over
    sorted streams where an "equal" item stays cached to match multiple
    partners; with ``minimize_dist_right``, the right side is advanced until it
    is nearest to the left before emitting Both (the ``<=`` on peek distance is
    load-bearing for duplicates, src/set.rs:224)."""
    l = iter(a)
    r = iter(b)

    def nx(it):
        return next(it, None)

    l_next, r_next = nx(l), nx(r)
    l_peek, r_peek = nx(l), nx(r)

    def next_l():
        nonlocal l_next, l_peek
        l_next, l_peek = l_peek, nx(l)

    def next_r():
        nonlocal r_next, r_peek
        r_next, r_peek = r_peek, nx(r)

    while True:
        lv, rv = l_next, r_next
        l_next = r_next = None
        if lv is not None and rv is not None:
            c = matches(lv, rv)
            if c < 0:
                r_next = rv
                l_next = lv
                out = lv
                next_l()
                yield (LEFT, out, None)
                continue
            if c > 0:
                l_next = lv
                r_next = rv
                out = rv
                next_r()
                yield (RIGHT, None, out)
                continue
            l_next, r_next = lv, rv
        elif lv is not None:
            l_next = lv
            out = lv
            next_l()
            yield (LEFT, out, None)
            continue
        elif rv is not None:
            r_next = rv
            out = rv
            next_r()
            yield (RIGHT, None, out)
            continue
        else:
            return

        if r_peek is None:
            if l_next is None or r_next is None:
                return
            ret = (BOTH, l_next, clone(r_next))
            next_l()
            yield ret
            continue
        if l_peek is None:
            if l_next is None or r_next is None:
                return
            ret = (BOTH, clone(l_next), r_next)
            next_r()
            yield ret
            continue

        left, right = l_next, r_next
        cmp = comparison(left, right)
        advance_right = cmp > 0
        if minimize_dist_right is not None and advance_right:
            dist = minimize_dist_right(left, right)
            peek_dist = None
            if r_peek is not None and matches(left, r_peek) == 0:
                peek_dist = minimize_dist_right(left, r_peek)
            # "the == part of <= is really important" (src/set.rs:224)
            if peek_dist is not None and peek_dist <= dist:
                next_r()
                continue
            ret = (BOTH, clone(left), clone(right))
            next_l()
            yield ret
            continue
        ret = (BOTH, clone(left), clone(right))
        if advance_right:
            next_r()
        else:
            next_l()
        yield ret


# ------------------------------------------------------- occurrence streams

Occurrence = Tuple[int, int, np.float32]  # (doc_id, start, rating)


def lossless_occurrences(
    index: Index,
    prox_map: Dict[str, Dict[str, np.float32]],
    word: str,
) -> Optional[List[Occurrence]]:
    """Stream order of ``LosslessOccurrences`` (src/index.rs:1228-1255):
    exact -> (doc asc, pos asc); fuzzy -> (doc asc, expanded-term asc, pos asc),
    rating ``(proximity - 1) * 4`` (src/index.rs:1208-1214)."""
    if index.algo == EXACT:
        docs = index.words.get(word)
        if docs is None:
            return None
        out = []
        for doc in sorted(docs):
            for pos in docs[doc]:
                out.append((doc, pos, F(0.0)))
        return out
    expansions = prox_map[word]
    items = []  # BTreeSet<ProximateDocItem> ~ sorted by (id, word)
    for term in expansions:  # sorted term order
        docs = index.words.get(term)
        if docs is None:
            continue
        for doc in sorted(docs):
            items.append((doc, term))
    items = sorted(set(items))
    out = []
    for doc, term in items:
        rating = F((expansions[term] - F(1.0)) * F(4.0))
        for pos in index.words[term][doc]:
            out.append((doc, pos, rating))
    return out


def simple_occurrences(
    index: Index,
    prox_map: Dict[str, Dict[str, np.float32]],
    word: str,
    document_contents: Dict[int, str],
) -> Optional[List[Occurrence]]:
    """Stream order of ``SimpleOccurences`` (src/index.rs:802-931): the doc
    text is re-scanned at query time; for fuzzy queries each (doc, expanded
    term) pair triggers a full re-scan that emits *every* matching token of
    *any* expanded term — duplicates included.  Exact mode scans once per doc."""
    if index.algo == EXACT:
        if word not in index.words:
            return None
        pairs = [(doc, word) for doc in sorted(index.words[word])]
        expansions = {word: F(1.0)}
    else:
        expansions = prox_map[word]
        items = set()
        for term in expansions:
            docs = index.words.get(term)
            if docs is None:
                continue
            for doc in docs:
                items.add((doc, term))
        pairs = sorted(items)
    out = []
    for doc, _term in pairs:
        content = document_contents.get(doc)
        if content is None:
            continue
        for raw, start in raw_scan(content):
            if not raw:
                continue
            norm = normalize(raw)
            if not norm:
                continue
            prox = expansions.get(norm)
            if prox is not None:
                out.append((doc, start, F((prox - F(1.0)) * F(4.0))))
    return out


# ------------------------------------------------------- occurrence pipeline


class _MergeProximate:
    """Session-style gap merge over one word stream (src/query.rs:387-431):
    if the next occurrence in the same doc is within ``distance_threshold``,
    merge it (+2.0) into the current hit; the recursive drop consumes the rest
    of the chain (whose own merges are discarded — faithful to the reference)."""

    def __init__(self, hits: Iterable[Hit], distance_threshold: int):
        self._it = iter(hits)
        self._peek: Optional[Hit] = None
        self.distance_threshold = distance_threshold

    def __iter__(self):
        return self

    def _next_inner(self) -> Optional[Hit]:
        if self._peek is not None:
            v, self._peek = self._peek, None
            return v
        return next(self._it, None)

    def _peeked(self) -> Optional[Hit]:
        if self._peek is None:
            self._peek = next(self._it, None)
        return self._peek

    def __next__(self) -> Hit:
        v = self._next_inner()
        if v is None:
            raise StopIteration
        peeked = self._peeked()
        if peeked is None:
            return v
        if peeked.doc_id != v.doc_id:
            return v
        dist = abs(v.start - peeked.start)
        if dist > self.distance_threshold:
            return v
        v.rating = F(v.rating + F(2.0))
        v.merge(peeked)
        self._drop_next()
        return v

    def _drop_next(self):
        # Consume-and-discard the rest of the merge chain.  The reference
        # recurses (src/query.rs:387-431: the dropped ``next()`` call merges
        # its own follower and drops again); recursion depth there equals the
        # chain length, which Rust's stack absorbs but Python's 1000-frame
        # limit does not — a doc repeating one word ~500+ times within the
        # session distance (spam pages) overflowed here.  This loop is the
        # recursion unrolled: each level consumed one element and recursed
        # while the NEXT consecutive pair stayed in-doc and within threshold;
        # every inner merge mutates only already-discarded hits (the outer
        # ``v.merge(peeked)`` copied peeked's occurrences before we run), so
        # skipping those merges is unobservable — emitted hits are
        # bit-identical to the recursive form (tests/test_core_merge.py).
        prev = self._next_inner()
        if prev is None:
            return
        while True:
            nxt = self._peeked()
            if (
                nxt is None
                or nxt.doc_id != prev.doc_id
                or abs(prev.start - nxt.start) > self.distance_threshold
            ):
                return
            prev = self._next_inner()


def _hit_matches(a: Hit, b: Hit) -> int:
    return (a.doc_id > b.doc_id) - (a.doc_id < b.doc_id)


def _hit_comparison(a: Hit, b: Hit) -> int:
    return (a.start > b.start) - (a.start < b.start)


def _hit_dist(a: Hit, b: Hit) -> int:
    return abs(a.start - b.start)


def _hit_clone(h: Hit) -> Hit:
    return h.clone()


# doc ids >= SENTINEL_BASE are per-node end-of-doc sentinels (see
# occurrences_pipeline docstring).  The base MUST exceed every real doc id:
# ids are arbitrary signed int64 at web scale (xxhash64(norm_url) — the
# hashed-id convention), so the base is 2^63, one past Long.MAX.  This is
# kernel-internal pure Python (arbitrary-precision ints); sentinels are
# dropped before hits reach the int64 Arrow schema.  The original 2^61 base
# silently ATE one eighth of a hashed corpus: every doc with id >= 2^61 had
# its hits filtered as "sentinels" by the guard below.
SENTINEL_BASE = 2**63


def iter_nodes(part: Part):
    """Nodes in the exact evaluation order of ``as_doc_iter``
    (src/query.rs:133-179): preorder, AND-NOT visits the non-NOT side first
    and recurses into the NOT's *inner* part (the Not wrapper itself is never
    evaluated).  This order defines node ids shared between the driver's
    per-node doc-set computation and the per-doc scoring kernel."""
    yield part
    if isinstance(part, And):
        if isinstance(part.right, Not):
            yield from iter_nodes(part.left)
            yield from iter_nodes(part.right.part)
        elif isinstance(part.left, Not):
            yield from iter_nodes(part.right)
            yield from iter_nodes(part.left.part)
        else:
            yield from iter_nodes(part.left)
            yield from iter_nodes(part.right)
    elif isinstance(part, Or):
        yield from iter_nodes(part.left)
        yield from iter_nodes(part.right)


def node_doc_maxes(part: Part, leaf_docs: Callable[[str], List[int]]) -> List[int]:
    """Per-node max doc id of each node's *output stream* doc set, indexed in
    ``iter_nodes`` order.  Stream-doc-set algebra: leaf -> docs with >=1
    occurrence of any expanded term; AND -> intersection; OR -> union;
    AND-NOT -> the non-NOT side's set (Left/Both emitted for every left item).

    Used for sentinel injection: the reference's ``progressive`` keeps a
    two-slot lookahead, so whether *any* later item follows a doc's items in a
    node's stream changes emission behavior at that doc's tail.  Only the
    *existence* of a later item matters (cross-doc items never reach the
    position comparisons), so a per-node "later doc exists" bit — i.e.
    ``doc < max_doc(node)`` — restores exact multi-doc parity for per-doc
    distributed scoring."""
    out: List[int] = []

    def ev(p: Part) -> frozenset:
        idx = len(out)
        out.append(-1)  # placeholder
        if isinstance(p, Word):
            s = frozenset(leaf_docs(p.text))
        elif isinstance(p, And):
            if isinstance(p.right, Not):
                s = ev(p.left)
                ev(p.right.part)
            elif isinstance(p.left, Not):
                s = ev(p.right)
                ev(p.left.part)
            else:
                s = ev(p.left) & ev(p.right)
        elif isinstance(p, Or):
            s = ev(p.left) | ev(p.right)
        else:
            raise StrayNot()
        out[idx] = max(s) if s else -1
        return s

    ev(part)
    return out


def occurrences_pipeline(
    part: Part,
    stream_fn: Callable[[str], Optional[List[Occurrence]]],
    distance_threshold: int,
    _word_id_state: Optional[List[int]] = None,
    sentinel_max: Optional[List[int]] = None,
    current_doc: Optional[int] = None,
) -> List[Hit]:
    """The occurrence-level AST fold (``Query::occurrences``,
    src/query.rs:296-573): per-term streams wrapped in MergeProximate and
    tagged with a word id in AST-traversal order, then AND/OR/AND-NOT merged
    with ``progressive`` and the final adjacency-rating fold applied.

    Distributed mode (the Spark kernel): every merge matches on doc id, so the
    pipeline decomposes by document — *except* that the reference's
    ``progressive`` lookahead makes a doc's emissions depend on whether any
    later item exists in each node's stream.  With ``sentinel_max`` (per-node
    stream max-docs from :func:`node_doc_maxes`) and ``current_doc`` set,
    per-doc streams get a trailing sentinel item exactly when the full stream
    would continue, which restores bit-identical multi-doc behavior; sentinels
    are stripped from every merger's output and replaced by the node's own."""
    state = _word_id_state if _word_id_state is not None else [0]
    nstate = [0]

    def next_node_id() -> int:
        nid = nstate[0]
        nstate[0] += 1
        return nid

    def needs_sentinel(nid: int) -> bool:
        return (
            sentinel_max is not None
            and current_doc is not None
            and sentinel_max[nid] > current_doc
        )

    def sentinel_hit(nid: int) -> Hit:
        return Hit(0, SENTINEL_BASE + nid, 0, F(0.0))

    def strip(hits: List[Hit]) -> List[Hit]:
        if sentinel_max is None:
            return hits
        return [h for h in hits if h.doc_id < SENTINEL_BASE]

    def finish(nid: int, hits: List[Hit]) -> List[Hit]:
        hits = strip(hits)
        if needs_sentinel(nid):
            hits.append(sentinel_hit(nid))
        return hits

    def build(p: Part) -> List[Hit]:
        nid = next_node_id()
        if isinstance(p, Word):
            state[0] += 1
            wid = state[0]
            occs = stream_fn(p.text)
            if occs is None:
                occs = []
                if not needs_sentinel(nid):
                    return []
            hits = [Hit(start, doc, wid, rating) for doc, start, rating in occs]
            if needs_sentinel(nid):
                # the sentinel rides *through* MergeProximate (different doc
                # id -> never merged), standing in for the next doc's items
                hits.append(sentinel_hit(nid))
            return list(_MergeProximate(iter(hits), distance_threshold))
        if isinstance(p, And):
            left, right = p.left, p.right
            if isinstance(right, Not):
                other, nt = left, right.part
            elif isinstance(left, Not):
                other, nt = right, left.part
            else:
                a = build(left)
                b = build(right)
                out = []
                for kind, x, y in progressive(
                    a, b, _hit_comparison, _hit_matches, None, _hit_clone
                ):
                    if kind == BOTH:
                        x.merge(y)
                        out.append(x)
                return finish(nid, out)
            # AND NOT (src/query.rs:455-487)
            and_hits = build(other)
            not_hits = build(nt)
            out = []
            for kind, x, y in progressive(
                and_hits, not_hits, _hit_comparison, _hit_matches, _hit_dist, _hit_clone
            ):
                if kind == LEFT:
                    x.rating = F(x.rating + F(2.5))
                    out.append(x)
                elif kind == BOTH:
                    not_rating = y.rating
                    probe = Hit(y.start, y.doc_id, 0, y.rating)
                    dist, closest_assoc = _closest(x, probe)
                    decrease = F(F(1.0) / (F(0.0001) * F(dist) + F(0.025)))
                    x.rating = F(x.rating - decrease)
                    x.rating = F(x.rating - not_rating)
                    x.closest_not = closest_assoc
                    out.append(x)
            return finish(nid, out)
        if isinstance(p, Or):
            a = build(p.left)
            b = build(p.right)
            out = []
            for kind, x, y in progressive(
                a, b, _hit_comparison, _hit_matches, None, _hit_clone
            ):
                if kind == BOTH:
                    x.merge(y)
                    out.append(x)
                else:
                    out.append(x if kind == LEFT else y)
            return finish(nid, out)
        raise StrayNot()

    hits = strip(build(part))
    return [_final_fold(h) for h in hits]


def _final_fold(occ: Hit) -> Hit:
    """Adjacent-pair rating bonus + main-start relocation
    (src/query.rs:530-572)."""
    increase = F(0.0)
    closest = 2**63
    closest_index = 0
    items = occ.iter_occurrences()
    if items:
        last = items[0]
        rest = items[1:]
    else:
        last = _assoc(0, 0)
        rest = []
    for idx, a in enumerate(rest):
        if last.word_id != a.word_id:
            dist = a.start - last.start
            if dist < closest:
                closest_index = idx
            closest = min(dist, closest)
            increase = F(increase + F(F(0.5) / (F(0.001) * F(dist) + F(0.1))))
        last = a
    occ.rating = F(occ.rating + increase)
    if closest_index != 0:
        items2 = occ.iter_occurrences()
        c = items2[closest_index]
        # remove from the *set* field, insert current main, move start
        i = bisect.bisect_left(occ.occurrences, c)
        if i < len(occ.occurrences) and occ.occurrences[i] == c:
            occ.occurrences.pop(i)
        occ._insert(_assoc(occ.start, occ.word_id))
        occ.start = c.start
    return occ


# ------------------------------------------------------- doc-level retrieval


def documents(part: Part, index: Index) -> List[int]:
    """Doc-level boolean retrieval (``Documents::iter``, src/query.rs:221-240):
    And -> intersect, Or -> union, ``a AND NOT b`` -> docs(a) unchanged (the
    NOT penalty applies at scoring only), stray NOT -> error."""
    prox = index.proximate_map(part)

    def leaf(word: str) -> List[int]:
        if index.algo == EXACT:
            docs = index.documents_with_word(word)
            return docs if docs is not None else []
        ids = set()
        for term in prox.get(word, {}):
            docs = index.words.get(term)
            if docs:
                ids.update(docs)
        return sorted(ids)

    def ev(p: Part) -> List[int]:
        if isinstance(p, Word):
            return leaf(p.text)
        if isinstance(p, And):
            # `a AND NOT b` -> docs(a); the not side is still *evaluated*
            # (stray-not detection inside it), result discarded (src/query.rs:156-159,236)
            if isinstance(p.right, Not):
                keep = ev(p.left)
                ev(p.right.part)
                return keep
            if isinstance(p.left, Not):
                keep = ev(p.right)
                ev(p.left.part)
                return keep
            a, b = ev(p.left), ev(p.right)
            sb = set(b)
            return [x for x in a if x in sb]
        if isinstance(p, Or):
            return sorted(set(ev(p.left)) | set(ev(p.right)))
        raise StrayNot()

    return ev(part)


# ------------------------------------------------------- end-to-end helpers


def query_hits(
    query: Part,
    index: Index,
    distance_threshold: int,
    document_contents: Optional[Dict[int, str]] = None,
    provider: str = "lossless",
) -> List[Hit]:
    """Parse-level convenience: expansion map + occurrence pipeline."""
    prox = index.proximate_map(query)
    if provider == "lossless":
        fn = lambda w: lossless_occurrences(index, prox, w)
    else:
        contents = document_contents or {}
        fn = lambda w: simple_occurrences(index, prox, w, contents)
    return occurrences_pipeline(query, fn, distance_threshold)


def rank(hits: List[Hit]) -> List[Hit]:
    """Caller-side ranking: rating desc (tests/lib.rs:61-62)."""
    return sorted(hits, key=lambda h: -float(h.rating))
