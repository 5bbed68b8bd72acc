"""Oracle end-to-end goldens — the reference's own test suite, replicated.

Sources: /root/reference/tests/lib.rs:46-148, /root/reference/src/index.rs:1293-1435.
"""

import numpy as np
import pytest

from elipdotter_spark.core import oracle
from elipdotter_spark.core.parser import parse
from elipdotter_spark.core.similarity import EXACT, HAMMING, JARO, hamming, jaro

from fixtures import AN1_CORPUS, LOREM_CORPUS, SV_CORPUS


def build(corpus, threshold=0.85, algo=HAMMING, word_count_limit=2500):
    dm = oracle.DocumentMap()
    idx = oracle.Index(threshold, algo, word_count_limit)
    for name, text in corpus:
        dm.insert(name, text, idx)
    return dm, idx


def contents(dm, corpus):
    return {dm.get_id(n): t for n, t in corpus}


# ---------------------------------------------------------------- similarity


def test_jaro_known_values():
    assert abs(jaro("martha", "marhta") - 0.9444444444444444) < 1e-12
    assert abs(jaro("dixon", "dicksonx") - 0.7666666666666666) < 1e-12
    assert jaro("", "") == 1.0
    assert jaro("a", "") == 0.0
    assert jaro("a", "a") == 1.0
    assert jaro("a", "b") == 0.0


def test_hamming_reference_formula():
    # diff over min-prefix + len diff, 1/(diff/min + 1)
    assert hamming("abc", "abc") == 1.0
    assert abs(hamming("abc", "abd") - 1 / (1 / 3 + 1)) < 1e-12
    assert abs(hamming("abc", "abcd") - 1 / (1 / 3 + 1)) < 1e-12


# ------------------------------------------------------------ DocumentMap


def test_document_map_dense_reuse():
    dm = oracle.DocumentMap()
    idx = oracle.Index()
    assert dm.insert("a", "x", idx) == 0
    assert dm.insert("b", "x", idx) == 1
    assert dm.insert("c", "x", idx) == 2
    dm.force_remove(1, idx)
    assert dm.insert("d", "x", idx) == 1  # gap reused (src/index.rs:341-353)
    assert dm.get_id("a") == 0 and dm.get_name(2) == "c"


# ------------------------------------------------------------ occurrences


@pytest.mark.parametrize("provider", ["simple", "lossless"])
def test_occurrences_single_word(provider):
    # src/index.rs:1293-1357: Exact, threshold 1.0, limit 100
    dm, idx = build(
        [("doc1", LOREM_CORPUS[0][1]), ("doc3", LOREM_CORPUS[1][1])],
        threshold=1.0,
        algo=EXACT,
        word_count_limit=100,
    )
    assert idx.contains_word("lorem", dm.get_id("doc1"))
    assert idx.contains_word("lorem", dm.get_id("doc3"))
    assert dm.get_id("doc3") == 1
    assert dm.get_id("doc2") is None

    prox = {}
    if provider == "simple":
        occs = oracle.simple_occurrences(
            idx, prox, "lorem", {0: LOREM_CORPUS[0][1], 1: LOREM_CORPUS[1][1]}
        )
    else:
        occs = oracle.lossless_occurrences(idx, prox, "lorem")
    assert [(d, s) for d, s, _ in occs] == [(0, 0), (0, 875), (1, 0)]


# ------------------------------------------------------------ query e2e


def test_query_and():
    # tests/lib.rs:46-74 (Simple default: Hamming 0.85, limit 2500, dist 100)
    dm, idx = build(LOREM_CORPUS)
    q = parse("feugiat luctus sem")
    docs = oracle.documents(q, idx)
    assert docs == [dm.get_id("doc_2")]

    hits = oracle.query_hits(
        q, idx, 100, document_contents=contents(dm, LOREM_CORPUS), provider="simple"
    )
    occs = sorted(hits, key=lambda h: float(h.rating))
    assert occs[0].doc_id == dm.get_id("doc_2")
    assert occs[0].start in (238, 63, 382), occs[0].start
    assert len(occs) > 1


def test_query_and_not_1():
    dm, idx = build(LOREM_CORPUS)
    q = parse("feugiat test -sem")
    assert oracle.documents(q, idx) == []


@pytest.mark.parametrize("qstr", ["volutpat -hac", "-hac volutpat"])
def test_query_and_not_2_3(qstr):
    # tests/lib.rs:84-148
    dm, idx = build(LOREM_CORPUS)
    q = parse(qstr)
    docs = oracle.documents(q, idx)
    assert docs == [dm.get_id("doc 1"), dm.get_id("doc_2")]

    hits = oracle.query_hits(
        q, idx, 100, document_contents=contents(dm, LOREM_CORPUS), provider="simple"
    )
    assert len(hits) == 2
    assert hits[0].doc_id == dm.get_id("doc 1")
    assert hits[0].start == 399
    assert hits[0].rating == np.float32(2.5), hits[0].rating
    assert hits[1].doc_id == dm.get_id("doc_2")
    assert hits[1].start == 348
    assert float(hits[1].rating) < -0.0


def test_occurrences_lossless_and_not_1():
    # src/index.rs:1358-1381 (Lossless, Exact 1.0, limit 100, dist 1000)
    dm, idx = build(AN1_CORPUS, threshold=1.0, algo=EXACT, word_count_limit=100)
    q = parse("organization -stop")
    docs = oracle.documents(q, idx)
    assert len(docs) == 2

    hits = oracle.query_hits(q, idx, 1000, provider="lossless")
    occs = oracle.rank(hits)
    assert len(occs) == 2
    assert occs[0].doc_id == dm.get_id("doc3")
    assert occs[1].doc_id == dm.get_id("doc1")
    assert float(occs[0].rating) > float(occs[1].rating)


def test_occurrences_lossless_and_not_2():
    # src/index.rs:1382-1435 (Lossless, Jaro 0.9, limit 100, dist 100_000)
    dm, idx = build(SV_CORPUS, threshold=0.9, algo=JARO, word_count_limit=100)
    q = parse("vi -planet")
    docs = oracle.documents(q, idx)
    assert len(docs) == 3, docs

    hits = oracle.query_hits(q, idx, 100_000, provider="lossless")
    occs = oracle.rank(hits)
    assert len(occs) == 3, [(h.doc_id, float(h.rating)) for h in occs]
    assert occs[0].doc_id == dm.get_id("doc2")
    assert occs[1].doc_id == dm.get_id("doc5")
    assert occs[2].doc_id == dm.get_id("doc1")
    assert float(occs[2].rating) < -5.0
    assert float(occs[0].rating) >= float(occs[1].rating)


def test_segment_merge_ingest():
    # parallel-build recipe (src/index.rs:328-330,1049-1064): per-shard digest
    # then ingest-merge == single-shard digest
    full_dm, full = build(LOREM_CORPUS + AN1_CORPUS, algo=EXACT)
    dm = oracle.DocumentMap()
    a = oracle.Index(algo=EXACT)
    b = oracle.Index(algo=EXACT)
    for name, text in LOREM_CORPUS:
        dm.insert(name, text, a)
    for name, text in AN1_CORPUS:
        i = dm.reserve_id(name)
        b.digest_document(i, text)
    a.ingest(b)
    assert a.words == full.words
