"""Property test: per-doc scoring (sentinel mode) == full-run reference pipeline.

This is the correctness foundation of the distributed scorer: Spark shuffles
occurrence rows by doc_id and runs the kernel per doc; the sentinel mechanism
(oracle.occurrences_pipeline / node_doc_maxes) must make the composed per-doc
results bit-identical to the sequential full-run pipeline, including the
reference's lookahead-dependent tail behavior at document boundaries.
"""

import random

import numpy as np
import pytest

from elipdotter_spark.core import oracle
from elipdotter_spark.core.parser import And, Not, Or, Word, parse
from elipdotter_spark.core.similarity import EXACT, HAMMING

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "etaa", "theta"]


def random_corpus(rng, n_docs, doc_len):
    docs = []
    for i in range(n_docs):
        words = [rng.choice(VOCAB) for _ in range(rng.randint(1, doc_len))]
        docs.append((f"d{i}", " ".join(words)))
    return docs


def random_ast(rng, depth=0):
    if depth >= 3 or rng.random() < 0.4:
        return Word(rng.choice(VOCAB))
    kind = rng.random()
    if kind < 0.4:
        return And(random_ast(rng, depth + 1), random_ast(rng, depth + 1))
    if kind < 0.7:
        return Or(random_ast(rng, depth + 1), random_ast(rng, depth + 1))
    # AND NOT
    return And(random_ast(rng, depth + 1), Not(random_ast(rng, depth + 1)))


def hit_key(h):
    return (
        h.doc_id,
        h.start,
        float(np.float32(h.rating)),
        h.word_id,
        tuple(h.occurrences),
        h.merged,
        tuple(h.closest_not) if h.closest_not is not None else None,
    )


def leaf_docs_fn(index, prox):
    def fn(word):
        if index.algo == EXACT:
            return index.documents_with_word(word) or []
        ids = set()
        for term in prox.get(word, {}):
            ids.update(index.words.get(term, {}))
        return sorted(ids)

    return fn


def run_case(rng, algo, threshold, dist):
    corpus = random_corpus(rng, rng.randint(1, 6), 12)
    dm = oracle.DocumentMap()
    idx = oracle.Index(threshold, algo, word_count_limit=2500)
    for name, text in corpus:
        dm.insert(name, text, idx)
    ast = random_ast(rng)
    prox = idx.proximate_map(ast)

    full_stream = lambda w: oracle.lossless_occurrences(idx, prox, w)
    try:
        full = oracle.occurrences_pipeline(ast, full_stream, dist)
    except oracle.StrayNot:
        return  # bare NOT root; nothing to compare

    maxes = oracle.node_doc_maxes(ast, leaf_docs_fn(idx, prox))

    all_docs = sorted(dm.id_to_name)
    composed = []
    for d in all_docs:

        def doc_stream(w, d=d):
            occs = full_stream(w)
            if occs is None:
                return None
            return [o for o in occs if o[0] == d]

        composed.extend(
            oracle.occurrences_pipeline(
                ast, doc_stream, dist, sentinel_max=maxes, current_doc=d
            )
        )

    assert sorted(map(hit_key, full)) == sorted(map(hit_key, composed)), (
        f"ast={ast} corpus={corpus}"
    )


@pytest.mark.parametrize("seed", range(12))
def test_per_doc_decomposition_exact(seed):
    rng = random.Random(seed)
    for _ in range(25):
        run_case(rng, EXACT, 1.0, rng.choice([0, 3, 10, 100, 10**6]))


@pytest.mark.parametrize("seed", range(8))
def test_per_doc_decomposition_fuzzy(seed):
    rng = random.Random(1000 + seed)
    for _ in range(15):
        run_case(rng, HAMMING, rng.choice([0.4, 0.6, 0.85]), rng.choice([0, 10, 10**6]))


def test_per_doc_decomposition_golden_queries():
    from fixtures import LOREM_CORPUS, SV_CORPUS
    from elipdotter_spark.core.similarity import JARO

    cases = [
        (LOREM_CORPUS, "feugiat luctus sem", HAMMING, 0.85, 100),
        (LOREM_CORPUS, "volutpat -hac", HAMMING, 0.85, 100),
        (LOREM_CORPUS, "-hac volutpat", HAMMING, 0.85, 100),
        (SV_CORPUS, "vi -planet", JARO, 0.9, 100_000),
    ]
    for corpus, qstr, algo, threshold, dist in cases:
        dm = oracle.DocumentMap()
        idx = oracle.Index(threshold, algo, word_count_limit=2500)
        for name, text in corpus:
            dm.insert(name, text, idx)
        ast = parse(qstr)
        prox = idx.proximate_map(ast)
        full_stream = lambda w: oracle.lossless_occurrences(idx, prox, w)
        full = oracle.occurrences_pipeline(ast, full_stream, dist)
        maxes = oracle.node_doc_maxes(ast, leaf_docs_fn(idx, prox))
        composed = []
        for d in sorted(dm.id_to_name):

            def doc_stream(w, d=d):
                occs = full_stream(w)
                return None if occs is None else [o for o in occs if o[0] == d]

            composed.extend(
                oracle.occurrences_pipeline(
                    ast, doc_stream, dist, sentinel_max=maxes, current_doc=d
                )
            )
        assert sorted(map(hit_key, full)) == sorted(map(hit_key, composed)), qstr
