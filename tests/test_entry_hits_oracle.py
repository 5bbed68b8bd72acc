"""Strengthen the rows-only gate queries: verify ft_query_hits (and the
engine's fuzzy path) against the Python oracle on the actual sf corpus."""

import numpy as np
import pytest

import __spark_entry__ as contract
from elipdotter_spark.core import oracle
from elipdotter_spark.core.parser import parse

SF_DIR = "/root/testdata/sf0.01"


def oracle_index_from_parquet(threshold, algo, limit):
    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    idx = oracle.Index(threshold, algo, limit)
    for doc_id, text in rows:
        idx.digest_document(doc_id, text)
    return idx


@pytest.mark.spark
def test_ft_query_hits_matches_python_oracle(spark):
    got = sorted(
        (r.doc_id, r.start, float(np.float32(r.rating)), r.word_id)
        for r in contract.queries()["ft_query_hits"](spark, SF_DIR).collect()
    )
    idx = oracle_index_from_parquet(1.0, "exact", 1000)
    ast = parse("table -vector")
    prox = idx.proximate_map(ast)
    hits = oracle.occurrences_pipeline(
        ast, lambda w: oracle.lossless_occurrences(idx, prox, w), 1000
    )
    want = sorted(
        (h.doc_id, h.start, float(np.float32(h.rating)), h.word_id) for h in hits
    )
    assert got == want


@pytest.mark.spark
def test_fuzzy_engine_matches_python_oracle_on_sf(spark):
    from elipdotter_spark.plans.compiler import QueryEngine
    from elipdotter_spark.entry import _tables

    t = _tables(spark, SF_DIR)
    eng = QueryEngine(
        spark, t["postings"], t["terms"],
        proximity_threshold=0.85, algo="hamming", word_count_limit=25,
    )
    idx = oracle_index_from_parquet(0.85, "hamming", 25)
    ast = parse("tabl valu -vect")
    prox = idx.proximate_map(ast)
    want = sorted(
        (h.doc_id, h.start, float(np.float32(h.rating)), h.word_id)
        for h in oracle.occurrences_pipeline(
            ast, lambda w: oracle.lossless_occurrences(idx, prox, w), 500
        )
    )
    got = sorted(
        (r.doc_id, r.start, float(np.float32(r.rating)), r.word_id)
        for r in eng.hits(ast, 500).collect()
    )
    assert got == want


def test_jaro_state_machine_sql_matches_python_exhaustively():
    """The zipf_jaro_general oracle simulates strsim's generic_jaro match
    loop in SQL; referee it against core.similarity.jaro_components for
    EVERY Zipf dictionary term (no threshold — the full state machine,
    including zero-match and transposition rows)."""
    import duckdb

    from elipdotter_spark.core.similarity import jaro, jaro_components
    from elipdotter_spark.entry import (
        JARO_GENERAL_THRESHOLD,
        JARO_GENERAL_WORD,
        ZIPF_TOKS_SQL,
        jaro_state_machine_sql,
    )

    w = JARO_GENERAL_WORD
    rows = duckdb.sql(
        f"""WITH {ZIPF_TOKS_SQL},
        zdict AS (SELECT DISTINCT term FROM ztok),
        {jaro_state_machine_sql(w)}
        SELECT term, CAST(m_5 AS INT), CAST(t_5 AS INT) FROM js5"""
    ).fetchall()
    assert len(rows) > 3000  # the whole non-prefix dictionary
    margin = min(
        abs(jaro(term, w) - JARO_GENERAL_THRESHOLD) for term, _m, _t in rows
    )
    bad = [
        (term, (m, t), jaro_components(term, w))
        for term, m, t in rows
        if (m, t) != jaro_components(term, w)
    ]
    assert not bad, bad[:10]
    # the f32-safety precondition: no rating near the threshold
    assert margin > 5e-3, margin
    # and the accepted set genuinely exercises transpositions
    accepted_t = {
        t for term, m, t in rows if m and jaro(term, w) >= JARO_GENERAL_THRESHOLD
    }
    assert 1 in accepted_t, "no transposition row in the accepted set"
