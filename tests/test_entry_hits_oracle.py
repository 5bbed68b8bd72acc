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
