"""Ordered-proximity retrieval + html text extraction byte-identity."""

import duckdb
import pytest
from pyspark.sql import functions as F

from elipdotter_spark.core.tokenize import tokenize
from elipdotter_spark.operators import index_build
from elipdotter_spark.operators.proximity_query import (
    ordered_near_docs,
    ordered_near_docs_python,
)
from elipdotter_spark.sources.corpus import extract_text, pages_df

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.spark
def test_extract_text_byte_identical(spark):
    # input_hint invariant: extracted text per url == reference input, bytes
    pages = pages_df(spark, n_filler=20)
    rows = extract_text(pages).select("url", "text", "extracted").collect()
    assert rows
    for r in rows:
        assert r.extracted.encode("utf-8") == r.text.encode("utf-8"), r.url


@pytest.mark.spark
@pytest.mark.parametrize(
    "terms,gap",
    [
        (["table", "value"], 6),     # exact adjacency for 'table '
        (["table", "value"], 40),    # proximity window
        (["spark", "fast", "table"], 60),
        (["value", "value"], 30),    # repeated term chains
    ],
)
def test_ordered_near_matches_bruteforce(spark, terms, gap):
    docs_rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    docs_tokens = {d: tokenize(t) for d, t in docs_rows}
    want = ordered_near_docs_python(docs_tokens, terms, gap)

    docs = spark.createDataFrame(docs_rows, schema="doc_id long, text string")
    postings = index_build.build_postings(docs)
    got = sorted(r.doc_id for r in ordered_near_docs(postings, terms, gap).collect())
    assert got == want, (terms, gap)


@pytest.mark.spark
def test_phrase_on_planted_corpus(spark):
    rows = [
        (0, "big data spark engine"),
        (1, "spark is a data engine"),
        (2, "engine spark data"),
    ]
    docs = spark.createDataFrame(rows, schema="doc_id long, text string")
    postings = index_build.build_postings(docs)
    # phrase "data spark": adjacent in doc 0 only ('data ' = 5 bytes)
    got = sorted(
        r.doc_id for r in ordered_near_docs(postings, ["data", "spark"], 5).collect()
    )
    assert got == [0]
