"""Streaming web-crawl front door (streaming/incremental.start_crawl_ingest):
raw pages stream -> recrawl collapse + HTML extraction -> URL-hash doc
identity -> ledger segments.  A page re-crawled in a later batch is an
UPDATE (same xxhash64(norm_url) id, higher seq -> latest-wins), the
streaming twin of `cli build --format pages` + `ingest`.
"""

import os

import pytest
from pyspark.sql import functions as F

from elipdotter_spark.core.parser import parse
from elipdotter_spark.operators import index_build
from elipdotter_spark.plans.compiler import QueryEngine
from elipdotter_spark.sources.catalog import IndexStore
from elipdotter_spark.streaming import incremental


def _pages(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, url string, warc_ts long, html string"
    ).withColumn("warc_ts", F.timestamp_seconds("warc_ts"))


def _doc_set(spark, store, word):
    postings = store.merged_postings()
    terms = index_build.build_terms(postings)
    eng = QueryEngine(spark, postings, terms, proximity_threshold=1.0, algo="exact")
    return {r.doc_id for r in eng.doc_ids(parse(word)).collect()}


@pytest.mark.spark
def test_crawl_stream_recrawl_is_update(spark, tmp_path):
    in_dir = str(tmp_path / "incoming")
    os.makedirs(in_dir)
    ckpt = str(tmp_path / "ckpt")
    store = IndexStore(spark, str(tmp_path / "idx"))

    # batch 1: two pages (A twice in-batch — latest warc_ts wins)
    _pages(spark, [
        (1, "https://a.example/p", 100, "<html><body>alpha stale words</body></html>"),
        (2, "https://a.example/p", 200, "<html><body>alpha old words</body></html>"),
        (3, "https://b.example/q", 100, "<html><body>beta text</body></html>"),
    ]).write.parquet(os.path.join(in_dir, "b1"))
    incremental.start_crawl_ingest(
        spark, in_dir + "/*", store, ckpt
    ).awaitTermination(120)
    segs1 = len(store.completed_segments())
    assert segs1 >= 1

    a_id = spark.sql(
        "SELECT xxhash64('https://a.example/p') AS h"
    ).collect()[0].h
    b_id = spark.sql(
        "SELECT xxhash64('https://b.example/q') AS h"
    ).collect()[0].h
    assert _doc_set(spark, store, "old") == {a_id}
    assert _doc_set(spark, store, "stale") == set()  # in-batch collapse
    assert _doc_set(spark, store, "beta") == {b_id}

    # batch 2: A re-crawled (new content) + new page C — A must UPDATE
    _pages(spark, [
        (9, "https://a.example/p", 300, "<html><body>alpha fresh words</body></html>"),
        (10, "https://c.example/r", 300, "<html><body>gamma text</body></html>"),
    ]).write.parquet(os.path.join(in_dir, "b2"))
    incremental.start_crawl_ingest(
        spark, in_dir + "/*", store, ckpt
    ).awaitTermination(120)
    assert len(store.completed_segments()) > segs1

    assert _doc_set(spark, store, "fresh") == {a_id}
    assert _doc_set(spark, store, "old") == set()  # superseded version
    assert _doc_set(spark, store, "gamma") != set()
    # restart against the same checkpoint: nothing new -> no new segments
    n = len(store.completed_segments())
    incremental.start_crawl_ingest(
        spark, in_dir + "/*", store, ckpt
    ).awaitTermination(120)
    assert len(store.completed_segments()) == n


@pytest.mark.spark
def test_crawl_stream_dead_letter(spark, tmp_path):
    in_dir = str(tmp_path / "incoming")
    os.makedirs(in_dir)
    ckpt = str(tmp_path / "ckpt")
    dl = str(tmp_path / "dead")
    store = IndexStore(spark, str(tmp_path / "idx"))

    # the bare '<' swallows nothing (letter-anchored tag strip) but DOES
    # leave markup residue -> has_markup -> dead letter, not the index
    _pages(spark, [
        (1, "https://a.example/p", 100, "<html><body>good text</body></html>"),
        (2, "https://bad.example/x", 100, "<html><body>broken < residue</body></html>"),
    ]).write.parquet(os.path.join(in_dir, "b1"))
    incremental.start_crawl_ingest(
        spark, in_dir + "/*", store, ckpt, dead_letter_dir=dl
    ).awaitTermination(120)

    dead = spark.read.parquet(dl + "/batch-*").collect()
    assert [r.url for r in dead] == ["https://bad.example/x"]
    assert _doc_set(spark, store, "good") != set()
    assert _doc_set(spark, store, "broken") == set()
