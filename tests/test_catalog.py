"""Resumable segmented build: kill between segments, resume, identical index."""

import pytest

from elipdotter_spark.operators import index_build
from elipdotter_spark.sources.catalog import IndexStore


@pytest.mark.spark
def test_resumable_build_identical(spark, tmp_path, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # uninterrupted reference build
    direct = {
        (r.term, r.doc_id): (list(r.positions), r.tf)
        for r in index_build.build_postings(docs).collect()
    }

    store = IndexStore(spark, str(tmp_path / "idx"))
    with pytest.raises(RuntimeError, match="injected failure"):
        store.build_resumable(docs, n_segments=4, fail_after=2)
    assert len(store.completed_segments()) == 2

    # resume: only pending segments rebuilt
    rows = store.build_resumable(docs, n_segments=4)
    assert len(rows) == 2
    assert len(store.completed_segments()) == 4

    got = {
        (r.term, r.doc_id): (list(r.positions), r.tf)
        for r in store.postings().collect()
    }
    assert got == direct

    # ledger metrics recorded per segment
    for row in store.ledger():
        assert row["status"] == "done"
        assert row["n_postings"] > 0
        assert row["bytes"] > 0
        assert row["postings_per_sec"] > 0
        assert row["skew_ratio"] >= 1.0
        assert row["wall_ms"] > 0

    info = store.publish()
    assert info["segments"] == 4
    terms = spark.read.parquet(info["terms_path"])
    assert terms.count() > 0


@pytest.mark.spark
def test_resume_noop_when_complete(spark, tmp_path, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    store = IndexStore(spark, str(tmp_path / "idx2"))
    store.build_resumable(docs, n_segments=2)
    assert store.build_resumable(docs, n_segments=2) == []


@pytest.mark.spark
def test_mixed_era_store_latest_wins(spark, tmp_path):
    """A store with round-1 segments (no seq column) plus new seq-stamped
    segments must keep the legacy docs AND let re-ingests supersede them
    (regression: NULL-seq join drop + single-footer schema pick)."""
    import json

    from pyspark.sql import functions as F

    from elipdotter_spark.operators import index_build
    from elipdotter_spark.sources.catalog import IndexStore

    store = IndexStore(spark, str(tmp_path / "idx"))
    legacy = spark.createDataFrame(
        [(100, "legacy words survive")], "doc_id long, text string"
    )
    # simulate a pre-seq segment on disk
    index_build.build_postings(legacy).write.parquet(store.segment_path("seg-0000"))
    with open(store._ledger_path("seg-0000"), "w") as fh:
        json.dump({"segment_id": "seg-0000", "status": "done", "n_docs": 1,
                   "n_postings": 3, "bytes": 1, "postings_per_sec": 0.0,
                   "skew_ratio": 0.0, "wall_ms": 1}, fh)
    store.write_segment(
        "seg-0001",
        spark.createDataFrame([(200, "modern words arrive")], "doc_id long, text string"),
    )
    m = store.merged_postings()
    assert {r.doc_id for r in m.select("doc_id").distinct().collect()} == {100, 200}

    # re-ingest the legacy doc: latest (seq-stamped) must beat seq=NULL
    store.write_segment(
        "seg-0002",
        spark.createDataFrame([(100, "legacy replaced entirely")], "doc_id long, text string"),
    )
    m2 = store.merged_postings()
    assert m2.filter((F.col("term") == "words") & (F.col("doc_id") == 100)).count() == 0
    assert m2.filter(F.col("term") == "replaced").count() == 1
    # compact commits under a fresh name before deleting the old segments
    row = store.compact()
    assert row["segment_id"].startswith("seg-compact-")
    assert len(store.completed_segments()) == 1
    m3 = store.merged_postings()
    assert m3.filter(F.col("term") == "replaced").count() == 1


@pytest.mark.spark
def test_compact_cycles_keep_seq_monotonic(spark, tmp_path):
    """Regression: seq must stay monotonic across compaction (the ledger
    shrinks, so len(ledger) would reissue LOWER seqs and post-compact
    updates would silently lose latest-wins), and repeated compacts must
    not collide on the segment name."""
    from pyspark.sql import functions as F

    from elipdotter_spark.sources.catalog import IndexStore

    store = IndexStore(spark, str(tmp_path / "idx"))
    store.write_segment("seg-0000", spark.createDataFrame(
        [(7, "version one")], "doc_id long, text string"))
    store.write_segment("seg-0001", spark.createDataFrame(
        [(8, "other doc")], "doc_id long, text string"))
    store.compact()

    # post-compact UPDATE of doc 7: must supersede the compacted version
    store.write_segment("seg-0002", spark.createDataFrame(
        [(7, "version two")], "doc_id long, text string"))
    m = store.merged_postings()
    assert m.filter((F.col("term") == "one") & (F.col("doc_id") == 7)).count() == 0
    assert m.filter(F.col("term") == "two").count() == 1
    # no duplicate postings for the updated doc
    assert m.filter((F.col("term") == "version") & (F.col("doc_id") == 7)).count() == 1

    # second compact: fresh (higher) name, still correct
    row2 = store.compact()
    assert row2["seq"] > 2
    m2 = store.merged_postings()
    assert m2.filter(F.col("term") == "two").count() == 1
    assert m2.filter(F.col("term") == "one").count() == 0
    # third compact immediately (idempotent, no name collision)
    store.compact()
    assert len(store.completed_segments()) == 1
