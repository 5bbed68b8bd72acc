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


@pytest.mark.spark
def test_write_segment_refuses_committed_id(spark, tmp_path):
    """ADVICE r2: segment-id reuse must fail loudly, not silently clobber a
    committed segment; true crash orphans (dir exists, no ledger row) are
    still replaced."""
    import os
    import shutil

    store = IndexStore(spark, str(tmp_path / "idx"))
    store.write_segment("seg-0000", spark.createDataFrame(
        [(1, "committed words")], "doc_id long, text string"))
    with pytest.raises(ValueError, match="already committed"):
        store.write_segment("seg-0000", spark.createDataFrame(
            [(2, "other")], "doc_id long, text string"))
    # the committed data survived the refused overwrite
    assert store.postings().filter("term = 'committed'").count() == 1

    # crash orphan: dir exists but ledger write never happened -> replaced
    orphan = store.segment_path("seg-0001")
    shutil.copytree(store.segment_path("seg-0000"), orphan)
    assert not os.path.exists(store._ledger_path("seg-0001"))
    store.write_segment("seg-0001", spark.createDataFrame(
        [(3, "replacement")], "doc_id long, text string"))
    assert store.postings().filter("term = 'replacement'").count() == 1


@pytest.mark.spark
def test_auto_compaction_bounds_store_size(spark, tmp_path):
    """maybe_compact: repeated update rounds keep segment count bounded and
    never change query results."""
    from pyspark.sql import functions as F

    store = IndexStore(spark, str(tmp_path / "idx"))
    store.write_segment("seg-base", spark.createDataFrame(
        [(i, f"doc number {i} stable words") for i in range(20)],
        "doc_id long, text string"))
    assert store.maybe_compact() is None  # single segment: nothing to do

    for rnd in range(4):
        # re-ingest (update) half the docs each round
        store.write_segment(
            f"seg-upd-{rnd}",
            spark.createDataFrame(
                [(i, f"doc number {i} updated round {rnd}") for i in range(10)],
                "doc_id long, text string",
            ),
        )
        before = {
            (r.term, r.doc_id)
            for r in store.merged_postings().select("term", "doc_id").collect()
        }
        compacted = store.maybe_compact(max_superseded=0.25)
        after = {
            (r.term, r.doc_id)
            for r in store.merged_postings().select("term", "doc_id").collect()
        }
        assert after == before  # compaction never changes results
        if compacted is not None:
            assert len(store.completed_segments()) == 1
        assert len(store.completed_segments()) <= 3  # bounded, never grows

    # updated docs show the latest round only
    m = store.merged_postings()
    assert m.filter((F.col("term") == "updated") & (F.col("doc_id") == 0)).count() == 1
    assert m.filter((F.col("term") == "stable") & (F.col("doc_id") == 15)).count() == 1


@pytest.mark.spark
def test_publish_writes_blocks_meta(spark, tmp_path):
    """publish() stamps blocks_meta.json with doc_span + max ledger seq so
    readers can detect stale block snapshots (ADVICE r2)."""
    import json
    import os

    store = IndexStore(spark, str(tmp_path / "idx"))
    store.write_segment("seg-0000", spark.createDataFrame(
        [(i, f"some words {i}") for i in range(30)], "doc_id long, text string"))
    info = store.publish()
    mp = os.path.join(str(tmp_path / "idx"), "blocks_meta.json")
    with open(mp) as fh:
        meta = json.load(fh)
    assert meta["doc_span"] == info["doc_span"] > 0
    assert meta["max_seq"] == 0
    # dense small ids -> small span (not the sparse bucketing)
    assert meta["doc_span"] < 2**20

    # a later ingest makes the snapshot stale: max_seq moves past the stamp
    store.write_segment("seg-0001", spark.createDataFrame(
        [(100, "late arrival")], "doc_id long, text string"))
    seqs = [r.get("seq") for r in store.ledger()]
    assert max(s for s in seqs if s is not None) > meta["max_seq"]


@pytest.mark.spark
def test_auto_doc_span_robust_to_outlier_ids(spark, tmp_path):
    """One id-space outlier must not inflate the block range width (and
    collapse pruning): the quantile spread ignores it, queries stay exact."""
    from pyspark.sql import functions as F

    from elipdotter_spark.operators import bm25, codec

    store = IndexStore(spark, str(tmp_path / "idx"))
    rows = [(i, f"some words number {i}") for i in range(300)]
    rows.append((10**12, "outlier doc far away words"))
    store.write_segment(
        "seg-0000", spark.createDataFrame(rows, "doc_id long, text string")
    )
    info = store.publish()
    assert info["doc_span"] < 2**20, info["doc_span"]  # dense-sized, not 10^12-sized

    comp = spark.read.parquet(info["blocks_path"])
    dlb = spark.read.parquet(info["doclen_blocks_path"])
    postings = store.merged_postings()
    terms = spark.read.parquet(info["terms_path"])
    docstats = spark.read.parquet(info["docstats_path"])
    n, avgdl = bm25.corpus_stats(docstats)
    want = [
        (r.doc_id, round(r.score, 9))
        for r in bm25.bm25_topk(
            postings, docstats, terms, ["words", "outlier"], 5, n=n, avgdl=avgdl
        ).collect()
    ]
    got = [
        (r.doc_id, round(r.score, 9))
        for r in codec.bm25_topk_wand(
            comp, dlb, terms, ["words", "outlier"], 5, n, avgdl
        ).collect()
    ]
    assert got == want
    assert any(d == 10**12 for d, _ in got)  # the outlier doc is retrievable


@pytest.mark.spark
def test_blocks_staleness_tracked_separately(spark, tmp_path):
    """publish(with_compressed=False) refreshes terms/docstats but NOT the
    block tables — the per-family stamps must reflect that, or --wand would
    serve a pre-ingest block snapshot marked fresh."""
    store = IndexStore(spark, str(tmp_path / "idx"))
    store.write_segment("seg-0000", spark.createDataFrame(
        [(i, f"words {i}") for i in range(20)], "doc_id long, text string"))
    store.publish(with_compressed=True)
    assert not store.published_stale() and not store.blocks_stale()

    store.write_segment("seg-0001", spark.createDataFrame(
        [(100, "late words")], "doc_id long, text string"))
    assert store.published_stale() and store.blocks_stale()

    # terms/docstats-only publish: terms fresh, blocks STILL stale
    store.publish(with_compressed=False)
    assert not store.published_stale()
    assert store.blocks_stale()

    # full publish refreshes both
    store.publish(with_compressed=True)
    assert not store.published_stale() and not store.blocks_stale()

    # never-compressed store: blocks always stale, terms stamp still works
    store2 = IndexStore(spark, str(tmp_path / "idx2"))
    store2.write_segment("seg-0000", spark.createDataFrame(
        [(1, "solo words")], "doc_id long, text string"))
    store2.publish(with_compressed=False)
    assert not store2.published_stale()
    assert store2.blocks_stale()
