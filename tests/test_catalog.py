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
