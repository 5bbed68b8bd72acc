"""Delta publish: block/doclen segments + per-term latest-wins + stats-drift
bound adjustment.  The invariant throughout: WAND over wand_tables() ==
exhaustive BM25 over the merged postings with CURRENT corpus stats —
bit-for-bit, across update rounds, vanished terms, and corpus growth."""

import os

import pytest
from pyspark.sql import functions as F

from elipdotter_spark.operators import bm25, codec, index_build
from elipdotter_spark.sources.catalog import IndexStore


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _assert_wand_matches_exhaustive(spark, store, qterms, k=10):
    postings = store.merged_postings()
    # round 5: the narrow tables are delta segments too — read resolved
    terms = store.published_terms()
    docstats = store.published_docstats()
    n, avgdl = store.corpus_stats()
    # the meta's incremental counters must agree with a fresh aggregate
    n_agg, avgdl_agg = bm25.corpus_stats(docstats)
    assert (n, round(avgdl, 9)) == (n_agg, round(avgdl_agg, 9))
    want = [
        (r.doc_id, round(r.score, 9))
        for r in bm25.bm25_topk(
            postings, docstats, terms, qterms, k, n=n, avgdl=avgdl
        ).collect()
    ]
    comp, dlb = store.wand_tables(terms, n, avgdl)
    got = [
        (r.doc_id, round(r.score, 9))
        for r in codec.bm25_topk_wand(
            comp, dlb, terms, qterms, k, n, avgdl
        ).collect()
    ]
    assert got == want, (qterms, got, want)
    return n, avgdl


@pytest.mark.spark
def test_delta_publish_exact_across_rounds(spark, tmp_path):
    store = IndexStore(spark, str(tmp_path / "idx"))
    base_rows = [(i, f"common words doc number{i % 7} filler") for i in range(60)]
    base_rows.append((100, "common unicorn rareword here"))  # doc with a unique term
    store.write_segment("seg-base", _df(spark, base_rows))
    store.publish(doc_span=16)
    meta0 = store._meta()
    assert "block_segments" in meta0 and "base" in meta0["block_segments"]
    _assert_wand_matches_exhaustive(spark, store, ["common", "number3"])

    # round 1: update doc 100 REMOVING its unique term (tombstone case),
    # update a doc's text, and ADD new docs (n and avgdl drift)
    store.write_segment(
        "seg-upd1",
        _df(
            spark,
            [(100, "common replaced entirely")]
            + [(200 + i, "fresh arrivals with common words and extra length padding") for i in range(20)],
        ),
    )
    assert store.blocks_stale()
    info = store.publish_delta()
    assert info["delta"] == "delta-000001"
    assert not store.blocks_stale() and not store.published_stale()
    # the vanished term is tombstoned (df=0 delta row) — resolved reader
    # drops it, while the BASE terms dir is untouched (delta-proportional)
    assert store.published_terms().filter(F.col("term") == "unicorn").count() == 0
    base_terms = spark.read.parquet(store._artifact_path("terms"))
    assert base_terms.filter(F.col("term") == "unicorn").count() == 1
    n1, _ = _assert_wand_matches_exhaustive(
        spark, store, ["common", "unicorn", "number3"]
    )
    assert n1 == 81  # 61 base + 20 new
    # unaffected-term path (stats drift multiplier): number3 only in base docs
    _assert_wand_matches_exhaustive(spark, store, ["number3", "padding"])

    # round 2: another delta on top of the first
    store.write_segment(
        "seg-upd2", _df(spark, [(5, "common mutated again"), (300, "brand new common")])
    )
    info2 = store.publish_delta()
    assert info2["delta"] == "delta-000002"
    _assert_wand_matches_exhaustive(spark, store, ["common", "mutated", "number5"])

    # round 3: a THIRD stacked delta (re-mutating a round-2 doc) — the
    # resolved readers must stay exact across >= 3 segments of lineage
    store.write_segment(
        "seg-upd3a",
        _df(spark, [(5, "common twisted thrice"), (301, "another common one")]),
    )
    info3 = store.publish_delta()
    assert info3["delta"] == "delta-000003"
    assert store.delta_segment_count() == 3
    assert store.published_terms().filter(F.col("term") == "mutated").count() == 0
    _assert_wand_matches_exhaustive(spark, store, ["common", "twisted", "number5"])

    # idempotent when up to date
    assert store.publish_delta() == {"delta": None, "reason": "up_to_date"}

    # a later FULL publish resets the delta lineage (all four families)
    store.write_segment("seg-upd4", _df(spark, [(6, "common final words")]))
    store.publish(doc_span=16)
    assert store._block_segment_dirs("blocks_delta") == []
    assert not os.path.isdir(os.path.join(store.base, "terms_delta"))
    assert list(store._meta()["block_segments"]) == ["base"]
    assert store._meta()["blocks_delta_names"] == []
    assert store.delta_segment_count() == 0
    _assert_wand_matches_exhaustive(spark, store, ["common", "final"])


@pytest.mark.spark
def test_delta_publish_requires_full_publish_first(spark, tmp_path):
    store = IndexStore(spark, str(tmp_path / "idx"))
    store.write_segment("seg-0000", _df(spark, [(1, "alpha words")]))
    with pytest.raises(ValueError, match="FULL publish"):
        store.publish_delta()
    # terms/docstats-only publish records no block stats either
    store.publish(with_compressed=False)
    with pytest.raises(ValueError, match="FULL publish"):
        store.publish_delta()


@pytest.mark.spark
def test_wand_tables_base_only_passthrough(spark, tmp_path):
    """A store without deltas must read identically through wand_tables
    (multiplier degenerates to 1: same n/avgdl as the base record)."""
    store = IndexStore(spark, str(tmp_path / "idx"))
    store.write_segment(
        "seg-0000", _df(spark, [(i, f"plain words {i % 5}") for i in range(40)])
    )
    store.publish(doc_span=16)
    terms = spark.read.parquet(store._artifact_path("terms"))
    docstats = spark.read.parquet(store._artifact_path("docstats"))
    n, avgdl = bm25.corpus_stats(docstats)
    comp, dlb = store.wand_tables(terms, n, avgdl)
    raw = spark.read.parquet(store._artifact_path("blocks"))
    got = {
        (r.term, r.block, round(r.block_max, 9)) for r in comp.collect()
    }
    want = {
        (r.term, r.block, round(r.block_max, 9)) for r in raw.collect()
    }
    assert got == want
    assert dlb.count() == spark.read.parquet(
        store._artifact_path("doclen_blocks")
    ).count()


@pytest.mark.spark
def test_delta_blocks_first_char_pruned(spark, tmp_path):
    """Delta segments keep the first-char physical layout, so qterm_blocks
    still partition-prunes every segment of the union."""
    store = IndexStore(spark, str(tmp_path / "idx"))
    store.write_segment(
        "seg-0000", _df(spark, [(i, f"alpha beta gamma {i % 3}") for i in range(30)])
    )
    store.publish(doc_span=16)
    store.write_segment("seg-0001", _df(spark, [(2, "alpha delta changed")]))
    store.publish_delta()
    terms = spark.read.parquet(store._artifact_path("terms"))
    docstats = spark.read.parquet(store._artifact_path("docstats"))
    n, avgdl = bm25.corpus_stats(docstats)
    comp, _dlb = store.wand_tables(terms, n, avgdl)
    plan = (
        codec.qterm_blocks(comp, ["alpha"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("PartitionFilters: [isnotnull(first") >= 1 or "first" in plan
    _assert_wand_matches_exhaustive(spark, store, ["alpha", "delta"])


@pytest.mark.spark
def test_delta_publish_refuses_compacted_baseline(spark, tmp_path):
    """compact() after the last block publish deletes the published
    baseline's segment rows — the df adjustment would double-count every
    doc; publish_delta must refuse and demand a full publish."""
    store = IndexStore(spark, str(tmp_path / "idx"))
    store.write_segment(
        "seg-0000", _df(spark, [(i, f"alpha words {i % 3}") for i in range(20)])
    )
    store.publish(doc_span=16)
    store.write_segment("seg-0001", _df(spark, [(1, "alpha changed")]))
    store.compact()  # rewrites ALL docs at a new seq, drops old segments
    with pytest.raises(ValueError, match="compacted"):
        store.publish_delta()
    # full publish realigns; a later delta works again
    store.publish(doc_span=16)
    store.write_segment("seg-0002", _df(spark, [(2, "alpha again")]))
    assert store.publish_delta()["delta"] is not None
    _assert_wand_matches_exhaustive(spark, store, ["alpha", "again"])
