"""Round-6 catalog hardening.

1. FULL publish() is crash-atomic (VERDICT r5 #1 / ADVICE r5 medium): base
   artifacts are versioned unreferenced dirs named in the meta and swapped
   at the single atomic meta commit.  The dangerous case is a store whose
   coverage is ALREADY COMPLETE (the maybe_publish_full lineage-compaction
   path cli ingest auto-runs): the round-5 in-place rewrite could crash
   mid-job and leave blocks_stale()==False over a half-written base dir.
2. publish_delta refuses ANY pre-round-5 meta (ADVICE r5 high): a round-4
   meta without delta dirs used to slip through and the new delta's bseg=1
   would LOSE latest-wins to the base's bseg=seq (>=1) — silently stale
   WAND results on an upgraded store.
3. _finalize_segment tolerates a concurrent reader's _recover_segments
   completing the writer's own commit (ADVICE r5 medium): the round-5
   unconditional rmtree(final) could delete the just-recovered data and
   leave a committed ledger row with no data dir.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from elipdotter_spark.sources.catalog import IndexStore

from test_round5_catalog import (  # noqa: F401  (shared fixtures/helpers)
    BASE_ROWS,
    UPD_ROWS,
    InjectedCrash,
    _df,
    _published_state,
    _wand_rows,
)


def _covered_store(spark, path):
    """A store in the maybe_publish_full shape: full publish + one delta,
    coverage COMPLETE — the next full publish is pure lineage compaction,
    exactly the case where round-5's in-place rewrite was dangerous."""
    st = IndexStore(spark, path)
    st.write_segment("seg-base", _df(spark, BASE_ROWS))
    st.publish(doc_span=16)
    st.write_segment("seg-upd", _df(spark, UPD_ROWS))
    st.publish_delta()
    assert not st.published_stale() and not st.blocks_stale()
    return st


@pytest.mark.spark
@pytest.mark.slow
def test_publish_full_crash_retry_idempotent(spark, tmp_path, monkeypatch):
    """Kill matrix for the FULL publish: die after each of its four
    artifact writes and once just before the meta commit, on a store whose
    coverage is already complete.  After every kill the store must still
    read as FRESH *and serve the exact pre-publish state* (the old base +
    delta resolve — not half-written dirs); a retry must converge to an
    uninterrupted twin bit-for-bit, and GC must leave only the committed
    version dirs."""
    twin = _covered_store(spark, str(tmp_path / "twin"))
    twin.publish(doc_span=16)  # uninterrupted compaction
    want = _published_state(spark, twin)
    want_wand = _wand_rows(spark, twin, ["common", "unicorn", "padding"])

    orig_artifact = IndexStore._write_artifact
    orig_meta = IndexStore._write_meta

    # kill_at 1..4: after the Nth artifact write; 5: before the meta write
    for kill_at in range(1, 6):
        st = _covered_store(spark, str(tmp_path / f"kill{kill_at}"))
        pre = _published_state(spark, st)
        calls = {"n": 0}

        def artifact(self, kind, path, fn, _k=kill_at, _c=calls):
            orig_artifact(self, kind, path, fn)  # side effect LANDS, then die
            _c["n"] += 1
            if _c["n"] == _k:
                raise InjectedCrash(f"after {kind}")

        def meta_write(self, meta, expect_raw="unchecked", _k=kill_at):
            if _k == 5:
                raise InjectedCrash("before meta commit")
            orig_meta(self, meta, expect_raw)

        monkeypatch.setattr(IndexStore, "_write_artifact", artifact)
        monkeypatch.setattr(IndexStore, "_write_meta", meta_write)
        with pytest.raises(InjectedCrash):
            st.publish(doc_span=16)
        monkeypatch.setattr(IndexStore, "_write_artifact", orig_artifact)
        monkeypatch.setattr(IndexStore, "_write_meta", orig_meta)

        # THE round-6 property: coverage was already complete, so the store
        # still reads as fresh — and what it serves must be the intact
        # pre-publish state, not a half-written base rewrite
        assert not st.published_stale() and not st.blocks_stale()
        assert _published_state(spark, st) == pre, f"kill_at={kill_at} leaked"

        # retry converges to the uninterrupted twin, exactly
        st.publish(doc_span=16)
        assert not st.published_stale() and not st.blocks_stale()
        assert _published_state(spark, st) == want, f"kill_at={kill_at}"
        assert (
            _wand_rows(spark, st, ["common", "unicorn", "padding"]) == want_wand
        )
        # GC: only the committed version dirs survive (no plain dirs, no
        # orphan versions, no delta families)
        meta = st._meta()
        named = set(meta["artifact_dirs"].values())
        on_disk = {
            e
            for e in os.listdir(st.base)
            if e.split("-v")[0]
            in ("terms", "docstats", "blocks", "doclen_blocks")
            and not e.startswith(("terms_delta", "docstats_delta"))
        }
        assert on_disk == named, f"kill_at={kill_at}: {on_disk} != {named}"
        for fam in ("terms_delta", "docstats_delta", "blocks_delta", "doclen_delta"):
            assert not os.path.isdir(os.path.join(st.base, fam))


@pytest.mark.spark
def test_versioned_publish_reads_and_gc(spark, tmp_path):
    """Basics of the versioned layout: artifact_dirs name the live dirs,
    repeated publishes bump the version and GC the old one, and every
    reader resolves through the meta (no plain-name reads)."""
    st = IndexStore(spark, str(tmp_path / "idx"))
    st.write_segment("seg-base", _df(spark, BASE_ROWS))
    info1 = st.publish(doc_span=16)
    m1 = st._meta()
    assert m1["publish_version"] == 1
    assert m1["artifact_dirs"]["terms"] == "terms-v000001"
    assert info1["terms_path"].endswith("terms-v000001")
    assert os.path.isdir(info1["blocks_path"])
    assert st.published_terms().filter(F.col("term") == "unicorn").count() == 1

    st.write_segment("seg-upd", _df(spark, UPD_ROWS))
    info2 = st.publish(doc_span=16)
    m2 = st._meta()
    assert m2["publish_version"] == 2
    assert info2["terms_path"].endswith("terms-v000002")
    # superseded version GC'd
    assert not os.path.isdir(info1["terms_path"])
    assert not os.path.isdir(info1["blocks_path"])
    assert st.published_terms().filter(F.col("term") == "unicorn").count() == 0

    # terms/docstats-only publish: narrow dirs bump, block dirs carried
    st.write_segment("seg-upd2", _df(spark, [(7, "common extra words")]))
    st.publish(with_compressed=False)
    m3 = st._meta()
    assert m3["artifact_dirs"]["terms"] == "terms-v000003"
    assert m3["artifact_dirs"]["blocks"] == m2["artifact_dirs"]["blocks"]
    assert os.path.isdir(st._artifact_path("blocks"))
    assert not st.published_stale() and st.blocks_stale()


@pytest.mark.spark
def test_pre_round5_meta_delta_refused(spark, tmp_path):
    """ADVICE r5 (high): a round-4 meta (no delta-segment name lists) must
    be refused by publish_delta EVEN WHEN no delta dirs exist yet — the
    new delta's bseg=1 would lose per-(term,block) latest-wins to the
    base's bseg=seq on any multi-segment store, silently serving stale
    blocks.  One full publish upgrades the store; a delta then works."""
    st = IndexStore(spark, str(tmp_path / "idx"))
    st.write_segment("seg-a", _df(spark, BASE_ROWS[:30]))
    st.write_segment("seg-b", _df(spark, BASE_ROWS[30:]))  # max seq >= 1
    st.publish(doc_span=16)

    # surgically downgrade the meta to its round-4 shape: max stamps only,
    # no name lists, no set coverage, base keyed by seq (no bseg)
    meta = st._meta()
    for k in (
        "covered_seqs",
        "blocks_covered_seqs",
        "blocks_delta_names",
        "terms_delta_names",
    ):
        meta.pop(k, None)
    meta["block_segments"]["base"] = {
        "n": meta["block_segments"]["base"]["n"],
        "avgdl": meta["block_segments"]["base"]["avgdl"],
        "seq": meta["max_seq"],
    }
    with open(os.path.join(st.base, "blocks_meta.json"), "w") as fh:
        json.dump(meta, fh)

    st.write_segment("seg-upd", _df(spark, [(1, "common changed words")]))
    with pytest.raises(ValueError, match="pre-round-5"):
        st.publish_delta()

    st.publish(doc_span=16)  # upgrade
    st.write_segment("seg-upd2", _df(spark, [(2, "common changed again")]))
    assert st.publish_delta()["delta"] is not None
    # the delta actually wins over the base for the updated doc
    assert (
        st.published_terms().filter(F.col("term") == "again").count() == 1
    )


def _stacked_store(spark, path, n_deltas=3):
    """Base publish + n stacked deltas covering the interesting shapes:
    doc update that removes a unique term (term tombstone), new-doc
    arrivals (corpus growth), and a re-update of an earlier delta's doc
    (cross-delta latest-wins)."""
    st = IndexStore(spark, path)
    st.write_segment("seg-base", _df(spark, BASE_ROWS))
    st.publish(doc_span=16)
    st.write_segment("seg-u1", _df(spark, UPD_ROWS))  # drops 'unicorn'
    st.publish_delta()
    if n_deltas >= 2:
        st.write_segment(
            "seg-u2", _df(spark, [(5, "common mutated words"), (300, "brand new common")])
        )
        st.publish_delta()
    if n_deltas >= 3:
        st.write_segment(
            "seg-u3", _df(spark, [(5, "common twisted thrice"), (200, "fresh rewritten entry common")])
        )
        st.publish_delta()
    assert st.delta_segment_count() == n_deltas
    return st


@pytest.mark.spark
def test_compact_deltas_read_equivalent(spark, tmp_path):
    """LSM delta-lineage compaction (VERDICT r5 next-round #8): merging
    the K delta segment families into one must be READ-EQUIVALENT bit for
    bit (same resolved terms/docstats/blocks/doclen/stats and the same
    WAND result), drop the lineage to one segment, GC the old dirs, and
    keep the store fully functional for further deltas — whose bseg must
    beat the merged rows' retained bsegs."""
    st = _stacked_store(spark, str(tmp_path / "idx"))
    pre = _published_state(spark, st)
    pre_wand = _wand_rows(spark, st, ["common", "twisted", "padding"])

    out = st.compact_deltas()
    assert out["merged"] == "delta-m000001"
    assert out["blocks"] == 3 and out["narrow"] == 3
    assert st.delta_segment_count() == 1
    assert not st.published_stale() and not st.blocks_stale()

    # bit-for-bit read equivalence: the merge materializes exactly the
    # rows the resolved read kept anyway (original bseg + df_then, old
    # block_segments stats entries retained)
    assert _published_state(spark, st) == pre
    assert _wand_rows(spark, st, ["common", "twisted", "padding"]) == pre_wand

    # old per-publish dirs GC'd; only the merged segment remains
    for fam in ("blocks_delta", "doclen_delta", "terms_delta", "docstats_delta"):
        assert sorted(os.listdir(os.path.join(st.base, fam))) == ["delta-m000001"], fam

    # a further delta on top: its bseg must EXCEED the merged rows' max
    # bseg (3), or latest-wins would prefer the stale merged row
    st.write_segment("seg-u4", _df(spark, [(5, "common final form")]))
    info = st.publish_delta()
    assert info["delta"] == "delta-000004"  # max surviving bseg 3 -> ord 4
    assert st.published_terms().filter(F.col("term") == "twisted").count() == 0
    assert st.published_terms().filter(F.col("term") == "final").count() == 1
    _assert_wand = __import__("test_delta_publish")._assert_wand_matches_exhaustive
    _assert_wand(spark, st, ["common", "final", "padding"], k=10)

    # and the merge composes with itself: merge the (merged + new) pair
    out2 = st.compact_deltas()
    assert out2["merged"] == "delta-m000002"
    assert st.delta_segment_count() == 1
    _assert_wand(spark, st, ["common", "final", "padding"], k=10)

    # idempotent when there is nothing to merge
    assert st.compact_deltas() == {"merged": None, "reason": "nothing_to_merge"}


@pytest.mark.spark
@pytest.mark.slow
def test_compact_deltas_crash_retry_idempotent(spark, tmp_path, monkeypatch):
    """compact_deltas kill matrix: die after each of the four merged
    artifact writes and once before the meta commit — the published state
    must be untouched after every kill, and a retry must converge to an
    uninterrupted twin."""
    twin = _stacked_store(spark, str(tmp_path / "twin"))
    twin.compact_deltas()
    want = _published_state(spark, twin)

    orig_artifact = IndexStore._write_artifact
    orig_meta = IndexStore._write_meta

    for kill_at in range(1, 6):
        st = _stacked_store(spark, str(tmp_path / f"kill{kill_at}"))
        pre = _published_state(spark, st)
        calls = {"n": 0}

        def artifact(self, kind, path, fn, _k=kill_at, _c=calls):
            orig_artifact(self, kind, path, fn)
            _c["n"] += 1
            if _c["n"] == _k:
                raise InjectedCrash(f"after {kind}")

        def meta_write(self, meta, expect_raw="unchecked", _k=kill_at):
            if _k == 5:
                raise InjectedCrash("before meta commit")
            orig_meta(self, meta, expect_raw)

        monkeypatch.setattr(IndexStore, "_write_artifact", artifact)
        monkeypatch.setattr(IndexStore, "_write_meta", meta_write)
        with pytest.raises(InjectedCrash):
            st.compact_deltas()
        monkeypatch.setattr(IndexStore, "_write_artifact", orig_artifact)
        monkeypatch.setattr(IndexStore, "_write_meta", orig_meta)

        assert not st.published_stale() and not st.blocks_stale()
        assert _published_state(spark, st) == pre, f"kill_at={kill_at} leaked"
        assert st.delta_segment_count() == 3  # lineage untouched

        out = st.compact_deltas()
        assert out["merged"] == "delta-m000001"
        assert _published_state(spark, st) == want, f"kill_at={kill_at}"
        assert st.delta_segment_count() == 1


@pytest.mark.spark
def test_maybe_compact_lineage_merge_mode(spark, tmp_path):
    """The merge policy keeps the lineage bounded without full publishes
    and stays exact — the cli ingest `--compaction merge` path."""
    st = _stacked_store(spark, str(tmp_path / "idx"), n_deltas=2)
    assert st.maybe_compact_lineage(max_delta_segments=4, mode="merge") is None
    out = st.maybe_compact_lineage(max_delta_segments=2, mode="merge")
    assert out is not None and out["merged"] == "delta-m000001"
    assert st.delta_segment_count() == 1
    _assert_wand = __import__("test_delta_publish")._assert_wand_matches_exhaustive
    _assert_wand(spark, st, ["common", "mutated", "padding"], k=10)


@pytest.mark.spark
def test_maybe_compact_lineage_auto_mode(spark, tmp_path):
    """`--compaction auto`: merge while the delta lineage is small relative
    to base (measured on-disk, zero Spark jobs), full publish once
    delta_bytes >= fraction * base_bytes.  Both arms stay exact."""
    st = _stacked_store(spark, str(tmp_path / "idx"), n_deltas=2)
    delta_b, base_b = st.lineage_bytes()
    assert delta_b > 0 and base_b > 0

    # merge arm (fraction large enough that this toy lineage reads small;
    # at this scale per-file parquet overhead dominates the byte probe, so
    # the REAL default-threshold behavior is only meaningful at size —
    # both arms are driven explicitly here)
    out = st.maybe_compact_lineage(
        max_delta_segments=2, mode="auto", auto_full_fraction=1e9
    )
    assert out is not None and out.get("merged") == "delta-m000001"
    assert st.delta_segment_count() == 1

    # force the other arm: fraction 0 makes any delta lineage "too big";
    # auto must full-publish (resets base AND empties the delta lineage)
    st.write_segment("seg-u3", _df(spark, [(7, "common again rewritten")]))
    st.publish_delta()
    out = st.maybe_compact_lineage(
        max_delta_segments=2, mode="auto", auto_full_fraction=0.0
    )
    assert out is not None and "merged" not in out
    assert st.delta_segment_count() == 0
    assert st.lineage_bytes()[0] == 0
    assert not st.published_stale() and not st.blocks_stale()
    _assert_wand = __import__("test_delta_publish")._assert_wand_matches_exhaustive
    _assert_wand(spark, st, ["common", "mutated", "padding"], k=10)


@pytest.mark.spark
@pytest.mark.slow
def test_eight_deltas_interleaved_merges_stay_exact(spark, tmp_path):
    """VERDICT r5 #8 'done' criterion: exactness across >= 8 stacked-then-
    compacted deltas.  An unattended merge-mode ingest loop (new docs +
    base-doc updates, maybe_compact_lineage(mode='merge') after every
    publish) must keep the resolved narrow tables equal to a fresh full
    derivation of the final ledger, and WAND equal to exhaustive BM25."""
    import random

    rng = random.Random(7)
    st = IndexStore(spark, str(tmp_path / "idx"))
    st.write_segment("seg-base", _df(spark, BASE_ROWS))
    st.publish(doc_span=16)
    vocab = ["common", "alpha", "beta", "gamma", "fresh", "words"]
    next_id = 2000
    _assert_wand = __import__(
        "test_delta_publish"
    )._assert_wand_matches_exhaustive
    for i in range(8):
        rows = []
        for _ in range(rng.randint(1, 3)):
            if rng.random() < 0.5:
                did = rng.randrange(0, 60)  # update a base doc
            else:
                did, next_id = next_id, next_id + 1
            rows.append(
                (did, " ".join(rng.choices(vocab, k=rng.randint(3, 9))))
            )
        st.write_segment(f"seg-d{i}", _df(spark, rows))
        st.publish_delta()
        st.maybe_compact_lineage(max_delta_segments=3, mode="merge")
        assert st.delta_segment_count() <= 3
    _assert_wand(spark, st, ["common", "alpha", "fresh"], k=10)
    # resolved narrow tables == fresh full derivation of the final ledger
    from elipdotter_spark.operators import index_build

    full = st.merged_postings()
    want_terms = sorted(
        (r.term, r.df, r.cf)
        for r in index_build.build_terms(full).collect()
    )
    got_terms = sorted(
        (r.term, r.df, r.cf) for r in st.published_terms().collect()
    )
    assert got_terms == want_terms
    want_ds = sorted(
        (r.doc_id, r.doc_len)
        for r in index_build.docstats_from_postings(full).collect()
    )
    got_ds = sorted(
        (r.doc_id, r.doc_len) for r in st.published_docstats().collect()
    )
    assert got_ds == want_ds


@pytest.mark.spark
def test_finalize_segment_survives_concurrent_recovery(spark, tmp_path, monkeypatch):
    """ADVICE r5 (medium): once the write-ahead ledger row is visible, a
    concurrent READER's _recover_segments may rename tmp->final before the
    writer does.  The round-5 writer then rmtree'd the final ('pre-era
    orphan') and failed its own rename — a committed row with NO data dir,
    silently skipped by readers forever.  The writer must instead treat
    the segment as already recovered."""
    st = IndexStore(spark, str(tmp_path / "idx"))
    reader = IndexStore(spark, str(tmp_path / "idx"))

    orig = IndexStore._finalize_segment

    def racing_finalize(self, tmp, final):
        reader._recover_segments()  # the reader wins the rename race
        assert os.path.exists(final) and not os.path.exists(tmp)
        orig(self, tmp, final)  # writer must tolerate this

    monkeypatch.setattr(IndexStore, "_finalize_segment", racing_finalize)
    row = st.write_segment("seg-0000", _df(spark, [(1, "durable words")]))
    monkeypatch.undo()

    # committed AND present: no row-without-dir loss
    final = st.segment_path("seg-0000")
    assert os.path.exists(final)
    assert not os.path.exists(f"{final}.tmp-{row['seq']}")
    assert st.postings().filter(F.col("term") == "durable").count() == 1

    # the pre-write-ahead-era orphan case still works: final exists while
    # OUR tmp is also in place -> the orphan is replaced by our data
    orphan = st.segment_path("seg-0001")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk"), "w") as fh:
        fh.write("stale")
    st.write_segment("seg-0001", _df(spark, [(2, "fresher words")]))
    assert not os.path.exists(os.path.join(orphan, "junk"))
    assert st.postings().filter(F.col("term") == "fresher").count() == 1
