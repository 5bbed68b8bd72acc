"""Two-phase supersede-GC (gc_grace_sec): the snapshot-expiration
discipline for multi-reader clusters.

With gc_grace_sec == 0 (default) superseded artifacts are deleted at the
commit, exactly as before — every existing kill-matrix / GC assertion
stays binding.  With a grace window, a concurrent publish must NOT break
readers mid-scan on the previous snapshot: superseded dirs are stamped
``.retired`` and only deleted by sweep_retired() once the window passes,
and new delta/merge segment ordinals are floored past retired dirs so a
lingering dir is never name-reused (Spark overwrite would replace the
bytes under the old reader).
"""

import json
import os
import time

import pytest

from elipdotter_spark.sources.catalog import IndexStore

from test_round5_catalog import (  # noqa: F401  (shared fixtures/helpers)
    BASE_ROWS,
    UPD_ROWS,
    _df,
    _run_schedule_fuzz,
    _wand_rows,
)


def _backdate(stamp_path, by_sec):
    with open(stamp_path) as fh:
        d = json.load(fh)
    d["ts"] -= by_sec
    with open(stamp_path, "w") as fh:
        json.dump(d, fh)


def _tree_sig(d):
    out = []
    for root, _dirs, files in os.walk(d):
        for f in files:
            if f.startswith("."):
                continue
            p = os.path.join(root, f)
            out.append((os.path.relpath(p, d), os.path.getsize(p)))
    return sorted(out)


def _retired_dirs(base):
    out = []
    for root, dirs, files in os.walk(base):
        if ".retired" in files:
            out.append(os.path.relpath(root, base))
    return sorted(out)


@pytest.mark.spark
def test_grace_keeps_old_snapshot_readable_until_sweep(spark, tmp_path):
    """A second full publish retires (not deletes) the previous base
    version dirs; a reader that resolved the OLD meta keeps collecting its
    DataFrame bit-identically; sweep_retired() deletes only once the
    window expires, and the live snapshot is untouched."""
    st = IndexStore(spark, str(tmp_path / "store"), gc_grace_sec=3600)
    st.write_segment("seg-base", _df(spark, BASE_ROWS))
    st.publish(doc_span=16)
    old_meta = st._meta()
    old_terms_path = st._artifact_path("terms", old_meta)
    # the in-flight reader: plan + first collect against the v1 snapshot
    reader = spark.read.parquet(old_terms_path)
    want = sorted(map(tuple, reader.collect()))

    st.write_segment("seg-upd", _df(spark, UPD_ROWS))
    st.publish_delta()
    st.publish(doc_span=16)  # supersedes v1 base artifacts + the delta

    # v1 dirs still on disk, stamped — the old reader is unharmed
    assert os.path.isdir(old_terms_path)
    retired = _retired_dirs(st.base)
    assert any(r.startswith("terms-v") for r in retired), retired
    assert sorted(map(tuple, reader.collect())) == want
    # the stamp is a dot-file: invisible to a fresh parquet read too
    assert sorted(map(tuple, spark.read.parquet(old_terms_path).collect())) == want

    # fresh readers resolve the NEW snapshot only
    new_terms_path = st._artifact_path("terms")
    assert new_terms_path != old_terms_path
    assert not st.published_stale() and not st.blocks_stale()

    # window not expired -> sweep is a no-op
    assert st.sweep_retired() == 0
    assert os.path.isdir(old_terms_path)

    # expire every stamp -> sweep deletes all retired dirs, live ones stay
    for r in _retired_dirs(st.base):
        _backdate(os.path.join(st.base, r, ".retired"), 7200)
    assert st.sweep_retired() == len(retired)
    assert not os.path.isdir(old_terms_path)
    assert os.path.isdir(new_terms_path)
    assert _retired_dirs(st.base) == []
    assert not st.published_stale() and not st.blocks_stale()


@pytest.mark.spark
def test_grace_no_name_reuse_after_lineage_reset(spark, tmp_path):
    """A full publish resets the delta lineage; without the ordinal floor
    the next publish_delta would write delta-000001 AGAIN and Spark's
    overwrite would replace the retired dir a reader may still be
    scanning.  With grace, the new delta must take a fresh name and the
    retired dir's bytes must be untouched; WAND through the new lineage
    stays exact."""
    st = IndexStore(spark, str(tmp_path / "store"), gc_grace_sec=3600)
    st.write_segment("seg-base", _df(spark, BASE_ROWS))
    st.publish(doc_span=16)
    st.write_segment("seg-u1", _df(spark, UPD_ROWS))
    info1 = st.publish_delta()
    assert info1["delta"] == "delta-000001"
    d1 = os.path.join(st.base, "blocks_delta", "delta-000001")
    sig_before = _tree_sig(d1)

    st.publish(doc_span=16)  # compaction: retires delta-000001 dirs
    assert os.path.isdir(d1) and os.path.exists(os.path.join(d1, ".retired"))

    # new delta after the reset: fresh ordinal, retired dir untouched
    rows2 = [(r[0] + 1000, r[1]) for r in UPD_ROWS]
    st.write_segment("seg-u2", _df(spark, rows2))
    info2 = st.publish_delta()
    assert info2["delta"] != "delta-000001"
    assert info2["delta"] == "delta-000002"
    assert _tree_sig(d1) == sig_before
    # reads through the new lineage are exact
    assert not st.blocks_stale()
    rows = _wand_rows(spark, st, ["common", "unicorn", "padding"])
    assert rows  # non-empty and derived without error


@pytest.mark.spark
def test_grace_zero_is_bit_identical_to_historical_behavior(spark, tmp_path):
    """Default stores never leave retired dirs behind: after the same
    publish -> delta -> publish sequence, no .retired stamps exist and the
    superseded version dirs are gone at the commit."""
    st = IndexStore(spark, str(tmp_path / "store"))
    st.write_segment("seg-base", _df(spark, BASE_ROWS))
    st.publish(doc_span=16)
    old_terms = st._artifact_path("terms")
    st.write_segment("seg-upd", _df(spark, UPD_ROWS))
    st.publish_delta()
    st.publish(doc_span=16)
    assert not os.path.isdir(old_terms)
    assert _retired_dirs(st.base) == []
    assert st.sweep_retired() == 0


@pytest.mark.spark
def test_grace_compact_retires_superseded_segments(spark, tmp_path):
    """Segment compaction under grace: the ledger row disappears at the
    commit (fresh readers resolve only the compacted segment) but the old
    segment dir survives as a stamped orphan until the sweep."""
    st = IndexStore(spark, str(tmp_path / "store"), gc_grace_sec=3600)
    st.write_segment("seg-a", _df(spark, BASE_ROWS))
    st.write_segment("seg-b", _df(spark, UPD_ROWS))
    old_paths = [st.segment_path("seg-a"), st.segment_path("seg-b")]
    st.compact()
    assert all(os.path.isdir(p) for p in old_paths)
    assert all(os.path.exists(os.path.join(p, ".retired")) for p in old_paths)
    ids = {r["segment_id"] for r in st.ledger()}
    assert "seg-a" not in ids and "seg-b" not in ids
    for p in old_paths:
        _backdate(os.path.join(p, ".retired"), 7200)
    assert st.sweep_retired() == 2
    assert not any(os.path.isdir(p) for p in old_paths)


@pytest.mark.spark
@pytest.mark.slow
def test_schedule_fuzz_under_grace_window(spark, tmp_path):
    """The round-5 schedule fuzz re-run with a grace window: the same
    random ingest/update/late-commit/delta/full/compact interleavings must
    converge to the identical published state (the helper asserts
    twin-equality and WAND exactness per seed), retired dirs accumulate
    instead of vanishing, no live artifact dir carries a stamp, and an
    expired sweep deletes every retired dir while leaving all published
    reads bit-identical."""
    (st,) = _run_schedule_fuzz(spark, tmp_path, (11,), gc_grace_sec=3600)
    retired = _retired_dirs(st.base)
    assert retired  # the schedule definitely superseded something
    # no LIVE (meta-referenced) dir may ever carry a stamp
    meta = st._meta()
    live = [st._artifact_path(k, meta)
            for k in ("terms", "docstats", "blocks", "doclen_blocks")]
    for p in live:
        if os.path.isdir(p):
            assert not os.path.exists(os.path.join(p, ".retired")), p
    before_terms = sorted(
        (r.term, r.df, r.cf) for r in st.published_terms().collect()
    )
    for r in retired:
        _backdate(os.path.join(st.base, r, ".retired"), 7200)
    assert st.sweep_retired() == len(retired)
    assert _retired_dirs(st.base) == []
    assert not st.published_stale() and not st.blocks_stale()
    assert sorted(
        (r.term, r.df, r.cf) for r in st.published_terms().collect()
    ) == before_terms


@pytest.mark.spark
def test_cli_sweep_is_sparkless_and_deletes_expired(spark, tmp_path, capsys):
    """`cli sweep` is the cron janitor: it must run without a
    SparkSession (IndexStore(None, ...) — pure fs walk) and delete
    exactly the expired retired dirs."""
    from elipdotter_spark.cli import main

    st = IndexStore(spark, str(tmp_path / "store"), gc_grace_sec=3600)
    st.write_segment("seg-base", _df(spark, BASE_ROWS))
    st.publish(doc_span=16)
    old_terms = st._artifact_path("terms")
    st.write_segment("seg-upd", _df(spark, UPD_ROWS))
    st.publish(doc_span=16)  # retires the v1 base dirs
    retired = _retired_dirs(st.base)
    assert retired

    # window not expired: sweep reports 0, dirs intact
    assert main(["sweep", "--index", st.base, "--gc-grace-sec", "3600"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["swept"] == 0 and os.path.isdir(old_terms)

    for r in retired:
        _backdate(os.path.join(st.base, r, ".retired"), 7200)
    assert main(["sweep", "--index", st.base, "--gc-grace-sec", "3600"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["swept"] == len(retired)
    assert not os.path.isdir(old_terms)
    assert _retired_dirs(st.base) == []


@pytest.mark.spark
def test_snapshot_pins_one_committed_state_across_publishes(spark, tmp_path):
    """store.snapshot(): every reader on the pinned view keeps answering
    from the SAME committed state while publishes land concurrently —
    terms, docstats, corpus stats, and wand tables can never mix two
    snapshots.  Fresh store-level reads see the new state immediately."""
    st = IndexStore(spark, str(tmp_path / "store"), gc_grace_sec=3600)
    st.write_segment("seg-base", _df(spark, BASE_ROWS))
    st.publish(doc_span=16)
    snap = st.snapshot()
    assert not snap.stale and not snap.blocks_stale
    terms_v1 = sorted(
        (r.term, r.df, r.cf) for r in snap.published_terms().collect()
    )
    n1, avgdl1 = snap.corpus_stats()

    # a publish lands "concurrently" (between the pin and the reads)
    st.write_segment("seg-upd", _df(spark, UPD_ROWS))
    st.publish_delta()
    st.publish(doc_span=16)

    # the pinned view is unchanged — same dict, same stats, wand tables
    # still derivable from the retired-but-unswept v1 dirs
    assert sorted(
        (r.term, r.df, r.cf) for r in snap.published_terms().collect()
    ) == terms_v1
    assert snap.corpus_stats() == (n1, avgdl1)
    comp, dlb = snap.wand_tables(snap.published_terms(), n1, avgdl1)
    assert comp.count() > 0 and dlb.count() > 0
    # "unicorn" only exists in BASE_ROWS doc 100, which UPD_ROWS replaced:
    # the pinned dict still has it; the fresh one does not
    assert any(t == "unicorn" for t, _df_, _cf in terms_v1)
    fresh_terms = {r.term for r in st.published_terms().collect()}
    assert "unicorn" not in fresh_terms
    n2, _ = st.corpus_stats()
    assert n2 != n1  # 20 new docs arrived
