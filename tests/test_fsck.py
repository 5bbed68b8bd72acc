"""fsck: the Sparkless integrity verifier detects every corruption class
the commit protocol is supposed to prevent, and stays quiet (ok=True) on
every legitimate store state — fresh, delta-published, interrupted-but-
recoverable, grace-GC-pending.
"""

import json
import os
import shutil

import pytest

from elipdotter_spark.sources.catalog import IndexStore

from test_round5_catalog import BASE_ROWS, UPD_ROWS, _df  # noqa: F401


@pytest.fixture()
def store(spark, tmp_path):
    st = IndexStore(spark, str(tmp_path / "idx"))
    st.write_segment("seg-base", _df(spark, BASE_ROWS))
    st.publish(doc_span=16)
    return st


def _first_parquet(path):
    for root, _d, files in os.walk(path):
        for f in sorted(files):
            if f.endswith(".parquet"):
                return os.path.join(root, f)
    raise AssertionError(f"no parquet under {path}")


@pytest.mark.spark
def test_fsck_clean_store_ok(store):
    out = store.fsck(deep=True)
    assert out["ok"], out
    assert out["errors"] == [] and out["warnings"] == []
    assert out["checked"]["parquet_files"] > 0
    assert out["checked"]["rows"] > 0


@pytest.mark.spark
def test_fsck_delta_store_ok(spark, store):
    store.write_segment("seg-upd", _df(spark, UPD_ROWS))
    store.publish_delta()
    out = store.fsck(deep=True)
    assert out["ok"], out
    assert out["errors"] == []
    # deep counter check legitimately skipped on a delta-published store
    assert any("skipped" in i for i in out["info"])


@pytest.mark.spark
def test_fsck_detects_truncated_artifact(store):
    meta = store._meta()
    blocks = store._artifact_path("blocks", meta)
    fp = _first_parquet(blocks)
    with open(fp, "r+b") as fh:
        fh.truncate(max(os.path.getsize(fp) // 2, 8))
    out = store.fsck()
    assert not out["ok"]
    assert any("corrupt parquet" in e and "blocks" in e for e in out["errors"])


@pytest.mark.spark
def test_fsck_detects_missing_referenced_artifact(store):
    shutil.rmtree(store._artifact_path("terms", store._meta()))
    out = store.fsck()
    assert not out["ok"]
    assert any("terms" in e and "missing dir" in e for e in out["errors"])


@pytest.mark.spark
def test_fsck_detects_missing_delta_dir(spark, store):
    store.write_segment("seg-upd", _df(spark, UPD_ROWS))
    store.publish_delta()
    nm = store._blocks_delta_names(store._meta())[0]
    shutil.rmtree(os.path.join(store.base, "blocks_delta", nm))
    out = store.fsck()
    assert not out["ok"]
    assert any("blocks_delta" in e for e in out["errors"])


@pytest.mark.spark
def test_fsck_detects_lost_segment_vs_recoverable_tmp(spark, store):
    # recoverable: final renamed back to the seq-named tmp (the
    # interrupted write-ahead commit _recover_segments repairs)
    row = [r for r in store.ledger() if r["segment_id"] == "seg-base"][0]
    final = store.segment_path("seg-base")
    tmp = f"{final}.tmp-{row['seq']}"
    os.rename(final, tmp)
    out = store.fsck()
    assert out["ok"], out
    assert any("recoverable" in w for w in out["warnings"])
    # lost: neither final nor tmp, and no compacted successor
    shutil.rmtree(tmp)
    out = store.fsck()
    assert not out["ok"]
    assert any("data loss" in e for e in out["errors"])


@pytest.mark.spark
def test_fsck_compact_shadowed_row_is_warning(spark, store):
    store.write_segment("seg-upd", _df(spark, UPD_ROWS))
    store.compact()
    # simulate the documented compact-crash leftover: compact() deletes the
    # superseded dir BEFORE its ledger row — re-create the row a crash in
    # that window leaves behind (shadowed by the seg-compact segment)
    live = store.ledger()[0]
    leftover = {**live, "segment_id": "seg-base", "seq": 0}
    with open(store._ledger_path("seg-base"), "w") as fh:
        json.dump(leftover, fh)
    assert not os.path.isdir(store.segment_path("seg-base"))
    out = store.fsck()
    assert out["ok"], out
    assert any("shadowed" in w for w in out["warnings"])


@pytest.mark.spark
def test_fsck_detects_coverage_beyond_ledger(store):
    mp = os.path.join(store.base, "blocks_meta.json")
    meta = json.load(open(mp))
    meta["covered_seqs"] = sorted(set(meta["covered_seqs"]) | {99})
    json.dump(meta, open(mp, "w"))
    out = store.fsck()
    assert not out["ok"]
    assert any("covered_seqs" in e and "99" in e for e in out["errors"])


@pytest.mark.spark
def test_fsck_classifies_orphan_and_retired_dirs(spark, tmp_path):
    st = IndexStore(spark, str(tmp_path / "gidx"), gc_grace_sec=3600)
    st.write_segment("seg-base", _df(spark, BASE_ROWS))
    st.publish(doc_span=16)
    st.publish(doc_span=16)  # supersedes v1 artifacts -> retired stamps
    out = st.fsck()
    assert out["ok"], out
    assert out["checked"]["retired_pending"] > 0
    # an unstamped unreferenced version dir = crash leftover -> warning
    orphan = os.path.join(st.base, "terms-v999999")
    os.makedirs(orphan)
    out = st.fsck()
    assert out["ok"]
    assert out["checked"]["orphans"] == 1
    assert any("terms-v999999" in w for w in out["warnings"])


@pytest.mark.spark
def test_fsck_deep_detects_counter_drift(store):
    mp = os.path.join(store.base, "blocks_meta.json")
    meta = json.load(open(mp))
    meta["corpus_stats"]["n"] = int(meta["corpus_stats"]["n"]) + 7
    json.dump(meta, open(mp, "w"))
    assert store.fsck()["ok"]  # shallow can't see it
    out = store.fsck(deep=True)
    assert not out["ok"]
    assert any("counter drift" in e for e in out["errors"])


@pytest.mark.spark
def test_fsck_detects_corrupt_meta(store):
    with open(os.path.join(store.base, "blocks_meta.json"), "w") as fh:
        fh.write("{not json")
    out = store.fsck()
    assert not out["ok"]
    assert any("unparseable" in e for e in out["errors"])


@pytest.mark.spark
def test_repair_completes_interrupted_commit(spark, store):
    """store.repair() / cli fsck --repair: the interrupted write-ahead
    commit (ledger row + seq-named tmp, final missing) is completed
    offline; queries serve the repaired segment; a clean store repairs
    nothing; orphan dirs are left alone."""
    row = [r for r in store.ledger() if r["segment_id"] == "seg-base"][0]
    final = store.segment_path("seg-base")
    tmp = f"{final}.tmp-{row['seq']}"
    os.rename(final, tmp)

    rep = store.repair()
    assert rep["recovered_segments"] == ["seg-base"]
    assert os.path.isdir(final) and not os.path.exists(tmp)
    out = store.fsck()
    assert out["ok"] and not any("recoverable" in w for w in out["warnings"])

    # idempotent: nothing left to repair
    assert store.repair()["recovered_segments"] == []

    # orphans are NOT touched (could be a concurrent publisher's in-flight
    # artifact dir, unreferenced until its meta commit)
    orphan = os.path.join(store.base, "blocks-v999999")
    os.makedirs(orphan)
    assert store.repair()["recovered_segments"] == []
    assert os.path.isdir(orphan)


@pytest.mark.spark
def test_cli_fsck_repair(spark, store, monkeypatch, capsys):
    import elipdotter_spark.cli as cli_mod

    monkeypatch.setattr(cli_mod, "get_spark", lambda: spark)
    row = [r for r in store.ledger() if r["segment_id"] == "seg-base"][0]
    final = store.segment_path("seg-base")
    os.rename(final, f"{final}.tmp-{row['seq']}")

    assert cli_mod.main(["fsck", "--index", store.base, "--repair"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"] and out["repaired"]["recovered_segments"] == ["seg-base"]
    assert os.path.isdir(final)
