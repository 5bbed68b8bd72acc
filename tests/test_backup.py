"""Consistent store backup (IndexStore.export_snapshot / cli backup).

The clone must BE a store: bit-identical published reads at the pinned
state, staleness preserved (export copies state, never publishes), source
garbage (orphans/claims/retired/tmps) invisible, interrupted commits
exported pre-repaired, and a copy raced by a concurrent publish discarded
and retried — never a torn mix of two snapshots.
"""

import json
import os
import shutil

import pytest

from elipdotter_spark.sources.catalog import IndexStore

from test_cli import cli  # noqa: F401  (in-process CLI fixture)
from test_round5_catalog import (  # noqa: F401  (shared fixtures/helpers)
    BASE_ROWS,
    UPD_ROWS,
    _df,
    _published_state,
    _wand_rows,
)

pytestmark = pytest.mark.spark


def _delta_store(spark, path):
    st = IndexStore(spark, path)
    st.write_segment("seg-base", _df(spark, BASE_ROWS))
    st.publish(doc_span=16)
    st.write_segment("seg-upd", _df(spark, UPD_ROWS))
    st.publish_delta()
    return st


def test_backup_clone_serves_identical_reads(spark, tmp_path):
    src = _delta_store(spark, str(tmp_path / "src"))
    dest = str(tmp_path / "clone")
    out = src.export_snapshot(dest)
    assert out["published"] and out["attempts"] == 1 and out["segments"] == 2
    clone = IndexStore(spark, dest)
    assert not clone.published_stale() and not clone.blocks_stale()
    assert _published_state(spark, clone) == _published_state(spark, src)
    assert _wand_rows(spark, clone, ["common", "fresh"]) == _wand_rows(
        spark, src, ["common", "fresh"]
    )
    assert clone.fsck()["ok"]
    # the clone is independent: ingesting into it leaves the source alone
    clone.write_segment("seg-more", _df(spark, [(999, "brand new words")]))
    assert clone.published_stale() and not src.published_stale()


def test_backup_skips_garbage_and_preserves_staleness(spark, tmp_path):
    src = _delta_store(spark, str(tmp_path / "src"))
    # make the source stale (uncovered segment) + plant every garbage kind
    src.write_segment("seg-uncovered", _df(spark, [(500, "stale maker")]))
    os.makedirs(os.path.join(src.base, "segments", "orphan-dir"))
    open(
        os.path.join(src.base, "segments", "orphan-dir", "junk.bin"), "w"
    ).write("x")
    os.makedirs(os.path.join(src.base, "terms-v99"))  # unreferenced artifact
    dest = str(tmp_path / "clone")
    src.export_snapshot(dest)
    clone = IndexStore(spark, dest)
    assert clone.published_stale()  # staleness travels with the state
    assert sorted(clone.completed_segments()) == sorted(
        src.completed_segments()
    )
    assert not os.path.exists(os.path.join(dest, "segments", "orphan-dir"))
    assert not os.path.exists(os.path.join(dest, "terms-v99"))
    assert not any(
        f.startswith(".seq-") for f in os.listdir(os.path.join(dest, "ledger"))
    )
    # live derivation over the clone picks up the uncovered segment
    assert clone.fsck()["ok"]


def test_backup_exports_interrupted_commit_repaired(spark, tmp_path):
    src = _delta_store(spark, str(tmp_path / "src"))
    # simulate a crash between ledger row and rename: final -> tmp
    row = [r for r in src.ledger() if r["segment_id"] == "seg-upd"][0]
    final = src.segment_path("seg-upd")
    os.rename(final, f"{final}.tmp-{row['seq']}")
    dest = str(tmp_path / "clone")
    out = src.export_snapshot(dest)
    assert out["segments"] == 2
    assert os.path.isdir(os.path.join(dest, "segments", "seg-upd"))
    clone = IndexStore(spark, dest)
    assert clone.fsck()["ok"]
    assert _wand_rows(spark, clone, ["fresh"]) == _wand_rows(
        spark, IndexStore(spark, str(tmp_path / "src")), ["fresh"]
    )


def test_backup_retries_on_concurrent_publish(spark, tmp_path, monkeypatch):
    """A meta that changes mid-copy voids the attempt; a stable second
    attempt succeeds; a permanently-hot store raises after the budget."""
    src = _delta_store(spark, str(tmp_path / "src"))
    real_raw = IndexStore._meta_raw
    calls = {"n": 0}

    def flappy(self):
        calls["n"] += 1
        # pin-read then verify-read per attempt: make attempt 1's verify
        # disagree with its pin, then read stable
        if calls["n"] == 2:
            return b'{"changed": true}'
        return real_raw(self)

    monkeypatch.setattr(IndexStore, "_meta_raw", flappy)
    dest = str(tmp_path / "clone")
    out = src.export_snapshot(dest)
    assert out["attempts"] == 2
    clone = IndexStore(spark, dest)
    assert _published_state(spark, clone) == _published_state(spark, src)

    monkeypatch.setattr(
        IndexStore, "_meta_raw", lambda self: json.dumps(
            {"nonce": calls.__setitem__("n", calls["n"] + 1) or calls["n"]}
        ).encode()
    )
    with pytest.raises(ValueError, match="no stable state"):
        src.export_snapshot(str(tmp_path / "never"))
    assert not os.path.exists(str(tmp_path / "never"))
    assert not os.path.exists(str(tmp_path / "never") + ".tmp-export")


def test_backup_refuses_existing_dest(spark, tmp_path):
    src = _delta_store(spark, str(tmp_path / "src"))
    dest = str(tmp_path / "clone")
    src.export_snapshot(dest)
    with pytest.raises(OSError):
        src.export_snapshot(dest)


def test_cli_backup(cli, tmp_path, capsys, sf_dir):
    idx = str(tmp_path / "idx")
    assert cli.main([
        "build", "--input", f"{sf_dir}/documents.parquet",
        "--output", idx, "--segments", "2",
    ]) == 0
    dest = str(tmp_path / "bak")
    assert cli.main(["backup", "--index", idx, "--dest", dest]) == 0
    out = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
           if l.startswith("{")][-1]
    assert out["published"] and out["segments"] == 2 and out["bytes"] > 0
    assert cli.main(["fsck", "--index", dest]) == 0
