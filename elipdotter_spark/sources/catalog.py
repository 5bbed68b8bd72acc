"""Parquet-backed index store: segments, ledger, resumable builds.

North-rule requirements implemented here:
- the index is built in **segments** (hash-of-doc partitions of the corpus),
  each written atomically (tmp dir + write-ahead ledger commit) and recorded
  in a **ledger** with lineage + build metrics: postings count, bytes,
  postings/sec, skew ratio (hottest term df / mean df), wall ms;
- a build killed between segments **resumes** from the ledger — completed
  segments are skipped, and the final index is identical to an uninterrupted
  build (tests/test_catalog.py kills and resumes);
- ``publish()`` derives the dictionary (terms) and docstats side-tables from
  the union of segments; ``publish_delta()`` refreshes every published
  artifact with cost proportional to the DELTA, committing atomically
  through the single ``blocks_meta.json`` write.

Commit protocol (round 5):
- **Segments** use a WRITE-AHEAD ledger commit: the O_EXCL ledger row lands
  BEFORE the tmp->final rename.  Of two writers racing one segment id,
  the loser fails at the row and never touches the winner's data (the
  round-4 ordering had a TOCTOU window where a racer could classify the
  winner's just-renamed dir as a crash orphan and delete it).  A crash
  between row and rename is repaired by :meth:`_recover_segments` (the
  row records the seq, which names the tmp dir).
- **Publish coverage is a seq SET, not a max.**  ``write_segment`` claims
  its seq BEFORE the (possibly minutes-long) Spark build, so a slow writer
  can commit a LOWER seq after a faster writer's higher seq was committed
  and published.  A max-based stamp would mark that late segment covered
  forever — silent data loss.  ``blocks_meta.json`` therefore records the
  exact set of covered seqs per artifact family; staleness is set
  inequality, and ``publish_delta`` picks up exactly the uncovered
  segments (holes included).
- **``publish_delta`` is crash-atomic.**  All delta artifacts — posting
  blocks, doclen blocks, and (new in round 5) the NARROW terms/docstats
  delta segments — are written as unreferenced immutable directories;
  readers resolve only segments named in the meta, so a crash before the
  final atomic meta write leaves the published index bit-identical to the
  pre-publish state and a retry recomputes from that unchanged baseline
  (the round-4 read-modify-write terms rewrite could double-apply its
  df/cf adjustment on retry, silently unsounding WAND bounds).
- **Full ``publish()`` is crash-atomic too (round 6).**  Base artifacts
  are written as VERSIONED unreferenced dirs (``terms-v<N>``,
  ``blocks-v<N>``, ...) named in the meta's ``artifact_dirs`` and swapped
  at the same single meta commit; superseded versions are GC'd after the
  commit.  With ``gc_grace_sec`` > 0 that GC is TWO-PHASE (stamp
  ``.retired``, delete after the window via :meth:`sweep_retired`), so
  readers mid-scan on the previous snapshot are not broken by a
  concurrent publish — the snapshot-expiration discipline a multi-reader
  cluster needs; new segment ordinals are floored past retired dirs so a
  lingering dir is never name-reused and overwritten.  This matters precisely on the already-covered
  lineage-compaction path (``maybe_publish_full``, auto-run by ``cli
  ingest``), where the round-5 in-place rewrite could crash mid-job and
  leave ``blocks_stale() == False`` over a half-written base directory —
  corrupt blocks served as fresh.

On a production cluster the same layout maps 1:1 to an Iceberg table
(segments -> snapshots/partitions, ledger -> a metrics table written in the
same transaction, the meta commit -> snapshot swap, seq claims + covered
sets -> optimistic snapshot commit); this container has no Iceberg runtime,
so the store uses plain parquet directories with atomic renames — the
checkpoint/resume/commit semantics are the point, not the table format.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import List, Optional, Set, Tuple

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import index_build

LEDGER_SCHEMA = (
    "segment_id string, status string, n_docs long, n_postings long, "
    "bytes long, postings_per_sec double, skew_ratio double, wall_ms long, "
    "seq long, doc_digest long"
)

TERMS_SCHEMA = "term string, df long, cf long, first string"
DOCSTATS_SCHEMA = "doc_id long, doc_len long"


def content_digest(docs: DataFrame) -> tuple:
    """(row_count, order-insensitive content hash) over ALL columns — one
    scalar row per side, computed in-plan (never a collect of row sets).
    ``bit_xor`` of per-row xxhash64 is commutative and overflow-free (ANSI
    mode sums would throw on 64-bit hash sums); the count catches the xor
    blind spot of a value appearing an even number of times."""
    row = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            "bit_xor(xxhash64({}))".format(", ".join(f"`{c}`" for c in docs.columns))
        ).alias("h"),
    ).collect()[0]
    return int(row.n), (int(row.h) if row.h is not None else 0)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


class IndexStore:
    def __init__(self, spark: SparkSession, base: str, gc_grace_sec: float = 0.0):
        self.spark = spark
        self.base = base
        # ``gc_grace_sec`` > 0 switches superseded-artifact GC to a
        # two-phase retire: a reader that resolved the OLD meta (or an
        # old ledger listing) and is mid-scan keeps its files for the
        # grace window instead of having them rmtree'd from under it by
        # a concurrent publish/compact (the snapshot-expiration race; on
        # a 1000-executor cluster every full publish would otherwise kill
        # in-flight queries on the previous snapshot).  0 (default)
        # deletes immediately — right for single-process/local use and
        # the historical behavior; on a cluster set it to at least the
        # max expected query duration.
        self.gc_grace_sec = gc_grace_sec
        os.makedirs(os.path.join(base, "segments"), exist_ok=True)
        os.makedirs(os.path.join(base, "ledger"), exist_ok=True)

    # sentinel for "resolve the current meta" defaults (defined up here so
    # every reader signature below can reference it)
    _UNREAD = object()

    # --------------------------------------------------- two-phase GC

    _RETIRED = ".retired"

    def _retire_dir(self, path: str) -> None:
        """Supersede-GC a no-longer-referenced directory.  Immediate
        rmtree when ``gc_grace_sec`` == 0; otherwise stamp the dir
        ``.retired`` (dot-file — invisible to parquet readers) and leave
        deletion to :meth:`sweep_retired` once the grace window passes.
        The stamp is idempotent and records the SUPERSEDE time, not the
        write time — a dir written long ago but retired a second ago
        still gets the full window."""
        if not os.path.isdir(path):
            return
        if self.gc_grace_sec <= 0:
            shutil.rmtree(path)
            return
        stamp = os.path.join(path, self._RETIRED)
        if not os.path.exists(stamp):
            with open(stamp, "w") as fh:
                json.dump({"ts": time.time()}, fh)

    def _lingering_ordinal(self, prefix: str) -> int:
        """Highest RETIRED ``<prefix><NNNNNN>`` ordinal still on disk in
        any delta family dir.  New delta / merge segment ordinals are
        floored past this so a grace-window store never name-reuses (and
        thereby Spark-OVERWRITES) a retired dir an in-flight reader may
        still be scanning: a full publish resets the delta lineage, and
        without the floor the next ``publish_delta`` would write
        ``delta-000001`` again.  Only STAMPED dirs count: an unstamped
        leftover with no meta reference is a crashed publish/merge that no
        reader ever resolved (the meta is the only way in), and the retry
        must converge on the SAME name it was going to use — the
        kill-matrix twin-equality contract.  With ``gc_grace_sec`` == 0
        nothing is ever stamped, so the floor is a no-op and ordinals
        stay dense (the historical names)."""
        import re

        pat = re.compile(re.escape(prefix) + r"(\d{6})$")
        hi = 0
        for fam in ("terms_delta", "docstats_delta", "blocks_delta", "doclen_delta"):
            d = os.path.join(self.base, fam)
            if not os.path.isdir(d):
                continue
            for nm in os.listdir(d):
                m = pat.match(nm)
                if m and os.path.exists(os.path.join(d, nm, self._RETIRED)):
                    hi = max(hi, int(m.group(1)))
        return hi

    def sweep_retired(self) -> int:
        """Delete retired directories whose grace window has expired;
        returns the number deleted.  Swept namespaces are exactly the
        ones :meth:`_retire_dir` is applied to: top-level base-artifact
        dirs, the per-publish subdirs of the four ``*_delta`` families,
        and ``segments/*``.  Every publish/compact calls this, so retired
        dirs die without any external scheduler; it is also public for
        cron-style cleanup on read-mostly stores."""
        if self.gc_grace_sec <= 0:
            return 0
        cutoff = time.time() - self.gc_grace_sec
        roots = [self.base, os.path.join(self.base, "segments")]
        for fam in ("terms_delta", "docstats_delta", "blocks_delta", "doclen_delta"):
            roots.append(os.path.join(self.base, fam))
        deleted = 0
        for root in roots:
            if not os.path.isdir(root):
                continue
            for entry in os.listdir(root):
                stamp = os.path.join(root, entry, self._RETIRED)
                try:
                    with open(stamp) as fh:
                        ts = json.load(fh).get("ts", 0)
                except (OSError, ValueError):
                    continue
                if ts <= cutoff:
                    shutil.rmtree(os.path.join(root, entry), ignore_errors=True)
                    deleted += 1
        return deleted

    # ------------------------------------------------------------- ledger

    def _ledger_path(self, segment_id: str) -> str:
        return os.path.join(self.base, "ledger", f"{segment_id}.json")

    def ledger(self) -> List[dict]:
        out = []
        d = os.path.join(self.base, "ledger")
        for f in sorted(os.listdir(d)):
            if f.endswith(".json"):
                with open(os.path.join(d, f)) as fh:
                    out.append(json.load(fh))
        return out

    def ledger_df(self) -> DataFrame:
        # legacy rows lack seq / doc_digest
        rows = [{"seq": None, "doc_digest": None, **r} for r in self.ledger()]
        if not rows:
            return self.spark.createDataFrame([], schema=LEDGER_SCHEMA)
        return self.spark.createDataFrame(rows, schema=LEDGER_SCHEMA)

    def _next_seq(self) -> int:
        """Monotonic segment sequence: max recorded seq + 1.  Legacy ledger
        rows (written before seq was recorded) count as their insertion
        index; additionally, if any row lacks a recorded seq, the actual
        segment parquet is consulted for stamped seqs — a store compacted by
        code that stamped parquet but not the ledger would otherwise hand
        out a LOWER seq and silently break latest-wins for later updates.
        Outstanding seq CLAIMS (concurrent writers that claimed a number but
        have not committed their ledger row yet) count as taken, so
        monotonicity holds across the claim->commit window."""
        rows = self.ledger()
        base = max(self._seq_claims(), default=-1)
        if not rows:
            return base + 1
        seqs = [r.get("seq") for r in rows]
        base = max(base, max((s for s in seqs if s is not None), default=-1))
        if any(s is None for s in seqs):
            base = max(base, len(rows) - 1)
            try:
                p = self.postings()
                if "seq" in p.columns:
                    m = p.agg(F.max("seq")).collect()[0][0]
                    if m is not None:
                        base = max(base, int(m))
            except FileNotFoundError:
                pass
        return base + 1

    def _seq_claims(self) -> List[int]:
        d = os.path.join(self.base, "ledger")
        out = []
        for f in os.listdir(d):
            if f.startswith(".seq-") and f.endswith(".claim"):
                try:
                    out.append(int(f[len(".seq-") : -len(".claim")]))
                except ValueError:
                    pass
        return out

    def _claim_seq(self) -> int:
        """Atomically claim the next segment seq (multi-writer safety).

        Concurrent ingest drivers against one store are the normal shape of
        a web-scale pipeline; a bare read-max-then-increment lets two of
        them mint the SAME seq and silently corrupt latest-wins (a later
        update could lose to an earlier one).  Writers therefore race on an
        ``O_CREAT|O_EXCL`` create of a seq-named marker file — the
        filesystem guarantees exactly one winner per number; losers retry
        the next number.  A claim is never deleted: a claimant that crashes
        before committing its ledger row just burns one integer (seqs only
        need to be monotonic, not dense), and :meth:`_next_seq` counts
        outstanding claims so later writers start above them.  A claim that
        commits AFTER a publish covered higher seqs is caught by the
        set-based coverage stamps (:meth:`published_stale`).  On Iceberg
        this whole mechanism is subsumed by optimistic snapshot commit."""
        n = self._next_seq()
        d = os.path.join(self.base, "ledger")
        while True:
            path = os.path.join(d, f".seq-{n:020d}.claim")
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                n += 1
                continue
            os.close(fd)
            return n

    def completed_segments(self) -> List[str]:
        return [r["segment_id"] for r in self.ledger() if r["status"] == "done"]

    def _committed_seqs(self) -> Set[int]:
        """Seqs of all committed (done) ledger rows; legacy no-seq rows are
        excluded on BOTH sides of every coverage comparison, so they cancel
        (a legacy-only store reads as fresh exactly as the old max-based
        stamps said)."""
        return {
            r["seq"]
            for r in self.ledger()
            if r["status"] == "done" and r.get("seq") is not None
        }

    # ------------------------------------------------------------ segments

    def segment_path(self, segment_id: str) -> str:
        return os.path.join(self.base, "segments", segment_id)

    def _recover_segments(self) -> None:
        """Complete write-ahead commits interrupted between the ledger row
        and the tmp->final rename: the row's recorded seq names the tmp dir
        (``<final>.tmp-<seq>``), so recovery is one rename.  A row whose
        final AND tmp are both missing is tolerated silently only because
        compact() deletes superseded segment dirs before their ledger rows
        (a crash in between leaves such a row, shadowed by the compacted
        segment).  Racing recoverers are safe: rename is atomic and the
        loser's failure is swallowed only when the final now exists."""
        for r in self.ledger():
            if r.get("status") != "done" or r.get("seq") is None:
                continue
            final = self.segment_path(r["segment_id"])
            if os.path.exists(final):
                continue
            tmp = f"{final}.tmp-{r['seq']}"
            if os.path.exists(tmp):
                try:
                    os.rename(tmp, final)
                except OSError:
                    if not os.path.exists(final):
                        raise

    def repair(self) -> dict:
        """Offline (Sparkless) repair of the one crash class repairable
        without Spark: write-ahead commits interrupted between the ledger
        row and the tmp->final rename — one atomic rename each (the same
        recovery every reader runs via :meth:`_recover_segments`; racing
        recoverers/writers are tolerated identically).

        Deliberately does NOT touch orphan dirs: an unstamped unreferenced
        dir can be a CONCURRENT publisher's in-flight artifact
        (unreferenced until its single meta commit) — deleting it offline
        would destroy a live publish.  Retired dirs die via
        :meth:`sweep_retired`; true crash orphans via the next publish's
        internal sweep.

        Returns ``{"recovered_segments": [segment_ids...]}`` — the rows
        whose data dir exists after repair but did not before."""
        recoverable = []
        for r in self.ledger():
            if r.get("status") != "done" or r.get("seq") is None:
                continue
            final = self.segment_path(r["segment_id"])
            if not os.path.exists(final) and os.path.exists(
                f"{final}.tmp-{r['seq']}"
            ):
                recoverable.append(r["segment_id"])
        self._recover_segments()
        return {
            "recovered_segments": [
                s for s in recoverable
                if os.path.exists(self.segment_path(s))
            ]
        }

    # ------------------------------------------------------------- backup

    def _snapshot_manifest(self, meta: Optional[dict], rows: List[dict]):
        """(copy_list, ledger_rows) for one committed store state: every
        base-relative dir a reader of that state can touch — committed
        segment dirs (tmp-recovered like :meth:`repair` when the final is
        missing) plus the meta-referenced artifact + delta-family dirs
        (the same enumeration :meth:`fsck` checks).  Orphans, claims,
        retired dirs and in-flight tmps are invisible to readers and are
        deliberately NOT part of a snapshot."""
        copies: List[Tuple[str, str]] = []  # (src_rel, dest_rel)
        led = []
        for r in rows:
            if r.get("status") != "done":
                continue
            rel = os.path.join("segments", r["segment_id"])
            final = os.path.join(self.base, rel)
            if os.path.exists(final):
                copies.append((rel, rel))
            elif r.get("seq") is not None and os.path.exists(
                f"{final}.tmp-{r['seq']}"
            ):
                copies.append((f"{rel}.tmp-{r['seq']}", rel))
            else:
                raise ValueError(
                    f"export: committed segment {r['segment_id']} has no "
                    "data dir and no recoverable tmp — run fsck"
                )
            led.append(r)
        if meta is not None:
            narrow_cov = self._covered(meta, "covered_seqs", "max_seq")
            blocks_cov = self._covered(
                meta, "blocks_covered_seqs", "blocks_max_seq"
            )
            for kind in self._ARTIFACT_KINDS:
                cov = narrow_cov if kind in ("terms", "docstats") else blocks_cov
                if cov is None:
                    continue  # family never published
                rel = os.path.relpath(self._artifact_path(kind, meta), self.base)
                copies.append((rel, rel))
            fams = {
                "terms_delta": self._narrow_delta_names(meta),
                "docstats_delta": self._narrow_delta_names(meta),
                "blocks_delta": self._blocks_delta_names(meta),
                "doclen_delta": self._blocks_delta_names(meta),
            }
            for fam, names in fams.items():
                for nm in names:
                    rel = os.path.join(fam, nm)
                    copies.append((rel, rel))
        return copies, led

    def export_snapshot(self, dest: str, retries: int = 3) -> dict:
        """Consistent, self-contained clone of ONE committed store state
        into ``dest`` (Sparkless, like fsck/sweep/repair) — the
        backup/DR/promote-to-serving primitive: the clone IS an IndexStore
        (open it with ``IndexStore(spark, dest)``), serving bit-identical
        reads to the pinned source state, including staleness (export
        copies state; it never publishes).

        Consistency protocol: pin the meta bytes, enumerate the manifest
        (committed segments + meta-referenced artifacts), copy, then
        VERIFY the meta bytes are unchanged and every copied source dir
        still exists — a concurrent publish/compact/GC that landed
        mid-copy means some copied dir may be a torn mix of two versions,
        so the attempt is discarded and retried against the new state
        (bounded by ``retries``; pair with ``gc_grace_sec`` >= the export
        duration on hot stores so source dirs outlive the copy).  The
        dest meta is written LAST from the pinned bytes: a crashed export
        leaves a store whose copied segments read via live derivation,
        never a store claiming artifacts it doesn't have.  Interrupted
        source segment commits (ledger row + tmp, no final) are exported
        pre-repaired.  On Iceberg this is snapshot-pinned file copy /
        ``expire_snapshots``-aware replication, per the module mapping."""
        last_err = None
        for _attempt in range(1, retries + 1):
            raw = self._meta_raw()
            meta = json.loads(raw) if raw is not None else None
            try:
                copies, led = self._snapshot_manifest(meta, self.ledger())
            except ValueError as e:
                last_err = str(e)
                continue
            stage = dest + ".tmp-export"
            if os.path.exists(stage):
                shutil.rmtree(stage)
            os.makedirs(os.path.join(stage, "segments"))
            os.makedirs(os.path.join(stage, "ledger"))
            try:
                n_bytes = 0
                for src_rel, dest_rel in copies:
                    src = os.path.join(self.base, src_rel)
                    shutil.copytree(src, os.path.join(stage, dest_rel))
                    n_bytes += _dir_bytes(os.path.join(stage, dest_rel))
            except (OSError, shutil.Error) as e:
                # a concurrent GC deleted a dir mid-copy — torn attempt
                shutil.rmtree(stage, ignore_errors=True)
                last_err = f"copy raced a concurrent writer: {e}"
                continue
            torn = self._meta_raw() != raw or any(
                not os.path.exists(os.path.join(self.base, s))
                for s, _ in copies
            )
            if torn:
                shutil.rmtree(stage, ignore_errors=True)
                last_err = "meta or manifest changed during copy"
                continue
            for r in led:
                with open(
                    os.path.join(stage, "ledger", f"{r['segment_id']}.json"),
                    "w",
                ) as fh:
                    json.dump(r, fh)
            if raw is not None:  # meta last: the export's own commit point
                with open(os.path.join(stage, "blocks_meta.json"), "wb") as fh:
                    fh.write(raw)
            os.rename(stage, dest)  # one atomic publish of the whole clone
            return {
                "segments": len(led),
                "artifact_dirs": len(copies) - len(led),
                "bytes": n_bytes,
                "attempts": _attempt,
                "published": raw is not None,
            }
        raise ValueError(
            f"export_snapshot: no stable state after {retries} attempts "
            f"(last: {last_err}) — raise retries or export under "
            "gc_grace_sec / a quiesced writer"
        )

    def write_segment(self, segment_id: str, docs: DataFrame) -> dict:
        """Build + atomically commit one segment, record ledger metrics.

        Each segment is stamped with a monotonic ``seq`` (claim order):
        re-ingesting a document in a later segment *updates* it —
        :meth:`compacted_postings` keeps only the doc's latest version (the
        reference's S7 delete + re-digest, src/index.rs:1100-1104 +
        insert).

        Commit order is WRITE-AHEAD: the O_EXCL ledger row is the commit
        point and lands BEFORE the tmp->final rename.  Two writers racing
        one segment id resolve at the row — the loser cleans up its tmp and
        raises without ever touching the winner's data (the rename-first
        ordering had a window where the loser could classify the winner's
        just-renamed dir as a crash orphan and delete it, leaving the
        ledger describing the wrong parquet).  A crash between row and
        rename is repaired by :meth:`_recover_segments` on the next read."""
        if os.path.exists(self._ledger_path(segment_id)):
            # a COMMITTED segment must never be silently clobbered by
            # segment-id reuse
            raise ValueError(
                f"segment {segment_id!r} is already committed (ledger row"
                " exists); refusing to overwrite — ingest under a new"
                " segment id (updates win by seq) or compact() first"
            )
        t0 = time.perf_counter()
        seq = self._claim_seq()  # atomic: concurrent writers get distinct seqs
        postings = index_build.build_postings(docs).withColumn(
            "seq", F.lit(seq).cast("long")
        )
        final = self.segment_path(segment_id)
        # tmp dir is per-claim (seq is writer-unique), so two concurrent
        # writers racing on the same segment id never clobber each other's
        # in-flight files; the loser is rejected at the ledger commit below
        tmp = f"{final}.tmp-{seq}"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        postings.write.mode("overwrite").parquet(tmp)

        seg = self.spark.read.parquet(tmp)
        n_postings = seg.count()
        # one aggregate gives the doc count AND the segment's input-content
        # digest (recorded in the ledger so a streaming replay can verify
        # "same batch id => same content" without collecting row sets)
        n_docs, doc_digest = content_digest(docs)
        stats = seg.groupBy("term").count().agg(
            F.max("count").alias("mx"), F.avg("count").alias("mean")
        ).collect()[0]
        wall = time.perf_counter() - t0

        row = {
            "segment_id": segment_id,
            "status": "done",
            "n_docs": n_docs,
            "n_postings": n_postings,
            "bytes": _dir_bytes(tmp),
            "postings_per_sec": round(n_postings / wall, 2) if wall > 0 else 0.0,
            "skew_ratio": round(float(stats.mx) / float(stats.mean), 4)
            if stats.mean
            else 0.0,
            "wall_ms": int(wall * 1000),
            "seq": seq,
            "doc_digest": doc_digest,
        }
        # WRITE-AHEAD commit: the row first — of two racers exactly one
        # lands it, and the loser aborts here without touching `final`
        try:
            self._commit_ledger_row(segment_id, row)
        except ValueError:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        self._finalize_segment(tmp, final)
        return row

    def _finalize_segment(self, tmp: str, final: str) -> None:
        """Post-commit tmp->final rename, tolerant of a CONCURRENT READER's
        :meth:`_recover_segments` completing our commit first (once the
        ledger row is visible, any reader may legally recover it).  The
        round-5 unconditional ``rmtree(final)`` had a TOCTOU: a recoverer
        renaming between this writer's existence check and its rmtree made
        the writer delete its OWN just-recovered data and then fail the
        rename — a committed ledger row with no data dir, silently skipped
        by ``_postings_for_rows`` (permanent loss).  Disambiguation: a
        pre-write-ahead-era orphan ``final`` is recognized by BOTH paths
        existing (our tmp is still in place); once tmp is gone, ``final``
        can only be our recovered data — leave it."""
        if os.path.exists(final) and os.path.exists(tmp):
            # data orphaned by a pre-write-ahead-era crash (rename happened,
            # ledger write didn't) — our committed row now governs this id
            shutil.rmtree(final)
        try:
            os.rename(tmp, final)
        except OSError:
            # a racing _recover_segments renamed our tmp first — fine iff
            # the committed data is in place under the final name
            if not os.path.exists(final):
                raise

    def _commit_ledger_row(self, segment_id: str, row: dict) -> None:
        """Exclusive-create ledger commit: of two writers racing the same
        segment id, exactly one lands the row; the loser fails loudly
        instead of silently overwriting the winner's lineage record."""
        try:
            fd = os.open(
                self._ledger_path(segment_id),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError:
            raise ValueError(
                f"segment {segment_id!r} was committed concurrently by"
                " another writer (ledger row exists); ingest under a"
                " distinct segment id per writer"
            )
        with os.fdopen(fd, "w") as fh:
            json.dump(row, fh)

    # -------------------------------------------------------------- build

    def build_resumable(
        self,
        docs: DataFrame,
        n_segments: int = 4,
        fail_after: Optional[int] = None,
    ) -> List[dict]:
        """Segmented, resumable index build.

        Segment membership is ``pmod(hash(doc_id), n_segments)`` — stable
        across runs, so a re-run after a crash recomputes only pending
        segments (anti-join against the ledger).  ``fail_after`` injects a
        crash after N segments (for the resume test)."""
        done = set(self.completed_segments())
        rows = []
        built = 0
        for i in range(n_segments):
            seg_id = f"seg-{i:04d}"
            if seg_id in done:
                continue
            part = docs.filter(F.pmod(F.xxhash64("doc_id"), n_segments) == i)
            rows.append(self.write_segment(seg_id, part))
            built += 1
            if fail_after is not None and built >= fail_after:
                raise RuntimeError(f"injected failure after {built} segments")
        return rows

    # ------------------------------------------------------------ reading

    def _postings_for_rows(self, rows: List[dict]) -> DataFrame:
        segs = [
            self.segment_path(r["segment_id"])
            for r in rows
            if r.get("status") == "done"
            and os.path.exists(self.segment_path(r["segment_id"]))
        ]
        if not segs:
            raise FileNotFoundError("no completed segments")
        # mergeSchema: a mixed-era store (pre-seq segments + seq-stamped
        # ones) must expose the seq column from EVERY footer — the default
        # single-footer schema pick can drop it, silently disabling
        # latest-wins and resurrecting stale doc versions
        return self.spark.read.option("mergeSchema", "true").parquet(*segs)

    def postings(self) -> DataFrame:
        self._recover_segments()
        return self._postings_for_rows(self.ledger())

    def merged_postings(self) -> DataFrame:
        """Segments hold disjoint docs, so cross-segment merge is a no-op
        union; for overlapping segments (re-ingest), latest-wins applies
        (:meth:`compacted_postings`)."""
        return self.compacted_postings()

    def _compacted(self, p: DataFrame) -> DataFrame:
        if "seq" not in p.columns:  # pre-seq store: segments are disjoint
            return p
        p = p.withColumn("seq", F.coalesce(F.col("seq"), F.lit(-1).cast("long")))
        latest = p.groupBy("doc_id").agg(F.max("seq").alias("seq"))
        return p.join(latest, ["doc_id", "seq"]).drop("seq")

    def compacted_postings(self) -> DataFrame:
        """Latest-wins postings: when a doc appears in several segments
        (update via re-ingest), only its highest-``seq`` version survives —
        the stale terms of the old version disappear from query results.
        One doc_id-keyed aggregate + semi-join; on Iceberg this is the
        MERGE-on-read path and :meth:`compact` is the rewrite.

        Mixed stores (pre-seq segments alongside seq-stamped ones) read the
        old segments as seq NULL -> coalesced to -1, so their docs survive
        and any re-ingested version beats them (a NULL seq would otherwise
        be dropped by the non-null-safe join)."""
        return self._compacted(self.postings())

    def compact(self) -> dict:
        """Physically rewrite the store to one compacted segment (drops
        superseded doc versions).

        Same write-ahead commit as :meth:`write_segment`: the compacted
        segment's ledger row lands, then the rename, and only then are the
        old segments deleted — a crash anywhere in between leaves a store
        that still answers every query correctly (latest-wins makes the
        compacted segment shadow the old ones), just temporarily larger."""
        old_segments = self.completed_segments()
        if len(old_segments) == 1 and old_segments[0].startswith("seg-compact-"):
            # already a single compacted segment: nothing superseded, skip
            # the rewrite (repeated compact calls stay cheap no-ops)
            return self.ledger()[0]
        new_seq = self._claim_seq()
        seg_id = f"seg-compact-{new_seq:04d}"
        compacted = self.compacted_postings().withColumn(
            "seq", F.lit(new_seq).cast("long")
        )
        final = self.segment_path(seg_id)
        tmp = f"{final}.tmp-{new_seq}"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        compacted.write.mode("overwrite").parquet(tmp)
        seg = self.spark.read.parquet(tmp)
        n_postings = seg.count()
        n_docs = seg.select("doc_id").distinct().count()
        row = {
            "segment_id": seg_id,
            "status": "done",
            "n_docs": n_docs,
            "n_postings": n_postings,
            "bytes": _dir_bytes(tmp),
            "postings_per_sec": 0.0,
            "skew_ratio": 0.0,
            "wall_ms": 0,
            "seq": new_seq,
        }
        self._commit_ledger_row(seg_id, row)  # write-ahead: row, then rename
        self._finalize_segment(tmp, final)  # recoverer-race tolerant
        # only now retire the superseded segments (safe at any crash point:
        # dir-before-row, so a half-retired segment is shadowed, never
        # phantom — see _recover_segments)
        for s in old_segments:
            self._retire_dir(self.segment_path(s))
            os.remove(self._ledger_path(s))
        self.sweep_retired()
        return row

    def superseded_fraction(self) -> float:
        """Fraction of ingested doc versions shadowed by later re-ingests —
        the auto-compaction trigger signal.  Ledger doc counts are free;
        the live-doc count is one narrow distinct aggregate (a maintenance
        query, not a hot-path one)."""
        total = sum(r["n_docs"] for r in self.ledger() if r["status"] == "done")
        if total <= 0:
            return 0.0
        live = self.postings().select("doc_id").distinct().count()
        return 1.0 - live / total

    def maybe_compact(self, max_superseded: float = 0.3) -> Optional[dict]:
        """Auto-compaction policy: physically rewrite when the superseded
        fraction passes ``max_superseded`` (Iceberg analogue: a
        rewrite_data_files maintenance trigger on the delete-file ratio).
        Returns the compaction ledger row, or None when below threshold —
        repeated update rounds interleaved with maybe_compact keep store
        size bounded at ~(1 + max_superseded) x live data."""
        if len(self.completed_segments()) <= 1:
            return None
        if self.superseded_fraction() >= max_superseded:
            return self.compact()
        return None

    def _auto_doc_span(self, docstats, n: int) -> int:
        """Pick the compressed-block range width from the observed id space:
        span = id_spread * target / n gives ~DEFAULT_DOC_SPAN docs per range
        for dense ids (spread ~ n -> span ~ 1024) AND for sparse xxhash64 ids
        (spread ~ 2^64 -> the doc_span_for_sparse bucketing) with one
        formula — the web-scale-sane range key the raw ``id // 1024`` is
        not.

        Spread is the inner-99% quantile spread (one approx_percentile
        aggregate), not min..max: a handful of id-space outliers (one doc
        keyed at 10^12 in an otherwise dense store) would inflate a raw
        spread by orders of magnitude and collapse range pruning; with the
        quantile spread the outliers simply land in their own far ranges
        (the floor mapping needs no contiguity)."""
        from ..operators import codec

        row = docstats.agg(
            F.expr(
                "approx_percentile(doc_id, array(0.005, 0.995), 10000)"
            ).alias("q")
        ).collect()[0]
        if not row.q or row.q[0] is None:
            return codec.DEFAULT_DOC_SPAN
        spread = max(int(row.q[1]) - int(row.q[0]), 1)
        spread = int(spread / 0.99) + 1  # unbias the inner-99% window
        span = (spread * codec.DEFAULT_DOC_SPAN) // max(n, 1)
        return max(1, min(span, 2**62))

    # ------------------------------------------------- meta + staleness

    def _meta(self) -> Optional[dict]:
        mp = os.path.join(self.base, "blocks_meta.json")
        if not os.path.exists(mp):
            return None
        with open(mp) as fh:
            return json.load(fh)

    def _meta_raw(self) -> Optional[bytes]:
        mp = os.path.join(self.base, "blocks_meta.json")
        if not os.path.exists(mp):
            return None
        with open(mp, "rb") as fh:
            return fh.read()

    def _write_meta(self, meta: dict, expect_raw: Optional[bytes] = "unchecked") -> None:
        """Atomic meta replace — the SINGLE commit point for every publish:
        all other publish artifacts are unreferenced until this rename, so
        a crash at any earlier step leaves the published index untouched.

        ``expect_raw`` (the meta bytes snapshotted when the publish began)
        adds optimistic concurrency DETECTION for racing publishers: if
        another publish committed in between, this one's derivation is
        stale (its covered sets / segment names were computed against the
        old meta) — refuse loudly instead of last-writer-wins silently
        discarding the other publish.  This is detection, not a lock (a
        true CAS needs Iceberg's optimistic snapshot commit, per the
        module docstring); the residual window between check and replace
        is microseconds against a minutes-long publish.  Concurrent
        SEGMENT writers are unaffected — they never touch the meta."""
        mp = os.path.join(self.base, "blocks_meta.json")
        if expect_raw != "unchecked" and self._meta_raw() != expect_raw:
            raise ValueError(
                "concurrent publish detected: blocks_meta.json changed "
                "while this publish was computing — its coverage baseline "
                "is stale; re-run (publishes must be serialized per store)"
            )
        tmp = mp + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, mp)

    def _covered(self, meta: Optional[dict], key: str, stamp_key: str) -> Optional[Set[int]]:
        """The seq set an artifact family covers.  v2 metas record it
        explicitly; legacy (round-4 max-stamped) metas fall back to "every
        committed seq <= the stamp" — exactly the (race-blind) semantics
        they were written under."""
        if meta is None:
            return None
        if key in meta:
            return set(meta[key])
        if stamp_key in meta:
            return {s for s in self._committed_seqs() if s <= meta[stamp_key]}
        return None

    def published_stale(self, meta=_UNREAD) -> bool:
        """True when the published terms/docstats do not cover EXACTLY the
        committed segment set — i.e. query-side readers must derive live
        tables instead of trusting the snapshot.  Set-based, not max-based:
        a slow writer that commits a LOWER seq after a publish covered
        higher ones makes the store stale (the old max comparison reported
        fresh forever — silent loss of that segment's docs)."""
        if meta is self._UNREAD:
            meta = self._meta()
        cov = self._covered(meta, "covered_seqs", "max_seq")
        if cov is None:
            return True  # never published (or pre-stamp era): assume stale
        return self._committed_seqs() != cov

    def blocks_stale(self, meta=_UNREAD) -> bool:
        """True when the published compressed block tables do not cover the
        committed segment set (tracked separately from terms/docstats:
        publish(with_compressed=False) refreshes those but not blocks)."""
        if meta is self._UNREAD:
            meta = self._meta()
        cov = self._covered(meta, "blocks_covered_seqs", "blocks_max_seq")
        if cov is None:
            return True
        return self._committed_seqs() != cov

    def _covered_pred(self, covered: Set[int], all_seqs: Set[int]):
        """Pushdown-friendly membership predicate for ``seq in covered``:
        the common case (covered = contiguous ledger prefix) compiles to a
        range compare; the late-commit-hole case to an isin (a single In
        node — NOT an OR chain, which StackOverflows past ~500 clauses)."""
        mx = max(covered)
        if covered >= {s for s in all_seqs if s <= mx}:
            return F.col("seq") <= F.lit(mx)
        return F.col("seq").isin([int(s) for s in covered])

    def snapshot(self) -> "StoreSnapshot":
        """A consistent read view: the meta — this store's single commit
        point — resolved ONCE, with every reader method bound to it.

        Each plain ``IndexStore`` reader call re-resolves the CURRENT
        meta, which is right for a single read but TORN across several: a
        query that reads the dictionary, then the corpus stats, then the
        block tables can straddle a concurrent publish and mix two
        snapshots' artifacts (stats from the new corpus against blocks
        from the old — inconsistent WAND bounds).  A snapshot pins all of
        them to one committed state.  Pair with ``gc_grace_sec`` >= the
        max query duration so the pinned artifact dirs outlive the reads
        (a concurrent publisher retires them only after the window)."""
        return StoreSnapshot(self)

    # ------------------------------------------- published base artifacts

    def _artifact_path(self, kind: str, meta=_UNREAD) -> str:
        """Resolve a published base-artifact directory (``terms`` /
        ``docstats`` / ``blocks`` / ``doclen_blocks``) THROUGH THE META:
        full publishes write versioned dirs (``terms-v000003``) named in
        ``artifact_dirs`` and swapped at the single atomic meta commit, so
        a crashed full publish's half-written dirs are unreferenced and
        invisible (round 6 — the in-place rewrite served corrupt blocks as
        "fresh" when coverage was already complete, the auto-compaction
        path).  Legacy metas (and never-published stores) resolve to the
        plain directory name."""
        if meta is self._UNREAD:
            meta = self._meta()
        name = ((meta or {}).get("artifact_dirs") or {}).get(kind, kind)
        return os.path.join(self.base, name)

    def _gc_unreferenced_base(self, meta: dict) -> None:
        """Delete base-artifact dirs not referenced by the committed meta:
        superseded versions plus the pre-versioning plain dirs.  Pure GC —
        everything deleted here is already unreferenced as of the meta
        commit, so a crash mid-GC leaves harmless orphans the next
        publish sweeps."""
        import re

        named = set((meta.get("artifact_dirs") or {}).values())
        pat = re.compile(r"^(terms|docstats|blocks|doclen_blocks)(-v\d{6})?$")
        for entry in os.listdir(self.base):
            if entry in named or not pat.match(entry):
                continue
            self._retire_dir(os.path.join(self.base, entry))

    # ------------------------------------------- published narrow tables

    def _narrow_delta_names(self, meta: Optional[dict]) -> List[str]:
        return list((meta or {}).get("terms_delta_names", []))

    def _blocks_delta_names(self, meta: Optional[dict]) -> List[str]:
        meta = meta or {}
        if "blocks_delta_names" in meta:
            return list(meta["blocks_delta_names"])
        # legacy round-4 stores: delta dirs on disk, not named in meta
        return [os.path.basename(p) for p in self._block_segment_dirs("blocks_delta")]

    def published_terms(self, meta=_UNREAD) -> DataFrame:
        """The published dictionary with terms-delta segments resolved:
        per-term latest-wins over (base + deltas), tombstones (df <= 0)
        dropped.  The explicit read schema pins the ``first`` partition
        column to string (an all-digit corpus would otherwise infer int and
        break the cross-segment union), and the resolve groups by
        (term, first) so a caller's first-char filter pushes through the
        aggregate into every segment's partition pruning.  A store without
        deltas returns the base scan untouched — zero overhead.

        ``meta``: pass a pinned meta (see :meth:`snapshot`) to read a
        specific committed snapshot; default resolves the current one."""
        if meta is self._UNREAD:
            meta = self._meta()
        base = self.spark.read.schema(TERMS_SCHEMA).parquet(
            self._artifact_path("terms", meta)
        )
        names = self._narrow_delta_names(meta)
        if not names:
            return base
        u = base.withColumn("tseg", F.lit(0))
        for i, nm in enumerate(names):
            u = u.unionByName(
                self.spark.read.schema(TERMS_SCHEMA)
                .parquet(os.path.join(self.base, "terms_delta", nm))
                .withColumn("tseg", F.lit(i + 1))
            )
        latest = u.groupBy("term", "first").agg(F.max("tseg").alias("tseg"))
        return (
            u.join(latest, ["term", "first", "tseg"])
            .filter(F.col("df") > 0)
            .drop("tseg")
        )

    def published_docstats(self, meta=_UNREAD) -> DataFrame:
        """Published docstats with docstats-delta segments resolved
        (per-doc latest-wins).  No tombstone case: every updated doc has at
        least one posting in its newest version (an empty re-ingest writes
        no posting rows and is therefore invisible to latest-wins — the
        store's documented no-op, same as the postings path).  ``meta``:
        optional pinned snapshot meta."""
        if meta is self._UNREAD:
            meta = self._meta()
        base = self.spark.read.schema(DOCSTATS_SCHEMA).parquet(
            self._artifact_path("docstats", meta)
        )
        names = self._narrow_delta_names(meta)
        if not names:
            return base
        u = base.withColumn("dseg", F.lit(0))
        for i, nm in enumerate(names):
            u = u.unionByName(
                self.spark.read.schema(DOCSTATS_SCHEMA)
                .parquet(os.path.join(self.base, "docstats_delta", nm))
                .withColumn("dseg", F.lit(i + 1))
            )
        latest = u.groupBy("doc_id").agg(F.max("dseg").alias("dseg"))
        return u.join(latest, ["doc_id", "dseg"]).drop("dseg")

    def corpus_stats(self, meta=_UNREAD) -> tuple:
        """(n, avgdl) from the meta's incrementally-maintained counters —
        zero Spark jobs on the query path.  publish() seeds them with one
        exact aggregate; publish_delta() adjusts them from the updated docs
        only (exact: long sums).  Falls back to aggregating the resolved
        docstats for legacy metas.  ``meta``: optional pinned snapshot
        meta."""
        if meta is self._UNREAD:
            meta = self._meta()
        cs = (meta or {}).get("corpus_stats")
        if cs:
            return int(cs["n"]), float(cs["sum_dl"]) / int(cs["n"])
        row = self.published_docstats(meta).agg(
            F.count("*").alias("n"), F.sum("doc_len").alias("s")
        ).collect()[0]
        return int(row.n), float(row.s) / int(row.n)

    # ------------------------------------------------------ delta publish

    def publish_delta(self) -> dict:
        """Publish cost proportional to the DELTA, not the corpus — and
        crash-atomic: the final meta write is the only commit point.

        A full :meth:`publish` rewrites every published artifact — at web
        scale that is a full-corpus job per ingest (the 1M stress measures
        ~90 s for a store a 1000-doc update barely touches).  Granularity
        is **(term, doc range)** for the blocks: a doc update dirties only
        the block rows of the ranges holding updated docs — NOT a term's
        whole posting list (per-term granularity degenerates on zipf
        corpora, where any update touches the head terms and drags in half
        the postings; measured: per-term delta cost == full publish at 1M).
        The NARROW tables are delta segments too (round 5): per-term /
        per-doc latest-wins rows holding the new ABSOLUTE values (df=0 rows
        are term tombstones), so nothing is read-modify-written in place.

        Derived from the ledger segments whose seq is NOT in the covered
        set (set-based — a slow writer's late-committed low seq is picked
        up here; the old ``seq > max`` filter lost it forever):

        - **updated docs** -> **affected ranges** (``range_expr``);
        - ``terms_delta/<name>``: per-term new (df, cf) for terms whose
          counts changed, computed from the updated docs' last-COVERED vs
          current versions only; ``docstats_delta/<name>``: the updated
          docs' new doc_len rows;
        - ``blocks_delta/<name>``: re-packed blocks for every (term,
          affected range) from the latest-wins postings of those ranges'
          docs, first-char partitioned like the base, with the term's
          CURRENT df stamped per row (``df_then`` — the stats-drift
          anchor), plus tombstones (n=0) for (term, range) pairs that
          existed before and are now empty;
        - ``doclen_delta/<name>``: re-encoded doc-length blocks for the
          affected ranges.

        All four directories are written UNREFERENCED; readers
        (:meth:`published_terms` / :meth:`published_docstats` /
        :meth:`wand_tables`) resolve only segments named in the meta, so a
        crash before the atomic meta write leaves the published index
        bit-identical and a retry recomputes the same artifacts from the
        unchanged baseline — the df/cf double-apply of the round-4
        read-modify-write rewrite is structurally impossible.  Corpus
        stats (n, sum_dl) are adjusted incrementally in the same commit."""
        from ..operators import bm25, codec

        self._recover_segments()
        meta_raw0 = self._meta_raw()  # optimistic-concurrency baseline
        meta = self._meta()
        if (
            meta is None
            or "doc_span" not in meta
            or "block_segments" not in meta
        ):
            raise ValueError(
                "publish_delta requires a prior FULL publish(with_compressed"
                "=True) on this store (block segment stats not recorded)"
            )
        if "blocks_delta_names" not in meta:
            # A round-4 meta is unsafe to delta-publish against even when it
            # has NO delta dirs yet: wand_tables maps such a base to
            # bseg=base['seq'] (>= 1 on any multi-segment store) while a new
            # delta would get bseg=1, so per-(term, block) latest-wins would
            # prefer the STALE base rows over the delta — silently wrong WAND
            # results.  One full publish upgrades the meta (bseg=0 base +
            # explicit delta name lists).
            raise ValueError(
                "store has a pre-round-5 meta (no delta-segment name lists);"
                " run a FULL publish() once to upgrade to set-based coverage"
            )
        rows = [r for r in self.ledger() if r["status"] == "done"]
        if any(r.get("seq") is None for r in rows):
            raise ValueError(
                "store has legacy (no-seq) ledger rows; run full publish()"
            )
        all_seqs = {r["seq"] for r in rows}
        cov_t = self._covered(meta, "covered_seqs", "max_seq")
        cov_b = self._covered(meta, "blocks_covered_seqs", "blocks_max_seq")
        if cov_t is None or cov_b is None:
            raise ValueError(
                "publish_delta requires a prior FULL publish() (no coverage"
                " recorded)"
            )
        if cov_t != cov_b:
            # a terms-only publish ran after the last block publish: the
            # published terms already cover newer segments than the blocks,
            # so the df-adjustment baseline would double count
            raise ValueError(
                "terms/docstats coverage is ahead of the block coverage "
                "(publish(with_compressed=False) ran in between); run a "
                "FULL publish() to realign before delta publishing"
            )
        covered = cov_b
        new_rows = [r for r in rows if r["seq"] not in covered]
        if not new_rows:
            if covered == all_seqs:
                return {"delta": None, "reason": "up_to_date"}
            # covered seqs no longer in the ledger: compact() rewrote and
            # deleted the published baseline's lineage
            raise ValueError(
                "published coverage references segments the ledger no "
                "longer has (compact() ran after the last block publish): "
                "the delta baseline is compacted away — run a FULL publish()"
            )
        span = int(meta["doc_span"])
        bnames = self._blocks_delta_names(meta)
        # the new segment's bseg must exceed every SURVIVING bseg, not just
        # the name-list length: after compact_deltas the single merged dir
        # holds rows with bseg up to the old K, and a new delta at
        # len+1 == 2 would LOSE per-(term, block) latest-wins to them
        max_bseg = max(
            (
                int(s.get("bseg", s.get("seq", 0)))
                for s in (meta.get("block_segments") or {}).values()
            ),
            default=0,
        )
        ord_ = max(
            len(bnames) + 1, max_bseg + 1, self._lingering_ordinal("delta-") + 1
        )
        seg_name = f"delta-{ord_:06d}"

        new_paths = [
            self.segment_path(r["segment_id"])
            for r in new_rows
            if os.path.exists(self.segment_path(r["segment_id"]))
        ]
        updated = (
            self.spark.read.option("mergeSchema", "true")
            .parquet(*new_paths)
            .select("doc_id")
            .distinct()
            .cache()
        )

        # ---- per-term df/cf changes from the updated docs ONLY: their
        # last-COVERED version vs their current version (narrow
        # doc-restricted scan; every other doc's contribution is unchanged).
        # `snap` is pinned to the ledger rows read above — a segment
        # committed mid-publish stays uncovered and lands in the next delta.
        snap = self._postings_for_rows(rows)
        upd_rows = (
            snap.join(updated, "doc_id", "left_semi")
            .select(
                "term",
                "doc_id",
                "tf",
                F.coalesce(F.col("seq"), F.lit(-1)).alias("seq"),
            )
            .cache()
        )
        cur_ver = upd_rows.groupBy("doc_id").agg(F.max("seq").alias("seq"))
        prev_ver = (
            upd_rows.filter(self._covered_pred(covered, all_seqs))
            .groupBy("doc_id")
            .agg(F.max("seq").alias("seq"))
        )
        cur_rows = upd_rows.join(cur_ver, ["doc_id", "seq"]).cache()
        prev_rows = upd_rows.join(prev_ver, ["doc_id", "seq"]).cache()

        # compact() after the last block publish rewrites every doc at a
        # NEW seq and deletes the old segments — the covered baseline rows
        # are gone, so the df adjustment would double-count every doc the
        # snapshot already includes.  The ledger-level check above catches
        # v2 metas; this doc-level probe also catches legacy fallbacks
        # (whose covered set is reconstructed from the post-compact ledger).
        # The resolved baselines are cached for the publish: each feeds ~3
        # actions (narrow-delta writes + both block builds), and without
        # the cache every action re-unions base + K segments and re-runs
        # the latest-wins aggregate — the measured ~+1.2 s/segment publish
        # growth of the K-curve (scalar columns only, so columnar caching
        # is safe per the round-2 array-cache finding).
        old_ds = self.published_docstats().cache()
        lineage_lost = (
            updated.join(old_ds.select("doc_id"), "doc_id", "left_semi")
            .join(prev_ver.select("doc_id"), "doc_id", "left_anti")
            .limit(1)
            .count()
        )
        if lineage_lost:
            raise ValueError(
                "segment lineage below the block snapshot was compacted "
                "away (compact() ran after the last block publish): the "
                "delta baseline is unrecoverable — run a FULL publish()"
            )

        def per_term(rows_df, dfc, cfc):
            return rows_df.groupBy("term").agg(
                F.countDistinct("doc_id").alias(dfc), F.sum("tf").alias(cfc)
            )

        adj = (
            per_term(cur_rows, "df_add", "cf_add")
            .join(per_term(prev_rows, "df_sub", "cf_sub"), "term", "full_outer")
            .select(
                "term",
                (
                    F.coalesce("df_add", F.lit(0)) - F.coalesce("df_sub", F.lit(0))
                ).alias("ddf"),
                (
                    F.coalesce("cf_add", F.lit(0)) - F.coalesce("cf_sub", F.lit(0))
                ).alias("dcf"),
            )
        )
        old_terms = self.published_terms().select("term", "df", "cf").cache()
        # ABSOLUTE new values for the changed terms only (df<=0 rows are
        # tombstones the reader drops) — recomputing on retry reproduces
        # identical rows because the baseline is meta-pinned
        terms_changed = adj.join(old_terms, "term", "left").select(
            "term",
            (F.coalesce("df", F.lit(0)) + F.col("ddf")).alias("df"),
            (F.coalesce("cf", F.lit(0)) + F.col("dcf")).alias("cf"),
        )
        self._write_artifact(
            "terms_delta",
            os.path.join(self.base, "terms_delta", seg_name),
            lambda p: write_terms(terms_changed, p),
        )

        ds_changed = cur_rows.groupBy("doc_id").agg(
            F.sum("tf").alias("doc_len")
        ).cache()
        self._write_artifact(
            "docstats_delta",
            os.path.join(self.base, "docstats_delta", seg_name),
            lambda p: ds_changed.write.mode("overwrite").parquet(p),
        )

        # ---- incremental corpus stats (exact long sums; delta-sized jobs)
        cs = meta.get("corpus_stats")
        ctot = ds_changed.agg(
            F.count("*").alias("nd"), F.sum("doc_len").alias("dl")
        ).collect()[0]
        ptot = prev_rows.agg(
            F.countDistinct("doc_id").alias("nd"), F.sum("tf").alias("dl")
        ).collect()[0]
        if cs:
            n_now = int(cs["n"]) + int(ctot.nd) - int(ptot.nd or 0)
            sumdl_now = int(cs["sum_dl"]) + int(ctot.dl) - int(ptot.dl or 0)
        else:  # legacy meta: one full aggregate to seed the counters
            row = old_ds.join(updated, "doc_id", "left_anti").unionByName(
                ds_changed
            ).agg(F.count("*").alias("n"), F.sum("doc_len").alias("s")).collect()[0]
            n_now, sumdl_now = int(row.n), int(row.s)
        avgdl_now = sumdl_now / n_now

        # current narrow tables as LAZY plans (nothing swapped on disk)
        terms_cur = old_terms.join(
            adj.select("term"), "term", "left_anti"
        ).unionByName(terms_changed.filter(F.col("df") > 0))
        ds_cur = old_ds.join(updated, "doc_id", "left_anti").unionByName(
            ds_changed
        )

        # ---- affected ranges -> latest-wins postings of their docs only
        aff_ranges = (
            updated.select(codec.range_expr(span).alias("rng")).distinct().cache()
        )
        p_rng = snap.withColumn("rng", codec.range_expr(span)).join(
            aff_ranges, "rng", "left_semi"
        )
        # doc-restricted latest-wins (valid: the range filter keeps every
        # row of each included doc)
        p_rng = p_rng.withColumn(
            "seq", F.coalesce(F.col("seq"), F.lit(-1).cast("long"))
        )
        latest = p_rng.groupBy("doc_id").agg(F.max("seq").alias("seq"))
        p_rng = p_rng.join(latest, ["doc_id", "seq"])
        aff_post = p_rng.select("term", "doc_id", "positions", "tf")

        delta_blocks = codec.build_compressed(
            aff_post, ds_cur, terms_cur, n_now, avgdl_now, doc_span=span
        ).join(
            F.broadcast(terms_cur.select("term", F.col("df").alias("df_then"))),
            "term",
            "left",
        )
        # tombstones: (term, range) pairs present in the published blocks
        # for these ranges but empty now.  The affected-range set is
        # delta-sized by construction (<= one range per updated doc), so
        # it is collected once and applied as an ``isin`` PREDICATE on the
        # ``block`` column — a pushed filter with parquet row-group
        # pruning on the store's biggest artifact, where the former
        # semi-join form scanned every (term, block) row of base + K
        # segments per publish (one In node, not an OR chain)
        aff_list = [int(r.rng) for r in aff_ranges.collect()]
        blk_pred = F.col("block").isin(aff_list)
        new_pairs = aff_post.select(
            "term", codec.range_expr(span).alias("block")
        ).distinct()
        old_blocks = self.spark.read.parquet(self._artifact_path("blocks", meta))
        frames = [old_blocks.filter(blk_pred).select("term", "block")]
        for nm in bnames:
            frames.append(
                self.spark.read.parquet(
                    os.path.join(self.base, "blocks_delta", nm)
                )
                .filter(blk_pred)
                .filter(F.col("n") > 0)
                .select("term", "block")
            )
        old_pairs = frames[0]
        for f in frames[1:]:
            old_pairs = old_pairs.unionByName(f)
        tomb = (
            old_pairs.distinct()
            .join(new_pairs, ["term", "block"], "left_anti")
            .select(
                "term",
                "block",
                F.lit(0).cast("int").alias("n"),
                F.lit(0).cast("long").alias("first_doc"),
                F.lit(b"").alias("doc_deltas"),
                F.lit(b"").alias("tfs"),
                F.lit(0.0).alias("block_max"),
                F.lit(None).cast("long").alias("df_then"),
            )
        )
        self._write_artifact(
            "blocks_delta",
            os.path.join(self.base, "blocks_delta", seg_name),
            lambda p: (
                delta_blocks.unionByName(tomb)
                .withColumn("bseg", F.lit(ord_).cast("long"))
                .withColumn("first", F.substring("term", 1, 1))
                .write.mode("overwrite")
                .partitionBy("first")
                .parquet(p)
            ),
        )
        ds_rng = (
            ds_cur.withColumn("rng", codec.range_expr(span))
            .join(aff_ranges, "rng", "left_semi")
            .drop("rng")
        )
        self._write_artifact(
            "doclen_delta",
            os.path.join(self.base, "doclen_delta", seg_name),
            lambda p: (
                codec.build_doclen_blocks(ds_rng, doc_span=span)
                .withColumn("bseg", F.lit(ord_).cast("long"))
                .write.mode("overwrite")
                .parquet(p)
            ),
        )
        for df in (
            updated,
            upd_rows,
            cur_rows,
            prev_rows,
            ds_changed,
            aff_ranges,
            old_terms,
            old_ds,
        ):
            df.unpersist()

        # ---- THE commit: one atomic meta replace references everything
        new_covered = sorted(covered | {r["seq"] for r in new_rows})
        meta["covered_seqs"] = new_covered
        meta["blocks_covered_seqs"] = new_covered
        meta["max_seq"] = max(all_seqs)
        meta["blocks_max_seq"] = max(all_seqs)
        meta["corpus_stats"] = {"n": n_now, "sum_dl": sumdl_now}
        meta["block_segments"][seg_name] = {
            "n": n_now,
            "avgdl": avgdl_now,
            "bseg": ord_,
        }
        meta["blocks_delta_names"] = bnames + [seg_name]
        meta["terms_delta_names"] = self._narrow_delta_names(meta) + [seg_name]
        self._write_meta(meta, expect_raw=meta_raw0)
        self.sweep_retired()
        return {
            "delta": seg_name,
            "blocks_path": os.path.join(self.base, "blocks_delta", seg_name),
            "doclen_path": os.path.join(self.base, "doclen_delta", seg_name),
            "n": n_now,
            "avgdl": avgdl_now,
        }

    def _write_artifact(self, kind: str, path: str, write_fn) -> None:
        """Indirection for the delta publish's UNREFERENCED artifact writes
        (readers resolve only meta-named segments, so these are invisible
        until the meta commit).  Exists so the crash-injection test can
        kill the publish after each side-effect step and prove the retry
        reproduces an uninterrupted run bit-for-bit."""
        write_fn(path)

    def delta_segment_count(self) -> int:
        """How many delta publishes the current base carries — the
        compaction-policy signal for :meth:`maybe_publish_full`."""
        return len(self._blocks_delta_names(self._meta()))

    def lineage_bytes(self) -> Tuple[int, int]:
        """``(delta_bytes, base_bytes)`` of the published BLOCK artifacts on
        disk — the adaptive-compaction signal.  Pure filesystem metadata
        (no Spark jobs): delta bytes sum the meta-named
        ``blocks_delta``/``doclen_delta`` segment dirs, base bytes the
        meta-resolved ``blocks``/``doclen_blocks`` dirs.  On-disk size is
        the right proxy on a real cluster too (object-store LIST carries
        sizes): the resolve-time union cost AND the next merge's cost are
        both proportional to delta bytes, while full-publish cost is
        proportional to base bytes."""

        def du(path: str) -> int:
            total = 0
            for root, _dirs, files in os.walk(path):
                for f in files:
                    try:
                        total += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
            return total

        meta = self._meta()
        delta_b = 0
        for nm in self._blocks_delta_names(meta):
            for kind in ("blocks_delta", "doclen_delta"):
                delta_b += du(os.path.join(self.base, kind, nm))
        base_b = du(self._artifact_path("blocks", meta)) + du(
            self._artifact_path("doclen_blocks", meta)
        )
        return delta_b, base_b

    # --------------------------------------------------------------- fsck

    _ARTIFACT_KINDS = ("terms", "docstats", "blocks", "doclen_blocks")
    _DELTA_FAMILIES = ("terms_delta", "docstats_delta", "blocks_delta",
                       "doclen_delta")

    def _check_parquet_dir(self, path: str, errors: list, warnings: list,
                           checked: dict, label: str) -> int:
        """Footer-validate every parquet file in ``path``; returns the
        file count.  A parquet file's footer lives at the END of the file,
        so truncation / partial writes / zero-byte files all fail here —
        this is the cheap (metadata-only, no data pages) corruption
        detector.  Missing dir is the CALLER's call (referenced -> error,
        optional -> skip); zero parquet files inside an existing dir is a
        warning (an empty write can legitimately produce no part files)."""
        import pyarrow.parquet as pq

        n = 0
        for root, _dirs, files in os.walk(path):
            if os.path.basename(root).startswith("."):
                continue
            for f in sorted(files):
                if not f.endswith(".parquet") or f.startswith((".", "_")):
                    continue
                fp = os.path.join(root, f)
                n += 1
                checked["parquet_files"] += 1
                try:
                    checked["rows"] += pq.ParquetFile(fp).metadata.num_rows
                except Exception as e:  # corrupt/truncated footer
                    errors.append(
                        f"{label}: corrupt parquet {os.path.relpath(fp, self.base)}: {e}"
                    )
        if n == 0:
            warnings.append(f"{label}: no parquet files in {path}")
        return n

    def fsck(self, deep: bool = False) -> dict:
        """Sparkless store integrity check — the offline janitor's verifier
        (pure filesystem metadata + parquet FOOTER reads; O(files), no data
        pages scanned, safe to run against a live store).

        Validates the invariants the commit protocol is supposed to
        maintain, so a bug / manual mutation / bitrot is DETECTED instead
        of silently served:

        - the meta parses, and every directory it references (versioned
          base artifacts via ``artifact_dirs``, the four delta families via
          ``*_delta_names``) exists with footer-valid parquet;
        - every committed ledger row's segment data is present (final dir,
          or the seq-named tmp dir ``_recover_segments`` repairs from — a
          WARNING; a row shadowed by a later ``seg-compact-*`` segment is
          the documented compact-crash leftover — also a warning; anything
          else is data loss — ERROR);
        - no two committed rows share a seq (latest-wins would be
          ambiguous), and every covered seq exists in the ledger;
        - unreferenced base-artifact versions / delta dirs / segment dirs
          are classified: ``.retired``-stamped (grace-GC pending — info) vs
          unstamped orphans (crash leftovers the next publish sweeps —
          warning, never an error: orphans are INVISIBLE by design, the
          meta is the only way in).

        ``deep=True`` additionally cross-checks the meta's incrementally
        maintained corpus counters against the docstats artifact's actual
        footer row counts on a fresh, delta-free store (counter drift
        would silently skew every BM25 idf/avgdl).

        Returns ``{"ok": bool, "errors": [...], "warnings": [...],
        "info": [...], "checked": {...}}`` — ok means no errors (warnings
        are expected states: recoverable commits, GC-pending dirs)."""
        import re

        errors: list = []
        warnings: list = []
        info: list = []
        checked = {"parquet_files": 0, "rows": 0, "artifact_dirs": 0,
                   "segments": 0, "retired_pending": 0, "orphans": 0}

        try:
            meta = self._meta()
        except ValueError as e:
            errors.append(f"meta: blocks_meta.json unparseable: {e}")
            meta = None

        # ---- referenced published artifacts
        referenced: Set[str] = set()  # base-relative dirs the meta names
        if meta is not None:
            narrow_cov = self._covered(meta, "covered_seqs", "max_seq")
            blocks_cov = self._covered(
                meta, "blocks_covered_seqs", "blocks_max_seq"
            )
            for kind in self._ARTIFACT_KINDS:
                cov = narrow_cov if kind in ("terms", "docstats") else blocks_cov
                if cov is None:
                    continue  # family never published
                path = self._artifact_path(kind, meta)
                referenced.add(os.path.relpath(path, self.base))
                if not os.path.isdir(path):
                    errors.append(
                        f"artifact {kind}: meta references missing dir "
                        f"{os.path.basename(path)}"
                    )
                    continue
                checked["artifact_dirs"] += 1
                self._check_parquet_dir(
                    path, errors, warnings, checked, f"artifact {kind}"
                )
            fam_names = {
                "terms_delta": self._narrow_delta_names(meta),
                "docstats_delta": self._narrow_delta_names(meta),
                "blocks_delta": self._blocks_delta_names(meta),
                "doclen_delta": self._blocks_delta_names(meta),
            }
            for fam, names in fam_names.items():
                for nm in names:
                    path = os.path.join(self.base, fam, nm)
                    referenced.add(os.path.join(fam, nm))
                    if not os.path.isdir(path):
                        errors.append(
                            f"delta {fam}/{nm}: meta references missing dir"
                        )
                        continue
                    checked["artifact_dirs"] += 1
                    self._check_parquet_dir(
                        path, errors, warnings, checked, f"delta {fam}/{nm}"
                    )

        # ---- ledger <-> segment coherence
        try:
            rows = self.ledger()
        except (OSError, ValueError) as e:
            errors.append(f"ledger: unreadable: {e}")
            rows = []
        done = [r for r in rows if r.get("status") == "done"]
        seqs = [r["seq"] for r in done if r.get("seq") is not None]
        dup = {s for s in seqs if seqs.count(s) > 1}
        if dup:
            errors.append(f"ledger: duplicate committed seqs {sorted(dup)}")
        compact_seqs = [
            r["seq"] for r in done
            if r.get("seq") is not None
            and str(r.get("segment_id", "")).startswith("seg-compact-")
        ]
        seg_dirs_present: Set[str] = set()
        for r in done:
            final = self.segment_path(r["segment_id"])
            checked["segments"] += 1
            if os.path.isdir(final):
                seg_dirs_present.add(r["segment_id"])
                self._check_parquet_dir(
                    final, errors, warnings, checked,
                    f"segment {r['segment_id']}",
                )
                continue
            tmp = f"{final}.tmp-{r.get('seq')}"
            if r.get("seq") is not None and os.path.isdir(tmp):
                warnings.append(
                    f"segment {r['segment_id']}: interrupted commit — "
                    f"recoverable from {os.path.basename(tmp)}"
                )
                seg_dirs_present.add(f"{r['segment_id']}.tmp-{r.get('seq')}")
            elif any(
                cs > (r.get("seq") if r.get("seq") is not None else -1)
                for cs in compact_seqs
            ):
                warnings.append(
                    f"segment {r['segment_id']}: data dir missing but "
                    "shadowed by a later seg-compact segment (documented "
                    "compact-crash leftover row)"
                )
            else:
                errors.append(
                    f"segment {r['segment_id']}: committed ledger row but "
                    "no data dir and no recoverable tmp — data loss"
                )
        committed = {s for s in seqs}
        if meta is not None:
            for key, stamp in (
                ("covered_seqs", "max_seq"),
                ("blocks_covered_seqs", "blocks_max_seq"),
            ):
                cov = self._covered(meta, key, stamp)
                if cov and not cov <= committed:
                    errors.append(
                        f"meta: {key} covers seqs {sorted(cov - committed)} "
                        "absent from the committed ledger"
                    )

        # ---- orphan / retired classification
        def classify(path: str, label: str) -> None:
            if os.path.exists(os.path.join(path, self._RETIRED)):
                checked["retired_pending"] += 1
            else:
                checked["orphans"] += 1
                warnings.append(f"orphan (unreferenced, sweepable): {label}")

        art_pat = re.compile(
            r"^(terms|docstats|blocks|doclen_blocks)(-v\d{6})?$"
        )
        for entry in sorted(os.listdir(self.base)):
            p = os.path.join(self.base, entry)
            if not os.path.isdir(p):
                continue
            if art_pat.match(entry) and entry not in referenced:
                # plain legacy names are valid when the meta has no
                # artifact_dirs (pre-round-6 store) — _artifact_path
                # already resolved those into `referenced`
                classify(p, entry)
        for fam in self._DELTA_FAMILIES:
            d = os.path.join(self.base, fam)
            if not os.path.isdir(d):
                continue
            for nm in sorted(os.listdir(d)):
                if os.path.join(fam, nm) not in referenced:
                    classify(os.path.join(d, nm), f"{fam}/{nm}")
        segroot = os.path.join(self.base, "segments")
        if os.path.isdir(segroot):
            for nm in sorted(os.listdir(segroot)):
                if nm not in seg_dirs_present:
                    classify(os.path.join(segroot, nm), f"segments/{nm}")

        # ---- deep: counters vs actual rows
        if deep and meta is not None and meta.get("corpus_stats"):
            stale = self.published_stale(meta)
            if not stale and not self._narrow_delta_names(meta):
                import pyarrow.parquet as pq

                n_meta = int(meta["corpus_stats"]["n"])
                n_rows = 0
                path = self._artifact_path("docstats", meta)
                for root, _dirs, files in os.walk(path):
                    for f in files:
                        if f.endswith(".parquet"):
                            n_rows += pq.ParquetFile(
                                os.path.join(root, f)
                            ).metadata.num_rows
                if n_rows != n_meta:
                    errors.append(
                        f"deep: corpus counter n={n_meta} != docstats "
                        f"artifact rows {n_rows} (counter drift)"
                    )
            else:
                info.append(
                    "deep: counter cross-check skipped (store stale or "
                    "delta-published — counts legitimately differ from the "
                    "base artifact)"
                )

        return {
            "ok": not errors,
            "errors": errors,
            "warnings": warnings,
            "info": info,
            "checked": checked,
        }

    def compact_deltas(self) -> dict:
        """LSM delta-lineage compaction: merge the K stacked delta segment
        families into ONE delta segment each, WITHOUT touching the base —
        cost proportional to the DELTA LINEAGE, not the corpus (the
        round-5 alternative, :meth:`maybe_publish_full`, is an O(corpus)
        full publish: ~76 s at the 1M curve vs ~15 s per delta, i.e. 45%
        of a K=4 ingest loop's wall time).

        The merge is read-equivalence-preserving BY CONSTRUCTION, bit for
        bit — no recomputation from postings:

        - **blocks / doclen blocks**: every delta row is the COMPLETE
          current content of its (term, range) / range as of its segment
          (publish_delta re-packs whole pairs), so per-key latest-wins
          across the delta segments alone yields exactly the rows the
          resolved read would keep anyway.  Rows retain their physical
          ``bseg`` and ``df_then``, and the old ``block_segments`` stats
          entries are KEPT in the meta, so the stats-drift bound
          multiplier of every surviving row is computed against the same
          (n_s, avgdl_s, df_then) anchor as before the merge — no
          rescaling, no soundness argument needed.
        - **terms / docstats deltas**: per-term / per-doc latest-wins by
          list position, KEEPING df<=0 tombstone rows (they must continue
          to shadow the base); the merged dir takes position 1.

        Tombstones stay tombstones: a pair emptied by any delta remains an
        n=0 row in the merged segment, still shadowing the base row.

        Crash-atomic like every other publish: all four merged dirs are
        unreferenced until the single meta commit swaps the ``*_names``
        lists; old delta dirs are GC'd after.  Coverage sets and corpus
        stats are unchanged (no segments enter or leave coverage).

        Each family merges independently (a terms-only publish can leave
        the narrow lineage shorter than the block lineage); families with
        fewer than 2 segments are left alone.  Returns the merged names
        (or ``{"merged": None}`` when nothing needed merging)."""
        self._recover_segments()
        meta_raw0 = self._meta_raw()
        meta = self._meta()
        if meta is None or "blocks_delta_names" not in meta:
            raise ValueError(
                "compact_deltas requires a round-5+ published store (run a"
                " FULL publish() first)"
            )
        bnames = list(meta["blocks_delta_names"])
        tnames = self._narrow_delta_names(meta)
        if len(bnames) < 2 and len(tnames) < 2:
            return {"merged": None, "reason": "nothing_to_merge"}
        gen = max(
            int(meta.get("delta_merge_gen", 0)) + 1,
            self._lingering_ordinal("delta-m") + 1,
        )
        seg_name = f"delta-m{gen:06d}"
        spark = self.spark
        out = {"merged": seg_name, "blocks": None, "narrow": None}

        if len(bnames) >= 2:
            blocks = None
            for nm in bnames:
                df = spark.read.parquet(
                    os.path.join(self.base, "blocks_delta", nm)
                )
                blocks = df if blocks is None else blocks.unionByName(df)
            latest = blocks.groupBy("term", "block").agg(
                F.max("bseg").alias("bseg")
            )
            merged_blocks = blocks.join(latest, ["term", "block", "bseg"])
            self._write_artifact(
                "blocks_delta",
                os.path.join(self.base, "blocks_delta", seg_name),
                lambda p: (
                    merged_blocks.write.mode("overwrite")
                    .partitionBy("first")
                    .parquet(p)
                ),
            )
            dl = None
            for nm in bnames:
                df = spark.read.parquet(
                    os.path.join(self.base, "doclen_delta", nm)
                )
                dl = df if dl is None else dl.unionByName(df)
            dl_latest = dl.groupBy("block").agg(F.max("bseg").alias("bseg"))
            merged_dl = dl.join(dl_latest, ["block", "bseg"])
            self._write_artifact(
                "doclen_delta",
                os.path.join(self.base, "doclen_delta", seg_name),
                lambda p: merged_dl.write.mode("overwrite").parquet(p),
            )
            out["blocks"] = len(bnames)

        if len(tnames) >= 2:
            u = None
            for i, nm in enumerate(tnames):
                df = (
                    spark.read.schema(TERMS_SCHEMA)
                    .parquet(os.path.join(self.base, "terms_delta", nm))
                    .withColumn("tseg", F.lit(i + 1))
                )
                u = df if u is None else u.unionByName(df)
            t_latest = u.groupBy("term", "first").agg(
                F.max("tseg").alias("tseg")
            )
            # tombstone rows (df<=0) are KEPT: they still shadow the base
            merged_terms = u.join(t_latest, ["term", "first", "tseg"]).drop(
                "tseg"
            )
            self._write_artifact(
                "terms_delta",
                os.path.join(self.base, "terms_delta", seg_name),
                lambda p: write_terms(merged_terms.drop("first"), p),
            )
            d = None
            for i, nm in enumerate(tnames):
                df = (
                    spark.read.schema(DOCSTATS_SCHEMA)
                    .parquet(os.path.join(self.base, "docstats_delta", nm))
                    .withColumn("dseg", F.lit(i + 1))
                )
                d = df if d is None else d.unionByName(df)
            d_latest = d.groupBy("doc_id").agg(F.max("dseg").alias("dseg"))
            merged_ds = d.join(d_latest, ["doc_id", "dseg"]).drop("dseg")
            self._write_artifact(
                "docstats_delta",
                os.path.join(self.base, "docstats_delta", seg_name),
                lambda p: merged_ds.write.mode("overwrite").parquet(p),
            )
            out["narrow"] = len(tnames)

        # ---- THE commit: swap the name lists; coverage/stats unchanged.
        # Old block_segments entries are KEPT — surviving rows still carry
        # their original bseg, and the stats join is keyed on bseg values,
        # not segment names (a later full publish resets the dict anyway).
        old_b, old_t = bnames, tnames
        if out["blocks"]:
            meta["blocks_delta_names"] = [seg_name]
        if out["narrow"]:
            meta["terms_delta_names"] = [seg_name]
        meta["delta_merge_gen"] = gen
        self._write_meta(meta, expect_raw=meta_raw0)
        # GC the superseded per-publish dirs (unreferenced as of the
        # commit; a crash here leaves harmless orphans)
        if out["blocks"]:
            for nm in old_b:
                for kind in ("blocks_delta", "doclen_delta"):
                    self._retire_dir(os.path.join(self.base, kind, nm))
        if out["narrow"]:
            for nm in old_t:
                for kind in ("terms_delta", "docstats_delta"):
                    self._retire_dir(os.path.join(self.base, kind, nm))
        self.sweep_retired()
        return out

    def maybe_publish_full(self, max_delta_segments: int = 4) -> Optional[dict]:
        """Delta-lineage compaction policy: run a FULL publish when the
        stacked delta-segment count passes the threshold, else None.

        Every query through :meth:`wand_tables` /
        :meth:`published_terms` unions base + K delta segments and
        re-resolves latest-wins, so warm WAND latency grows with K
        (~+0.25 s/segment at the 1M curve: 1.06 s at K=0, 2.23 s at K=4,
        3.22 s at K=8) while each delta publish stays 3-6x cheaper than
        the 74 s full publish — the classic LSM trade.  Default 4 holds
        read latency near 2x base while keeping per-update publish cost
        ~4x under full (scripts/delta_curve_1m.py; curve in BENCH.md);
        ``cmd_ingest`` calls this after every delta publish so unattended
        ingest loops keep read amplification bounded."""
        if self.delta_segment_count() >= max_delta_segments:
            return self.publish(with_compressed=True)
        return None

    def maybe_compact_lineage(
        self,
        max_delta_segments: int = 4,
        mode: str = "full",
        auto_full_fraction: float = 0.5,
    ) -> Optional[dict]:
        """Lineage-compaction policy with a choice of mechanism once the
        stacked delta count passes the threshold:

        - ``mode="full"``: O(corpus) full publish — resets base AND delta
          lineage (the round-5 behavior; right when the accumulated deltas
          have touched a large fraction of the ranges anyway);
        - ``mode="merge"``: :meth:`compact_deltas` — O(delta lineage)
          pairwise merge, base untouched; read amplification drops to one
          delta segment while per-compaction cost stays proportional to
          what actually changed.  The merged segment grows monotonically
          with the touched-range set, so long-running ingest loops should
          still full-publish occasionally (scripts/delta_curve_1m.py
          measures both sides);
        - ``mode="auto"``: merge while the delta lineage is small, full
          publish once ``delta_bytes >= auto_full_fraction * base_bytes``
          (:meth:`lineage_bytes`, a zero-job filesystem probe).  Rationale
          from the measured 1M curve (BENCH.md round 6): a merge is ~12x
          cheaper than a full publish and resets read amplification to
          base+1 segment, but the merged segment only ever grows — once
          its bytes rival the base's, every resolve-time union pays ~2x
          the base read cost FOREVER, while one full publish (whose cost
          has not grown) resets that to 1x and empties the lineage.  The
          default 0.5 caps resolve overhead at ~1.5x base while keeping
          full publishes rare on localized-update workloads (they trigger
          only after updates have touched ~a third of the corpus by
          volume).  Caveat: on TOY stores per-file parquet overhead
          dominates the byte probe (a 2-doc delta can out-weigh a 60-doc
          base on disk), so auto may full-publish early — harmless there
          (full is cheap at that size); the ratio is meaningful from
          ~MBs upward."""
        if self.delta_segment_count() < max_delta_segments:
            return None
        if mode == "auto":
            delta_b, base_b = self.lineage_bytes()
            mode = (
                "full" if delta_b >= auto_full_fraction * base_b else "merge"
            )
        if mode == "merge":
            return self.compact_deltas()
        return self.publish(with_compressed=True)

    def _block_segment_dirs(self, kind: str) -> List[str]:
        d = os.path.join(self.base, kind)
        if not os.path.isdir(d):
            return []
        return [
            os.path.join(d, s) for s in sorted(os.listdir(d)) if s.startswith("delta-")
        ]

    def wand_tables(self, terms: DataFrame, n: int, avgdl: float, meta=_UNREAD):
        """(blocks, doclen_blocks) ready for ``codec.bm25_topk_wand``, with
        delta segments resolved:

        - posting blocks: per-(TERM, RANGE) latest-wins over (base +
          deltas) — a delta re-packs the complete current content of every
          (term, range) it touches, so keeping each pair's max-``bseg``
          row is exact; tombstones (n=0) then drop emptied pairs.  The
          ``first`` column survives the union (deltas are written
          first-char partitioned like the base), so qterm_blocks still
          partition-prunes every segment.  Only segments NAMED IN THE META
          are read — a crashed publish's orphan directory is invisible.
        - doclen blocks: per-RANGE latest-wins (each delta re-encodes the
          full membership of every range it touches).
        - **stats-drift bound adjustment**: a surviving block row from
          segment s has ``block_max = idf(n_s, df_then) * T_s`` with its
          build-time stats, while a query scores with CURRENT stats.  The
          row's postings and those docs' lengths are unchanged since s
          (else a later delta rebuilt the pair), so the current per-doc
          score can exceed the recorded bound by at most
          ``idf(n, df_now)/idf(n_s, df_then) * max(1, avgdl/avgdl_s)``
          (the avgdl factor bounds the tf-normalization shift; the idf
          ratio is exact because every row carries the df it was built
          with) — block_max is scaled by exactly that, keeping WAND
          pruning sound while the per-range scoring itself (decoded tf +
          current doclen blocks + current idf) stays exact.

        ``meta``: optional pinned snapshot meta (see :meth:`snapshot`)."""
        spark = self.spark
        if meta is self._UNREAD:
            meta = self._meta()
        meta = meta or {}
        segs = meta.get("block_segments") or {}
        names = self._blocks_delta_names(meta)
        base_entry = segs.get("base", {})
        base_b = int(base_entry.get("bseg", base_entry.get("seq", -1)))

        def with_seg(df: DataFrame, seq: int) -> DataFrame:
            df = df.withColumn("bseg", F.lit(seq).cast("long"))
            if "df_then" not in df.columns:  # pre-round-4 base layout
                df = df.withColumn("df_then", F.lit(None).cast("long"))
            return df

        blocks = with_seg(
            spark.read.parquet(self._artifact_path("blocks", meta)), base_b
        )
        for nm in names:
            # delta files carry bseg + df_then physically
            blocks = blocks.unionByName(
                spark.read.parquet(os.path.join(self.base, "blocks_delta", nm))
            )
        latest = blocks.groupBy("term", "block").agg(F.max("bseg").alias("bseg"))
        resolved = blocks.join(latest, ["term", "block", "bseg"]).filter(
            F.col("n") > 0
        )

        if segs:
            stats_rows = [
                (
                    int(s.get("bseg", s.get("seq", -1))),
                    int(s["n"]),
                    float(s["avgdl"]),
                )
                for s in segs.values()
            ]
            stats_df = spark.createDataFrame(
                stats_rows, "bseg long, n_s long, avgdl_s double"
            )
            dfv = terms.select("term", F.col("df").cast("double").alias("df_now"))

            def idf(nv, dfcol):
                return F.log((nv - dfcol + 0.5) / (dfcol + 0.5) + 1.0)

            df_s = F.coalesce(F.col("df_then").cast("double"), F.col("df_now"))
            mult = F.coalesce(
                (
                    idf(F.lit(float(n)), F.col("df_now"))
                    / idf(F.col("n_s").cast("double"), df_s)
                )
                * F.greatest(F.lit(1.0), F.lit(float(avgdl)) / F.col("avgdl_s")),
                F.lit(1.0),
            )
            resolved = (
                resolved.join(F.broadcast(dfv), "term", "left")
                .join(F.broadcast(stats_df), "bseg", "left")
                .withColumn("block_max", F.col("block_max") * mult)
                .drop("df_now", "n_s", "avgdl_s")
            )
        resolved = resolved.drop("bseg", "df_then")

        dl = spark.read.parquet(
            self._artifact_path("doclen_blocks", meta)
        ).withColumn("bseg", F.lit(base_b).cast("long"))
        if "blocks_delta_names" in meta:
            dl_paths = [
                os.path.join(self.base, "doclen_delta", nm) for nm in names
            ]
        else:
            dl_paths = self._block_segment_dirs("doclen_delta")
        for p in dl_paths:
            dl = dl.unionByName(spark.read.parquet(p))
        dl_latest = dl.groupBy("block").agg(F.max("bseg").alias("bseg"))
        dl_resolved = dl.join(dl_latest, ["block", "bseg"]).drop("bseg")
        return resolved, dl_resolved

    def publish(self, with_compressed: bool = True, doc_span: int = None) -> dict:
        """Derive and write the query-side tables: the first-char-partitioned
        dictionary, doc stats, and (north-star index format) the compressed
        posting blocks + doc-length side blocks that the WAND query paths
        scan — built once with the index, not per query.

        The covered seq SET is snapshotted BEFORE the postings are read, so
        a segment committed mid-publish can only land in the artifacts
        WITHOUT being claimed covered (store stays stale, next delta picks
        it up — the conservative direction); claiming coverage the
        artifacts don't have would be silent loss.

        CRASH-ATOMIC (round 6): every artifact is written to a fresh
        VERSIONED directory (``terms-v<N>`` ...) that readers ignore until
        the single atomic meta commit names it in ``artifact_dirs`` — the
        same unreferenced-until-commit pattern as the delta segments.  The
        round-5 in-place rewrite was only crash-SAFE when the publish
        covered NEW segments (store read as stale, readers derived live);
        when coverage was already complete — exactly the
        :meth:`maybe_publish_full` lineage-compaction path ``cli ingest``
        auto-runs — a crash mid-rewrite left ``blocks_stale() == False``
        over a half-written base dir, serving corrupt blocks as fresh.
        Superseded versions (and the retired delta families) are deleted
        only AFTER the commit — pure GC, re-swept by the next publish.  A
        full publish also resets the delta lineage (``*_delta_names``
        emptied) — it IS the delta compaction."""
        self._recover_segments()
        meta_raw0 = self._meta_raw()  # optimistic-concurrency baseline
        old = self._meta()
        ver = int((old or {}).get("publish_version", 0)) + 1
        names = {k: f"{k}-v{ver:06d}" for k in ("terms", "docstats")}
        rows = [r for r in self.ledger() if r["status"] == "done"]
        cov = sorted({r["seq"] for r in rows if r.get("seq") is not None})
        postings = self._compacted(self._postings_for_rows(rows))
        terms = index_build.build_terms(postings)
        docstats = index_build.docstats_from_postings(postings)
        self._write_artifact(
            "terms",
            os.path.join(self.base, names["terms"]),
            lambda p: write_terms(terms, p),
        )
        self._write_artifact(
            "docstats",
            os.path.join(self.base, names["docstats"]),
            lambda p: docstats.write.mode("overwrite").parquet(p),
        )
        max_seq = max(cov, default=-1)
        info = {
            "segments": len(rows),
            "terms_path": os.path.join(self.base, names["terms"]),
            "docstats_path": os.path.join(self.base, names["docstats"]),
            "max_seq": max_seq,
        }
        ds = self.spark.read.schema(DOCSTATS_SCHEMA).parquet(
            os.path.join(self.base, names["docstats"])
        )
        srow = ds.agg(
            F.count("*").alias("n"), F.sum("doc_len").alias("s")
        ).collect()[0]
        n, sum_dl = int(srow.n), int(srow.s)
        avgdl = sum_dl / n
        meta = {
            "max_seq": max_seq,
            "covered_seqs": cov,
            "terms_delta_names": [],
            "corpus_stats": {"n": n, "sum_dl": sum_dl},
            "publish_version": ver,
        }
        if with_compressed:
            names["blocks"] = f"blocks-v{ver:06d}"
            names["doclen_blocks"] = f"doclen_blocks-v{ver:06d}"
            if doc_span is None:
                doc_span = self._auto_doc_span(ds, n)
            from ..operators import codec

            comp = codec.build_compressed(postings, ds, terms, n, avgdl,
                                          doc_span=doc_span)
            # same first-char physical layout as the dictionary: the block
            # table is the store's biggest artifact, and codec.qterm_blocks
            # turns a query's first-char set into a partition filter so a
            # W-term query reads only its leading directories.  df_then
            # stamps each row with its build-time df — the anchor for the
            # delta-publish stats-drift bound (wand_tables)
            self._write_artifact(
                "blocks",
                os.path.join(self.base, names["blocks"]),
                lambda p: (
                    comp.join(
                        F.broadcast(
                            terms.select("term", F.col("df").alias("df_then"))
                        ),
                        "term",
                        "left",
                    )
                    .withColumn("first", F.substring("term", 1, 1))
                    .write.mode("overwrite")
                    .partitionBy("first")
                    .parquet(p)
                ),
            )
            dlb = codec.build_doclen_blocks(ds, doc_span=doc_span)
            self._write_artifact(
                "doclen_blocks",
                os.path.join(self.base, names["doclen_blocks"]),
                lambda p: dlb.write.mode("overwrite").parquet(p),
            )
            info["blocks_path"] = os.path.join(self.base, names["blocks"])
            info["doclen_blocks_path"] = os.path.join(
                self.base, names["doclen_blocks"]
            )
            info["doc_span"] = int(doc_span)
            meta["doc_span"] = int(doc_span)
            meta["blocks_max_seq"] = max_seq
            meta["blocks_covered_seqs"] = cov
            meta["blocks_delta_names"] = []
            # full publish resets the delta-segment lineage: the base now
            # covers everything, and its (n, avgdl) anchor the stats-drift
            # bound adjustment of future delta segments (wand_tables)
            meta["block_segments"] = {
                "base": {"n": n, "avgdl": avgdl, "bseg": 0, "seq": max_seq}
            }
        elif old is not None and "blocks_max_seq" in old:
            # terms/docstats-only publish: carry the block family's stamps
            # AND its current (possibly versioned) directories unchanged —
            # they still describe the OLD block snapshot
            meta["doc_span"] = old.get("doc_span")
            meta["blocks_max_seq"] = old["blocks_max_seq"]
            if "blocks_covered_seqs" in old:
                meta["blocks_covered_seqs"] = old["blocks_covered_seqs"]
            if "block_segments" in old:
                meta["block_segments"] = old["block_segments"]
            if "blocks_delta_names" in old:
                meta["blocks_delta_names"] = old["blocks_delta_names"]
            for k in ("blocks", "doclen_blocks"):
                names[k] = ((old.get("artifact_dirs") or {}).get(k, k))
        meta["artifact_dirs"] = names
        self._write_meta(meta, expect_raw=meta_raw0)  # the commit point
        # retired delta dirs and superseded base versions are unreferenced
        # as of the commit; deleting them after is pure GC (a crash in
        # between leaves harmless orphans the next publish sweeps)
        gc_kinds = ["terms_delta", "docstats_delta"]
        if with_compressed:
            gc_kinds += ["blocks_delta", "doclen_delta"]
        for kind in gc_kinds:
            d = os.path.join(self.base, kind)
            if not os.path.isdir(d):
                continue
            # retire per-SUBDIR, not the family dir: a later publish_delta
            # writes new segment subdirs into the same family dir, and a
            # family-level retirement stamp would sweep those live dirs
            for nm in os.listdir(d):
                self._retire_dir(os.path.join(d, nm))
            if self.gc_grace_sec <= 0:
                shutil.rmtree(d)
        self._gc_unreferenced_base(meta)
        self.sweep_retired()
        return info

    def _cur_max_seq(self) -> int:
        seqs = [r.get("seq") for r in self.ledger()]
        return max((s for s in seqs if s is not None), default=-1)


class StoreSnapshot:
    """A pinned, consistent read view of a published store (see
    :meth:`IndexStore.snapshot`).  Holds the meta resolved at construction
    and delegates every reader to the store with that meta, so reads
    through one snapshot can never mix two publishes' artifacts.  The
    staleness probes are captured AT PIN TIME (``stale`` /
    ``blocks_stale`` attributes): a segment committed after the pin is by
    design not visible — that is what a snapshot means."""

    def __init__(self, store: IndexStore):
        self.store = store
        self.meta = store._meta()
        self.stale = store.published_stale(self.meta)
        self.blocks_stale = store.blocks_stale(self.meta)

    def published_terms(self) -> DataFrame:
        return self.store.published_terms(self.meta)

    def published_docstats(self) -> DataFrame:
        return self.store.published_docstats(self.meta)

    def corpus_stats(self) -> tuple:
        return self.store.corpus_stats(self.meta)

    def wand_tables(self, terms: DataFrame, n: int, avgdl: float):
        return self.store.wand_tables(terms, n, avgdl, self.meta)


def write_terms(terms: DataFrame, path: str) -> None:
    """Publish the dictionary partitioned by first character (SURVEY §4.3
    physical layout): fuzzy/prefix expansion scans filter on the ``first``
    partition column, so a query word's candidate scan reads only its
    first-char directory — file pruning, not a post-scan row filter.  At a
    10^9-term dictionary this turns the F6 candidate pruning
    (src/proximity.rs first-char skip) into partition-pruned I/O."""
    (
        terms.withColumn("first", F.substring("term", 1, 1))
        .write.mode("overwrite")
        .partitionBy("first")
        .parquet(path)
    )
