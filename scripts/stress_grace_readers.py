#!/usr/bin/env python
"""Multi-PROCESS reader/writer stress for the grace-window store.

The point of ``IndexStore(gc_grace_sec=N)`` + ``store.snapshot()`` is that
on a multi-reader cluster a publish must never unlink files under a query
mid-scan on the previous snapshot, and a multi-read sequence must never
mix two snapshots.  The pytest suite proves the logic with simulated
interleavings in ONE process; this script proves it with real concurrency:
separate JVMs, separate SparkSessions, a writer hammering the store with
delta publishes / full publishes (lineage resets) / segment compactions /
expired-window sweeps while readers continuously pin snapshots and
re-collect them.

Each reader, in a loop for the run duration:
  - pins ``store.snapshot()`` (skipping stale pins mid-ingest);
  - collects the pinned dictionary, corpus stats, and a WAND top-k;
  - RE-collects the same pinned DataFrames up to ``hold_sec`` later —
    while the writer may have superseded and (for older versions) swept
    the dirs underneath — and asserts bit-identical results within the
    pin.  Any read error (FileNotFound from a premature delete) or
    within-pin mismatch is a failure.

The writer alternates delta publish / full publish / compact() across
``iters`` ingests of doc updates, sweeping expired retired dirs each
round, then verifies final WAND == exhaustive BM25 on the final corpus.

Soundness requires grace >= the readers' max pin-to-last-read span
(``hold_sec``); the default run uses grace 30 s vs hold <= 8 s, so sweeps
DO delete older retired versions while readers hold newer ones.

Usage:
  PYTHONPATH=/root/repo python scripts/stress_grace_readers.py \
      [workdir] [--readers 2] [--iters 8] [--grace 30] [--hold 8]
Prints one JSON line; exit 0 iff every reader saw zero anomalies and the
final state is exact.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

READER_SNIPPET = r"""
import json, random, sys, time
from pyspark.sql import SparkSession

store_dir, duration, hold = sys.argv[1], float(sys.argv[2]), float(sys.argv[3])
seed = int(sys.argv[4])
rng = random.Random(seed)
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .appName(f"grace-reader-{seed}").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from elipdotter_spark.operators import codec
from elipdotter_spark.sources.catalog import IndexStore

store = IndexStore(spark, store_dir)
t_end = time.time() + duration
pins = reads = stale_skips = 0
try:
    while time.time() < t_end:
        snap = store.snapshot()
        if snap.stale or snap.blocks_stale:
            # mid-ingest window between a segment commit and its publish:
            # a live-derivation fallback is the CLI's job; here we only
            # exercise the published path
            stale_skips += 1
            time.sleep(0.3)
            continue
        pins += 1
        terms = snap.published_terms()
        n, avgdl = snap.corpus_stats()
        comp, dlb = snap.wand_tables(terms, n, avgdl)
        topk = codec.bm25_topk_wand(comp, dlb, terms, ["common", "table"],
                                    10, n, avgdl)
        first_terms = sorted((r.term, r.df, r.cf) for r in terms.collect())
        first_topk = [(r.doc_id, round(r.score, 9)) for r in topk.collect()]
        assert first_terms and n > 0, "empty pinned read"
        reads += 1
        # hold the pin across writer activity and re-collect: the grace
        # window must keep every file of THIS snapshot alive
        t_hold_end = time.time() + rng.uniform(hold / 2, hold)
        while time.time() < min(t_hold_end, t_end):
            time.sleep(rng.uniform(0.3, 1.0))
            again_terms = sorted((r.term, r.df, r.cf) for r in terms.collect())
            again_topk = [(r.doc_id, round(r.score, 9)) for r in topk.collect()]
            assert again_terms == first_terms, "pinned dictionary changed"
            assert again_topk == first_topk, "pinned WAND top-k changed"
            reads += 1
except Exception as e:  # noqa: BLE001 - any anomaly is the signal
    print(json.dumps({"ok": False, "seed": seed, "pins": pins,
                      "reads": reads, "error": repr(e)[:500]}))
    sys.exit(1)
print(json.dumps({"ok": True, "seed": seed, "pins": pins, "reads": reads,
                  "stale_skips": stale_skips}))
sys.exit(0)
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/elipdotter_grace_stress")
    ap.add_argument("--readers", type=int, default=2)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--grace", type=float, default=30.0)
    ap.add_argument("--hold", type=float, default=8.0)
    args = ap.parse_args()
    work = args.workdir
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work, exist_ok=True)
    store_dir = os.path.join(work, "store")

    from pyspark.sql import SparkSession

    from elipdotter_spark.operators import bm25, codec
    from elipdotter_spark.sources.catalog import IndexStore

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("grace-writer")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def docs_df(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    base_rows = [
        (i, f"common table words doc number{i % 7} filler value") for i in range(400)
    ]
    store = IndexStore(spark, store_dir, gc_grace_sec=args.grace)
    store.write_segment("seg-base", docs_df(base_rows))
    store.publish(doc_span=64)

    # run the readers long enough to cover every writer iteration
    duration = max(60.0, args.iters * 12.0)
    reader_script = os.path.join(work, "reader.py")
    with open(reader_script, "w") as fh:
        fh.write(READER_SNIPPET)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    readers = [
        subprocess.Popen(
            [sys.executable, reader_script, store_dir, str(duration),
             str(args.hold), str(100 + i)],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, env=env, text=True,
        )
        for i in range(args.readers)
    ]
    # let every reader JVM come up and pin at least once before writing
    time.sleep(20)

    writer_log = []
    t0 = time.time()
    for it in range(args.iters):
        upd = [
            (i % 400, f"common table updated round{it} value padding words")
            for i in range(it * 13, it * 13 + 10)
        ] + [(1000 + it, f"common fresh arrival{it} table text")]
        store.write_segment(f"seg-upd-{it:03d}", docs_df(upd))
        mode = ("delta", "full", "compactseg")[it % 3]
        if mode == "delta":
            try:
                info = store.publish_delta()
            except ValueError:
                info, mode = store.publish(doc_span=64), "full"
        elif mode == "full":
            info = store.publish(doc_span=64)
        else:
            store.compact()  # physical segment rewrite under readers
            info, mode = store.publish(doc_span=64), "compact+full"
        swept = store.sweep_retired()
        writer_log.append({"iter": it, "mode": mode, "swept": swept})
        time.sleep(3)
    writer_wall = time.time() - t0

    results = []
    for p in readers:
        out, _ = p.communicate(timeout=duration + 120)
        line = out.strip().splitlines()[-1] if out.strip() else "{}"
        r = json.loads(line)
        r["exit"] = p.returncode
        results.append(r)

    # final exactness: published WAND == exhaustive BM25 on the live ledger
    postings = store.merged_postings()
    terms = store.published_terms()
    docstats = store.published_docstats()
    n, avgdl = store.corpus_stats()
    n_agg, avgdl_agg = bm25.corpus_stats(docstats)
    counters_exact = (n, round(avgdl, 9)) == (n_agg, round(avgdl_agg, 9))
    want = [
        (r.doc_id, round(r.score, 9))
        for r in bm25.bm25_topk(
            postings, docstats, terms, ["common", "table"], 10, n=n, avgdl=avgdl
        ).collect()
    ]
    comp, dlb = store.wand_tables(terms, n, avgdl)
    got = [
        (r.doc_id, round(r.score, 9))
        for r in codec.bm25_topk_wand(
            comp, dlb, terms, ["common", "table"], 10, n, avgdl
        ).collect()
    ]
    # after the run every stamp older than grace is sweepable; one final
    # aged sweep must leave a store with no retired dirs at all
    time.sleep(max(0.0, args.grace - 3))
    final_swept = store.sweep_retired()
    leftover_retired = sum(
        1 for root, _d, files in os.walk(store_dir) if ".retired" in files
    )

    ok = (
        all(r.get("ok") and r["exit"] == 0 for r in results)
        and counters_exact
        and got == want
        and leftover_retired == 0
    )
    print(json.dumps({
        "ok": ok,
        "grace_sec": args.grace,
        "readers": results,
        "writer": {"iters": args.iters, "wall_s": round(writer_wall, 1),
                   "log": writer_log},
        "final": {"wand_exact": got == want, "counters_exact": counters_exact,
                  "n_docs": n, "final_swept": final_swept,
                  "leftover_retired": leftover_retired},
    }))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
