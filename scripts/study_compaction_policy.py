#!/usr/bin/env python
"""Workload-level check of the `--compaction auto` byte-ratio policy.

The round-6 `maybe_compact_lineage(mode="auto")` picks merge vs full from
the on-disk delta/base byte ratio at each compaction event.  The open
refinement question (TODO #3): does the per-event byte probe MIS-STEER on
a real ingest+query loop, where the quantity that actually matters is the
TOTAL cost — every publish + every compaction + the read amplification
paid by every query between them?

This study runs the same ingest+query workload under four policies and
compares totals:

  none   never compact (read amplification grows with K unboundedly)
  full   maybe_compact_lineage(mode="full")  at K=4 (round-5 behavior)
  merge  maybe_compact_lineage(mode="merge") at K=4
  auto   maybe_compact_lineage(mode="auto")  at K=4 (the shipped default)

Workload: a Zipf corpus (realistic term skew), then R rounds of
(localized 1k-doc update -> publish_delta -> policy compaction -> 3 warm
WAND queries).  Per policy we report the summed publish, compaction, and
query walls, the mechanisms chosen, and final-state exactness (WAND ==
exhaustive BM25 with current stats).

Reading the result: `auto` is vindicated if its total is within noise of
min(full, merge) — i.e. the zero-job byte probe loses nothing a
read-amp-aware policy could win on this workload.  If `auto` trails the
best policy materially, THAT is the measured motivation the backlog item
asks for before building a long-horizon policy.

Usage:
  PYTHONPATH=/root/repo python scripts/study_compaction_policy.py \
      [workdir] [--docs 200000] [--rounds 10] [--update 1000]
Prints one JSON line.
"""

import argparse
import json
import os
import shutil
import sys
import time

from pyspark.sql import SparkSession, functions as F


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir", nargs="?", default="/tmp/elipdotter_policy_study")
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--rounds", type=int, default=10)
    ap.add_argument("--update", type=int, default=1000)
    ap.add_argument("--max-delta-segments", type=int, default=4)
    args = ap.parse_args()
    shutil.rmtree(args.workdir, ignore_errors=True)
    os.makedirs(args.workdir, exist_ok=True)

    from elipdotter_spark.operators import bm25, codec
    from elipdotter_spark.sources.catalog import IndexStore
    from elipdotter_spark.sources.corpus import zipf_corpus

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    vocab = max(5000, args.docs // 10)
    base_docs = zipf_corpus(spark, n_docs=args.docs, vocab_size=vocab, doc_len=60)
    # materialize once so the 4 per-policy segment writes don't re-derive
    base_path = os.path.join(args.workdir, "base_docs.parquet")
    base_docs.write.mode("overwrite").parquet(base_path)
    base_docs = spark.read.parquet(base_path)

    # per-round localized updates: a moving 1k-doc window re-written with
    # DIFFERENT zipf text (seeded), plus a few fresh arrivals so n drifts
    def update_df(r):
        upd = zipf_corpus(
            spark, n_docs=args.update, vocab_size=vocab, doc_len=60,
            partitions=8, seed=1000 + r,
        ).withColumn("doc_id", F.col("doc_id") + F.lit(r * args.update))
        fresh = zipf_corpus(
            spark, n_docs=50, vocab_size=vocab, doc_len=60,
            partitions=2, seed=5000 + r,
        ).withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000 + r * 50))
        return upd.unionByName(fresh)

    qterms = ["t1", "t80", "t3000"]

    def wand_once(store):
        terms = store.published_terms()
        n, avgdl = store.corpus_stats()
        comp, dlb = store.wand_tables(terms, n, avgdl)
        return codec.bm25_topk_wand(comp, dlb, terms, qterms, 10, n, avgdl).collect()

    def wand_median3(store):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            wand_once(store)
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[1]

    def assert_exact(store):
        postings = store.merged_postings()
        terms = store.published_terms()
        ds = store.published_docstats()
        n, avgdl = store.corpus_stats()
        want = [
            (r.doc_id, round(r.score, 9))
            for r in bm25.bm25_topk(
                postings, ds, terms, qterms, 10, n=n, avgdl=avgdl
            ).collect()
        ]
        comp, dlb = store.wand_tables(terms, n, avgdl)
        got = [
            (r.doc_id, round(r.score, 9))
            for r in codec.bm25_topk_wand(
                comp, dlb, terms, qterms, 10, n, avgdl
            ).collect()
        ]
        return got == want

    policies = ("none", "full", "merge", "auto")
    out = {}
    for pol in policies:
        sdir = os.path.join(args.workdir, f"store-{pol}")
        store = IndexStore(spark, sdir)
        store.write_segment("seg-base", base_docs)
        t0 = time.perf_counter()
        store.publish()
        base_publish_s = time.perf_counter() - t0
        wand_once(store)  # warm the read path before any timing

        sums = {"publish_s": 0.0, "compact_s": 0.0, "query_s": 0.0}
        mechanisms = []
        lat = []
        for r in range(args.rounds):
            store.write_segment(f"seg-upd-{r:03d}", update_df(r))
            t0 = time.perf_counter()
            try:
                store.publish_delta()
            except ValueError:
                store.publish()
            sums["publish_s"] += time.perf_counter() - t0
            if pol != "none":
                t0 = time.perf_counter()
                info = store.maybe_compact_lineage(
                    max_delta_segments=args.max_delta_segments, mode=pol
                )
                dt = time.perf_counter() - t0
                if info is not None:
                    sums["compact_s"] += dt
                    mechanisms.append("merge" if "merged" in info else "full")
            t0 = time.perf_counter()
            m = wand_median3(store)
            sums["query_s"] += time.perf_counter() - t0
            lat.append(round(m, 3))
        delta_b, base_b = store.lineage_bytes()
        out[pol] = {
            "base_publish_s": round(base_publish_s, 2),
            "publish_s": round(sums["publish_s"], 2),
            "compact_s": round(sums["compact_s"], 2),
            "query_s": round(sums["query_s"], 2),
            "total_s": round(sum(sums.values()), 2),
            "mechanisms": mechanisms,
            "final_k": store.delta_segment_count(),
            "final_byte_ratio": round(delta_b / base_b, 4) if base_b else None,
            "wand_latency_per_round_s": lat,
            "final_exact": assert_exact(store),
        }
        print(json.dumps({pol: out[pol]}), file=sys.stderr)

    best = min(
        (p for p in policies if p != "none"), key=lambda p: out[p]["total_s"]
    )
    out["verdict"] = {
        "best_policy": best,
        "auto_vs_best_pct": round(
            100.0 * (out["auto"]["total_s"] / out[best]["total_s"] - 1.0), 1
        ),
        "docs": args.docs,
        "rounds": args.rounds,
        "update": args.update,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
