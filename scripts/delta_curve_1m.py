#!/usr/bin/env python
"""Delta-lineage cost curve at 1M docs: publish cost + query latency vs
stacked delta-segment count K.

Answers two round-5 questions with one run:
- **Is publish_delta delta-proportional now?**  Round 5 made the narrow
  terms/docstats tables delta segments (no more corpus-proportional
  rewrite — the 10.9 s floor of round 4), so a 1,000-doc update's publish
  cost should be roughly flat across rounds and scale with the update
  size, not the corpus.  A final 10x-sized update measures the scaling in
  the delta-size axis directly.
- **Where is the read-amplification knee?**  Every query through
  wand_tables()/published_terms() unions base + K delta segments and
  re-resolves per-(term, block) latest-wins, so warm WAND latency grows
  with K while each publish stays cheap — the classic LSM trade.  The
  measured curve sets the default of IndexStore.maybe_publish_full
  (documented in BENCH.md).

Exactness (WAND == exhaustive BM25 with current stats) is asserted at
K = 1, mid, and max — not every round, to keep the run ~10 min.

Usage: PYTHONPATH=/root/repo python scripts/delta_curve_1m.py [workdir] [K]
"""

import json
import shutil
import sys
import time

from pyspark.sql import SparkSession, functions as F


def main() -> int:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/elipdotter_delta_curve"
    max_k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    shutil.rmtree(work, ignore_errors=True)

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

    docs = zipf_corpus(spark, n_docs=1_000_000, vocab_size=50_000, doc_len=60)
    store = IndexStore(spark, work)
    store.write_segment("seg-0000", docs)
    t0 = time.perf_counter()
    store.publish()
    full_publish_s = time.perf_counter() - t0

    q = ["t1", "t800", "t30000"]

    def wand_once():
        terms = store.published_terms()
        n, avgdl = store.corpus_stats()
        comp, dlb = store.wand_tables(terms, n, avgdl)
        return codec.bm25_topk_wand(comp, dlb, terms, q, 10, n, avgdl).collect()

    def wand_median3():
        wand_once()  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            wand_once()
            ts.append(time.perf_counter() - t0)
        return round(sorted(ts)[1], 3)

    def assert_exact():
        postings = store.merged_postings()
        terms = store.published_terms()
        ds = store.published_docstats()
        n, avgdl = store.corpus_stats()
        want = [
            (r.doc_id, round(r.score, 9))
            for r in bm25.bm25_topk(
                postings, ds, terms, q, 10, n=n, avgdl=avgdl
            ).collect()
        ]
        got = [(r.doc_id, round(r.score, 9)) for r in wand_once()]
        assert got == want, f"WAND != exhaustive at K={store.delta_segment_count()}"

    curve = [{"k": 0, "wand_warm_sec_median": wand_median3()}]
    check_at = {1, max(1, max_k // 2), max_k}
    for k in range(1, max_k + 1):
        lo = k * 1000
        upd = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 1000)
        ).withColumn("text", F.concat(F.lit(f"updated round{k} tnew "), F.col("text")))
        store.write_segment(f"seg-upd-{k:02d}", upd)
        t0 = time.perf_counter()
        info = store.publish_delta()
        dt = time.perf_counter() - t0
        point = {
            "k": k,
            "segment": info["delta"],
            "publish_delta_sec": round(dt, 2),
            "wand_warm_sec_median": wand_median3(),
        }
        if k in check_at:
            assert_exact()
            point["exact_vs_exhaustive"] = True
        curve.append(point)
        print(json.dumps({"progress": point}), file=sys.stderr)

    # delta-size axis: one 10x update (10,000 docs) — if publish cost is
    # delta-proportional, expect ~10x the 1,000-doc cost, nowhere near the
    # full-publish cost
    upd = docs.filter(
        (F.col("doc_id") >= 500_000) & (F.col("doc_id") < 510_000)
    ).withColumn("text", F.concat(F.lit("updated big tnew "), F.col("text")))
    store.write_segment("seg-upd-big", upd)
    t0 = time.perf_counter()
    store.publish_delta()
    big_delta_s = time.perf_counter() - t0
    assert_exact()

    # round 6: LSM pairwise merge vs the O(corpus) full publish as the
    # lineage-compaction mechanism.  compact_deltas merges the K stacked
    # delta families into one (latest-wins materialization, base
    # untouched) — expect cost proportional to the DELTA LINEAGE (the
    # ~K*1000+10000 updated docs' blocks), nowhere near full_publish_sec,
    # with warm WAND dropping back to ~the K=1 latency and exactness
    # preserved bit-for-bit.
    wand_before_merge = wand_median3()
    k_before = store.delta_segment_count()
    bytes_before = store.lineage_bytes()
    t0 = time.perf_counter()
    merged = store.compact_deltas()
    merge_s = time.perf_counter() - t0
    wand_after_merge = wand_median3()
    bytes_after = store.lineage_bytes()
    assert_exact()

    print(json.dumps({
        "n_docs": 1_000_000,
        "update_docs_per_round": 1000,
        "full_publish_sec": round(full_publish_s, 2),
        "curve": curve,
        "big_delta": {
            "updated_docs": 10_000,
            "publish_delta_sec": round(big_delta_s, 2),
            "exact_vs_exhaustive": True,
        },
        "compact_deltas": {
            "merged_segments": k_before,
            "merged_name": merged["merged"],
            "compact_sec": round(merge_s, 2),
            "full_publish_sec_for_reference": round(full_publish_s, 2),
            "wand_warm_sec_before": wand_before_merge,
            "wand_warm_sec_after": wand_after_merge,
            "exact_vs_exhaustive": True,
        },
        # the `--compaction auto` signal at real size: on-disk delta/base
        # byte ratio before and after the merge (zero-job fs probe) — the
        # default auto_full_fraction=0.5 should read this workload
        # (K*1000+10000 touched docs of 1M) as firmly in merge territory
        "lineage_bytes": {
            "before_merge": {
                "delta": bytes_before[0],
                "base": bytes_before[1],
                "ratio": round(bytes_before[0] / max(1, bytes_before[1]), 4),
            },
            "after_merge": {
                "delta": bytes_after[0],
                "base": bytes_after[1],
                "ratio": round(bytes_after[0] / max(1, bytes_after[1]), 4),
            },
        },
    }))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
