#!/usr/bin/env python
"""Time dedup.clean_corpus end-to-end at an sf dir (default sf0.1) —
the before/after evidence for the round-6 single-pass refactor
(one persisted token table vs round 5's per-stage re-tokenization).

Usage: PYTHONPATH=/root/repo python scripts/bench_clean_corpus.py [sf_dir] [reps]
Prints one JSON line: {"sf": ..., "n_docs": N, "runs_sec": [...], "best_sec": s}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from pyspark.sql import SparkSession

    from elipdotter_spark.operators import dedup

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    docs = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .repartition(spark.sparkContext.defaultParallelism)
        .cache()
    )
    n_docs = docs.count()
    # warm Python workers / codegen once (CLAUDE.md: ~3.5 s fork cost)
    dedup.clean_corpus(docs, lang="en", min_tokens=20,
                       min_stopword_ratio=0.02, jaccard=0.8, max_ring=8)
    runs = []
    n_kept = None
    for _ in range(reps):
        t0 = time.perf_counter()
        kept = dedup.clean_corpus(
            docs, lang="en", min_tokens=20, min_stopword_ratio=0.02,
            jaccard=0.8, max_ring=8,
        )
        n_kept = kept.count()
        runs.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({
        "sf": sf, "n_docs": n_docs, "n_kept": n_kept,
        "runs_sec": runs, "best_sec": min(runs),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
