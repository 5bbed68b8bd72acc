#!/usr/bin/env python
"""Headline benchmark: index-build throughput + query latency + scaling.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Env:
  SPARK_GRAFT_SF_DIR   input dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     cores for the main run (default 32)
  BENCH_SCALING=1      additionally run the index build at local[8] and
                       local[32] on identical input and report throughput at
                       both + scaling efficiency (north-rule evidence; see
                       BENCH/BASELINE.md)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def make_spark(cpus: str, shuffle_partitions: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"elipdotter-bench-{cpus}")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def build_index_timed(spark, docs):
    """Index build: tokenize -> postings -> terms/docstats, forced via count."""
    from elipdotter_spark.operators import index_build

    t0 = time.perf_counter()
    postings = index_build.build_postings(docs).cache()
    n_postings = postings.count()
    terms = index_build.build_terms(postings).cache()
    terms.count()
    docstats = index_build.docstats_from_postings(postings).cache()
    docstats.count()
    dt = time.perf_counter() - t0
    return postings, terms, docstats, dt, n_postings


def run_queries(spark, postings, terms, docstats):
    """Headline query set over the built index (timed individually)."""
    from pyspark.sql import functions as F

    from elipdotter_spark.core.parser import parse
    from elipdotter_spark.operators import bm25
    from elipdotter_spark.plans.compiler import QueryEngine

    n, avgdl = bm25.corpus_stats(docstats)
    engine = QueryEngine(spark, postings, terms, proximity_threshold=1.0, algo="exact")
    fuzzy = QueryEngine(
        spark, postings, terms,
        proximity_threshold=0.85, algo="hamming", word_count_limit=1000,
    )

    # warm the Python worker pool + codegen once so query timings reflect
    # steady-state latency rather than executor spin-up
    engine.doc_ids(parse("table")).count()
    fuzzy.topk("tabl", 100, 1).collect()

    timings = {}
    percentiles = {}

    def timed(name, fn, reps=1):
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        timings[name] = round(samples[len(samples) // 2], 4)  # median
        if reps > 1:
            percentiles[name] = {
                "p50": round(samples[len(samples) // 2], 4),
                "p95": round(samples[min(len(samples) - 1, int(len(samples) * 0.95))], 4),
                "n": reps,
            }

    timed("q_bool_and", lambda: engine.doc_ids(parse("table value fast")).count())
    timed("q_bool_or", lambda: engine.doc_ids(parse("table or vector or stream")).count())
    timed("q_bool_andnot", lambda: engine.doc_ids(parse("table -vector")).count())
    timed(
        "q_bm25_top10",
        lambda: bm25.bm25_topk(
            postings, docstats, terms, ["spark", "fast", "table"], 10, n=n, avgdl=avgdl
        ).collect(),
        reps=7,
    )
    timed(
        "q_scored_hits",
        lambda: engine.topk("table value -vector", 1000, 10).collect(),
        reps=5,
    )
    timed(
        "q_fuzzy_hits",
        lambda: fuzzy.topk("tabl valu", 1000, 10).collect(),
        reps=5,
    )
    timed(
        "q_dict_prefix",
        lambda: terms.filter(F.col("term").startswith("v")).count(),
    )
    return timings, percentiles


def replicate(docs, k: int):
    """Deterministically replicate the corpus k times with offset doc ids
    (compute-dominated input for the scaling runs)."""
    from pyspark.sql import functions as F

    n = docs.count()
    return (
        docs.repartition(64)  # the sf parquet is a single file/partition
        .select(
            "doc_id", "text", F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("k")
        )
        .select((F.col("doc_id") + F.col("k") * n).alias("doc_id"), "text")
    )


def one_run(cpus: str, replicate_k: int = 1, queries: bool = True):
    shuffle = max(8, int(cpus) if str(cpus).isdigit() else 32)
    spark = make_spark(cpus, shuffle)
    try:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        if replicate_k > 1:
            docs = replicate(docs, replicate_k)
        else:
            # the sf parquet is one small file -> one input partition; spread
            # it so tokenization parallelizes (a real corpus has many files)
            docs = docs.repartition(shuffle)
        docs = docs.cache()
        n_docs = docs.count()
        postings, terms, docstats, build_s, n_postings = build_index_timed(spark, docs)
        timings, percentiles = (
            run_queries(spark, postings, terms, docstats) if queries else ({}, {})
        )
        return {
            "n_docs": n_docs,
            "n_postings": n_postings,
            "build_sec": round(build_s, 4),
            "docs_per_sec": round(n_docs / build_s, 2),
            "postings_per_sec": round(n_postings / build_s, 2),
            "queries": timings,
            "percentiles": percentiles,
        }
    finally:
        spark.stop()


def cpu_ceiling(n_lo: int, n_hi: int) -> float:
    """Empirical max N->4N efficiency of THIS box for embarrassingly
    parallel CPU work (the sandbox's advertised cores are throttled/shared,
    so even perfect code cannot reach efficiency 1.0 in-box; a real
    multi-executor cluster has per-host memory controllers instead).
    Runs n identical pure-python processes and compares throughput."""
    import subprocess
    import sys as _sys

    code = "x=0\nfor i in range(30_000_000): x+=i\n"

    def thr(n: int) -> float:
        t0 = time.perf_counter()
        ps = [
            subprocess.Popen([_sys.executable, "-c", code]) for _ in range(n)
        ]
        for p in ps:
            p.wait()
        return n / (time.perf_counter() - t0)

    thr(2)  # warm frequency governor
    lo, hi = thr(n_lo), thr(n_hi)
    return (hi / lo) / (n_hi / n_lo)


def scaling_evidence() -> dict:
    """North-rule evidence: identical (replicated, compute-dominated) input
    at two parallelism levels N and 4N.  N=2 -> 4N=8 by default (widths where
    the sandbox's CPU throttling distorts least; ceiling reported so the
    efficiency can be judged against what the hardware itself allows)."""
    k = int(os.environ.get("BENCH_SCALE_FACTOR", "32"))
    n_lo = int(os.environ.get("BENCH_SCALE_LO", "2"))
    n_hi = 4 * n_lo
    lo = one_run(str(n_lo), replicate_k=k, queries=False)
    hi = one_run(str(n_hi), replicate_k=k, queries=False)
    eff = (lo["build_sec"] / hi["build_sec"]) / 4.0
    ceiling = cpu_ceiling(n_lo, n_hi)
    return {
        "replicate_k": k,
        "n_docs": lo["n_docs"],
        "n_lo": n_lo,
        "n_hi": n_hi,
        "lo_docs_per_sec": lo["docs_per_sec"],
        "hi_docs_per_sec": hi["docs_per_sec"],
        "lo_build_sec": lo["build_sec"],
        "hi_build_sec": hi["build_sec"],
        "efficiency": round(eff, 3),
        "hw_ceiling_efficiency": round(ceiling, 3),
        "efficiency_vs_ceiling": round(min(1.0, eff / ceiling), 3),
    }


def main():
    main_run = one_run(CPUS)
    queries = dict(main_run["queries"])
    queries["index_build"] = main_run["build_sec"]

    result = {
        "metric": "fulltext index build + query latency",
        "value": main_run["build_sec"],
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "docs_per_sec": main_run["docs_per_sec"],
        "postings_per_sec": main_run["postings_per_sec"],
        "percentiles": main_run["percentiles"],
        "cpus": CPUS,
    }

    if os.environ.get("BENCH_SCALING") == "1":
        result["scaling"] = scaling_evidence()

    print(json.dumps(result))


if __name__ == "__main__":
    main()
