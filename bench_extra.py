#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): times individual operators with
the same methodology as bench.py (median of N reps after warm-up) but lets a
single query be run alone, labels jobs (§1.5), and captures
``.explain("formatted")`` plans to plans/r07/.

NOT used by the driver — bench.py is the frozen measurement surface; this
file exists so optimization work can isolate one operator at a time without
paying the full bench.

Usage:
  python bench_extra.py dedup scored        # run named probes
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py dedup
Env:
  SPARK_GRAFT_SF_DIR   input dir (default /root/testdata/sf1.0)
  SPARK_GRAFT_CPUS     cores (default 32)
  BENCH_EXTRA_REPS     reps per timed query (default 3)
  BENCH_EXTRA_PLAN_TAG suffix for plan files (default "before")
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "3"))
PLAN_TAG = os.environ.get("BENCH_EXTRA_PLAN_TAG", "before")
PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r07")


def save_plan(name: str, df):
    os.makedirs(PLAN_DIR, exist_ok=True)
    with open(os.path.join(PLAN_DIR, f"{name}_{PLAN_TAG}.txt"), "w") as f:
        f.write(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        ))


def timed(spark, name, fn, reps=REPS, results=None):
    samples = []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"{name} rep{i}")
        t0 = time.perf_counter()
        fn()
        samples.append(round(time.perf_counter() - t0, 4))
        spark.sparkContext.setJobDescription(None)
    samples.sort()
    med = samples[len(samples) // 2]
    print(f"  {name}: median {med}s  samples={samples}", flush=True)
    if results is not None:
        results[name] = {"median": med, "samples": samples}
    return med


def main():
    from pyspark.sql import SparkSession, functions as F

    probes = set(sys.argv[1:]) or {"dedup"}
    shuffle = max(8, int(CPUS))
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("elipdotter-bench-extra")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    results = {}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").repartition(shuffle).cache()
    n_docs = docs.count()
    print(f"sf={SF_DIR} docs={n_docs} cpus={CPUS}", flush=True)

    from elipdotter_spark.operators import index_build as _ib

    _ib.tokens(docs).count()  # warm python workers

    if "dedup" in probes:
        from elipdotter_spark.operators import dedup

        bands = dedup.minhash_bands(docs)
        timed(spark, "dedup_minhash_bands_only", lambda: bands.count(), results=results)
        pairs = dedup.candidate_pairs(bands, max_ring=8)
        save_plan("q_dedup_pairs", pairs)
        timed(
            spark, "q_dedup_pairs",
            lambda: dedup.candidate_pairs(dedup.minhash_bands(docs), max_ring=8).count(),
            results=results,
        )

    if "scored" in probes or "fuzzy" in probes or "build" in probes:
        import tempfile

        from elipdotter_spark.operators import index_build

        def one_build():
            t0 = time.perf_counter()
            root = tempfile.mkdtemp(prefix="bex_idx_")
            path = root + "/postings"
            index_build.build_postings(docs).write.mode("overwrite").parquet(path)
            postings = spark.read.parquet(path)
            postings.count()
            terms = index_build.build_terms(postings).cache()
            terms.count()
            docstats = index_build.docstats_from_postings(postings).cache()
            docstats.count()
            return postings, terms, docstats, time.perf_counter() - t0

        if "build" in probes:
            spark.sparkContext.setJobDescription("index_build")
            postings, terms, docstats, bsec = one_build()
            print(f"  index_build: {round(bsec, 4)}s", flush=True)
            results["index_build"] = {"median": round(bsec, 4), "samples": [round(bsec, 4)]}
            spark.sparkContext.setJobDescription(None)
        else:
            postings, terms, docstats, _ = one_build()

        from elipdotter_spark.core.parser import parse
        from elipdotter_spark.plans.compiler import QueryEngine

        if "scored" in probes:
            engine = QueryEngine(
                spark, postings, terms, proximity_threshold=1.0, algo="exact"
            )
            engine.doc_ids(parse("table")).count()  # warm
            save_plan(
                "q_scored_hits",
                engine.hits(parse("table value -vector"), 1000)
                .orderBy(F.desc("rating"), F.asc("doc_id"), F.asc("start"))
                .limit(10),
            )
            timed(
                spark, "q_scored_hits",
                lambda: engine.topk("table value -vector", 1000, 10).collect(),
                reps=max(REPS, 5), results=results,
            )
        if "fuzzy" in probes:
            fuzzy = QueryEngine(
                spark, postings, terms,
                proximity_threshold=0.85, algo="hamming", word_count_limit=1000,
            )
            fuzzy.topk("tabl", 100, 1).collect()  # warm + futility probe
            timed(
                spark, "q_fuzzy_hits",
                lambda: fuzzy.topk("tabl valu", 1000, 10).collect(),
                reps=max(REPS, 5), results=results,
            )

    print(json.dumps({"sf": SF_DIR, "results": results}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
