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

    if "pipeline" in probes:
        from elipdotter_spark.operators import dedup, text_analysis

        timed(
            spark, "q_tfidf_topk",
            lambda: text_analysis.tfidf_topk(docs, k=3)
            .agg(F.count("*"), F.sum("tf")).collect(),
            reps=5, results=results,
        )
        timed(
            spark, "q_lm_score",
            lambda: text_analysis.unigram_logprob(docs)
            .agg(F.count("*"), F.sum("n_tokens")).collect(),
            reps=5, results=results,
        )
        timed(
            spark, "q_dup_spans",
            lambda: dedup.dup_spans(docs, n=4, min_docs=2)
            .agg(F.count("*"), F.sum("n_grams")).collect(),
            results=results,
        )
        ev = docs.filter(F.pmod(F.col("doc_id"), F.lit(53)) == 0)
        tr = docs.filter(F.pmod(F.col("doc_id"), F.lit(53)) != 0)
        timed(
            spark, "q_decontam",
            lambda: dedup.decontaminate(tr, ev, n=5)
            .agg(F.sum(F.col("contaminated").cast("long"))).collect(),
            results=results,
        )
        timed(
            spark, "q_pii_scrub",
            lambda: text_analysis.pii_redact(docs)
            .agg(F.sum("n_email"), F.sum("n_ipv4"), F.sum("n_phone")).collect(),
            reps=5, results=results,
        )
        timed(
            spark, "q_gopher_rules",
            lambda: text_analysis.gopher_rules(
                docs, min_tokens=40, stop_words=["a", "table", "data", "scan"]
            ).agg(F.sum(F.col("passes").cast("long"))).collect(),
            reps=5, results=results,
        )

    if "web" in probes:
        from elipdotter_spark.operators import html as _html, urls as _urls

        url_docs = _urls.synth_urls(docs.select("doc_id"))
        timed(
            spark, "q_url_dedup",
            lambda: _urls.url_dedup(url_docs)
            .agg(F.count("*"), F.sum("n_dups")).collect(),
            reps=5, results=results,
        )
        crawl_pages = _html.synth_crawl_pages(docs.select("doc_id", "text"))
        timed(
            spark, "q_html_extract",
            lambda: _html.crawl_ingest(crawl_pages)
            .agg(F.count("*"), F.sum("n_crawls"), F.sum(F.length("text_clean")))
            .collect(),
            reps=5, results=results,
        )
        timed(
            spark, "q_anchor_terms",
            lambda: _html.anchor_terms(crawl_pages)
            .agg(F.count("*"), F.sum("n_anchors")).collect(),
            reps=5, results=results,
        )

    if "bm25q" in probes or "annq" in probes:
        import tempfile as _tf2

        from elipdotter_spark.operators import ann, bm25, index_build as _ib2

        r2 = _tf2.mkdtemp(prefix="bex_idx2_")
        _ib2.build_postings(docs).write.mode("overwrite").parquet(r2 + "/postings")
        postings = spark.read.parquet(r2 + "/postings"); postings.count()
        terms = _ib2.build_terms(postings).cache(); terms.count()
        docstats = _ib2.docstats_from_postings(postings).cache(); docstats.count()
        n, avgdl = bm25.corpus_stats(docstats)
        batch8 = {
            1: ["spark", "fast"], 2: ["table", "value"], 3: ["vector"],
            4: ["stream", "data"], 5: ["fast", "table"], 6: ["spark", "vector"],
            7: ["query", "join"], 8: ["data", "value", "fast"],
        }
        if "bm25q" in probes:
            bm25.bm25_topk(postings, docstats, terms, ["spark"], 10, n=n, avgdl=avgdl).collect()
            save_plan(
                "q_bm25_top10",
                bm25.bm25_topk(postings, docstats, terms, ["spark", "fast", "table"], 10, n=n, avgdl=avgdl),
            )
            timed(
                spark, "q_bm25_top10",
                lambda: bm25.bm25_topk(
                    postings, docstats, terms, ["spark", "fast", "table"], 10,
                    n=n, avgdl=avgdl,
                ).collect(),
                reps=5, results=results,
            )
            timed(
                spark, "q_bm25_sequential8",
                lambda: [
                    bm25.bm25_topk(postings, docstats, terms, q, 10, n=n, avgdl=avgdl)
                    .collect() for q in batch8.values()
                ],
                reps=5, results=results,
            )
            timed(
                spark, "q_bm25_batch8",
                lambda: bm25.bm25_topk_batch(
                    postings, docstats, terms, batch8, 10, n=n, avgdl=avgdl
                ).collect(),
                reps=5, results=results,
            )
        if "annq" in probes:
            emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").repartition(8)
            emb.count()
            qvec = emb.filter(F.col("vec_id") == 0).first().embedding
            buckets = ann.lsh_buckets_tables(emb).cache(); buckets.count()
            ann.topk_lsh_tables(emb, buckets, qvec, 10).collect()
            timed(
                spark, "q_ann_topk",
                lambda: ann.topk_lsh_tables(emb, buckets, qvec, 10).collect(),
                results=results,
            )
            qvecs = {
                r["vec_id"]: r["embedding"]
                for r in emb.filter(F.col("vec_id") < 8).collect()
            }
            timed(
                spark, "q_ann_sequential8",
                lambda: [
                    ann.topk_bruteforce(emb, v, 10).collect() for v in qvecs.values()
                ],
                reps=5, results=results,
            )
            timed(
                spark, "q_ann_batch8",
                lambda: ann.cosine_topk_batch(emb, qvecs, 10).collect(),
                reps=5, results=results,
            )

    print(json.dumps({"sf": SF_DIR, "results": results}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
