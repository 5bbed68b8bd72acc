#!/usr/bin/env python
"""1M-doc scale probes for the pipeline operators (session-5 + session-7 sets).

Replicates the sf0.1 documents corpus ~200x (offset ids, distinct text per
replica suffix-free — the same deterministic replicate shape the bench's
scaling runs use) to ~1M docs, then times each operator end-to-end and
reports per-op throughput:

  - pii_redact: scan-bound scrub, docs/sec (the front door's ceiling)
  - ngram_freq: corpus bigram mining (map-side-combined agg + TakeOrdered)
  - decontaminate: 1M train vs a ~19k-doc eval split, broadcast gram join
  - pack_sequences: per-bucket cumsum windows, 64 buckets
  - c4_rules: C4 battery (explode + one doc-keyed aggregate)
  - tfidf_topk: two hash aggregates + per-doc top-k window
  - lm_score: unigram model aggregate + broadcast scoring join
  - sample_budget: per-source cumulative-sum windows (20 sources)
  - quantize: int8 audit over ~1M replicated embedding vectors (no shuffle)
  - html_extract / crawl_ingest / url_dedup / domain_block /
    domain_rank_10: session-8 crawl front door + URL/webgraph ops over a
    synthesized 1M-row input_hint pages table

Prints ONE JSON line.  Run standalone (never concurrently with the bench):
  PYTHONPATH=/root/repo python scripts/bench_pipeline_1m.py [replicas]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    from pyspark.sql import SparkSession, functions as F

    from elipdotter_spark.operators import dedup, text_analysis

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("pipeline-1m")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n0 = docs.count()
    big = (
        docs.repartition(64)
        .select(
            "doc_id",
            "text",
            "source",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("rep"),
        )
        .select(
            (F.col("doc_id") + F.col("rep") * n0).alias("doc_id"),
            "text",
            "source",
        )
    )
    # materialize once to parquet so every probe reads the same on-disk
    # input (array/cache pitfalls avoided; matches the production shape)
    import tempfile

    root = tempfile.mkdtemp(prefix="pipe1m_")
    big.write.mode("overwrite").parquet(root + "/docs")
    docs1m = spark.read.parquet(root + "/docs")
    n = docs1m.count()

    out = {"n_docs": n, "replicas": k, "sf_dir": SF_DIR}

    def timed(name, fn, reps=3):
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        med = samples[len(samples) // 2]
        out[name + "_sec"] = round(med, 3)
        out[name + "_docs_per_sec"] = int(n / med)

    # warm codegen + FS cache
    docs1m.agg(F.sum(F.length("text"))).collect()

    timed(
        "pii_scrub",
        lambda: text_analysis.pii_redact(docs1m)
        .agg(F.sum("n_email"), F.sum("n_ipv4"), F.sum("n_phone"))
        .collect(),
    )
    timed(
        "ngram_freq",
        lambda: text_analysis.ngram_freq(docs1m, n=2, k=100).collect(),
    )
    ev = docs1m.filter(F.pmod(F.col("doc_id"), F.lit(53)) == 0)
    tr = docs1m.filter(F.pmod(F.col("doc_id"), F.lit(53)) != 0)
    timed(
        "decontam",
        lambda: dedup.decontaminate(tr, ev, n=5)
        .agg(F.sum(F.col("contaminated").cast("long")))
        .collect(),
    )
    timed(
        "pack",
        lambda: text_analysis.pack_sequences(docs1m, budget=2048, n_buckets=64)
        .agg(F.max("chunk_last"), F.sum("n_tokens"))
        .collect(),
    )
    # session-7 ops
    timed(
        "c4_rules",
        lambda: text_analysis.c4_rules(docs1m)
        .agg(F.sum(F.col("keep_doc").cast("long")), F.sum("n_kept"))
        .collect(),
    )
    timed(
        "tfidf_topk",
        lambda: text_analysis.tfidf_topk(docs1m, k=3)
        .agg(F.count("*"), F.sum("tf"))
        .collect(),
    )
    timed(
        "lm_score",
        lambda: text_analysis.unigram_logprob(docs1m)
        .agg(F.count("*"), F.sum("n_tokens"))
        .collect(),
    )
    timed(
        "sample_budget",
        lambda: text_analysis.sample_to_budget(
            docs1m, {"src0": 10**7}, default_budget=10**6
        )
        .agg(F.sum(F.col("kept").cast("long")), F.sum("n_tokens"))
        .collect(),
    )
    # session-8 web ops: synthesize an input_hint pages table (1 crawl
    # variant set per doc — 3 docs share a canonical page) and time the
    # crawl front door + URL/graph ops over it
    from elipdotter_spark.operators import html as html_ops
    from elipdotter_spark.operators import urls as urls_ops
    from elipdotter_spark.operators import webgraph

    html_ops.synth_crawl_pages(docs1m.select("doc_id", "text")).drop(
        "warc_epoch"
    ).write.mode("overwrite").parquet(root + "/pages")
    pages1m = spark.read.parquet(root + "/pages")
    out["n_pages_in"] = pages1m.count()
    timed(
        "html_extract",
        lambda: html_ops.html_to_text(pages1m)
        .agg(F.sum(F.length("extracted")),
             F.sum(F.col("has_markup").cast("long")))
        .collect(),
    )
    timed(
        "crawl_ingest",
        lambda: html_ops.crawl_ingest(pages1m)
        .agg(F.count("*"), F.sum(F.length("text_clean")))
        .collect(),
    )
    timed(
        "url_dedup",
        lambda: urls_ops.url_dedup(pages1m)
        .agg(F.count("*"), F.sum("n_dups"))
        .collect(),
    )
    timed(
        "domain_block",
        lambda: urls_ops.block_domains(pages1m, ["site0.com", "site5.org"])
        .agg(F.sum(F.col("blocked").cast("long")))
        .collect(),
    )
    timed(
        "domain_rank_10",
        lambda: webgraph.domain_rank_pages(pages1m, iters=10)
        .agg(F.sum("rank"), F.count("*"))
        .collect(),
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    ne0 = emb.count()
    ke = max(1, (n + ne0 - 1) // ne0)
    from elipdotter_spark.operators import ann

    bige = (
        emb.repartition(32)
        .select(
            "vec_id",
            "embedding",
            F.explode(F.sequence(F.lit(0), F.lit(ke - 1))).alias("rep"),
        )
        .select((F.col("vec_id") + F.col("rep") * ne0).alias("vec_id"), "embedding")
    )
    bige.write.mode("overwrite").parquet(root + "/emb")
    emb1m = spark.read.parquet(root + "/emb")
    ne = emb1m.count()
    out["n_vectors"] = ne

    def timed_vec(name, fn, reps=3):
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        med = samples[len(samples) // 2]
        out[name + "_sec"] = round(med, 3)
        out[name + "_vecs_per_sec"] = int(ne / med)

    timed_vec(
        "quantize",
        lambda: ann.quantize_int8(emb1m)
        .agg(F.sum("q_abs_sum"), F.max("max_err"))
        .collect(),
    )

    import shutil

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
