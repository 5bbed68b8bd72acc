#!/usr/bin/env python
"""1M-doc batched-query amortization evidence.

16 BM25 queries and 8 reference-rating queries against a 1M-doc Zipf
corpus, batched (one pipeline) vs sequential (one job per query), medians
of 3, with per-query bit-equality asserted between the two paths.  Prints
one JSON line.  Run with NOTHING else on the box (timings).

Usage: PYTHONPATH=/root/repo python scripts/bench_batch_1m.py
"""

import json
import statistics
import sys
import time

import numpy as np
from pyspark.sql import SparkSession


def median_of(fn, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 3)


def main() -> int:
    from elipdotter_spark.core.parser import parse
    from elipdotter_spark.operators import bm25, index_build
    from elipdotter_spark.plans.compiler import QueryEngine
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

    docs = zipf_corpus(spark, n_docs=1_000_000, vocab_size=50_000, doc_len=60)
    postings = index_build.build_postings(docs)
    # materialize to parquet (array columns cache poorly; parquet is the
    # production shape) and read back
    import tempfile

    root = tempfile.mkdtemp(prefix="batch1m_")
    postings.write.mode("overwrite").parquet(root + "/postings")
    postings = spark.read.parquet(root + "/postings")
    terms = index_build.build_terms(postings).cache()
    docstats = index_build.docstats_from_postings(postings).cache()
    terms.count(), docstats.count()
    n, avgdl = bm25.corpus_stats(docstats)

    # 16 BM25 queries mixing hot (t1..) and tail (t3xxxx) terms
    bq = {
        i + 1: [f"t{a}", f"t{b}"]
        for i, (a, b) in enumerate(
            [(1, 800), (2, 30000), (3, 12000), (5, 900), (8, 31000),
             (13, 2500), (21, 41000), (34, 700), (55, 16000), (89, 3500),
             (144, 22000), (233, 45000), (377, 1100), (610, 9000),
             (987, 27000), (1597, 5000)]
        )
    }
    # warm workers/codegen
    bm25.bm25_topk(postings, docstats, terms, bq[1], 10, n=n, avgdl=avgdl).collect()

    def seq_run():
        return {
            qid: [(r.doc_id, round(r.score, 9)) for r in bm25.bm25_topk(
                postings, docstats, terms, q, 10, n=n, avgdl=avgdl
            ).collect()]
            for qid, q in bq.items()
        }

    def batch_run():
        rows = bm25.bm25_topk_batch(
            postings, docstats, terms, bq, 10, n=n, avgdl=avgdl
        ).collect()
        out = {qid: [] for qid in bq}
        for r in sorted(rows, key=lambda r: (r.query_id, r.rnk)):
            out[r.query_id].append((r.doc_id, round(r.score, 9)))
        return out

    assert batch_run() == seq_run(), "bm25 batch != per-query"
    bm25_seq = median_of(lambda: seq_run())
    bm25_batch = median_of(lambda: batch_run())

    # 8 reference-rating queries (moderately selective tail terms keep the
    # kernels honest but bounded)
    sq = {
        i + 1: q
        for i, q in enumerate(
            ["t30000 t12000", "t31000 or t41000", "t16000 -t22000",
             "(t45000 or t27000) t9000", "t2500 t3500", "t5000 -t1100",
             "t700 t41000", "t900 t30000"]
        )
    }
    eng = QueryEngine(spark, postings, terms, proximity_threshold=1.0, algo="exact")
    eng.doc_ids(parse("t1")).count()  # warm

    def hkey(r):
        return (r.doc_id, r.start, float(np.float32(r.rating)), r.word_id)

    def seq_hits():
        return {
            qid: sorted(hkey(r) for r in eng.hits(parse(q), 100).collect())
            for qid, q in sq.items()
        }

    def batch_hits():
        rows = eng.hits_batch(sq, 100).collect()
        out = {qid: [] for qid in sq}
        for r in rows:
            out[r.query_id].append(hkey(r))
        return {qid: sorted(v) for qid, v in out.items()}

    assert batch_hits() == seq_hits(), "hits batch != per-query"
    hits_seq = median_of(lambda: seq_hits())
    hits_batch = median_of(lambda: batch_hits())

    out = {
        "n_docs": 1_000_000,
        "bm25_batch16_sec": bm25_batch,
        "bm25_sequential16_sec": bm25_seq,
        "bm25_amortization": round(bm25_seq / bm25_batch, 2),
        "scored_batch8_sec": hits_batch,
        "scored_sequential8_sec": hits_seq,
        "scored_amortization": round(hits_seq / hits_batch, 2),
        "bit_identical": True,
    }
    print(json.dumps(out))
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
