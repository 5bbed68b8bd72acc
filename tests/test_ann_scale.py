"""Multi-table LSH ANN at scale: 50k vectors, 4 tables x 16 planes (64
plane-bits total), planted near-neighbors, recall vs exact brute force
(VERDICT r1 #6)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from elipdotter_spark.operators import ann

DIM = 64
N = 50_000
N_PLANES = 16
N_TABLES = 4


@pytest.fixture(scope="module")
def planted(spark):
    """50k unit-ish vectors; vectors 1..15 are small perturbations of
    vector 0 (the query), so the true top-10 is known and tight."""
    rng = np.random.RandomState(7)
    m = rng.standard_normal((N, DIM))
    q = m[0].copy()
    for i in range(1, 16):
        m[i] = q + 0.12 * rng.standard_normal(DIM)
    pdf = pd.DataFrame({"vec_id": np.arange(N, dtype=np.int64), "embedding": list(m.astype(np.float32))})
    emb = spark.createDataFrame(pdf).repartition(16).cache()
    emb.count()
    # exact ground truth, driver-side numpy (referee only)
    sims = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    truth = np.argsort(-sims)[:10]
    return emb, q, set(int(i) for i in truth)


@pytest.mark.spark
def test_multitable_lsh_recall(spark, planted):
    emb, q, truth = planted
    buckets = ann.lsh_buckets_tables(
        emb, n_planes=N_PLANES, n_tables=N_TABLES, dim=DIM
    ).cache()
    n_buckets = buckets.count()
    assert n_buckets == N * N_TABLES  # one bucket row per (vector, table)

    got = ann.topk_lsh_tables(
        emb, buckets, q, 10, n_planes=N_PLANES, n_tables=N_TABLES, multiprobe=1
    )
    ids = {int(r.vec_id) for r in got.collect()}
    recall = len(ids & truth) / len(truth)
    assert recall >= 0.8, (recall, sorted(ids), sorted(truth))

    # candidate set must be a tiny fraction of the corpus (that's the point)
    probe = ann.query_buckets_tables(q, N_PLANES, N_TABLES)
    cond = None
    for t, b in probe:
        e = (F.col("table") == t) & (F.col("bucket") == b)
        cond = e if cond is None else (cond | e)
    exact_bucket_cands = buckets.filter(cond).select("vec_id").distinct().count()
    assert exact_bucket_cands < N * 0.05, exact_bucket_cands


@pytest.mark.spark
def test_single_table_hof_matches_scalar_formula(spark, planted):
    """JVM-HOF bucket assignment == driver-side scalar formula (F6-analogue
    determinism; guards the zip_with/aggregate rewrite)."""
    emb, _q, _truth = planted
    sample = emb.filter(F.col("vec_id") < 200)
    got = {r.vec_id: r.bucket for r in ann.lsh_buckets(sample, dim=DIM).collect()}
    vecs = {r.vec_id: list(r.embedding) for r in sample.collect()}
    for vid, vec in vecs.items():
        assert got[vid] == ann.query_bucket(vec, ann.N_PLANES), vid


@pytest.mark.spark
def test_ivf_recall(spark, planted):
    """IVF (k-means cells + nprobe search): recall vs exact brute force on
    the planted corpus with a bounded candidate fraction."""
    emb, q, truth = planted
    cents = ann.ivf_train(emb, n_cells=64, sample=4096, iters=8)
    assert cents.shape == (64, DIM)
    cells = ann.ivf_assign(emb, cents).cache()
    assert cells.count() == N

    got = ann.topk_ivf(emb, cells, cents, q, 10, nprobe=8)
    ids = {int(r.vec_id) for r in got.collect()}
    recall = len(ids & truth) / len(truth)
    assert recall >= 0.8, (recall, sorted(ids), sorted(truth))

    # candidate set bounded by the probed cells (~nprobe/n_cells of corpus)
    import numpy as np
    d = ((cents - np.asarray(q)[None, :]) ** 2).sum(axis=1)
    probe = [int(c) for c in d.argsort()[:8]]
    from pyspark.sql import functions as F
    n_cand = cells.filter(F.col("cell").isin(probe)).count()
    assert n_cand < N * 0.5, n_cand


@pytest.mark.spark
def test_bucket_layout_partition_pruned_and_identical(spark, planted, tmp_path_factory):
    """Materialized (table, bp)-partitioned bucket layout: probe scans show
    real PartitionFilters (file pruning) and return the same top-k as the
    in-memory bucket table."""
    emb, q, _truth = planted
    buckets = ann.lsh_buckets_tables(emb, n_planes=N_PLANES, n_tables=N_TABLES, dim=DIM)
    path = str(tmp_path_factory.mktemp("lsh_layout") / "buckets")
    ann.write_bucket_layout(buckets, path)
    stored = spark.read.parquet(path)

    got_mem = [
        (r.vec_id, round(r.cos, 9))
        for r in ann.topk_lsh_tables(
            emb, buckets, q, 10, n_planes=N_PLANES, n_tables=N_TABLES
        ).collect()
    ]
    layout_topk = ann.topk_lsh_tables(
        emb, stored, q, 10, n_planes=N_PLANES, n_tables=N_TABLES
    )
    got_layout = [(r.vec_id, round(r.cos, 9)) for r in layout_topk.collect()]
    assert got_layout == got_mem

    # the probed scan must be partition-pruned, not a full read + row filter
    probe = ann.query_buckets_tables(q, N_PLANES, N_TABLES)
    mask = (1 << ann.DEFAULT_PREFIX_BITS) - 1
    cond = None
    for t, b in probe:
        e = (F.col("table") == t) & (F.col("bp") == (b & mask)) & (F.col("bucket") == b)
        cond = e if cond is None else (cond | e)
    plan = (
        stored.filter(cond)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    # the filter list must actually mention the partition columns
    seg = plan.split("PartitionFilters")[1][:400]
    assert "table" in seg and "bp" in seg, seg


@pytest.mark.spark
def test_multiprobe_radius_honored(spark, planted):
    """multiprobe is a Hamming RADIUS: r=2 probes strictly more buckets than
    r=1 (it used to silently behave like r=1 for any value >= 1)."""
    emb, q, _truth = planted
    buckets = ann.lsh_buckets_tables(
        emb, n_planes=N_PLANES, n_tables=N_TABLES, dim=DIM
    ).cache()

    def cand_count(r):
        probe = []
        for t, qb in ann.query_buckets_tables(q, N_PLANES, N_TABLES):
            probe.append((t, qb))
            if r >= 1:
                probe += [(t, qb ^ (1 << j)) for j in range(N_PLANES)]
            if r >= 2:
                probe += [
                    (t, qb ^ (1 << i) ^ (1 << j))
                    for i in range(N_PLANES)
                    for j in range(i + 1, N_PLANES)
                ]
        by_table = {}
        for t, b in probe:
            by_table.setdefault(t, set()).add(b)
        cond = None
        for t, bs in sorted(by_table.items()):
            e = (F.col("table") == t) & F.col("bucket").isin(sorted(bs))
            cond = e if cond is None else (cond | e)
        return buckets.filter(cond).select("vec_id").distinct().count()

    c1, c2 = cand_count(1), cand_count(2)
    assert c2 > c1, (c1, c2)
    # and the operator's own r=2 result reranks at least the r=1 recall
    got2 = {
        int(r.vec_id)
        for r in ann.topk_lsh_tables(
            emb, buckets, q, 10, n_planes=N_PLANES, n_tables=N_TABLES, multiprobe=2
        ).collect()
    }
    got1 = {
        int(r.vec_id)
        for r in ann.topk_lsh_tables(
            emb, buckets, q, 10, n_planes=N_PLANES, n_tables=N_TABLES, multiprobe=1
        ).collect()
    }
    assert len(got2) == 10 and len(got1) == 10
