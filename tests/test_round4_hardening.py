"""Round-4 hardening: multi-writer ledger safety, reliable CC checkpoints,
content-digest replay detection, type-stable first-char partition filters."""

import os
import threading

import pytest
from pyspark.sql import functions as F

from elipdotter_spark.operators import dedup
from elipdotter_spark.sources.catalog import IndexStore, content_digest


# ------------------------------------------------- multi-writer ledger


@pytest.mark.spark
def test_concurrent_writers_distinct_seqs(spark, tmp_path):
    """Two ingest drivers against ONE store (the normal 100-TB pipeline
    shape) must never mint the same seq — a silent collision corrupts
    latest-wins.  The O_EXCL claim file makes exactly one winner per
    number."""
    store = IndexStore(spark, str(tmp_path / "idx"))
    results, errors = {}, {}

    def writer(tag):
        # each "driver" is a thread sharing the local SparkSession; the
        # contended resource (the ledger directory) is the same either way
        st = IndexStore(spark, str(tmp_path / "idx"))
        docs = spark.createDataFrame(
            [(100 + tag, f"writer {tag} words")], "doc_id long, text string"
        )
        try:
            results[tag] = st.write_segment(f"seg-w{tag}", docs)
        except Exception as e:  # noqa: BLE001 - recorded for the assert
            errors[tag] = e

    threads = [threading.Thread(target=writer, args=(t,)) for t in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    seqs = [r["seq"] for r in results.values()]
    assert len(set(seqs)) == len(seqs), f"seq collision: {seqs}"
    # the store is coherent: every writer's doc is queryable
    assert store.merged_postings().select("doc_id").distinct().count() == 4
    # and later sequencing starts above every claim
    assert store._next_seq() > max(seqs)


@pytest.mark.spark
def test_concurrent_same_segment_id_one_winner(spark, tmp_path):
    """Racing the SAME segment id is a misuse; it must resolve to exactly
    one committed row + one loud error, never a silent clobber."""
    store = IndexStore(spark, str(tmp_path / "idx"))
    outcomes = {}

    def writer(tag):
        st = IndexStore(spark, str(tmp_path / "idx"))
        docs = spark.createDataFrame(
            [(tag, f"contender {tag}")], "doc_id long, text string"
        )
        try:
            st.write_segment("seg-contested", docs)
            outcomes[tag] = "ok"
        except ValueError as e:
            assert "committed" in str(e)
            outcomes[tag] = "refused"

    threads = [threading.Thread(target=writer, args=(t,)) for t in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(outcomes.values()) == ["ok", "refused"], outcomes
    rows = [r for r in store.ledger() if r["segment_id"] == "seg-contested"]
    assert len(rows) == 1
    # the committed segment parses and matches its ledger row
    assert store.postings().select("doc_id").distinct().count() == 1


@pytest.mark.spark
def test_claimed_seq_survives_crashed_claimant(spark, tmp_path):
    """A claim without a ledger row (claimant crashed mid-build) burns the
    number: later writers sequence ABOVE it, keeping latest-wins sound."""
    store = IndexStore(spark, str(tmp_path / "idx"))
    crashed = store._claim_seq()
    assert crashed == 0
    row = store.write_segment(
        "seg-0000",
        spark.createDataFrame([(1, "alpha words")], "doc_id long, text string"),
    )
    assert row["seq"] > crashed


# ---------------------------------------------- reliable CC checkpoints


@pytest.mark.spark
def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir mode: same labels as the localCheckpoint path, and the
    final round's parquet is re-readable WITHOUT the original lineage (an
    executor/driver loss can resume from durable storage)."""
    edges = [(1000 + i, 1001 + i) for i in range(40)]  # a chain (worst case)
    edges += [(7, 8), (8, 9), (200, 201)]
    pairs = spark.createDataFrame(sorted(edges), "a long, b long")
    ckpt = str(tmp_path / "cc_ckpt")

    base = {
        r.doc_id: r.component for r in dedup.connected_components(pairs).collect()
    }
    durable = {
        r.doc_id: r.component
        for r in dedup.connected_components(
            pairs, checkpoint_dir=ckpt
        ).collect()
    }
    assert durable == base

    # exactly the final round's files remain (superseded rounds deleted)...
    kept = sorted(d for d in os.listdir(ckpt) if d.startswith("cc-"))
    rounds = {int(d.split("-")[1]) for d in kept}
    assert len(rounds) == 1
    # ...and the result is re-readable with zero lineage
    final = [d for d in kept if d.endswith("-new")]
    assert len(final) == 1
    reread = {
        r.doc_id: r.component
        for r in spark.read.parquet(os.path.join(ckpt, final[0])).collect()
    }
    assert reread == base


# ------------------------------------------- streaming content digests


@pytest.mark.spark
def test_streaming_replay_detects_text_update(spark, tmp_path):
    """ADVICE r3 (medium): a wiped checkpoint re-delivering batch 0 with the
    SAME doc ids but UPDATED text is NOT a true replay — skipping it would
    silently lose the update forever.  The ledger content digest (count +
    order-insensitive xxhash64-xor over all input columns) catches it."""
    import shutil

    from elipdotter_spark.streaming import incremental

    store = IndexStore(spark, str(tmp_path / "idx"))
    src = tmp_path / "src"
    spark.createDataFrame(
        [(1, "original words")], "doc_id long, text string"
    ).write.parquet(str(src))
    q = incremental.start_ingest(spark, str(src), store, str(tmp_path / "ck1"))
    q.awaitTermination(120)
    segs = store.completed_segments()
    assert len(segs) == 1
    row = [r for r in store.ledger() if r["segment_id"] == segs[0]][0]
    assert row.get("doc_digest") is not None

    # same doc id, UPDATED text, fresh checkpoint -> batch 0 collides
    for f in os.listdir(src):
        os.remove(src / f)
    spark.createDataFrame(
        [(1, "updated words")], "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(src))
    q2 = incremental.start_ingest(spark, str(src), store, str(tmp_path / "ck2"))
    with pytest.raises(Exception, match="DIFFERENT content|collision"):
        q2.awaitTermination(120)
        raise AssertionError("text-updated replay must fail loudly")
    # the committed original survived untouched
    assert store.merged_postings().filter(F.col("term") == "original").count() == 1

    # a TRUE byte-identical replay still skips idempotently
    shutil.rmtree(str(tmp_path / "idx"))
    store2 = IndexStore(spark, str(tmp_path / "idx"))
    src2 = tmp_path / "src2"
    spark.createDataFrame(
        [(5, "stable words")], "doc_id long, text string"
    ).write.parquet(str(src2))
    qa = incremental.start_ingest(spark, str(src2), store2, str(tmp_path / "ck3"))
    qa.awaitTermination(120)
    qb = incremental.start_ingest(spark, str(src2), store2, str(tmp_path / "ck4"))
    qb.awaitTermination(120)  # wiped-checkpoint replay of identical content
    assert len(store2.completed_segments()) == 1


@pytest.mark.spark
def test_content_digest_order_insensitive(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "doc_id long, text string")
    b = spark.createDataFrame([(2, "y"), (1, "x")], "doc_id long, text string")
    c = spark.createDataFrame([(1, "x"), (2, "z")], "doc_id long, text string")
    assert content_digest(a) == content_digest(b)
    assert content_digest(a) != content_digest(c)
    n, h = content_digest(a.limit(0))
    assert n == 0 and h == 0


# ------------------------------------- type-stable first-char filters


@pytest.mark.spark
def test_first_char_filter_all_digit_corpus(spark, tmp_path):
    """ADVICE r3 (low): an all-digit-initial corpus makes Spark infer the
    ``first`` partition column as INT; a string isin() then fails analysis.
    The filter must stay type-stable AND still prune."""
    from elipdotter_spark.operators.codec import first_char_filter
    from elipdotter_spark.sources.catalog import write_terms

    terms = spark.createDataFrame(
        [("123", 2, 5), ("456", 1, 1), ("129", 3, 3)], "term string, df long, cf long"
    )
    path = str(tmp_path / "terms")
    write_terms(terms, path)
    scan = spark.read.parquet(path)
    assert dict(scan.dtypes)["first"] != "string"  # the trap is armed

    # mixed digit+letter query chars: digits match, letters honestly absent
    got = {r.term for r in first_char_filter(scan, {"1", "z"}).collect()}
    assert got == {"123", "129"}
    # pruning survives: the predicate lands in PartitionFilters
    plan = first_char_filter(scan, {"1"})._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "first" in plan
    # letters only -> empty, not an analysis error
    assert first_char_filter(scan, {"z"}).count() == 0
    # and a string-typed layout is untouched by the guard
    mixed = spark.createDataFrame(
        [("abc", "a"), ("1bc", "1")], "term string, first string"
    )
    got2 = {r.term for r in first_char_filter(mixed, {"a", "1"}).collect()}
    assert got2 == {"abc", "1bc"}


@pytest.mark.spark
def test_engine_expansion_on_digit_corpus(spark, tmp_path):
    """End-to-end: fuzzy expansion over a published all-digit dictionary
    must not fail analysis (the compiler shares first_char_filter)."""
    from elipdotter_spark.core.parser import parse
    from elipdotter_spark.operators import index_build
    from elipdotter_spark.plans.compiler import QueryEngine
    from elipdotter_spark.sources.catalog import write_terms

    docs = spark.createDataFrame(
        [(i, f"{1000 + i} {2000 + i}") for i in range(30)],
        "doc_id long, text string",
    )
    postings = index_build.build_postings(docs)
    terms = index_build.build_terms(postings)
    path = str(tmp_path / "terms")
    write_terms(terms, path)
    eng = QueryEngine(
        spark,
        postings,
        spark.read.parquet(path),
        word_count_limit=10,  # force the pruned scan
    )
    got = {r.doc_id for r in eng.doc_ids(parse("1005")).collect()}
    assert got == {5}


@pytest.mark.spark
def test_lsh_prefix_guard_checks_all_rows(spark):
    """ADVICE r3 (low): the prefix_bits mismatch guard must not pass just
    because one sampled bucket has zero bits in the differing range."""
    from elipdotter_spark.operators import ann

    # layout written with prefix_bits=2 (bp = bucket & 0b11); first row's
    # bucket (0) would satisfy ANY narrower mask — the old .first() guard
    # missed the mismatch that row 3 exposes
    buckets = spark.createDataFrame(
        [(0, 0, 0, 10), (0, 1, 1, 11), (0, 3, 3, 12), (0, 6, 2, 13)],
        "table int, bucket long, bp int, vec_id long",
    )
    emb = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in (10, 11, 12, 13)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(ValueError, match="prefix mismatch"):
        ann.topk_lsh_tables(
            emb, buckets, [1.0, 0.0], k=2, n_planes=3, n_tables=1,
            prefix_bits=1,
        ).collect()


# --------------------------------------------------- entry cache bound


@pytest.mark.spark
def test_entry_cache_evicts_other_apps(spark):
    """A long-lived driver cycling SparkSessions must not grow the
    gate-table cache without bound: touching the cache under a new app id
    evicts every other app's entries."""
    from elipdotter_spark import entry

    entry._CACHE["zipf:app-dead-1"] = {"stale": True}
    entry._CACHE["app-dead-2:/some/sf"] = {"stale": True}
    app = entry._spark_key(spark)
    assert all(app in k for k in entry._CACHE)
    assert "zipf:app-dead-1" not in entry._CACHE
