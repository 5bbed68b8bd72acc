"""S10 stale repair, S2/S3 docmap, CLI round-trip."""

import json

import pytest
from pyspark.sql import functions as F

from elipdotter_spark.operators import index_build


@pytest.mark.spark
def test_repair_stale(spark):
    docs_v1 = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha delta")],
        schema="doc_id long, text string",
    )
    postings = index_build.build_postings(docs_v1)
    # document 0 changed: "gamma" disappeared
    docs_v2 = spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha delta")], schema="doc_id long, text string"
    )
    repaired = index_build.repair_stale(postings, docs_v2)
    got = {(r.term, r.doc_id) for r in repaired.collect()}
    assert ("gamma", 0) not in got
    assert ("alpha", 0) in got and ("beta", 0) in got and ("delta", 1) in got


@pytest.mark.spark
def test_docmap_dense_ids(spark):
    docs = spark.createDataFrame(
        [("https://b",), ("https://a",), ("https://c",)], schema="url string"
    )
    dm = index_build.docmap(docs)
    rows = {r.url: r.doc_id for r in dm.collect()}
    assert rows == {"https://a": 0, "https://b": 1, "https://c": 2}


@pytest.mark.spark
def test_cli_build_and_query(spark, tmp_path, sf_dir, capsys, monkeypatch):
    from elipdotter_spark import cli

    monkeypatch.setattr(cli, "get_spark", lambda: spark)
    inp = str(tmp_path / "docs")
    spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100).select(
        "doc_id", "text"
    ).write.parquet(inp)

    out = str(tmp_path / "index")
    assert cli.main(["build", "--input", inp, "--output", out, "--segments", "2"]) == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["built_segments"] == 2

    assert cli.main(["query", "--index", out, "--query", "table -value", "--k", "3"]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) <= 3
    assert all("rating" in l for l in lines)

    assert cli.main(["bm25", "--index", out, "--terms", "spark,fast", "--k", "5"]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) <= 5 and all("score" in l for l in lines)


@pytest.mark.spark
def test_docmap_hashed_stable_unique(spark):
    from pyspark.sql import functions as F

    from elipdotter_spark.operators import index_build

    docs = spark.range(5000).select(
        F.concat(F.lit("https://example.com/p/"), F.col("id").cast("string")).alias("url")
    )
    m1 = index_build.docmap_hashed(docs)
    assert index_build.docmap_collisions(m1) == 0
    # stable across runs / partitionings
    m2 = index_build.docmap_hashed(docs.repartition(7))
    a = {r.url: r.doc_id for r in m1.collect()}
    b = {r.url: r.doc_id for r in m2.collect()}
    assert a == b
    # no global sort in the plan (the dense docmap's known scale-killer)
    plan = m1._jdf.queryExecution().executedPlan().toString()
    assert "Sort" not in plan, plan


@pytest.mark.spark
def test_doc_difference(spark):
    from elipdotter_spark.operators import index_build

    a = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
    b = spark.createDataFrame([(2,), (9,)], "doc_id long")
    got = {r.doc_id for r in index_build.doc_difference(a, b).collect()}
    assert got == {1, 3}


@pytest.mark.spark
def test_repetition_planted_boilerplate(spark):
    """Gopher-style repetition signals: a doc that is one phrase repeated
    scores near-1 duplicate-bigram fraction; a doc of distinct tokens
    scores 0; docs shorter than n produce no row (no phantom descending
    sequences)."""
    from elipdotter_spark.operators import text_analysis

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),          # 5 identical bigrams
            (2, "alpha beta gamma delta epsilon"),          # 4 distinct bigrams
            (3, "one"),                                     # too short for n=2
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in text_analysis.repetition(docs, n=2).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].n_ngrams == 5 and rows[1].dup_ngram_frac == 0.8
    assert rows[1].top_ngram_frac == 1.0
    assert rows[2].n_ngrams == 4 and rows[2].dup_ngram_frac == 0.0
    assert rows[2].top_ngram_frac == 0.25


@pytest.mark.spark
def test_snippet_extract_boundaries(spark):
    from elipdotter_spark.operators import text_analysis

    docs = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrstuvwxyz0123456789 end of the document here")],
        "doc_id long, text string",
    )
    hits = spark.createDataFrame(
        [(1, 0), (1, 30), (1, 61)], "doc_id long, start long"
    )
    got = {r.start: r.snippet for r in
           text_analysis.snippet_extract(hits, docs, width=10).collect()}
    text = "abcdefghijklmnopqrstuvwxyz0123456789 end of the document here"
    # start 0: clamped to the text head, 20 chars
    assert got[0] == text[0:20]
    # interior: 10 before + 10 after
    assert got[30] == text[20:40]
    # final-token quirk offset (start == len(text) - 1): trailing window
    assert got[61] == text[51:]


@pytest.mark.spark
def test_doc_salt_spreads_hot_term(spark):
    """doc_salt > 1 spreads a degenerate hot term over multiple writer
    partitions (the hot-bucket write-side salting) while preserving the
    layout invariants: identical posting content, (term, doc_id)-sorted
    within every partition."""
    from pyspark.sql import functions as F

    from elipdotter_spark.operators import index_build

    # one mega-hot term ('hot' in every doc) + per-doc unique terms
    docs = spark.createDataFrame(
        [(i, f"hot unique{i}") for i in range(2000)], "doc_id long, text string"
    ).repartition(8)

    plain = index_build.build_postings(docs)
    salted = index_build.build_postings(docs, doc_salt=4)

    want = {(r.term, r.doc_id, r.tf) for r in plain.collect()}
    got = {(r.term, r.doc_id, r.tf) for r in salted.collect()}
    assert got == want  # content identical

    hot_parts = (
        salted.filter(F.col("term") == "hot")
        .select(F.spark_partition_id().alias("pid"))
        .distinct()
        .count()
    )
    assert hot_parts > 1, hot_parts  # the hot term no longer melts one task

    # within-partition (term, doc_id) sort preserved under salting
    def assert_sorted(it):
        import pandas as pd
        for pdf in it:
            keys = list(zip(pdf["term"], pdf["doc_id"]))
            assert keys == sorted(keys)
            yield pd.DataFrame({"ok": [True]})

    salted.mapInPandas(assert_sorted, schema="ok boolean").collect()
