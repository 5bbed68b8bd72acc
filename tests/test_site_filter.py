"""Corpus-restricted queries (topk restrict=) + the docmap/site CLI surface.

Contract: ``topk(..., restrict=R)`` is the engine run over the SUB-CORPUS —
occurrence stream, root sets and sentinel maxes are all cut to R before
anything is computed, so results are bit-identical to an engine whose index
holds only those docs.  (Restriction CAN change a surviving doc's rating
vs the full run: the reference's progressive merge looks ahead in the node
stream, which is exactly why the cut must happen before the maxes.)
"""

import json

import pytest
from pyspark.sql import functions as F

from elipdotter_spark.operators import index_build
from elipdotter_spark.plans.compiler import QueryEngine


@pytest.fixture()
def cli(spark, monkeypatch):
    import elipdotter_spark.cli as cli_mod

    monkeypatch.setattr(cli_mod, "get_spark", lambda: spark)
    return cli_mod


def _engine(spark, docs):
    postings = index_build.build_postings(docs)
    terms = index_build.build_terms(postings)
    return QueryEngine(
        spark, postings, terms, proximity_threshold=1.0, algo="exact"
    )


def _rows(df):
    return sorted(
        (r.doc_id, r.start, float(r.rating)) for r in df.collect()
    )


@pytest.mark.spark
def test_restrict_equals_subcorpus_engine(spark):
    all_rows = [(i, "alpha beta gamma words") for i in range(20)]
    all_rows += [(100 + i, "alpha beta") for i in range(5)]
    docs = spark.createDataFrame(all_rows, "doc_id long, text string")
    keep = [0, 3, 7, 101, 104]
    sub = docs.filter(F.col("doc_id").isin(keep))

    eng_full = _engine(spark, docs)
    eng_sub = _engine(spark, sub)
    restrict = spark.createDataFrame([(d,) for d in keep], "doc_id long")

    got = _rows(
        eng_full.topk("alpha beta", 1000, 10, prune=False, restrict=restrict)
    )
    want = _rows(eng_sub.topk("alpha beta", 1000, 10, prune=False))
    assert got == want and {d for d, _, _ in got} <= set(keep)


@pytest.mark.spark
def test_restrict_pruned_equals_unpruned(spark):
    rows = [(i, "alpha " + "filler " * 25 + "beta") for i in range(300)]
    rows += [(1000 + i, "alpha beta alpha beta") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    keep = list(range(0, 300, 2)) + [1000, 1004, 1008]
    restrict = spark.createDataFrame([(d,) for d in keep], "doc_id long")

    eng_p = _engine(spark, docs)
    eng_f = _engine(spark, docs)
    pruned = _rows(eng_p.topk("alpha beta", 100, 5, restrict=restrict))
    full = _rows(
        eng_f.topk("alpha beta", 100, 5, prune=False, restrict=restrict)
    )
    assert pruned == full
    got_ids = {d for d, _, _ in pruned}
    # the dense head is all in the top-5; the rest fill from the tail,
    # and every result honors the restriction
    assert {1000, 1004, 1008} <= got_ids
    assert got_ids <= set(keep)


@pytest.mark.spark
def test_cli_docmap_site_and_resolve(cli, spark, tmp_path, capsys):
    pages = spark.createDataFrame(
        [
            (1, "https://a.example/p", 100,
             "<html><body>zzsite common words</body></html>"),
            (2, "https://sub.a.example/q", 100,
             "<html><body>zzsite more words</body></html>"),
            (3, "https://b.example/r", 100,
             "<html><body>zzsite other words</body></html>"),
        ],
        "doc_id long, url string, warc_ts long, html string",
    ).withColumn("warc_ts", F.timestamp_seconds("warc_ts"))
    pin = str(tmp_path / "pages")
    idx = str(tmp_path / "idx")
    dm = str(tmp_path / "docmap")
    pages.write.parquet(pin)
    assert cli.main([
        "build", "--input", pin, "--output", idx, "--segments", "1",
        "--format", "pages", "--docmap", dm,
    ]) == 0
    info = [json.loads(l) for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")][-1]
    assert info["docmap"] == dm
    # site filter covers the host AND its subdomains; urls resolved
    assert cli.main([
        "query", "--index", idx, "--query", "zzsite", "--k", "10",
        "--algo", "exact", "--docmap", dm, "--site", "a.example",
        "--resolve-urls",
    ]) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")]
    assert {r["doc_id"] for r in rows} == {1, 2}
    assert {r["url"] for r in rows} == {
        "https://a.example/p", "https://sub.a.example/q"
    }
    # unfiltered sees all three
    assert cli.main([
        "query", "--index", idx, "--query", "zzsite", "--k", "10",
        "--algo", "exact",
    ]) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")]
    assert {r["doc_id"] for r in rows} == {1, 2, 3}


@pytest.mark.spark
def test_cli_rank_prior_to_bm25(cli, spark, tmp_path, capsys):
    """The full CLI ranking story: build --docmap -> rank --prior-output
    -> bm25 --prior.  Heavily-linked hub's page outranks an equally-good
    text match from an unlinked domain."""
    rows = []
    # hub.example is linked from 6 domains; lone.example from none
    for i in range(6):
        rows.append((10 + i, f"https://src{i}.example/p", 100,
                     '<html><body>filler <a href="https://hub.example/x">'
                     "hub</a></body></html>"))
    rows.append((1, "https://hub.example/x", 100,
                 "<html><body>zzranked words here</body></html>"))
    rows.append((2, "https://lone.example/y", 100,
                 "<html><body>zzranked words here</body></html>"))
    pages = spark.createDataFrame(
        rows, "doc_id long, url string, warc_ts long, html string"
    ).withColumn("warc_ts", F.timestamp_seconds("warc_ts"))
    pin = str(tmp_path / "pages")
    idx = str(tmp_path / "idx")
    dm = str(tmp_path / "docmap")
    pr = str(tmp_path / "prior")
    pages.write.parquet(pin)
    assert cli.main([
        "build", "--input", pin, "--output", idx, "--segments", "1",
        "--format", "pages", "--docmap", dm,
    ]) == 0
    assert cli.main([
        "rank", "--input", pin, "--docmap", dm, "--prior-output", pr,
    ]) == 0
    info = json.loads([l for l in capsys.readouterr().out.splitlines()
                       if l.startswith("{")][-1])
    assert info["prior_output"] == pr
    priors = {r.doc_id: r.prior for r in spark.read.parquet(pr).collect()}
    assert priors[1] > priors[2] >= 0.0  # the hub doc carries the mass
    assert cli.main([
        "bm25", "--index", idx, "--terms", "zzranked,words",
        "--prior", pr, "--prior-weight", "4.0",
    ]) == 0
    out = [json.loads(l) for l in capsys.readouterr().out.splitlines()
           if l.startswith("{")]
    # identical text, the prior breaks the tie toward the hub page
    assert out[0]["doc_id"] == 1 and out[0]["fused"] > out[1]["fused"]
    assert {o["doc_id"] for o in out[:2]} == {1, 2}


@pytest.mark.spark
def test_cli_query_snippets(cli, spark, tmp_path, capsys):
    docs = spark.createDataFrame(
        [(1, "lead words before zzsnip trailing context words here"),
         (2, "no match content")],
        "doc_id long, text string",
    )
    din = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    docs.write.parquet(din)
    assert cli.main(["build", "--input", din, "--output", idx,
                     "--segments", "1"]) == 0
    capsys.readouterr()
    assert cli.main([
        "query", "--index", idx, "--query", "zzsnip", "--k", "3",
        "--algo", "exact", "--snippets-docs", din, "--snippet-width", "12",
    ]) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")]
    assert rows and rows[0]["doc_id"] == 1
    assert "zzsnip" in rows[0]["snippet"]
    # width honored: 2*12 chars max
    assert len(rows[0]["snippet"]) <= 24
