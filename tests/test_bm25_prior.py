"""BM25 x query-independent prior rank fusion (bm25.bm25_topk_prior).

fused = bm25 + w * ln(1 + prior); ordering on the ROUNDED fused score with
doc_id tiebreak (cross-engine discipline).  The full web composition
(extraction -> index -> PageRank prior -> fused top-k) is gated end-to-end
by entry.web_ranked_bm25; these tests pin the operator semantics alone.
"""

import math

import pytest
from pyspark.sql import functions as F

from elipdotter_spark.operators import bm25, index_build


@pytest.fixture()
def cli(spark, monkeypatch):
    import elipdotter_spark.cli as cli_mod

    monkeypatch.setattr(cli_mod, "get_spark", lambda: spark)
    return cli_mod


def _index(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    postings = index_build.build_postings(docs)
    terms = index_build.build_terms(postings)
    docstats = index_build.docstats_from_postings(postings)
    return postings, terms, docstats


@pytest.mark.spark
def test_prior_reorders_and_matches_hand_math(spark):
    # doc 1 is textually better for "alpha"; doc 2 has the big prior
    postings, terms, docstats = _index(
        spark,
        [
            (1, "alpha alpha alpha beta"),
            (2, "alpha beta gamma delta"),
            (3, "beta gamma delta epsilon"),
        ],
    )
    n, avgdl = bm25.corpus_stats(docstats)
    base = {
        r.doc_id: r.score
        for r in bm25.bm25_topk(
            postings, docstats, terms, ["alpha"], 10, n=n, avgdl=avgdl
        ).collect()
    }
    assert base[1] > base[2]  # plain BM25 prefers doc 1

    prior = spark.createDataFrame(
        [(1, 0.0), (2, 1.0)], "doc_id long, prior double"
    )
    fused = bm25.bm25_topk_prior(
        postings, docstats, terms, ["alpha"], 10,
        prior=prior, prior_weight=8.0, default_prior=0.0,
        n=n, avgdl=avgdl,
    ).collect()
    by_id = {r.doc_id: r for r in fused}
    # hand math: fused = round(bm25 + 8*ln(1+prior), 6)
    assert by_id[2].fused == round(base[2] + 8.0 * math.log(2.0), 6)
    assert by_id[1].fused == round(base[1], 6)
    # the prior flips the order
    assert [r.doc_id for r in fused][0] == 2
    # columns rounded for the cross-engine compare
    assert by_id[2].prior == 1.0 and by_id[1].prior == 0.0


@pytest.mark.spark
def test_prior_default_for_missing_docs(spark):
    postings, terms, docstats = _index(
        spark, [(1, "alpha beta"), (2, "alpha beta")]
    )
    # doc 2 absent from the prior table -> default_prior
    prior = spark.createDataFrame([(1, 0.5)], "doc_id long, prior double")
    rows = {
        r.doc_id: r
        for r in bm25.bm25_topk_prior(
            postings, docstats, terms, ["alpha"], 10,
            prior=prior, prior_weight=2.0, default_prior=0.25,
        ).collect()
    }
    assert rows[2].prior == 0.25
    # .score is rounded in the output; fused was computed pre-rounding
    assert abs(rows[2].fused - (rows[2].score + 2.0 * math.log(1.25))) < 2e-6


@pytest.mark.spark
def test_prior_tie_break_on_rounded_fused(spark):
    # identical docs, identical priors: rounded fused ties -> doc_id asc
    postings, terms, docstats = _index(
        spark, [(7, "alpha beta"), (3, "alpha beta"), (5, "alpha beta")]
    )
    prior = spark.createDataFrame(
        [(7, 0.3), (3, 0.3), (5, 0.3)], "doc_id long, prior double"
    )
    got = [
        r.doc_id
        for r in bm25.bm25_topk_prior(
            postings, docstats, terms, ["alpha"], 10, prior=prior
        ).collect()
    ]
    assert got == [3, 5, 7]


@pytest.mark.spark
def test_cli_bm25_prior(cli, spark, tmp_path, capsys):
    import json

    docs = spark.createDataFrame(
        [(1, "alpha alpha beta"), (2, "alpha beta"), (3, "beta gamma")],
        "doc_id long, text string",
    )
    din = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    pin = str(tmp_path / "prior")
    docs.write.parquet(din)
    spark.createDataFrame(
        [(2, 2.0)], "doc_id long, prior double"
    ).write.parquet(pin)
    assert cli.main(["build", "--input", din, "--output", idx,
                     "--segments", "1"]) == 0
    capsys.readouterr()
    assert cli.main(["bm25", "--index", idx, "--terms", "alpha",
                     "--prior", pin, "--prior-weight", "8.0"]) == 0
    out = [json.loads(l) for l in capsys.readouterr().out.splitlines()
           if l.startswith("{")]
    assert out[0]["doc_id"] == 2 and out[0]["prior"] == 2.0
    # score is itself rounded in the output, so compare to 2 ulps of 1e-6
    assert abs(
        out[0]["fused"] - (out[0]["score"] + 8.0 * math.log(3.0))
    ) < 2e-6


@pytest.mark.spark
def test_prior_and_anchor_plan_shapes(spark):
    """100-TB plan posture for the session-9 ops: the fused top-k compiles
    to TakeOrderedAndProject (per-partition top-k, no global sort) and
    anchor_terms reaches its aggregate with ONE shuffle (extraction/clean/
    tokenize all ride the page scan)."""
    from elipdotter_spark.operators import html as H

    postings, terms, docstats = _index(
        spark, [(1, "alpha beta"), (2, "alpha gamma")]
    )
    prior = spark.createDataFrame([(1, 0.5)], "doc_id long, prior double")
    plan = (
        bm25.bm25_topk_prior(
            postings, docstats, terms, ["alpha"], 10, prior=prior
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan

    pages = spark.createDataFrame(
        [(1, '<a href="https://t.example/p">click here</a>')],
        "doc_id long, html string",
    )
    at_plan = (
        H.anchor_terms(pages)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one shuffle: the final (target, term) hash aggregate
    assert at_plan.count("Exchange") <= 2  # partial->final agg exchange(s)
    assert "SortMergeJoin" not in at_plan
