"""Source-level pipeline operators: mixture stats, stratified sampling,
cross-source duplication matrix.  Cross-engine correctness is gated in
test_entry_contract (txt_source_mix / txt_stratified_sample /
dd_cross_source); these tests pin the operator-level contracts the SQL
can't express."""

import pytest
from pyspark.sql import functions as F

from elipdotter_spark.operators import text_analysis as ta

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.spark
def test_stratified_sample_contracts(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    full = ta.stratified_sample(docs, {}, default_fraction=1.0)
    assert full.count() == docs.count()  # fraction 1.0 keeps everything
    none = ta.stratified_sample(docs, {}, default_fraction=0.0)
    assert none.count() == 0

    half = ta.stratified_sample(docs, {}, default_fraction=0.5)
    quarter = ta.stratified_sample(docs, {}, default_fraction=0.25)
    h1 = sorted(r.doc_id for r in half.select("doc_id").collect())
    h2 = sorted(r.doc_id for r in half.select("doc_id").collect())
    assert h1 == h2  # deterministic across runs
    q = set(r.doc_id for r in quarter.select("doc_id").collect())
    assert q <= set(h1)  # nested cutoffs -> nested samples (backfill-safe)

    # scale posture: a pure filter — no Exchange anywhere in the plan
    plan = half._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    # negative (hashed web-scale) ids sample without error, portably
    neg = docs.withColumn("doc_id", F.col("doc_id") - F.lit(10**12))
    assert ta.stratified_sample(neg, {}, default_fraction=0.5).count() > 0


@pytest.mark.spark
def test_source_mix_shares_sum_to_one(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = ta.source_mix(docs).collect()
    assert rows and abs(sum(r.token_share for r in rows) - 1.0) < 1e-4
    total = sum(r.n_tokens for r in rows)
    for r in rows:
        assert abs(r.token_share - r.n_tokens / total) < 1e-6


# ---------------------------------------------------------------- jsonl io


@pytest.mark.spark
def test_jsonl_roundtrip_lossless(spark, tmp_path):
    """parquet -> jsonl -> read_docs_jsonl is lossless on the real sf
    corpus, with an empty dead letter."""
    from elipdotter_spark.sources import corpus

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    p = str(tmp_path / "docs_jsonl")
    corpus.write_docs_jsonl(docs, p)
    back, dead = corpus.read_docs_jsonl(spark, p)
    assert dead.count() == 0
    cols = sorted(docs.columns)
    orig = sorted(tuple(r[c] for c in cols) for r in docs.collect())
    got = sorted(tuple(r[c] for c in cols) for r in back.collect())
    assert got == orig


@pytest.mark.spark
def test_jsonl_dead_letter_routing(spark, tmp_path):
    """Malformed lines, type mismatches, and missing primary keys each
    land in the dead letter with the raw line preserved; clean rows pass
    through untouched; extra fields are ignored."""
    from elipdotter_spark.sources import corpus

    p = tmp_path / "corpus.jsonl"
    lines = [
        '{"doc_id": 1, "text": "good one", "lang": "en", "source": "s0", "n_chars": 8}',
        '{"doc_id": 2, "text": "good two", "lang": "en", "source": "s0", "n_chars": 8, "extra": "ignored"}',
        '{"doc_id": 3, "text": "truncated',
        '{"doc_id": "not-a-number", "text": "bad type"}',
        '{"text": "no id here", "lang": "en"}',
    ]
    p.write_text("\n".join(lines) + "\n")
    docs, dead = corpus.read_docs_jsonl(spark, str(p))
    got = {r["doc_id"]: r for r in docs.collect()}
    assert set(got) == {1, 2}
    assert got[2]["text"] == "good two" and got[2]["n_chars"] == 8
    dl = {(r["reason"], r["raw"]) for r in dead.collect()}
    reasons = sorted(r for r, _ in dl)
    assert reasons == ["corrupt_json", "corrupt_json", "missing_doc_id"]
    raws = {raw for _, raw in dl}
    assert lines[2] in raws and lines[3] in raws
    assert any('"no id here"' in raw for raw in raws)


@pytest.mark.spark
def test_cli_build_from_jsonl(tmp_path):
    """cli build --format jsonl indexes the clean rows and reports/writes
    the dead letter; queries over the built store work as usual."""
    import json as _json

    from elipdotter_spark import cli
    from elipdotter_spark.sources import corpus

    spark = cli.get_spark()
    src = str(tmp_path / "in_jsonl")
    corpus.write_docs_jsonl(
        spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50), src
    )
    # append one poisoned shard
    (tmp_path / "in_jsonl" / "bad-extra.json").write_text('{"oops...\n')
    idx = str(tmp_path / "idx")
    dl = str(tmp_path / "dead")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli.main([
            "build", "--input", src, "--output", idx, "--segments", "2",
            "--format", "jsonl", "--dead-letter", dl,
        ])
    assert rc == 0
    out = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["n_dead"] == 1 and out["dead_letter"] == dl
    dead = spark.read.parquet(dl).collect()
    assert dead[0]["reason"] == "corrupt_json"
    from elipdotter_spark.sources.catalog import IndexStore

    store = IndexStore(spark, idx)
    assert store.corpus_stats()[0] == 50


def test_cli_build_from_pages(tmp_path):
    """cli build --format pages runs the crawl front door (recrawl collapse
    + HTML extraction), dead-letters markup leftovers, and indexes the
    extracted text; a query over the built store finds page content."""
    import json as _json

    from pyspark.sql import functions as F

    from elipdotter_spark import cli
    from elipdotter_spark.operators import html as H

    spark = cli.get_spark()
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .limit(60)
        .select("doc_id", "text")
    )
    pages = H.synth_crawl_pages(docs).drop("warc_epoch")
    # poison one page with a raw '<' leftover (unclosed, not a tag start)
    pages = pages.withColumn(
        "html",
        F.when(
            F.col("doc_id") == 1,  # doc 1 wins page 0's recrawl (epoch 7 > 3 > 0)
            F.encode(F.lit("<p>broken a < b never closed"), "utf-8"),
        ).otherwise(F.col("html")),
    )
    src = str(tmp_path / "pages")
    pages.write.parquet(src)
    idx = str(tmp_path / "idx")
    dl = str(tmp_path / "dead")
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = cli.main([
            "build", "--input", src, "--output", idx, "--segments", "2",
            "--format", "pages", "--dead-letter", dl,
        ])
    assert rc == 0
    out = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["n_dead"] == 1 and out["dead_letter"] == dl
    dead = spark.read.parquet(dl).collect()
    assert [r["doc_id"] for r in dead] == [1] and dead[0]["has_markup"]

    from elipdotter_spark.sources.catalog import IndexStore

    store = IndexStore(spark, idx)
    # 60 crawls -> 20 canonical pages, minus the poisoned winner's page if
    # doc 0 won its page (doc 0 is the tie/epoch loser or winner by
    # arithmetic; just assert the collapse happened and the store serves)
    n_docs = store.corpus_stats()[0]
    assert n_docs in (19, 20)
    # extracted title text ("doc" N) is indexed alongside the body
    terms = store.published_terms().filter(F.col("term") == "doc").collect()
    assert terms and terms[0]["df"] == n_docs
