"""URL / domain operators: parse + normalize edge cases, dedup, caps.

The gate corpus (entry URLS_SQL) only exercises the synth shapes; these
unit tests pin the parser on hand-written adversarial URLs."""

import pytest
from pyspark.sql import functions as F

from elipdotter_spark.operators import urls


def _parse(spark, url_list):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(url_list)], "doc_id long, url string"
    )
    rows = urls.parse_urls(df).orderBy("doc_id").collect()
    return [r.asDict() for r in rows]


@pytest.mark.spark
def test_parse_edge_cases(spark):
    got = _parse(
        spark,
        [
            # case fold + default https port + fragment + userinfo
            "HTTPS://Bob:pw@WWW.Example.COM:443/A/B/#frag",
            # non-default port kept
            "http://example.com:8080/x",
            # default http port stripped
            "http://example.com:80/x",
            # empty path -> '/', tracking-only query -> no params
            "https://example.com?utm_source=a&utm_campaign=b",
            # param sort + mixed tracking battery
            "https://example.com/p?z=9&gclid=g1&a=1&msclkid=m&mc_eid=x&ref=r",
            # IP host: registered_domain is the IP
            "http://192.168.0.1/admin",
            # co.uk second-level suffix
            "https://news.bbc.co.uk/story/1",
            # root path stays '/'
            "https://example.com/",
            # no scheme -> dead-letter shape (all-empty)
            "not a url at all",
            # plus/dot scheme chars
            "git+ssh://host.example/repo",
        ],
    )
    assert got[0]["scheme"] == "https"
    assert got[0]["host"] == "www.example.com"
    assert got[0]["registered_domain"] == "example.com"
    assert got[0]["norm_url"] == "https://www.example.com/A/B"
    assert got[0]["path_depth"] == 2

    assert got[1]["norm_url"] == "http://example.com:8080/x"
    assert got[2]["norm_url"] == "http://example.com/x"

    assert got[3]["n_params"] == 0
    assert got[3]["norm_url"] == "https://example.com/"
    assert got[3]["path_depth"] == 0

    assert got[4]["n_params"] == 2
    assert got[4]["norm_url"] == "https://example.com/p?a=1&z=9"

    assert got[5]["registered_domain"] == "192.168.0.1"
    assert got[6]["registered_domain"] == "bbc.co.uk"
    assert got[6]["host"] == "news.bbc.co.uk"

    assert got[7]["norm_url"] == "https://example.com/"

    assert got[8]["scheme"] == "" and got[8]["norm_url"] == ""

    assert got[9]["scheme"] == "git+ssh"
    assert got[9]["host"] == "host.example"


@pytest.mark.spark
def test_url_dedup_collapses_crawl_variants(spark):
    ids = spark.range(0, 99).select(F.col("id").alias("doc_id"))
    docs = urls.synth_urls(ids)
    survivors = urls.url_dedup(docs).collect()
    # 3 variants per page, 33 pages
    assert len(survivors) == 33
    assert all(r.n_dups == 3 for r in survivors)
    assert sorted(r.doc_id for r in survivors) == [i * 3 for i in range(33)]


@pytest.mark.spark
def test_domain_cap_deterministic(spark):
    ids = spark.range(0, 300).select(F.col("id").alias("doc_id"))
    docs = urls.synth_urls(ids)
    capped = urls.domain_cap(docs, cap=5)
    rows = capped.collect()
    per_dom = {}
    for r in rows:
        per_dom.setdefault(r.registered_domain, []).append(r)
    for dom, rs in per_dom.items():
        assert len(rs) <= 5, dom
        assert sorted(r.rk for r in rs) == list(range(1, len(rs) + 1))
    # deterministic across runs
    again = sorted((r.doc_id, r.registered_domain, r.rk) for r in capped.collect())
    assert again == sorted((r.doc_id, r.registered_domain, r.rk) for r in rows)


@pytest.mark.spark
def test_parse_plan_is_single_stage(spark):
    """parse_urls must stay a shuffle-free scan->project plan."""
    ids = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    plan = urls.parse_urls(urls.synth_urls(ids))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


@pytest.mark.spark
def test_block_domains_suffix_semantics(spark):
    df = spark.createDataFrame(
        [
            (0, "https://ads.example.com/x"),    # subdomain of blocked
            (1, "https://example.com/y"),        # exact blocked
            (2, "https://notexample.com/z"),     # NOT a suffix match
            (3, "https://sub.deep.bad.co.uk/w"), # deep subdomain
            (4, "https://good.org/v"),
            (5, "https://only.this.net/u"),      # entry is a subdomain
            (6, "https://this.net/t"),           # parent of entry: NOT blocked
        ],
        "doc_id long, url string",
    )
    blocked = ["example.com", "bad.co.uk", "only.this.net"]
    got = {
        r.doc_id: r.blocked
        for r in urls.block_domains(df, blocked).collect()
    }
    assert got == {0: True, 1: True, 2: False, 3: True, 4: False,
                   5: True, 6: False}


@pytest.mark.spark
def test_block_domains_dataframe_path_matches_list(spark):
    ids = spark.range(0, 150).select(F.col("id").alias("doc_id"))
    docs = urls.synth_urls(ids)
    blocked = ["site0.com", "blog.site2.org"]
    lst = sorted(
        (r.doc_id, r.blocked)
        for r in urls.block_domains(docs, blocked).collect()
    )
    bdf = spark.createDataFrame([(b,) for b in blocked], "domain string")
    dfp = sorted(
        (r.doc_id, r.blocked)
        for r in urls.block_domains(docs, bdf).collect()
    )
    assert lst == dfp
    assert any(b for _, b in lst) and not all(b for _, b in lst)


@pytest.mark.spark
def test_block_domains_list_plan_no_shuffle(spark):
    ids = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    plan = (
        urls.block_domains(urls.synth_urls(ids), ["site0.com"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
