"""HTML extraction + recrawl collapse: adversarial inputs, plan shapes.

The gate corpus (entry HTML_SYNTH_SQL) exercises the synth shapes; these
unit tests pin the extractor on hand-written pathological HTML."""

import pytest
from pyspark.sql import functions as F

from elipdotter_spark.operators import html as H
from elipdotter_spark.operators import urls


def _extract(spark, html_list):
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(html_list)], "doc_id long, html string"
    )
    rows = H.html_to_text(df).orderBy("doc_id").collect()
    return [(r.extracted, r.has_markup) for r in rows]


@pytest.mark.spark
def test_extract_edge_cases(spark):
    got = _extract(
        spark,
        [
            # script containing a raw < ; style with braces; comment
            "<html><head><style>a { x: 1; }</style>"
            "<script>if (1 < 2) { alert('<b>'); }</script></head>"
            "<body><!-- note --><p>hello world</p></body></html>",
            # multiline comment + uppercase SCRIPT/closing case mix
            "<body><!-- line1\nline2 --><SCRIPT src='x'>var y;</script>ok</body>",
            # entity battery incl. the double-escape: &amp;lt; is literal &lt;
            "<p>1 &lt; 2 &amp; 3 &gt; 0 &quot;q&quot; &#39;a&#39; "
            "&apos;b&apos; x&nbsp;y &amp;lt;keep&amp;gt;</p>",
            # decoded &lt; must NOT trip has_markup
            "<p>a &lt; b</p>",
            # raw unescaped < with no closing > survives -> has_markup
            "<p>a < b</p>",
            # whitespace collapse across tags and newlines
            "<div>  a\n\n b\t\tc </div>\n<div>d</div>",
            # noscript removed with content
            "<noscript><img src='t.gif'></noscript>text",
            # nested/unknown tags stripped, content kept in order
            "<article><h1>T</h1><section><em>a</em>b</section></article>",
            # empty page
            "<html><body></body></html>",
        ],
    )
    assert got[0] == ("hello world", False)
    assert got[1] == ("ok", False)
    assert got[2] == ("1 < 2 & 3 > 0 \"q\" 'a' 'b' x y &lt;keep&gt;", False)
    assert got[3] == ("a < b", False)
    assert got[4] == ("a < b", True)
    assert got[5] == ("a b c d", False)
    assert got[6] == ("text", False)
    assert got[7] == ("T a b", False)
    assert got[8] == ("", False)


@pytest.mark.spark
def test_extract_binary_column_and_plan(spark):
    docs = spark.range(0, 50).select(F.col("id").alias("doc_id"),
                                     F.lit("big order scan").alias("text"))
    pages = H.synth_crawl_pages(docs)
    assert dict(pages.dtypes)["html"] == "binary"
    out = H.html_to_text(pages)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    r = out.filter(F.col("doc_id") == 0).select("extracted").first()
    # title kept, script dropped, text present, entities decoded
    assert r.extracted.startswith("Doc 0")
    assert "var x" not in r.extracted
    assert "big order scan" in r.extracted
    assert "Tom & Jerry rule &lt;ok&gt;" in r.extracted


@pytest.mark.spark
def test_recrawl_latest_winner_and_ties(spark):
    docs = spark.range(0, 120).select(F.col("id").alias("doc_id"),
                                      F.lit("t").alias("text"))
    pages = H.synth_crawl_pages(docs)
    out = H.recrawl_latest(pages).collect()
    # 3 crawl variants per page -> 40 pages
    assert len(out) == 40
    assert all(r.n_crawls == 3 for r in out)
    by_page = {r.doc_id // 3: r for r in out}
    for p, r in by_page.items():
        ids = [3 * p, 3 * p + 1, 3 * p + 2]
        if p % 13 == 5:
            # tie page: all epochs equal -> highest id wins
            assert r.doc_id == 3 * p + 2, r
        else:
            want = max(ids, key=lambda d: (d * 7 % 11, d))
            assert r.doc_id == want, (p, r)


@pytest.mark.spark
def test_recrawl_plan_single_aggregate(spark):
    """recrawl must be one hash aggregate (max_by) — no window/sort."""
    docs = spark.range(0, 30).select(F.col("id").alias("doc_id"),
                                     F.lit("t").alias("text"))
    plan = (
        H.recrawl_latest(H.synth_crawl_pages(docs))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, plan
    assert plan.count("Exchange") == 1, plan


@pytest.mark.spark
def test_crawl_ingest_equals_staged(spark):
    docs = spark.range(0, 60).select(F.col("id").alias("doc_id"),
                                     F.lit("alpha beta").alias("text"))
    pages = H.synth_crawl_pages(docs)
    composed = sorted(
        tuple(r) for r in H.crawl_ingest(pages)
        .select("doc_id", "norm_url", "text_clean", "n_crawls").collect()
    )
    latest = H.recrawl_latest(pages)
    staged = sorted(
        tuple(r) for r in H.html_to_text(latest, out_col="text_clean")
        .select("doc_id", "norm_url", "text_clean", "n_crawls").collect()
    )
    assert composed == staged


@pytest.mark.spark
def test_recrawl_unparseable_urls_preserved(spark):
    df = spark.createDataFrame(
        [(1, "not a url", 10, "x"), (2, "not a url", 20, "y"),
         (3, "https://a.example/p", 5, "z")],
        "doc_id long, url string, warc_ts long, html string",
    )
    out = {r.doc_id: r for r in H.recrawl_latest(df).collect()}
    # identical RAW urls collapse (keyed raw:<url>), latest ts wins
    assert set(out) == {2, 3}
    assert out[2].n_crawls == 2 and out[2].norm_url == ""
    assert out[3].n_crawls == 1


@pytest.mark.spark
def test_outlinks_extraction(spark):
    df = spark.createDataFrame(
        [
            (0, '<a href="https://a.example/x?utm_source=t">one</a>'
                "<a href='https://b.example/y/'>two</a>"
                '<a href="/relative">rel</a>'
                '<a href="mailto:x@y.z">mail</a>'),
            # same target twice = two edges; <area href> must NOT match <a
            (1, '<a href="https://a.example/x">p</a>'
                '<a class="b" href="https://a.example/x">q</a>'
                '<area href="https://map.example/z">'),
            (2, "no links here"),
        ],
        "doc_id long, html string",
    )
    rows = sorted(
        (r.doc_id, r.dst_norm_url) for r in H.outlinks(df).collect()
    )
    assert rows == [
        (0, "https://a.example/x"),   # tracking param normalized away
        (0, "https://b.example/y"),   # trailing slash normalized
        (1, "https://a.example/x"),
        (1, "https://a.example/x"),   # multiplicity preserved
    ]


@pytest.mark.spark
def test_page_flags(spark):
    df = spark.createDataFrame(
        [
            (0, '<meta name="robots" content="noindex,nofollow"><p>x</p>'),
            (1, '<meta name="robots" content="index,follow"><p>x</p>'),
            (2, '<link rel="canonical" href="https://c.example/canon"><p>x</p>'),
            (3, "<p>plain</p>"),
            (4, '<META name="robots" content="NOINDEX">'),  # case-insens
        ],
        "doc_id long, html string",
    )
    got = {r.doc_id: (r.noindex, r.canonical_url)
           for r in H.page_flags(df).collect()}
    assert got[0] == (True, "")
    assert got[1] == (False, "")
    assert got[2] == (False, "https://c.example/canon")
    assert got[3] == (False, "")
    assert got[4][0] is True


@pytest.mark.spark
def test_link_stats_aggregation(spark):
    docs = spark.range(0, 90).select(F.col("id").alias("doc_id"),
                                     F.lit("t").alias("text"))
    pages = H.synth_crawl_pages(docs)
    stats = {r.dst_domain: r for r in H.link_stats(pages).collect()}
    # every page links out{p%4}.example; q.example from d%9==4 variants
    assert set(stats) == {"out0.example", "out1.example", "out2.example",
                          "out3.example", "q.example"}
    assert sum(r.n_links for r in stats.values()) == 90 + len(
        [d for d in range(90) if d % 9 == 4]
    )


@pytest.mark.spark
def test_anchor_texts_extraction(spark):
    df = spark.createDataFrame(
        [
            # inner markup stripped, entities decoded, ws collapsed
            (0, '<a href="https://a.example/x">more <b>topic 3</b> &amp; info</a>'
                "<a href='https://b.example/y'>  spaced\n words </a>"
                '<a href="/relative">rel</a>'),
            # unclosed anchor -> skipped (outlinks still counts the edge)
            (1, '<a href="https://a.example/x">dangling'),
            # same target twice: two anchor rows
            (2, '<a href="https://a.example/x">one</a>'
                '<a id="z" href="https://a.example/x">two</a>'),
        ],
        "doc_id long, html string",
    )
    rows = sorted(
        (r.doc_id, r.dst_norm_url, r.anchor)
        for r in H.anchor_texts(df).collect()
    )
    assert rows == [
        (0, "https://a.example/x", "more topic 3 & info"),
        (0, "https://b.example/y", "spaced words"),
        (2, "https://a.example/x", "one"),
        (2, "https://a.example/x", "two"),
    ]
    assert H.outlinks(df).filter("doc_id = 1").count() == 1


@pytest.mark.spark
def test_anchor_terms_aggregation(spark):
    df = spark.createDataFrame(
        [
            (0, '<a href="https://t.example/p">fast search</a>'),
            # one page spamming the same anchor: n_anchors grows,
            # n_src_docs stays 1 per source page
            (1, '<a href="https://t.example/p">fast</a>'
                '<a href="https://t.example/p">fast</a>'),
            (2, '<a href="https://t.example/p">FAST engine</a>'),
        ],
        "doc_id long, html string",
    )
    rows = {
        (r.term): (r.n_anchors, r.n_src_docs)
        for r in H.anchor_terms(df).collect()
    }
    assert rows == {
        "fast": (4, 3),
        "search": (1, 1),
        "engine": (1, 1),
    }


@pytest.mark.spark
def test_anchor_augment_appends_capped_terms(spark):
    pages = spark.createDataFrame(
        [
            (10, "https://src1.example/a", 1700000000,
             '<html><body>alpha <a href="https://t.example/p">great engine</a></body></html>'),
            (11, "https://src2.example/b", 1700000000,
             '<html><body>beta <a href="https://t.example/p">great</a></body></html>'),
            (12, "https://t.example/p", 1700000000,
             "<html><body>the target page text</body></html>"),
        ],
        "doc_id long, url string, warc_ts long, html string",
    )
    pages = pages.withColumn("warc_ts", F.timestamp_seconds("warc_ts"))
    docs = H.crawl_ingest(pages)
    out = H.anchor_augment(docs, pages, max_repeat=2)
    by_url = {r.url: r for r in out.collect()}
    tgt = by_url["https://t.example/p"]
    # 'great' linked from 2 docs -> repeated min(2, cap=2) times
    assert tgt.anchor_text == "engine great great"
    assert tgt.text_indexed == "the target page text engine great great"
    src = by_url["https://src1.example/a"]
    assert src.anchor_text == "" and src.text_indexed == src.text_clean
