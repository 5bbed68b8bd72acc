"""HTML text extraction + recrawl collapse for Common-Crawl-style pages.

The BASELINE input_hint table is ``pages(url, warc_ts, html binary, text,
lang)``.  Before any text-level work a crawl pipeline runs two steps this
module provides:

- ``html_to_text``: deterministic HTML -> text extraction (comment /
  script / style / noscript removal, tag strip, core entity decode,
  whitespace collapse) as ONE chain of whole-stage-codegen
  ``regexp_replace`` expressions — no Python, no shuffle, rides the page
  scan at 100 TB.  ``sources.corpus.extract_text`` remains the byte-
  identity invariant path for the synthetic ``<html><body>`` wrapper; this
  operator is the crawl-realistic path with its own documented
  normalization (cross-engine gated: ``web_html_extract``).
- ``recrawl_latest``: one surviving crawl per canonical URL — the LATEST
  ``warc_ts`` (ties by highest doc id), computed as ONE map-side-combined
  ``max_by`` hash aggregate on the normalized URL (no window, no sort;
  the aggregation buffer holds one row per page).  Gated:
  ``web_recrawl_latest``.
- ``crawl_ingest``: the composed front door pages -> recrawl collapse ->
  text extraction -> documents shape.  Gated: ``web_crawl_ingest``.

Portability rules (the PII_PATTERNS discipline): every pattern is in the
Java-regex ∩ RE2 subset — explicit character classes (never ``\\s``: Java
and RE2 disagree on U+000B), inline ``(?si)`` flags, non-greedy ``.*?``;
no lookaround, no backreferences (hence one pass PER removed element name
instead of a backreferenced ``<(x)>.*?</\\1>``).

Extraction spec (documented order; both engines implement exactly this):
  1. ``<!-- ... -->`` comments removed (dotall)
  2. ``<script>``/``<style>``/``<noscript>`` ELEMENTS removed including
     their content (dotall + case-insensitive; one pass per name)
  3. every remaining tag (``<`` + optional ``!``/``/`` + a LETTER, up to
     the next ``>``) replaced by ONE space; a bare ``<`` not opening a
     tag is text (browser behavior).  Attribute values containing a raw
     ``>`` are out of scope — real crawls escape them; the ``has_markup``
     audit column catches both that and stray ``<``/``>`` leftovers
  4. core entities decoded: ``&lt; &gt; &quot; &#39; &apos; &nbsp;`` then
     ``&amp;`` LAST (so ``&amp;lt;`` correctly yields literal ``&lt;``);
     numeric entities beyond ``&#39;`` are left as-is (the production swap
     is an Arrow UDF running html.unescape behind the same contract)
  5. whitespace runs ``[ \\t\\n\\r\\f]+`` collapsed to one space, trimmed
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# step-ordered (pattern, replacement) batteries; applied top to bottom.
# STRIP removes structure (spec steps 1-3); DECODE is entities then
# whitespace (steps 4-5).  The markup audit reads BETWEEN the two: a
# decoded ``&lt;`` is legitimate text, a raw ``<`` surviving the strip is
# unescaped/truncated markup.
HTML_STRIP_STEPS = [
    (r"(?s)<!--.*?-->", ""),
    (r"(?si)<script[^>]*>.*?</script>", ""),
    (r"(?si)<style[^>]*>.*?</style>", ""),
    (r"(?si)<noscript[^>]*>.*?</noscript>", ""),
    # a tag starts with a letter, '/', or '!' (doctype) — a bare '<'
    # followed by anything else is TEXT (browser behavior) and must not
    # swallow content up to the next '>'; it surfaces via has_markup
    (r"(?s)<[!/]?[A-Za-z][^>]*>", " "),
]
HTML_DECODE_STEPS = [
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"&apos;", "'"),
    (r"&nbsp;", " "),
    (r"&amp;", "&"),
    (r"[ \t\n\r\f]+", " "),
]


# anchor-text cleanup = the page battery minus the element removals (an
# anchor's inner text cannot span script/style/comment blocks): tag strip,
# entity decode, whitespace collapse.  Shared by the Spark operator and
# the generated DuckDB twin (entry.py) — single source of truth.
ANCHOR_CLEAN_STEPS = [HTML_STRIP_STEPS[-1]] + HTML_DECODE_STEPS


def _chain(col: Column, steps) -> Column:
    out = col
    for pat, rep in steps:
        out = F.regexp_replace(out, pat, rep)
    return out


def html_to_text(
    pages: DataFrame, html_col: str = "html", out_col: str = "extracted"
) -> DataFrame:
    """Add ``out_col`` (extracted text) + ``has_markup`` (a raw ``<`` or
    ``>`` survived the structural strip — unescaped attribute ``>`` or
    truncated markup; route those to a dead letter / re-extraction like
    the JSONL and multimodal readers do).  ``html_col`` may be binary
    (decoded as UTF-8) or string.

    Plan shape: the stripped intermediate is a NAMED multi-referenced
    column (computed once per row — the HOF/CollapseProject lesson); the
    whole operator is one whole-stage-codegen projection chain."""
    dtype = dict(pages.dtypes)[html_col]
    raw = (
        F.decode(F.col(html_col), "utf-8")
        if dtype == "binary"
        else F.col(html_col)
    )
    return (
        pages.withColumn("_stripped", _chain(raw, HTML_STRIP_STEPS))
        .withColumn(
            "has_markup",
            F.col("_stripped").contains("<") | F.col("_stripped").contains(">"),
        )
        .withColumn(
            out_col, F.trim(_chain(F.col("_stripped"), HTML_DECODE_STEPS))
        )
        .drop("_stripped")
    )


def recrawl_latest(
    pages: DataFrame, url_col: str = "url", ts_col: str = "warc_ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """One surviving crawl per canonical URL: the latest ``ts_col`` row
    (ties broken by highest ``id_col`` — later-ingested wins), plus
    ``n_crawls``.  Canonical identity is ``urls.parse_urls``'s
    ``norm_url``; unparseable URLs (norm_url = '') are preserved as their
    own rows keyed by the raw url (prefixed so they can't collide with a
    real norm_url) so the dead-letter path still sees every doc.

    Plan: one hash aggregate (map-side combined) via ``max_by`` on a
    (ts, id) struct — no window, no per-group sort; the whole crawl
    collapse is a single shuffle on the page key."""
    from .urls import parse_urls

    parsed = parse_urls(pages, url_col=url_col)
    key = F.when(
        F.col("norm_url") == "", F.concat(F.lit("raw:"), F.col(url_col))
    ).otherwise(F.col("norm_url"))
    data_cols = [c for c in pages.columns]
    rows = parsed.withColumn("_key", key)
    agg = rows.groupBy("_key").agg(
        F.max_by(
            F.struct(*[F.col(c) for c in data_cols] + [F.col("norm_url")]),
            F.struct(F.col(ts_col), F.col(id_col)),
        ).alias("w"),
        F.count("*").alias("n_crawls"),
    )
    return agg.select(
        *[F.col(f"w.{c}").alias(c) for c in data_cols],
        F.col("w.norm_url").alias("norm_url"),
        "n_crawls",
    )


def crawl_ingest(
    pages: DataFrame, url_col: str = "url", ts_col: str = "warc_ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """The crawl front door: recrawl collapse -> HTML text extraction ->
    documents shape ``(doc_id, url, norm_url, warc_ts, lang, text_clean,
    has_markup, n_crawls)``.  Pure composition of the two gated stages —
    bit-identical to running them one at a time."""
    latest = recrawl_latest(pages, url_col=url_col, ts_col=ts_col, id_col=id_col)
    out = html_to_text(latest, html_col="html", out_col="text_clean")
    keep = [
        c
        for c in [id_col, url_col, "norm_url", ts_col, "lang", "text_clean",
                  "has_markup", "n_crawls"]
        if c in out.columns
    ]
    return out.select(*keep)


# anchor href: <a + whitespace, attrs, href = "..." or '...'; two variants
# because a backref-free (RE2) pattern can't tie the quote pair
HREF_DQ = r"(?si)<a[ \t\n\r\f][^>]*href[ \t\n\r\f]*=[ \t\n\r\f]*\"([^\"]+)\""
HREF_SQ = r"(?si)<a[ \t\n\r\f][^>]*href[ \t\n\r\f]*=[ \t\n\r\f]*'([^']+)'"
# href + inner text of a COMPLETE anchor element (non-greedy to the first
# close tag; RE2-safe — no backreference ties the quote style, hence two
# patterns).  Nested markup inside the anchor is stripped downstream.
ANCHOR_DQ = (
    r"(?si)<a[ \t\n\r\f][^>]*href[ \t\n\r\f]*=[ \t\n\r\f]*\"([^\"]+)\""
    r"[^>]*>(.*?)</a[ \t\n\r\f]*>"
)
ANCHOR_SQ = (
    r"(?si)<a[ \t\n\r\f][^>]*href[ \t\n\r\f]*=[ \t\n\r\f]*'([^']+)'"
    r"[^>]*>(.*?)</a[ \t\n\r\f]*>"
)
ROBOTS_NOINDEX = (
    r"(?si)<meta[ \t\n\r\f][^>]*name[ \t\n\r\f]*=[ \t\n\r\f]*\"robots\""
    r"[^>]*content[ \t\n\r\f]*=[ \t\n\r\f]*\"[^\"]*noindex[^\"]*\""
)
CANONICAL_HREF = (
    r"(?si)<link[ \t\n\r\f][^>]*rel[ \t\n\r\f]*=[ \t\n\r\f]*\"canonical\""
    r"[^>]*href[ \t\n\r\f]*=[ \t\n\r\f]*\"([^\"]+)\""
)


def _html_str(pages: DataFrame, html_col: str) -> Column:
    dtype = dict(pages.dtypes)[html_col]
    return (
        F.decode(F.col(html_col), "utf-8")
        if dtype == "binary"
        else F.col(html_col)
    )


def outlinks(
    pages: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """The webgraph edge list: one row per ABSOLUTE http(s) anchor href —
    ``(doc_id, dst_url, dst_norm_url, dst_domain)`` with the target
    canonicalized by ``urls.parse_urls`` (link identity must match page
    identity or the graph joins miss).  Relative links are skipped (a
    production run resolves them against the page URL first — same plan,
    one concat).  Extraction is regexp_extract_all in a codegen
    projection + one explode; double- and single-quoted hrefs are two
    patterns because RE2 has no backreferences to tie the quote pair.
    No shuffle — the edge list lands partitioned by source page."""
    from .urls import parse_urls

    raw = _html_str(pages, html_col)
    # concat, not array_union: a page linking the same target twice is two
    # edges (union would silently dedup and skew in-link counts)
    hrefs = F.concat(
        F.regexp_extract_all(raw, F.lit(HREF_DQ), 1),
        F.regexp_extract_all(raw, F.lit(HREF_SQ), 1),
    )
    edges = (
        pages.select(F.col(id_col), F.explode(hrefs).alias("dst_url"))
        .filter(
            F.col("dst_url").startswith("http://")
            | F.col("dst_url").startswith("https://")
        )
    )
    parsed = parse_urls(edges, url_col="dst_url")
    return parsed.select(
        id_col,
        "dst_url",
        F.col("norm_url").alias("dst_norm_url"),
        F.col("registered_domain").alias("dst_domain"),
    )


def anchor_texts(
    pages: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Outlink edges WITH their anchor text — the classic web-search
    relevance signal (the text other pages use to describe a target).

    One row per complete absolute-``http(s)`` ``<a href=...>...</a>``
    element: ``(doc_id, dst_url, dst_norm_url, dst_domain, anchor)``
    where ``anchor`` is the element's inner text cleaned by the SAME
    strip/decode battery the page extractor uses (inner tags stripped,
    entities decoded, whitespace collapsed).  Anchors without a closing
    tag are skipped (``outlinks`` still counts the edge).

    Plan shape: the four ``regexp_extract_all`` arrays (dq/sq x
    href/text) are materialized as NAMED columns in their own projection
    (the HOF/CollapseProject lesson), zipped positionally, exploded once;
    everything through tokenization is whole-stage codegen — no shuffle
    until the caller aggregates."""
    from .urls import parse_urls

    raw = _html_str(pages, html_col)
    arr = pages.select(
        F.col(id_col),
        F.concat(
            F.regexp_extract_all(raw, F.lit(ANCHOR_DQ), 1),
            F.regexp_extract_all(raw, F.lit(ANCHOR_SQ), 1),
        ).alias("_hrefs"),
        F.concat(
            F.regexp_extract_all(raw, F.lit(ANCHOR_DQ), 2),
            F.regexp_extract_all(raw, F.lit(ANCHOR_SQ), 2),
        ).alias("_texts"),
    )
    pairs = (
        arr.select(
            id_col, F.explode(F.arrays_zip("_hrefs", "_texts")).alias("_z")
        )
        .select(
            id_col,
            F.col("_z._hrefs").alias("dst_url"),
            F.col("_z._texts").alias("_araw"),
        )
        .filter(
            F.col("dst_url").startswith("http://")
            | F.col("dst_url").startswith("https://")
        )
    )
    parsed = parse_urls(pairs, url_col="dst_url")
    return parsed.select(
        id_col,
        "dst_url",
        F.col("norm_url").alias("dst_norm_url"),
        F.col("registered_domain").alias("dst_domain"),
        F.trim(_chain(F.col("_araw"), ANCHOR_CLEAN_STEPS)).alias("anchor"),
    )


def anchor_terms(
    pages: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Per-target anchor-term table: ``(dst_norm_url, term, n_anchors,
    n_src_docs)`` — how the web describes each page, tokenized with the
    engine's fast-path tokenizer.  ``n_src_docs`` (distinct linking
    pages) is the anti-spam denominator: one page repeating an anchor a
    thousand times still counts once there.  One hash aggregate on the
    (target, term) key; map-side combine does the heavy lifting because
    popular anchors repeat within partitions."""
    from ..functions.tokenizer import simple_terms_col

    at = anchor_texts(pages, html_col=html_col, id_col=id_col)
    return (
        at.select(
            id_col,
            "dst_norm_url",
            F.explode(simple_terms_col(F.col("anchor"))).alias("term"),
        )
        .groupBy("dst_norm_url", "term")
        .agg(
            F.count("*").alias("n_anchors"),
            F.countDistinct(id_col).alias("n_src_docs"),
        )
    )


def anchor_augment(
    docs: DataFrame, pages: DataFrame, html_col: str = "html",
    id_col: str = "doc_id", max_repeat: int = 3,
) -> DataFrame:
    """Append in-link anchor terms to each document's indexable text —
    the reference engine has no field weighting, so anchor evidence
    enters the index the classic way: as appended text, each term
    repeated ``min(n_src_docs, max_repeat)`` times (capped so one
    link-farm cannot dominate a page's term stats).

    ``docs`` is the ``crawl_ingest`` output (must carry ``norm_url`` +
    ``text_clean``); returns it plus ``anchor_text`` (the deterministic
    sorted blob) and ``text_indexed`` (text_clean + anchors).  The join
    is an aggregated-anchor table onto docs by ``norm_url`` — at web
    scale both sides are pre-shuffled on the same key, and the anchor
    table is orders of magnitude smaller than the corpus."""
    terms = anchor_terms(pages, html_col=html_col, id_col=id_col)
    blob = (
        terms.select(
            "dst_norm_url",
            F.expr(
                f"array_repeat(term, int(least(n_src_docs, {int(max_repeat)})))"
            ).alias("_rep"),
        )
        .groupBy("dst_norm_url")
        .agg(
            F.array_sort(F.flatten(F.collect_list("_rep"))).alias("_terms")
        )
        .select(
            F.col("dst_norm_url").alias("norm_url"),
            F.concat_ws(" ", F.col("_terms")).alias("anchor_text"),
        )
    )
    out = docs.join(blob, "norm_url", "left")
    return out.withColumn(
        "anchor_text", F.coalesce(F.col("anchor_text"), F.lit(""))
    ).withColumn(
        "text_indexed",
        F.when(F.col("anchor_text") == "", F.col("text_clean")).otherwise(
            F.concat_ws(" ", F.col("text_clean"), F.col("anchor_text"))
        ),
    )


def link_stats(
    pages: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Per-target-domain in-link accounting over the outlink edge list:
    in-links, distinct source pages, distinct target pages — the
    centrality-ish quality signal web corpora rank domains by.  One
    map-side-combined aggregate on the (small) domain key."""
    e = outlinks(pages, html_col=html_col, id_col=id_col)
    return e.groupBy("dst_domain").agg(
        F.count("*").alias("n_links"),
        F.countDistinct(id_col).alias("n_src_pages"),
        F.countDistinct("dst_norm_url").alias("n_dst_pages"),
    )


def page_flags(
    pages: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Crawl-directive flags: ``noindex`` (a robots meta whose content
    contains ``noindex`` — such pages must be dropped before indexing)
    and ``canonical_url`` (the page's self-declared rel=canonical target,
    '' when absent — STRONGER dedup identity than URL normalization when
    present).  Pure codegen projection, no shuffle."""
    raw = _html_str(pages, html_col)
    return pages.withColumn("_h", raw).select(
        *pages.columns,
        (F.regexp_count(F.col("_h"), F.lit(ROBOTS_NOINDEX)) > 0).alias("noindex"),
        F.regexp_extract(F.col("_h"), CANONICAL_HREF, 1).alias("canonical_url"),
    )


def synth_crawl_pages(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic input_hint-shaped crawl table for gates/tests:
    ``urls.synth_urls`` crawl-variant URLs (3 variants per canonical page,
    page p = doc_id div 3), a ``warc_ts`` with a distinct-per-variant
    epoch except on tie pages (p % 13 == 5: all three variants share one
    epoch — exercises the id tie-break), and an ``html`` payload wrapping
    the document text with planted structures that hit every extraction
    rule: title, conditional style/script/comment blocks (script contains
    a raw ``<``), entity battery (incl. the ``&amp;lt;`` double-escape),
    an occasional list, and uppercase tags on doc_id % 5 == 0.  The SQL
    twin is entry.CRAWL_SQL; both must stay expression-identical."""
    from .urls import synth_urls

    d = F.col(id_col)
    p = F.expr(f"{id_col} div 3")
    epoch = F.when(
        p % 13 == 5, F.lit(1700000000).cast("long")
    ).otherwise((F.lit(1700000000) + (d * 7 % 11) * 3600).cast("long"))
    tag_open = F.when(d % 5 == 0, "<DIV>").otherwise("<p>")
    tag_close = F.when(d % 5 == 0, "</DIV>").otherwise("</p>")
    style = F.when(
        d % 4 == 1, "<style>p { color: red; }</style>"
    ).otherwise("")
    script = F.when(
        d % 3 == 0, "<script>var x = 1 < 2;</script>"
    ).otherwise("")
    comment = F.when(d % 5 == 2, "<!-- hidden\nnote -->").otherwise("")
    entities = F.when(
        d % 2 == 0, "<p>Tom &amp; Jerry&nbsp;rule &amp;lt;ok&amp;gt;</p>"
    ).otherwise("<p>1 &lt; 2 &gt; 0 &quot;q&quot; &#39;a&#39;</p>")
    lst = F.when(
        d % 7 == 3, "<ul><li>alpha</li><li>beta</li></ul>"
    ).otherwise("")
    # webgraph structures: one absolute outlink per doc, a relative link
    # (excluded by the absolute filter) on evens, a single-quoted href
    # variant, robots-noindex meta, rel=canonical link
    link1 = F.concat(
        F.lit("<a href=\"https://out"),
        (p % 4).cast("string"),
        F.lit(".example/p"),
        p.cast("string"),
        F.lit("\">more <b>topic "),
        (p % 5).cast("string"),
        F.lit("</b> &amp; info</a>"),
    )
    link2 = F.when(d % 2 == 0, "<a href=\"/rel/x\">rel</a>").otherwise("")
    link3 = F.when(
        d % 9 == 4,
        F.concat(
            F.lit("<a href='https://q.example/s"),
            d.cast("string"),
            F.lit("'>q</a>"),
        ),
    ).otherwise("")
    robots = F.when(
        d % 11 == 7, "<meta name=\"robots\" content=\"noindex,nofollow\">"
    ).otherwise("")
    canon = F.when(
        d % 6 == 1,
        F.concat(
            F.lit("<link rel=\"canonical\" href=\"https://site"),
            (p % 7).cast("string"),
            F.lit(".example/canon/"),
            p.cast("string"),
            F.lit("\">"),
        ),
    ).otherwise("")
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        d.cast("string"),
        F.lit("</title>"),
        robots,
        canon,
        style,
        script,
        F.lit("</head><body>"),
        comment,
        tag_open,
        F.col("text"),
        tag_close,
        entities,
        lst,
        link1,
        link2,
        link3,
        F.lit("</body></html>"),
    )
    return synth_urls(docs, id_col=id_col).select(
        d.alias(id_col),
        "url",
        F.timestamp_seconds(epoch).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.col("text"),
        F.lit("en").alias("lang"),
        epoch.alias("warc_epoch"),
    )
