"""URL / domain operators for web-crawl corpora.

The BASELINE input_hint table carries a ``url`` column per page; a
Common-Crawl-style pipeline needs URL-level canonicalization before any
document-level work (the same page is crawled many times under tracking-
param / fragment / case / default-port variants), plus the per-domain
accounting and caps every web-text mixture applies (per-domain doc caps
a la FineWeb / C4's host-level controls).

All operators are single-projection JVM expression plans (regexp + array
ops over short strings — whole-stage codegen, no Python, no shuffle until
the explicitly-keyed aggregates), cross-engine gated against DuckDB
(entry.oracle_sql: web_url_parse / web_url_dedup / web_domain_stats /
web_domain_cap).

Portability rules (the PII_PATTERNS discipline): every regex is in the
Java-regex ∩ RE2 subset — character classes, bounded alternation,
non-capturing groups, anchors; no lookaround, no backrefs.

Normalization spec (documented order; both engines implement exactly this):
  1. scheme  := lower(scheme)
  2. userinfo stripped; host := lower(host); port kept only when present
     and non-default for the scheme (http:80 / https:443 are default)
  3. fragment dropped
  4. tracking query params removed (name matches TRACKING_RE), survivors
     sorted lexicographically as full ``k=v`` strings
  5. path: '' -> '/', else one trailing '/' stripped unless path == '/'
  6. norm_url = scheme '://' host [':' port] path ['?' params]
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# one anchored pass over the URL: scheme, authority, path, ?query, #fragment
URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#(.*))?$"

# tracking-param names every crawl canonicalizer drops (utm battery,
# click ids, mail-merge ids, bare ref)
TRACKING_RE = r"^(utm_[a-z0-9_]+|fbclid|gclid|msclkid|mc_[a-z]+|ref|ref_src)="

# registered domain: 3 labels when the middle label is a common second-level
# suffix with a 2-letter ccTLD (co.uk, com.au, ...), else the last 2 labels.
# A production run swaps this heuristic for a broadcast public-suffix-list
# join; the operator shape (one regexp_extract) is unchanged.
REGDOM_RE = r"([a-z0-9-]+\.(?:co|ac|gov|net|org|com)\.[a-z]{2}|[a-z0-9-]+\.[a-z0-9-]+)$"

_IP_RE = r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$"


def _grp(url_col, i: int):
    return F.regexp_extract(F.col(url_col), URL_RE, i)


def parse_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add parsed + normalized URL columns: ``scheme`` (lower), ``host``
    (lower, userinfo/port stripped), ``registered_domain``, ``path_depth``
    (non-empty segments of the normalized path), ``n_params`` (kept query
    params), ``norm_url``.

    A row whose URL does not match URL_RE (no ``scheme://``) parses to
    empty strings / zeros with ``norm_url = ''`` — callers route those to
    a dead-letter the same way the JSONL/multimodal readers do.

    Plan shape: three stacked projections (raw parts -> derived parts ->
    norm_url); each raw part is a NAMED multi-referenced column so it
    computes once per row (the CollapseProject/HOF re-evaluation gotcha)."""
    raw = (
        df.withColumn("scheme", F.lower(_grp(url_col, 1)))
        .withColumn(
            "_auth", F.regexp_replace(_grp(url_col, 2), r"^[^@]*@", "")
        )
        .withColumn("_rawpath", _grp(url_col, 3))
        .withColumn("_query", _grp(url_col, 4))
    )
    host = F.lower(F.regexp_replace(F.col("_auth"), r":[0-9]+$", ""))
    rport = F.regexp_extract(F.col("_auth"), r":([0-9]+)$", 1)
    # default-port strip (spec step 2)
    port = F.when(
        ((F.col("scheme") == "http") & (rport == "80"))
        | ((F.col("scheme") == "https") & (rport == "443")),
        F.lit(""),
    ).otherwise(rport)
    rp = F.col("_rawpath")
    path = F.when(rp == "", F.lit("/")).otherwise(
        F.when(
            (F.length(rp) > 1) & rp.endswith("/"),
            rp.substr(F.lit(1), F.length(rp) - 1),
        ).otherwise(rp)
    )
    kept = F.when(
        F.col("_query") == "", F.array().cast("array<string>")
    ).otherwise(
        F.array_sort(
            F.filter(
                F.split(F.col("_query"), "&"),
                lambda p: ~p.rlike(TRACKING_RE),
            )
        )
    )
    out = (
        raw.withColumn("host", host)
        .withColumn("_port", port)
        .withColumn("_path", path)
        .withColumn("_kept", kept)
    )
    regdom = F.when(F.col("host").rlike(_IP_RE), F.col("host")).otherwise(
        F.regexp_extract(F.col("host"), REGDOM_RE, 1)
    )
    norm = F.when(F.col("scheme") == "", F.lit("")).otherwise(
        F.concat(
            F.col("scheme"),
            F.lit("://"),
            F.col("host"),
            F.when(F.col("_port") == "", F.lit("")).otherwise(
                F.concat(F.lit(":"), F.col("_port"))
            ),
            F.col("_path"),
            F.when(F.size("_kept") == 0, F.lit("")).otherwise(
                F.concat(F.lit("?"), F.array_join("_kept", "&"))
            ),
        )
    )
    return (
        out.withColumn("registered_domain", regdom)
        .withColumn(
            "path_depth",
            F.size(F.filter(F.split("_path", "/"), lambda s: s != "")).cast("long"),
        )
        .withColumn("n_params", F.size("_kept").cast("long"))
        .withColumn("norm_url", norm)
        .drop("_auth", "_rawpath", "_query", "_port", "_path", "_kept")
    )


def url_dedup(df: DataFrame, url_col: str = "url", id_col: str = "doc_id") -> DataFrame:
    """One survivor per normalized URL: ``(doc_id, norm_url, n_dups)`` with
    the smallest id kept (deterministic; swap the ordering for
    latest-``warc_ts`` recrawl semantics).  One hash aggregate on
    ``norm_url`` — no window, no second shuffle."""
    parsed = parse_urls(df, url_col)
    return parsed.groupBy("norm_url").agg(
        F.min(id_col).alias(id_col),
        F.count("*").alias("n_dups"),
    ).select(id_col, "norm_url", "n_dups")


def domain_stats(df: DataFrame, url_col: str = "url", digits: int = 6) -> DataFrame:
    """Per-registered-domain accounting: docs, distinct canonical pages,
    total chars, corpus doc share — the input to domain weighting/blocking
    decisions.  One aggregate keyed by domain; the share divides by a
    scalar broadcast count."""
    parsed = parse_urls(df, url_col).select(
        "registered_domain", "norm_url", F.length("text").alias("n_chars")
    )
    agg = parsed.groupBy("registered_domain").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("norm_url").alias("n_pages"),
        F.sum("n_chars").alias("n_chars"),
    )
    total = parsed.count()
    return agg.withColumn(
        "doc_share", F.round(F.col("n_docs") / F.lit(float(total)), digits)
    )


def domain_cap(
    df: DataFrame,
    cap: int,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` docs per registered domain, chosen
    deterministically by the engine-portable ``sample_key`` (ties by id) —
    the FineWeb-style per-domain cap, reproducible across engines/re-runs
    (no rand()).  One window partitioned by domain; at 100 TB the skewed
    partitions are exactly the over-cap domains the operator exists to
    bound, and rank-then-filter only ever emits ``cap`` rows per domain."""
    from .text_analysis import sample_key

    parsed = parse_urls(df, url_col)
    w = Window.partitionBy("registered_domain").orderBy(
        sample_key(id_col).asc(), F.col(id_col).asc()
    )
    return (
        parsed.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= cap)
        .select(id_col, "registered_domain", "rk")
    )


def host_suffixes(host_col) -> "F.Column":
    """All dot-suffixes of a host: ``a.b.co.uk -> [a.b.co.uk, b.co.uk,
    co.uk, uk]`` — the matching unit for blocklists and public-suffix
    rules (an entry blocks itself and every subdomain)."""
    labels = F.split(host_col, r"\.")
    n = F.size(labels)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(labels, i, n - i + 1), "."),
    )


def block_domains(
    df: DataFrame,
    blocked,
    url_col: str = "url",
) -> DataFrame:
    """Domain-blocklist audit: adds ``blocked`` — true when ANY dot-suffix
    of the host appears in the blocklist (entry ``example.com`` blocks
    ``example.com`` and all subdomains) — the UT1/adult/malware blocklist
    step every web pipeline runs before spending compute on a page.

    ``blocked`` may be a Python list (≲ thousands of entries: compiled to
    a literal array — pure whole-stage-codegen projection, NO shuffle, no
    broadcast even) or a single-column DataFrame (PSL-scale lists: the
    exploded host-suffix table left-semi-joins the list — Catalyst/AQE
    broadcasts the megabyte side, the corpus never shuffles).  Both paths
    produce identical verdicts (pytest-pinned)."""
    parsed = parse_urls(df, url_col)
    # host materialized by parse_urls; suffixes named once (HOF lesson)
    withsuf = parsed.withColumn("_suf", host_suffixes(F.col("host")))
    if isinstance(blocked, DataFrame):
        bcol = blocked.columns[0]
        hits = (
            withsuf.select("doc_id", F.explode("_suf").alias("_s"))
            .join(blocked.select(F.col(bcol).alias("_s")), "_s")
            .select("doc_id")
            .distinct()
            .withColumn("blocked", F.lit(True))
        )
        return (
            withsuf.join(hits, "doc_id", "left")
            .withColumn("blocked", F.coalesce("blocked", F.lit(False)))
            .drop("_suf")
        )
    arr = F.array(*[F.lit(b) for b in blocked])
    return withsuf.withColumn(
        "blocked", F.size(F.array_intersect("_suf", arr)) > 0
    ).drop("_suf")


def synth_urls(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic crawl-shaped URL per document for gates/tests: page
    identity is ``doc_id div 3`` (so 3 crawl variants share one canonical
    URL) and the variants differ in exactly the noise normalization
    removes — scheme/host case, userinfo, default port, tracking params,
    param order, trailing slash, fragment.  The SQL twin is
    entry.URLS_SQL; both must stay expression-identical."""
    d = F.col(id_col)
    p = F.expr(f"{id_col} div 3")
    site = p % 7
    tld = (
        F.when(site % 3 == 0, "com").when(site % 3 == 1, "co.uk").otherwise("org")
    )
    sub = (
        F.when(p % 4 == 0, "www.")
        .when(p % 4 == 1, "")
        .when(p % 4 == 2, "blog.")
        .otherwise("data.")
    )
    hostc = F.concat(sub, F.lit("site"), site.cast("string"), F.lit("."), tld)
    host_raw = F.when(d % 4 == 2, F.upper(hostc)).otherwise(hostc)
    userinfo = F.when(
        d % 13 == 5, F.concat(F.lit("u"), d.cast("string"), F.lit("@"))
    ).otherwise("")
    scheme_raw = F.when(d % 5 == 0, "HTTPS").otherwise("https")
    port_raw = (
        F.when(p % 9 == 4, ":8443").when(d % 6 == 2, ":443").otherwise("")
    )
    depth = p % 4
    seg1 = F.concat(F.lit("/c"), (p % 5).cast("string"))
    seg2 = F.concat(seg1, F.lit("/i"), p.cast("string"))
    path_ess = (
        F.when(depth == 0, "")
        .when(depth == 1, seg1)
        .when(depth == 2, seg2)
        .otherwise(F.concat(seg2, F.lit("/v1")))
    )
    path_raw = F.concat(path_ess, F.when(d % 7 == 3, "/").otherwise(""))
    qs_ess = (
        F.when(p % 3 == 0, "")
        .when(p % 3 == 1, F.concat(F.lit("id="), p.cast("string")))
        .otherwise(F.concat(F.lit("id="), p.cast("string"), F.lit("&a=1")))
    )
    trk = (
        F.when(d % 3 == 0, F.concat(F.lit("utm_source=s"), d.cast("string")))
        .when(d % 3 == 1, F.concat(F.lit("fbclid=f"), d.cast("string")))
        .otherwise("")
    )
    q_raw = (
        F.when((qs_ess == "") & (trk == ""), "")
        .when(qs_ess == "", trk)
        .when(trk == "", qs_ess)
        .when(d % 2 == 0, F.concat(trk, F.lit("&"), qs_ess))
        .otherwise(F.concat(qs_ess, F.lit("&"), trk))
    )
    query_part = F.when(q_raw == "", "").otherwise(F.concat(F.lit("?"), q_raw))
    frag = F.when(
        d % 2 == 0, F.concat(F.lit("#s"), (d % 4).cast("string"))
    ).otherwise("")
    url = F.concat(
        scheme_raw, F.lit("://"), userinfo, host_raw, port_raw, path_raw,
        query_part, frag,
    )
    return docs.withColumn("url", url)
