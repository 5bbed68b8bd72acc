"""Domain-level webgraph construction + PageRank.

Web corpora weight/filter domains by link-based quality signals (Common
Crawl publishes harmonic-centrality/PageRank rankings for exactly this).
This module builds the weighted domain graph from the gated outlink
extractor and runs PageRank over it as an iterative DataFrame loop with
the same checkpoint/lineage discipline as ``dedup.connected_components``.

Cross-engine gate: ``web_domain_rank`` — the DuckDB twin is a GENERATED
chain of per-iteration CTEs (entry._domain_rank_sql) implementing the
identical formula, so the two engines agree to FP round-off; the gate
compares round(rank, 6).

PageRank semantics (standard, documented so the twin can't drift):
  - nodes: every domain appearing as edge src or dst
  - out-weight: sum of edge weights leaving a domain
  - dangling mass (rank on domains with no outlinks) is redistributed
    uniformly each iteration
  - r_{k+1}(v) = (1-d)/N + d * (sum_{(u,v) in E} r_k(u) * w(u,v)/out(u)
                               + dangling_k / N)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import _persistent_rdd_ids, _unpersist_rdd_ids
from .html import _html_str, HREF_DQ, HREF_SQ
from .urls import parse_urls


def domain_edges(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted domain graph ``(src_domain, dst_domain, weight)`` from the
    pages table in ONE pass: the page URL parse and the href explode share
    a single scan (no self-join of pages against its own outlinks), then
    one aggregate on the (src, dst) pair.  Parallel links between the same
    domains accumulate weight; self-loops are kept (PageRank handles
    them); pages/targets whose domain fails to parse are dropped."""
    p1 = parse_urls(pages, url_col=url_col)
    raw = _html_str(pages, html_col)
    hrefs = F.concat(
        F.regexp_extract_all(raw, F.lit(HREF_DQ), 1),
        F.regexp_extract_all(raw, F.lit(HREF_SQ), 1),
    )
    exploded = (
        p1.select(
            F.col("registered_domain").alias("src_domain"),
            F.explode(hrefs).alias("dst_url"),
        )
        .filter(
            F.col("dst_url").startswith("http://")
            | F.col("dst_url").startswith("https://")
        )
    )
    p2 = parse_urls(exploded, url_col="dst_url")
    return (
        p2.filter(
            (F.col("src_domain") != "") & (F.col("registered_domain") != "")
        )
        .groupBy(
            "src_domain", F.col("registered_domain").alias("dst_domain")
        )
        .agg(F.count("*").cast("double").alias("weight"))
    )


def domain_rank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    digits: int = 6,
    checkpoint_every: int = 3,
) -> DataFrame:
    """PageRank over a weighted domain edge list — ``(domain,
    rank)`` with rank rounded to ``digits`` (FP round-off between engines
    /summation orders lives far below 1e-6 for graphs this shape).

    Scale posture: each iteration is one join + one aggregate, both keyed
    on domain (~10^8 keys web-wide — ordinary shuffle size); the rank
    lineage is truncated by an eager ``localCheckpoint`` every
    ``checkpoint_every`` iterations (k joins would otherwise stack into
    one exploding plan), superseded checkpoints released by RDD id as the
    loop advances (the ``connected_components`` discipline — DataFrame
    .unpersist cannot reach a localCheckpoint's blocks).  The dangling
    mass is a one-row aggregate per iteration (a scalar job, not a
    collect of data)."""
    spark = edges.sparkSession
    edges = edges.select("src_domain", "dst_domain", "weight")
    nodes = (
        edges.select(F.col("src_domain").alias("domain"))
        .union(edges.select(F.col("dst_domain").alias("domain")))
        .distinct()
        .cache()
    )
    n = float(nodes.count())
    outdeg = edges.groupBy("src_domain").agg(F.sum("weight").alias("od")).cache()
    contrib_e = edges.join(outdeg, "src_domain").select(
        "src_domain", "dst_domain", (F.col("weight") / F.col("od")).alias("share")
    ).cache()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    own_ckpt: set = set()
    try:
        for k in range(iters):
            dangling = (
                ranks.join(
                    outdeg.select(F.col("src_domain").alias("domain")),
                    "domain",
                    "left_anti",
                )
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                .first()[0]
            )
            contrib = (
                ranks.join(
                    contrib_e, ranks["domain"] == contrib_e["src_domain"]
                )
                .groupBy(F.col("dst_domain").alias("domain"))
                .agg(F.sum(F.col("rank") * F.col("share")).alias("s"))
            )
            ranks = (
                nodes.join(contrib, "domain", "left")
                .select(
                    "domain",
                    (
                        F.lit((1.0 - damping) / n)
                        + F.lit(damping)
                        * (F.coalesce(F.col("s"), F.lit(0.0))
                           + F.lit(dangling / n))
                    ).alias("rank"),
                )
            )
            if (k + 1) % checkpoint_every == 0 or k == iters - 1:
                before = _persistent_rdd_ids(spark)
                ranks = ranks.localCheckpoint(eager=True)
                new_ids = _persistent_rdd_ids(spark) - before
                _unpersist_rdd_ids(spark, own_ckpt)
                own_ckpt = new_ids
        out = ranks.select(
            "domain", F.round(F.col("rank"), digits).alias("rank")
        )
        # materialize THROUGH the final checkpoint so its blocks (and the
        # cached helper tables) can be released before returning
        out = out.localCheckpoint(eager=True)
        return out
    finally:
        _unpersist_rdd_ids(spark, own_ckpt)
        nodes.unpersist()
        outdeg.unpersist()
        contrib_e.unpersist()


def domain_rank_pages(
    pages: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    digits: int = 6,
) -> DataFrame:
    """Convenience composition: pages -> domain_edges -> domain_rank."""
    return domain_rank(
        domain_edges(pages), iters=iters, damping=damping, digits=digits
    )
