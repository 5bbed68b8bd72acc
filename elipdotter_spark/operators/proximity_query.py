"""Phrase / ordered-proximity retrieval over positional postings.

The reference expresses proximity through the scoring pipeline's
``distance_threshold`` (replicated in plans.compiler); this operator adds the
explicit *ordered* form the north star names ("phrase/proximity via
positional postings"): documents containing the query terms in order, each
within ``max_gap`` bytes of the previous.

All JVM-side array higher-order functions over the stored position arrays —
the chain is folded term by term: positions that *continue* a chain from the
previous term's chain positions survive.  Per-doc cost is O(sum |positions|^2)
in the worst case but runs inside whole-stage codegen on arrays that are
document-bounded, never collection-bounded.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def ordered_near_docs(
    postings: DataFrame, terms: Sequence[str], max_gap: int
) -> DataFrame:
    """doc_ids containing ``terms`` in order with consecutive byte gaps in
    (0, max_gap].  With ``max_gap`` ≈ len(term)+1 this is phrase search on
    space-separated text; larger gaps give ordered proximity windows."""
    if not terms:
        raise ValueError("terms must be non-empty")
    chain = None
    for i, t in enumerate(terms):
        p = (
            postings.filter(F.col("term") == t)
            .select("doc_id", F.col("positions").alias(f"pos{i}"))
        )
        if chain is None:
            chain = p.withColumn("chain", F.col("pos0")).drop("pos0")
            continue
        chain = (
            chain.join(p, "doc_id")
            .withColumn(
                "chain",
                F.filter(
                    F.col(f"pos{i}"),
                    lambda y: F.exists(
                        F.col("chain"),
                        lambda x: (y > x) & ((y - x) <= F.lit(max_gap)),
                    ),
                ),
            )
            .drop(f"pos{i}")
            .filter(F.size("chain") > 0)
        )
    return chain.select("doc_id")


def ordered_near_docs_python(docs_tokens, terms, max_gap):
    """Brute-force referee: docs_tokens = {doc_id: [(term, pos)...]}."""
    out = []
    for doc, toks in docs_tokens.items():
        chain = [p for t, p in toks if t == terms[0]]
        for t in terms[1:]:
            pos = [p for tt, p in toks if tt == t]
            chain = [y for y in pos if any(0 < y - x <= max_gap for x in chain)]
            if not chain:
                break
        if chain:
            out.append(doc)
    return sorted(out)
