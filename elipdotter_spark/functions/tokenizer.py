"""Arrow-batched tokenizer UDFs (reference ``SplitNonAlphanumeric`` semantics).

The per-string semantics live in :mod:`elipdotter_spark.core.tokenize`; here
they are applied per Arrow batch via ``pandas_udf`` — data moves Spark->Python
in columnar batches (no row-at-a-time pickling), and the per-string work is a
single compiled-regex pass.

Two shapes:
- :func:`tokens_udf` -> ``array<struct<term string, pos bigint>>`` — positional
  (the "Lossless" path, byte offsets).
- :func:`simple_terms_col` -> ``array<string>`` — JVM-only terms (the
  whole-stage-codegen fast path for dedup/text-analysis, where reference
  byte-offset/hyphen-compound fidelity is not required).
"""

from __future__ import annotations

from typing import List

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..core.tokenize import tokenize

TOKEN_TYPE = ArrayType(
    StructType(
        [
            StructField("term", StringType(), False),
            StructField("pos", LongType(), False),
        ]
    )
)


@pandas_udf(TOKEN_TYPE)
def tokens_udf(texts: pd.Series) -> pd.Series:
    """text -> [(term, byte_pos)] with full reference semantics
    (hyphen compounds, final-token quirk, per-char Unicode lowercase)."""

    def one(s) -> List[dict]:
        if s is None:
            return []
        return [{"term": t, "pos": p} for t, p in tokenize(s)]

    return texts.map(one)


POSTINGS_TYPE = ArrayType(
    StructType(
        [
            StructField("term", StringType(), False),
            StructField("positions", ArrayType(LongType(), False), False),
        ]
    )
)


@pandas_udf(POSTINGS_TYPE)
def doc_postings_udf(texts: pd.Series) -> pd.Series:
    """text -> per-doc posting fragments [(term, sorted unique positions)].

    A document's tokens are co-located in its own row, so the (term, doc)
    grouping of A1 (src/index.rs:1080-1098) needs **no shuffle**: it happens
    here, in-batch, and the index build's only exchange is the final
    repartition-by-term for the published layout."""

    def one(s) -> List[dict]:
        if s is None:
            return []
        acc = {}
        for t, p in tokenize(s):
            lst = acc.setdefault(t, [])
            lst.append(p)
        return [
            {"term": t, "positions": sorted(set(ps))} for t, ps in acc.items()
        ]

    return texts.map(one)


def simple_terms_col(text_col):
    """JVM-only tokenization for ASCII corpora: lowercase alnum runs.

    This is the *whole-stage-codegen* fast path used by the BM25 /
    training-data operators on corpora known to be ASCII without hyphens
    (where it is provably identical to the reference tokenizer modulo hyphen
    compounds).  Stays entirely JVM-side: no Python transfer at all.

    Implemented as ``regexp_extract_all('[a-z0-9]+')`` over the lowered
    text, NOT ``filter(split(...), t != '')``: the two produce identical
    arrays for every input (alnum runs == split on non-alnum minus
    empties; verified elementwise over 1M docs), but ``filter`` is a
    higher-order function — CodegenFallback, interpreted per element —
    and measured **50x slower** at 1M docs (43.8s vs 0.9s for the
    token-count scan).  Every token-fed operator (cleaning, dedup,
    n-grams, packing) sits on this expression.
    """
    return F.regexp_extract_all(F.lower(text_col), F.lit("[a-z0-9]+"), 0)
