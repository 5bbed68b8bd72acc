"""AST -> DataFrame plan compiler: the distributed query engine.

Architecture (Spark-first, not a port):

- **Term expansion** (fuzzy/prefix, src/proximity.rs): a *distributed* scan of
  the small ``terms`` dictionary — first-char pruned when the dictionary
  exceeds ``word_count_limit`` (partition/file pruning on the sorted term
  column at scale) — rated in Arrow batches, collected (the accepted set is
  tiny) and broadcast.
- **Doc-level retrieval** (src/query.rs:221-240): leaf = broadcast expansion
  join against term-pruned postings; AND = left-semi join on doc_id; OR =
  union+distinct; ``a AND NOT b`` = docs(a) (reference J6 identity).  Catalyst
  picks broadcast/SMJ; AQE handles skew.
- **Occurrence scoring** (src/query.rs:296-573): posting rows for all expanded
  terms are shuffled once by ``doc_id`` and scored by the per-document
  reference kernel inside ``applyInPandas`` (Arrow-batched).  The kernel is
  bit-identical to the sequential reference pipeline thanks to per-node
  stream sentinels (see core.oracle.occurrences_pipeline); the per-node
  max-doc scalars it needs are computed in one Spark job over the doc-level
  set algebra.  Docs that cannot produce hits (not in the root node's doc
  set) are pruned with a semi-join *before* the shuffle.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..core import oracle
from ..core.parser import And, Not, Or, Part, Word, parse, words_in
from ..core.similarity import EXACT, rate_candidate
from . import ast_codec

HIT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("start", LongType(), False),
        StructField("rating", FloatType(), False),
        StructField("word_id", IntegerType(), False),
        StructField("merged", BooleanType(), False),
        StructField(
            "matched",
            ArrayType(
                StructType(
                    [
                        StructField("start", LongType(), False),
                        StructField("word_id", IntegerType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)


class QueryEngine:
    """Query-side engine over (postings, terms) DataFrames.

    ``postings``: (term, doc_id, positions array<long>, tf)
    ``terms``:    (term, df, cf) — the dictionary (used for expansion).
    """

    def __init__(
        self,
        spark: SparkSession,
        postings: DataFrame,
        terms: DataFrame,
        proximity_threshold: float = 0.85,
        algo: str = "hamming",
        word_count_limit: int = 1000,
    ):
        self.spark = spark
        self.postings = postings
        self.terms = terms
        self.threshold = proximity_threshold
        self.algo = algo
        self.word_count_limit = word_count_limit
        self._term_count: Optional[int] = None

    # ------------------------------------------------------------ expansion

    def term_count(self) -> int:
        if self._term_count is None:
            self._term_count = self.terms.count()
        return self._term_count

    def _expansion_scan(self, words: List[str], prune: bool) -> DataFrame:
        """The dictionary scan feeding fuzzy/prefix expansion (S6/F6).

        When the dictionary was published first-char partitioned
        (sources.catalog.write_terms), pruning filters the ``first``
        partition column — Catalyst turns it into PartitionFilters, so only
        the query words' first-char directories are read.  Otherwise falls
        back to a ``startswith`` row filter (min/max page skipping on the
        sorted term column)."""
        scan = self.terms
        if prune:
            first_chars = sorted({w[0] for w in words if w})
            if first_chars and "first" in scan.columns:
                from ..operators.codec import first_char_filter

                scan = first_char_filter(scan, first_chars)
            elif first_chars:
                cond = None
                for c in first_chars:
                    e = F.col("term").startswith(c)
                    cond = e if cond is None else (cond | e)
                scan = scan.filter(cond)
        return scan.select("term")

    def expansions(self, ast: Part) -> Dict[str, Dict[str, np.float32]]:
        """ProximateMap (query word -> {index term -> rating}) computed with a
        distributed dictionary scan (F1-F8; first-char pruning F6)."""
        words = list(dict.fromkeys(words_in(ast)))  # unique, order-stable
        if self.algo == EXACT:
            return {w: {w: np.float32(1.0)} for w in words}

        prune = self.term_count() > self.word_count_limit
        scan = self._expansion_scan(words, prune)

        threshold = np.float32(self.threshold)
        algo = self.algo
        wlist = list(words)
        prune_flag = prune

        from pyspark.sql.types import StringType

        out_schema = StructType(
            [
                StructField("qword", StringType(), False),
                StructField("term", StringType(), False),
                StructField("rating", FloatType(), False),
            ]
        )

        def rate_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from ..functions.similarity import batch_rate_candidates

            for pdf in batches:
                terms_arr = np.asarray(list(pdf["term"]), dtype="U")
                rows_q, rows_t, rows_r = [], [], []
                for w in wlist:
                    if prune_flag and w:
                        sub_mask = np.char.startswith(terms_arr, w[0])
                        sub = terms_arr[sub_mask]
                    else:
                        sub = terms_arr
                    if len(sub) == 0:
                        continue
                    ratings = batch_rate_candidates(w, sub, threshold, algo)
                    hit = ~np.isnan(ratings)
                    for t, r in zip(sub[hit], ratings[hit]):
                        rows_q.append(w)
                        rows_t.append(str(t))
                        rows_r.append(np.float32(r))
                yield pd.DataFrame(
                    {
                        "qword": rows_q,
                        "term": rows_t,
                        "rating": pd.Series(rows_r, dtype="float32"),
                    }
                )

        rated = scan.mapInPandas(rate_batches, schema=out_schema).collect()
        exp: Dict[str, Dict[str, np.float32]] = {w: {} for w in words}
        for row in rated:
            exp[row.qword][row.term] = np.float32(row.rating)
        return {w: dict(sorted(d.items())) for w, d in exp.items()}

    # ------------------------------------------------------------ doc level

    def _expansion_df(self, exp: Dict[str, Dict[str, np.float32]]) -> DataFrame:
        rows = [
            (w, t, float(r))
            for w, d in exp.items()
            for t, r in d.items()
        ]
        schema = "qword string, term string, proximity float"
        return self.spark.createDataFrame(rows, schema=schema)

    def _qword_sets(self, exp: Dict[str, Dict[str, np.float32]]) -> DataFrame:
        """(doc_id, qws array<string>) — per doc, the set of query words with
        at least one expanded-term occurrence.  ONE posting scan + ONE shuffle
        computes the inputs for every node of the boolean algebra: each node's
        doc-set membership is a row-local expression over ``qws`` (see
        :meth:`_node_member_exprs`), so a W-word query costs one scan instead
        of 2W per-leaf scans + distincts."""
        all_terms = sorted({t for d in exp.values() for t in d})
        if not all_terms:
            return self.spark.range(0).select(
                F.col("id").alias("doc_id"),
                F.array().cast("array<string>").alias("qws"),
            )
        exp_df = self._expansion_df(exp).select("qword", "term")
        return (
            self.postings.filter(F.col("term").isin(all_terms))
            .join(F.broadcast(exp_df), "term")
            .groupBy("doc_id")
            .agg(F.collect_set("qword").alias("qws"))
        )

    def _node_member_exprs(self, ast: Part) -> List:
        """Per-node doc-set membership as boolean Columns over the ``qws``
        column, indexed in ``oracle.iter_nodes`` order (preorder; AND-NOT
        keeps the non-NOT side, src/query.rs:133-179).  Leaf = qword present;
        AND = conjunction (J1); OR = disjunction (J2); `a AND NOT b` =
        member(a) (reference J6 identity — NOT applies at scoring only)."""
        exprs: List = []

        def ev(p: Part):
            idx = len(exprs)
            exprs.append(None)  # placeholder, same order as oracle.iter_nodes
            if isinstance(p, Word):
                e = F.array_contains(F.col("qws"), p.text)
            elif isinstance(p, And):
                # the not-inner is still walked for stray-NOT detection and
                # node-id alignment (src/query.rs:156-159,236)
                if isinstance(p.right, Not):
                    e = ev(p.left)
                    ev(p.right.part)
                elif isinstance(p.left, Not):
                    e = ev(p.right)
                    ev(p.left.part)
                else:
                    e = ev(p.left) & ev(p.right)
            elif isinstance(p, Or):
                e = ev(p.left) | ev(p.right)
            else:
                raise oracle.StrayNot()
            exprs[idx] = e
            return e

        ev(ast)
        return exprs

    @staticmethod
    def _effective_leaf(p: Part) -> Optional[Word]:
        """The single Word the root's doc set reduces to, if any: a bare
        Word, or (recursively) the kept side of `x AND NOT y` — J6 makes the
        NOT side irrelevant at doc level.  Lets retrieval skip the qword-set
        aggregate entirely (round-1 fast path, re-measured 2.3x on the
        sf0.1 AND-NOT bench after round 2 lost it)."""
        if isinstance(p, Word):
            return p
        if isinstance(p, And):
            if isinstance(p.right, Not) and not isinstance(p.left, Not):
                return QueryEngine._effective_leaf(p.left)
            if isinstance(p.left, Not) and not isinstance(p.right, Not):
                return QueryEngine._effective_leaf(p.right)
        return None

    def doc_ids(self, ast: Part, exp=None) -> DataFrame:
        """Boolean doc retrieval (EP2; J1/J2/J6) — one scan + one aggregate,
        root-node membership filter; single-leaf roots (a Word, or AND-NOT
        of a Word) short-circuit to a bare term-pruned distinct, skipping
        the collect_set aggregate."""
        if exp is None:
            exp = self.expansions(ast)
        exprs = self._node_member_exprs(ast)  # also validates stray NOTs
        leaf = self._effective_leaf(ast)
        if leaf is not None:
            terms = sorted(exp.get(leaf.text, {}))
            if not terms:
                return self.spark.range(0).select(F.col("id").alias("doc_id"))
            return (
                self.postings.filter(F.col("term").isin(terms))
                .select("doc_id")
                .distinct()
            )
        return self._qword_sets(exp).filter(exprs[0]).select("doc_id")

    # ------------------------------------------------------- node max docs

    def node_max_docs(self, ast: Part, exp) -> List[int]:
        """Per-node stream max-doc scalars (sentinel inputs) in one job:
        conditional maxes over the shared qword-set aggregate."""
        exprs = self._node_member_exprs(ast)
        row = self._qword_sets(exp).agg(
            *[
                F.max(F.when(e, F.col("doc_id"))).alias(f"m{i}")
                for i, e in enumerate(exprs)
            ]
        ).collect()[0]
        return [row[i] if row[i] is not None else -1 for i in range(len(exprs))]

    # ------------------------------------------------------------- scoring

    def _node_max_pairs_df(self, sets: DataFrame, exprs: List) -> DataFrame:
        """One-row DataFrame [(nid, mx)...] of per-node stream max docs —
        the sentinel inputs, computed *in-plan* from the shared qword-set
        aggregate (rides into the scoring job as a broadcast cross-join)."""
        return sets.agg(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("nid"),
                        F.coalesce(
                            F.max(F.when(e, F.col("doc_id"))), F.lit(-1)
                        ).cast("long").alias("mx"),
                    )
                    for i, e in enumerate(exprs)
                ]
            ).alias("node_max_pairs")
        )

    def hits(
        self,
        ast: Part,
        distance_threshold: int,
        exp: Optional[Dict[str, Dict[str, np.float32]]] = None,
        maxes: Optional[List[int]] = None,
    ) -> DataFrame:
        """Rank-identical occurrence scoring, distributed by document.

        Single Spark job (plus the expansion scan in fuzzy mode): the posting
        rows for all expanded terms are pruned by the root doc set, joined
        with the broadcast one-row node-max table (sentinel inputs), shuffled
        once by doc_id and scored by the per-document reference kernel."""
        if exp is None:
            exp = self.expansions(ast)
        exp_df = self._expansion_df(exp)

        all_terms = sorted({t for d in exp.values() for t in d})
        occ = (
            self.postings.filter(F.col("term").isin(all_terms))
            .join(F.broadcast(exp_df), "term")
            .select("qword", "term", "proximity", "doc_id", "positions")
        )
        # prune docs that cannot produce hits (root stream doc set): join the
        # shared qword-set aggregate and filter on root-node membership — the
        # same aggregate feeds the sentinel maxes, so the whole query costs
        # O(1) posting scans regardless of word count
        exprs = self._node_member_exprs(ast)
        sets = self._qword_sets(exp)
        occ = occ.join(sets, "doc_id").filter(exprs[0]).drop("qws")

        n_nodes = len(list(oracle.iter_nodes(ast)))
        if maxes is None:
            occ = occ.crossJoin(F.broadcast(self._node_max_pairs_df(sets, exprs)))
        else:
            pairs = [(i, int(m)) for i, m in enumerate(maxes)]
            occ = occ.withColumn(
                "node_max_pairs",
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("nid"), F.lit(m).cast("long").alias("mx")
                        )
                        for i, m in pairs
                    ]
                ),
            )

        ast_json = ast_codec.dumps(ast)
        dist = int(distance_threshold)

        def score_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            """Docs are contiguous within a partition (hash-repartitioned by
            doc_id + sorted), so we stream Arrow batches, group rows per doc
            in plain dicts (no per-group pandas overhead — the kernel itself
            is ~0.05 ms/doc) and run the reference kernel per doc."""
            part = ast_codec.loads(ast_json)
            f1 = np.float32(1.0)
            f4 = np.float32(4.0)
            maxes_l: List[int] = None  # read from the broadcast column below

            def empty_out():
                return {
                    "doc_id": [],
                    "start": [],
                    "rating": [],
                    "word_id": [],
                    "merged": [],
                    "matched": [],
                }

            def emit(doc: int, rows: list, out: dict) -> None:
                rows.sort(key=lambda r: (r[0], r[1]))  # (qword, term)
                streams: Dict[str, List] = {}
                for qw, _term, prox, positions in rows:
                    lst = streams.setdefault(qw, [])
                    rating = np.float32((np.float32(prox) - f1) * f4)
                    for pos in positions:
                        lst.append((doc, int(pos), rating))
                hits = oracle.occurrences_pipeline(
                    part,
                    lambda w: streams.get(w, []),
                    dist,
                    sentinel_max=maxes_l,
                    current_doc=doc,
                )
                for h in hits:
                    out["doc_id"].append(h.doc_id)
                    out["start"].append(h.start)
                    out["rating"].append(np.float32(h.rating))
                    out["word_id"].append(h.word_id)
                    out["merged"].append(h.merged)
                    out["matched"].append(
                        [
                            {"start": int(s), "word_id": int(w)}
                            for s, w in h.iter_occurrences()
                        ]
                    )

            def to_pdf(out: dict) -> pd.DataFrame:
                return pd.DataFrame(
                    {
                        "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                        "start": pd.Series(out["start"], dtype="int64"),
                        "rating": pd.Series(out["rating"], dtype="float32"),
                        "word_id": pd.Series(out["word_id"], dtype="int32"),
                        "merged": pd.Series(out["merged"], dtype="bool"),
                        "matched": pd.Series(out["matched"], dtype="object"),
                    }
                )

            cur_doc = None
            cur_rows: list = []
            for pdf in batches:
                if maxes_l is None and len(pdf):
                    maxes_l = [-1] * n_nodes
                    for p in pdf["node_max_pairs"].iloc[0]:
                        if p["mx"] is not None:
                            maxes_l[int(p["nid"])] = int(p["mx"])
                out = empty_out()
                for doc, qw, term, prox, positions in zip(
                    pdf["doc_id"].values,
                    pdf["qword"],
                    pdf["term"],
                    pdf["proximity"].values,
                    pdf["positions"],
                ):
                    if doc != cur_doc:
                        if cur_doc is not None:
                            emit(int(cur_doc), cur_rows, out)
                        cur_doc, cur_rows = doc, []
                    cur_rows.append((qw, term, prox, positions))
                yield to_pdf(out)
            out = empty_out()
            if cur_doc is not None:
                emit(int(cur_doc), cur_rows, out)
            yield to_pdf(out)

        occ_sorted = occ.repartition(F.col("doc_id")).sortWithinPartitions("doc_id")
        return occ_sorted.mapInPandas(score_partition, schema=HIT_SCHEMA)

    def topk(self, query: str, distance_threshold: int, k: int) -> DataFrame:
        """Parse -> score -> top-k by rating desc (O2: TakeOrderedAndProject)."""
        ast = parse(query)
        return (
            self.hits(ast, distance_threshold)
            .orderBy(F.desc("rating"), F.asc("doc_id"), F.asc("start"))
            .limit(k)
        )
