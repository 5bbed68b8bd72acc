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
    StringType,
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
        # set once a topk() prune attempt proves futile on this corpus
        # (theta below the median upper bound -> <2x kernel reduction);
        # later topk() calls then skip the prune phases entirely
        self._prune_futile = False

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
        return self.expansions_for_words(list(dict.fromkeys(words_in(ast))))

    def expansions_for_words(
        self, words: List[str]
    ) -> Dict[str, Dict[str, np.float32]]:
        """Expansion map for an explicit word list — lets a BATCH of queries
        share ONE dictionary scan (the union of all queries' words rates in
        a single mapInPandas pass; :meth:`hits_batch` slices the result per
        query)."""
        words = list(dict.fromkeys(words))
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

    def _qword_sets(
        self,
        exp: Dict[str, Dict[str, np.float32]],
        with_stats: bool = False,
        occ: Optional[DataFrame] = None,
    ) -> DataFrame:
        """(doc_id, qws array<string>) — per doc, the set of query words with
        at least one expanded-term occurrence.  ONE posting scan + ONE shuffle
        computes the inputs for every node of the boolean algebra: each node's
        doc-set membership is a row-local expression over ``qws`` (see
        :meth:`_node_member_exprs`), so a W-word query costs one scan instead
        of 2W per-leaf scans + distincts.

        ``with_stats`` adds, per query word ``j`` (sorted order), the
        scalars the rating upper bound (:meth:`_upper_bound_expr`) needs —
        ``__maxp_j``/``__minp_j`` (extreme expansion proximities present in
        the doc), ``__nocc_j`` (the doc's occurrence count over the word's
        expansions), and ``__minst_j``/``__maxst_j`` (extreme byte START
        positions over those occurrences: the round-5 position-spread
        refinement bounds the adjacency-pair bonus by the words' interval
        gap and refutes the session bonus for two-occurrence words spread
        past the distance threshold) — in the SAME aggregate, so the prune
        costs no extra scan or shuffle."""
        all_terms = sorted({t for d in exp.values() for t in d})
        if not all_terms:
            out = self.spark.range(0).select(
                F.col("id").alias("doc_id"),
                F.array().cast("array<string>").alias("qws"),
            )
            if with_stats:
                for j, _w in enumerate(sorted(exp)):
                    out = (
                        out.withColumn(f"__maxp_{j}", F.lit(None).cast("float"))
                        .withColumn(f"__minp_{j}", F.lit(None).cast("float"))
                        .withColumn(f"__nocc_{j}", F.lit(None).cast("long"))
                        .withColumn(f"__minst_{j}", F.lit(None).cast("long"))
                        .withColumn(f"__maxst_{j}", F.lit(None).cast("long"))
                    )
            return out
        aggs = [F.collect_set("qword").alias("qws")]
        if with_stats:
            for j, w in enumerate(sorted(exp)):
                cond = F.col("qword") == w
                aggs += [
                    F.max(F.when(cond, F.col("proximity"))).alias(f"__maxp_{j}"),
                    F.min(F.when(cond, F.col("proximity"))).alias(f"__minp_{j}"),
                    F.sum(F.when(cond, F.col("tf"))).alias(f"__nocc_{j}"),
                    F.min(F.when(cond, F.array_min("positions"))).alias(
                        f"__minst_{j}"
                    ),
                    F.max(F.when(cond, F.array_max("positions"))).alias(
                        f"__maxst_{j}"
                    ),
                ]
        base = occ if occ is not None else self._occ_base(exp)
        return base.groupBy("doc_id").agg(*aggs)

    def _occ_base(self, exp: Dict[str, Dict[str, np.float32]]) -> DataFrame:
        """The query's posting rows: term-pruned scan joined with the
        broadcast expansion table.  Shared shape between the qword-set
        aggregate and the scoring kernel — the pruned topk() materializes
        it ONCE so its phases don't rescan the store."""
        all_terms = sorted({t for d in exp.values() for t in d})
        exp_df = self._expansion_df(exp)
        scan = self.postings.filter(F.col("term").isin(all_terms))
        if "tf" not in scan.columns:
            scan = scan.withColumn("tf", F.size("positions").cast("long"))
        return scan.join(F.broadcast(exp_df), "term").select(
            "qword", "term", "proximity", "doc_id", "positions", "tf"
        )

    def _node_member_exprs(self, ast: Part, leaf=None) -> List:
        """Per-node doc-set membership as boolean Columns over the ``qws``
        column, indexed in ``oracle.iter_nodes`` order (preorder; AND-NOT
        keeps the non-NOT side, src/query.rs:133-179).  Leaf = qword present;
        AND = conjunction (J1); OR = disjunction (J2); `a AND NOT b` =
        member(a) (reference J6 identity — NOT applies at scoring only).

        ``leaf``: optional word-text -> boolean Column resolver replacing
        the default ``array_contains(qws, w)`` — the flags-aggregate shape
        (:meth:`_qword_flags`) evaluates membership over per-word int
        flags instead of a collected string array (a NULL flag behaves
        exactly like FALSE through when()/AND/OR)."""
        exprs: List = []
        if leaf is None:
            leaf = lambda text: F.array_contains(F.col("qws"), text)  # noqa: E731

        def ev(p: Part):
            idx = len(exprs)
            exprs.append(None)  # placeholder, same order as oracle.iter_nodes
            if isinstance(p, Word):
                e = leaf(p.text)
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
        # flags aggregate instead of collect_set: same membership algebra
        # through a codegen HashAggregate of ints (see _qword_flags)
        flags, leaf = self._qword_flags(exp, self._occ_base(exp))
        exprs_f = self._node_member_exprs(ast, leaf=leaf)
        return flags.filter(exprs_f[0]).select("doc_id")

    # --------------------------------------------------- rating upper bound

    def _upper_bound_expr(
        self,
        ast: Part,
        exp: Dict[str, Dict[str, np.float32]],
        distance_threshold: Optional[int] = None,
    ):
        """Per-doc upper bound (a Column over the ``with_stats`` qword-set
        row) on the rating of ANY hit the reference pipeline can emit for
        the doc — the distributed analogue of the reference's lazy top-k
        (/root/reference/src/lib.rs:16-19 pulls hits on demand; we instead
        skip whole documents that provably cannot reach the running k-th).

        Derivation = interval arithmetic over the AST, mirroring the kernel
        (core.oracle.occurrences_pipeline) bonus-by-bonus:

        - leaf: seed rating ``(proximity-1)*4`` bounded by the doc's extreme
          expansion proximities; +2.0 (W1 session merge) only possible when
          the word has >=2 occurrences in the doc;
        - AND: output hits are left-side hits (merge() never touches
          rating) -> left interval;
        - OR: hull of the present sides;
        - AND-NOT: NOT side absent in doc -> exactly +2.5 (J7 LEFT branch);
          present -> hull of {+2.5, -decrease - not_rating} where
          decrease in (0, 40] and not_rating spans the NOT subtree's
          interval (so ``hi = hi_kept - lo_not``: a *negative* fuzzy NOT
          rating raises the kept hit);
        - final fold (A5): each adjacent DIFFERENT-word pair adds
          ``0.5/(0.001*dist + 0.1)`` (<= 5.0 at dist 0), and a hit's
          occurrence set only accumulates kept-side leaf occurrences (J7
          records closest_not without merging).  With per-leaf occurrence
          counts c_i (word ids are per-leaf, so a repeated query word
          still means distinct labels), the maximum number of
          different-label adjacencies in ANY arrangement is
          ``min(N-1, 2*(N - max c_i))`` (every boundary touches a
          non-majority item, each item has <= 2 boundaries) — and that
          bound is monotone under taking subsets, so it covers every
          individual hit's occurrence set.  A single-leaf query therefore
          gets a pair cap of exactly 0.

        Round-5 position-spread refinements (from the per-qword byte-start
        extremes ``__minst/__maxst`` in the same aggregate):

        - **per-pair bonus cap**: every different-word adjacency (w_a,
          w_b) has ``dist >= gap(w_a, w_b)`` — the gap between the two
          words' position INTERVALS (0 when they overlap, and 0 by
          definition for two labels of the same repeated query text) —
          so each pair adds ``<= 0.5/(0.001*g_min + 0.1)`` with g_min the
          minimum gap over all kept-leaf word pairs present in the doc.
          Interleaved words degenerate to the old 5.0 (overlapping
          intervals); SEGREGATED words (query words in different sections
          of a long page — the realistic web shape this rescues) shrink
          the cap by orders of magnitude.
        - **per-pair SUM bound** (rescues mixed-gap queries — one tight
          pair plus far words — where the global g_min is 0): adjacencies
          of the unordered label pair (a, b) number at most
          ``min(2*c_a, 2*c_b, c_a + c_b - 1)`` in ANY arrangement (each
          occurrence has <= 2 boundary slots; a contiguous (a, b) block
          has c_a+c_b-1 internal boundaries and outside items only break
          pairs), and each such adjacency adds <= that pair's own
          interval-gap cap — so ``sum over pairs of cap_ab * m_ab`` bounds
          the total bonus.  Both bounds are sound and subset-monotone
          individually; the final pair cap is their ``least``.
        - **session-bonus refutation**: the +2.0 (W1) needs two
          occurrences of the word within ``distance_threshold``; with
          exactly two occurrences their positions ARE the recorded
          extremes, so ``nocc == 2 and (maxst - minst) > threshold``
          proves no merge happens (> 2 occurrences keep the bonus — the
          middle positions are unknown).

        The bound is computed in float64 over exact-f32 inputs (seeds are
        Sterbenz-exact), then padded for the kernel's f32 round-up drift
        (relative pad scaled by the occurrence count, absolute floor 1e-3)
        so ``ub >= actual`` holds for every accumulation length.  Validity
        argument for pruning: any doc with ``ub < theta`` can only emit
        hits strictly below ``theta``; if >= k hits rated >= theta exist,
        no such doc can contribute to the top k under (rating desc, ...)
        ordering, ties included."""
        words = sorted(exp)
        idx = {w: j for j, w in enumerate(words)}

        def leaf(w: str):
            j = idx[w]
            maxp = F.col(f"__maxp_{j}").cast("double")
            minp = F.col(f"__minp_{j}").cast("double")
            nocc = F.col(f"__nocc_{j}")
            member = F.array_contains(F.col("qws"), w)
            merge_possible = nocc >= 2
            if distance_threshold is not None:
                span = F.col(f"__maxst_{j}") - F.col(f"__minst_{j}")
                merge_possible = merge_possible & (
                    (nocc != 2) | (span <= F.lit(int(distance_threshold)))
                )
            hi = (maxp - F.lit(1.0)) * F.lit(4.0) + F.when(
                merge_possible, F.lit(2.0)
            ).otherwise(F.lit(0.0))
            lo = (minp - F.lit(1.0)) * F.lit(4.0)
            return member, lo, hi

        def ev(p: Part):
            if isinstance(p, Word):
                return leaf(p.text)
            if isinstance(p, And):
                if isinstance(p.right, Not) or isinstance(p.left, Not):
                    if isinstance(p.right, Not):
                        other, nt = p.left, p.right.part
                    else:
                        other, nt = p.right, p.left.part
                    m_o, lo_o, hi_o = ev(other)
                    m_n, lo_n, hi_n = ev(nt)
                    # membership(nt)=False guarantees zero NOT-side hits
                    # (leaf: no occurrences; compounds: output is always
                    # left-derived), so the LEFT branch is certain there;
                    # membership True means the kernel may take either
                    # branch per hit -> hull
                    hi = F.when(
                        m_n, F.greatest(hi_o + F.lit(2.5), hi_o - lo_n)
                    ).otherwise(hi_o + F.lit(2.5))
                    lo = F.when(
                        m_n,
                        F.least(lo_o + F.lit(2.5), lo_o - F.lit(40.0) - hi_n),
                    ).otherwise(lo_o + F.lit(2.5))
                    return m_o, lo, hi
                m_l, lo_l, hi_l = ev(p.left)
                m_r, lo_r, hi_r = ev(p.right)
                return m_l & m_r, lo_l, hi_l
            if isinstance(p, Or):
                m_l, lo_l, hi_l = ev(p.left)
                m_r, lo_r, hi_r = ev(p.right)
                # greatest/least skip NULLs, so gate each side on membership
                hi = F.greatest(F.when(m_l, hi_l), F.when(m_r, hi_r))
                lo = F.least(F.when(m_l, lo_l), F.when(m_r, lo_r))
                return m_l | m_r, lo, hi
            raise oracle.StrayNot()

        _member, _lo, hi = ev(ast)

        def kept_leaves(p: Part) -> List[str]:
            """Leaves whose occurrences can enter a hit's occurrence set
            (NOT subtrees excluded: J7 records closest_not, never merges)."""
            if isinstance(p, Word):
                return [p.text]
            if isinstance(p, And):
                if isinstance(p.right, Not):
                    return kept_leaves(p.left)
                if isinstance(p.left, Not):
                    return kept_leaves(p.right)
            if isinstance(p, (And, Or)):
                return kept_leaves(p.left) + kept_leaves(p.right)
            raise oracle.StrayNot()

        kept = kept_leaves(ast)
        n_total = None
        max_label = None
        for w in kept:
            c = F.coalesce(F.col(f"__nocc_{idx[w]}"), F.lit(0)).cast("double")
            n_total = c if n_total is None else (n_total + c)
            max_label = c if max_label is None else F.greatest(max_label, c)
        pairs = F.least(
            n_total - F.lit(1.0), F.lit(2.0) * (n_total - max_label)
        )
        # minimum achievable adjacency distance over kept-leaf word pairs
        # PRESENT in the doc (absent words contribute NULL, which least()
        # skips; a repeated query text overlaps itself -> gap 0), plus the
        # per-pair SUM bound over the same pair walk
        pair_gaps = []
        sum_bound = None
        for a in range(len(kept)):
            for b in range(a + 1, len(kept)):
                wa, wb = kept[a], kept[b]
                ia, ib = idx[wa], idx[wb]
                ca = F.coalesce(F.col(f"__nocc_{ia}"), F.lit(0)).cast("double")
                cb = F.coalesce(F.col(f"__nocc_{ib}"), F.lit(0)).cast("double")
                if wa == wb:
                    gap = F.lit(0.0)
                    pair_gaps.append(gap)
                else:
                    both = (ca > 0) & (cb > 0)
                    gap = F.greatest(
                        F.lit(0.0),
                        (F.col(f"__minst_{ia}") - F.col(f"__maxst_{ib}")).cast(
                            "double"
                        ),
                        (F.col(f"__minst_{ib}") - F.col(f"__maxst_{ia}")).cast(
                            "double"
                        ),
                    )
                    pair_gaps.append(F.when(both, gap))
                cap_ab = F.lit(0.5) / (
                    F.lit(0.001) * F.coalesce(gap, F.lit(0.0)) + F.lit(0.1)
                )
                m_ab = F.greatest(
                    F.least(
                        F.lit(2.0) * ca,
                        F.lit(2.0) * cb,
                        ca + cb - F.lit(1.0),
                    ),
                    F.lit(0.0),
                )
                term = cap_ab * m_ab
                sum_bound = term if sum_bound is None else (sum_bound + term)
        if not pair_gaps:
            g_min = F.lit(0.0)
        elif len(pair_gaps) == 1:
            g_min = pair_gaps[0]
        else:
            g_min = F.least(*pair_gaps)
        per_pair = F.lit(0.5) / (
            F.lit(0.001) * F.coalesce(g_min, F.lit(0.0)) + F.lit(0.1)
        )
        pair_cap = per_pair * F.greatest(pairs, F.lit(0.0))
        if sum_bound is not None:
            pair_cap = F.least(pair_cap, sum_bound)
        ub = hi + pair_cap
        # f32 round-up drift pad: per-op relative error is 2^-24 and the
        # kernel's op count scales with the doc's occurrence total
        return ub + F.lit(1e-3) + (
            F.lit(1e-5) * (F.lit(1.0) + n_total)
        ) * F.abs(ub)

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

    def _qword_flags(self, exp: Dict[str, Dict[str, np.float32]], occ: DataFrame):
        """(flags_df, leaf_fn): per-doc presence flags for each query word
        — ``max(when(qword = w, 1))`` per word in one doc-keyed aggregate.
        Same membership information as :meth:`_qword_sets`'s ``qws`` array
        but through a whole-stage-codegen HashAggregate of ints instead of
        an ObjectHashAggregate collecting string arrays (guide §2.3:
        narrower types through the exchange); an absent word's NULL flag
        evaluates exactly like array_contains' FALSE through when()/AND/OR.
        ``leaf_fn`` resolves a word text to its flag column for
        :meth:`_node_member_exprs`."""
        words = sorted(exp)
        idx = {w: j for j, w in enumerate(words)}
        flags = occ.groupBy("doc_id").agg(
            *[
                F.max(F.when(F.col("qword") == w, F.lit(1))).alias(f"__f{j}")
                for j, w in enumerate(words)
            ]
        )
        return flags, lambda text: F.col(f"__f{idx[text]}") == 1

    def _node_max_pairs_from_occ(
        self, occ: DataFrame, ast: Part, exp: Dict[str, Dict[str, np.float32]]
    ) -> DataFrame:
        """The sentinel one-row table derived from the raw occurrence
        stream via the flags aggregate — replaces the collect_set-based
        ``_qword_sets`` subtree when the caller has no sets at hand."""
        flags, leaf = self._qword_flags(exp, occ)
        exprs_f = self._node_member_exprs(ast, leaf=leaf)
        return flags.agg(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("nid"),
                        F.coalesce(
                            F.max(F.when(e, F.col("doc_id"))), F.lit(-1)
                        ).cast("long").alias("mx"),
                    )
                    for i, e in enumerate(exprs_f)
                ]
            ).alias("node_max_pairs")
        )

    def hits(
        self,
        ast: Part,
        distance_threshold: int,
        exp: Optional[Dict[str, Dict[str, np.float32]]] = None,
        maxes: Optional[List[int]] = None,
        candidates: Optional[DataFrame] = None,
        sets: Optional[DataFrame] = None,
        candidates_are_root: bool = False,
        occ: Optional[DataFrame] = None,
        partition_topk: Optional[int] = None,
    ) -> DataFrame:
        """Rank-identical occurrence scoring, distributed by document.

        Single Spark job (plus the expansion scan in fuzzy mode): the posting
        rows for all expanded terms are shuffled once by doc_id; each doc's
        qword set (root-membership input) is computed by a window over that
        SAME exchange (the kernel needs doc-clustered, doc-sorted rows
        anyway), so the root filter costs no extra scan, aggregate or join
        — the pre-round-7 plan scanned the postings a second time for the
        qword-set aggregate and sort-merge-joined the positions-carrying
        stream against it (guide §2.4).  The broadcast one-row node-max
        table (sentinel inputs) still rides in as its own narrow subtree
        when ``maxes`` isn't supplied.

        ``candidates``: optional (doc_id) DataFrame (or plain id list)
        restricting which docs enter the kernel — per-doc scoring is exactly
        separable given the sentinel maxes, which are ALWAYS computed from
        the full qword-set aggregate, so a candidate subset's ratings are
        bit-identical to the same docs' ratings in a full run (the top-k
        prune in :meth:`topk` relies on this).

        ``partition_topk``: when set (the :meth:`topk` paths), each kernel
        partition emits only its top ``partition_topk`` hits under the
        (rating desc, doc_id asc, start asc) total order — exactly the
        rows a global ``orderBy().limit(k)`` can keep, so the result is
        unchanged while the per-hit ``matched`` assembly and Arrow
        transfer happen for <= 32*k rows instead of every hit."""
        if exp is None:
            exp = self.expansions(ast)
        occ = (occ if occ is not None else self._occ_base(exp)).select(
            "qword", "term", "proximity", "doc_id", "positions"
        )
        # sentinel maxes must describe the PRE-candidate universe (the
        # per-doc scoring separability contract)
        occ_for_sentinels = occ
        if candidates is not None:
            if isinstance(candidates, DataFrame):
                # no broadcast hint: Catalyst/AQE picks broadcast when the
                # candidate set is small, shuffle-semi when it is not
                occ = occ.join(candidates.select("doc_id"), "doc_id", "left_semi")
            else:  # small collected id list: a pushed-down In predicate
                occ = occ.filter(F.col("doc_id").isin([int(d) for d in candidates]))
        exprs = self._node_member_exprs(ast)  # also validates stray NOTs
        skip_root_join = (
            candidates is not None and candidates_are_root and maxes is not None
        )
        if not skip_root_join:
            # prune docs that cannot produce hits (root stream doc set):
            # row-local root-membership filter over the window-computed
            # per-doc qword set, inside the kernel's own exchange.  The
            # explicit repartition keeps that exchange at the configured
            # width: a bare Window exchange is AQE-coalescible, and this
            # one's shuffle is small in BYTES while the Python kernel
            # behind it scales with ROWS — coalescing it to 1-2
            # partitions serialized the whole kernel (measured 2
            # partitions at sf1.0); the window reuses the repartition's
            # hash partitioning, so there is still exactly one exchange
            from pyspark.sql import Window

            n_part = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
            w = Window.partitionBy("doc_id")
            occ = (
                occ.repartition(n_part, F.col("doc_id"))
                .withColumn("qws", F.collect_set("qword").over(w))
                .filter(exprs[0])
                .select("qword", "term", "proximity", "doc_id", "positions")
            )

        n_nodes = len(list(oracle.iter_nodes(ast)))
        if maxes is None:
            # callers with a materialized qword-set aggregate (the
            # restricted paths) reuse it; otherwise derive the sentinels
            # from the occurrence stream via the cheaper flags aggregate
            nm = (
                self._node_max_pairs_df(sets, exprs)
                if sets is not None
                else self._node_max_pairs_from_occ(occ_for_sentinels, ast, exp)
            )
            occ = occ.crossJoin(F.broadcast(nm))
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
        pp_k = int(partition_topk) if partition_topk is not None else None

        def score_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            """Docs are contiguous within a partition (hash-partitioned by
            doc_id + sorted — by the root-filter window or the explicit
            repartition), so we stream Arrow batches, group rows per doc
            in plain dicts (no per-group pandas overhead — the kernel itself
            is ~0.05 ms/doc) and run the reference kernel per doc."""
            import heapq
            import itertools

            part = ast_codec.loads(ast_json)
            f1 = np.float32(1.0)
            f4 = np.float32(4.0)
            maxes_l: List[int] = None  # read from the broadcast column below
            # partition-local top-k state: a min-heap over the COMPONENT-WISE
            # negation (rating, -doc, -start) of the ordering key
            # (-rating, doc, start) — each component's order flips, so
            # heap[0] is the worst kept hit under (rating desc, doc asc,
            # start asc); the tie counter keeps Hit objects out of tuple
            # comparison
            heap: list = []
            tie = itertools.count()

            def empty_out():
                return {
                    "doc_id": [],
                    "start": [],
                    "rating": [],
                    "word_id": [],
                    "merged": [],
                    "matched": [],
                }

            def out_append(out: dict, h) -> None:
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
                if pp_k is not None:
                    for h in hits:
                        n = (
                            float(np.float32(h.rating)),
                            -int(h.doc_id),
                            -int(h.start),
                        )
                        if len(heap) < pp_k:
                            heapq.heappush(heap, (n, next(tie), h))
                        elif n > heap[0][0]:
                            heapq.heapreplace(heap, (n, next(tie), h))
                    return
                for h in hits:
                    out_append(out, h)

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
                if pp_k is None:
                    yield to_pdf(out)
            out = empty_out()
            if cur_doc is not None:
                emit(int(cur_doc), cur_rows, out)
            if pp_k is not None:
                for _n, _t, h in heap:
                    out_append(out, h)
            yield to_pdf(out)

        if skip_root_join:
            # candidate-filtered rows come straight off the (possibly
            # cached) occ scan: cluster+sort them for the kernel (explicit
            # width — see the root-filter window note above)
            n_part = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
            occ = occ.repartition(n_part, F.col("doc_id")).sortWithinPartitions(
                "doc_id"
            )
        # else: the root-filter window already hash-partitioned AND sorted
        # the stream by doc_id — a repartition here would be a second
        # full shuffle of the positions arrays for nothing
        return occ.mapInPandas(score_partition, schema=HIT_SCHEMA)

    def hits_batch(
        self,
        queries: Dict[object, "Part | str"],
        distance_threshold: int,
    ) -> DataFrame:
        """Rank-identical scored hits for a whole query SET, batched:
        ``(query_id, doc_id, start, rating, word_id, merged, matched)`` —
        bit-identical per query to :meth:`hits`.

        The query-log / evaluation workload: per-query ``hits()`` jobs pay
        the posting scan, the qword-set aggregate, and a kernel shuffle per
        query.  Batched, the WHOLE set costs:

        - driver-side expansions per query (exact algo: zero jobs; fuzzy:
          one small dictionary scan each — the posting-side work below is
          what dominates and is fully amortized);
        - ONE sentinel job: a single conditional-max aggregate over the
          shared (query_id, doc_id, qws) sets computes every query's
          per-node stream maxes;
        - ONE scoring job: the posting scan is term-pruned to the union of
          all queries' expanded terms, fanned out via a broadcast
          (query_id, qword, term, proximity) join, root-filtered per query,
          shuffled once by (query_id, doc_id) and scored by the same
          reference kernel (AST + sentinel maxes resolved per query from a
          tiny closure map).

        Per-doc scoring is exactly separable given the sentinel maxes
        (the :meth:`hits` candidate contract), so tagging rows with
        query_id and grouping on (query_id, doc_id) changes nothing about
        each query's arithmetic.  The per-query root predicate is one
        OR-chain across queries — batch a few hundred queries per call
        (Catalyst's expression-depth limit), chunking above that.
        """
        import functools

        asts = {
            qid: (parse(q) if isinstance(q, str) else q)
            for qid, q in queries.items()
        }
        # ONE dictionary scan expands the union of all queries' words
        # (fuzzy mode used to pay one scan per query); slice per query
        words_by_q = {
            qid: list(dict.fromkeys(words_in(ast))) for qid, ast in asts.items()
        }
        union_exp = self.expansions_for_words(
            [w for ws in words_by_q.values() for w in ws]
        )
        exps = {
            qid: {w: union_exp[w] for w in ws}
            for qid, ws in words_by_q.items()
        }
        rows = [
            (qid, w, t, float(r))
            for qid, exp in exps.items()
            for w, d in exp.items()
            for t, r in d.items()
        ]
        id_is_str = bool(rows) and isinstance(rows[0][0], str)
        id_type = "string" if id_is_str else "long"
        exp_df = self.spark.createDataFrame(
            rows,
            f"query_id {id_type}, qword string, term string, proximity float",
        )
        all_terms = sorted(
            {t for exp in exps.values() for d in exp.values() for t in d}
        )
        scan = self.postings.filter(F.col("term").isin(all_terms))
        occ = scan.join(F.broadcast(exp_df), "term").select(
            "query_id", "qword", "term", "proximity", "doc_id", "positions"
        )
        # one aggregate computes every query's per-doc qword sets
        sets = occ.groupBy("query_id", "doc_id").agg(
            F.collect_set("qword").alias("qws")
        )
        exprs_by_q = {
            qid: self._node_member_exprs(ast) for qid, ast in asts.items()
        }  # also validates stray NOTs per query

        # ONE sentinel job for the whole batch: per-(query, node)
        # conditional maxes in a single aggregate row (not persisted — qws
        # is array-typed, and the scoring plan recomputes the aggregate
        # inside its own job exactly like hits() does)
        agg_cols, order = [], []
        for qid, exprs in exprs_by_q.items():
            for i, e in enumerate(exprs):
                cond = (F.col("query_id") == F.lit(qid)) & e
                agg_cols.append(
                    F.max(F.when(cond, F.col("doc_id"))).alias(f"m_{len(order)}")
                )
                order.append((qid, i))
        maxes = {qid: [-1] * len(ex) for qid, ex in exprs_by_q.items()}
        if order:
            row = sets.agg(*agg_cols).collect()[0]
            for (qid, i), v in zip(order, row):
                maxes[qid][i] = int(v) if v is not None else -1

        root_pred = functools.reduce(
            lambda a, b: a | b,
            [
                (F.col("query_id") == F.lit(qid)) & exprs_by_q[qid][0]
                for qid in asts
            ],
        )
        roots = sets.filter(root_pred).select("query_id", "doc_id")
        occ = occ.join(roots, ["query_id", "doc_id"], "left_semi").select(
            "query_id", "qword", "term", "proximity", "doc_id", "positions"
        )

        meta = {
            qid: (ast_codec.dumps(ast), maxes[qid]) for qid, ast in asts.items()
        }
        dist = int(distance_threshold)
        out_schema = StructType(
            [
                StructField(
                    "query_id",
                    StringType() if id_is_str else LongType(),
                    False,
                )
            ]
            + list(HIT_SCHEMA.fields)
        )

        def score_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            parts = {qid: ast_codec.loads(aj) for qid, (aj, _m) in meta.items()}
            f1 = np.float32(1.0)
            f4 = np.float32(4.0)

            def empty_out():
                return {
                    "query_id": [],
                    "doc_id": [],
                    "start": [],
                    "rating": [],
                    "word_id": [],
                    "merged": [],
                    "matched": [],
                }

            def emit(qid, doc: int, rows: list, out: dict) -> None:
                rows.sort(key=lambda r: (r[0], r[1]))  # (qword, term)
                streams: Dict[str, List] = {}
                for qw, _term, prox, positions in rows:
                    lst = streams.setdefault(qw, [])
                    rating = np.float32((np.float32(prox) - f1) * f4)
                    for pos in positions:
                        lst.append((doc, int(pos), rating))
                hits = oracle.occurrences_pipeline(
                    parts[qid],
                    lambda w: streams.get(w, []),
                    dist,
                    sentinel_max=meta[qid][1],
                    current_doc=doc,
                )
                for h in hits:
                    out["query_id"].append(qid)
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
                        "query_id": pd.Series(
                            out["query_id"],
                            dtype="object" if id_is_str else "int64",
                        ),
                        "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                        "start": pd.Series(out["start"], dtype="int64"),
                        "rating": pd.Series(out["rating"], dtype="float32"),
                        "word_id": pd.Series(out["word_id"], dtype="int32"),
                        "merged": pd.Series(out["merged"], dtype="bool"),
                        "matched": pd.Series(out["matched"], dtype="object"),
                    }
                )

            cur_key = None
            cur_rows: list = []
            for pdf in batches:
                out = empty_out()
                for qid, doc, qw, term, prox, positions in zip(
                    pdf["query_id"],
                    pdf["doc_id"].values,
                    pdf["qword"],
                    pdf["term"],
                    pdf["proximity"].values,
                    pdf["positions"],
                ):
                    key = (qid, doc)
                    if key != cur_key:
                        if cur_key is not None:
                            emit(cur_key[0], int(cur_key[1]), cur_rows, out)
                        cur_key, cur_rows = key, []
                    cur_rows.append((qw, term, prox, positions))
                yield to_pdf(out)
            out = empty_out()
            if cur_key is not None:
                emit(cur_key[0], int(cur_key[1]), cur_rows, out)
            yield to_pdf(out)

        n_part = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        occ_sorted = occ.repartition(
            n_part, F.col("query_id"), F.col("doc_id")
        ).sortWithinPartitions("query_id", "doc_id")
        return occ_sorted.mapInPandas(score_partition, schema=out_schema)

    def topk_batch(
        self,
        queries: Dict[object, "Part | str"],
        distance_threshold: int,
        k: int,
    ) -> DataFrame:
        """Per-query top-k scored hits over the batch (exhaustive batched
        path — the adaptive per-engine prune is a per-query optimization;
        an evaluation sweep wants the whole set in one pipeline).  Ordering
        matches :meth:`topk`: (rating desc, doc_id, start), rank in
        ``rnk``."""
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(
            F.desc("rating"), F.asc("doc_id"), F.asc("start")
        )
        return (
            self.hits_batch(queries, distance_threshold)
            .withColumn("rnk", F.row_number().over(w).cast("long"))
            .filter(F.col("rnk") <= int(k))
        )

    def topk(
        self,
        query: str,
        distance_threshold: int,
        k: int,
        prune: bool = True,
        stats_out: Optional[dict] = None,
        restrict: Optional[DataFrame] = None,
    ) -> DataFrame:
        """Parse -> score -> top-k by rating desc (O2: TakeOrderedAndProject).

        With ``prune`` (default), the reference's lazy-evaluation property
        (src/lib.rs:16-19 — a top-1 query costs one ``next()``, not a full
        scoring pass) gets its distributed analogue: docs whose rating
        UPPER BOUND (:meth:`_upper_bound_expr`, computed row-locally on the
        shared qword-set aggregate) cannot reach a lower bound of the k-th
        best rating are never shuffled into the scoring kernel.  Phases:

        1. one aggregate job -> per-node sentinel maxes + root-set size
           (skip pruning when the root set is barely bigger than k);
        2. score the k root docs with the HIGHEST upper bounds -> their
           k-th actual rating ``theta`` is a valid lower bound of the
           global k-th;
        3. score only docs with ``ub >= theta``; every excluded doc's hits
           are provably ``< theta`` while >= k hits ``>= theta`` exist, so
           the final (rating desc, doc_id, start) top-k — ties included —
           is bit-identical to the unpruned result (pytest-pinned against
           ``prune=False`` on the full rank-identity suite).

        The prune is ADAPTIVE per engine: a corpus can defeat any row-local
        bound (a tiny dense vocabulary gives every root doc dozens of
        query-word occurrences, so the adjacency-pair cap keeps every
        bound above any achievable theta).  When the established theta
        falls at or below the root set's MEDIAN upper bound (i.e. the
        candidate set would keep more than half the docs), this call falls
        back to the one-job full path and marks the engine futile — later
        ``topk()`` calls skip the prune phases entirely, so a query stream
        over such a corpus pays the probe cost exactly once.

        ``stats_out``: optional dict, filled with ``root_docs`` /
        ``kernel_docs`` / ``theta`` / ``pruned`` (the bench artifact
        showing the kernel-input reduction)."""
        ast = parse(query)
        order = [F.desc("rating"), F.asc("doc_id"), F.asc("start")]
        exp = self.expansions(ast)
        if restrict is not None:
            # corpus restriction (site: filter, ACL subset, time slice):
            # semantics are "run the engine over the sub-corpus" — the
            # occurrence stream is cut BEFORE anything is computed, so the
            # sentinel maxes / root sets / prune bounds all describe the
            # restricted universe (identical to indexing only those docs).
            # The futility memo stays engine-global: it describes the
            # corpus shape, which a doc-subset rarely changes.
            restrict = restrict.select("doc_id")
        if not prune or k <= 0 or self._prune_futile:
            if stats_out is not None:
                stats_out["pruned"] = False
                stats_out["futile"] = self._prune_futile
            if restrict is None:
                return (
                    self.hits(ast, distance_threshold, exp, partition_topk=k)
                    .orderBy(*order)
                    .limit(k)
                )
            occ_r = self._occ_base(exp).join(restrict, "doc_id", "left_semi")
            sets_r = self._qword_sets(exp, occ=occ_r)
            return (
                self.hits(
                    ast, distance_threshold, exp, occ=occ_r, sets=sets_r,
                    partition_topk=k,
                )
                .orderBy(*order)
                .limit(k)
            )

        from pyspark import StorageLevel

        exprs = self._node_member_exprs(ast)
        # the query's occurrence rows feed every phase (the aggregate
        # behind sentinel maxes / seed selection / candidate cut, and both
        # scoring kernels) — persist them so the prune pays ONE store scan,
        # not one per phase (measured 2x at the 1M published-store stress);
        # the pruned path ends with an eager k-row collect (top-k is
        # terminal), so the cache can be dropped before returning
        # An extremes-only persist variant (cache [min,max] positions for
        # the phase-1 aggregate, re-scan the store for seed + kernel) was
        # measured round 5 at 1M on BOTH 60-token and 600-token docs:
        # parity-to-slightly-worse (BENCH.md) — the array cache is not the
        # pruned path's bottleneck, so the simpler one-persist shape stays
        occ = self._occ_base(exp)
        if restrict is not None:
            occ = occ.join(restrict, "doc_id", "left_semi")
        occ = occ.persist(StorageLevel.MEMORY_AND_DISK)
        kernel_occ = occ
        sets = self._qword_sets(exp, with_stats=True, occ=occ)
        ub = self._upper_bound_expr(ast, exp, distance_threshold)
        # evaluate the node-membership booleans and the upper bound ONCE
        # into a scalar-only per-doc table and persist THAT: the sentinel
        # aggregate, seed selection and candidate cut each used to re-run
        # the whole with_stats qword-set aggregate + bound expression over
        # the cached occ rows (three evaluations per query — guide §1.2
        # step 1: don't recompute what a phase already computed).  Scalar
        # columns only, so the round-2 array-cache penalty doesn't apply.
        proj = sets.select(
            "doc_id",
            *[e.alias(f"__m{i}") for i, e in enumerate(exprs)],
            ub.alias("__ub"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        root = F.col("__m0")
        try:
            agg_row = proj.agg(
                *[
                    F.max(F.when(F.col(f"__m{i}"), F.col("doc_id"))).alias(f"m{i}")
                    for i in range(len(exprs))
                ],
                F.sum(F.when(root, 1).otherwise(0)).alias("n_root"),
                F.percentile_approx(F.when(root, F.col("__ub")), F.lit(0.5)).alias(
                    "ub_p50"
                ),
            ).collect()[0]
            maxes = [
                agg_row[i] if agg_row[i] is not None else -1
                for i in range(len(exprs))
            ]
            n_root = int(agg_row["n_root"] or 0)
            ub_p50 = agg_row["ub_p50"]
            if stats_out is not None:
                stats_out["root_docs"] = n_root
                stats_out["kernel_docs"] = n_root
                stats_out["theta"] = None
                stats_out["pruned"] = False

            def full():
                # lazy: the unpersist below just means the caller's action
                # recomputes the scan once — the pre-prune behavior.  Under
                # a restriction the restricted occ/sets must feed the full
                # path too (maxes describe the restricted universe).
                return (
                    self.hits(
                        ast, distance_threshold, exp, maxes=maxes,
                        occ=kernel_occ if restrict is not None else None,
                        partition_topk=k,
                    )
                    .orderBy(*order)
                    .limit(k)
                )

            if n_root <= 4 * k:  # pruning cannot pay for its extra phase
                return full()

            sets_ub = proj.filter(root).select("doc_id", "__ub")
            seed_ids = [
                int(r.doc_id)
                for r in sets_ub.orderBy(F.desc("__ub"), F.asc("doc_id"))
                .limit(k)
                .collect()
            ]
            seed_ratings = sorted(
                (
                    np.float32(r.rating)
                    for r in self.hits(
                        ast,
                        distance_threshold,
                        exp,
                        maxes=maxes,
                        candidates=seed_ids,
                        candidates_are_root=True,
                        occ=kernel_occ,
                        # partition top-k preserves the global k best hits,
                        # and the theta derivation only reads seed_ratings
                        # [k-1] (the k-th best) plus the >= k existence
                        # check — both invariant under it
                        partition_topk=k,
                    )
                    .select("rating")
                    .collect()
                ),
                reverse=True,
            )
            if len(seed_ratings) < k:
                return full()  # too few hits to establish a bound
            theta = float(seed_ratings[k - 1])
            if ub_p50 is not None and theta <= float(ub_p50):
                # >= half the root docs would survive: the bound cannot
                # discriminate on this corpus — remember and stop probing.
                # Only an UNRESTRICTED probe may set the engine-global
                # memo: a tiny homogeneous site:/ACL subset says nothing
                # about the corpus shape, and memoizing it would disable
                # pruning for every later unrestricted query (ADVICE r6).
                if restrict is None:
                    self._prune_futile = True
                return full()
            cand = sets_ub.filter(F.col("__ub") >= theta)
            rows = (
                self.hits(
                    ast,
                    distance_threshold,
                    exp,
                    maxes=maxes,
                    candidates=cand,
                    candidates_are_root=True,
                    occ=kernel_occ,
                    partition_topk=k,
                )
                .orderBy(*order)
                .limit(k)
                .collect()
            )
            if stats_out is not None:
                stats_out["kernel_docs"] = cand.count()  # cached: cheap
                stats_out["theta"] = theta
                stats_out["pruned"] = True
            return self.spark.createDataFrame(rows, HIT_SCHEMA)
        finally:
            occ.unpersist()
            proj.unpersist()
