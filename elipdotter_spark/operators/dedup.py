"""Deduplication operators for large-scale training-data pipelines.

All built-in-expression plans (no Python in the hot path):
- exact:    hash-groupBy on content digest
- MinHash:  distinct tokens -> k seeded polynomial hashes -> min per seed ->
            banded LSH buckets -> bucket-join candidate pairs
- SimHash:  bitwise majority over token hashes
- n-gram Jaccard: exact verify on LSH candidates

The polynomial hash is deliberately engine-portable (identical in DuckDB SQL,
see entry.oracle_sql) so every operator has a cross-engine oracle.

Scale notes: candidate generation is O(n_tokens * k) rows through hash
aggregates with map-side combine; the only join is the bucket self-join whose
per-bucket fan-out is bounded by near-dup cluster sizes (salt hot buckets if a
degenerate corpus produces mega-clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HASH_P = 2147483647  # 2^31 - 1; keeps (acc*131 + cp) within int64

N_MINHASH = 16
N_BANDS = 4
ROWS_PER_BAND = N_MINHASH // N_BANDS


def _persistent_rdd_ids(spark) -> set:
    """Ids of every currently-persisted RDD (includes localCheckpoint
    blocks, which DataFrame.unpersist cannot reach)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def _unpersist_rdd_ids(spark, ids) -> None:
    """Release persisted RDDs by id — the only handle PySpark offers for a
    ``localCheckpoint``'s storage (the checkpoint RDD is internal to the
    returned Dataset; without this it stays in executor block storage
    until JVM GC collects the Dataset, i.e. nondeterministically)."""
    if not ids:
        return
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    it = jmap.entrySet().iterator()
    while it.hasNext():
        e = it.next()
        if int(e.getKey()) in ids:
            e.getValue().unpersist(False)


def poly_hash(col, seed):
    """fold (acc*131 + codepoint) % (2^31-1), acc0 = seed — JVM-side."""
    init = seed.cast("long") if hasattr(seed, "cast") else F.lit(seed).cast("long")
    return F.aggregate(
        F.transform(F.split(col, ""), lambda c: F.ascii(c)),
        init,
        lambda acc, cp: (acc * 131 + cp) % HASH_P,
    )


def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(h, cnt) for content-identical groups with >1 member."""
    return (
        docs.select(F.md5(F.col(text_col).cast("binary")).alias("h"))
        .groupBy("h")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 1)
    )


def distinct_tokens(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct (doc_id, term) via the JVM-only tokenizer — dedup needs token
    identity, not reference byte offsets, so the whole-stage-codegen path
    (index_build.tokens_jvm) replaces the Python tokenizer UDF here."""
    from . import index_build

    return index_build.tokens_jvm(docs, id_col, text_col).distinct()


def _bands_from_token_table(
    toks: DataFrame, n_minhash: int, rows_per_band: int
) -> DataFrame:
    """Shared MinHash-banding plan over a (doc_id, term) table (duplicate
    (doc_id, term) rows are fine — the aggregate dedups).

    Plan shape (round 7): ONE doc-keyed ``collect_set(term)`` aggregate
    (map-side partial dedup; the shuffle carries term STRINGS, ~6-10
    bytes each), then everything else — per-term seeded hashes, the
    elementwise-min signature fold, band hashes — is row-local on the
    aggregated row.  The round-2 shape hashed per token row BEFORE the
    aggregate, so the shuffle carried 16-long hash arrays (128 bytes per
    token) through collect_list, and callers needed a separate
    ``.distinct()`` (a second full shuffle) to dedup first; both costs
    are gone (guide §2.3: shuffle fewer bytes / §2.4: remove shuffles).

    The k seeded hashes are derived from ONE character fold by polynomial
    linearity: folding ``acc*131 + cp (mod P)`` from init ``s`` over a
    length-L term yields exactly ``s*131^L + H0 (mod P)`` where ``H0`` is
    the init-0 fold — so the per-term work is two folds (H0 and 131^L)
    plus k multiply-adds, not k char-folds (HOF lambdas are interpreted
    per element — CodegenFallback — so collapsing the per-seed work from
    O(term_len) to O(1) is the difference between k x len and k
    interpreted steps per token).  All intermediates stay < 2^39: exact
    in long, bit-identical to the direct per-seed fold (the gates pin
    it).  Each chained select's multi-referenced alias survives
    CollapseProject, so ``_hp``/``sig`` compute once per row."""
    sets = toks.groupBy("doc_id").agg(F.collect_set("term").alias("_terms"))

    def _term_hp(t):
        cps = F.transform(F.split(t, ""), lambda c: F.ascii(c))
        return F.struct(
            F.aggregate(
                cps,
                F.lit(0).cast("long"),
                lambda acc, cp: (acc * 131 + cp) % HASH_P,
            ).alias("h0"),
            F.aggregate(
                cps,
                F.lit(1).cast("long"),
                lambda acc, _cp: (acc * 131) % HASH_P,
            ).alias("pw"),
        )

    top = F.lit(HASH_P).cast("long")
    init = F.array_repeat(top, n_minhash)
    seeds = F.sequence(F.lit(0), F.lit(n_minhash - 1))
    sigs = (
        sets.select(
            "doc_id",
            F.transform(F.col("_terms"), _term_hp).alias("_hp"),
        )
        .select(
            "doc_id",
            F.transform(
                F.col("_hp"),
                lambda hp: F.transform(
                    seeds,
                    lambda seed: ((seed + 1).cast("long") * hp["pw"] + hp["h0"])
                    % HASH_P,
                ),
            ).alias("_hs"),
        )
        .select(
            "doc_id",
            F.aggregate(
                F.col("_hs"),
                init,
                lambda acc, x: F.zip_with(acc, x, lambda a, b: F.least(a, b)),
            ).alias("sig"),
        )
    )
    n_bands = n_minhash // rows_per_band
    band_hash = lambda b: F.aggregate(  # noqa: E731
        F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
        F.lit(0).cast("long"),
        lambda acc, mh: (acc * 131 + mh) % HASH_P,
    )
    banded = sigs.select(
        "doc_id",
        F.posexplode(F.array(*[band_hash(b) for b in range(n_bands)])).alias(
            "band", "band_hash"
        ),
    )
    return banded.select("doc_id", "band", "band_hash")


def minhash_bands(
    docs: DataFrame,
    n_minhash: int = N_MINHASH,
    rows_per_band: int = ROWS_PER_BAND,
) -> DataFrame:
    """(doc_id, band, band_hash) LSH signature bands.

    Feeds the RAW token stream (no ``.distinct()``): the banding
    aggregate's ``collect_set`` dedups map-side, so the pre-shuffle
    distinct was a second full shuffle buying nothing (guide §2.4)."""
    from . import index_build

    return _bands_from_token_table(
        index_build.tokens_jvm(docs), n_minhash, rows_per_band
    )


def candidate_pairs(bands: DataFrame, max_ring: int = None) -> DataFrame:
    """(a, b) doc pairs sharing at least one LSH band bucket.

    ``max_ring=None`` emits every in-bucket pair (exact LSH candidates — the
    cross-engine-verifiable default).  With ``max_ring=r`` the per-bucket
    fan-out is bounded: docs are ranked inside their bucket and each doc
    pairs only with the next ``r`` ranks (chain windows).  A degenerate
    mega-cluster of n near-identical docs then produces O(n*r) candidate
    pairs instead of O(n^2) — duplicate *groups* survive because chain edges
    keep every cluster connected — and the bucket's cost becomes one sort
    instead of a quadratic self-join melting one reducer.

    Ring plan shape (round 7): each doc's ring partners are exactly the
    next ``r`` docs in its bucket's doc_id order, i.e. ``lead(doc_id, i)``
    for i in 1..r over ONE (band, band_hash) window — no self-join at all.
    The previous self-join was equi-keyed only on the bucket, so the
    sort-merge join buffered each m-row bucket group and evaluated the
    ring predicate over all m^2 row combinations — quadratic in bucket
    size (measured 114 s at sf1.0, m ~ 5*10^4 per bucket on the
    degenerate sf vocabulary, vs 4 s at sf0.1).  The window form is
    O(m log m) sort + O(m*r) emitted rows; the pair SET is identical
    (pinned by test_ann_dedup.py's exact-vs-bounded assertions)."""
    if max_ring is None:
        return (
            bands.alias("x")
            .join(bands.alias("y"), ["band", "band_hash"])
            .filter(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
            .distinct()
        )
    from pyspark.sql import Window

    w = Window.partitionBy("band", "band_hash").orderBy("doc_id")
    partners = F.array_compact(
        F.array(*[F.lead("doc_id", i).over(w) for i in range(1, max_ring + 1)])
    )
    # window expr in its own projection: a generator (explode) cannot
    # contain a window function in the same operator
    ringed = bands.select(F.col("doc_id").alias("a"), partners.alias("_ring"))
    return (
        ringed.select("a", F.explode("_ring").alias("b"))
        .distinct()
    )


def jaccard_verify(pairs: DataFrame, toks: DataFrame, digits: int = 6) -> DataFrame:
    """Exact token-set Jaccard for candidate pairs: (a, b, jaccard)."""
    sizes = toks.groupBy("doc_id").agg(F.count("*").alias("n"))
    common = (
        pairs.join(toks.alias("ta"), F.col("a") == F.col("ta.doc_id"))
        .join(
            toks.alias("tb"),
            (F.col("b") == F.col("tb.doc_id"))
            & (F.col("ta.term") == F.col("tb.term")),
        )
        .groupBy("a", "b")
        .agg(F.count("*").alias("c"))
    )
    return (
        common.join(sizes.alias("sa"), F.col("a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("b") == F.col("sb.doc_id"))
        .select(
            "a",
            "b",
            F.round(
                F.col("c") / (F.col("sa.n") + F.col("sb.n") - F.col("c")), digits
            ).alias("jaccard"),
        )
    )


def cross_source_matrix(
    docs: DataFrame, threshold: float = 0.8, source_col: str = "source"
) -> DataFrame:
    """Which sources duplicate each other: strong near-dup pairs (banded
    MinHash candidates, exact-Jaccard-verified at ``threshold``) labeled
    with their documents' sources and aggregated to an unordered
    (source_a <= source_b, n_pairs) matrix — the crawl-pipeline diagnostic
    for mirror/syndication clusters ACROSS sources vs churn within one.

    Scale shape: pairs come from the banded candidate join (never
    all-pairs); the two source-label joins are doc_id-keyed against a
    two-column projection; the final aggregate's key space is #sources^2."""
    pairs = jaccard_verify(
        candidate_pairs(minhash_bands(docs)), distinct_tokens(docs)
    ).filter(F.col("jaccard") >= threshold)
    src = docs.select("doc_id", source_col)
    lab = (
        pairs.join(
            src.withColumnRenamed("doc_id", "a").withColumnRenamed(source_col, "sa"),
            "a",
        ).join(
            src.withColumnRenamed("doc_id", "b").withColumnRenamed(source_col, "sb"),
            "b",
        )
    )
    return (
        lab.select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_pairs"))
    )


def near_dup_pairs(
    docs: DataFrame, threshold: float = 0.8, max_ring: int = None
) -> DataFrame:
    """End-to-end near-dup detection: MinHash LSH candidates -> exact Jaccard
    verify -> threshold filter.  ``max_ring`` bounds hot-bucket fan-out (see
    candidate_pairs)."""
    bands = minhash_bands(docs)
    pairs = candidate_pairs(bands, max_ring=max_ring)
    toks = distinct_tokens(docs)
    return jaccard_verify(pairs, toks).filter(F.col("jaccard") >= threshold)


def simhash(docs: DataFrame, bits: int = 32) -> DataFrame:
    """(doc_id, simhash) — bitwise majority of distinct-token hashes.

    Plan shape (round 2): ONE doc-keyed aggregate collects the per-token
    hashes (bounded by document length), then the per-bit +/-1 sums and the
    majority packing are row-local array folds — the round-1 plan exploded
    ``bits`` rows per token through two shuffles."""
    toks = distinct_tokens(docs)
    h = toks.withColumn("h", poly_hash(F.col("term"), 1))
    per_doc = h.groupBy("doc_id").agg(F.collect_list("h").alias("hs"))
    bit_sum = lambda i: F.aggregate(  # noqa: E731
        F.col("hs"),
        F.lit(0).cast("long"),
        lambda acc, hv: acc
        + F.shiftright(hv, i).bitwiseAND(F.lit(1)) * 2
        - 1,
    )
    packed = None
    for i in range(bits):
        term = F.when(bit_sum(i) > 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        packed = term if packed is None else packed + term
    return per_doc.select("doc_id", packed.alias("simhash"))


def shingles(docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, term) distinct character n-gram shingles — JVM-only
    (transform over an index sequence + substring), the classic input for
    near-dup MinHash when word tokens are too coarse (boilerplate pages,
    agglutinative languages)."""
    # guard: Spark's sequence(1, stop) DESCENDS when stop < 1 (unlike
    # DuckDB's empty range), so texts shorter than n must yield no shingles
    grams = F.when(
        F.length(text_col) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(text_col) - (n - 1)),
                lambda i: F.col(text_col).substr(i, F.lit(n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        F.col(id_col).alias("doc_id"), F.explode(grams).alias("term")
    )


def shingle_minhash_bands(
    docs: DataFrame,
    n: int = 3,
    n_minhash: int = N_MINHASH,
    rows_per_band: int = ROWS_PER_BAND,
) -> DataFrame:
    """MinHash LSH bands over character n-gram shingles (the
    shingle->minhash->band->bucket-join pipeline); same banding/bucketing as
    the word-token variant, so candidate_pairs/jaccard_verify compose."""
    return _bands_from_token_table(shingles(docs, n), n_minhash, rows_per_band)


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    method: str = "exact",
    vec_col: str = "embedding",
    n_planes: int = 16,
    n_tables: int = 4,
    digits: int = 6,
) -> DataFrame:
    """(a, b, cos) embedding-cosine near-duplicate pairs.

    ``method="exact"``: all-pairs self-join with a JVM cosine fold — the
    oracle-verifiable baseline (O(n^2), gate/test scale only).
    ``method="lsh"``: the scale path — candidates restricted to pairs
    colliding in at least one multi-table LSH bucket (ann.lsh_buckets_tables),
    then the same exact cosine verify; output is a subset of "exact" whose
    recall on true near-dups is pinned in pytest."""
    from . import ann

    def cos_pairs(pairs: DataFrame) -> DataFrame:
        dot = F.aggregate(
            F.zip_with(
                F.col("ea"), F.col("eb"), lambda x, y: x.cast("double") * y.cast("double")
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

        def norm(c):
            return F.sqrt(
                F.aggregate(
                    F.transform(F.col(c), lambda x: x.cast("double") * x.cast("double")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )

        return (
            pairs.withColumn("cos", F.round(dot / (norm("ea") * norm("eb")), digits))
            .filter(F.col("cos") >= threshold)
            .select("a", "b", "cos")
        )

    if method not in ("exact", "lsh"):
        raise ValueError(f"unknown method {method!r}")
    x = emb.select(F.col("vec_id").alias("a"), F.col(vec_col).alias("ea"))
    y = emb.select(F.col("vec_id").alias("b"), F.col(vec_col).alias("eb"))
    if method == "exact":
        pairs = x.join(y, F.col("a") < F.col("b"))
        return cos_pairs(pairs)
    buckets = ann.lsh_buckets_tables(emb, n_planes=n_planes, n_tables=n_tables, vec_col=vec_col)
    cand = (
        buckets.alias("p")
        .join(buckets.alias("q"), ["table", "bucket"])
        .filter(F.col("p.vec_id") < F.col("q.vec_id"))
        .select(F.col("p.vec_id").alias("a"), F.col("q.vec_id").alias("b"))
        .distinct()
    )
    pairs = (
        cand.join(x, "a")
        .join(y, "b")
    )
    return cos_pairs(pairs)


# --------------------------------------------------- duplicate clustering


def connected_components(
    pairs: DataFrame, max_iters: int = 50, checkpoint_dir: str = None
) -> DataFrame:
    """(doc_id, component) — connected components over a near-duplicate
    pair list; component = the smallest doc_id reachable from the doc.
    This is the canonicalization step every dedup pipeline runs after pair
    generation: keep one doc per component, drop the rest.

    Algorithm: each round is (1) min-label propagation over the symmetrized
    edge list — every vertex takes the min of its own and its neighbors'
    labels (one join + one combiner aggregate) — then (2) POINTER JUMPING:
    ``component <- min(component, component-of-component)`` (one self-join),
    which doubles label-path lengths per round.  Step 1 alone needs
    O(diameter) rounds, and long chains are not exotic here: our own
    ``candidate_pairs(max_ring=r)`` emits exactly chain-shaped edges for a
    mega-bucket, so a 10^5-doc duplicate cluster would be a 10^5-diameter
    graph.  With step 2 the loop converges in O(log n) rounds (the
    hash-to-min shape).  Each round's labels are materialized so lineage
    does not grow unboundedly across iterations (the classic
    iterative-Spark trap).  Driver coordination is one tiny count per round
    (the convergence check), never data.

    ``checkpoint_dir``: when None, rounds are ``localCheckpoint()``ed —
    fastest, but the checkpoint lives in executor block storage, so losing
    an executor mid-iteration kills the job unrecoverably.  On a real
    cluster (preemptible nodes, 10^9-edge graphs) pass a durable directory:
    each round is then persisted as parquet and read back — an executor
    loss only recomputes the current round from durable inputs.  Superseded
    round files are deleted as the loop advances; the FINAL round's parquet
    is left in place, so the returned DataFrame is re-readable without any
    of the original lineage (the caller owns eventual cleanup of the dir).
    """
    import os
    import shutil

    spark = pairs.sparkSession
    rnd = [0]
    # local mode: (round, rdd-ids) per localCheckpoint, so superseded
    # rounds' executor blocks are RELEASED as the loop advances — the
    # checkpoint RDDs otherwise stay persisted until JVM GC happens to
    # collect the Dataset (nondeterministic, and k rounds of doc-count-
    # sized label tables held at once is a real cost at scale); round -1
    # marks the edges table, which every round joins (dropped only at exit)
    local_ckpts = []

    def persist(df: DataFrame, tag: str, round_no: int = None) -> DataFrame:
        if checkpoint_dir is None:
            before = _persistent_rdd_ids(spark)
            out = df.localCheckpoint()
            local_ckpts.append(
                (rnd[0] if round_no is None else round_no,
                 _persistent_rdd_ids(spark) - before)
            )
            return out
        path = os.path.join(checkpoint_dir, f"cc-{rnd[0]:04d}-{tag}")
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    def drop_rounds(upto_exclusive: int) -> None:
        if checkpoint_dir is None:
            kept = []
            for r, ids in local_ckpts:
                if 0 <= r < upto_exclusive:
                    _unpersist_rdd_ids(spark, ids)
                else:
                    kept.append((r, ids))
            local_ckpts[:] = kept
            return
        if not os.path.isdir(checkpoint_dir):
            return
        for name in os.listdir(checkpoint_dir):
            if not name.startswith("cc-"):
                continue
            try:
                n = int(name.split("-")[1])
            except (IndexError, ValueError):
                continue
            if n < upto_exclusive:
                shutil.rmtree(os.path.join(checkpoint_dir, name))

    def finish(labels: DataFrame) -> DataFrame:
        # release every internal checkpoint except the one backing the
        # returned labels; expose that last one's ids so compositions
        # (clean_corpus) can release it too once they've materialized
        # their own result
        if checkpoint_dir is None and local_ckpts:
            final_ids = local_ckpts[-1][1]
            for _r, ids in local_ckpts[:-1]:
                _unpersist_rdd_ids(spark, ids - final_ids)
            labels._local_ckpt_ids = final_ids
        return labels

    edges = (
        pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
    )
    # materialize the edge list ONCE: every round joins against it, and an
    # un-persisted edges DF re-derives the whole upstream pair pipeline
    # (minhash -> candidates -> jaccard -> ...) per round — measured as a
    # stage explosion + driver OOM when the input lineage is heavy (the
    # clean_corpus composition).  The "edges" name sits outside the
    # "cc-<round>" namespace, so drop_rounds leaves it for the whole loop.
    if checkpoint_dir is None:
        edges = persist(edges, "edges", round_no=-1)
    else:
        path = os.path.join(checkpoint_dir, "edges")
        edges.write.mode("overwrite").parquet(path)
        edges = spark.read.parquet(path)
    labels = persist(
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id")),
        "init",
    )
    for _ in range(max_iters):
        rnd[0] += 1
        neighbor = (
            edges.join(labels, edges.src == labels.doc_id)
            .select(F.col("dst").alias("doc_id"), "component")
        )
        prop = persist(
            labels.select("doc_id", "component")
            .unionByName(neighbor)
            .groupBy("doc_id")
            .agg(F.min("component").alias("component")),
            "prop",  # self-joined below: don't pay the aggregate twice
        )
        # pointer jump: follow the label one hop (component's component)
        parents = prop.select(
            F.col("doc_id").alias("component"),
            F.col("component").alias("parent_comp"),
        )
        new = persist(
            prop.join(parents, "component", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("parent_comp"), F.col("component")),
                ).alias("component"),
            ),
            "new",
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.component") < F.col("o.component"))
            .count()
        )
        labels = new
        # this round's "new" is durable: every earlier round is superseded
        drop_rounds(rnd[0])
        if changed == 0:
            return finish(labels)
    # non-convergence: release every internal checkpoint before raising —
    # nothing is returned, so nothing needs to survive
    if checkpoint_dir is None:
        for _r, ids in local_ckpts:
            _unpersist_rdd_ids(spark, ids)
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds — "
        "raise max_iters (expected O(log n) with pointer jumping)"
    )


def canonical_docs(docs: DataFrame, components: DataFrame) -> DataFrame:
    """Drop non-canonical near-duplicates: keep every doc that is its own
    component representative (the smallest id in its cluster) plus every
    doc with no near-dup pair at all.  One broadcast-friendly anti-join."""
    losers = components.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    return docs.join(losers, "doc_id", "left_anti")


def clean_corpus(
    docs: DataFrame,
    lang: str = "en",
    min_tokens: int = 20,
    min_stopword_ratio: float = 0.0,
    jaccard: float = 0.8,
    max_ring: int = None,
    stats: dict = None,
    cc_checkpoint_dir: str = None,
) -> DataFrame:
    """One-call training-data corpus cleaner — the composition a 100-TB
    pretraining pipeline runs before anything else, built entirely from
    the individually-gated operators:

    1. **language filter** (`text_analysis.lang_id`): keep docs whose
       stopword-profile argmax equals ``lang``;
    2. **quality filter** (`text_analysis.quality`): keep docs with
       ``n_tokens >= min_tokens`` and
       ``stopword_ratio >= min_stopword_ratio``;
    3. **exact dedup**: among content-identical docs (md5 of text), keep
       only the smallest doc_id;
    4. **near-dup canonicalization**: MinHash-band candidates -> exact
       Jaccard >= ``jaccard`` -> connected components -> keep each
       cluster's min-id representative (``canonical_docs``).

    Stage order matters at scale: the cheap row-local filters (1-2) shrink
    the corpus BEFORE the shuffling stages (3-4) run.  ``max_ring`` bounds
    hot-bucket pair fan-out for degenerate corpora (None = exact bucket
    pairs — the cross-engine-gated shape); ``stats`` (optional dict) is
    filled with per-stage survivor counts for pipeline observability —
    three small count jobs, maintenance-path only, pass None on the hot
    path.

    SINGLE-PASS tokenization (round 6): the corpus is tokenized ONCE into
    a persisted (doc_id, term) table that feeds langid + quality (one
    combined grouped aggregate, decision-identical to
    ``text_analysis.lang_id`` / ``quality``), the MinHash bands, AND the
    Jaccard verify — the round-5 composition re-tokenized the text column
    in each stage (4x), which is the cleaner's dominant cost at scale
    (VERDICT r5 #2).  The result is eagerly materialized
    (``localCheckpoint``, MEMORY_AND_DISK, survivors only) so every
    internal cache can be unpersisted before returning — no storage leaks
    into the caller's session (ADVICE r5 low).

    ``cc_checkpoint_dir``: None (default) keeps everything in executor
    block storage — fastest, right for local mode.  On a cluster with
    preemptible executors pass a durable directory: the connected-
    components rounds AND the final cleaned corpus are written there as
    parquet (``<dir>/cleaned``), so no executor loss can take the result
    with it; the superseded CC round files are removed once the result
    lands, and the caller owns eventual cleanup of the directory."""
    from . import index_build, text_analysis

    digits = 6
    langs = sorted(text_analysis.STOPWORDS.items())
    # ONE tokenization pass, persisted: every later stage (profile
    # aggregate, bands, jaccard, and the final survivor scan through
    # keep's lineage) reads this table instead of re-running the
    # tokenizer over the text column.  Scalar columns only — safe to
    # columnar-cache (round-2 array-cache finding); MEMORY_AND_DISK so a
    # corpus-sized token table spills instead of evicting (eviction would
    # silently re-tokenize).
    from pyspark import StorageLevel

    toks = index_build.tokens_jvm(docs).persist(StorageLevel.MEMORY_AND_DISK)

    # langid + quality in ONE doc-keyed aggregate.  Per-lang scores and
    # the quality columns use the exact arithmetic of lang_id()/quality()
    # (sum(when)/count double division; round(..., 6) on the ratio), so
    # the keep/drop decisions are bit-identical to the staged round-5
    # composition — the txt_clean_corpus gate pins this.
    aggs = [F.count("*").alias("n_tokens")]
    for lg, words in langs:
        aggs.append(
            (
                F.sum(F.when(F.col("term").isin(words), 1).otherwise(0))
                / F.count("*")
            ).alias(f"s_{lg}")
        )
    sw = text_analysis.STOPWORDS["en"]
    aggs.append(
        F.round(
            F.sum(F.when(F.col("term").isin(sw), 1).otherwise(0)) / F.count("*"),
            digits,
        ).alias("stopword_ratio")
    )
    prof = toks.groupBy("doc_id").agg(*aggs)
    # argmax with lang_id's tie-break (desc score, asc lang): first lang
    # in ascending order whose score equals the max — same decision as
    # the row_number window, no second shuffle
    mx = F.greatest(*[F.col(f"s_{lg}") for lg, _ in langs])
    pred = None
    for lg, _ in langs:
        clause = (F.col(f"s_{lg}") == mx, F.lit(lg))
        pred = F.when(*clause) if pred is None else pred.when(*clause)
    keep_ids = prof.filter(
        (pred == lang)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
    ).select("doc_id")
    keep = docs.join(keep_ids, "doc_id", "left_semi")
    if stats is not None:
        stats["after_lang_quality"] = keep.count()

    # exact dedup: canonical = min doc_id per content hash (text scan, no
    # tokenization)
    w_min = keep.groupBy(F.md5(F.col("text").cast("binary")).alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    # cache the survivor set: the near-dup stage scans it repeatedly
    # (token semi-join build + the final anti-join), and without the
    # cache each scan replays the profile aggregate + md5 shuffle
    # (scalar columns only — safe to columnar-cache)
    keep = keep.join(w_min.select("doc_id"), "doc_id", "left_semi").cache()
    if stats is not None:
        stats["after_exact_dedup"] = keep.count()

    # near-dup stage over the SAME token table: distinct (doc_id, term)
    # of the survivors == distinct_tokens(keep), cached once and fed to
    # both the banding aggregate and the two Jaccard join sides
    toks_keep = (
        toks.join(keep.select("doc_id"), "doc_id", "left_semi")
        .distinct()
        .cache()
    )
    bands = _bands_from_token_table(toks_keep, N_MINHASH, ROWS_PER_BAND)
    pairs = candidate_pairs(bands, max_ring=max_ring)
    strong = (
        jaccard_verify(pairs, toks_keep)
        .filter(F.col("jaccard") >= jaccard)
        .select("a", "b")
    )
    comps = connected_components(strong, checkpoint_dir=cc_checkpoint_dir)
    if cc_checkpoint_dir is None:
        # eager materialization of the survivors (MEMORY_AND_DISK,
        # spills), so the token caches can be dropped HERE instead of
        # leaking into the caller's session; the checkpoint holds only
        # the cleaned docs
        cleaned = canonical_docs(keep, comps).localCheckpoint()
    else:
        # durable mode: the result itself goes to parquet — a caller who
        # asked for durable CC rounds has preemptible executors, and a
        # localCheckpoint'd result would die with one.  The CC round
        # files are superseded once the result lands; drop them so the
        # directory holds only the cleaned corpus.
        import os
        import shutil

        out = os.path.join(cc_checkpoint_dir, "cleaned")
        canonical_docs(keep, comps).write.mode("overwrite").parquet(out)
        cleaned = docs.sparkSession.read.parquet(out)
        for name in os.listdir(cc_checkpoint_dir):
            if name.startswith("cc-") or name == "edges":
                shutil.rmtree(os.path.join(cc_checkpoint_dir, name))
    if stats is not None:
        stats["after_near_dedup"] = cleaned.count()
    toks_keep.unpersist(True)
    toks.unpersist(True)
    keep.unpersist(True)
    # the component labels' final localCheckpoint is baked into `cleaned`
    # now — release its executor blocks instead of leaving them to JVM GC
    _unpersist_rdd_ids(docs.sparkSession, getattr(comps, "_local_ckpt_ids", None))
    return cleaned


def decontaminate(
    train: DataFrame, eval_docs: DataFrame, n: int = 5, text_col: str = "text"
) -> DataFrame:
    """(doc_id, matched_ngrams, contaminated) — benchmark decontamination:
    flag every training document sharing at least one word ``n``-gram with
    the held-out evaluation set (the n-gram-overlap contamination test of
    GPT-3 appendix C / PaLM-style pipelines).  ``matched_ngrams`` counts the
    DISTINCT training-side grams that also occur anywhere in the eval set.

    Plan shape for 100 TB: the eval side is benchmark-sized (thousands of
    docs), so its distinct gram set is BROADCAST — the training corpus is
    scanned once and its gram stream filters through a map-side hash join
    BEFORE any shuffle; only the MATCHED grams (orders of magnitude fewer)
    reach the per-doc distinct-count aggregate (two-phase, map-side
    combined).  The corpus is never shuffled on the gram key and never
    pays a corpus-wide distinct.  Training docs with fewer than ``n``
    tokens have no grams and are reported clean via the left join."""
    from .text_analysis import token_ngrams

    eval_grams = token_ngrams(eval_docs, n, text_col=text_col).select("gram").distinct()
    train_grams = token_ngrams(train, n, text_col=text_col)
    matched = (
        train_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").cast("long").alias("matched_ngrams"))
    )
    return (
        train.select("doc_id")
        .join(matched, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("matched_ngrams"), F.lit(0)).cast("long").alias("matched_ngrams"),
        )
        .withColumn("contaminated", F.col("matched_ngrams") > 0)
    )


def dup_spans(
    docs: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, span_start, span_end, n_grams) — maximal runs of token
    positions whose word ``n``-gram also appears in at least ``min_docs``
    DISTINCT documents: substring-granular duplicate discovery ("dedup at
    the span level", the exact-substring companion to doc-level MinHash).
    Doc-level dedup misses the quoted paragraph, the syndicated press-release
    body, the license header — a duplicated PASSAGE inside an otherwise
    unique page.  Each output row is one such passage: ``span_start`` /
    ``span_end`` are inclusive 0-based token indices (``span_end`` covers the
    last token of the last duplicated gram), ``n_grams`` the run length.
    Compose with ``text_analysis.token_counts`` for a per-doc duplicated
    fraction, or excise the spans to keep the page.

    Plan, scan to result: one tokenize pass -> positional grams
    (``token_pos_ngrams``) -> gram-frequency hash aggregate (count-distinct
    partial-combines map-side; only grams crossing the ``min_docs`` bar
    survive) -> shuffle join of the gram stream against that (much smaller,
    boilerplate-skewed) duplicated-gram set -> per-doc gaps-and-islands
    (``pos - row_number`` over a doc-partitioned window groups consecutive
    positions; the sort is per-doc, never global) -> one final per-span
    aggregate.  At 100 TB the expensive edges are the two gram shuffles;
    both carry (gram[, doc]) rows already reduced map-side, and the window
    state is bounded by a single document's duplicated positions.

    Within-doc repetition alone does NOT mark a span (frequency counts
    distinct docs); Gopher-style within-doc repetition is
    ``text_analysis.repetition``'s job."""
    from .text_analysis import token_pos_ngrams

    from pyspark.sql import Window

    grams = token_pos_ngrams(docs, n, id_col=id_col, text_col=text_col)
    # distinct-doc frequency IN the gram stream's own exchange (round 7):
    # dense_rank over (gram, doc_id asc) counts distinct docs seen so far,
    # its max over the gram partition is the gram's distinct-doc count —
    # one shuffle of the gram stream replaces the former aggregate +
    # join-back (which re-shuffled the full stream a second time; 2x on
    # the marking phase at sf1.0, output bit-identical).  A boilerplate
    # mega-gram is one window partition (disk-backed buffer, single task)
    # — the same hot-key exposure the old reduce-side aggregate had.
    wg = Window.partitionBy("gram").orderBy("doc_id")
    wga = Window.partitionBy("gram")
    marked = (
        grams.withColumn("_dr", F.dense_rank().over(wg))
        .withColumn("_gdocs", F.max("_dr").over(wga))
        .filter(F.col("_gdocs") >= min_docs)
        .select("doc_id", "pos")
    )

    w = Window.partitionBy("doc_id").orderBy("pos")
    islands = marked.withColumn(
        "_island", F.col("pos") - F.row_number().over(w)
    )
    return islands.groupBy("doc_id", "_island").agg(
        F.min("pos").cast("long").alias("span_start"),
        (F.max("pos") + F.lit(n - 1)).cast("long").alias("span_end"),
        F.count("*").cast("long").alias("n_grams"),
    ).drop("_island")


def excise_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, n_removed, text_clean) — remove the duplicated
    passages ``dup_spans`` found and keep the page: the actionable half of
    exact-substring dedup (dropping a whole doc over one syndicated
    paragraph throws away its unique prose; excising the passage keeps it).
    ``text_clean`` is the doc's NORMALIZED token stream (the alnum
    tokenizer's lowercased tokens, space-joined — the representation every
    downstream signature/training tokenizer here consumes) with all tokens
    inside any span removed, original order preserved.  Accepts any span
    table with (doc_id, span_start, span_end) inclusive token indices —
    overlapping spans are fine (coverage is deduplicated).

    Plan: positional tokens -> explode the spans into a covered
    (doc_id, pos) set (span tables are small relative to the corpus: rows
    ~ duplicated passages) -> one left join to tag -> one per-doc aggregate
    that counts and reassembles in a single pass (the line_dedup shape:
    per-group struct sort, never a global sort).  Docs with no tokens have
    no row; docs whose every token is excised survive with
    text_clean = '' (callers compose with quality()/gopher_rules)."""
    from ..functions.tokenizer import simple_terms_col

    toked = docs.select(
        F.col(id_col).alias("doc_id"),
        simple_terms_col(F.col(text_col)).alias("_toks"),
    ).filter(F.size("_toks") > 0)
    toks = toked.select(
        "doc_id", F.posexplode(F.col("_toks")).alias("pos", "term")
    ).withColumn("pos", F.col("pos").cast("long"))
    covered = spans.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("span_start"), F.col("span_end"))
        ).alias("pos"),
    ).distinct()
    tagged = toks.join(
        covered.withColumn("_rm", F.lit(True)), ["doc_id", "pos"], "left"
    ).select(
        "doc_id", "pos", "term", F.coalesce(F.col("_rm"), F.lit(False)).alias("_rm")
    )
    kept = F.filter(
        F.array_sort(F.collect_list(F.struct("pos", "term", "_rm"))),
        lambda s: ~s["_rm"],
    )
    return tagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(F.col("_rm").cast("int")).cast("long").alias("n_removed"),
        F.array_join(F.transform(kept, lambda s: s["term"]), " ").alias(
            "text_clean"
        ),
    )


def preprocess_corpus(
    docs: DataFrame,
    line_max_docs: int = None,
    pii: bool = False,
    c4: bool = False,
    stats: dict = None,
    **clean_kwargs,
) -> DataFrame:
    """The complete web-pipeline front door, in the order production
    cleaners run it: (optional) C4 battery -> (optional) line-granular
    boilerplate removal -> (optional) PII scrub -> ``clean_corpus``
    (langid -> quality -> exact dedup -> near-dup canonicalization).  A
    pure composition of the individually-gated operators — bit-identical
    to applying them one at a time (pinned by test) — so each stage's
    correctness evidence carries over.

    Stage order matters twice over at scale: the C4 battery first (it is
    the coarsest page filter AND rewrites pages line-level, so every
    downstream signature sees the C4-cleaned text — C4 itself ran before
    dedup in the original pipeline), line dedup next (boilerplate lines
    would otherwise rescue low-quality pages past the quality filter and
    glue near-dup pairs together), PII scrub before tokenization-heavy
    stages (scrubbed text is what every downstream signature should see),
    and the row-local scrub adds no shuffle of its own.  ``stats`` gains
    per-stage observability counters (one extra aggregate job per enabled
    stage — maintenance path; pass None on the hot path)."""
    from . import text_analysis

    cur = docs
    if c4:
        rules = text_analysis.c4_rules(cur)
        if stats is not None:
            agg = rules.agg(
                F.count("*").alias("n"),
                F.sum(F.col("keep_doc").cast("long")).alias("kept"),
            ).first()
            stats["c4_docs_in"] = agg["n"]
            stats["c4_docs_kept"] = agg["kept"]
        cur = cur.drop("text").join(
            rules.filter(F.col("keep_doc")).select(
                "doc_id", F.col("text_clean").alias("text")
            ),
            "doc_id",
        )
    if line_max_docs is not None:
        ld = text_analysis.line_dedup(cur, max_docs=line_max_docs)
        if stats is not None:
            agg = ld.agg(
                F.sum("n_lines").alias("n_lines"),
                F.sum("n_kept").alias("n_lines_kept"),
            ).first()
            stats["n_lines"] = agg["n_lines"]
            stats["n_lines_kept"] = agg["n_lines_kept"]
        cur = cur.drop("text").join(
            ld.select("doc_id", F.col("text_clean").alias("text")), "doc_id"
        )
    if pii:
        red = text_analysis.pii_redact(cur)
        if stats is not None:
            agg = red.agg(
                F.sum("n_email").alias("n_email"),
                F.sum("n_ipv4").alias("n_ipv4"),
                F.sum("n_phone").alias("n_phone"),
            ).first()
            stats["pii_redactions"] = {
                "n_email": agg["n_email"],
                "n_ipv4": agg["n_ipv4"],
                "n_phone": agg["n_phone"],
            }
        cur = cur.drop("text").join(
            red.select("doc_id", F.col("text_clean").alias("text")), "doc_id"
        )
    return clean_corpus(cur, stats=stats, **clean_kwargs)
