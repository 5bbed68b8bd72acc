"""Text analysis operators: quality scoring, language id, token counting,
document fingerprinting.  All JVM-expression plans with cross-engine oracles
(entry.oracle_sql)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import poly_hash

STOPWORDS = {
    "en": ["the", "a", "of", "and"],
    "de": ["der", "die", "das", "und"],
    "fr": ["le", "la", "et", "de"],
    "es": ["el", "la", "y", "de"],
}


def _tokens(docs: DataFrame) -> DataFrame:
    # token identity only (no byte offsets) -> JVM-only fast path
    from . import index_build

    return index_build.tokens_jvm(docs)


def quality(docs: DataFrame, digits: int = 6) -> DataFrame:
    """(doc_id, n_tokens, mean_tok_len, stopword_ratio)."""
    sw = STOPWORDS["en"]
    return (
        _tokens(docs)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(F.length("term")), digits).alias("mean_tok_len"),
            F.round(
                F.sum(F.when(F.col("term").isin(sw), 1).otherwise(0)) / F.count("*"),
                digits,
            ).alias("stopword_ratio"),
        )
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang) — stopword-profile argmax, lexicographic ties."""
    toks = _tokens(docs)
    scores = None
    for lang, words in sorted(STOPWORDS.items()):
        s = (
            toks.groupBy("doc_id")
            .agg(
                (
                    F.sum(F.when(F.col("term").isin(words), 1).otherwise(0))
                    / F.count("*")
                ).alias("score")
            )
            .select("doc_id", F.lit(lang).alias("lang"), "score")
        )
        scores = s if scores is None else scores.unionByName(s)
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("lang"))
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("pred_lang"))
    )


def source_mix(docs: DataFrame, digits: int = 6) -> DataFrame:
    """Per-source mixture table — the numbers a pretraining-data pipeline
    sets its source weights from: (source, n_docs, n_tokens, mean_doc_tokens,
    mean_stopword_ratio, token_share).

    One tokenize pass (reuses ``quality``'s per-doc aggregate), joined to the
    (doc_id, source) projection on the doc_id both sides are already keyed
    by, then a per-source aggregate (shuffle cardinality = #sources, with
    map-side partial aggregation).  ``token_share`` uses an unpartitioned
    window over the ALREADY-AGGREGATED frame — #sources rows on one
    partition, not a corpus-wide single-partition sort.  Docs with zero
    tokens carry no mixture weight and are excluded (same population as the
    ``txt_quality`` gate)."""
    per_doc = quality(docs, digits).join(docs.select("doc_id", "source"), "doc_id")
    agg = per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.round(F.avg("n_tokens"), digits).alias("mean_doc_tokens"),
        F.round(F.avg("stopword_ratio"), digits).alias("mean_stopword_ratio"),
    )
    total = Window.partitionBy()
    return agg.withColumn(
        "token_share",
        F.round(F.col("n_tokens") / F.sum("n_tokens").over(total), digits),
    )


SAMPLE_DENOM = 10000
_SAMPLE_MOD = 1000003  # pre-reduce ids so the Knuth multiply stays < 2^52
_KNUTH = 2654435761


def sample_key(id_col: str = "doc_id"):
    """Deterministic, engine-portable sampling key in [0, SAMPLE_DENOM):
    pmod-reduce the id below 2^20, Knuth-multiply, reduce again.  The
    pre-reduction keeps the product under 2^52 so the arithmetic is exact
    in BIGINT on both Spark and DuckDB (no overflow, no ANSI error), and
    pmod handles negative (hashed web-scale) ids identically to the
    oracle's ``((id % m + m) % m)``."""
    return F.pmod(
        F.pmod(F.col(id_col), F.lit(_SAMPLE_MOD)) * F.lit(_KNUTH),
        F.lit(SAMPLE_DENOM),
    )


def stratified_sample(
    docs: DataFrame,
    fractions: dict,
    default_fraction: float = 0.0,
    source_col: str = "source",
) -> DataFrame:
    """Source-stratified deterministic downsampling: keep a row iff its
    ``sample_key`` falls under its source's cutoff.  Stateless and
    shuffle-free (a single filter pushed into the scan), reproducible
    across engines and runs — the way a 100 TB mixture is actually drawn
    (no ``rand()``: re-runs and backfills must pick the same rows)."""
    cut = None
    for src, frac in sorted(fractions.items()):
        c = int(frac * SAMPLE_DENOM)
        cond = F.col(source_col) == src
        cut = F.when(cond, c) if cut is None else cut.when(cond, c)
    default_cut = int(default_fraction * SAMPLE_DENOM)
    cut = F.lit(default_cut) if cut is None else cut.otherwise(default_cut)
    return docs.filter(sample_key() < cut)


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, ws_tokens, alnum_tokens, bpe_est)."""
    return docs.select(
        "doc_id",
        F.size(F.split(text_col, " ")).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.lower(text_col), F.lit("[a-z0-9]+"), 0))
        .cast("long")
        .alias("alnum_tokens"),
        F.ceil(F.length(F.regexp_replace(text_col, " ", "")) / 4)
        .cast("long")
        .alias("bpe_est"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fp) — rolling polynomial over the full text's codepoints."""
    return docs.select("doc_id", poly_hash(F.col(text_col), 0).alias("fp"))


def snippet_extract(
    hits: DataFrame, docs: DataFrame, width: int = 20, text_col: str = "text"
) -> DataFrame:
    """(doc_id, start, snippet) — +-``width`` characters of context around
    each hit's start offset: the reference engine's raison d'etre is
    highlighting search results (occurrence starts are offsets into the
    original document precisely so a caller can excerpt around them —
    /root/reference/src/lib.rs front-page example).

    One broadcast-friendly join (hits are a query result: small) + a
    JVM substring; no Python.  Offsets are the engine's byte offsets —
    on ASCII corpora byte == char (the same equivalence the oracle SQL
    relies on, see entry.py module docstring); non-ASCII corpora would
    need a byte-slice UDF instead of substr."""
    begin = (F.greatest(F.lit(0), F.col("start") - width) + 1).cast("int")
    return (
        hits.select("doc_id", "start")
        .join(docs.select("doc_id", text_col), "doc_id")
        .select(
            "doc_id",
            "start",
            F.col(text_col).substr(begin, F.lit(2 * width)).alias("snippet"),
        )
    )


def repetition(docs: DataFrame, n: int = 2, digits: int = 6, text_col: str = "text") -> DataFrame:
    """(doc_id, n_ngrams, dup_ngram_frac, top_ngram_frac) — Gopher-style
    repetition signals over word n-grams, the web-text quality filter that
    drops boilerplate/spam (high duplicate-n-gram fraction) and degenerate
    repetition (one dominant n-gram).

    JVM-only plan: split -> sliding array_join windows (no UDF) -> explode
    -> per-(doc, gram) count -> one narrow per-doc aggregate; at 100 TB
    both aggregates partial-combine map-side.  Docs with fewer than ``n``
    tokens have no n-grams and drop out (same on the SQL oracle side).

    The split array is materialized in its own projection first — an
    expression inlined into ``transform``'s lambda re-evaluates PER
    ELEMENT, i.e. re-splits the document once per gram index (O(len^2)
    per doc; see token_ngrams)."""
    toked = docs.select(
        "doc_id", F.split(F.col(text_col), " ").alias("_toks")
    )
    toks = F.col("_toks")
    # guard: Spark sequence(0, stop) DESCENDS when stop < 0, which would
    # mint phantom window starts for docs shorter than n tokens
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_gram = (
        toked.select("doc_id", F.explode(grams).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("c"))
    )
    return per_gram.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_ngrams"),
        F.round(F.lit(1.0) - F.count("*") / F.sum("c"), digits).alias("dup_ngram_frac"),
        F.round(F.max("c") / F.sum("c"), digits).alias("top_ngram_frac"),
    )


def line_stats(docs: DataFrame, sep: str = "\n", text_col: str = "text") -> DataFrame:
    """(line, line_docs, line_occurrences) — corpus-wide per-line frequency
    table: how many distinct documents each exact line appears in, and how
    many times in total.  The discovery half of the MassiveText/RefinedWeb
    "repeated lines across documents" boilerplate signal (nav bars, cookie
    banners, footers repeat verbatim across a site's every page).

    JVM-only plan: split -> explode -> one hash aggregate keyed on the line
    text; both counts partial-combine map-side, so at 100 TB the shuffle
    carries one (line, partial-count) row per distinct line per task, not
    one row per occurrence."""
    lines = docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), sep)).alias("line")
    )
    return lines.groupBy("line").agg(
        F.countDistinct("doc_id").cast("long").alias("line_docs"),
        F.count("*").cast("long").alias("line_occurrences"),
    )


def line_dedup(
    docs: DataFrame,
    max_docs: int = 4,
    sep: str = "\n",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_lines, n_kept, text_clean) — drop every line that appears
    in MORE than ``max_docs`` distinct documents, preserving the surviving
    lines' original order.  This is the line-granular cross-document dedup
    of web-pipeline cleaners (CCNet / MassiveText / RefinedWeb): a page's
    unique prose survives while site-wide boilerplate — repeated verbatim
    on thousands of pages — is removed *within* the document instead of
    dropping the whole document (the doc-granular ops in operators/dedup.py
    are the complement, not a substitute).

    Plan: one explode -> line-frequency aggregate (map-side combined) ->
    shuffle join back on the line text -> one per-doc aggregate that counts
    and reassembles in a single pass.  Reassembly sorts the collected
    (pos, line) structs per doc — per-group data, never a global sort.  No
    Python anywhere.  Line identity is exact-match, the same contract as
    the oracle; near-duplicate lines are out of scope (that is doc-level
    MinHash territory).

    Empty-text semantics: Spark's split("") yields [""], so an empty doc is
    one empty line — it participates in frequency like any other line (at
    web scale blank boilerplate lines are real and common).  Docs whose
    every line is dropped are KEPT with text_clean = '' and n_kept = 0 —
    callers decide whether an emptied doc dies (compose with quality()).
    """
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )
    freq = lines.groupBy("line").agg(
        F.countDistinct("doc_id").alias("line_docs")
    )
    tagged = lines.join(freq, "line").select(
        "doc_id",
        "pos",
        "line",
        (F.col("line_docs") <= max_docs).alias("keep"),
    )
    kept = F.filter(
        F.array_sort(F.collect_list(F.struct("pos", "line", "keep"))),
        lambda s: s["keep"],
    )
    return tagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.col("keep").cast("int")).cast("long").alias("n_kept"),
        F.array_join(F.transform(kept, lambda s: s["line"]), sep).alias(
            "text_clean"
        ),
    )


# -------------------------------------------- pretraining-pipeline additions
# (PII scrubbing, eval-set decontamination support, corpus n-gram mining,
# concatenate-and-chunk sequence packing)

# Sequential scrub order matters: emails are redacted first so their digit
# runs can't later read as phone/IP fragments; none of the three patterns
# can match inside an earlier placeholder.  Patterns restricted to syntax
# with identical semantics in Java regex (Spark) and RE2 (DuckDB oracle):
# character classes, bounded repetition, \b word boundaries.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "[PHONE]"),
]


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, text_clean, n_email, n_ipv4, n_phone) — scrub emails, IPv4
    addresses and NNN-NNN-NNNN phone numbers, replacing each with a typed
    placeholder and counting what was removed (the audit trail a compliance
    pass needs).  The pretraining front door runs this AFTER boilerplate
    removal and BEFORE tokenization.

    Plan: a single narrow projection — three chained JVM regexp_replace +
    regexp_count expressions inside one whole-stage-codegen stage.  No
    shuffle, no Python, trivially scan-parallel at 100 TB.  Each count is
    evaluated against the text as it stood BEFORE that pattern's own
    replacement (sequential semantics, mirrored in the oracle's chained
    CTEs)."""
    cur = F.col(text_col)
    counts = []
    for name, pat, tok in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, tok)
    return docs.select("doc_id", cur.alias("text_clean"), *counts)


# Gopher's required-stopword list (Rae et al. 2021, MassiveText filters):
# a doc must contain at least min_stop_hits of these to count as prose.
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    docs: DataFrame,
    min_tokens: int = 50,
    max_tokens: int = 100000,
    min_mean_tok_len: float = 3.0,
    max_mean_tok_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
    stop_words: list = None,
    digits: int = 6,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, mean_tok_len, symbol_ratio, bullet_frac,
    ellipsis_frac, alpha_frac, stop_hits, r_tokens, r_tok_len, r_symbol,
    r_bullet, r_ellipsis, r_alpha, r_stop, passes) — the Gopher /
    MassiveText web-text quality-rule battery as one auditable per-doc
    table: every signal, every per-rule verdict, and the composite
    ``passes``.  Production pipelines keep the full table (not just the
    survivors) because the rule-level breakdown is how thresholds get
    tuned and filter regressions get diagnosed.

    The rules (defaults are Gopher's): token count within
    [min_tokens, max_tokens]; mean token length within [3, 10];
    symbol-to-word ratio ('#' chars + '...' runs, non-overlapping) at most
    0.1; at most 90% of lines starting with an ASCII bullet ('- ' / '* ');
    at most 30% of lines ending in '...'; at least 80% of tokens containing
    an alphabetic character; at least ``min_stop_hits`` DISTINCT required
    stopwords present (``GOPHER_STOPWORDS`` unless overridden — pass
    corpus-appropriate words for non-English or synthetic corpora).

    Plan: a single narrow whole-stage-codegen projection — the token array
    is materialized once per row (its own select, the HOF-lambda lesson),
    every other signal is a JVM regexp_count/length expression over the
    text, and the rule verdicts are row-local comparisons AGAINST THE
    ROUNDED signal (both engines compare identical 6-digit values, so
    boundary docs agree).  No shuffle, no Python: scan-parallel at 100 TB,
    the same shape as ``pii_redact``.  Zero-token docs are excluded (the
    ``quality`` gate population; they fail any sane pipeline earlier)."""
    words = GOPHER_STOPWORDS if stop_words is None else list(stop_words)
    from ..functions.tokenizer import simple_terms_col

    text = F.col(text_col)
    toked = docs.select(
        "doc_id", text.alias("_text"), simple_terms_col(text).alias("_toks")
    )
    toks = F.col("_toks")
    t = F.col("_text")
    lt = F.lower(t)
    n_tokens = F.size(toks).cast("long")
    sum_len = F.length(F.array_join(toks, ""))
    n_lines = F.size(F.split(t, "\n")).cast("long")
    stop_hits = None
    for w in words:
        hit = F.when(lt.rlike(rf"\b{w}\b"), 1).otherwise(0)
        stop_hits = hit if stop_hits is None else stop_hits + hit
    sig = toked.filter(n_tokens > 0).select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(sum_len / n_tokens, digits).alias("mean_tok_len"),
        F.round(
            (
                F.regexp_count(t, F.lit("#"))
                + F.regexp_count(t, F.lit(r"\.\.\."))
            )
            / n_tokens,
            digits,
        ).alias("symbol_ratio"),
        F.round(F.regexp_count(t, F.lit(r"(?m)^[-*] ")) / n_lines, digits).alias(
            "bullet_frac"
        ),
        F.round(F.regexp_count(t, F.lit(r"(?m)\.\.\.$")) / n_lines, digits).alias(
            "ellipsis_frac"
        ),
        F.round(
            F.regexp_count(lt, F.lit("[0-9]*[a-z][a-z0-9]*")) / n_tokens, digits
        ).alias("alpha_frac"),
        stop_hits.cast("long").alias("stop_hits"),
    )
    rules = sig.select(
        "*",
        ((F.col("n_tokens") >= min_tokens) & (F.col("n_tokens") <= max_tokens)).alias(
            "r_tokens"
        ),
        (
            (F.col("mean_tok_len") >= min_mean_tok_len)
            & (F.col("mean_tok_len") <= max_mean_tok_len)
        ).alias("r_tok_len"),
        (F.col("symbol_ratio") <= max_symbol_ratio).alias("r_symbol"),
        (F.col("bullet_frac") <= max_bullet_frac).alias("r_bullet"),
        (F.col("ellipsis_frac") <= max_ellipsis_frac).alias("r_ellipsis"),
        (F.col("alpha_frac") >= min_alpha_frac).alias("r_alpha"),
        (F.col("stop_hits") >= min_stop_hits).alias("r_stop"),
    )
    return rules.withColumn(
        "passes",
        F.col("r_tokens")
        & F.col("r_tok_len")
        & F.col("r_symbol")
        & F.col("r_bullet")
        & F.col("r_ellipsis")
        & F.col("r_alpha")
        & F.col("r_stop"),
    )


# C4's page-level poison substrings (Raffel et al. 2020, §2.2 "we removed
# any page containing ..."): matched against the RAW page text.  Both
# needles are newline-free, so the page-level `contains` is exactly the
# OR of per-line `contains` — letting the flags ride the same explode
# pass as the line rules instead of a join back to the raw text.
C4_PAGE_BAD = [("lorem", "lorem ipsum"), ("brace", "{")]


def c4_rules(
    docs: DataFrame,
    min_words: int = 5,
    min_kept_lines: int = 3,
    sep: str = "\n",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_lines, n_kept, has_lorem, has_brace, keep_doc, text_clean)
    — the C4 cleaning battery (Raffel et al. 2020): line-level, keep only
    lines that (a) end in a terminal punctuation mark ('.', '!', '?', '"'),
    (b) contain at least ``min_words`` whitespace words, and (c) do not
    mention "javascript" (case-insensitive); page-level, drop any page
    containing "lorem ipsum" (case-insensitive) or a '{' anywhere, or whose
    surviving line count is under ``min_kept_lines``.  Like ``gopher_rules``
    the full audit table is returned (per-page signals + the composite
    ``keep_doc``), with ``text_clean`` always carrying the line-filtered
    text so threshold tuning can inspect near-miss pages.

    Plan: ONE posexplode pass — per-line verdicts and the page-poison flags
    are row-local JVM expressions on the exploded lines (the needles are
    newline-free, so page-level `contains` == OR over lines), then a single
    per-doc aggregate that counts, ORs the flags, and reassembles surviving
    lines in original order (array_sort over per-group structs, never a
    global sort).  No Python, no join, one shuffle keyed on doc_id —
    scan-parallel at 100 TB exactly like ``line_dedup``."""
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )
    l = F.col("line")
    ll = F.lower(l)
    keep = (
        l.rlike('[.!?"]$')
        & (F.size(F.split(l, " ")) >= min_words)
        & ~ll.contains("javascript")
    )
    tagged = lines.select(
        "doc_id",
        "pos",
        "line",
        keep.alias("keep"),
        ll.contains("lorem ipsum").alias("_lorem"),
        l.contains("{").alias("_brace"),
    )
    kept = F.filter(
        F.array_sort(F.collect_list(F.struct("pos", "line", "keep"))),
        lambda s: s["keep"],
    )
    agg = tagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.col("keep").cast("int")).cast("long").alias("n_kept"),
        F.bool_or("_lorem").alias("has_lorem"),
        F.bool_or("_brace").alias("has_brace"),
        F.array_join(F.transform(kept, lambda s: s["line"]), sep).alias(
            "text_clean"
        ),
    )
    return agg.select(
        "doc_id",
        "n_lines",
        "n_kept",
        "has_lorem",
        "has_brace",
        (
            (F.col("n_kept") >= min_kept_lines)
            & ~F.col("has_lorem")
            & ~F.col("has_brace")
        ).alias("keep_doc"),
        "text_clean",
    )


def tfidf_topk(docs: DataFrame, k: int = 3, digits: int = 6) -> DataFrame:
    """(doc_id, term, tf, tfidf, rank) — each document's top-``k`` keywords
    by smoothed tf-idf (``tf * (ln((N+1)/(df+1)) + 1)``), ties broken
    lexicographically: keyword extraction / topic labeling over the indexed
    corpus, and the per-doc salience signal mixture reports weight by.

    Plan (round 7): ONE evaluation of the tokenize -> (doc, term) count
    lineage — the document frequency is a ``count(*)`` window over the
    term partition of that same stream (not a second aggregate joined
    back: the join shape evaluated the whole tokenize+aggregate lineage
    once per consumer, three times in all), and the corpus size N is a
    tokenize-only pass over the docs (distinct doc_ids with >= 1 token —
    no (doc, term) shuffle) riding in as a broadcast 1-row cross join.
    The per-doc top-k window partitions by doc_id — per-group sorts over
    each doc's distinct terms, never a global sort.  Ranking compares the
    ROUNDED score (the ``gopher_rules`` lesson: both engines must order
    identical 6-digit values or boundary ties flip)."""
    from ..functions.tokenizer import simple_terms_col

    tf = (
        _tokens(docs)
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    wdf = Window.partitionBy("term")
    # distinct docs holding >= 1 token == countDistinct(doc_id) over the
    # (doc, term) table, without re-running its aggregate
    nd = (
        docs.filter(F.size(simple_terms_col(F.col("text"))) > 0)
        .select(F.countDistinct("doc_id").alias("n"))
    )
    scored = (
        tf.withColumn("df", F.count("*").over(wdf).cast("long"))
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
                    )
                    + F.lit(1.0)
                ),
                digits,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def unigram_logprob(docs: DataFrame, digits: int = 6) -> DataFrame:
    """(doc_id, n_tokens, nll) — mean per-token negative log-likelihood
    under the corpus's own unigram language model (nats/token): the
    CCNet-style LM-quality proxy.  Low nll = stereotypical high-frequency
    text; high nll = rare-token outliers (gibberish, codes, exotic
    boilerplate) — pipelines bucket the corpus by this score and sample
    each bucket differently.

    Plan: one token pass feeds both the model and the scoring — a corpus
    unigram count (hash aggregate, map-side combined), the corpus total as
    a broadcast 1-row cross join, then a join of tokens to their term's
    probability and one per-doc aggregate.  The term-count table is
    vocabulary-sized (Zipf: tiny next to the corpus), so at 100 TB the
    scoring join broadcasts; everything is JVM expressions."""
    from ..functions.tokenizer import simple_terms_col

    toks = _tokens(docs)
    cnt = toks.groupBy("term").agg(F.count("*").cast("long").alias("c"))
    # corpus total = sum of per-doc token counts: a tokenize-only pass,
    # instead of re-evaluating the whole term-count aggregate lineage
    # (sum(c) over cnt is the same number by construction)
    tot = docs.select(
        F.sum(F.size(simple_terms_col(F.col("text"))).cast("long")).alias("tot")
    )
    probs = cnt.crossJoin(F.broadcast(tot)).select(
        "term", F.log(F.col("c") / F.col("tot")).alias("_lp")
    )
    return (
        toks.join(F.broadcast(probs), "term")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(-F.avg("_lp"), digits).alias("nll"),
        )
    )


def sample_to_budget(
    docs: DataFrame,
    budgets: dict,
    default_budget: int = 0,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, source, n_tokens, cum_before, kept) — draw a per-source
    TOKEN budget from the corpus: within each source, documents are taken
    in deterministic ``sample_key`` order (doc_id tie-break) until the
    source's token budget is filled; the document that crosses the line is
    kept (greedy fill, like concat-and-cut packing).  This is the "mix
    2B tokens of src0 with 500M of src3" operation a pretraining data
    recipe executes, made reproducible across engines and re-runs (no
    ``rand()``; a backfill keeps the same docs).  The full audit table is
    returned — ``kept`` plus the cumulative position that decided it.

    Plan: one tokenize-count projection, then a cumulative-sum window
    partitioned BY SOURCE in sample-key order — per-source sorts, shuffle
    cardinality = #sources (sources are the natural unit a mixture is
    specified over; a giant source can be pre-split by a key range on the
    same sample key, which preserves the draw order).  Zero-token docs
    carry no budget weight and are excluded (the ``quality`` population)."""
    from ..functions.tokenizer import simple_terms_col

    t = docs.select(
        "doc_id",
        F.col(source_col).alias("source"),
        F.size(simple_terms_col(F.col(text_col))).cast("long").alias("n_tokens"),
        sample_key().alias("_key"),
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("source")
        .orderBy("_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    budget = None
    for src, b in sorted(budgets.items()):
        cond = F.col("source") == src
        budget = F.when(cond, int(b)) if budget is None else budget.when(cond, int(b))
    budget = (
        F.lit(int(default_budget))
        if budget is None
        else budget.otherwise(int(default_budget))
    )
    return t.select(
        "doc_id",
        "source",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long").alias(
            "cum_before"
        ),
    ).withColumn("kept", F.col("cum_before") < budget)


def token_pos_ngrams(
    docs: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, pos, gram) — word n-grams over the alnum tokenizer's token
    stream WITH their 0-based starting token position, joined with single
    spaces.  JVM-only (split -> sliding array_join windows -> posexplode);
    docs with fewer than ``n`` tokens contribute no grams.  The shared
    primitive under ``token_ngrams`` (which drops the position),
    ``ngram_freq``, ``dedup.decontaminate`` and ``dedup.dup_spans`` (which
    needs the position to coalesce duplicated runs into spans).

    The token array is materialized in its OWN projection before the gram
    lambda: an expression placed directly inside ``transform``'s lambda is
    re-evaluated PER ELEMENT, so inlining the tokenizer there re-tokenizes
    the whole document once per gram index — O(len^2) per doc, measured
    50x slower at sf0.1.  A multi-referenced non-trivial alias survives
    CollapseProject, so ``_toks`` is computed once per row."""
    from ..functions.tokenizer import simple_terms_col

    toked = docs.select(
        F.col(id_col).alias("doc_id"),
        simple_terms_col(F.col(text_col)).alias("_toks"),
    )
    toks = F.col("_toks")
    # guard: Spark sequence(0, stop) DESCENDS when stop < 0 (docs shorter
    # than n tokens would mint phantom window starts).  Each gram is
    # concat_ws over n element_at lookups — same string as
    # array_join(slice(...), " ") but without allocating a sub-array per
    # position (HOF lambdas are interpreted per element; measured ~1.5x
    # on the gram projection at sf1.0)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + (j + 1)) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return toked.select(
        "doc_id", F.posexplode(grams).alias("pos", "gram")
    ).withColumn("pos", F.col("pos").cast("long"))


def token_ngrams(
    docs: DataFrame, n: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, gram) — word n-grams without positions; the same plan as
    ``token_pos_ngrams`` minus the pos column (the position is a free
    by-product of the generate, not an extra pass)."""
    return token_pos_ngrams(docs, n, id_col=id_col, text_col=text_col).select(
        "doc_id", "gram"
    )


def ngram_freq(
    docs: DataFrame, n: int = 2, k: int = 100, text_col: str = "text"
) -> DataFrame:
    """(gram, n_occurrences, n_docs, rank) — the corpus's top-``k`` word
    n-grams by total occurrences (ties broken lexicographically): the
    boilerplate-mining / template-discovery companion to ``line_stats``
    when repeated content doesn't align on line boundaries.

    Plan: explode -> one hash aggregate keyed on the gram (both counts
    partial-combine map-side) -> ``orderBy().limit(k)``, which Spark
    executes as TakeOrdered: per-partition top-k then a k-row merge on the
    driver — NOT a global sort of the (huge) distinct-gram table.  The
    row_number window that attaches the rank runs over the already-reduced
    k rows (one tiny partition by construction)."""
    counts = token_ngrams(docs, n, text_col=text_col).groupBy("gram").agg(
        F.count("*").cast("long").alias("n_occurrences"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )
    order = [F.desc("n_occurrences"), F.asc("gram")]
    top = counts.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    n_buckets: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, bucket, n_tokens, start_off, chunk_first, chunk_last,
    n_chunks) — concatenate-and-chunk sequence packing: within each bucket,
    documents are concatenated in doc_id order and the token stream is cut
    into fixed-``budget`` training sequences; each doc learns which chunk(s)
    its tokens land in.  This is the exact assignment LLM training's
    "concat then split at the context length" preprocessing performs, made
    deterministic and engine-portable.

    Plan: one tokenize-count projection (JVM split, no materialized token
    table), then a cumulative-sum window PER BUCKET — the window partitions
    by bucket, so at 100 TB the sort is per-bucket (pick n_buckets ~ corpus
    tokens / executor-memory-sized slices; buckets pack independently and
    in parallel, trading a bounded per-bucket boundary effect for a fully
    shuffle-parallel plan; a hash of the id works as the bucket key when
    ids are not dense).  Zero-token docs carry no trainable tokens and are
    excluded (the ``quality`` gate population).  All arithmetic is exact
    nonnegative integer floor-division on both engines."""
    from ..functions.tokenizer import simple_terms_col

    t = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(simple_terms_col(F.col(text_col))).cast("long").alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
        .withColumn("bucket", F.pmod(F.col("doc_id"), F.lit(n_buckets)).cast("long"))
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t = t.withColumn(
        "start_off", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    ).withColumn("_end_off", F.col("start_off") + F.col("n_tokens") - F.lit(1))
    # exact integer floor-div (both operands nonnegative, so truncating
    # `div` == floor): F.floor(col / budget) would go through DOUBLE and
    # lose exactness past 2^53 — the codec.range_expr lesson
    b = int(budget)
    chunk_first = F.expr(f"start_off div cast({b} as bigint)")
    chunk_last = F.expr(f"_end_off div cast({b} as bigint)")
    return t.select(
        "doc_id",
        "bucket",
        "n_tokens",
        "start_off",
        chunk_first.alias("chunk_first"),
        chunk_last.alias("chunk_last"),
        (chunk_last - chunk_first + 1).cast("long").alias("n_chunks"),
    )
