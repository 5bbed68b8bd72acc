"""Unit tests for the pretraining-pipeline additions: PII redaction,
n-gram primitives (frequency mining + decontamination), and
concatenate-and-chunk sequence packing.  Cross-engine exactness is covered
by the entry-contract gates (txt_pii_redact / txt_ngram_freq /
txt_pack_sequences / dd_decontaminate); these tests pin the operator
semantics on planted corpora."""

import pytest

from elipdotter_spark.operators import dedup, text_analysis

pytestmark = pytest.mark.spark


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------------- pii_redact


def test_pii_redact_counts_and_text(spark):
    rows = [
        (0, "mail a.b+c@ex-a.org then ip 192.168.0.1 call 555-123-4567 end"),
        (1, "no pii here just words"),
        (2, "two mails x@y.io and z@w.co plus 1.2.3.4 and 10.0.0.255"),
    ]
    got = {
        r["doc_id"]: r
        for r in text_analysis.pii_redact(_docs(spark, rows)).collect()
    }
    assert got[0]["n_email"] == 1 and got[0]["n_ipv4"] == 1 and got[0]["n_phone"] == 1
    assert (
        got[0]["text_clean"]
        == "mail [EMAIL] then ip [IP] call [PHONE] end"
    )
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_phone"]) == (0, 0, 0)
    assert got[1]["text_clean"] == rows[1][1]
    assert got[2]["n_email"] == 2 and got[2]["n_ipv4"] == 2 and got[2]["n_phone"] == 0


def test_pii_redact_sequential_no_double_count(spark):
    # the email's digits must not read as a phone/IP after redaction, and
    # the phone pattern must not match inside the dotted quad
    rows = [(0, "u555-123-4567x@d555-123-4567.com and 10.20.30.40")]
    r = text_analysis.pii_redact(_docs(spark, rows)).collect()[0]
    assert r["n_email"] == 1
    assert r["n_ipv4"] == 1
    assert r["n_phone"] == 0  # consumed by the email match, then redacted
    assert r["text_clean"] == "[EMAIL] and [IP]"


# ----------------------------------------------------------- token_ngrams


def test_token_ngrams_basic_and_short_doc(spark):
    rows = [(0, "A b-c d"), (1, "one two")]
    got = sorted(
        (r["doc_id"], r["gram"])
        for r in text_analysis.token_ngrams(_docs(spark, rows), 3).collect()
    )
    # alnum tokenizer: [a, b, c, d] -> two trigrams; doc 1 too short -> none
    assert got == [(0, "a b c"), (0, "b c d")]


# ------------------------------------------------------------- ngram_freq


def test_ngram_freq_order_ties_and_cut(spark):
    rows = [
        (0, "x y x y"),  # "x y" x2, "y x" x1
        (1, "a b"),  # "a b" x1
        (2, "x y"),  # "x y" x1
    ]
    got = [
        (r["gram"], r["n_occurrences"], r["n_docs"], r["rank"])
        for r in text_analysis.ngram_freq(_docs(spark, rows), n=2, k=2)
        .orderBy("rank")
        .collect()
    ]
    # top by count, then lexicographic among the count-1 ties; k cuts at 2
    assert got == [("x y", 3, 2, 1), ("a b", 1, 1, 2)]


# --------------------------------------------------------- pack_sequences


def test_pack_sequences_chunk_arithmetic(spark):
    # one bucket (n_buckets=1), budget 5; doc order = doc_id
    rows = [
        (0, "t1 t2 t3"),  # start 0, chunks 0..0
        (1, ""),  # zero tokens -> excluded
        (2, "t1 t2 t3 t4"),  # start 3, tokens 4 -> spans chunk 0 and 1
        (3, "t1"),  # start 7, chunk 1
    ]
    got = {
        r["doc_id"]: r
        for r in text_analysis.pack_sequences(
            _docs(spark, rows), budget=5, n_buckets=1
        ).collect()
    }
    assert set(got) == {0, 2, 3}
    assert (got[0]["start_off"], got[0]["chunk_first"], got[0]["chunk_last"]) == (0, 0, 0)
    assert (got[2]["start_off"], got[2]["chunk_first"], got[2]["chunk_last"]) == (3, 0, 1)
    assert got[2]["n_chunks"] == 2
    assert (got[3]["start_off"], got[3]["chunk_first"], got[3]["n_chunks"]) == (7, 1, 1)


def test_pack_sequences_bucket_isolation(spark):
    # same doc set, 2 buckets: each bucket's offsets restart at 0 and are
    # the cumsum of ITS docs only, in doc_id order
    rows = [(i, "w " * (i + 1)) for i in range(6)]  # doc i has i+1 tokens
    out = text_analysis.pack_sequences(_docs(spark, rows), budget=100, n_buckets=2)
    got = {r["doc_id"]: r for r in out.collect()}
    # bucket 0: docs 0,2,4 (tokens 1,3,5) -> starts 0,1,4
    # bucket 1: docs 1,3,5 (tokens 2,4,6) -> starts 0,2,6
    assert [got[i]["start_off"] for i in (0, 2, 4)] == [0, 1, 4]
    assert [got[i]["start_off"] for i in (1, 3, 5)] == [0, 2, 6]
    assert all(got[i]["bucket"] == i % 2 for i in range(6))


# ---------------------------------------------------------- decontaminate


def test_decontaminate_planted_overlap(spark):
    ev = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog")])
    train = _docs(
        spark,
        [
            # shares the 5-gram "quick brown fox jumps over" (and one more)
            (0, "a quick brown fox jumps over b"),
            # same words, different order -> no shared 5-gram
            (1, "fox quick jumps brown over the lazy a b"),
            # too short for any 5-gram -> clean by construction
            (2, "quick brown fox"),
        ],
    )
    got = {
        r["doc_id"]: (r["matched_ngrams"], r["contaminated"])
        for r in dedup.decontaminate(train, ev, n=5).collect()
    }
    assert got[0][0] >= 1 and got[0][1] is True
    assert got[1] == (0, False)
    assert got[2] == (0, False)


def test_decontaminate_counts_distinct_grams(spark):
    # the train doc repeats the contaminated gram; matched_ngrams counts
    # DISTINCT grams, not occurrences
    ev = _docs(spark, [(9, "p q r s t")])
    train = _docs(spark, [(0, "p q r s t p q r s t")])
    r = dedup.decontaminate(train, ev, n=5).collect()[0]
    # train grams: 6 distinct-position grams, of which "p q r s t" (x2,
    # counted once) plus the 4 wrap-around grams are NOT in eval
    assert r["matched_ngrams"] == 1
    assert r["contaminated"] is True


# ------------------------------------------- streaming + plan-shape audits


@pytest.mark.spark
def test_pii_redact_streams(spark, tmp_path):
    """pii_redact is a stateless projection, so it composes directly into a
    Structured Streaming pipeline (the ingest-time scrub position)."""
    import os

    in_dir = str(tmp_path / "incoming")
    os.makedirs(in_dir)
    _docs(
        spark, [(0, "mail a@b.org now"), (1, "ip 10.0.0.1 here")]
    ).write.parquet(os.path.join(in_dir, "b1"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        in_dir + "/*"
    )
    out = text_analysis.pii_redact(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("pii_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r for r in spark.sql("SELECT * FROM pii_stream").collect()
    }
    assert got[0]["text_clean"] == "mail [EMAIL] now" and got[0]["n_email"] == 1
    assert got[1]["text_clean"] == "ip [IP] here" and got[1]["n_ipv4"] == 1


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.spark
def test_plan_shapes(spark):
    """Pin the physical-plan properties the 100 TB posture relies on:
    ngram_freq's top-k is TakeOrdered (never a global sort), decontaminate
    broadcasts the eval gram set (the corpus never shuffles on the gram key
    for the join), pii_redact is a single stage with no exchange."""
    from pyspark.sql import functions as F

    docs = _docs(spark, [(i, f"w{i} w{i + 1} a b c d e") for i in range(20)])
    nf_plan = _plan(text_analysis.ngram_freq(docs, n=2, k=5))
    assert "TakeOrderedAndProject" in nf_plan
    ev = docs.filter(F.col("doc_id") % 7 == 0)
    tr = docs.filter(F.col("doc_id") % 7 != 0)
    dc_plan = _plan(dedup.decontaminate(tr, ev, n=3))
    # the gram join specifically must be a broadcast — the corpus side must
    # never shuffle on the gram key (the doc_id join back to train is tiny
    # either way and AQE is free to pick its shape)
    assert "BroadcastHashJoin [gram" in dc_plan
    assert "SortMergeJoin [gram" not in dc_plan
    pii_plan = _plan(text_analysis.pii_redact(docs))
    assert "Exchange" not in pii_plan


# ----------------------------------------------------------- gopher_rules


def test_gopher_rules_per_rule_verdicts(spark):
    """Each rule trips on its planted pathology and only there; the prose
    doc passes everything; zero-token docs are excluded."""
    rows = [
        (0, "the elephant and the giraffe have wandered with that herd of animals"),
        (1, "- alpha item here\n- beta item there\n- gamma item everywhere"),
        (2, "one two three...\nfour five six...\nseven eight nine"),
        (3, "# hash # mark # everywhere"),
        (4, "111 222 333 444 zebra"),
        (5, "abcdefghijklmnop qrstuvwxyzabcdefgh"),
        (6, "###"),  # zero alnum tokens -> no row
    ]
    got = {
        r["doc_id"]: r
        for r in text_analysis.gopher_rules(
            _docs(spark, rows), min_tokens=3
        ).collect()
    }
    assert set(got) == {0, 1, 2, 3, 4, 5}
    assert got[0]["passes"] and got[0]["stop_hits"] == 6
    assert got[0]["mean_tok_len"] == 4.75 and got[0]["alpha_frac"] == 1.0
    assert got[1]["bullet_frac"] == 1.0 and not got[1]["r_bullet"]
    assert got[2]["ellipsis_frac"] == 0.666667 and not got[2]["r_ellipsis"]
    assert not got[2]["r_symbol"]  # the '...' runs also count as symbols
    assert got[3]["symbol_ratio"] == 1.0 and not got[3]["r_symbol"]
    assert got[4]["alpha_frac"] == 0.2 and not got[4]["r_alpha"]
    assert not got[5]["r_tok_len"] and got[5]["mean_tok_len"] == 17.0
    for d in (1, 2, 3, 4, 5):
        assert not got[d]["passes"]


def test_gopher_rules_boundaries_and_custom_stopwords(spark):
    """Verdicts compare the ROUNDED signals (boundary docs land exactly on
    the threshold), token bounds are inclusive, and the stopword list is
    swappable for non-English/synthetic corpora."""
    rows = [
        (0, "aaa bbb ccc"),          # mean_tok_len exactly 3.0 -> passes
        (1, "aa bb cc"),             # 2.0 -> fails
        (2, "zebra wombat numbat"),  # custom stopwords: 2 hits
    ]
    got = {
        r["doc_id"]: r
        for r in text_analysis.gopher_rules(
            _docs(spark, rows),
            min_tokens=3,
            max_tokens=3,
            stop_words=["zebra", "wombat", "aaa", "bbb"],
        ).collect()
    }
    assert got[0]["r_tok_len"] and got[0]["r_tokens"]
    assert not got[1]["r_tok_len"]
    assert got[2]["stop_hits"] == 2 and got[2]["r_stop"]
    assert got[0]["stop_hits"] == 2 and not got[1]["r_stop"]


def test_gopher_rules_plan_is_single_stage(spark):
    """One whole-stage-codegen projection, no shuffle — same posture as
    pii_redact."""
    docs = _docs(spark, [(i, "the words and more of that text") for i in range(5)])
    assert "Exchange" not in _plan(text_analysis.gopher_rules(docs))


# -------------------------------------------------------------- dup_spans


def test_dup_spans_cross_doc_runs(spark):
    """Consecutive duplicated grams coalesce into one maximal span whose
    token range is exactly the shared substring; within-doc-only repetition
    marks nothing; disjoint duplicated passages yield separate spans."""
    rows = [
        (0, "a b c d e f"),          # shares "a b c d" with doc 1
        (1, "x a b c d y"),
        (2, "q r s t u v"),          # unique — no spans
        (3, "m n o m n o m n o"),    # repeats only WITHIN itself — no spans
        (4, "a b c z1 z2 z3 b c d"),  # two disjoint duplicated passages
    ]
    got = {
        (r["doc_id"], r["span_start"]): (r["span_end"], r["n_grams"])
        for r in dedup.dup_spans(_docs(spark, rows), n=3, min_docs=2).collect()
    }
    assert got == {
        (0, 0): (3, 2),  # tokens 0..3 = "a b c d"
        (1, 1): (4, 2),  # tokens 1..4 = "a b c d"
        (4, 0): (2, 1),  # "a b c"
        (4, 6): (8, 1),  # "b c d"
    }


def test_excise_spans_removes_passages_keeps_pages(spark):
    """Composing dup_spans -> excise_spans removes exactly the shared
    passages' tokens (order preserved), leaves clean docs intact, and
    keeps fully-duplicated docs as empty survivors."""
    rows = [
        (0, "a b c d e f"),
        (1, "x a b c d y"),
        (2, "q r s t u v"),
        (4, "a b c z1 z2 z3 b c d"),
    ]
    docs = _docs(spark, rows)
    spans = dedup.dup_spans(docs, n=3, min_docs=2)
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_clean"])
        for r in dedup.excise_spans(docs, spans).collect()
    }
    assert got == {
        0: (6, 4, "e f"),
        1: (6, 4, "x y"),
        2: (6, 0, "q r s t u v"),
        4: (9, 6, "z1 z2 z3"),
    }


def test_excise_spans_overlaps_and_full_coverage(spark):
    """Overlapping spans are coverage-deduplicated; a fully-covered doc
    survives with empty text; zero-token docs produce no row."""
    docs = _docs(spark, [(0, "a b c d e f"), (1, "w x"), (2, "...")])
    spans = spark.createDataFrame(
        [(0, 0, 3), (0, 2, 4), (1, 0, 1)],
        "doc_id long, span_start long, span_end long",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_clean"])
        for r in dedup.excise_spans(docs, spans).collect()
    }
    assert got == {0: (6, 5, "f"), 1: (2, 2, "")}


def test_dup_spans_plan_shape(spark):
    """The islands window sorts per doc (hash partitioning on doc_id),
    never globally — no range partitioning anywhere in the plan."""
    docs = _docs(spark, [(i, "a b c d e") for i in range(10)])
    plan = _plan(dedup.dup_spans(docs, n=3))
    assert "Window" in plan and "hashpartitioning(doc_id" in plan
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


# ------------------------------------------------------- preprocess_corpus


@pytest.mark.slow
def test_preprocess_corpus_equals_staged(spark):
    """The front-door composition is bit-identical to applying the gated
    stages one at a time (line_dedup -> pii_redact -> clean_corpus), and
    its stats expose every stage's counters."""
    from pyspark.sql import functions as F

    base = "the quick brown fox jumps over the lazy dog wonders again"
    rows = [
        (i, f"intro {i} of the day\nsite footer line\n{base} variant {i}")
        for i in range(6)
    ]
    rows += [
        (10, "the a of and unique content alpha beta gamma delta"),
        (11, "the a of and unique content alpha beta gamma delta"),  # exact dup
        (12, "contact me at x@y.org the a of and more words here"),
    ]
    docs = _docs(spark, rows)
    kw = dict(min_tokens=5, min_stopword_ratio=0.0, jaccard=0.8)

    staged = docs
    ld = text_analysis.line_dedup(staged, max_docs=3)
    staged = staged.drop("text").join(
        ld.select("doc_id", F.col("text_clean").alias("text")), "doc_id"
    )
    red = text_analysis.pii_redact(staged)
    staged = staged.drop("text").join(
        red.select("doc_id", F.col("text_clean").alias("text")), "doc_id"
    )
    want = sorted(tuple(r) for r in dedup.clean_corpus(staged, **kw).collect())

    stats = {}
    got_df = dedup.preprocess_corpus(
        docs, line_max_docs=3, pii=True, stats=stats, **kw
    )
    got = sorted(tuple(r) for r in got_df.collect())
    assert got == want
    # stage counters: the 6-doc footer line dropped everywhere, 1 email
    assert stats["n_lines"] == 6 * 3 + 3
    assert stats["n_lines"] - stats["n_lines_kept"] == 6
    assert stats["pii_redactions"] == {"n_email": 1, "n_ipv4": 0, "n_phone": 0}
    assert stats["after_near_dedup"] == len(got)
    # the survivors' text is actually scrubbed and footer-free
    texts = {r[1] for r in got}
    assert all("site footer line" not in t and "x@y.org" not in t for t in texts)
    assert any("[EMAIL]" in t for t in texts)


# ------------------------------------------------- randomized property tests


def _py_tokens(text):
    import re as _re

    return _re.findall(r"[a-z0-9]+", text.lower())


def _py_grams(text, n):
    t = _py_tokens(text)
    return [" ".join(t[i : i + n]) for i in range(len(t) - n + 1)]


@pytest.mark.slow
def test_decontaminate_matches_python_reference_randomized(spark):
    """30 seeded random corpora vs a brute-force Python n-gram overlap."""
    import random

    vocab = [f"w{i}" for i in range(12)]
    for seed in range(30):
        rng = random.Random(seed)
        n = rng.choice([2, 3, 5])
        mk = lambda: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 14)))
        train_rows = [(i, mk()) for i in range(12)]
        eval_rows = [(100 + i, mk()) for i in range(3)]
        eval_grams = {g for _, t in eval_rows for g in _py_grams(t, n)}
        want = {
            i: len(set(_py_grams(t, n)) & eval_grams) for i, t in train_rows
        }
        got = {
            r["doc_id"]: r["matched_ngrams"]
            for r in dedup.decontaminate(
                _docs(spark, train_rows), _docs(spark, eval_rows), n=n
            ).collect()
        }
        assert got == want, f"seed {seed} n {n}"


@pytest.mark.slow
def test_pack_sequences_matches_python_reference_randomized(spark):
    """20 seeded random corpora vs a Python concatenate-and-chunk model."""
    import random

    for seed in range(20):
        rng = random.Random(1000 + seed)
        budget = rng.choice([3, 7, 16])
        n_buckets = rng.choice([1, 2, 4])
        rows = [
            (i, " ".join("tok" for _ in range(rng.randint(0, 9))))
            for i in range(rng.randint(1, 25))
        ]
        # python model
        want = {}
        for b in range(n_buckets):
            off = 0
            for i, t in rows:
                if i % n_buckets != b:
                    continue
                nt = len(_py_tokens(t))
                if nt == 0:
                    continue
                want[i] = (b, nt, off, off // budget, (off + nt - 1) // budget)
                off += nt
        got = {
            r["doc_id"]: (
                r["bucket"],
                r["n_tokens"],
                r["start_off"],
                r["chunk_first"],
                r["chunk_last"],
            )
            for r in text_analysis.pack_sequences(
                _docs(spark, rows), budget=budget, n_buckets=n_buckets
            ).collect()
        }
        assert got == want, f"seed {seed} budget {budget} buckets {n_buckets}"


@pytest.mark.slow
def test_pii_redact_matches_python_reference_randomized(spark):
    """25 seeded random texts with planted PII vs Python re (the three
    patterns use only syntax with identical Java/RE2/Python semantics)."""
    import random
    import re as _re

    frags = [
        "plain words here",
        "user{j}@host{j}.example.org",
        "10.{j}.0.{k}",
        "555-12{j}-456{k}",
        "almost 999.999 and half@nope and 12-34-56",
        "x{j}y",
    ]
    for seed in range(25):
        rng = random.Random(2000 + seed)
        text = " ".join(
            rng.choice(frags).format(j=rng.randint(0, 25), k=rng.randint(0, 9))
            for _ in range(rng.randint(1, 12))
        )
        cur = text
        want_counts = []
        for _name, pat, tok in text_analysis.PII_PATTERNS:
            want_counts.append(len(_re.findall(pat, cur)))
            cur = _re.sub(pat, lambda _m, t=tok: t, cur)
        r = text_analysis.pii_redact(_docs(spark, [(0, text)])).collect()[0]
        assert r["text_clean"] == cur, f"seed {seed}: {text!r}"
        assert [r["n_email"], r["n_ipv4"], r["n_phone"]] == want_counts, (
            f"seed {seed}: {text!r}"
        )
