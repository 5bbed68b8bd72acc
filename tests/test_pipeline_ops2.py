"""Unit tests for the second pretraining-pipeline batch: the C4 cleaning
battery, tf-idf keyword extraction, the unigram-LM quality proxy,
token-budget mixture sampling, and int8 embedding quantization.
Cross-engine exactness is covered by the entry-contract gates
(txt_c4_rules / txt_tfidf_topk / txt_lm_score / txt_sample_budget /
ann_quantize); these pin the operator semantics on planted inputs."""

import math

import pytest

from elipdotter_spark.operators import ann, text_analysis

pytestmark = pytest.mark.spark


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- c4_rules


def test_c4_rules_line_verdicts(spark):
    # one page, one line per rule: kept prose / too short / no terminal
    # punctuation / javascript / lorem (line-kept but page-poisoning) /
    # brace (ditto)
    text = "\n".join(
        [
            "this prose line has enough words .",
            "too short .",
            "five words but no punctuation here",
            "please enable JavaScript to view this .",
        ]
    )
    r = text_analysis.c4_rules(_docs(spark, [(0, text)])).collect()[0]
    assert r["n_lines"] == 4 and r["n_kept"] == 1
    assert not r["has_lorem"] and not r["has_brace"]
    assert not r["keep_doc"]  # n_kept < 3
    assert r["text_clean"] == "this prose line has enough words ."


def test_c4_rules_page_poison_and_order(spark):
    good = [f"good line number {i} keeps itself alive ." for i in range(4)]
    rows = [
        (0, "\n".join(good)),
        (1, "\n".join(good + ["contains Lorem Ipsum dolor sit amet ."])),
        (2, "\n".join(good + ["code { block } with enough words here ."])),
    ]
    got = {r["doc_id"]: r for r in text_analysis.c4_rules(_docs(spark, rows)).collect()}
    assert got[0]["keep_doc"] and not got[0]["has_lorem"] and not got[0]["has_brace"]
    assert got[1]["has_lorem"] and not got[1]["keep_doc"]
    assert got[2]["has_brace"] and not got[2]["keep_doc"]
    # the poison line itself passes the LINE rules (page/line independence)
    assert got[2]["n_kept"] == 5
    # surviving lines keep original order
    assert got[0]["text_clean"] == "\n".join(good)


def test_c4_rules_terminal_punct_variants(spark):
    rows = [
        (0, 'she said the magic word aloud "'),
        (1, "is this a question with words ?"),
        (2, "what an exciting exclamation it is !"),
        (3, "a trailing comma never counts here ,"),
    ]
    got = {r["doc_id"]: r["n_kept"] for r in text_analysis.c4_rules(_docs(spark, rows)).collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 0}


# -------------------------------------------------------------- tfidf_topk


def test_tfidf_topk_scores_and_ties(spark):
    rows = [
        (0, "apple apple banana"),
        (1, "apple cherry"),
        (2, "durian durian durian"),
    ]
    got = {
        (r["doc_id"], r["rank"]): r
        for r in text_analysis.tfidf_topk(_docs(spark, rows), k=2).collect()
    }
    n = 3

    def score(tf, df):
        return round(tf * (math.log((n + 1.0) / (df + 1.0)) + 1.0), 6)

    # doc 0: apple tf=2 df=2, banana tf=1 df=1
    assert got[(0, 1)]["term"] == "apple"
    assert got[(0, 1)]["tfidf"] == score(2, 2)
    assert got[(0, 2)]["term"] == "banana"
    assert got[(0, 2)]["tfidf"] == score(1, 1)
    # doc 1: cherry (df=1) outscores apple (df=2) at equal tf
    assert got[(1, 1)]["term"] == "cherry" and got[(1, 2)]["term"] == "apple"
    # doc 2 has a single term: rank 2 absent
    assert (2, 2) not in got and got[(2, 1)]["term"] == "durian"


def test_tfidf_topk_lexicographic_tie_break(spark):
    # zed and ant: identical tf and df -> identical score -> term asc
    rows = [(0, "zed ant"), (1, "zed ant")]
    got = [
        r["term"]
        for r in text_analysis.tfidf_topk(_docs(spark, rows), k=2)
        .filter("doc_id = 0")
        .orderBy("rank")
        .collect()
    ]
    assert got == ["ant", "zed"]


# -------------------------------------------------------- unigram_logprob


def test_unigram_logprob_matches_hand_model(spark):
    rows = [(0, "a a b"), (1, "b c")]
    # corpus: a=2, b=2, c=1, total=5
    got = {
        r["doc_id"]: r for r in text_analysis.unigram_logprob(_docs(spark, rows)).collect()
    }
    lp = {"a": math.log(2 / 5), "b": math.log(2 / 5), "c": math.log(1 / 5)}
    want0 = round(-(lp["a"] + lp["a"] + lp["b"]) / 3, 6)
    want1 = round(-(lp["b"] + lp["c"]) / 2, 6)
    assert got[0]["n_tokens"] == 3 and abs(got[0]["nll"] - want0) < 1e-9
    assert got[1]["n_tokens"] == 2 and abs(got[1]["nll"] - want1) < 1e-9
    # rare-token doc scores strictly higher (the quality signal's direction)
    assert got[1]["nll"] > got[0]["nll"]


# -------------------------------------------------------- sample_to_budget


def _sdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_sample_to_budget_greedy_fill(spark):
    # src A: 4 docs x 3 tokens in known deterministic key order; budget 7
    # -> first two kept (cum 0, 3), third crosses at cum 6 (kept: 6 < 7),
    # fourth starts at 9 >= 7 -> dropped
    rows = [(i, "A", "tok tok tok") for i in range(4)]
    out = text_analysis.sample_to_budget(_sdocs(spark, rows), {"A": 7})
    got = {r["doc_id"]: r for r in out.collect()}
    order = sorted(
        range(4), key=lambda d: ((d % 1000003) * 2654435761 % 10000, d)
    )
    cums = {d: 3 * i for i, d in enumerate(order)}
    for d, r in got.items():
        assert r["cum_before"] == cums[d]
        assert r["kept"] == (cums[d] < 7)
    assert sum(r["kept"] for r in got.values()) == 3


def test_sample_to_budget_source_isolation_and_default(spark):
    rows = [
        (0, "A", "one two three"),
        (1, "B", "one two three"),
        (2, "C", "one two three"),
    ]
    out = {
        r["doc_id"]: r
        for r in text_analysis.sample_to_budget(
            _sdocs(spark, rows), {"A": 100, "B": 0}, default_budget=2
        ).collect()
    }
    assert out[0]["kept"] is True  # A: under budget
    assert out[1]["kept"] is False  # B: zero budget
    assert out[2]["kept"] is True  # C: default 2 > cum_before 0 (greedy overflow)
    assert all(r["cum_before"] == 0 for r in out.values())  # sources isolated


def test_sample_to_budget_excludes_empty_docs(spark):
    rows = [(0, "A", ""), (1, "A", "word")]
    out = text_analysis.sample_to_budget(_sdocs(spark, rows), {"A": 10}).collect()
    assert [r["doc_id"] for r in out] == [1]


# ----------------------------------------------------------- quantize_int8


def test_quantize_int8_roundtrip_and_zero_vector(spark):
    import numpy as np

    rows = [
        (0, [1.0, -2.0, 0.5]),
        (1, [0.0, 0.0, 0.0]),
        (2, [127.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r for r in ann.quantize_int8(emb).collect()}
    # vec 0: scale = 2/127; q = floor(x/scale + .5)
    scale0 = 2.0 / 127.0
    q0 = [math.floor(x / scale0 + 0.5) for x in [1.0, -2.0, 0.5]]
    assert got[0]["dim"] == 3
    assert got[0]["scale"] == round(scale0, 9)
    assert got[0]["q_sum"] == sum(q0)
    assert got[0]["q_abs_sum"] == sum(abs(q) for q in q0)
    want_err = max(abs(q * scale0 - x) for q, x in zip(q0, [1.0, -2.0, 0.5]))
    assert abs(got[0]["max_err"] - want_err) < 1e-9
    # reconstruction error bounded by half a quantization step
    assert got[0]["max_err"] <= scale0 / 2 + 1e-9  # 9-digit rounding slack
    # zero vector: scale 0, all-zero codes, no NaN
    assert got[1]["scale"] == 0.0 and got[1]["q_sum"] == 0
    assert got[1]["q_abs_sum"] == 0 and got[1]["max_err"] == 0.0
    # max-magnitude element quantizes to exactly +-127
    assert got[2]["q_abs_sum"] == 127 and got[2]["max_err"] == 0.0


def test_quantize_int8_codes_within_int8_range(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-5, 5) for _ in range(16)]) for i in range(50)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    for r in ann.quantize_int8(emb).collect():
        # |q| <= 127 implies q_abs_sum <= 127*dim
        assert r["q_abs_sum"] <= 127 * r["dim"]
        assert r["max_err"] <= r["scale"] / 2 + 1e-9


# -------------------------------------------------------------- plan shapes


def test_new_ops_plan_shapes(spark):
    docs = _docs(spark, [(0, "a b c d e .")])
    # c4_rules: one aggregate over one generate, no join
    plan = text_analysis.c4_rules(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Generate" in plan
    sdocs = _sdocs(spark, [(0, "A", "x y")])
    # sample_to_budget: single window, no join
    plan = (
        text_analysis.sample_to_budget(sdocs, {"A": 5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan and "Join" not in plan
    # quantize: pure projection — no shuffle at all
    emb = spark.createDataFrame([(0, [1.0])], "vec_id long, embedding array<float>")
    plan = ann.quantize_int8(emb)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan


def test_quantize_codes_dequantize_search(spark):
    import random

    from pyspark.sql import functions as F

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(100)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    codes = ann.quantize_codes(emb)
    # codes are genuine int8: every value within [-127, 127]
    mx = codes.select(
        F.max(F.array_max(F.transform("qvec", lambda q: F.abs(q)))).alias("m")
    ).first()["m"]
    assert mx <= 127
    # dequantize reconstruction error per vector == the audit's max_err
    deq = ann.dequantize(codes)
    joined = (
        emb.alias("a")
        .join(deq.alias("b"), "vec_id")
        .select(
            "vec_id",
            F.aggregate(
                F.zip_with(
                    F.col("a.embedding"),
                    F.col("b.embedding"),
                    lambda x, y: F.abs(x.cast("double") - y),
                ),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, x),
            ).alias("err"),
        )
    )
    audit = {r["vec_id"]: r["max_err"] for r in ann.quantize_int8(emb).collect()}
    for r in joined.collect():
        assert abs(r["err"] - audit[r["vec_id"]]) < 1e-8
    # quantized search: top-10 through the UNCHANGED brute-force path on
    # the dequantized table recalls >= 9/10 of the exact neighbors
    qvec = rows[0][1]
    exact = {r["vec_id"] for r in ann.topk_bruteforce(emb, qvec, 10).collect()}
    approx = {r["vec_id"] for r in ann.topk_bruteforce(deq, qvec, 10).collect()}
    assert len(exact & approx) >= 9


def test_preprocess_corpus_c4_stage_equals_staged(spark):
    from elipdotter_spark.operators import dedup

    good = "the fine line of words .\nthe good page of text .\nthe last bit of prose ."
    good2 = "the other page of words .\nthe second body of text .\nthe final run of prose ."
    rows = [
        (0, good),
        (1, good + "\nlorem ipsum dolor sit amet now ."),  # page poisoned
        (2, good2 + "\nplease enable javascript to view it ."),  # line filtered
        (3, "short .\nno punct line here at all"),  # too few kept lines
    ]
    docs = _docs(spark, rows)
    kwargs = dict(
        lang="en", min_tokens=3, min_stopword_ratio=0.0, jaccard=0.8,
        max_ring=None,
    )
    stats = {}
    got = sorted(
        (r["doc_id"], r["text"])
        for r in dedup.preprocess_corpus(docs, c4=True, stats=stats, **kwargs)
        .select("doc_id", "text")
        .collect()
    )
    # staged: apply c4_rules by hand, then clean_corpus
    rules = text_analysis.c4_rules(docs)
    from pyspark.sql import functions as F

    staged_in = docs.drop("text").join(
        rules.filter(F.col("keep_doc")).select(
            "doc_id", F.col("text_clean").alias("text")
        ),
        "doc_id",
    )
    want = sorted(
        (r["doc_id"], r["text"])
        for r in dedup.clean_corpus(staged_in, **kwargs)
        .select("doc_id", "text")
        .collect()
    )
    assert got == want
    assert stats["c4_docs_in"] == 4 and stats["c4_docs_kept"] == 2
    # doc 2 survived WITH the javascript line excised
    texts = dict(got)
    assert 2 in texts and "javascript" not in texts[2]
    assert 1 not in texts and 3 not in texts


def test_c4_rules_matches_python_reference_randomized(spark):
    import random

    rng = random.Random(42)
    pieces = [
        "the quick scan reads row {} .",
        "short {} .",
        "no punctuation line number {}",
        "please enable javascript to view {} .",
        "lorem ipsum dolor sit amet {} .",
        "config {{ key {} }} .",
        "is this a question number {} ?",
        'quoted words make five tokens {} "',
        "",
    ]
    rows = []
    for d in range(120):
        n_lines = rng.randint(1, 8)
        text = "\n".join(
            pieces[rng.randrange(len(pieces))].format(rng.randrange(1000))
            for _ in range(n_lines)
        )
        rows.append((d, text))

    def ref(text):
        import re

        lines = text.split("\n")
        keeps = [
            bool(re.search(r'[.!?"]$', l))
            and len(l.split(" ")) >= 5
            and "javascript" not in l.lower()
            for l in lines
        ]
        lorem = "lorem ipsum" in text.lower()
        brace = "{" in text
        n_kept = sum(keeps)
        return {
            "n_lines": len(lines),
            "n_kept": n_kept,
            "has_lorem": lorem,
            "has_brace": brace,
            "keep_doc": n_kept >= 3 and not lorem and not brace,
            "text_clean": "\n".join(l for l, k in zip(lines, keeps) if k),
        }

    got = {r["doc_id"]: r for r in text_analysis.c4_rules(_docs(spark, rows)).collect()}
    assert len(got) == len(rows)
    for d, text in rows:
        want = ref(text)
        for k, v in want.items():
            assert got[d][k] == v, (d, k, got[d][k], v, text)


def test_sample_to_budget_matches_python_reference_randomized(spark):
    import random

    rng = random.Random(7)
    rows = []
    for d in range(200):
        src = f"s{rng.randrange(5)}"
        n = rng.randint(0, 12)
        rows.append((d, src, " ".join(f"t{i}" for i in range(n))))
    budgets = {"s0": 50, "s1": 0, "s2": 10}
    default = 25

    def key(d):
        return ((d % 1000003) * 2654435761 % 10000, d)

    # python reference: greedy per-source fill in key order
    want = {}
    per_src = {}
    for d, src, text in rows:
        n = len([t for t in text.split() if t])
        if n > 0:
            per_src.setdefault(src, []).append((key(d), d, n))
    for src, docs_ in per_src.items():
        docs_.sort()
        cum = 0
        b = budgets.get(src, default)
        for _, d, n in docs_:
            want[d] = (src, n, cum, cum < b)
            cum += n

    out = text_analysis.sample_to_budget(
        _sdocs(spark, rows), budgets, default_budget=default
    )
    got = {
        r["doc_id"]: (r["source"], r["n_tokens"], r["cum_before"], r["kept"])
        for r in out.collect()
    }
    assert got == want
