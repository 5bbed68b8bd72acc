"""Line-granular cross-document dedup semantics (operators/text_analysis.py
line_stats / line_dedup): order preservation, emptied-doc retention,
within-doc duplicates, empty-text participation, and gate-corpus shape."""

import pytest

from elipdotter_spark import entry
from elipdotter_spark.operators import text_analysis


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # footer appears in 3 docs -> dropped at max_docs=2
        (0, "alpha prose\nfooter line\nbeta prose"),
        (1, "footer line\ngamma prose"),
        (2, "footer line"),  # every line dropped -> kept, text_clean = ''
        # within-doc duplicate of a rare line: both copies survive
        (3, "delta prose\ndelta prose\nepsilon"),
        (4, ""),  # empty doc == one empty line (unique here -> kept)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.spark
def test_line_stats(docs):
    got = {r["line"]: (r["line_docs"], r["line_occurrences"])
           for r in text_analysis.line_stats(docs).collect()}
    assert got["footer line"] == (3, 3)
    assert got["delta prose"] == (1, 2)  # one doc, two occurrences
    assert got[""] == (1, 1)
    assert got["alpha prose"] == (1, 1)


@pytest.mark.spark
def test_line_dedup_semantics(docs):
    out = {r["doc_id"]: r for r in
           text_analysis.line_dedup(docs, max_docs=2).collect()}
    assert len(out) == 5  # emptied docs are KEPT
    assert out[0]["text_clean"] == "alpha prose\nbeta prose"  # order preserved
    assert (out[0]["n_lines"], out[0]["n_kept"]) == (3, 2)
    assert out[1]["text_clean"] == "gamma prose"
    assert out[2]["text_clean"] == "" and out[2]["n_kept"] == 0
    # within-doc duplicates: line_docs counts DISTINCT docs, so both survive
    assert out[3]["text_clean"] == "delta prose\ndelta prose\nepsilon"
    assert out[4]["text_clean"] == "" and out[4]["n_kept"] == 1


@pytest.mark.spark
def test_line_dedup_threshold_inclusive(docs):
    # max_docs=3: the 3-doc footer is exactly AT the threshold -> kept
    out = {r["doc_id"]: r["text_clean"] for r in
           text_analysis.line_dedup(docs, max_docs=3).collect()}
    assert out[2] == "footer line"


@pytest.mark.spark
def test_gate_corpus_exercises_both_sides(spark):
    """The arithmetic gate corpus must make the threshold bite in both
    directions (some mid lines kept, some dropped, nav always dropped)."""
    stats = text_analysis.line_stats(entry._lines_docs(spark)).collect()
    nav = [r for r in stats if r["line"].startswith("nav ")]
    mid = [r for r in stats if r["line"].startswith("mid ")]
    body = [r for r in stats if r["line"].startswith("body ")]
    assert nav and all(r["line_docs"] > 4 for r in nav)
    assert any(r["line_docs"] > 4 for r in mid)
    assert any(r["line_docs"] <= 4 for r in mid)
    assert body and all(r["line_docs"] == 1 for r in body)
