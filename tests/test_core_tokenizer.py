"""Tokenizer goldens (FIXTURES.md §5; /root/reference/src/index.rs:489-576)."""

from elipdotter_spark.core.normalize import normalize
from elipdotter_spark.core.tokenize import raw_scan, tokenize

from fixtures import DOC1, DOC2


def positions_of(text, term):
    return [p for t, p in tokenize(text) if t == term]


def test_alphanumeral_eq():
    # src/index.rs:1283-1291
    assert normalize("test-is good!") == normalize("TESTIsGood")
    assert normalize("test-is good!") < normalize("TestIsGood1")
    assert normalize("test-is good!") > normalize("TestIsGooc")
    assert normalize("test-is good!") < normalize("TestIsGooe")


def test_lorem_positions():
    # src/index.rs:1293-1357: lorem @ 0 and 875 in doc1, @ 0 in doc2
    assert positions_of(DOC1, "lorem") == [0, 875]
    assert positions_of(DOC2, "lorem") == [0]
    # tests/lib.rs:104,110
    assert positions_of(DOC1, "volutpat") == [399]
    assert positions_of(DOC2, "volutpat") == [348]


def test_hyphen_compound():
    toks = tokenize("next-gen rocks")
    # next@0, compound nextgen@0, gen@5
    assert ("next", 0) in toks
    assert ("nextgen", 0) in toks
    assert ("gen", 5) in toks


def test_hyphen_compound_em_en_dash():
    for dash in ("-", "—", "–"):
        toks = tokenize(f"next{dash}gen ")
        assert ("nextgen", 0) in toks, dash


def test_final_token_quirk():
    # trailing token with no following delimiter: pos == len(text) in bytes
    toks = tokenize("hello world")
    assert toks == [("hello", 0), ("world", 11)]
    toks = tokenize("hello world ")
    assert toks == [("hello", 0), ("world", 6)]


def test_multi_hyphen_chain():
    # "a-b-c " -> a@0, a-b@0, b@2, b-c@2, c@4 (pairwise compounds)
    toks = tokenize("a-b-c ")
    assert toks == [("a", 0), ("ab", 0), ("b", 2), ("bc", 2), ("c", 4)]
    # no compound for an EOS-terminated final segment
    toks = tokenize("a-b-c")
    assert toks == [("a", 0), ("ab", 0), ("b", 2), ("c", 5)]


def test_hyphen_then_space():
    # "next- gen": compound span ends at the delimiter after the hyphen segment
    toks = tokenize("next- gen ")
    assert toks == [("next", 0), ("next", 0), ("gen", 6)]


def test_byte_offsets_non_ascii():
    # "vår kära" — å/ä are 2 bytes in UTF-8
    toks = tokenize("vår kära x")
    assert toks[0] == ("vår", 0)
    assert toks[1] == ("kära", 5)  # "vår " = 5 bytes
    assert toks[2] == ("x", 12)  # final-token quirk: pos = total byte length


def test_raw_scan_includes_empties():
    raw = raw_scan("a  b!")
    words = [w for w, _ in raw]
    assert "" in words
    assert ("a", 0) in raw and ("b", 3) in raw


def test_emoji_not_alnum():
    toks = tokenize("Ganska klimatsmart 🏆")
    assert [t for t, _ in toks] == ["ganska", "klimatsmart"]


def test_unicode_lowercase_parity():
    # per-char lowercase (Rust char::to_lowercase): no contextual sigma
    assert normalize("ΣΑΣ") == "σασ"
    # 1->n expansions
    assert normalize("İ") == "i̇"
    assert normalize("ẞ") == "ß"
