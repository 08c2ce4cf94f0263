"""Analysis-chain golden tests (StandardTokenizer/StandardAnalyzer behavior,
StandardTokenizerImpl.jflex:125-163, StopAnalyzer.java:42-48)."""

from lucene_solr_spark.analysis.tokenizer import (
    ENGLISH_STOP_WORDS,
    analyze,
    analyze_to_counts,
    tokenize,
)


def test_stopword_count():
    assert len(ENGLISH_STOP_WORDS) == 33


def test_basic_words():
    assert analyze("Hello World") == ["hello", "world"]


def test_stop_words_removed_and_not_counted():
    toks, flen = analyze_to_counts("the quick brown fox is in the barn")
    assert "the" not in toks and "is" not in toks and "in" not in toks
    assert flen == 4  # quick brown fox barn


def test_underscore_joins():
    # '_' is ExtendNumLet: snake_case stays one token (WB13a/b)
    assert analyze("snake_case camelCase") == ["snake_case", "camelcase"]


def test_mid_dot_joins_letters_and_numbers():
    # MidNumLet '.' joins when alnum on both sides (WB6/7, WB11/12)
    assert analyze("example.com v1.2.3") == ["example.com", "v1.2.3"]
    assert analyze("end.") == ["end"]  # trailing dot does not join


def test_apostrophe():
    assert analyze("don't stop") == ["don't", "stop"]


def test_comma_joins_digits_only():
    assert tokenize("1,000 a,b") == ["1,000", "a", "b"]


def test_max_token_length_splits():
    """maxTokenLength: the reference's jflex scanner buffer is SIZED to
    255, so a longer run SPLITS into 255-char-window grammar matches —
    never dropped (pinned vs the compiled StandardAnalyzer, GT round 30:
    'z'*256 emits 'z'*255 + 'z' at consecutive positions)."""
    long_tok = "x" * 256
    ok_tok = "y" * 255
    toks, flen = analyze_to_counts(f"{long_tok} hello {ok_tok}")
    assert long_tok not in toks
    assert toks.get("x" * 255) == 1 and toks.get("x") == 1
    assert ok_tok in toks
    assert flen == 4  # both split chunks count toward field length


def test_empty_and_punct_only():
    assert analyze("") == []
    assert analyze("!!! --- ...") == []
    assert analyze("___") == []  # joiner-only run is not a token


def test_case_folding_dotted_i():
    # Java Character.toLowerCase(U+0130) == 'i' (single codepoint)
    assert analyze("İstanbul") == ["istanbul"]


def test_counts():
    counts, flen = analyze_to_counts("foo bar foo the foo")
    assert counts == {"foo": 3, "bar": 1}
    assert flen == 4
