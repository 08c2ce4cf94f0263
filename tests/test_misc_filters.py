"""GT round 55 — the miscellaneous filter pack pinned bit-for-bit
against the COMPILED reference filters (tools/lucene_ground_truth.py
run_misc): Trim, Length, Truncate(+KeywordMarker), Capitalization,
KeepWord, HyphenatedWords, Fingerprint, CodepointCount, DecimalDigit,
ScandinavianNormalization/Folding, LimitTokenCount/Offset/Position,
UpperCase, Apostrophe.

Every comparison is on the full (term, posInc, startOffset, endOffset)
stream over fuzzed text that deliberately includes the hard characters:
NBSP (Java-non-whitespace), U+2028/U+001C (Java-whitespace), astral
emoji (surrogate pairs), ß/İ/ı (case-mapping quirks), Arabic-Indic and
astral Osmanya digits, and >255-unit runs (CharTokenizer split).
"""

from __future__ import annotations

import random

import pytest

from lucene_solr_spark.analysis.misc_filters import (
    apostrophe_filter,
    capitalization_filter,
    codepoint_count_filter,
    decimal_digit_filter,
    fingerprint_filter,
    hyphenated_words_filter,
    keep_word_filter,
    keyword_token,
    length_filter,
    limit_token_count_filter,
    limit_token_offset_filter,
    limit_token_position_filter,
    scandinavian_folding_filter,
    scandinavian_normalization_filter,
    trim_filter,
    truncate_filter,
    u16_len,
    upper_case_filter,
    whitespace_tokens,
)

gt = pytest.importorskip("tools.lucene_ground_truth")

HAVE_GT = gt.build()
pytestmark = pytest.mark.skipif(
    not HAVE_GT, reason="javac / reference lucene-core unavailable"
)

# fuzz alphabet: plain words, hyphens, case quirks, astral, digits,
# java-whitespace-vs-python-whitespace edge chars
WORDS = [
    "merge", "sort", "MERGE", "Sort.it", "a", "ab", "ÅngStröm", "straße",
    "ıİiI", "x-", "-", "one-", "two", "O'neil", "don’t", "can't've",
    "aa", "ae", "oe", "AaEoO", "ÄÖØ", "æøå", "x😀y", "😀", "١٢٣",
    "\U000104A0\U000104A9", "a1.2b", "z" * 260, "a" * 255 + "b" * 10,
    "Σίσυφος", "ΣΑΣ",
]
SPACES = [" ", "  ", "\t", " ", " ", "", "　", "\n"]


def _fuzz_lines(seed: int, n: int, k: int = 8) -> list[str]:
    rng = random.Random(seed)
    lines = []
    for _ in range(n):
        parts = []
        for _ in range(rng.randint(0, k)):
            parts.append(rng.choice(WORDS))
            parts.append(rng.choice(SPACES))
        lines.append("".join(parts))
    lines += ["", " ", " ", "one- two- three four-", "x- -y", "-"]
    return lines


def _wire(term: str) -> str:
    """Java getBytes("UTF-16BE") replaces UNPAIRED surrogates with
    U+FFFD on the harness wire; the in-memory char[] keeps them (a
    truncate can split a pair). Normalize ours the same way."""
    out = []
    units = list(term)
    i = 0
    while i < len(units):
        c = units[i]
        if 0xD800 <= ord(c) <= 0xDBFF:
            if i + 1 < len(units) and 0xDC00 <= ord(units[i + 1]) <= 0xDFFF:
                out.append(c)
                out.append(units[i + 1])
                i += 2
                continue
            out.append("�")
        elif 0xDC00 <= ord(c) <= 0xDFFF:
            out.append("�")
        else:
            out.append(c)
        i += 1
    return "".join(out)


def _check(mode_lines, exp, got_fn, ctx=""):
    for ln, e in zip(mode_lines, exp):
        got = [(_wire(t), pi, s, x) for t, pi, s, x in got_fn(ln)]
        assert got == e, (ctx, repr(ln), got, e)


def test_trim_filter_matches_compiled_reference():
    lines = _fuzz_lines(5501, 120)
    exp = gt.run_misc(lines, "trim")
    _check(lines, exp, lambda ln: trim_filter(keyword_token(ln)), "trim")


def test_length_filter_matches_compiled_reference():
    lines = _fuzz_lines(5502, 120)
    for mn, mx in [(0, 3), (2, 5), (1, 255), (3, 3)]:
        exp = gt.run_misc(lines, "length", mn, mx)
        _check(lines, exp,
               lambda ln: length_filter(whitespace_tokens(ln), mn, mx),
               f"length {mn}:{mx}")


def test_truncate_filter_matches_compiled_reference():
    lines = _fuzz_lines(5503, 120)
    prot = ["merge", "x😀y", "straße"]
    for n in [1, 2, 3, 5]:
        exp = gt.run_misc(lines, "truncate", n, words=prot)
        _check(lines, exp,
               lambda ln: truncate_filter(
                   whitespace_tokens(ln), n, frozenset(prot)),
               f"truncate {n}")


def test_capitalization_filter_matches_compiled_reference():
    lines = _fuzz_lines(5504, 100, k=5) + [
        "a  b", "hello world. next", "the. of and", ". .. a.b.c",
        "MIXED case KEEP me", "mcdonald macy o'neil",
    ]
    keep = ["KEEP", "and"]
    prefixes = ["mc", "o'"]
    combos = [
        dict(only_first_word=True, force_first_letter=True,
             min_word_length=0, max_word_count=0x7FFFFFFF,
             max_token_length=0x7FFFFFFF, keep=None, ok_prefix=None),
        dict(only_first_word=False, force_first_letter=True,
             min_word_length=0, max_word_count=0x7FFFFFFF,
             max_token_length=0x7FFFFFFF, keep=frozenset(keep),
             ok_prefix=prefixes),
        dict(only_first_word=False, force_first_letter=False,
             min_word_length=3, max_word_count=3,
             max_token_length=0x7FFFFFFF, keep=frozenset(keep),
             ok_prefix=None),
        dict(only_first_word=True, force_first_letter=True,
             min_word_length=0, max_word_count=0x7FFFFFFF,
             max_token_length=12, keep=None, ok_prefix=None),
    ]
    for c in combos:
        exp = gt.run_misc(
            lines, "cap",
            1 if c["only_first_word"] else 0,
            1 if c["force_first_letter"] else 0,
            c["min_word_length"], c["max_word_count"], c["max_token_length"],
            words=sorted(c["keep"]) if c["keep"] else [],
            prefixes=c["ok_prefix"] or [],
        )
        _check(lines, exp,
               lambda ln: capitalization_filter(keyword_token(ln), **c),
               f"cap {c}")


def test_keep_word_filter_matches_compiled_reference():
    lines = _fuzz_lines(5505, 120)
    words = ["merge", "sort", "two", "😀", "straße"]
    exp = gt.run_misc(lines, "keep", words=words)
    _check(lines, exp,
           lambda ln: keep_word_filter(whitespace_tokens(ln), frozenset(words)),
           "keep")


def test_hyphenated_words_filter_matches_compiled_reference():
    lines = _fuzz_lines(5506, 150)
    exp = gt.run_misc(lines, "hyphen")
    _check(lines, exp,
           lambda ln: hyphenated_words_filter(whitespace_tokens(ln)),
           "hyphen")


def test_fingerprint_filter_matches_compiled_reference():
    lines = _fuzz_lines(5507, 120)
    for max_size, sep in [(1024, " "), (10, "_"), (3, "|"), (0, " ")]:
        exp = gt.run_misc(lines, "fingerprint", max_size,
                          sep.encode("utf-16-be").hex())
        _check(lines, exp,
               lambda ln: fingerprint_filter(
                   whitespace_tokens(ln), u16_len(ln), max_size, sep),
               f"fingerprint {max_size} {sep!r}")


def test_codepoint_count_filter_matches_compiled_reference():
    lines = _fuzz_lines(5508, 120)
    for mn, mx in [(1, 3), (2, 300), (0, 1)]:
        exp = gt.run_misc(lines, "cpcount", mn, mx)
        _check(lines, exp,
               lambda ln: codepoint_count_filter(whitespace_tokens(ln), mn, mx),
               f"cpcount {mn}:{mx}")


def test_decimal_digit_filter_matches_compiled_reference():
    lines = _fuzz_lines(5509, 120) + ["٠١٢٣٤٥٦٧٨٩", "\U000104A0x\U000104A5",
                                      "½ ² ³", "๕๖ ३४"]
    exp = gt.run_misc(lines, "decimal")
    _check(lines, exp,
           lambda ln: decimal_digit_filter(whitespace_tokens(ln)), "decimal")


def test_scandinavian_filters_match_compiled_reference():
    extra = ["aaa aao aae aeo", "AAa AEe OOo Oee", "åäö ÅÄÖ æøÆØ",
             "aaaaaa oeoeoe", "xaaax xoex"]
    lines = _fuzz_lines(5510, 120) + extra
    exp = gt.run_misc(lines, "scannorm")
    _check(lines, exp,
           lambda ln: scandinavian_normalization_filter(whitespace_tokens(ln)),
           "scannorm")
    exp = gt.run_misc(lines, "scanfold")
    _check(lines, exp,
           lambda ln: scandinavian_folding_filter(whitespace_tokens(ln)),
           "scanfold")


def test_limit_filters_match_compiled_reference():
    lines = _fuzz_lines(5511, 100)
    for n in [1, 2, 5]:
        for consume in (0, 1):
            exp = gt.run_misc(lines, "limitcount", n, consume)
            _check(lines, exp,
                   lambda ln: limit_token_count_filter(whitespace_tokens(ln), n),
                   f"limitcount {n}")
            exp = gt.run_misc(lines, "limitpos", n, consume)
            _check(lines, exp,
                   lambda ln: limit_token_position_filter(
                       whitespace_tokens(ln), n),
                   f"limitpos {n}")
    for off in [0, 4, 30]:
        exp = gt.run_misc(lines, "limitoffset", off, 0)
        _check(lines, exp,
               lambda ln: limit_token_offset_filter(whitespace_tokens(ln), off),
               f"limitoffset {off}")


def test_upper_case_filter_matches_compiled_reference():
    lines = _fuzz_lines(5512, 120) + ["ß ẞ ﬁﬂ ǅǆ", "ıi İI", "𐐨𐐩 𐑉"]
    exp = gt.run_misc(lines, "upper")
    _check(lines, exp,
           lambda ln: upper_case_filter(whitespace_tokens(ln)), "upper")


def test_apostrophe_filter_matches_compiled_reference():
    lines = _fuzz_lines(5513, 120) + ["'' ’x x’ mid'dle'end"]
    exp = gt.run_misc(lines, "apostrophe")
    _check(lines, exp,
           lambda ln: apostrophe_filter(whitespace_tokens(ln)), "apostrophe")


def test_snowball_english_matches_compiled_reference():
    """GT round 56 — the Snowball English (Porter2) stemmer: fuzzed
    tokens through Whitespace + LowerCase + SnowballFilter(English)
    stem identically to the compiled org.tartarus.snowball machine —
    pinning exception lists, the gener/commun/arsen R1 prefixes,
    longest-match-blocks-shorter among semantics, apostrophe step 0,
    the consonant-Y marking, and the short-word +e rule."""
    from lucene_solr_spark.analysis.snowball_en import porter2_stem
    from lucene_solr_spark.analysis.tokenizer import _java_lower

    rng = random.Random(5656)
    stems = ["run", "hop", "hope", "cry", "tie", "die", "free", "agree",
             "consign", "gener", "generat", "commun", "communic", "arsen",
             "nation", "rat", "ration", "sens", "abil", "brutal", "good",
             "beauti", "bee", "tr", "y", "say", "enjoy", "toy", "by"]
    sufs = ["", "s", "es", "ies", "ied", "ed", "ing", "ingly", "edly",
            "eed", "eedly", "sses", "ss", "us", "'s", "'s'", "'",
            "ational", "tional", "enci", "anci", "abli", "entli", "izer",
            "ization", "ation", "ator", "alism", "aliti", "alli",
            "fulness", "ousli", "ousness", "iveness", "iviti", "biliti",
            "bli", "ogi", "fulli", "lessli", "li", "alize", "icate",
            "iciti", "ical", "ful", "ness", "ative", "al", "ance", "ence",
            "er", "ic", "able", "ible", "ant", "ement", "ment", "ent",
            "ism", "ate", "iti", "ous", "ive", "ize", "ion", "e", "l",
            "ll", "y", "Y"]
    fixed = ["skis skies dying lying tying idly gently ugly early only",
             "singly sky news howe atlas cosmos bias andes",
             "inning outing canning herring earring proceed exceed succeed",
             "innings proceeds 'twas y ye yes eye bye ''",
             "generate generalization communicate arsenal arsenic",
             "crying spraying sprayed pirating hopping hoppings",
             "a ab abe ya ay '", "dry dried drying fly flies flying"]
    lines = list(fixed)
    for _ in range(120):
        words = []
        for _ in range(rng.randint(1, 8)):
            w = rng.choice(stems) + rng.choice(sufs)
            if rng.random() < 0.15:
                w += rng.choice(sufs)
            if rng.random() < 0.1:
                w = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz'y")
                            for _ in range(rng.randint(1, 7)))
            words.append(w)
        lines.append(" ".join(words))
    exp = gt.run_snowball(lines)

    def mine(ln):
        return [(porter2_stem(_java_lower(t)), pi, s, e)
                for t, pi, s, e in whitespace_tokens(ln)]

    _check(lines, exp, mine, "snowball-en")


def test_html_strip_matches_compiled_reference():
    """GT round 57 — HTMLStripCharFilter: fuzzed HTML soup strips to the
    identical text AND correctOffset map as the compiled jflex scanner —
    pinning inline-vs-block tag treatment, br/script/style substitution,
    comment/SSI/CDATA handling, the entity tables with their length caps
    and surrogate-pair forms, and every fallback-to-literal path."""
    from lucene_solr_spark.analysis.htmlstrip import html_strip
    from lucene_solr_spark.analysis.misc_filters import u16_len

    rng = random.Random(5757)
    frags = [
        "plain text ", "a<b", "x>y", "<p>", "</p>", "<P >", "< p>",
        "<br>", "<BR/>", "<br >", "</br>", "</ br >", "<b>", "</b>",
        "<span class='x'>", "</span>", "<div>", "</div>", "</div x>",
        "<div a=1 b='2'>", "<div a=\"x>y\">", "<div onclick='a>b'>",
        "<div onclick = \"c>d\" e=f>", "<img src='u'/>", "<input/>",
        "&amp;", "&lt;", "&gt;", "&nbsp;", "&sup1;", "&supe;", "&sup",
        "&bogus;", "&amp", "&AMP;", "&aMp;", "&#65;", "&#x41;", "&#65",
        "&#xD835;&#xDD4A;", "&#55357;&#56832;", "&#55296;x", "&#xDEAD;",
        "&#1114111;", "&#1114112;", "&#x10FFFF;", "&#12345678;", "&#", "&",
        "<!-- comment -->", "<!--unterminated", "<!-- a <!--# b='-->' -->",
        "<!DOCTYPE html>", "<!doctype", "<![CDATA[raw <b> &amp;]]>",
        "<![CDATA[open", "<!a-->", "<!>",
        "<script>var a='</script>';</script>", "<script>x</script>",
        "<script a=b>y</script>", "<script><!-- '</script>' --></script>",
        "<style>p{}</style>", "<style><!-- x --></style>",
        "<?php echo '>'; ?>", "<?xml version='1.0'?>", "<? bogus >",
        "<", ">", "</", "</>", "< >", "<5>", "<a", "<div ", "<div",
        "<em>", "</em >", "<tt>", "<unknown>", "</unknown>",
        "\n", "  ", "😀", "ß", "<ß>", "</ß>", "<名前>", "text&text",
    ]
    lines = []
    for _ in range(150):
        lines.append("".join(
            rng.choice(frags) for _ in range(rng.randint(0, 10))))
    lines += ["", "<", "&", "<!", "<!-", "<!--", "<script>", "<style>x",
              "<b", "</b", "<b ", "</b ", "&#x", "&#"]

    for escaped in (None, ["b", "DIV", "br", "script"]):
        exp = gt.run_htmlstrip(lines, escaped)
        for ln, (etext, eoffs) in zip(lines, exp):
            got, om = html_strip(ln, escaped)
            goffs = [om.correct(i) for i in range(u16_len(got) + 1)]
            assert got == etext, (escaped, repr(ln), repr(got), repr(etext))
            assert goffs == eoffs, (escaped, repr(ln), goffs, eoffs)


def test_classic_tokenizer_matches_compiled_reference():
    """GT round 58 — ClassicTokenizer + ClassicFilter (the pre-3.1
    standard grammar): fuzzed text streams match the compiled scanner on
    (term, type, posInc, offsets) — pinning the EMAIL/HOST/NUM/ACRONYM/
    COMPANY/APOSTROPHE longest-match interplay, the alternating
    has-digit NUM families, CJ single-char tokens, ACRONYM_DEP's retype
    to <HOST>, the 's / dot post-filter, and the skip-not-split
    maxTokenLength rule."""
    from lucene_solr_spark.analysis.classic import classic_scan, classic_tokens

    rng = random.Random(5859)
    frags = [
        "word", "Word2", "O'Reilly's", "you're", "can't", "U.S.A.",
        "I.B.M.", "AT&T", "Excite@Home", "a@b.c", "dev@example.com",
        "a-b_c@my-host.co.uk", "x@y", "@", "&", "www.example.com",
        "a.b", "a.b.", "ab.cd.ef", "3.1415", "192.168.0.1", "X99-12/34",
        "2,5", "1-2-3", "a-1", "1-a", "a_1_b", "a.b-c", "x/y", "-",
        "..", "'", "''", "a'", "'a", "1.", ".1", "a&", "&a", "a@",
        "日本", "カナ", "ทดสอบ123", "mixed日本word", "ßtraße", "Σπ",
        "x" * 260, "a" * 254 + ".b",
    ]
    lines = []
    for _ in range(140):
        lines.append(" ".join(
            rng.choice(frags) for _ in range(rng.randint(0, 8))))
    # no-space concatenations stress longest-match boundaries
    for _ in range(60):
        lines.append("".join(
            rng.choice(frags) for _ in range(rng.randint(1, 4))))
    for filt in (False, True):
        exp = gt.run_classic_tok(lines, filter_=filt)
        fn = classic_tokens if filt else classic_scan
        for ln, e in zip(lines, exp):
            got = [( _wire(t), ty, pi, s, x) for t, ty, pi, s, x in fn(ln)]
            assert got == e, (filt, repr(ln), got[:6], e[:6])
    # maxTokenLength skip (not split) + posInc bump
    exp = gt.run_classic_tok(["aaa " + "x" * 300 + " bbb"], max_len=255)
    assert exp[0][0][0] == "aaa" and exp[0][1][0] == "bbb"
    assert exp[0][1][2] == 2  # skipped long token bumps posInc


def test_query_auto_stop_word_analyzer_matches_compiled_reference():
    """GT round 59 — QueryAutoStopWordAnalyzer: the df-derived stop set
    (docFreq STRICTLY > (int)(numDocs*pct) or an absolute maxDocFreq)
    and the wrapped query streams (StopFilter posInc accumulation) match
    the compiled class over a randomized corpus."""
    from lucene_solr_spark.analysis.tokenizer import _java_lower

    rng = random.Random(5959)
    vocab = ["the", "of", "fast", "merge", "sort", "spark", "rare1",
             "rare2", "x", "üBer"]
    docs = []
    for _ in range(40):
        docs.append(" ".join(
            rng.choice(vocab) for _ in range(rng.randint(1, 12))))
    queries = ["the fast merge", "of the rare1 rare2", "sort sort the",
               "üBer x the of", "", "nomatch the"]

    def toks(text):
        return [_java_lower(t) for t, _pi, _s, _e in whitespace_tokens(text)]

    dfs: dict[str, int] = {}
    for d in docs:
        for t in set(toks(d)):
            dfs[t] = dfs.get(t, 0) + 1

    for mode, val in [("percent", 0.4), ("percent", 0.1), ("freq", 5.0)]:
        limit = int(len(docs) * val) if mode == "percent" else int(val)
        my_stop = sorted(t for t, df in dfs.items() if df > limit)
        exp_stop, exp_streams = gt.run_autostop(docs, queries, mode, val)
        assert my_stop == exp_stop, (mode, val, my_stop, exp_stop)
        stop = set(my_stop)
        for q, e in zip(queries, exp_streams):
            got = []
            skipped = 0
            for t in toks(q):
                if t in stop:
                    skipped += 1
                    continue
                got.append((t, 1 + skipped))
                skipped = 0
            assert got == e, (mode, val, q, got, e)


def test_quality_benchmark_matches_compiled_reference():
    """GT round 60 — the benchmark/quality evaluation harness:
    QualityBenchmark + TrecJudge + QualityStats over randomized corpora
    and TREC qrels. Ranking comes from the (already rank-identical)
    control oracle; every per-query AND averaged stats field must match
    the compiled classes exactly — pinning the rank<=5 MRR rule, the
    beyond-list precision extrapolation, avp = sum(p@hit)/maxGood, and
    average()'s positive-judgment-only aggregation."""
    from lucene_solr_spark.search import queryparser as qp
    from lucene_solr_spark.search.oracle import (
        build_oracle_index,
        oracle_topk_spec,
    )
    from lucene_solr_spark.search.quality import (
        average,
        judge_results,
        parse_trec_qrels,
    )

    class _NoExpand:
        def expand_terms(self, **kw):  # pragma: no cover
            raise AssertionError("plain-term queries only")

    vocab = ["aa", "bb", "cc", "dd", "ee", "ff", "gg"]
    rng = random.Random(6060)
    for rnd in range(4):
        n_docs = rng.randint(6, 25)
        docs = [
            (f"d{i}", " ".join(
                rng.choice(vocab) for _ in range(rng.randint(1, 15))))
            for i in range(n_docs)
        ]
        queries = [
            (f"q{j}", " ".join(
                rng.choice(vocab) for _ in range(rng.randint(1, 3))))
            for j in range(rng.randint(2, 6))
        ]
        qrel_lines = []
        for qid, _t in queries:
            for name, _txt in docs:
                if rng.random() < 0.3:
                    rel = rng.choice(["0", "1", "2"])
                    qrel_lines.append(f"{qid} 0 {name} {rel}")
        # ensure at least one positively-judged query (average asserts)
        qrel_lines.append(f"{queries[0][0]} 0 {docs[0][0]} 1")
        max_results = rng.choice([3, 10, 20])

        exp = gt.run_quality(docs, queries, qrel_lines, max_results)
        idx = build_oracle_index(
            [(i, t) for i, (_n, t) in enumerate(docs)])
        qrels = parse_trec_qrels(qrel_lines)
        mine = []
        for qid, text in queries:
            spec = qp.to_spec(_NoExpand(), qp.parse(text))
            ranked = oracle_topk_spec(idx, spec, k=max_results)
            names = [f"d{doc_id}" for doc_id, _s in ranked]
            mine.append(judge_results(names, qrels.get(qid, set())))
        mine.append(average(mine[:]))

        assert len(mine) == len(exp)
        for k, (m, e) in enumerate(zip(mine, exp)):
            ctx = (rnd, k, max_results)
            assert m.recall == e["recall"], (ctx, m.recall, e["recall"])
            assert m.avp() == e["avp"], (ctx, m.avp(), e["avp"])
            assert m.get_mrr() == e["mrr"], (ctx, m.get_mrr(), e["mrr"])
            assert m.num_points == e["num_points"], ctx
            assert m.num_good_points == e["num_good"], ctx
            assert m.max_good_points == e["max_good"], ctx
            for j in range(1, 21):
                if e["p_at"][j - 1] is None:
                    continue
                assert m.precision_at(j) == e["p_at"][j - 1], (ctx, j)


def test_multifield_query_parser_matches_compiled_reference():
    """GT round 61 — MultiFieldQueryParser over (title, body) per-field
    indexes: top-10 docids and float32 scores match the compiled parser
    + IndexSearcher bit-for-bit, with and without per-field boosts —
    pinning the nested-disjunction float structure (inner per-field
    SHOULD group cast to float32, outer clause sum in double) and each
    field's OWN df/avgdl/norm statistics."""
    import numpy as np

    from lucene_solr_spark.search.multifield import oracle_topk_multifield
    from lucene_solr_spark.search.oracle import build_oracle_index

    rng = random.Random(6161)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    for rnd in range(4):
        n = rng.randint(5, 30)
        docs = [
            (" ".join(rng.choice(vocab) for _ in range(rng.randint(0, 4))),
             " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 18))))
            for _ in range(n)
        ]
        queries = ["aa", "aa bb", "cc dd ee ff", "aa aa", "zz", "bb zz"] + [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 4)))
            for _ in range(10)
        ]
        ti = build_oracle_index([(i, t) for i, (t, _b) in enumerate(docs)])
        bi = build_oracle_index([(i, b) for i, (_t, b) in enumerate(docs)])
        for boosts in (None, (2.0, 0.5), (0.25, 3.5)):
            exp = gt.run_multifield(docs, queries, boosts)
            bmap = (
                None if boosts is None
                else {"title": boosts[0], "body": boosts[1]}
            )
            for q, e in zip(queries, exp):
                got = oracle_topk_multifield(
                    {"title": ti, "body": bi}, q.split(), bmap, k=10)
                assert [d for d, _ in got] == [d for d, _ in e], (
                    rnd, boosts, q, got, e)
                for (gd, gs), (ed, es) in zip(got, e):
                    assert np.float32(gs) == np.float32(float(es)), (
                        rnd, boosts, q, gd, float(gs), es)


def test_dismax_over_fields_matches_compiled_reference():
    """GT round 61b — the Solr DisMax main-query shape: per-term
    DisjunctionMaxQuery over boosted per-field TermQueries with a
    tiebreaker, outer BooleanQuery with minimumNumberShouldMatch.
    Docids + float32 scores match the compiled classes (2 fields keep
    the f32 scoreSum order-free)."""
    import numpy as np

    from lucene_solr_spark.search.multifield import oracle_topk_multifield
    from lucene_solr_spark.search.oracle import build_oracle_index

    rng = random.Random(6162)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    for rnd in range(3):
        n = rng.randint(6, 25)
        docs = [
            (" ".join(rng.choice(vocab) for _ in range(rng.randint(0, 3))),
             " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 14))))
            for _ in range(n)
        ]
        queries = ["aa", "aa bb", "aa bb cc dd", "ee zz aa"] + [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 4)))
            for _ in range(8)
        ]
        ti = build_oracle_index([(i, t) for i, (t, _b) in enumerate(docs)])
        bi = build_oracle_index([(i, b) for i, (_t, b) in enumerate(docs)])
        for boosts, tie, msm in [
            (None, 0.0, 0), (None, 0.3, 0), ((3.0, 0.1), 0.5, 0),
            (None, 0.1, 2), ((2.0, 1.0), 1.0, 1),
        ]:
            exp = gt.run_multifield(
                docs, queries, boosts, dismax_tie=tie, msm=msm)
            bmap = (
                None if boosts is None
                else {"title": boosts[0], "body": boosts[1]}
            )
            for q, e in zip(queries, exp):
                got = oracle_topk_multifield(
                    {"title": ti, "body": bi}, q.split(), bmap, k=10,
                    dismax_tie=tie, msm=msm)
                assert [d for d, _ in got] == [d for d, _ in e], (
                    rnd, boosts, tie, msm, q, got, e)
                for (gd, gs), (ed, es) in zip(got, e):
                    assert np.float32(gs) == np.float32(float(es)), (
                        rnd, boosts, tie, msm, q, gd, float(gs), es)


def test_boolean_perceptron_matches_compiled_reference():
    """GT round 62 — BooleanPerceptronClassifier (the classification
    module's third classifier): trained online in docid order with
    stale-snapshot batch semantics, ttf-initialized weights, ±tf
    updates truncated toward zero at snapshot time, sumDocFreq/2 auto
    threshold. Assigned classes match the compiled classifier exactly;
    scores to 1 ULP (Math.exp vs libm exp — the documented
    cross-runtime transcendental bound)."""
    import math

    from lucene_solr_spark.search.perceptron import train_boolean_perceptron

    rng = random.Random(6262)
    vocab = ["aa", "bb", "cc", "dd", "ee", "ff"]
    probes = ["aa", "bb", "cc", "dd", "ee", "ff", "aa bb", "cc dd ee",
              "aa aa bb", "zz", "", "ff ff ff aa"]
    for rnd in range(4):
        docs = []
        for _ in range(rng.randint(10, 40)):
            toks = [rng.choice(vocab) for _ in range(rng.randint(1, 9))]
            cls = (toks.count("aa") + toks.count("bb")) * 3 > len(toks)
            docs.append((cls, " ".join(toks)))
        for bs, thr in [(1, None), (3, None), (1, 12.0), (7, 30.0)]:
            exp = gt.run_perceptron(docs, probes, bs, thr)
            clf = train_boolean_perceptron(
                [(t.split(), c) for c, t in docs], bs, thr)
            for p, (ec, es) in zip(probes, exp):
                gc, gs = clf.assign(p.split())
                assert gc == ec, (rnd, bs, thr, repr(p), gc, ec)
                assert gs == es or abs(gs - es) <= 2 * math.ulp(es), (
                    rnd, bs, thr, repr(p), gs, es)


def _nb_classify(docs: list[tuple[str, list[str]]], text: list[str]) -> str:
    """The GT-round-14-pinned SimpleNaiveBayes mirror (assigned class)."""
    import math

    n = len(docs)
    classes = sorted(set(c for c, _ in docs))
    sum_doc_freq = sum(len(set(t)) for _c, t in docs)
    avg_unique = sum_doc_freq / n
    scored = []
    for c in classes:
        nc = sum(1 for cl, _t in docs if cl == c)
        prior = math.log(nc) - math.log(n)
        den = avg_unique * nc + n
        ll = 0.0
        for w in text:
            hits = sum(1 for cl, t in docs if cl == c and w in t)
            ll += math.log((hits + 1) / den)
        scored.append((c, prior + ll))
    scored.sort(key=lambda x: -x[1])
    return scored[0][0]


def test_confusion_matrix_matches_compiled_reference():
    """GT round 63 — ConfusionMatrixGenerator evaluating the (pinned)
    SimpleNaiveBayes over its own training docs: the counts table, the
    reference's quirky aggregate accuracy/precision/recall/F1 (fp counts
    include column-wide tp; tn counts class-absent rows), and every
    per-class P/R/F1 match the compiled classes exactly."""
    from lucene_solr_spark.search.quality import confusion_matrix

    rng = random.Random(6363)
    vocab = ["cat", "dog", "sat", "chat", "chien", "hund", "katze", "the"]
    for rnd in range(4):
        n_classes = rng.randint(2, 3)
        class_names = ["en", "fr", "de"][:n_classes]
        docs = []
        for _ in range(rng.randint(6, 25)):
            cls = rng.choice(class_names)
            toks = [rng.choice(vocab) for _ in range(rng.randint(1, 8))]
            docs.append((cls, toks))
        exp = gt.run_confusion([(c, " ".join(t)) for c, t in docs])
        pairs = [([c], _nb_classify(docs, t)) for c, t in docs]
        m = confusion_matrix(pairs)
        assert m.counts == exp["counts"], (rnd, m.counts, exp["counts"])
        assert m.accuracy() == exp["accuracy"], rnd
        assert m.total_precision() == exp["precision"], rnd
        assert m.total_recall() == exp["recall"], rnd
        assert m.total_f1() == exp["f1"], rnd
        for k, (p, r, f1) in exp["per_class"].items():
            assert m.precision(k) == p, (rnd, k)
            assert m.recall(k) == r, (rnd, k)
            assert m.f1(k) == f1, (rnd, k)


def test_dataset_splitter_matches_compiled_reference():
    """GT round 64 — DatasetSplitter (classification/utils): stratified
    train/test/cv splitting with the reference's exact walk — classes in
    first-occurrence order, a GLOBAL alternating counter deciding test
    eligibility, per-group float quotas (tc < totalHits*ratio). The
    pure-Python mirror reproduces each output index's doc sequence
    exactly."""
    from lucene_solr_spark.ops.pipeline import dataset_splitter_assign_py

    rng = random.Random(6464)
    for rnd in range(4):
        classes = ["a", "b", "c", "d"][: rng.randint(1, 4)]
        docs = [
            (rng.choice(classes), f"t{i}")
            for i in range(rng.randint(3, 40))
        ]
        for tr, cv in [(0.2, 0.2), (0.34, 0.25), (0.5, 0.0), (0.0, 0.45)]:
            train, test, cvl = gt.run_splitter(docs, tr, cv)
            rows = [(i, c) for i, (c, _t) in enumerate(docs)]
            splits = dataset_splitter_assign_py(rows, tr, cv)
            # the output indexes add docs group-major in walk order
            order: list[str] = []
            groups: dict[str, list[int]] = {}
            for pos, (c, _t) in enumerate(docs):
                if c not in groups:
                    order.append(c)
                    groups[c] = []
                groups[c].append(pos)
            mine = {"train": [], "test": [], "cv": []}
            for c in order:
                for pos in groups[c]:
                    key = {"test": "test", "cv": "cv", "train": "train"}[
                        splits[pos]]
                    mine[key].append(docs[pos][1])
            assert mine["train"] == train, (rnd, tr, cv, mine["train"], train)
            assert mine["test"] == test, (rnd, tr, cv, mine["test"], test)
            assert mine["cv"] == cvl, (rnd, tr, cv, mine["cv"], cvl)


def test_snowball_german2_matches_compiled_reference():
    """GT round 65 — Snowball German2: fuzzed tokens stem identically to
    the compiled stemmer — pinning the u/y vowel-shield pass (which runs
    BEFORE the umlaut folds, so 'aue' never folds), ae/oe/ue→ä/ö/ü with
    the qu hop, ß→ss, R1 pushed to position 3, the s/st ending classes
    with st's hop-3 guard, and the nested derivational rules."""
    from lucene_solr_spark.analysis.snowball_de import german2_stem
    from lucene_solr_spark.analysis.tokenizer import _java_lower

    rng = random.Random(6565)
    stems = ["haus", "häus", "haeus", "quell", "groß", "groess", "buech",
             "büch", "schön", "freundlich", "möglich", "verständ", "auffass",
             "bedeut", "beobacht", "ereignis", "brauch", "kauf", "leb",
             "wurd", "aue", "bau", "mau", "qual", "beispiel", "verschieden",
             "wissenschaft", "ein", "könig", "predig", "xyz", "aeue", "ssß"]
    sufs = ["", "e", "em", "en", "ern", "er", "es", "s", "st", "est",
            "end", "ung", "ig", "ik", "isch", "lich", "heit", "keit",
            "igkeit", "lichkeit", "erung", "igend", "enheit", "nisse",
            "ßen", "uen", "yen"]
    lines = []
    for _ in range(120):
        words = []
        for _ in range(rng.randint(1, 8)):
            word = rng.choice(stems) + rng.choice(sufs)
            if rng.random() < 0.2:
                word += rng.choice(sufs)
            if rng.random() < 0.1:
                word = "".join(rng.choice("abdeghiklmnqrstußäöüy")
                               for _ in range(rng.randint(1, 8)))
            words.append(word)
        lines.append(" ".join(words))
    exp = gt.run_snowball(lines, "German2")

    def mine(ln):
        return [(german2_stem(_java_lower(t)), pi, s, e)
                for t, pi, s, e in whitespace_tokens(ln)]

    _check(lines, exp, mine, "snowball-de2")


@pytest.mark.parametrize("lang,mod,fn", [
    ("French", "snowball_fr", "french_stem"),
    ("Spanish", "snowball_es", "spanish_stem"),
    ("Italian", "snowball_it", "italian_stem"),
    ("Dutch", "snowball_nl", "dutch_stem"),
    ("Russian", "snowball_ru", "russian_stem"),
    ("Portuguese", "snowball_pt", "portuguese_stem"),
    ("Norwegian", "snowball_scand", "norwegian_stem"),
    ("Danish", "snowball_scand", "danish_stem"),
    ("Swedish", "snowball_scand", "swedish_stem"),
])
def test_snowball_language_family_matches_compiled_reference(lang, mod, fn):
    """GT round 85 (r3 VERDICT #4) — the Snowball language family
    (French/Spanish/Italian/Dutch/Russian) pinned bit-for-bit against
    the compiled org.tartarus.snowball machines over fuzzed
    stem+suffix composites, truncated-stem mutants and fully random
    strings (the same generator that drove each port to 0 mismatches
    across 5 dev seeds, tools/snowball_fuzz.py). Pins the
    rule-edge discoveries: RV-limited among matching (a longer suffix
    crossing RV cannot match at all), Spanish 2a's out-of-RV u,
    Italian step-0 pronoun replacement keeping ar/er/ir, the French
    prelude's lookahead cursor (joUaIent) and bare-'s' survival, and
    Dutch/Russian region arithmetic."""
    import importlib
    import sys as _sys

    _sys.path.insert(0, "/root/repo/tools")
    from snowball_fuzz import LANG_SETUP

    from lucene_solr_spark.analysis.tokenizer import _java_lower

    stem = getattr(
        importlib.import_module(f"lucene_solr_spark.analysis.{mod}"), fn)
    setup = LANG_SETUP[lang]
    rng = random.Random(0x8500 + len(lang))
    words = []
    for _ in range(900):
        r = rng.random()
        if r < 0.45:
            word = rng.choice(setup["stems"]) + rng.choice(setup["sufs"])
            if rng.random() < 0.35:
                word += rng.choice(setup["sufs"])
        elif r < 0.75:
            word = (rng.choice(setup["stems"])[:rng.randint(1, 4)]
                    + "".join(rng.choice(setup["alphabet"])
                              for _ in range(rng.randint(1, 6))))
        else:
            word = "".join(rng.choice(setup["alphabet"])
                           for _ in range(rng.randint(1, 10)))
        words.append(word)
    words = sorted(set(words))
    lines = [" ".join(words[i:i + 8]) for i in range(0, len(words), 8)]
    exp = gt.run_snowball(lines, lang)

    def mine(ln):
        return [(stem(_java_lower(t)), pi, s, e)
                for t, pi, s, e in whitespace_tokens(ln)]

    _check(lines, exp, mine, f"snowball-{lang}")


def test_french_analyzer_chain_matches_compiled_reference():
    """GT round 85c — the full FrenchAnalyzer chain
    (fr/FrenchAnalyzer.java createComponents: StandardTokenizer +
    StandardFilter + ElisionFilter(DEFAULT_ARTICLES) + LowerCaseFilter +
    StopFilter(french_stop.txt) + FrenchLightStemFilter) pinned on the
    full (term, posInc, startOffset, endOffset) stream vs the compiled
    analyzer: elision of both apostrophe forms on the case-insensitive
    article set, the 164-word stop set's position gaps, and the
    FrenchLightStemmer's suffix rewrites + norm pass (accent fold at
    len>4, adjacent-duplicate collapse, ie/r/e/e/double tail)."""
    from lucene_solr_spark.analysis.french_light import french_stream

    rng = random.Random(8585)
    stems = ["nation", "inform", "continu", "commenc", "travaill",
             "bataill", "princ", "machin", "copi", "électr", "polit",
             "class", "modifi", "organis", "fort", "déleg", "rappell",
             "belle", "mou", "foll", "éduc", "signif"]
    sufs = ["", "e", "es", "s", "x", "aux", "eaux", "issement",
            "issant", "ement", "ements", "ficatrice", "ficateur",
            "catrice", "cateur", "atrice", "ateur", "trice", "ième",
            "teuse", "teur", "euse", "ère", "ive", "folle", "molle",
            "nnelle", "nnel", "ète", "ique", "esse", "inage",
            "isation", "isateur", "ation", "ition", "ie", "rr", "tt"]
    articles = ["l'", "d'", "qu'", "jusqu'", "c'", "m'", "x'", "l’"]
    stopw = ["des", "le", "la", "et", "qu", "été", "aurions", "même"]
    lines = []
    for _ in range(120):
        words = []
        for _ in range(rng.randint(1, 8)):
            r = rng.random()
            w = rng.choice(stems) + rng.choice(sufs)
            if r < 0.25:
                w = rng.choice(articles) + w
            elif r < 0.4:
                w = rng.choice(stopw)
            elif r < 0.5:
                w = "".join(rng.choice("abcdefiélnorstuàâçèêîôûù'x")
                            for _ in range(rng.randint(1, 9)))
            if rng.random() < 0.15:
                w = w.upper() if rng.random() < 0.5 else w.capitalize()
            words.append(w)
        lines.append(" ".join(words))
    exp = gt.run_snowball(lines, "FrenchAnalyzer")
    _check(lines, exp, french_stream, "french-analyzer")


def test_german_analyzer_chain_matches_compiled_reference():
    """GT round 85c — the full GermanAnalyzer chain
    (de/GermanAnalyzer.java: StandardTokenizer + StandardFilter +
    LowerCaseFilter + StopFilter(german_stop.txt) +
    GermanNormalizationFilter + GermanLightStemFilter) pinned on the
    full (term, posInc, offsets) stream: the N/V/U umlaut state machine
    (ß→ss expansion, e-after-U deletion), the 231-word stop gaps, and
    the light stemmer's ending steps."""
    from lucene_solr_spark.analysis.german_light import german_stream

    rng = random.Random(8586)
    stems = ["haus", "häus", "lauf", "mädchen", "straß", "kind",
             "arbeit", "wissenschaft", "freund", "lehrer", "spiel",
             "berg", "baum", "bäum", "auge", "feuer", "quell", " säue",
             "aue", "böse", "grün", "jung", "universität"]
    sufs = ["", "e", "en", "er", "ern", "em", "es", "s", "est", "st",
            "ere", "eren", "ße", "ßen", "ue", "ael", "oel", "uel",
            "ten", "ndest", "nd"]
    stopw = ["der", "die", "das", "und", "über", "für", "während",
             "könnte", "außerdem"]
    lines = []
    for _ in range(120):
        words = []
        for _ in range(rng.randint(1, 8)):
            r = rng.random()
            w = rng.choice(stems) + rng.choice(sufs)
            if r < 0.2:
                w = rng.choice(stopw)
            elif r < 0.3:
                w = "".join(rng.choice("abdeghiklmnoqrstußäöüyf")
                            for _ in range(rng.randint(1, 9)))
            if rng.random() < 0.2:
                w = w.upper() if rng.random() < 0.5 else w.capitalize()
            words.append(w)
        lines.append(" ".join(words))
    exp = gt.run_snowball(lines, "GermanAnalyzer")
    _check(lines, exp, german_stream, "german-analyzer")


def test_italian_analyzer_chain_matches_compiled_reference():
    """GT round 85c — the full ItalianAnalyzer chain
    (it/ItalianAnalyzer.java: StandardTokenizer + StandardFilter +
    ElisionFilter(21 Italian articles) + LowerCaseFilter +
    StopFilter(italian_stop.txt) + ItalianLightStemFilter) pinned on
    the full (term, posInc, offsets) stream: dell'/sull'-style
    elisions, the 279-word stop gaps, and the light stemmer's
    final-vowel step with i/h digraph guards and the <6 pass-through."""
    from lucene_solr_spark.analysis.italian_light import italian_stream

    rng = random.Random(8587)
    stems = ["cas", "studi", "universit", "ital", "bell", "grand",
             "lavor", "pensier", "famigl", "ragazz", "amich", "vecch",
             "spiagg", "formaggi", "stori", "second", "bibliotec"]
    sufs = ["", "a", "e", "i", "o", "ia", "ie", "io", "hi", "he",
            "ii", "chi", "che", "ghe", "ghi", "ato", "ata", "are",
            "ità", "oso", "osa", "ale", "ani", "à", "è", "ì"]
    articles = ["l'", "dell'", "sull'", "un'", "all'", "degl'", "c'",
                "x'", "dall’"]
    stopw = ["della", "degli", "perché", "quello", "avevano", "starò",
             "più", "è"]
    lines = []
    for _ in range(120):
        words = []
        for _ in range(rng.randint(1, 8)):
            r = rng.random()
            w = rng.choice(stems) + rng.choice(sufs)
            if r < 0.25:
                w = rng.choice(articles) + w
            elif r < 0.4:
                w = rng.choice(stopw)
            elif r < 0.5:
                w = "".join(rng.choice("abcdefghilmnopqrstuvzàèìòù'")
                            for _ in range(rng.randint(1, 9)))
            if rng.random() < 0.15:
                w = w.upper() if rng.random() < 0.5 else w.capitalize()
            words.append(w)
        lines.append(" ".join(words))
    exp = gt.run_snowball(lines, "ItalianAnalyzer")
    _check(lines, exp, italian_stream, "italian-analyzer")


def test_spanish_analyzer_chain_matches_compiled_reference():
    """GT round 85c — the full SpanishAnalyzer chain
    (es/SpanishAnalyzer.java: StandardTokenizer + StandardFilter +
    LowerCaseFilter + StopFilter(spanish_stop.txt) +
    SpanishLightStemFilter) pinned on the full (term, posInc, offsets)
    stream: the 308-word stop gaps, accent folds, the ces→z plural
    rewrite, and the <5 pass-through."""
    from lucene_solr_spark.analysis.spanish_light import spanish_stream

    rng = random.Random(8588)
    stems = ["cas", "herm", "lápic", "jóven", "estacion", "trabaj",
             "niñ", "ciudad", "luz", "vec", "montañ", "papel",
             "canción", "franc", "grand", "importante"]
    sufs = ["", "a", "o", "e", "as", "os", "es", "eses", "ces", "ás",
            "ón", "ones", "és", "ídos", "üé", "s"]
    stopw = ["las", "los", "de", "que", "está", "también", "más",
             "habían", "tuviésemos"]
    lines = []
    for _ in range(120):
        words = []
        for _ in range(rng.randint(1, 8)):
            r = rng.random()
            w = rng.choice(stems) + rng.choice(sufs)
            if r < 0.25:
                w = rng.choice(stopw)
            elif r < 0.35:
                w = "".join(rng.choice("abcdefghijlmnopqrstuvzáéíóúüñ")
                            for _ in range(rng.randint(1, 9)))
            if rng.random() < 0.15:
                w = w.upper() if rng.random() < 0.5 else w.capitalize()
            words.append(w)
        lines.append(" ".join(words))
    exp = gt.run_snowball(lines, "SpanishAnalyzer")
    _check(lines, exp, spanish_stream, "spanish-analyzer")


def test_russian_analyzer_chain_matches_compiled_reference():
    """GT round 85c — RussianAnalyzer (ru/RussianAnalyzer.java:
    Standard + LowerCase + StopFilter(russian_stop.txt, 159 words) +
    SnowballFilter(RussianStemmer)) pinned on the full stream — the
    pinned snowball stemmer composed with the real stop gaps."""
    import sys as _sys

    from lucene_solr_spark.analysis.lang_analyzers import (
        russian_analyzer_stream,
    )

    _sys.path.insert(0, "/root/repo/tools")
    import snowball_fuzz as sf

    rng = random.Random(8589)
    setup = sf.LANG_SETUP["Russian"]
    stopw = ["был", "для", "его", "чтобы", "этого", "него", "будучи"]
    lines = []
    for _ in range(120):
        words = []
        for _ in range(rng.randint(1, 8)):
            r = rng.random()
            w = rng.choice(setup["stems"]) + rng.choice(setup["sufs"])
            if r < 0.25:
                w = rng.choice(stopw)
            elif r < 0.35:
                w = "".join(rng.choice(setup["alphabet"])
                            for _ in range(rng.randint(1, 9)))
            if rng.random() < 0.15:
                w = w.upper() if rng.random() < 0.5 else w.capitalize()
            words.append(w)
        lines.append(" ".join(words))
    exp = gt.run_snowball(lines, "RussianAnalyzer")
    _check(lines, exp, russian_analyzer_stream, "russian-analyzer")


def test_dutch_analyzer_chain_matches_compiled_reference():
    """GT round 85c — DutchAnalyzer (nl/DutchAnalyzer.java: Standard +
    LowerCase + StopFilter(dutch_stop.txt, 101 words) +
    StemmerOverrideFilter(the 4-entry stem dict, override -> keyword,
    so the snowball stage skips it) + SnowballFilter(DutchStemmer))."""
    import sys as _sys

    from lucene_solr_spark.analysis.lang_analyzers import (
        dutch_analyzer_stream,
    )

    _sys.path.insert(0, "/root/repo/tools")
    import snowball_fuzz as sf

    rng = random.Random(8590)
    setup = sf.LANG_SETUP["Dutch"]
    stopw = ["de", "het", "van", "zijn", "wordt", "zonder", "kunnen"]
    overrides = ["fiets", "bromfiets", "ei", "kind", "fietsen", "eieren"]
    lines = []
    for _ in range(120):
        words = []
        for _ in range(rng.randint(1, 8)):
            r = rng.random()
            w = rng.choice(setup["stems"]) + rng.choice(setup["sufs"])
            if r < 0.2:
                w = rng.choice(stopw)
            elif r < 0.35:
                w = rng.choice(overrides)
            elif r < 0.45:
                w = "".join(rng.choice(setup["alphabet"])
                            for _ in range(rng.randint(1, 9)))
            if rng.random() < 0.15:
                w = w.upper() if rng.random() < 0.5 else w.capitalize()
            words.append(w)
        lines.append(" ".join(words))
    exp = gt.run_snowball(lines, "DutchAnalyzer")
    _check(lines, exp, dutch_analyzer_stream, "dutch-analyzer")


def test_portuguese_analyzer_chain_matches_compiled_reference():
    """GT round 85c — PortugueseAnalyzer (pt/PortugueseAnalyzer.java:
    Standard + LowerCase + StopFilter(portuguese_stop.txt, 203 words) +
    PortugueseLightStemFilter) pinned on the full stream: the
    ões/ães→ão and is→il rewrites, the feminine normalization step
    (ona→ão, esa→ês), final-vowel strip, and the accent fold running
    LAST (after the suffix machinery sees the accented forms)."""
    from lucene_solr_spark.analysis.portuguese_light import (
        portuguese_stream,
    )

    rng = random.Random(8591)
    stems = ["informaç", "coraç", "nacion", "menin", "bonit", "fregu",
             "trabalhador", "papel", "jornal", "anim", "cançõ",
             "portugu", "professor", "irm", "capit", "veloz", "mar"]
    sufs = ["", "a", "o", "e", "as", "os", "es", "ões", "ães", "ns",
            "eis", "éis", "ais", "óis", "is", "mente", "inha", "iaca",
            "eira", "osa", "ica", "ida", "ada", "iva", "ama", "ona",
            "ora", "esa", "na", "res", "ses", "zes", "les", "ás", "ã"]
    stopw = ["as", "dos", "de", "que", "não", "são", "está", "fôssemos",
             "tivéssemos"]
    lines = []
    for _ in range(120):
        words = []
        for _ in range(rng.randint(1, 8)):
            r = rng.random()
            w = rng.choice(stems) + rng.choice(sufs)
            if r < 0.25:
                w = rng.choice(stopw)
            elif r < 0.35:
                w = "".join(rng.choice("abcdefghijlmnopqrstuvzáéíóúâêôãõç")
                            for _ in range(rng.randint(1, 9)))
            if rng.random() < 0.15:
                w = w.upper() if rng.random() < 0.5 else w.capitalize()
            words.append(w)
        lines.append(" ".join(words))
    exp = gt.run_snowball(lines, "PortugueseAnalyzer")
    _check(lines, exp, portuguese_stream, "portuguese-analyzer")


def test_arabic_analyzer_chain_matches_compiled_reference():
    """GT round 85c — ArabicAnalyzer (ar/ArabicAnalyzer.java:
    StandardTokenizer + LowerCase + DecimalDigit + StopFilter(119-word
    ar stop list, applied BEFORE normalization — the list is not
    normalized) + ArabicNormalizationFilter (hamza-alef folds, teh
    marbuta → heh, harakat deletion) + ArabicStemFilter (one al-family
    prefix strip with length floors, then EVERY matching suffix in
    table order))."""
    from lucene_solr_spark.analysis.arabic_light import arabic_stream

    rng = random.Random(8592)
    stems = ["كتاب", "مدرس", "علم", "درس", "عمل", "شرك", "حكوم",
             "جامع", "طالب", "مدين", "صحيف", "وزير", "رئيس", "بلد"]
    prefixes = ["", "ال", "وال", "بال", "كال", "فال", "لل", "و"]
    sufs = ["", "ها", "ان", "ات", "ون", "ين", "يه", "ية", "ه", "ة",
            "ي", "تان", "ىة", "اء"]
    stopw = ["من", "في", "على", "إلى", "هذا", "التي", "أن", "لم"]
    harakat = "ًٌٍَُِّْـ"
    lines = []
    for _ in range(120):
        words = []
        for _ in range(rng.randint(1, 8)):
            r = rng.random()
            w = rng.choice(prefixes) + rng.choice(stems) + rng.choice(sufs)
            if r < 0.2:
                w = rng.choice(stopw)
            elif r < 0.3:
                w = "".join(rng.choice("ابتثجحخدذرزسشصضطظعغفقكلمنهويىةأإآ١٢٣٤٥")
                            for _ in range(rng.randint(1, 8)))
            if rng.random() < 0.2 and w:
                # sprinkle harakat (deleted by normalization)
                pos = rng.randrange(len(w))
                w = w[:pos] + rng.choice(harakat) + w[pos:]
            words.append(w)
        lines.append(" ".join(words))
    exp = gt.run_snowball(lines, "ArabicAnalyzer")
    _check(lines, exp, arabic_stream, "arabic-analyzer")


def test_czech_analyzer_chain_matches_compiled_reference():
    """GT round 85c — CzechAnalyzer (cz/CzechAnalyzer.java: Standard +
    LowerCase + StopFilter(cz stopwords, 172 words) + CzechStemFilter):
    case-ending removal by length class, possessive ov/in/ův, and the
    palatalization normalization (čt→ck, št→sk, c/č→k, z/ž→h,
    e-collapse, ů→o)."""
    from lucene_solr_spark.analysis.czech_light import czech_stream

    rng = random.Random(8593)
    stems = ["měst", "matk", "hračk", "dělostřelectv", "krásn", "běž",
             "stroj", "vlád", "knih", "uč", "přítel", "škol", "nůž",
             "vůz", "souč", "myš", "ledviček", "prác"]
    sufs = ["", "a", "y", "e", "ě", "u", "o", "í", "ý", "á", "é", "ů",
            "atech", "ětem", "etem", "atům", "ech", "ich", "ích",
            "ého", "ěmi", "emi", "ému", "ího", "ími", "ách", "ata",
            "aty", "ých", "ama", "ami", "ové", "ovi", "ými", "em",
            "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým",
            "mi", "ou", "ov", "in", "ův", "čt", "št", "ec", "ez"]
    stopw = ["a", "je", "na", "že", "který", "této", "budeš", "jsme"]
    lines = []
    for _ in range(120):
        words = []
        for _ in range(rng.randint(1, 8)):
            r = rng.random()
            w = rng.choice(stems) + rng.choice(sufs)
            if rng.random() < 0.3:
                w += rng.choice(sufs)
            if r < 0.2:
                w = rng.choice(stopw)
            elif r < 0.3:
                w = "".join(rng.choice("abcdeěfhijklmnoprsštuůvyzžáéíý")
                            for _ in range(rng.randint(1, 9)))
            if rng.random() < 0.15:
                w = w.upper() if rng.random() < 0.5 else w.capitalize()
            words.append(w)
        lines.append(" ".join(words))
    exp = gt.run_snowball(lines, "CzechAnalyzer")
    _check(lines, exp, czech_stream, "czech-analyzer")


def test_persian_analyzer_chain_matches_compiled_reference():
    """GT round 85c — PersianAnalyzer (fa/PersianAnalyzer.java:
    PersianCharFilter (ZWNJ→space, pre-tokenization, offset-aligned) +
    StandardTokenizer + LowerCase + DecimalDigit +
    ArabicNormalization + PersianNormalization (farsi yeh / yeh barree
    → yeh, keheh → kaf, heh-goal forms → heh, hamza-above deleted) +
    StopFilter(308-word fa list, applied AFTER normalization — the
    reverse of Arabic's order, the list ships pre-normalized)."""
    from lucene_solr_spark.analysis.persian_light import persian_stream

    rng = random.Random(8594)
    stems = ["کتاب", "فارس", "ایران", "دانشگاه", "خوان", "نویس",
             "گفت", "شهر", "زبان", "مدرسه", "هفته", "دوست"]
    sufs = ["", "ها", "های", "ی", "م", "ند", "ان", "ۀ", "ه"]
    stopw = ["که", "از", "این", "را", "با", "برای", "وقتیکه"]
    zwnj = "‌"
    lines = []
    for _ in range(120):
        words = []
        for _ in range(rng.randint(1, 8)):
            r = rng.random()
            w = rng.choice(stems) + rng.choice(sufs)
            if r < 0.25:
                w = rng.choice(stems) + zwnj + rng.choice(sufs or ["ها"])
            elif r < 0.4:
                w = rng.choice(stopw)
            elif r < 0.5:
                w = "".join(rng.choice("ابپتثجچحخدذرزژسشصضطظعغفقکگلمنوهیيكۀے۱۲۳٤ٔ")
                            for _ in range(rng.randint(1, 8)))
            words.append(w)
        lines.append(" ".join(words))
    exp = gt.run_snowball(lines, "PersianAnalyzer")
    _check(lines, exp, persian_stream, "persian-analyzer")


def test_greek_analyzer_chain_matches_compiled_reference():
    """GT round 85c — GreekAnalyzer (el/GreekAnalyzer.java:
    StandardTokenizer + GreekLowerCaseFilter (final sigma +
    tonos/dialytika folds) + StopFilter(75 words) + GreekStemFilter —
    the 854-line 22-rule stemmer with whole-stem exception sets,
    buffer re-exposure add-backs, and the rule-0/8 guard
    parenthesization quirks preserved as behavior)."""
    from lucene_solr_spark.analysis.greek_light import greek_stream

    rng = random.Random(8595)
    stems = ["καθεστωτ", "γεγονοτ", "ολογι", "φαγι", "φωτ", "κρεατ",
             "παιδ", "εργαζ", "μαθητ", "τραγουδ", "αγαπ", "μιλ",
             "γραφ", "δουλευ", "σπιτ", "ανθρωπ", "ελλην", "θαλασσ",
             "ονειρ", "αρχ", "ον", "τρ", "τσ", "πατερ", "μαμ", "οπ",
             "αρκ", "θ", "δ", "π", "χερσον", "σπι", "ψοφ", "κολλ"]
    sufs = ["", "α", "ο", "οσ", "ου", "ων", "εσ", "η", "ησ", "ια",
            "ιου", "ιων", "αδεσ", "αδων", "εδεσ", "εδων", "ουδεσ",
            "ουδων", "εωσ", "εων", "ικα", "ικο", "ικου", "ικων",
            "αμε", "ηθηκαμε", "ουσαμε", "ησαμε", "ηκαμε", "αγαμε",
            "ανε", "ιουντανε", "οντανε", "ουσανε", "ησανε", "ετε",
            "ησετε", "οντασ", "ωντασ", "ομαστε", "ιομαστε", "ιεστε",
            "εστε", "ηθηκεσ", "ηκεσ", "ηκα", "ουσεσ", "ουσα", "αγεσ",
            "αγα", "ησου", "ησε", "ηστε", "ησουνε", "ουνε", "ησουμε",
            "ουμε", "ματων", "ματοσ", "ματα", "ιοντουσαν", "ομασταν",
            "ουμαστε", "ηθηκατε", "ονται", "ομαι", "εισ", "ουν",
            "αν", "ασ", "ει", "εστερ", "οτερ", "υτατ", "ωτατ"]
    stopw = ["και", "το", "την", "που", "των", "αυτο", "εκεινοσ",
             "οπωσ"]
    lines = []
    for _ in range(150):
        words = []
        for _ in range(rng.randint(1, 8)):
            r = rng.random()
            w = rng.choice(stems) + rng.choice(sufs)
            if rng.random() < 0.3:
                w += rng.choice(sufs)
            if r < 0.15:
                w = rng.choice(stopw)
            elif r < 0.25:
                w = "".join(
                    rng.choice("αβγδεζηθικλμνξοπρστυφχψωςάέήίόύώϊϋ")
                    for _ in range(rng.randint(1, 10)))
            if rng.random() < 0.2:
                w = w.upper() if rng.random() < 0.5 else w.capitalize()
            words.append(w)
        lines.append(" ".join(words))
    exp = gt.run_snowball(lines, "GreekAnalyzer")
    _check(lines, exp, greek_stream, "greek-analyzer")


def test_hindi_analyzer_chain_matches_compiled_reference():
    """GT round 85c — HindiAnalyzer (hi/HindiAnalyzer.java: Standard +
    LowerCase + DecimalDigit + IndicNormalizationFilter (the 9-script
    first-match compose table with same-block and ZWJ rules) +
    HindiNormalizationFilter (nukta deletion, anusvara unification,
    virama/ZWJ/ZWNJ deletion, vowel and matra shortening) +
    StopFilter(227 words) + HindiStemFilter (suffix ladder))."""
    from lucene_solr_spark.analysis.hindi_light import hindi_stream

    rng = random.Random(8596)
    stems = ["लडक", "किताब", "पढ", "लिख", "खेल", "बोल", "समझ",
             "बच्च", "विद्यालय", "भाषा", "हिन्द", "राज", "देश",
             "शहर", "गाँव"]
    sufs = ["", "ा", "ी", "े", "ो", "ु", "ू", "ि", "ाएंगी", "ाऊंगा",
            "ाइयों", "ाएगी", "ेंगे", "ूंगी", "ियाँ", "ियों", "ाकर",
            "ाया", "ाने", "ाता", "ाओं", "ुएं", "कर", "ने", "ना",
            "ती", "ों", "ें", "ीं", "ाँ", "ां"]
    stopw = ["के", "का", "एक", "में", "की", "है", "यह", "और", "से",
             "हैं"]
    lines = []
    for _ in range(150):
        words = []
        for _ in range(rng.randint(1, 8)):
            r = rng.random()
            w = rng.choice(stems) + rng.choice(sufs)
            if r < 0.2:
                w = rng.choice(stopw)
            elif r < 0.3:
                w = "".join(
                    rng.choice("अआइईउऊएऐओऔकखगघचछजझटठडढणतथदधनपफबभमयरलवशषसहिीुूेैोौंँः१२३॥ऽ")
                    for _ in range(rng.randint(1, 8)))
            if rng.random() < 0.2 and w:
                pos = rng.randrange(len(w))
                w = w[:pos] + rng.choice(["़", "्", "ऍ", "ॉ", "ऱ"]) \
                    + w[pos:]
            words.append(w)
        lines.append(" ".join(words))
    exp = gt.run_snowball(lines, "HindiAnalyzer")
    _check(lines, exp, hindi_stream, "hindi-analyzer")


def test_bulgarian_analyzer_chain_matches_compiled_reference():
    """GT round 85c — BulgarianAnalyzer (bg/BulgarianAnalyzer.java:
    Standard + LowerCase + StopFilter(190 words) + BulgarianStemFilter
    — definite-article removal, plural rewrites with palatalization
    reversals (ци→к, зи→г, си→х, е..и→я), final-vowel strips, ен→н and
    the ъN→N collapse)."""
    from lucene_solr_spark.analysis.bulgarian_light import (
        bulgarian_stream,
    )

    rng = random.Random(8597)
    stems = ["книг", "град", "учител", "работ", "български", "дет",
             "нов", "стар", "машин", "прозорец", "мъж", "ръц", "крак",
             "уч", "направ", "избор"]
    sufs = ["", "а", "о", "е", "я", "и", "ища", "ият", "ът", "то",
            "те", "та", "ия", "ят", "овци", "ове", "еве", "ци", "зи",
            "си", "ен", "ъл", "ър", "ени", "ета", "ите"]
    stopw = ["и", "в", "на", "не", "за", "това", "които", "само"]
    lines = []
    for _ in range(150):
        words = []
        for _ in range(rng.randint(1, 8)):
            r = rng.random()
            w = rng.choice(stems) + rng.choice(sufs)
            if rng.random() < 0.3:
                w += rng.choice(sufs)
            if r < 0.2:
                w = rng.choice(stopw)
            elif r < 0.3:
                w = "".join(rng.choice("абвгдежзийклмнопрстуфхцчшщъьюя")
                            for _ in range(rng.randint(1, 9)))
            if rng.random() < 0.15:
                w = w.upper() if rng.random() < 0.5 else w.capitalize()
            words.append(w)
        lines.append(" ".join(words))
    exp = gt.run_snowball(lines, "BulgarianAnalyzer")
    _check(lines, exp, bulgarian_stream, "bulgarian-analyzer")


def test_indonesian_analyzer_chain_matches_compiled_reference():
    """GT round 85c — IndonesianAnalyzer (id/IndonesianAnalyzer.java:
    Standard + LowerCase + StopFilter(357 words) +
    IndonesianStemFilter): the syllable-budgeted Asian/Tala algorithm —
    particle and possessive strips, the first-order prefix family with
    sound-change rewrites (meny→s, pen+vowel→t), the prefix-gated
    suffix rules, and second-order ber/per/pe prefixes in the
    rule-fired order."""
    from lucene_solr_spark.analysis.indonesian_light import (
        indonesian_stream,
    )

    rng = random.Random(8598)
    roots = ["sapu", "ajar", "baca", "tulis", "main", "kerja", "jalan",
             "buku", "rumah", "makan", "minum", "lari", "pikir",
             "satu", "bijak", "guna", "bangun", "lihat", "dengar"]
    prefixes = ["", "meng", "meny", "men", "mem", "me", "peng", "peny",
                "pen", "pem", "di", "ter", "ke", "ber", "be", "per",
                "pe", "bel"]
    sufs = ["", "kan", "an", "i", "kah", "lah", "pun", "ku", "mu",
            "nya"]
    stopw = ["yang", "dan", "di", "dari", "ini", "untuk", "dengan",
             "tidak"]
    lines = []
    for _ in range(150):
        words = []
        for _ in range(rng.randint(1, 8)):
            r = rng.random()
            w = (rng.choice(prefixes) + rng.choice(roots)
                 + rng.choice(sufs))
            if rng.random() < 0.3:
                w += rng.choice(sufs)
            if r < 0.15:
                w = rng.choice(stopw)
            elif r < 0.25:
                w = "".join(rng.choice("abcdefghijklmnoprstuwy")
                            for _ in range(rng.randint(1, 9)))
            if rng.random() < 0.15:
                w = w.upper() if rng.random() < 0.5 else w.capitalize()
            words.append(w)
        lines.append(" ".join(words))
    exp = gt.run_snowball(lines, "IndonesianAnalyzer")
    _check(lines, exp, indonesian_stream, "indonesian-analyzer")


def test_latvian_analyzer_chain_matches_compiled_reference():
    """GT round 85c — LatvianAnalyzer (lv/LatvianAnalyzer.java:
    Standard + LowerCase + StopFilter(163 words) + LatvianStemFilter):
    the ordered 38-affix table gated on the word's vowel count and a
    3-char stem floor, with the unpalatalization rewrites that peek at
    the just-removed buffer character (kš+u → kst)."""
    from lucene_solr_spark.analysis.latvian_light import latvian_stream

    rng = random.Random(8599)
    stems = ["valod", "grāmat", "skol", "latvij", "cilvēk", "bērn",
             "dzīv", "laik", "gad", "vēlēšan", "kuģ", "ceļ", "brīv",
             "kok", "zaķ", "akmeņ", "kalņ", "šķirš", "mež", "vilkš",
             "kukš"]
    sufs = ["", "ajiem", "ajai", "ajam", "ajām", "ajos", "ajās",
            "iem", "ajā", "ais", "ai", "ei", "ām", "am", "ēm", "īm",
            "im", "um", "us", "as", "ās", "es", "os", "ij", "īs",
            "ēs", "is", "ie", "u", "a", "i", "e", "ā", "ē", "ī", "ū",
            "o", "s", "š"]
    stopw = ["un", "ir", "es", "ka", "tikai", "būt", "viņš", "savu"]
    lines = []
    for _ in range(150):
        words = []
        for _ in range(rng.randint(1, 8)):
            r = rng.random()
            w = rng.choice(stems) + rng.choice(sufs)
            if r < 0.2:
                w = rng.choice(stopw)
            elif r < 0.3:
                w = "".join(
                    rng.choice("abcdefgijklmnoprstuvzāčēģīķļņšūž")
                    for _ in range(rng.randint(1, 9)))
            if rng.random() < 0.15:
                w = w.upper() if rng.random() < 0.5 else w.capitalize()
            words.append(w)
        lines.append(" ".join(words))
    exp = gt.run_snowball(lines, "LatvianAnalyzer")
    _check(lines, exp, latvian_stream, "latvian-analyzer")


def test_sorani_analyzer_chain_matches_compiled_reference():
    """GT round 85c — SoraniAnalyzer (ckb/SoraniAnalyzer.java —
    Kurdish: Standard + SoraniNormalizationFilter BEFORE lowercase
    (yeh/kaf unification, ZWNJ deletion promoting a preceding heh to
    ae, final heh → ae, initial reh → rreh, harakat + every FORMAT
    char deleted) + LowerCase + DecimalDigit + StopFilter(63 words) +
    SoraniStemFilter's definite-article/plural/ezafe ladder)."""
    from lucene_solr_spark.analysis.sorani_light import sorani_stream

    rng = random.Random(8600)
    stems = ["کتێب", "رووداو", "شار", "زمان", "گوند", "خوێندن",
             "منداڵ", "کوردستان", "هەواڵ", "نووسەر", "یاری", "گۆڤار",
             "ره‌وش"]
    sufs = ["", "دا", "نا", "ەوە", "مان", "یان", "تان", "ێکی",
            "یەکی", "ێک", "یەک", "ەکە", "کە", "ەکان", "کان", "یانی",
            "انی", "ان", "یانە", "انە", "ایە", "ەیە", "ە", "ی"]
    stopw = ["و", "لە", "بە", "کە", "بۆ", "ئەم", "لەگەڵ", "وەک"]
    lines = []
    for _ in range(150):
        words = []
        for _ in range(rng.randint(1, 8)):
            r = rng.random()
            w = rng.choice(stems) + rng.choice(sufs)
            if rng.random() < 0.3:
                w += rng.choice(sufs)
            if r < 0.15:
                w = rng.choice(stopw)
            elif r < 0.25:
                w = "".join(
                    rng.choice("ئابپتجچحخدرڕزژسشعغفڤقکگلڵمنوۆهەیێيكىةھ‌َُ١٢")
                    for _ in range(rng.randint(1, 8)))
            words.append(w)
        lines.append(" ".join(words))
    exp = gt.run_snowball(lines, "SoraniAnalyzer")
    _check(lines, exp, sorani_stream, "sorani-analyzer")
