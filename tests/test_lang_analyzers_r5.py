"""Round-5 per-language analyzer chains pinned end-to-end on
(term, posInc, startOffset, endOffset) against the COMPILED reference
analyzers: Finnish, Turkish, Hungarian, Romanian, Catalan, Basque,
Irish, Armenian (analysis/{fi,tr,hu,ro,ca,eu,ga,hy}/*Analyzer.java).
Same pinning protocol as tests/test_misc_filters.py's 16 r4 chains."""

from __future__ import annotations

import random

import pytest

gt = pytest.importorskip("tools.lucene_ground_truth")

HAVE_GT = gt.build()
pytestmark = pytest.mark.skipif(
    not HAVE_GT, reason="javac / reference lucene-core unavailable"
)


def _check(mode_lines, exp, got_fn, ctx=""):
    for ln, e in zip(mode_lines, exp):
        got = [(t, pi, s, x) for t, pi, s, x in got_fn(ln)]
        assert got == e, (ctx, repr(ln), got, e)


def _lines(rng, stems, sufs, stop, alphabet, extras=(), n=120):
    lines = []
    pool = list(extras)
    for _ in range(n):
        words = []
        for _ in range(rng.randint(1, 8)):
            r = rng.random()
            w = rng.choice(stems) + rng.choice(sufs)
            if r < 0.2 and stop:
                w = rng.choice(stop)
            elif r < 0.3 and pool:
                w = rng.choice(pool)
            elif r < 0.42:
                w = "".join(rng.choice(alphabet)
                            for _ in range(rng.randint(1, 9)))
            if rng.random() < 0.18:
                w = w.upper() if rng.random() < 0.5 else w.capitalize()
            words.append(w)
        lines.append(" ".join(words))
    return lines


def test_finnish_analyzer_chain_matches_compiled_reference():
    from lucene_solr_spark.analysis.lang_analyzers import (
        finnish_analyzer_stream,
    )

    rng = random.Random(9501)
    lines = _lines(
        rng,
        ["kaupungi", "talo", "kirja", "opiskelija", "järve", "tyttö",
         "ihmis", "tietokone", "aatonaatto", "eläkk", "nopea", "suur"],
        ["", "ssa", "ssä", "sta", "lla", "lle", "n", "en", "han",
         "kin", "ko", "sti", "t", "it", "ien", "iin", "nsa", "mme",
         "insa", "ineen"],
        ["ja", "on", "ei", "että", "oli", "mutta", "kun", "itse"],
        "abdeghijklmnoprstuvyäö")
    exp = gt.run_snowball(lines, "FinnishAnalyzer")
    _check(lines, exp, finnish_analyzer_stream, "finnish-analyzer")


def test_turkish_analyzer_chain_matches_compiled_reference():
    from lucene_solr_spark.analysis.lang_analyzers import (
        turkish_analyzer_stream,
    )

    rng = random.Random(9502)
    lines = _lines(
        rng,
        ["ev", "kitap", "ağaç", "okul", "göz", "araba", "çocuk",
         "insan", "şehir", "kapı", "deniz", "türk", "İstanbul",
         "Ankara", "IIİİıi"],
        ["", "ler", "lar", "leri", "ları", "de", "da", "den", "dan",
         "in", "ın", "e", "a", "i", "ı", "im", "ımız", "leriyle",
         "daki", "ki", "siniz", "miş", "casına", "'daki", "'nın",
         "’de", "'si"],
        ["ve", "bir", "bu", "için", "ile", "daha", "çok", "mı", "mu"],
        "abcçdefgğhıijklmnoöprsştuüvyz'")
    exp = gt.run_snowball(lines, "TurkishAnalyzer")
    _check(lines, exp, turkish_analyzer_stream, "turkish-analyzer")


def test_hungarian_analyzer_chain_matches_compiled_reference():
    from lucene_solr_spark.analysis.lang_analyzers import (
        hungarian_analyzer_stream,
    )

    rng = random.Random(9503)
    lines = _lines(
        rng,
        ["ház", "asszony", "ember", "gyerek", "kert", "fall",
         "szekrény", "iskola", "tanár", "könyv", "ablak", "magyar"],
        ["", "ban", "ben", "nak", "nek", "val", "vel", "ból", "ról",
         "hoz", "ig", "ért", "on", "en", "ök", "ak", "unk", "ünk",
         "aitok", "jaim", "éi", "stul", "án", "ánként", "képpen"],
        ["a", "az", "és", "hogy", "nem", "is", "volt", "egy", "már"],
        "abcdefghijklmnoprstuvzáéíóöúü")
    exp = gt.run_snowball(lines, "HungarianAnalyzer")
    _check(lines, exp, hungarian_analyzer_stream, "hungarian-analyzer")


def test_romanian_analyzer_chain_matches_compiled_reference():
    from lucene_solr_spark.analysis.lang_analyzers import (
        romanian_analyzer_stream,
    )

    rng = random.Random(9504)
    lines = _lines(
        rng,
        ["cas", "copil", "oraş", "lucr", "frumos", "român", "fet",
         "băiat", "munc", "istoric", "politic", "important"],
        ["", "a", "e", "i", "ă", "ul", "ului", "ile", "elor", "ească",
         "ând", "are", "aţie", "itate", "abilitate", "ător", "eşte",
         "urilor", "ime"],
        ["şi", "de", "la", "cu", "pe", "un", "o", "este", "care",
         "nu", "mai"],
        "abcdefghijlmnoprstuvzâîăşţ")
    exp = gt.run_snowball(lines, "RomanianAnalyzer")
    _check(lines, exp, romanian_analyzer_stream, "romanian-analyzer")


def test_catalan_analyzer_chain_matches_compiled_reference():
    from lucene_solr_spark.analysis.lang_analyzers import (
        catalan_analyzer_stream,
    )

    rng = random.Random(9505)
    lines = _lines(
        rng,
        ["cas", "parl", "cant", "nacional", "log", "amig", "pract",
         "gat", "taul", "barcelon", "catal", "treball"],
        ["", "a", "es", "s", "ament", "aments", "able", "ible",
         "isme", "ista", "icament", "ació", "acions", "logia", "ques",
         "ant", "ar", "aria", "aven", "és", "ïble", "ìc"],
        ["de", "la", "el", "i", "que", "a", "en", "per", "amb", "és"],
        "abcdefghijlmnopqrstuvxyzàèéíïòóúü",
        extras=["l'home", "d'aigua", "s'obre", "m'agrada", "n'hi",
                "t'estimo", "x'abc", "l’altra"])
    exp = gt.run_snowball(lines, "CatalanAnalyzer")
    _check(lines, exp, catalan_analyzer_stream, "catalan-analyzer")


def test_basque_analyzer_chain_matches_compiled_reference():
    from lucene_solr_spark.analysis.lang_analyzers import (
        basque_analyzer_stream,
    )

    rng = random.Random(9506)
    lines = _lines(
        rng,
        ["etxe", "gizon", "eder", "lan", "buru", "herri", "mendi",
         "itsaso", "liburu", "eskol", "zehar", "jok"],
        ["", "a", "ak", "ari", "aren", "etik", "etan", "ko", "ra",
         "tik", "az", "ekin", "entzat", "aganako", "keria", "tasun",
         "garri", "tzaile", "tzen", "tuta"],
        ["eta", "ez", "da", "bat", "ere", "hori", "baina", "zen"],
        "abdefghijklmnoprstuxz")
    exp = gt.run_snowball(lines, "BasqueAnalyzer")
    _check(lines, exp, basque_analyzer_stream, "basque-analyzer")


def test_irish_analyzer_chain_matches_compiled_reference():
    from lucene_solr_spark.analysis.lang_analyzers import (
        irish_analyzer_stream,
    )

    rng = random.Random(9507)
    lines = _lines(
        rng,
        ["scoil", "gin", "grafaíoch", "pata", "arcach", "óide",
         "ceol", "litr", "dún", "fear", "cos", "bliana"],
        ["", "e", "í", "acht", "eacht", "ire", "irí", "amh", "abh",
         "imid", "faidh", "tear", "adh", "áil", "óideacha"],
        ["agus", "an", "na", "is", "go", "le", "ar", "ag", "sé",
         "ní", "h", "n", "t"],
        "abcdefghilmnoprstuáéíóú",
        extras=["tAthair", "nÉan", "bhFear", "gcat", "d'fhear",
                "m'athair", "b'fhéidir", "tsolas", "nGaeilge",
                "t-athair", "n-éan", "h-uile", "dteanga", "mbord"])
    exp = gt.run_snowball(lines, "IrishAnalyzer")
    _check(lines, exp, irish_analyzer_stream, "irish-analyzer")


def test_armenian_analyzer_chain_matches_compiled_reference():
    from lucene_solr_spark.analysis.lang_analyzers import (
        armenian_analyzer_stream,
    )

    rng = random.Random(9508)
    lines = _lines(
        rng,
        ["գիրք", "տուն", "մարդ", "քաղաք", "սեր", "ջուր", "հայ",
         "լեռ", "ծառ", "գործ", "խոսք", "երգ"],
        ["", "եր", "ներ", "երի", "ների", "ում", "ից", "ով", "ական",
         "ություն", "ելով", "ացել", "եցին", "վել", "անալ", "ին"],
        ["եւ", "է", "որ", "այդ", "նաեւ", "իր", "մի", "այս"],
        "աբգդեզէըթժիլխծկհձղճմյնշոչպջռսվտրցւփքօֆ")
    exp = gt.run_snowball(lines, "ArmenianAnalyzer")
    _check(lines, exp, armenian_analyzer_stream, "armenian-analyzer")


def test_polish_analyzer_chain_matches_compiled_reference():
    """PolishAnalyzer (stempel): StandardTokenizer + LowerCase +
    Stop(stopwords.txt) + StempelFilter over the in-tree
    stemmer_20000.tbl multi-trie — the engine parses the serialized
    Egothor MultiTrie2 directly (analysis/stempel.py)."""
    from lucene_solr_spark.analysis.stempel import polish_analyzer_stream

    rng = random.Random(9509)
    lines = _lines(
        rng,
        ["dom", "zamk", "kot", "komputer", "królewsk", "piękn",
         "dziewczyn", "nauczyciel", "miast", "książk", "wysok",
         "polsk", "przyjaciel", "dzieck", "ważn"],
        ["", "a", "y", "ami", "ach", "owi", "em", "ie", "ów", "om",
         "ego", "iego", "ych", "imi", "ość", "ości", "ku", "kach"],
        ["i", "w", "na", "się", "nie", "jest", "że", "do", "ale",
         "po", "który", "była"],
        "abcdeghijklmnoprstuwyzłążśćęóń")
    exp = gt.run_snowball(lines, "PolishAnalyzer")
    _check(lines, exp, polish_analyzer_stream, "polish-analyzer")


def test_stempel_stem_matches_compiled_reference():
    """Raw StempelStemmer.stem over random letter soup (exercises the
    patch interpreter's swallowed-out-of-bounds paths, minLength
    boundary, and null-stem pass-through)."""
    from lucene_solr_spark.analysis.stempel import polish_stem

    rng = random.Random(9510)
    alphabet = "abcdefghijklmnoprstuvwxyzłążśćęóń"
    lines = []
    for _ in range(150):
        words = ["".join(rng.choice(alphabet)
                         for _ in range(rng.randint(1, 14)))
                 for _ in range(rng.randint(1, 8))]
        lines.append(" ".join(words))
    exp = gt.run_snowball(lines, "StempelStem")
    for ln, e in zip(lines, exp):
        toks = [t for t in ln.split(" ") if t]
        got = [(polish_stem(t), 1, s, s + len(t))
               for t, s in zip(toks, _ws_offsets(ln))]
        assert got == e, (repr(ln), got, e)


def _ws_offsets(line):
    offs, i = [], 0
    for t in line.split(" "):
        if t:
            offs.append(i)
        i += len(t) + 1
    return offs


def test_kuromoji_smartcn_blocked_by_missing_intree_resources():
    """Mechanical verification of the COVERAGE.md adjudication: the
    reference checkout ships kuromoji WITHOUT
    TokenInfoDictionary$buffer.dat (the per-entry leftId/rightId/
    wordCost array BinaryDictionary.java:107 loads — without it there
    are no Viterbi costs and the reference's own JapaneseTokenizer
    cannot instantiate) and smartcn WITHOUT bigramdict.mem (the HHMM
    transition frequencies). The dictionaries that ARE present are
    listed so a future checkout that completes them flips this test
    loudly instead of silently."""
    import os

    ja = ("/root/reference/lucene/analysis/kuromoji/src/resources/"
          "org/apache/lucene/analysis/ja/dict")
    cn = ("/root/reference/lucene/analysis/smartcn/src/resources/"
          "org/apache/lucene/analysis/cn/smart/hhmm")
    assert os.path.exists(os.path.join(ja, "TokenInfoDictionary$fst.dat"))
    assert os.path.exists(os.path.join(ja, "ConnectionCosts.dat"))
    assert not os.path.exists(
        os.path.join(ja, "TokenInfoDictionary$buffer.dat")), (
        "buffer.dat appeared — the kuromoji ➖ adjudication no longer "
        "holds; implement the Viterbi decoder over the now-complete "
        "dictionaries")
    assert os.path.exists(os.path.join(cn, "coredict.mem"))
    assert not os.path.exists(os.path.join(cn, "bigramdict.mem")), (
        "bigramdict.mem appeared — the smartcn ➖ adjudication no "
        "longer holds")
