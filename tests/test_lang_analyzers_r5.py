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
