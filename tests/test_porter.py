"""Porter stemmer (analysis/en/PorterStemFilter.java — Porter 1980) and
the token filters beyond the standard chain (analysis/common)."""

from lucene_solr_spark.analysis.filters import (
    ascii_fold,
    edge_ngrams,
    ngrams,
    shingles,
    strip_possessive,
)
from lucene_solr_spark.analysis.porter import porter_stem
from lucene_solr_spark.analysis.tokenizer import analyze_as, token_table

# published example vectors from the algorithm definition (Porter 1980,
# "An algorithm for suffix stripping", steps 1-5)
VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall", "hissing": "hiss",
    "fizzed": "fizz", "failing": "fail", "filing": "file", "happy": "happi",
    "sky": "sky", "relational": "relat", "conditional": "condit",
    "rational": "ration", "valenci": "valenc", "hesitanci": "hesit",
    "digitizer": "digit", "radicalli": "radic", "differentli": "differ",
    "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "communism": "commun", "activate": "activ",
    "angulariti": "angular", "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
    "cease": "ceas", "controll": "control", "roll": "roll",
    "running": "run", "runs": "run", "argument": "argument",
    "arguments": "argument", "generalization": "gener",
    "oscillators": "oscil",
}


def test_porter_vectors():
    bad = {w: porter_stem(w) for w, e in VECTORS.items() if porter_stem(w) != e}
    assert not bad


def test_porter_short_words_unchanged():
    for w in ("a", "is", "be", "as", "by"):
        assert porter_stem(w) == w


def test_ascii_fold():
    assert ascii_fold("Crème") == "Creme"
    assert ascii_fold("jalapeño") == "jalapeno"
    assert ascii_fold("straße") == "strasse"
    assert ascii_fold("Œuvre") == "OEuvre"
    assert ascii_fold("plain") == "plain"


def test_strip_possessive():
    assert strip_possessive("owner's") == "owner"
    assert strip_possessive("owner’s") == "owner"
    assert strip_possessive("dogs'") == "dogs'"  # bare trailing apostrophe kept
    assert strip_possessive("its") == "its"


def test_shingles_and_ngrams():
    assert shingles(["a", "b", "c"], 2, 2) == ["a_b", "b_c"]
    assert shingles(["a", "b", "c"], 2, 3) == ["a_b", "a_b_c", "b_c"]
    assert shingles(["a", "b"], 2, 2, output_unigrams=True) == ["a", "a_b", "b"]
    assert edge_ngrams("spark", 2, 4) == ["sp", "spa", "spar"]
    assert edge_ngrams("ab", 2, 5) == ["ab"]
    assert ngrams("abcd", 2, 3) == ["ab", "bc", "cd", "abc", "bcd"]


def test_english_chain_query_side():
    # possessive -> lowercase -> stop (with gap) -> porter
    assert analyze_as("english", "The dogs' owner's cats were running") == [
        "dog", "owner", "cat", "were", "run"
    ]


def test_shingle_chain_fillers():
    # stopwords become '_' fillers inside shingles; all-filler dropped
    out = analyze_as("shingle", "divide this sentence")
    assert out == ["divide__", "__sentence"]


def test_token_table_english_stem_collision_merges():
    """'running' and 'runs' in one doc stem to one term code with two
    occurrences (tf merge happens downstream); positions keep stop gaps."""
    uniq, codes, docs, pos, flen = token_table(
        ["Dogs running the runs"], analyzer="english"
    )
    terms = [uniq[c] for c in codes]
    assert terms == ["dog", "run", "run"]
    assert list(pos) == [0, 1, 3]  # gap at stopped 'the'
    assert list(flen) == [3]
