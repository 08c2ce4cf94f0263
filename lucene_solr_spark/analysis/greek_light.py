"""GreekAnalyzer chain (analysis/el/GreekAnalyzer.java):
StandardTokenizer → GreekLowerCaseFilter (final sigma + tonos/dialytika
folds, then Java lowercase) → StandardFilter → StopFilter(el
stopwords, 75 words) → GreekStemFilter.

GreekStemmer (el/GreekStemmer.java, 854 lines) re-expressed
operation-for-operation over a char buffer, including the reference's
add-back mechanics that RE-EXPOSE previously removed buffer characters
(rules 10/11/18/19) and its quirky guard parenthesization in rules 0
and 8 (the length guard binds only the FIRST alternative — a Java
precedence accident preserved as behavior). Pinned bit-for-bit against
the COMPILED GreekAnalyzer in tests/test_misc_filters.py (GT round
85c)."""

from __future__ import annotations

GREEK_STOP = frozenset((
    "ο", "η", "το", "οι", "τα", "του", "τησ", "των", "τον", "την",
    "και", "κι", "κ", "ειμαι", "εισαι", "ειναι", "ειμαστε", "ειστε",
    "στο", "στον", "στη", "στην", "μα", "αλλα", "απο", "για", "προσ",
    "με", "σε", "ωσ", "παρα", "αντι", "κατα", "μετα", "θα", "να",
    "δε", "δεν", "μη", "μην", "επι", "ενω", "εαν", "αν", "τοτε",
    "που", "πωσ", "ποιοσ", "ποια", "ποιο", "ποιοι", "ποιεσ", "ποιων",
    "ποιουσ", "αυτοσ", "αυτη", "αυτο", "αυτοι", "αυτων", "αυτουσ",
    "αυτεσ", "αυτα", "εκεινοσ", "εκεινη", "εκεινο", "εκεινοι",
    "εκεινεσ", "εκεινα", "εκεινων", "εκεινουσ", "οπωσ", "ομωσ",
    "ισωσ", "οσο", "οτι",
))


_GREEK_FOLD = {
    "ς": "σ",
    "ά": "α", "Ά": "α",
    "έ": "ε", "Έ": "ε",
    "ή": "η", "Ή": "η",
    "ί": "ι", "Ί": "ι", "Ϊ": "ι", "ϊ": "ι", "ΐ": "ι",
    "ύ": "υ", "Ύ": "υ", "Ϋ": "υ", "ϋ": "υ", "ΰ": "υ",
    "ό": "ο", "Ό": "ο",
    "ώ": "ω", "Ώ": "ω",
}


def greek_lower(text: str) -> str:
    from .tokenizer import _java_lower

    return "".join(
        _GREEK_FOLD.get(c) or _java_lower(c) for c in text)


_VOWELS = set("αεηιουω")
_VOWELS_NO_Y = set("αεηιοω")

_EXC4 = frozenset(("θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ"))
_EXC6 = frozenset((
    "αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ", "αντιδ",
    "φυσ", "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ", "μουλ",
    "μπαν", "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ",
    "πετσ", "πιτσ", "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ",
    "συναδ", "τσαμ", "υποδ", "φιλον", "φυλοδ", "χασ"))
_EXC7 = frozenset(("αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ",
                   "ουλ", "πεθ", "πικρ", "ποτ", "σιχ", "χ"))
_EXC8A = frozenset(("τρ", "τσ"))
_EXC8B = frozenset((
    "βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ",
    "καστελ", "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν",
    "ουλ", "π", "πελεκ", "πλ", "πολισ", "πορτολ", "σαρακατσ",
    "σουλτ", "τσαρλατ", "ορφ", "τσιγγ", "τσοπ", "φωτοστεφ", "χ",
    "ψυχοπλ", "αγ", "γαλ", "γερ", "δεκ", "διπλ", "αμερικαν", "ουρ",
    "πιθ", "πουριτ", "σ", "ζωντ", "ικ", "καστ", "κοπ", "λιχ",
    "λουθηρ", "μαιντ", "μελ", "σιγ", "σπ", "στεγ", "τραγ", "τσαγ",
    "φ", "ερ", "αδαπ", "αθιγγ", "αμηχ", "ανικ", "ανοργ", "απηγ",
    "απιθ", "ατσιγγ", "βασ", "βασκ", "βαθυγαλ", "βιομηχ", "βραχυκ",
    "διατ", "διαφ", "ενοργ", "θυσ", "καπνοβιομηχ", "καταγαλ",
    "κλιβ", "κοιλαρφ", "λιβ", "μεγλοβιομηχ", "μικροβιομηχ", "νταβ",
    "ξηροκλιβ", "ολιγοδαμ", "ολογαλ", "πενταρφ", "περηφ", "περιτρ",
    "πλατ", "πολυδαπ", "πολυμηχ", "στεφ", "ταβ", "τετ", "υπερηφ",
    "υποκοπ", "χαμηλοδαπ", "ψηλοταβ"))
_EXC9 = frozenset((
    "αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ", "βαρον",
    "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ", "παρακαλ", "σερπ",
    "σκελ", "συρφ", "τοκ", "υ", "δ", "εμ", "θαρρ", "θ"))
_EXC12A = frozenset(("π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ"))
_EXC12B = frozenset(("αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ",
                     "προ", "νισ"))
_EXC13 = frozenset(("διαθ", "θ", "παρακαταθ", "προσθ", "συνθ"))
_EXC14 = frozenset((
    "φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ", "λαμπιδ",
    "λεχ", "μ", "πατ", "ρ", "λ", "μεδ", "μεσαζ", "υποτειν", "αμ",
    "αιθ", "ανηκ", "δεσποζ", "ενδιαφερ", "δε", "δευτερευ",
    "καθαρευ", "πλε", "τσα"))
_EXC15A = frozenset((
    "αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ", "αμαλ",
    "αμαλλι", "ανυστ", "απερ", "ασπαρ", "αχαρ", "δερβεν", "δροσοπ",
    "ξεφ", "νεοπ", "νομοτ", "ολοπ", "ομοτ", "προστ", "προσωποπ",
    "συμπ", "συντ", "τ", "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ",
    "αποτ", "αρτιπ", "διατ", "εν", "επιτ", "κροκαλοπ", "σιδηροπ",
    "λ", "ναυ", "ουλαμ", "ουρ", "π", "τρ", "μ"))
_EXC15B = frozenset(("ψοφ", "ναυλοχ"))
_EXC16 = frozenset(("ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον",
                    "επταν"))
_EXC17 = frozenset(("ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν",
                    "δυσχρ", "ευχρ", "κοινοχρ", "παλιμψ"))
_EXC18 = frozenset(("ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ",
                    "εξων"))
_EXC19 = frozenset(("παρασουσ", "φ", "χ", "ωριοπλ", "αζ",
                    "αλλοσουσ", "ασουσ"))


def greek_stem(word: str) -> str:
    """GreekStemmer.stem over a mutable buffer; `ln` is the live
    length, removed characters stay in the buffer for the add-back
    re-exposure mechanics."""
    if len(word) < 4:
        return word
    s = list(word)
    ln = len(s)

    def ends(suf, at=None):
        n = ln if at is None else at
        return n >= len(suf) and "".join(s[n - len(suf):n]) == suf

    def stem_of(n):
        return "".join(s[:n])

    orig = ln

    # rule 0
    def rule0(ln):
        if ln > 9 and (ends("καθεστωτοσ", ln) or ends("καθεστωτων", ln)):
            return ln - 4
        if ln > 8 and (ends("γεγονοτοσ", ln) or ends("γεγονοτων", ln)):
            return ln - 4
        if ln > 8 and ends("καθεστωτα", ln):
            return ln - 3
        if ln > 7 and (ends("τατογιου", ln) or ends("τατογιων", ln)):
            return ln - 4
        if ln > 7 and ends("γεγονοτα", ln):
            return ln - 3
        if ln > 7 and ends("καθεστωσ", ln):
            return ln - 2
        # Java precedence quirk: the ln>6 guard binds ONLY σκαγιου
        if ((ln > 6 and ends("σκαγιου", ln)) or ends("σκαγιων", ln)
                or ends("ολογιου", ln) or ends("ολογιων", ln)
                or ends("κρεατοσ", ln) or ends("κρεατων", ln)
                or ends("περατοσ", ln) or ends("περατων", ln)
                or ends("τερατοσ", ln) or ends("τερατων", ln)):
            return ln - 4
        if ln > 6 and ends("τατογια", ln):
            return ln - 3
        if ln > 6 and ends("γεγονοσ", ln):
            return ln - 2
        if ln > 5 and (ends("φαγιου", ln) or ends("φαγιων", ln)
                       or ends("σογιου", ln) or ends("σογιων", ln)):
            return ln - 4
        if ln > 5 and (ends("σκαγια", ln) or ends("ολογια", ln)
                       or ends("κρεατα", ln) or ends("περατα", ln)
                       or ends("τερατα", ln)):
            return ln - 3
        if ln > 4 and (ends("φαγια", ln) or ends("σογια", ln)
                       or ends("φωτοσ", ln) or ends("φωτων", ln)):
            return ln - 3
        if ln > 4 and (ends("κρεασ", ln) or ends("περασ", ln)
                       or ends("τερασ", ln)):
            return ln - 2
        if ln > 3 and ends("φωτα", ln):
            return ln - 2
        if ln > 2 and ends("φωσ", ln):
            return ln - 1
        return ln

    ln = rule0(ln)

    # rule 1
    if ln > 4 and (ends("αδεσ") or ends("αδων")):
        ln -= 4
        if not (ends("οκ") or ends("μαμ") or ends("μαν") or ends("μπαμπ")
                or ends("πατερ") or ends("γιαγι") or ends("νταντ")
                or ends("κυρ") or ends("θει") or ends("πεθερ")):
            ln += 2
    # rule 2
    if ln > 4 and (ends("εδεσ") or ends("εδων")):
        ln -= 4
        if (ends("οπ") or ends("ιπ") or ends("εμπ") or ends("υπ")
                or ends("γηπ") or ends("δαπ") or ends("κρασπ")
                or ends("μιλ")):
            ln += 2
    # rule 3
    if ln > 5 and (ends("ουδεσ") or ends("ουδων")):
        ln -= 5
        if (ends("αρκ") or ends("καλιακ") or ends("πεταλ") or ends("λιχ")
                or ends("πλεξ") or ends("σκ") or ends("σ") or ends("φλ")
                or ends("φρ") or ends("βελ") or ends("λουλ") or ends("χν")
                or ends("σπ") or ends("τραγ") or ends("φε")):
            ln += 3
    # rule 4
    if ln > 3 and (ends("εωσ") or ends("εων")):
        ln -= 3
        if stem_of(ln) in _EXC4:
            ln += 1
    # rule 5
    if ln > 2 and ends("ια"):
        ln -= 2
        if s[ln - 1] in _VOWELS if ln else False:
            ln += 1
    elif ln > 3 and (ends("ιου") or ends("ιων")):
        ln -= 3
        if s[ln - 1] in _VOWELS if ln else False:
            ln += 1
    # rule 6
    removed = False
    if ln > 3 and (ends("ικα") or ends("ικο")):
        ln -= 3
        removed = True
    elif ln > 4 and (ends("ικου") or ends("ικων")):
        ln -= 4
        removed = True
    if removed:
        if (ln and s[ln - 1] in _VOWELS) or stem_of(ln) in _EXC6:
            ln += 2
    # rule 7
    if ln == 5 and ends("αγαμε"):
        ln -= 1
    else:
        if ln > 7 and ends("ηθηκαμε"):
            ln -= 7
        elif ln > 6 and ends("ουσαμε"):
            ln -= 6
        elif ln > 5 and (ends("αγαμε") or ends("ησαμε") or ends("ηκαμε")):
            ln -= 5
        if ln > 3 and ends("αμε"):
            ln -= 3
            if stem_of(ln) in _EXC7:
                ln += 2
    # rule 8
    removed = False
    if ln > 8 and ends("ιουντανε"):
        ln -= 8
        removed = True
    elif (ln > 7 and ends("ιοντανε")) or ends("ουντανε") or ends("ηθηκανε"):
        ln -= 7
        removed = True
    elif (ln > 6 and ends("ιοτανε")) or ends("οντανε") or ends("ουσανε"):
        ln -= 6
        removed = True
    elif (ln > 5 and ends("αγανε")) or ends("ησανε") or ends("οτανε") \
            or ends("ηκανε"):
        ln -= 5
        removed = True
    if removed and stem_of(ln) in _EXC8A:
        ln += 4
        s[ln - 4] = "α"
        s[ln - 3] = "γ"
        s[ln - 2] = "α"
        s[ln - 1] = "ν"
    if ln > 3 and ends("ανε"):
        ln -= 3
        if (ln and s[ln - 1] in _VOWELS_NO_Y) or stem_of(ln) in _EXC8B:
            ln += 2
    # rule 9
    if ln > 5 and ends("ησετε"):
        ln -= 5
    if ln > 3 and ends("ετε"):
        ln -= 3
        if (stem_of(ln) in _EXC9 or (ln and s[ln - 1] in _VOWELS_NO_Y)
                or ends("οδ") or ends("αιρ") or ends("φορ") or ends("ταθ")
                or ends("διαθ") or ends("σχ") or ends("ενδ") or ends("ευρ")
                or ends("τιθ") or ends("υπερθ") or ends("ραθ")
                or ends("ενθ") or ends("ροθ") or ends("σθ") or ends("πυρ")
                or ends("αιν") or ends("συνδ") or ends("συν")
                or ends("συνθ") or ends("χωρ") or ends("πον") or ends("βρ")
                or ends("καθ") or ends("ευθ") or ends("εκθ") or ends("νετ")
                or ends("ρον") or ends("αρκ") or ends("βαρ") or ends("βολ")
                or ends("ωφελ")):
            ln += 2
    # rule 10
    if ln > 5 and (ends("οντασ") or ends("ωντασ")):
        ln -= 5
        if ln == 3 and ends("αρχ"):
            ln += 3
            s[ln - 3] = "ο"
        if ends("κρε"):
            ln += 3
            s[ln - 3] = "ω"
    # rule 11
    if ln > 6 and ends("ομαστε"):
        ln -= 6
        if ln == 2 and ends("ον"):
            ln += 5
    elif ln > 7 and ends("ιομαστε"):
        ln -= 7
        if ln == 2 and ends("ον"):
            ln += 5
            s[ln - 5] = "ο"
            s[ln - 4] = "μ"
            s[ln - 3] = "α"
            s[ln - 2] = "σ"
            s[ln - 1] = "τ"
    # rule 12
    if ln > 5 and ends("ιεστε"):
        ln -= 5
        if stem_of(ln) in _EXC12A:
            ln += 4
    if ln > 4 and ends("εστε"):
        ln -= 4
        if stem_of(ln) in _EXC12B:
            ln += 3
    # rule 13
    if ln > 6 and ends("ηθηκεσ"):
        ln -= 6
    elif ln > 5 and (ends("ηθηκα") or ends("ηθηκε")):
        ln -= 5
    removed = False
    if ln > 4 and ends("ηκεσ"):
        ln -= 4
        removed = True
    elif ln > 3 and (ends("ηκα") or ends("ηκε")):
        ln -= 3
        removed = True
    if removed and (stem_of(ln) in _EXC13 or ends("σκωλ")
                    or ends("σκουλ") or ends("ναρθ") or ends("σφ")
                    or ends("οθ") or ends("πιθ")):
        ln += 2
    # rule 14
    removed = False
    if ln > 5 and ends("ουσεσ"):
        ln -= 5
        removed = True
    elif ln > 4 and (ends("ουσα") or ends("ουσε")):
        ln -= 4
        removed = True
    if removed and (stem_of(ln) in _EXC14
                    or (ln and s[ln - 1] in _VOWELS)
                    or ends("ποδαρ") or ends("βλεπ") or ends("πανταχ")
                    or ends("φρυδ") or ends("μαντιλ") or ends("μαλλ")
                    or ends("κυματ") or ends("λαχ") or ends("ληγ")
                    or ends("φαγ") or ends("ομ") or ends("πρωτ")):
        ln += 3
    # rule 15
    removed = False
    if ln > 4 and ends("αγεσ"):
        ln -= 4
        removed = True
    elif ln > 3 and (ends("αγα") or ends("αγε")):
        ln -= 3
        removed = True
    if removed:
        cond1 = (stem_of(ln) in _EXC15A or ends("οφ") or ends("πελ")
                 or ends("χορτ") or ends("λλ") or ends("σφ")
                 or ends("ρπ") or ends("φρ") or ends("πρ")
                 or ends("λοχ") or ends("σμην"))
        cond2 = stem_of(ln) in _EXC15B or ends("κολλ")
        if cond1 and not cond2:
            ln += 2
    # rule 16
    removed = False
    if ln > 4 and ends("ησου"):
        ln -= 4
        removed = True
    elif ln > 3 and (ends("ησε") or ends("ησα")):
        ln -= 3
        removed = True
    if removed and stem_of(ln) in _EXC16:
        ln += 2
    # rule 17
    if ln > 4 and ends("ηστε"):
        ln -= 4
        if stem_of(ln) in _EXC17:
            ln += 3
    # rule 18
    removed = False
    if ln > 6 and (ends("ησουνε") or ends("ηθουνε")):
        ln -= 6
        removed = True
    elif ln > 4 and ends("ουνε"):
        ln -= 4
        removed = True
    if removed and stem_of(ln) in _EXC18:
        ln += 3
        s[ln - 3] = "ο"
        s[ln - 2] = "υ"
        s[ln - 1] = "ν"
    # rule 19
    removed = False
    if ln > 6 and (ends("ησουμε") or ends("ηθουμε")):
        ln -= 6
        removed = True
    elif ln > 4 and ends("ουμε"):
        ln -= 4
        removed = True
    if removed and stem_of(ln) in _EXC19:
        ln += 3
        s[ln - 3] = "ο"
        s[ln - 2] = "υ"
        s[ln - 1] = "μ"
    # rule 20
    if ln > 5 and (ends("ματων") or ends("ματοσ")):
        ln -= 3
    elif ln > 4 and ends("ματα"):
        ln -= 2
    # rule 21 (only if nothing removed so far)
    if ln == orig:
        ln = _rule21(s, ln)
    # rule 22
    if ends("εστερ") or ends("εστατ"):
        ln -= 5
    elif (ends("οτερ") or ends("οτατ") or ends("υτερ") or ends("υτατ")
          or ends("ωτερ") or ends("ωτατ")):
        ln -= 4
    return "".join(s[:ln])


def _rule21(s, ln):
    def ends(suf):
        return ln >= len(suf) and "".join(s[ln - len(suf):ln]) == suf

    if ln > 9 and ends("ιοντουσαν"):
        return ln - 9
    if ln > 8 and (ends("ιομασταν") or ends("ιοσασταν")
                   or ends("ιουμαστε") or ends("οντουσαν")):
        return ln - 8
    if ln > 7 and (ends("ιεμαστε") or ends("ιεσαστε") or ends("ιομουνα")
                   or ends("ιοσαστε") or ends("ιοσουνα") or ends("ιουνται")
                   or ends("ιουνταν") or ends("ηθηκατε") or ends("ομασταν")
                   or ends("οσασταν") or ends("ουμαστε")):
        return ln - 7
    if ln > 6 and (ends("ιομουν") or ends("ιονταν") or ends("ιοσουν")
                   or ends("ηθειτε") or ends("ηθηκαν") or ends("ομουνα")
                   or ends("οσαστε") or ends("οσουνα") or ends("ουνται")
                   or ends("ουνταν") or ends("ουσατε")):
        return ln - 6
    if ln > 5 and (ends("αγατε") or ends("ιεμαι") or ends("ιεται")
                   or ends("ιεσαι") or ends("ιοταν") or ends("ιουμα")
                   or ends("ηθεισ") or ends("ηθουν") or ends("ηκατε")
                   or ends("ησατε") or ends("ησουν") or ends("ομουν")
                   or ends("ονται") or ends("ονταν") or ends("οσουν")
                   or ends("ουμαι") or ends("ουσαν")):
        return ln - 5
    if ln > 4 and (ends("αγαν") or ends("αμαι") or ends("ασαι")
                   or ends("αται") or ends("ειτε") or ends("εσαι")
                   or ends("εται") or ends("ηδεσ") or ends("ηδων")
                   or ends("ηθει") or ends("ηκαν") or ends("ησαν")
                   or ends("ησει") or ends("ησεσ") or ends("ομαι")
                   or ends("οταν")):
        return ln - 4
    if ln > 3 and (ends("αει") or ends("εισ") or ends("ηθω")
                   or ends("ησω") or ends("ουν") or ends("ουσ")):
        return ln - 3
    if ln > 2 and (ends("αν") or ends("ασ") or ends("αω") or ends("ει")
                   or ends("εσ") or ends("ησ") or ends("οι") or ends("οσ")
                   or ends("ου") or ends("υσ") or ends("ων")):
        return ln - 2
    if ln > 1 and s[ln - 1] in _VOWELS:
        return ln - 1
    return ln


def greek_stream(text: str) -> list:
    """The full GreekAnalyzer stream: (term, posInc, start, end).
    GreekLowerCaseFilter runs on the RAW token (before stop/stem)."""
    from .tokenizer import iter_token_spans

    out = []
    pending = 1
    for tok, st, e in iter_token_spans(text):
        t = greek_lower(tok)
        if t in GREEK_STOP:
            pending += 1
            continue
        out.append((greek_stem(t), pending, st, e))
        pending = 1
    return out
