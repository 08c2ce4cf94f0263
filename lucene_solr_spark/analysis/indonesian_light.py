"""IndonesianAnalyzer chain (analysis/id/IndonesianAnalyzer.java):
StandardTokenizer → StandardFilter → LowerCaseFilter →
StopFilter(id stopwords) → IndonesianStemFilter (stemDerivational).

IndonesianStemmer (id/IndonesianStemmer.java, the Asian/Tala
algorithm): syllable budget counted once up front, particle and
possessive-pronoun strips, then the derivational dance — first-order
prefix (meng/meny→s/men/mem/me, peng/peny→s/pen→t/pem, di/ter/ke),
suffix (kan/an/i gated by which prefixes fired), second-order prefix
(ber/bel-ajar/per/pel-ajar/pe) in the rule-fired order. Pinned
bit-for-bit against the COMPILED IndonesianAnalyzer in
tests/test_misc_filters.py (GT round 85c)."""

from __future__ import annotations

INDONESIAN_STOP = frozenset((
    "ada", "adanya", "adalah", "adapun", "agak", "agaknya", "agar",
    "akan", "akankah", "akhirnya", "aku", "akulah", "amat", "amatlah",
    "anda", "andalah", "antar", "diantaranya", "antara", "antaranya",
    "diantara", "apa", "apaan", "mengapa", "apabila", "apakah",
    "apalagi", "apatah", "atau", "ataukah", "ataupun", "bagai",
    "bagaikan", "sebagai", "sebagainya", "bagaimana", "bagaimanapun",
    "sebagaimana", "bagaimanakah", "bagi", "bahkan", "bahwa",
    "bahwasanya", "sebaliknya", "banyak", "sebanyak", "beberapa",
    "seberapa", "begini", "beginian", "beginikah", "beginilah",
    "sebegini", "begitu", "begitukah", "begitulah", "begitupun",
    "sebegitu", "belum", "belumlah", "sebelum", "sebelumnya",
    "sebenarnya", "berapa", "berapakah", "berapalah", "berapapun",
    "betulkah", "sebetulnya", "biasa", "biasanya", "bila", "bilakah",
    "bisa", "bisakah", "sebisanya", "boleh", "bolehkah", "bolehlah",
    "buat", "bukan", "bukankah", "bukanlah", "bukannya", "cuma",
    "percuma", "dahulu", "dalam", "dan", "dapat", "dari", "daripada",
    "dekat", "demi", "demikian", "demikianlah", "sedemikian",
    "dengan", "depan", "di", "dia", "dialah", "dini", "diri",
    "dirinya", "terdiri", "dong", "dulu", "enggak", "enggaknya",
    "entah", "entahlah", "terhadap", "terhadapnya", "hal", "hampir",
    "hanya", "hanyalah", "harus", "haruslah", "harusnya",
    "seharusnya", "hendak", "hendaklah", "hendaknya", "hingga",
    "sehingga", "ia", "ialah", "ibarat", "ingin", "inginkah",
    "inginkan", "ini", "inikah", "inilah", "itu", "itukah", "itulah",
    "jangan", "jangankan", "janganlah", "jika", "jikalau", "juga",
    "justru", "kala", "kalau", "kalaulah", "kalaupun", "kalian",
    "kami", "kamilah", "kamu", "kamulah", "kan", "kapan", "kapankah",
    "kapanpun", "dikarenakan", "karena", "karenanya", "ke", "kecil",
    "kemudian", "kenapa", "kepada", "kepadanya", "ketika", "seketika",
    "khususnya", "kini", "kinilah", "kiranya", "sekiranya", "kita",
    "kitalah", "kok", "lagi", "lagian", "selagi", "lah", "lain",
    "lainnya", "melainkan", "selaku", "lalu", "melalui", "terlalu",
    "lama", "lamanya", "selama", "selama", "selamanya", "lebih",
    "terlebih", "bermacam", "macam", "semacam", "maka", "makanya",
    "makin", "malah", "malahan", "mampu", "mampukah", "mana",
    "manakala", "manalagi", "masih", "masihkah", "semasih", "masing",
    "mau", "maupun", "semaunya", "memang", "mereka", "merekalah",
    "meski", "meskipun", "semula", "mungkin", "mungkinkah", "nah",
    "namun", "nanti", "nantinya", "nyaris", "oleh", "olehnya",
    "seorang", "seseorang", "pada", "padanya", "padahal", "paling",
    "sepanjang", "pantas", "sepantasnya", "sepantasnyalah", "para",
    "pasti", "pastilah", "per", "pernah", "pula", "pun", "merupakan",
    "rupanya", "serupa", "saat", "saatnya", "sesaat", "saja",
    "sajalah", "saling", "bersama", "sama", "sesama", "sambil",
    "sampai", "sana", "sangat", "sangatlah", "saya", "sayalah", "se",
    "sebab", "sebabnya", "sebuah", "tersebut", "tersebutlah",
    "sedang", "sedangkan", "sedikit", "sedikitnya", "segala",
    "segalanya", "segera", "sesegera", "sejak", "sejenak", "sekali",
    "sekalian", "sekalipun", "sesekali", "sekaligus", "sekarang",
    "sekarang", "sekitar", "sekitarnya", "sela", "selain", "selalu",
    "seluruh", "seluruhnya", "semakin", "sementara", "sempat",
    "semua", "semuanya", "sendiri", "sendirinya", "seolah", "seperti",
    "sepertinya", "sering", "seringnya", "serta", "siapa", "siapakah",
    "siapapun", "disini", "disinilah", "sini", "sinilah", "sesuatu",
    "sesuatunya", "suatu", "sesudah", "sesudahnya", "sudah",
    "sudahkah", "sudahlah", "supaya", "tadi", "tadinya", "tak",
    "tanpa", "setelah", "telah", "tentang", "tentu", "tentulah",
    "tentunya", "tertentu", "seterusnya", "tapi", "tetapi", "setiap",
    "tiap", "setidaknya", "tidak", "tidakkah", "tidaklah", "toh",
    "waduh", "wah", "wahai", "sewaktu", "walau", "walaupun", "wong",
    "yaitu", "yakni", "yang",
))


_KE, _PENG, _DI, _MENG, _TER, _BER, _PE = 1, 2, 4, 8, 16, 32, 64
_VOWELS = set("aeiou")


class _Stem:
    def __init__(self, word: str):
        self.s = list(word)
        self.n_syl = sum(1 for c in self.s if c in _VOWELS)
        self.flags = 0

    def _starts(self, p):
        return len(self.s) >= len(p) and "".join(self.s[:len(p)]) == p

    def _ends(self, suf):
        return (len(self.s) >= len(suf)
                and "".join(self.s[len(self.s) - len(suf):]) == suf)

    def particle(self):
        if self._ends("kah") or self._ends("lah") or self._ends("pun"):
            self.n_syl -= 1
            del self.s[-3:]

    def possessive(self):
        if self._ends("ku") or self._ends("mu"):
            self.n_syl -= 1
            del self.s[-2:]
            return
        if self._ends("nya"):
            self.n_syl -= 1
            del self.s[-3:]

    def first_prefix(self):
        s = self.s
        if self._starts("meng"):
            self.flags |= _MENG; self.n_syl -= 1; del s[:4]; return True
        if self._starts("meny") and len(s) > 4 and s[4] in _VOWELS:
            self.flags |= _MENG; s[3] = "s"; self.n_syl -= 1
            del s[:3]; return True
        if self._starts("men"):
            self.flags |= _MENG; self.n_syl -= 1; del s[:3]; return True
        if self._starts("mem"):
            self.flags |= _MENG; self.n_syl -= 1; del s[:3]; return True
        if self._starts("me"):
            self.flags |= _MENG; self.n_syl -= 1; del s[:2]; return True
        if self._starts("peng"):
            self.flags |= _PENG; self.n_syl -= 1; del s[:4]; return True
        if self._starts("peny") and len(s) > 4 and s[4] in _VOWELS:
            self.flags |= _PENG; s[3] = "s"; self.n_syl -= 1
            del s[:3]; return True
        if self._starts("peny"):
            self.flags |= _PENG; self.n_syl -= 1; del s[:4]; return True
        if self._starts("pen") and len(s) > 3 and s[3] in _VOWELS:
            self.flags |= _PENG; s[2] = "t"; self.n_syl -= 1
            del s[:2]; return True
        if self._starts("pen"):
            self.flags |= _PENG; self.n_syl -= 1; del s[:3]; return True
        if self._starts("pem"):
            self.flags |= _PENG; self.n_syl -= 1; del s[:3]; return True
        if self._starts("di"):
            self.flags |= _DI; self.n_syl -= 1; del s[:2]; return True
        if self._starts("ter"):
            self.flags |= _TER; self.n_syl -= 1; del s[:3]; return True
        if self._starts("ke"):
            self.flags |= _KE; self.n_syl -= 1; del s[:2]; return True
        return False

    def second_prefix(self):
        s = self.s
        if self._starts("ber"):
            self.flags |= _BER; self.n_syl -= 1; del s[:3]; return True
        if len(s) == 7 and self._starts("belajar"):
            self.flags |= _BER; self.n_syl -= 1; del s[:3]; return True
        if (self._starts("be") and len(s) > 4 and s[2] not in _VOWELS
                and s[3] == "e" and s[4] == "r"):
            self.flags |= _BER; self.n_syl -= 1; del s[:2]; return True
        if self._starts("per"):
            self.n_syl -= 1; del s[:3]; return True
        if len(s) == 7 and self._starts("pelajar"):
            self.n_syl -= 1; del s[:3]; return True
        if self._starts("pe"):
            self.flags |= _PE; self.n_syl -= 1; del s[:2]; return True
        return False

    def suffix(self):
        if (self._ends("kan") and not self.flags & _KE
                and not self.flags & _PENG and not self.flags & _PE):
            self.n_syl -= 1; del self.s[-3:]; return True
        if (self._ends("an") and not self.flags & _DI
                and not self.flags & _MENG and not self.flags & _TER):
            self.n_syl -= 1; del self.s[-2:]; return True
        if (self._ends("i") and not self._ends("si")
                and not self.flags & _BER and not self.flags & _KE
                and not self.flags & _PENG):
            self.n_syl -= 1; del self.s[-1:]; return True
        return False


def indonesian_stem(word: str, stem_derivational: bool = True) -> str:
    st = _Stem(word)
    if st.n_syl > 2:
        st.particle()
    if st.n_syl > 2:
        st.possessive()
    if stem_derivational:
        old = len(st.s)
        if st.n_syl > 2:
            st.first_prefix()
        if len(st.s) != old:
            old = len(st.s)
            if st.n_syl > 2:
                st.suffix()
            if len(st.s) != old:
                if st.n_syl > 2:
                    st.second_prefix()
        else:
            if st.n_syl > 2:
                st.second_prefix()
            if st.n_syl > 2:
                st.suffix()
    return "".join(st.s)


def indonesian_stream(text: str) -> list:
    """The full IndonesianAnalyzer stream: (term, posInc, start, end)."""
    from .tokenizer import _java_lower, iter_token_spans

    out = []
    pending = 1
    for tok, s, e in iter_token_spans(text):
        t = _java_lower(tok)
        if t in INDONESIAN_STOP:
            pending += 1
            continue
        out.append((indonesian_stem(t), pending, s, e))
        pending = 1
    return out
