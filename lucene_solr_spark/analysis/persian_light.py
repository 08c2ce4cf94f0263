"""PersianAnalyzer chain (analysis/fa/PersianAnalyzer.java):
StandardTokenizer → LowerCaseFilter → DecimalDigitFilter →
ArabicNormalizationFilter → PersianNormalizationFilter →
StopFilter(fa/stopwords.txt — the list is pre-normalized, so the stop
check runs AFTER normalization, the reverse of Arabic's order). No
stemmer. PersianNormalizer folds farsi yeh / yeh barree → yeh,
keheh → kaf, heh+yeh / heh goal → heh, and deletes hamza-above.
Pinned bit-for-bit against the COMPILED PersianAnalyzer in
tests/test_misc_filters.py (GT round 85c)."""

from __future__ import annotations

from .arabic_light import arabic_normalize

PERSIAN_STOP = frozenset((
    "انان", "نداشته", "سراسر", "خياه", "ايشان", "وي", "تاكنون",
    "بيشتري", "دوم", "پس", "ناشي", "وگو", "يا", "داشتند", "سپس",
    "هنگام", "هرگز", "پنج", "نشان", "امسال", "ديگر", "گروهي", "شدند",
    "چطور", "ده", "و", "دو", "نخستين", "ولي", "چرا", "چه", "وسط", "ه",
    "كدام", "قابل", "يك", "رفت", "هفت", "همچنين", "در", "هزار", "بله",
    "بلي", "شايد", "اما", "شناسي", "گرفته", "دهد", "داشته", "دانست",
    "داشتن", "خواهيم", "ميليارد", "وقتيكه", "امد", "خواهد", "جز",
    "اورده", "شده", "بلكه", "خدمات", "شدن", "برخي", "نبود", "بسياري",
    "جلوگيري", "حق", "كردند", "نوعي", "بعري", "نكرده", "نظير",
    "نبايد", "بوده", "بودن", "داد", "اورد", "هست", "جايي", "شود",
    "دنبال", "داده", "بايد", "سابق", "هيچ", "همان", "انجا", "كمتر",
    "كجاست", "گردد", "كسي", "تر", "مردم", "تان", "دادن", "بودند",
    "سري", "جدا", "ندارند", "مگر", "يكديگر", "دارد", "دهند",
    "بنابراين", "هنگامي", "سمت", "جا", "انچه", "خود", "دادند", "زياد",
    "دارند", "اثر", "بدون", "بهترين", "بيشتر", "البته", "به",
    "براساس", "بيرون", "كرد", "بعضي", "گرفت", "توي", "اي", "ميليون",
    "او", "جريان", "تول", "بر", "مانند", "برابر", "باشيم", "مدتي",
    "گويند", "اكنون", "تا", "تنها", "جديد", "چند", "بي", "نشده",
    "كردن", "كردم", "گويد", "كرده", "كنيم", "نمي", "نزد", "روي",
    "قصد", "فقط", "بالاي", "ديگران", "اين", "ديروز", "توسط", "سوم",
    "ايم", "دانند", "سوي", "استفاده", "شما", "كنار", "داريم", "ساخته",
    "طور", "امده", "رفته", "نخست", "بيست", "نزديك", "طي", "كنيد",
    "از", "انها", "تمامي", "داشت", "يكي", "طريق", "اش", "چيست", "روب",
    "نمايد", "گفت", "چندين", "چيزي", "تواند", "ام", "ايا", "با", "ان",
    "ايد", "ترين", "اينكه", "ديگري", "راه", "هايي", "بروز", "همچنان",
    "پاعين", "كس", "حدود", "مختلف", "مقابل", "چيز", "گيرد", "ندارد",
    "ضد", "همچون", "سازي", "شان", "مورد", "باره", "مرسي", "خويش",
    "برخوردار", "چون", "خارج", "شش", "هنوز", "تحت", "ضمن", "هستيم",
    "گفته", "فكر", "بسيار", "پيش", "براي", "روزهاي", "انكه", "نخواهد",
    "بالا", "كل", "وقتي", "كي", "چنين", "كه", "گيري", "نيست", "است",
    "كجا", "كند", "نيز", "يابد", "بندي", "حتي", "توانند", "عقب",
    "خواست", "كنند", "بين", "تمام", "همه", "ما", "باشند", "مثل", "شد",
    "اري", "باشد", "اره", "طبق", "بعد", "اگر", "صورت", "غير", "جاي",
    "بيش", "ريزي", "اند", "زيرا", "چگونه", "بار", "لطفا", "مي",
    "درباره", "من", "ديده", "همين", "گذاري", "برداري", "علت",
    "گذاشته", "هم", "فوق", "نه", "ها", "شوند", "اباد", "همواره", "هر",
    "اول", "خواهند", "چهار", "نام", "امروز", "مان", "هاي", "قبل",
    "كنم", "سعي", "تازه", "را", "هستند", "زير", "جلوي", "عنوان",
    "بود",
))


_YEH, _KAF, _HEH = "ي", "ك", "ه"
_TO_YEH = set("یے")
_TO_HEH = set("ۀہ")
_HAMZA_ABOVE = "ٔ"


def persian_normalize(word: str) -> str:
    out = []
    for c in word:
        if c == _HAMZA_ABOVE:
            continue
        if c in _TO_YEH:
            out.append(_YEH)
        elif c == "ک":
            out.append(_KAF)
        elif c in _TO_HEH:
            out.append(_HEH)
        else:
            out.append(c)
    return "".join(out)


def persian_stream(text: str) -> list:
    """The full PersianAnalyzer stream: (term, posInc, start, end).
    PersianCharFilter runs FIRST (initReader): ZWNJ → space, a 1:1
    replacement so offsets stay aligned — compound forms like
    می‌خوانم tokenize as two words."""
    from .misc_filters import decimal_digit_filter, keyword_token
    from .tokenizer import _java_lower, iter_token_spans

    out = []
    pending = 1
    for tok, s, e in iter_token_spans(text.replace("‌", " ")):
        t = _java_lower(tok)
        t = decimal_digit_filter(keyword_token(t))[0][0]
        t = persian_normalize(arabic_normalize(t))
        if t in PERSIAN_STOP:
            pending += 1
            continue
        out.append((t, pending, s, e))
        pending = 1
    return out
