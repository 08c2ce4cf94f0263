"""HindiAnalyzer chain (analysis/hi/HindiAnalyzer.java):
StandardTokenizer → LowerCaseFilter → DecimalDigitFilter →
IndicNormalizationFilter (the 9-script compose table,
in/IndicNormalizer.java — first-match decomposition rewriting with the
same-block and ZWJ rules) → HindiNormalizationFilter (Devanagari
orthographic folds: nukta deletion, anusvara unification, virama and
ZWJ/ZWNJ deletion, vowel/matra shortening) → StopFilter(hi stopwords)
→ HindiStemFilter (suffix ladder by length class). Pinned bit-for-bit
against the COMPILED HindiAnalyzer in tests/test_misc_filters.py (GT
round 85c)."""

from __future__ import annotations

HINDI_STOP = frozenset((
    "अंदर", "अत", "अपना", "अपनी", "अपने", "अभी", "आदि", "आप",
    "इत्यादि", "इन", "इनका", "इन्हीं", "इन्हें", "इन्हों", "इस",
    "इसका", "इसकी", "इसके", "इसमें", "इसी", "इसे", "उन", "उनका",
    "उनकी", "उनके", "उनको", "उन्हीं", "उन्हें", "उन्हों", "उस",
    "उसके", "उसी", "उसे", "एक", "एवं", "एस", "ऐसे", "और", "कई", "कर",
    "करता", "करते", "करना", "करने", "करें", "कहते", "कहा", "का",
    "काफ़ी", "कि", "कितना", "किन्हें", "किन्हों", "किया", "किर", "किस",
    "किसी", "किसे", "की", "कुछ", "कुल", "के", "को", "कोई", "कौन",
    "कौनसा", "गया", "घर", "जब", "जहाँ", "जा", "जितना", "जिन",
    "जिन्हें", "जिन्हों", "जिस", "जिसे", "जीधर", "जैसा", "जैसे", "जो",
    "तक", "तब", "तरह", "तिन", "तिन्हें", "तिन्हों", "तिस", "तिसे",
    "तो", "था", "थी", "थे", "दबारा", "दिया", "दुसरा", "दूसरे", "दो",
    "द्वारा", "न", "नहीं", "ना", "निहायत", "नीचे", "ने", "पर", "पर",
    "पहले", "पूरा", "पे", "फिर", "बनी", "बही", "बहुत", "बाद", "बाला",
    "बिलकुल", "भी", "भीतर", "मगर", "मानो", "मे", "में", "यदि", "यह",
    "यहाँ", "यही", "या", "यिह", "ये", "रखें", "रहा", "रहे", "ऱ्वासा",
    "लिए", "लिये", "लेकिन", "व", "वर्ग", "वह", "वह", "वहाँ", "वहीं",
    "वाले", "वुह", "वे", "वग़ैरह", "संग", "सकता", "सकते", "सबसे",
    "सभी", "साथ", "साबुत", "साभ", "सारा", "से", "सो", "ही", "हुआ",
    "हुई", "हुए", "है", "हैं", "हो", "होता", "होती", "होते", "होना",
    "होने", "अपनि", "जेसे", "होति", "सभि", "तिंहों", "इंहों", "दवारा",
    "इसि", "किंहें", "थि", "उंहों", "ओर", "जिंहें", "वहिं", "अभि",
    "बनि", "हि", "उंहिं", "उंहें", "हें", "वगेरह", "एसे", "रवासा",
    "कोन", "निचे", "काफि", "उसि", "पुरा", "भितर", "हे", "बहि", "वहां",
    "कोइ", "यहां", "जिंहों", "तिंहें", "किसि", "कइ", "यहि", "इंहिं",
    "जिधर", "इंहें", "अदि", "इतयादि", "हुइ", "कोनसा", "इसकि", "दुसरे",
    "जहां", "अप", "किंहों", "उनकि", "भि", "वरग", "हुअ", "जेसा",
    "नहिं",
))


#: (block base, flag) per script range start
_SCRIPTS = (
    (0x0900, 1), (0x0980, 2), (0x0A00, 4), (0x0A80, 8), (0x0B00, 16),
    (0x0B80, 32), (0x0C00, 64), (0x0C80, 128), (0x0D00, 256),
)
_D, _B, _GM, _GJ, _OR, _TA, _TE, _KA, _MA = 1, 2, 4, 8, 16, 32, 64, 128, 256

#: IndicNormalizer.decompositions, same order (first match wins)
_DECOMP = (
    (0x05, 0x3E, 0x45, 0x11, _D | _GJ),
    (0x05, 0x3E, 0x46, 0x12, _D),
    (0x05, 0x3E, 0x47, 0x13, _D | _GJ),
    (0x05, 0x3E, 0x48, 0x14, _D | _GJ),
    (0x05, 0x3E, -1, 0x06, _D | _B | _GM | _GJ | _OR),
    (0x05, 0x45, -1, 0x72, _D),
    (0x05, 0x45, -1, 0x0D, _GJ),
    (0x05, 0x46, -1, 0x04, _D),
    (0x05, 0x47, -1, 0x0F, _GJ),
    (0x05, 0x48, -1, 0x10, _GM | _GJ),
    (0x05, 0x49, -1, 0x11, _D | _GJ),
    (0x05, 0x4A, -1, 0x12, _D),
    (0x05, 0x4B, -1, 0x13, _D | _GJ),
    (0x05, 0x4C, -1, 0x14, _D | _GM | _GJ),
    (0x06, 0x45, -1, 0x11, _D | _GJ),
    (0x06, 0x46, -1, 0x12, _D),
    (0x06, 0x47, -1, 0x13, _D | _GJ),
    (0x06, 0x48, -1, 0x14, _D | _GJ),
    (0x07, 0x57, -1, 0x08, _MA),
    (0x09, 0x41, -1, 0x0A, _D),
    (0x09, 0x57, -1, 0x0A, _TA | _MA),
    (0x0E, 0x46, -1, 0x10, _MA),
    (0x0F, 0x45, -1, 0x0D, _D),
    (0x0F, 0x46, -1, 0x0E, _D),
    (0x0F, 0x47, -1, 0x10, _D),
    (0x0F, 0x57, -1, 0x10, _OR),
    (0x12, 0x3E, -1, 0x13, _MA),
    (0x12, 0x4C, -1, 0x14, _TE | _KA),
    (0x12, 0x55, -1, 0x13, _TE),
    (0x12, 0x57, -1, 0x14, _TA | _MA),
    (0x13, 0x57, -1, 0x14, _OR),
    (0x15, 0x3C, -1, 0x58, _D),
    (0x16, 0x3C, -1, 0x59, _D | _GM),
    (0x17, 0x3C, -1, 0x5A, _D | _GM),
    (0x1C, 0x3C, -1, 0x5B, _D | _GM),
    (0x21, 0x3C, -1, 0x5C, _D | _B | _OR),
    (0x22, 0x3C, -1, 0x5D, _D | _B | _OR),
    (0x23, 0x4D, 0xFF, 0x7A, _MA),
    (0x24, 0x4D, 0xFF, 0x4E, _B),
    (0x28, 0x3C, -1, 0x29, _D),
    (0x28, 0x4D, 0xFF, 0x7B, _MA),
    (0x2B, 0x3C, -1, 0x5E, _D | _GM),
    (0x2F, 0x3C, -1, 0x5F, _D | _B),
    (0x2C, 0x41, 0x41, 0x0B, _TE),
    (0x30, 0x3C, -1, 0x31, _D),
    (0x30, 0x4D, 0xFF, 0x7C, _MA),
    (0x32, 0x4D, 0xFF, 0x7D, _MA),
    (0x33, 0x3C, -1, 0x34, _D),
    (0x33, 0x4D, 0xFF, 0x7E, _MA),
    (0x35, 0x41, -1, 0x2E, _TE),
    (0x3E, 0x45, -1, 0x49, _D | _GJ),
    (0x3E, 0x46, -1, 0x4A, _D),
    (0x3E, 0x47, -1, 0x4B, _D | _GJ),
    (0x3E, 0x48, -1, 0x4C, _D | _GJ),
    (0x3F, 0x55, -1, 0x40, _KA),
    (0x41, 0x41, -1, 0x42, _GM),
    (0x46, 0x3E, -1, 0x4A, _TA | _MA),
    (0x46, 0x42, 0x55, 0x4B, _KA),
    (0x46, 0x42, -1, 0x4A, _KA),
    (0x46, 0x46, -1, 0x48, _MA),
    (0x46, 0x55, -1, 0x47, _TE | _KA),
    (0x46, 0x56, -1, 0x48, _TE | _KA),
    (0x46, 0x57, -1, 0x4C, _TA | _MA),
    (0x47, 0x3E, -1, 0x4B, _B | _OR | _TA | _MA),
    (0x47, 0x57, -1, 0x4C, _B | _OR),
    (0x4A, 0x55, -1, 0x4B, _KA),
    (0x72, 0x3F, -1, 0x07, _GM),
    (0x72, 0x40, -1, 0x08, _GM),
    (0x72, 0x47, -1, 0x0F, _GM),
    (0x73, 0x41, -1, 0x09, _GM),
    (0x73, 0x42, -1, 0x0A, _GM),
    (0x73, 0x4B, -1, 0x13, _GM),
)

_DECOMP_MASK = {}
for base, flag in _SCRIPTS:
    _DECOMP_MASK[base] = {d[0] for d in _DECOMP if d[4] & flag}


def _block_of(cp: int):
    # every Indic block here is 0x80 wide (U+0900-097F ... U+0D00-0D7F)
    for base, flag in _SCRIPTS:
        if base <= cp < base + 0x80:
            return base, flag
    return None


def indic_normalize(word: str) -> str:
    s = list(word)
    ln = len(s)
    i = 0
    while i < ln:
        blk = _block_of(ord(s[i]))
        if blk is not None:
            base, flag = blk
            ch = ord(s[i]) - base
            if ch in _DECOMP_MASK[base]:
                # compose
                if i + 1 < ln:
                    b1 = _block_of(ord(s[i + 1]))
                    if b1 is not None and b1[0] == base:
                        ch1 = ord(s[i + 1]) - base
                        ch2 = -1
                        if i + 2 < ln:
                            if s[i + 2] == "‍":
                                ch2 = 0xFF
                            else:
                                b2 = _block_of(ord(s[i + 2]))
                                if b2 is not None and b2[0] == base:
                                    ch2 = ord(s[i + 2]) - base
                        for d0, d1, d2, res, flags in _DECOMP:
                            if d0 == ch and (flags & flag):
                                if d1 == ch1 and (d2 < 0 or d2 == ch2):
                                    s[i] = chr(base + res)
                                    del s[i + 1]
                                    ln -= 1
                                    if d2 >= 0:
                                        del s[i + 1]
                                        ln -= 1
                                    break
        i += 1
    return "".join(s[:ln])


_HI_MAP = {
    "ँ": "ं", "ऩ": "न", "ऱ": "र",
    "ऴ": "ळ", "क़": "क", "ख़": "ख",
    "ग़": "ग", "ज़": "ज", "ड़": "ड",
    "ढ़": "ढ", "फ़": "फ", "य़": "य",
    "ॅ": "े", "ॆ": "े", "ॉ": "ो",
    "ॊ": "ो", "ऍ": "ए", "ऎ": "ए",
    "ऑ": "ओ", "ऒ": "ओ", "ॲ": "अ",
    "आ": "अ", "ई": "इ", "ऊ": "उ",
    "ॠ": "ऋ", "ॡ": "ऌ", "ऐ": "ए",
    "औ": "ओ", "ी": "ि", "ू": "ु",
    "ॄ": "ृ", "ॣ": "ॢ", "ै": "े",
    "ौ": "ो",
}
_HI_DELETE = {"़", "‍", "‌", "्"}


def hindi_normalize(word: str) -> str:
    s = list(word)
    i = 0
    while i < len(s):
        c = s[i]
        if c == "न" and i + 1 < len(s) and s[i + 1] == "्":
            s[i] = "ं"
            del s[i + 1]
        elif c in _HI_DELETE:
            del s[i]
            continue
        elif c in _HI_MAP:
            s[i] = _HI_MAP[c]
        i += 1
    return "".join(s)


_ST5 = ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां")
_ST4 = ("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
        "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
        "ियों", "ियां")
_ST3 = ("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
        "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
        "ुआं")
_ST2 = ("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं",
        "ती", "ता", "ाँ", "ां", "ों", "ें")
_ST1 = ("ो", "े", "ू", "ु", "ी", "ि", "ा")


def hindi_stem(word: str) -> str:
    ln = len(word)
    if ln > 6 and word.endswith(_ST5):
        return word[:-5]
    if ln > 5 and word.endswith(_ST4):
        return word[:-4]
    if ln > 4 and word.endswith(_ST3):
        return word[:-3]
    if ln > 3 and word.endswith(_ST2):
        return word[:-2]
    if ln > 2 and word.endswith(_ST1):
        return word[:-1]
    return word


def hindi_stream(text: str) -> list:
    """The full HindiAnalyzer stream: (term, posInc, start, end)."""
    from .misc_filters import decimal_digit_filter, keyword_token
    from .tokenizer import _java_lower, iter_token_spans

    out = []
    pending = 1
    for tok, s, e in iter_token_spans(text):
        t = _java_lower(tok)
        t = decimal_digit_filter(keyword_token(t))[0][0]
        t = hindi_normalize(indic_normalize(t))
        if t in HINDI_STOP:
            pending += 1
            continue
        out.append((hindi_stem(t), pending, s, e))
        pending = 1
    return out
