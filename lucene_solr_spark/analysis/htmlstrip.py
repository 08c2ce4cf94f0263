"""HTMLStripCharFilter — reference-exact port of the jflex scanner at
lucene/analysis/common/src/java/org/apache/lucene/analysis/charfilter/
HTMLStripCharFilter.jflex (+ HTMLCharacterEntities.jflex).

Pinned bit-for-bit (stripped TEXT and the full correctOffset map) against
the COMPILED generated scanner in tests/test_misc_filters.py (GT round
57). Semantics, replicated rule-for-rule with the spec's own quirks:

* start tags: known INLINE elements (a, b, span, code, img, ...) are
  removed outright; every other tag name substitutes one '\n'; <br>
  variants always substitute '\n'
* end tags take NO attributes (`</div x>` falls back to literal text)
* <script>/<style> swallow their whole body into one '\n' (script/style
  comments shield quoted strings and nested SSIs from the closing tag)
* <!-- comments --> vanish entirely; a NESTED `<!--#` SSI inside a
  comment guards quoted strings so a --> inside quotes doesn't close it
  (a TOP-LEVEL `<!--#` is just a comment — the '#' is ordinary comment
  text, exactly as in the scanner)
* <! ... > declarations vanish, consuming even '<' and '>'-less text
  until the next '>'; <![CDATA[ ... ]]> passes its body through raw
* &amp;-style HTML-4 names and &#NNN; / &#xHHH; references decode with
  the reference's own length caps (>5 hex / >7 decimal digits pass
  through literally), lone surrogate code points become U+FFFD, and
  paired surrogate references (hex/dec in all four combinations) decode
  to the astral pair; a reference at EOF may omit its ';'
* every unfinished construct falls back to literal text, rescanning the
  char that broke it, except at EOF where the scanner's %eof block
  decides include-vs-exclude per state (e.g. `<div` at EOF vanishes
  while `<div ` at EOF is literal)

Offsets are UTF-16 code units; the correction map records the exact
(output offset, cumulative diff) entries BaseCharFilter would.
"""

from __future__ import annotations

import re

from lucene_solr_spark.analysis.charfilters import OffsetMap
from lucene_solr_spark.analysis.misc_filters import _from_u16, _u16

# ---------------------------------------------------------------------------
# HTML-4 character entities (HTMLCharacterEntities.jflex), incl. the six
# uppercase variants the spec accepts.

ENTITY_VALUES: dict[str, str] = {
    "AElig": "Æ", "Aacute": "Á", "Acirc": "Â",
    "Agrave": "À", "Alpha": "Α", "Aring": "Å",
    "Atilde": "Ã", "Auml": "Ä", "Beta": "Β",
    "Ccedil": "Ç", "Chi": "Χ", "Dagger": "‡",
    "Delta": "Δ", "ETH": "Ð", "Eacute": "É",
    "Ecirc": "Ê", "Egrave": "È", "Epsilon": "Ε",
    "Eta": "Η", "Euml": "Ë", "Gamma": "Γ",
    "Iacute": "Í", "Icirc": "Î", "Igrave": "Ì",
    "Iota": "Ι", "Iuml": "Ï", "Kappa": "Κ",
    "Lambda": "Λ", "Mu": "Μ", "Ntilde": "Ñ",
    "Nu": "Ν", "OElig": "Œ", "Oacute": "Ó",
    "Ocirc": "Ô", "Ograve": "Ò", "Omega": "Ω",
    "Omicron": "Ο", "Oslash": "Ø", "Otilde": "Õ",
    "Ouml": "Ö", "Phi": "Φ", "Pi": "Π", "Prime": "″",
    "Psi": "Ψ", "Rho": "Ρ", "Scaron": "Š",
    "Sigma": "Σ", "THORN": "Þ", "Tau": "Τ",
    "Theta": "Θ", "Uacute": "Ú", "Ucirc": "Û",
    "Ugrave": "Ù", "Upsilon": "Υ", "Uuml": "Ü",
    "Xi": "Ξ", "Yacute": "Ý", "Yuml": "Ÿ",
    "Zeta": "Ζ", "aacute": "á", "acirc": "â",
    "acute": "´", "aelig": "æ", "agrave": "à",
    "alefsym": "ℵ", "alpha": "α", "amp": "&", "and": "∧",
    "ang": "∠", "apos": "'", "aring": "å", "asymp": "≈",
    "atilde": "ã", "auml": "ä", "bdquo": "„",
    "beta": "β", "brvbar": "¦", "bull": "•",
    "cap": "∩", "ccedil": "ç", "cedil": "¸",
    "cent": "¢", "chi": "χ", "circ": "ˆ",
    "clubs": "♣", "cong": "≅", "copy": "©",
    "crarr": "↵", "cup": "∪", "curren": "¤",
    "dArr": "⇓", "dagger": "†", "darr": "↓",
    "deg": "°", "delta": "δ", "diams": "♦",
    "divide": "÷", "eacute": "é", "ecirc": "ê",
    "egrave": "è", "empty": "∅", "emsp": " ",
    "ensp": " ", "epsilon": "ε", "equiv": "≡",
    "eta": "η", "eth": "ð", "euml": "ë", "euro": "€",
    "exist": "∃", "fnof": "ƒ", "forall": "∀",
    "frac12": "½", "frac14": "¼", "frac34": "¾",
    "frasl": "⁄", "gamma": "γ", "ge": "≥", "gt": ">",
    "hArr": "⇔", "harr": "↔", "hearts": "♥",
    "hellip": "…", "iacute": "í", "icirc": "î",
    "iexcl": "¡", "igrave": "ì", "image": "ℑ",
    "infin": "∞", "int": "∫", "iota": "ι",
    "iquest": "¿", "isin": "∈", "iuml": "ï",
    "kappa": "κ", "lArr": "⇐", "lambda": "λ",
    "lang": "〈", "laquo": "«", "larr": "←",
    "lceil": "⌈", "ldquo": "“", "le": "≤",
    "lfloor": "⌊", "lowast": "∗", "loz": "◊",
    "lrm": "‎", "lsaquo": "‹", "lsquo": "‘", "lt": "<",
    "macr": "¯", "mdash": "—", "micro": "µ",
    "middot": "·", "minus": "−", "mu": "μ",
    "nabla": "∇", "nbsp": " ", "ndash": "–", "ne": "≠",
    "ni": "∋", "not": "¬", "notin": "∉",
    "nsub": "⊄", "ntilde": "ñ", "nu": "ν",
    "oacute": "ó", "ocirc": "ô", "oelig": "œ",
    "ograve": "ò", "oline": "‾", "omega": "ω",
    "omicron": "ο", "oplus": "⊕", "or": "∨",
    "ordf": "ª", "ordm": "º", "oslash": "ø",
    "otilde": "õ", "otimes": "⊗", "ouml": "ö",
    "para": "¶", "part": "∂", "permil": "‰",
    "perp": "⊥", "phi": "φ", "pi": "π", "piv": "ϖ",
    "plusmn": "±", "pound": "£", "prime": "′",
    "prod": "∏", "prop": "∝", "psi": "ψ", "quot": '"',
    "rArr": "⇒", "radic": "√", "rang": "〉",
    "raquo": "»", "rarr": "→", "rceil": "⌉",
    "rdquo": "”", "real": "ℜ", "reg": "®",
    "rfloor": "⌋", "rho": "ρ", "rlm": "‏",
    "rsaquo": "›", "rsquo": "’", "sbquo": "‚",
    "scaron": "š", "sdot": "⋅", "sect": "§",
    "shy": "­", "sigma": "σ", "sigmaf": "ς",
    "sim": "∼", "spades": "♠", "sub": "⊂",
    "sube": "⊆", "sum": "∑", "sup": "⊃", "sup1": "¹",
    "sup2": "²", "sup3": "³", "supe": "⊇",
    "szlig": "ß", "tau": "τ", "there4": "∴",
    "theta": "θ", "thetasym": "ϑ", "thinsp": " ",
    "thorn": "þ", "tilde": "˜", "times": "×",
    "trade": "™", "uArr": "⇑", "uacute": "ú",
    "uarr": "↑", "ucirc": "û", "ugrave": "ù",
    "uml": "¨", "upsih": "ϒ", "upsilon": "υ",
    "uuml": "ü", "weierp": "℘", "xi": "ξ",
    "yacute": "ý", "yen": "¥", "yuml": "ÿ",
    "zeta": "ζ", "zwj": "‍", "zwnj": "‌",
}
for _name in ("quot", "copy", "gt", "lt", "reg", "amp"):
    ENTITY_VALUES[_name.upper()] = ENTITY_VALUES[_name]

#: entity names longest-first for jflex longest-match
_ENTITY_NAMES = sorted(ENTITY_VALUES, key=len, reverse=True)

# ---------------------------------------------------------------------------
# The tag-tail / open-tag-content grammar as anchored regexes.
# jflex \s in %unicode mode is \p{Whitespace}: NOT \x1c-\x1f, NOT Python's
# full \s — spell the class out.
_WS = (
    "\t\n\x0b\x0c\r \x85\xa0\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a"
    "\u2028\u2029\u202f\u205f\u3000"
)
_S = f"[{_WS}]"


def _ci(word: str) -> str:
    return "".join(f"[{c}{c.upper()}]" for c in word)


_EVENT_SUFFIXES = (
    "abort", "blur", "change", "click", "dblclick", "error", "focus",
    "keydown", "keypress", "keyup", "load", "mousedown", "mousemove",
    "mouseout", "mouseover", "mouseup", "reset", "select", "submit",
    "unload",
)
_SQ = r"'(?:\\'|[^'])*'"
_DQ = r'"(?:\\"|[^"])*"'
_SSI = rf"<!--#(?:[^'\"]|{_SQ}|{_DQ})*-->"
_EVENT = (
    "[oO][nN](?:" + "|".join(_ci(sfx) for sfx in _EVENT_SUFFIXES) + ")"
    + f"{_S}*={_S}*(?:{_SQ}|{_DQ})"
)
_OTC = rf"(?:{_EVENT}|[^<>]|{_SSI})*"

_INLINE_ELEMENTS = (
    "abbr", "acronym", "basefont", "bdo", "big", "cite", "code", "dfn",
    "em", "font", "img", "input", "kbd", "label", "samp", "select",
    "small", "span", "strike", "strong", "sub", "sup", "textarea", "tt",
    "a", "b", "i", "q", "s", "u",
)
_INLINE_RE = re.compile(
    "(?:" + "|".join(_ci(e) for e in _INLINE_ELEMENTS) + ")"
)

# XML Name = [:_ID_Start][-.:_ID_Continue]* ; ID_Start/Continue via the
# str.isidentifier classes plus the spec's extra punctuation. Python's
# identifier classes are XID_*; the handful of ID-only chars don't
# appear in practice and the GT fuzz pins the behavior we rely on.
_NAME_START_EXTRA = ":_"
_NAME_PART_EXTRA = "-.:_"


def _is_id_start(ch: str) -> bool:
    if ch in _NAME_START_EXTRA:
        return True
    return ("a" + ch).isidentifier() and ch.isidentifier()


def _is_id_part(ch: str) -> bool:
    if ch in _NAME_PART_EXTRA:
        return True
    return ("a" + ch).isidentifier()


_TAIL_RE = re.compile(rf"(?:(?:={_S}*|{_S}+){_OTC})?{_S}*/?>")
_END_TAIL_RE = re.compile(rf"{_S}*>")
_PI_RE = re.compile(r"\?[^>]*[/?]>")
_BR_RE = re.compile(rf"{_S}*[bB][rR](?:(?:={_S}*|{_S}+){_OTC})?{_S}*/?>")
_SCRIPT_OPEN_RE = re.compile(
    rf"{_S}*{_ci('script')}(?:{_S}+{_OTC})?{_S}*>"
)
_STYLE_OPEN_RE = re.compile(rf"{_S}*{_ci('style')}(?:{_S}+{_OTC})?{_S}*>")
_BR_END_RE = re.compile(rf"[bB][rR]{_S}*>")
_SCRIPT_CLOSE_RE = re.compile(rf"</{_S}*{_ci('script')}{_S}*>")
_STYLE_CLOSE_RE = re.compile(rf"</{_S}*{_ci('style')}{_S}*>")
_WS_RUN_RE = re.compile(rf"{_S}+")

_SURR_HEX_HEX = re.compile(
    r"#[xX][dD][89aAbB][0-9a-fA-F]{2};&#[xX][dD][c-fC-F][0-9a-fA-F]{2};"
)
_SURR_DEC_HEX = re.compile(
    r"#5[56][0-9]{3};&#[xX][dD][c-fC-F][0-9a-fA-F]{2};"
)
_SURR_HEX_DEC = re.compile(
    r"#[xX][dD][89aAbB][0-9a-fA-F]{2};&#5[67][0-9]{3};"
)
_SURR_DEC_DEC = re.compile(r"#5[56][0-9]{3};&#5[67][0-9]{3};")
_HEX_REF_RE = re.compile(r"[xX][0-9A-Fa-f]+")
_DEC_REF_RE = re.compile(r"[0-9]+")

_REPLACEMENT = "�"
_NL = "\n"


def _to_chars(cp: int) -> list[str]:
    """Character.toChars — UTF-16 units for the code point."""
    if cp <= 0xFFFF:
        return [chr(cp)]
    cp -= 0x10000
    return [chr(0xD800 + (cp >> 10)), chr(0xDC00 + (cp & 0x3FF))]


class _Scanner:
    def __init__(self, text: str, escaped_tags=None):
        self.u = _u16(text)
        self.s = "".join(self.u)  # same length as u (lone units kept)
        self.n = len(self.u)
        self.out: list[str] = []
        self.om = OffsetMap()
        self.cum = 0
        self.escape_br = False
        self.escape_script = False
        self.escape_style = False
        self.escaped: set[str] | None = None
        for tag in escaped_tags or ():
            low = tag.lower()
            if low == "br":
                self.escape_br = True
            elif low == "script":
                self.escape_script = True
            elif low == "style":
                self.escape_style = True
            else:
                if self.escaped is None:
                    self.escaped = set()
                self.escaped.add(low)  # CharArraySet(16, true): ignoreCase

    def _is_escaped(self, name: str) -> bool:
        return self.escaped is not None and name.lower() in self.escaped

    # -- output helpers -----------------------------------------------------
    def _emit(self, units: str) -> None:
        self.out.extend(units)

    def _add(self, out_pos: int, cum: int) -> None:
        self.om.add(out_pos, cum)

    # -- main loop ------------------------------------------------------
    def run(self) -> tuple[str, OffsetMap]:
        i = 0
        while i < self.n:
            c = self.u[i]
            if c == "&":
                i = self._amp(i)
            elif c == "<":
                i = self._lab(i)
            else:
                self.out.append(c)
                i += 1
        return _from_u16(self.out), self.om

    # -- character references --------------------------------------------
    def _char_ref_tail(self, in_seg_len: int, entity: list[str], j: int) -> int:
        """CHARACTER_REFERENCE_TAIL: expect ';' at j; EOF allows bare."""
        if j < self.n and self.u[j] == ";":
            self.cum += in_seg_len + 1 - len(entity)
            self._add(len(self.out) + len(entity), self.cum)
            self._emit("".join(entity))
            return j + 1
        if j >= self.n:
            self.cum += in_seg_len - len(entity)
            self._add(len(self.out) + len(entity), self.cum)
            self._emit("".join(entity))
            return j
        # fallback: emit the raw accumulated input, rescan at j
        self._emit(self.s[j - in_seg_len:j])
        return j

    def _amp(self, start: int) -> int:
        j = start + 1
        if j >= self.n:  # %eof AMPERSAND: include
            self._emit("&")
            return j
        # longest match: the four surrogate-pair rules beat everything
        for pat, kind in (
            (_SURR_HEX_HEX, "hh"), (_SURR_DEC_HEX, "dh"),
            (_SURR_HEX_DEC, "hd"), (_SURR_DEC_DEC, "dd"),
        ):
            m = pat.match(self.s, j)
            if not m:
                continue
            t = m.group(0)
            if kind == "hh":
                high, low = int(t[2:6], 16), int(t[10:14], 16)
            elif kind == "dh":
                high, low = int(t[1:6]), int(t[10:14], 16)
            elif kind == "hd":
                high, low = int(t[2:6], 16), int(t[9:14])
            else:
                high, low = int(t[1:6]), int(t[9:14])
            ok = 0xD800 <= high <= 0xDBFF and 0xDC00 <= low <= 0xDFFF
            if ok:
                # inputSegment = '&' (len 1); subst = 2 units
                self.cum += 1 + len(t) - 2
                self._add(len(self.out) + 2, self.cum)
                self.out.append(chr(high))
                self.out.append(chr(low))
                return j + len(t)
            # runtime check failed: consume only '#' -> NUMERIC_CHARACTER
            return self._numeric(start, j + 1)
        # named entity (longest name)
        for name in _ENTITY_NAMES:
            if self.s.startswith(name, j):
                entity = [ENTITY_VALUES[name]]
                return self._char_ref_tail(1 + len(name), entity, j + len(name))
        if self.u[j] == "#":
            return self._numeric(start, j + 1)
        # fallback [^]: emit '&', rescan at j
        self._emit("&")
        return j

    def _numeric(self, start: int, j: int) -> int:
        """NUMERIC_CHARACTER; inputSegment = s[start:j] ('&#')."""
        if j >= self.n:  # %eof: include
            self._emit(self.s[start:j])
            return j
        m = _HEX_REF_RE.match(self.s, j)
        if m:
            t = m.group(0)
            if len(t) <= 6:
                cp = int(t[1:], 16)
                if cp <= 0x10FFFF:
                    entity = (
                        [_REPLACEMENT] if 0xD800 <= cp <= 0xDFFF
                        else _to_chars(cp)
                    )
                    return self._char_ref_tail(
                        (j - start) + len(t), entity, j + len(t))
            self._emit(self.s[start:j + len(t)])
            return j + len(t)
        m = _DEC_REF_RE.match(self.s, j)
        if m:
            t = m.group(0)
            if len(t) <= 7:
                cp = int(t)
                if cp <= 0x10FFFF:
                    entity = (
                        [_REPLACEMENT] if 0xD800 <= cp <= 0xDFFF
                        else _to_chars(cp)
                    )
                    return self._char_ref_tail(
                        (j - start) + len(t), entity, j + len(t))
            self._emit(self.s[start:j + len(t)])
            return j + len(t)
        # fallback: emit '&#...' raw, rescan at j
        self._emit(self.s[start:j])
        return j

    # -- tags ----------------------------------------------------------------
    def _lab(self, start: int) -> int:
        j = start + 1
        if j >= self.n:  # %eof LEFT_ANGLE_BRACKET: include
            self._emit("<")
            return j
        # collect candidates (text_len, priority, handler); longest wins,
        # ties by rule order. Priorities mirror the spec's rule order:
        # ! / \s+ PI br script style inline name
        cands: list[tuple[int, int, object]] = []
        c = self.u[j]
        if c == "!":
            cands.append((1, 0, ("bang",)))
        if c == "/":
            cands.append((1, 1, ("slash",)))
        mws = _WS_RUN_RE.match(self.s, j)
        if mws:
            cands.append((len(mws.group(0)), 2, ("space", len(mws.group(0)))))
        mpi = _PI_RE.match(self.s, j)
        if mpi:
            cands.append((len(mpi.group(0)), 3, ("pi", len(mpi.group(0)))))
        mbr = _BR_RE.match(self.s, j)
        if mbr:
            cands.append((len(mbr.group(0)), 4, ("br", len(mbr.group(0)))))
        msc = _SCRIPT_OPEN_RE.match(self.s, j)
        if msc:
            cands.append((len(msc.group(0)), 5, ("script", len(msc.group(0)))))
        mst = _STYLE_OPEN_RE.match(self.s, j)
        if mst:
            cands.append((len(mst.group(0)), 6, ("style", len(mst.group(0)))))
        mi = _INLINE_RE.match(self.s, j)
        if mi:
            cands.append((len(mi.group(0)), 7, ("inline", len(mi.group(0)))))
        nl = self._name_len(j)
        if nl:
            cands.append((nl, 8, ("name", nl)))
        if not cands:
            # fallback [^]: emit '<', rescan at j
            self._emit("<")
            return j
        ln, _prio, action = min(cands, key=lambda t: (-t[0], t[1]))
        kind = action[0]
        if kind == "bang":
            return self._bang(start, j + 1)
        if kind == "slash":
            return self._lab_slash(start, j + 1)
        if kind == "space":
            return self._lab_space(start, j + ln)
        if kind == "pi":
            self.cum += (j - start) + ln
            self._add(len(self.out), self.cum)
            return j + ln
        if kind == "br":
            if self.escape_br:
                self._emit(self.s[start:j + ln])
            else:
                self.cum += (j - start) + ln - 1
                self._add(len(self.out) + 1, self.cum)
                self.out.append(_NL)
            return j + ln
        if kind == "script":
            return self._script_or_style(
                start, j + ln, _SCRIPT_CLOSE_RE, self.escape_script)
        if kind == "style":
            return self._script_or_style(
                start, j + ln, _STYLE_CLOSE_RE, self.escape_style)
        # inline / name -> start tag tail
        name = self.s[j:j + ln]
        if self._is_escaped(name):
            mode = "include"
        elif kind == "inline":
            mode = "exclude"
        else:
            mode = "substitute"
        return self._start_tail(start, j + ln, mode)

    def _name_len(self, j: int) -> int:
        if j >= self.n or not _is_id_start(self.u[j]):
            return 0
        k = j + 1
        while k < self.n and _is_id_part(self.u[k]):
            k += 1
        return k - j

    def _lab_space(self, start: int, j: int) -> int:
        # LEFT_ANGLE_BRACKET_SPACE: InlineElment | Name | fallback
        mi = _INLINE_RE.match(self.s, j)
        il = len(mi.group(0)) if mi else 0
        nl = self._name_len(j)
        if il == 0 and nl == 0:
            if j >= self.n:  # %eof: include
                self._emit(self.s[start:j])
                return j
            self._emit(self.s[start:j])
            return j
        if il >= nl:  # tie -> earlier rule (InlineElment)
            name, ln, kind = self.s[j:j + il], il, "inline"
        else:
            name, ln, kind = self.s[j:j + nl], nl, "name"
        if self._is_escaped(name):
            mode = "include"
        elif kind == "inline":
            mode = "exclude"
        else:
            mode = "substitute"
        return self._start_tail(start, j + ln, mode)

    def _start_tail(self, start: int, j: int, mode: str) -> int:
        m = _TAIL_RE.match(self.s, j)
        if not m:
            if j >= self.n:  # %eof
                if mode == "include":
                    self._emit(self.s[start:j])
                else:  # exclude AND substitute both Exclude at EOF
                    self.cum += j - start
                    self._add(len(self.out), self.cum)
                return j
            self._emit(self.s[start:j])
            return j
        ln = len(m.group(0))
        if mode == "include":
            self._emit(self.s[start:j + ln])
        elif mode == "exclude":
            self.cum += (j - start) + ln
            self._add(len(self.out), self.cum)
        else:
            self.cum += (j - start) + ln - 1
            self._add(len(self.out) + 1, self.cum)
            self.out.append(_NL)
        return j + ln

    def _lab_slash(self, start: int, j: int) -> int:
        # LEFT_ANGLE_BRACKET_SLASH: \s+ loops; then br | Inline | Name
        while True:
            mws = _WS_RUN_RE.match(self.s, j)
            wl = len(mws.group(0)) if mws else 0
            mbr = _BR_END_RE.match(self.s, j)
            bl = len(mbr.group(0)) if mbr else 0
            mi = _INLINE_RE.match(self.s, j)
            il = len(mi.group(0)) if mi else 0
            nl = self._name_len(j)
            best = max(wl, bl, il, nl)
            if best == 0:
                if j >= self.n:  # %eof LEFT_ANGLE_BRACKET_SLASH: include
                    self._emit(self.s[start:j])
                    return j
                self._emit(self.s[start:j])
                return j
            if wl == best:  # rule order: \s+ first
                j += wl
                continue
            if bl == best:
                if self.escape_br:
                    self._emit(self.s[start:j + bl])
                else:
                    self.cum += (j - start) + bl - 1
                    self._add(len(self.out) + 1, self.cum)
                    self.out.append(_NL)
                return j + bl
            if il == best:
                name, ln, kind = self.s[j:j + il], il, "inline"
            else:
                name, ln, kind = self.s[j:j + nl], nl, "name"
            if self._is_escaped(name):
                mode = "include"
            elif kind == "inline":
                mode = "exclude"
            else:
                mode = "substitute"
            return self._end_tail(start, j + ln, mode)

    def _end_tail(self, start: int, j: int, mode: str) -> int:
        m = _END_TAIL_RE.match(self.s, j)
        if not m:
            if j >= self.n:
                if mode == "include":
                    self._emit(self.s[start:j])
                else:
                    self.cum += j - start
                    self._add(len(self.out), self.cum)
                return j
            self._emit(self.s[start:j])
            return j
        ln = len(m.group(0))
        if mode == "include":
            self._emit(self.s[start:j + ln])
        elif mode == "exclude":
            self.cum += (j - start) + ln
            self._add(len(self.out), self.cum)
        else:
            self.cum += (j - start) + ln - 1
            self._add(len(self.out) + 1, self.cum)
            self.out.append(_NL)
        return j + ln

    # -- <! ... > ---------------------------------------------------------
    def _bang(self, start: int, j: int) -> int:
        # BANG: inputSegment grows; '--'/'[CDATA[' special only right
        # after '<!'; '>' closes (exclude); EOF -> include
        seg_len = 2  # '<!'
        while True:
            if j >= self.n:  # %eof BANG: include
                self._emit(self.s[start:j])
                return j
            if self.s.startswith("[CDATA[", j):
                if seg_len > 2:
                    seg_len += 7
                    j += 7
                    continue
                self.cum += seg_len + 7
                self._add(len(self.out), self.cum)
                return self._cdata(j + 7)
            if self.s.startswith("--", j):
                if seg_len > 2:
                    seg_len += 2
                    j += 2
                    continue
                return self._comment(start, j + 2)
            if self.u[j] == ">":
                self.cum += seg_len + 1
                self._add(len(self.out), self.cum)
                return j + 1
            seg_len += 1
            j += 1

    def _cdata(self, j: int) -> int:
        while j < self.n:
            if self.s.startswith("]]>", j):
                self.cum += 3
                self._add(len(self.out), self.cum)
                return j + 3
            self.out.append(self.u[j])
            j += 1
        return j  # %eof CDATA: include (nothing pending)

    def _comment(self, start: int, j: int) -> int:
        # COMMENT; '<!--#' -> SSI; '-->' closes; EOF -> exclude
        while True:
            if j >= self.n:
                self.cum += j - start
                self._add(len(self.out), self.cum)
                return j
            if self.s.startswith("<!--#", j):
                j = min(self._ssi(j + 5), self.n)
                continue
            if self.s.startswith("-->", j):
                self.cum += (j - start) + 3
                self._add(len(self.out), self.cum)
                return j + 3
            j += 1

    def _ssi(self, j: int) -> int:
        """SERVER_SIDE_INCLUDE body until '-->' (quote-aware); returns
        the position after '-->' (or n at EOF — caller sees j>=n and
        applies ITS eof rule... no: EOF inside SSI is Exclude)."""
        while True:
            if j >= self.n:
                return self.n + 1  # sentinel: EOF inside SSI/quotes
            if self.s.startswith("-->", j):
                return j + 3
            c = self.u[j]
            if c == "'":
                j = self._quoted(j + 1, "'")
                if j > self.n:
                    return j
                continue
            if c == '"':
                j = self._quoted(j + 1, '"')
                if j > self.n:
                    return j
                continue
            j += 1

    def _quoted(self, j: int, q: str) -> int:
        while True:
            if j >= self.n:
                return self.n + 1
            c = self.u[j]
            if c == "\\":
                j += 2
                continue
            if c == q:
                return j + 1
            j += 1

    def _script_or_style(
        self, start: int, j: int, close_re: re.Pattern, escape: bool
    ) -> int:
        input_start = start
        if escape:
            # emit the open tag raw; content still swallowed
            self._emit(self.s[start:j])
            input_start = j  # inputStart += 1 + yylength()
        while True:
            if j >= self.n:  # %eof SCRIPT/STYLE: exclude
                self.cum += j - input_start
                self._add(len(self.out), self.cum)
                return j
            if self.s.startswith("<!--", j):
                j = self._sc_comment(j + 4)
                if j > self.n:  # EOF inside comment/quotes: exclude
                    self.cum += self.n - input_start
                    self._add(len(self.out), self.cum)
                    return self.n
                continue
            m = close_re.match(self.s, j)
            if m:
                ln = len(m.group(0))
                self.cum += j - input_start
                pos = len(self.out)
                if escape:
                    self._add(pos, self.cum)
                    self._emit(self.s[j:j + ln])
                else:
                    self.cum += ln - 1
                    self._add(pos + 1, self.cum)
                    self.out.append(_NL)
                return j + ln
            j += 1

    def _sc_comment(self, j: int) -> int:
        # SCRIPT_COMMENT / STYLE_COMMENT: quotes + nested SSI + '-->'
        while True:
            if j >= self.n:
                return self.n + 1
            if self.s.startswith("<!--#", j):
                j = self._ssi(j + 5)
                if j > self.n:
                    return j
                continue
            if self.s.startswith("-->", j):
                return j + 3
            c = self.u[j]
            if c == "'":
                j = self._quoted(j + 1, "'")
                if j > self.n:
                    return j
                continue
            if c == '"':
                j = self._quoted(j + 1, '"')
                if j > self.n:
                    return j
                continue
            j += 1


def html_strip(
    text: str, escaped_tags=None
) -> tuple[str, OffsetMap]:
    """Strip HTML constructs; returns (output text, offset map). The
    map's correct() gives output-offset -> input-offset in UTF-16 units,
    exactly as HTMLStripCharFilter.correctOffset."""
    return _Scanner(text, escaped_tags).run()
