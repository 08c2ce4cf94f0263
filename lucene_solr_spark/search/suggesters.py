"""The FST completion-lookup family (lucene/suggest), reproduced over
plain (key, weight) entry lists and pinned bit-for-bit against the
compiled classes in tests/test_lucene_ground_truth.py (ground-truth
round 27):

* WFSTCompletionLookup (suggest/fst/WFSTCompletionLookup.java) —
  cost = Integer.MAX_VALUE - weight packed in a WFST; top-num
  completions by cost ascending (weight DESC), ties by suffix byte
  order; exactFirst reserves the first slot for the exact key and
  excludes the empty completion from the search (:187-196).
* FSTCompletionLookup (suggest/fst/FSTCompletion*.java) — weights
  DISCRETIZED into 10 buckets at build: entries sorted by (weight, key
  bytes), bucket = line*buckets/count with equal weights keeping the
  previous line's bucket; lookup walks bucket arcs HIGHEST first,
  collecting completions in key order. The default lookup path
  (onlyMorePopular=false → lookupSortedAlphabetically) collects with
  collectAll=true — once `num` results exist every later bucket with
  matches still contributes its FIRST completion (collect() adds before
  checking, :265-268) — then sorts alphabetically and trims; the
  onlyMorePopular path keeps weight order and promotes the exact match
  to the front only when the result list FILLED (:276-291). Values are
  bucket indexes, not weights.
* AnalyzingSuggester (suggest/analyzing/AnalyzingSuggester.java) —
  entries analyzed (whitespace tokens joined by the 0x1f SEP_LABEL,
  PRESERVE_SEP); a key matches entries whose analyzed form extends the
  key's analyzed form; results by weight DESC (cost = Integer.MAX_VALUE
  - weight), ties by analyzed byte order; exactFirst emits the entry
  whose SURFACE equals the key first and excludes it from the main
  search (sameSurfaceForm, :748-786).
* FuzzySuggester (suggest/analyzing/FuzzySuggester.java) — same scoring
  but the key automaton is fuzzed: accepted strings keep the first
  DEFAULT_NON_FUZZY_PREFIX=1 byte exact and allow maxEdits=1
  (transpositions primitive) on the rest, except keys shorter than
  DEFAULT_MIN_FUZZY_LENGTH=3 which stay exact (:toLevenshteinAutomata).
"""

from __future__ import annotations

from .fuzzy import osa_distance

SEP = "\x1f"  # AnalyzingSuggester.SEP_LABEL


def _analyzed(s: str) -> str:
    a = SEP.join(s.split())
    # TokenStreamToAutomaton.java:196-206: characters past the last
    # token's endOffset (trailing whitespace) add ONE POS_SEP transition
    # to a fresh end state — so "sort " analyzes to sort+SEP and only
    # multi-token completions whose next token follows can match
    # (pinned vs the compiled AnalyzingSuggester, GT round 27b)
    if a and s != s.rstrip():
        a += SEP
    return a


def wfst_lookup(entries, key: str, num: int, exact_first: bool = True):
    """WFSTCompletionLookup.lookup. entries = [(key, weight)], unique
    keys, weights in [0, Integer.MAX_VALUE]."""
    matches = [(k, w) for k, w in entries if k.startswith(key)]
    if not matches:
        return []
    results: list[tuple[str, int]] = []
    exact = next(((k, w) for k, w in matches if k == key), None)
    if exact_first and exact is not None:
        results.append(exact)
        num -= 1
        if num == 0:
            return results
    pool = [
        (k, w) for k, w in matches
        if not (exact_first and exact is not None and k == key)
    ]
    pool.sort(key=lambda e: (-e[1], e[0].encode("utf-8")))
    results.extend(pool[:num])
    return results


def _fst_buckets(entries, buckets: int = 10):
    """FSTCompletionLookup.build bucket assignment: entries sorted by
    (encoded weight int bytes, key bytes) — ascending weight — bucket =
    line*buckets/count, equal weights keeping the previous bucket."""
    lines = sorted(entries, key=lambda e: (e[1], e[0].encode("utf-8")))
    count = len(lines)
    out = {}
    prev_w = prev_b = None
    for line, (k, w) in enumerate(lines):
        if line > 0 and w == prev_w:
            b = prev_b
        else:
            b = line * buckets // count
        out[k] = b
        prev_w, prev_b = w, b
    return out


def fst_bucket_lookup(
    entries, key: str, num: int, buckets: int = 10,
    exact_first: bool = True, weighted: bool = False,
):
    """FSTCompletionLookup.lookup: weighted=False is the default
    Lookup.lookup path (alphabetical result order via collectAll);
    weighted=True is the onlyMorePopular path (bucket-desc order with
    exact-match promotion). Values are BUCKETS."""
    if not key:
        return []
    kb = _fst_buckets(entries, buckets)
    per_bucket: dict[int, list[str]] = {}
    for k, b in kb.items():
        if k.startswith(key):
            per_bucket.setdefault(b, []).append(k)
    res: list[tuple[str, int]] = []
    filled = False
    for b in sorted(per_bucket, reverse=True):
        terms = sorted(per_bucket[b], key=lambda t: t.encode("utf-8"))
        if filled:
            if not weighted:
                # collectAll: collect() adds the bucket's first
                # completion before noticing res is already full
                res.append((terms[0], b))
            continue
        for t in terms:
            res.append((t, b))
            if len(res) >= num:
                filled = True
                break
        if filled and weighted:
            if exact_first:
                ix = next((i for i, r in enumerate(res) if r[0] == key), None)
                if ix is not None:
                    res.insert(0, res.pop(ix))
                elif key in kb:
                    while len(res) >= num:
                        res.pop()
                    res.insert(0, (key, kb[key]))
            break
    if not weighted:
        res.sort(key=lambda r: r[0].encode("utf-8"))
        res = res[:num]
    return res


def analyzing_lookup(
    entries, key: str, num: int, exact_first: bool = True,
    fuzzy: bool = False, max_edits: int = 1, non_fuzzy_prefix: int = 1,
    min_fuzzy_length: int = 3,
):
    """AnalyzingSuggester.lookup (fuzzy=True: FuzzySuggester defaults).
    entries = [(surface, weight)], unique surfaces with unique analyzed
    forms; whitespace analysis."""
    ak = _analyzed(key)

    if fuzzy and len(ak) > non_fuzzy_prefix and len(ak) >= min_fuzzy_length:
        head, rest = ak[:non_fuzzy_prefix], ak[non_fuzzy_prefix:]

        def accept(a: str) -> bool:
            # some accepted string (head + t, osa(t, rest) <= max_edits)
            # must be a prefix of the analyzed entry
            lo = max(non_fuzzy_prefix, len(ak) - max_edits)
            hi = min(len(a), len(ak) + max_edits)
            for ln in range(lo, hi + 1):
                p = a[:ln]
                if p[:non_fuzzy_prefix] != head:
                    continue
                if osa_distance(p[non_fuzzy_prefix:], rest) <= max_edits:
                    return True
            return False
    else:
        def accept(a: str) -> bool:
            return a.startswith(ak)

    matches = [(k, w) for k, w in entries if accept(_analyzed(k))]
    if not matches:
        return []
    results: list[tuple[str, int]] = []
    exact = next(((k, w) for k, w in matches if k == key), None)
    if exact_first and exact is not None:
        results.append(exact)
        if len(results) == num:
            return results
    pool = [
        (k, w) for k, w in matches
        if not (exact_first and exact is not None and k == key)
    ]
    pool.sort(key=lambda e: (-e[1], _analyzed(e[0]).encode("utf-8")))
    results.extend(pool[: num - len(results)])
    return results


# ---------------------------------------------------------------------------
# TSTLookup + JaspellLookup (ground-truth round 33)


class _TTN:
    """TernaryTreeNode (suggest/tst/TernaryTreeNode.java)."""

    __slots__ = ("c", "lo", "eq", "hi", "token", "val")

    def __init__(self, c: str = "\0"):
        self.c = c
        self.lo = self.eq = self.hi = None
        self.token = None
        self.val = None


def _tst_insert(cur, s: str, val, x: int):
    """TSTAutocomplete.insert (suggest/tst/TSTAutocomplete.java:40-75),
    including the quirk that the pre-made root node's splitchar is
    '\\0' so the whole tree hangs off its hiKid."""
    if cur is None:
        cur = _TTN(s[x])
        if x < len(s) - 1:
            cur.eq = _tst_insert(cur.eq, s, val, x + 1)
        else:
            cur.token = s
            cur.val = val
        return cur
    if cur.c > s[x]:
        cur.lo = _tst_insert(cur.lo, s, val, x)
    elif cur.c == s[x]:
        if x < len(s) - 1:
            cur.eq = _tst_insert(cur.eq, s, val, x + 1)
        else:
            cur.token = s
            cur.val = val
    else:
        cur.hi = _tst_insert(cur.hi, s, val, x)
    return cur


def _tst_balanced(tokens, vals, lo: int, hi: int, root) -> None:
    """TSTAutocomplete.balancedTree: middle-first insertion, so the
    traversal order (and therefore the UNPOPULAR lookup's result order)
    is a deterministic function of the sorted entry array."""
    if lo > hi:
        return
    mid = (lo + hi) // 2
    _tst_insert(root, tokens[mid], vals[mid], 0)
    _tst_balanced(tokens, vals, lo, mid - 1, root)
    _tst_balanced(tokens, vals, mid + 1, hi, root)


def _tst_prefix_completion(root, s: str):
    """TSTAutocomplete.prefixCompletion: descend to the prefix node,
    then an explicit-STACK DFS (push eqKid, loKid, hiKid — so hiKid
    pops first); the result order is this walk, not sorted order."""
    p = root
    x = 0
    while p is not None:
        if s[x] < p.c:
            p = p.lo
        elif s[x] == p.c:
            if x == len(s) - 1:
                break
            x += 1
            p = p.eq
        else:
            p = p.hi
    if p is None:
        return []
    if p.eq is None and p.token is None:
        return []
    if p.eq is None:
        return [p]
    out = []
    if p.token is not None:
        out.append(p)
    st = [p.eq]
    while st:
        top = st.pop()
        if top.token is not None:
            out.append(top)
        if top.eq is not None:
            st.append(top.eq)
        if top.lo is not None:
            st.append(top.lo)
        if top.hi is not None:
            st.append(top.hi)
    return out


def _lookup_pq_topn(items, num: int):
    """LookupPriorityQueue (suggest/Lookup.java): the reference
    PriorityQueue bounded at `num` with lessThan = value <, filled in
    item order via insertWithOverflow; getResults pops ascending into
    the array tail, returning weight-DESC with heap-layout tie order."""
    heap = [None] * (num + 1)
    size = 0

    def less(a, b) -> bool:
        return a[1] < b[1]

    def up(i: int) -> None:
        node = heap[i]
        j = i >> 1
        while j >= 1 and less(node, heap[j]):
            heap[i] = heap[j]
            i = j
            j = j >> 1
        heap[i] = node

    def down(i: int) -> None:
        node = heap[i]
        j = i << 1
        if j + 1 <= size and less(heap[j + 1], heap[j]):
            j += 1
        while j <= size and less(heap[j], node):
            heap[i] = heap[j]
            i = j
            j = i << 1
            if j + 1 <= size and less(heap[j + 1], heap[j]):
                j += 1
        heap[i] = node

    for it in items:
        if size < num:
            size += 1
            heap[size] = it
            up(size)
        elif size > 0 and not less(it, heap[1]):
            heap[1] = it
            down(1)
    out = [None] * size
    for i in range(size - 1, -1, -1):
        out[i] = heap[1]
        heap[1] = heap[size]
        size -= 1
        down(1)
    return out


def tst_lookup(entries, key: str, num: int, only_more_popular: bool = False):
    """TSTLookup (suggest/tst/TSTLookup.java): entries sorted in UTF-16
    code-unit order (the utf8SortedAsUTF16SortOrder comparator), built
    middle-first into a ternary tree; the unpopular path returns the
    FIRST num nodes in prefixCompletion's stack-DFS order, the popular
    path the weight-DESC top num through LookupPriorityQueue. BMP keys
    only (Java chars are UTF-16 units)."""
    if not key:
        return []
    weights = dict(entries)
    toks = sorted(weights, key=lambda s: s.encode("utf-16-be"))
    root = _TTN()
    _tst_balanced(toks, [weights[t] for t in toks], 0, len(toks) - 1, root)
    nodes = _tst_prefix_completion(root, key)
    if not nodes:
        return []
    if only_more_popular:
        return _lookup_pq_topn([(n.token, n.val) for n in nodes], num)
    return [(n.token, n.val) for n in nodes[: min(num, len(nodes))]]


def jaspell_lookup(entries, key: str, num: int,
                   only_more_popular: bool = False):
    """JaspellLookup (suggest/jaspell/): matchPrefix = the exact key
    first (when present), then the in-order traversal of the ternary
    trie under the prefix — for lowercase entries the case-insensitive
    comparator (compareCharsAlphabetically = toLowerCase difference)
    degenerates to natural order, so the traversal IS sorted order,
    capped at num (num*2 for onlyMorePopular, which then takes the
    weight-DESC top num through LookupPriorityQueue). Restricted to
    keys the comparator keeps distinct (lowercase in our corpora)."""
    if not key:
        return []
    weights = dict(entries)
    count = num * 2 if only_more_popular else num
    keys: list[str] = []
    if key in weights:
        keys.append(key)
    if any(k.startswith(key) for k in weights):
        for k in sorted(weights):
            if len(keys) >= count:
                break
            if k.startswith(key) and k != key:
                keys.append(k)
    if not keys:
        return []
    items = [(k, weights[k]) for k in keys]
    if only_more_popular:
        return _lookup_pq_topn(items, num)
    return items[: min(num, len(items))]


def blended_infix_lookup(entries, key: str, num: int, blender: str = "linear",
                         num_factor: int = 10, exponent: float = 2.0,
                         all_terms_required: bool = True):
    """BlendedInfixSuggester.lookup (lucene/suggest/src/java/org/apache/
    lucene/search/suggest/analyzing/BlendedInfixSuggester.java over the
    AnalyzingInfixSuggester query machinery) for whitespace analyzers:

    - the key's tokens are all REQUIRED whole-token matches (allTerms;
      SHOULD otherwise) except the LAST, which is a PREFIX match when
      the key has no trailing whitespace (AnalyzingInfixSuggester.java:
      520-552) and an exact term otherwise;
    - first pass: matching suggestions sorted by weight DESC (ties =
      insertion order, the index docid sort), capped at num*numFactor;
    - each survivor re-scores as (long)(weight * coefficient) where
      coefficient = 1 when the raw text startsWith the raw key, else
      blender(position of the FIRST matched token): linear = 1 - 0.1*p,
      reciprocal = 1/(p+1), exp_reciprocal = 1/(p+1)^exponent
      (createCoefficient walks the term vector; min first-occurrence
      position over tokens in matchedTokens or starting with the
      prefix);
    - results keep the best `num` in a TreeSet ordered (value, then
      text) — ties on BOTH are deduplicated — and return in DESCENDING
      order (score DESC, text DESC).

    entries: [(text, weight)] in insertion order. Pinned vs the compiled
    suggester in tests/test_lucene_ground_truth.py (GT round 72)."""
    toks = key.split()
    if not toks:
        return []
    trailing_ws = key != key.rstrip()
    matched = set(toks[:-1])
    prefix = None
    if trailing_ws:
        matched.add(toks[-1])
    else:
        prefix = toks[-1]

    def hit(text: str) -> bool:
        ttoks = text.split()
        for m in matched:
            if m not in ttoks:
                if all_terms_required:
                    return False
        need = list(matched)
        ok_any = any(t in ttoks for t in need) if need else False
        if prefix is not None:
            pref_ok = any(t.startswith(prefix) for t in ttoks)
            if all_terms_required:
                return pref_ok and all(m in ttoks for m in need)
            return pref_ok or ok_any
        if all_terms_required:
            return all(m in ttoks for m in need)
        return ok_any

    cands = [(w, i, t) for i, (t, w) in enumerate(entries) if hit(t)]
    cands.sort(key=lambda c: (-c[0], c[1]))
    cands = cands[: num * num_factor]

    results: list[tuple[int, str]] = []  # (score, text), TreeSet semantics
    for w, _i, text in cands:
        if text.startswith(key):
            coef = 1.0
        else:
            pos = None
            for p, t in enumerate(text.split()):
                if t in matched or (prefix is not None
                                    and t.startswith(prefix)):
                    pos = p
                    break
            if pos is None:
                pos = (1 << 31) - 1  # Integer.MAX_VALUE: nothing matched
            if blender == "linear":
                coef = 1.0 - 0.10 * pos
            elif blender == "reciprocal":
                coef = 1.0 / (pos + 1)
            else:
                coef = 1.0 / float(pow(pos + 1, exponent))
        score = int(w * coef)  # (long) cast truncates toward zero
        item = (score, text)
        if item in results:
            continue  # TreeSet compare==0 -> dropped
        if len(results) >= num:
            smallest = min(results)
            if smallest < item:
                results.remove(smallest)
            else:
                continue
        results.append(item)
    results.sort(key=lambda r: (-r[0], _desc_key(r[1])))
    return results


def _desc_key(s: str):
    """Sort helper: descending text order inside equal scores
    (TreeSet.descendingSet reverses the (value, key) comparator)."""
    return tuple(-ord(c) for c in s)
