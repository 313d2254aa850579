"""Porter (1980) stemmer, pure Python, byte-compatible with the reference.

The reference engine stems every token with the classic tartarus.org Java
Porter stemmer (``/root/reference/src/search/external/PorterStemmer.java``,
called from ``jobs/Indexer.java:47-52``, ``jobs/TF_IDF.java:208-213`` and
``frontend/Mainpage.java:392-397``).  This module is a fresh Python
implementation of the published algorithm whose *observable behavior* is
verified token-for-token against goldens generated from the compiled Java
class (see ``tests/test_porter.py`` + ``golden/stems.tsv``), including the
classic implementation's quirks:

* words of length <= 2 are returned unchanged (``stem()`` guards ``k > 1``);
* non-letter characters are treated as consonants (the ``cons`` default);
* ``y`` is a consonant at position 0, else a consonant iff the previous
  char is not a consonant;
* step5's ``ion`` rule requires a preceding ``s``/``t`` ("Bug 2" guard);
* no lowercasing is performed here — callers decide (the reference's
  Indexer stems raw tokens, TF_IDF lowercases first).

Stemming is pure string work and is only ever invoked from inside
Arrow-batched pandas UDFs (see ``textprep.py``); a per-process memo cache
exploits the Zipfian token distribution so the amortized cost per token is
a dict lookup.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _stem_new(word: str) -> str:
    """Stem one token. Assumes word length >= 3 (caller guards)."""
    b = list(word)
    k = len(b) - 1

    def cons(i: int) -> bool:
        # Iterative form of: vowels -> False; 'y' at 0 -> True;
        # 'y' elsewhere -> not cons(i-1); anything else -> True.
        invert = False
        while True:
            c = b[i]
            if c in _VOWELS:
                return invert
            if c != "y" or i == 0:
                return not invert
            invert = not invert
            i -= 1

    # j is the algorithm's "stem end" cursor, shared by ends/setto/m
    state = {"j": 0}

    def m() -> int:
        """Count consonant sequences in b[0..j]."""
        j = state["j"]
        n = 0
        i = 0
        while True:
            if i > j:
                return n
            if not cons(i):
                break
            i += 1
        i += 1
        while True:
            while True:
                if i > j:
                    return n
                if cons(i):
                    break
                i += 1
            i += 1
            n += 1
            while True:
                if i > j:
                    return n
                if not cons(i):
                    break
                i += 1
            i += 1

    def vowel_in_stem() -> bool:
        return any(not cons(i) for i in range(state["j"] + 1))

    def doublec(j: int) -> bool:
        if j < 1 or b[j] != b[j - 1]:
            return False
        return cons(j)

    def cvc(i: int) -> bool:
        if i < 2 or not cons(i) or cons(i - 1) or not cons(i - 2):
            return False
        return b[i] not in ("w", "x", "y")

    def ends(s: str) -> bool:
        nonlocal k
        o = k - len(s) + 1
        if o < 0:
            return False
        if "".join(b[o : o + len(s)]) != s:
            return False
        state["j"] = k - len(s)
        return True

    def setto(s: str) -> None:
        nonlocal k
        j = state["j"]
        o = j + 1
        for idx, ch in enumerate(s):
            if o + idx < len(b):
                b[o + idx] = ch
            else:
                b.append(ch)
        k = j + len(s)

    def r(s: str) -> None:
        if m() > 0:
            setto(s)

    # --- step 1: plurals, -ed, -ing -------------------------------------
    if b[k] == "s":
        if ends("sses"):
            k -= 2
        elif ends("ies"):
            setto("i")
        elif b[k - 1] != "s":
            k -= 1
    if ends("eed"):
        if m() > 0:
            k -= 1
    elif (ends("ed") or ends("ing")) and vowel_in_stem():
        k = state["j"]
        if ends("at"):
            setto("ate")
        elif ends("bl"):
            setto("ble")
        elif ends("iz"):
            setto("ize")
        elif doublec(k):
            k -= 1
            if b[k] in ("l", "s", "z"):
                k += 1
        elif m() == 1 and cvc(k):
            setto("e")

    # --- step 2: terminal y -> i -----------------------------------------
    if ends("y") and vowel_in_stem():
        b[k] = "i"

    # --- step 3: double suffixes -----------------------------------------
    if k > 0:
        c = b[k - 1]
        if c == "a":
            if ends("ational"):
                r("ate")
            elif ends("tional"):
                r("tion")
        elif c == "c":
            if ends("enci"):
                r("ence")
            elif ends("anci"):
                r("ance")
        elif c == "e":
            if ends("izer"):
                r("ize")
        elif c == "l":
            if ends("bli"):
                r("ble")
            elif ends("alli"):
                r("al")
            elif ends("entli"):
                r("ent")
            elif ends("eli"):
                r("e")
            elif ends("ousli"):
                r("ous")
        elif c == "o":
            if ends("ization"):
                r("ize")
            elif ends("ation"):
                r("ate")
            elif ends("ator"):
                r("ate")
        elif c == "s":
            if ends("alism"):
                r("al")
            elif ends("iveness"):
                r("ive")
            elif ends("fulness"):
                r("ful")
            elif ends("ousness"):
                r("ous")
        elif c == "t":
            if ends("aliti"):
                r("al")
            elif ends("iviti"):
                r("ive")
            elif ends("biliti"):
                r("ble")
        elif c == "g":
            if ends("logi"):
                r("log")

    # --- step 4: -ic-, -full, -ness --------------------------------------
    c = b[k]
    if c == "e":
        if ends("icate"):
            r("ic")
        elif ends("ative"):
            r("")
        elif ends("alize"):
            r("al")
    elif c == "i":
        if ends("iciti"):
            r("ic")
    elif c == "l":
        if ends("ical"):
            r("ic")
        elif ends("ful"):
            r("")
    elif c == "s":
        if ends("ness"):
            r("")

    # --- step 5: -ant, -ence etc. in context m() > 1 ----------------------
    if k > 0:
        c = b[k - 1]
        matched = False
        if c == "a":
            matched = ends("al")
        elif c == "c":
            matched = ends("ance") or ends("ence")
        elif c == "e":
            matched = ends("er")
        elif c == "i":
            matched = ends("ic")
        elif c == "l":
            matched = ends("able") or ends("ible")
        elif c == "n":
            matched = (
                ends("ant") or ends("ement") or ends("ment") or ends("ent")
            )
        elif c == "o":
            matched = (
                ends("ion")
                and state["j"] >= 0
                and b[state["j"]] in ("s", "t")
            ) or ends("ou")
        elif c == "s":
            matched = ends("ism")
        elif c == "t":
            matched = ends("ate") or ends("iti")
        elif c == "u":
            matched = ends("ous")
        elif c == "v":
            matched = ends("ive")
        elif c == "z":
            matched = ends("ize")
        if matched and m() > 1:
            k = state["j"]

    # --- step 6: final -e / -ll -------------------------------------------
    state["j"] = k
    if b[k] == "e":
        a = m()
        if a > 1 or (a == 1 and not cvc(k - 1)):
            k -= 1
    if b[k] == "l" and doublec(k) and m() > 1:
        k -= 1

    return "".join(b[: k + 1])


_CACHE: dict[str, str] = {}
_CACHE_MAX = 1 << 20


def porter_stem(word: str) -> str:
    """Stem ``word`` exactly as the reference Java PorterStemmer does."""
    if len(word) <= 2:
        return word
    hit = _CACHE.get(word)
    if hit is not None:
        return hit
    out = _stem_new(word)
    if len(_CACHE) < _CACHE_MAX:
        _CACHE[word] = out
    return out
