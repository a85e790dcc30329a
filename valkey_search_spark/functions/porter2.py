"""Porter2 ("Snowball English") stemmer — pure Python, dependency-free.

The reference stems TEXT tokens with Snowball's english stemmer
(/root/reference/src/indexes/text/text_index.h:152-156;
docs/topics/search-data-formats.md:232). Snowball "english" is Porter2,
which diverges from the classic 1980 Porter algorithm on known word
classes (-ly adverbs via the new li/ousli/fulli rules, ogi->og, the
R1/R2 region model, exceptional forms like "early"->"earli"). Implemented
from the published algorithm description at
snowballstem.org/algorithms/english/stemmer.html.
"""

from __future__ import annotations

_VOWELS = set("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = set("cdeghkmnrt")

# exceptional forms, applied to the whole (lowercased) word
_EXCEPTIONS1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}

# invariant after step 1a
_EXCEPTIONS2 = {"inning", "outing", "canning", "herring", "earring",
                "proceed", "exceed", "succeed"}


def _regions(w: str) -> tuple[int, int]:
    """(r1, r2) start offsets. R1 = after the first non-vowel following a
    vowel (special-cased prefixes gener/commun/arsen); R2 = same rule
    applied within R1."""
    n = len(w)
    if w.startswith(("gener", "arsen")):
        r1 = 5
    elif w.startswith("commun"):
        r1 = 6
    else:
        # standard: first non-vowel following a vowel
        r1 = n
        for i in range(1, n):
            if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if w[i] not in _VOWELS and w[i - 1] in _VOWELS:
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(w: str) -> bool:
    """(a) non-vowel + vowel + non-vowel(not w/x/Y) at the end, or
    (b) vowel + non-vowel comprising the whole 2-letter word."""
    n = len(w)
    if n == 2:
        return w[0] in _VOWELS and w[1] not in _VOWELS
    if n >= 3:
        c1, v, c2 = w[-3], w[-2], w[-1]
        return (c1 not in _VOWELS and v in _VOWELS
                and c2 not in _VOWELS and c2 not in "wxY")
    return False


def _is_short(w: str, r1: int) -> bool:
    return r1 >= len(w) and _ends_short_syllable(w)


def _contains_vowel(w: str) -> bool:
    return any(ch in _VOWELS for ch in w)


def _porter2_stem_impl(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w

    if w.startswith("'"):
        w = w[1:]
    if w in _EXCEPTIONS1:
        return _EXCEPTIONS1[w]

    # mark consonant-y as Y: initial y, or y after a (still-)vowel —
    # sequential left-to-right, so "yy" marks only the first
    chars = list(w)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in "aeiouy":
            chars[i] = "Y"
    w = "".join(chars)

    r1, r2 = _regions(w)

    # Step 0: longest of ' / 's / 's'
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # Step 1a: longest suffix match
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith(("ied", "ies")):
        w = w[:-2] if len(w) > 4 else w[:-1]
    elif w.endswith(("us", "ss")):
        pass
    elif w.endswith("s"):
        # delete if the preceding part has a vowel NOT immediately before s
        if any(ch in _VOWELS for ch in w[:-2]):
            w = w[:-1]

    if w in _EXCEPTIONS2:
        return w

    # Step 1b
    for suf in ("eedly", "eed"):
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[: -len(suf)] + "ee"
            break
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if _contains_vowel(stem):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w += "e"
                    elif w.endswith(_DOUBLES):
                        w = w[:-1]
                    elif _is_short(w, r1):
                        w += "e"
                break

    # Step 1c: y/Y -> i if preceded by a non-vowel that isn't word-initial
    if (len(w) > 2 and w[-1] in "yY"
            and w[-2] not in _VOWELS):
        w = w[:-1] + "i"

    # Step 2 (suffix must lie in R1); ordered longest-first per group
    step2 = [
        ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
        ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"), ("ogi", None), ("li", None),
    ]
    for suf, rep in step2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ogi":
                    if w.endswith("logi"):
                        w = w[:-1]
                elif suf == "li":
                    if len(w) > 2 and w[-3] in _LI_ENDING:
                        w = w[:-2]
                else:
                    w = w[: -len(suf)] + rep
            break

    # Step 3 (in R1; "ative" additionally requires R2)
    step3 = [
        ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
        ("icate", "ic"), ("iciti", "ic"), ("ative", ""),
        ("ical", "ic"), ("ness", ""), ("ful", ""),
    ]
    for suf, rep in step3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ative":
                    if len(w) - len(suf) >= r2:
                        w = w[: -len(suf)]
                else:
                    w = w[: -len(suf)] + rep
            break

    # Step 4 (in R2)
    step4 = [
        "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent",
        "ism", "ate", "iti", "ous", "ive", "ize", "ion", "al", "er", "ic",
    ]
    for suf in step4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if suf == "ion":
                    if len(w) > 3 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break

    # Step 5
    if w.endswith("e"):
        stem = w[:-1]
        if len(stem) >= r2 or (len(stem) >= r1
                               and not _ends_short_syllable(stem)):
            w = stem
    elif w.endswith("l") and len(w) - 1 >= r2 and len(w) >= 2 and w[-2] == "l":
        w = w[:-1]

    return w.replace("Y", "y")


# Memoized public entry point. Real text is zipfian — the ~40-branch
# suffix walk runs once per DISTINCT word per process instead of once
# per occurrence (~50x on repeated tokens, measured), which is the
# dominant Python cost of the 50-field ingest workload. A plain def
# (not an lru_cache wrapper) so cloudpickle serializes UDF closures by
# module reference; each executor process holds its own bounded cache.
_STEM_CACHE: dict = {}


def porter2_stem(word: str) -> str:
    s = _STEM_CACHE.get(word)
    if s is None:
        s = _porter2_stem_impl(word)
        if len(_STEM_CACHE) < (1 << 20):
            _STEM_CACHE[word] = s
    return s
