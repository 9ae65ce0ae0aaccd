"""Pure-Python Porter2 (Snowball English) stemmer.

Implemented from the published Snowball "English stemmer" algorithm
description (snowballstem.org/algorithms/english/stemmer.html). The
reference harness stems with PyStemmer's compiled Snowball English
stemmer (duck-typed at /root/reference/utils/__init__.py:104-111 and
used at /root/reference/benchmark/on_bm25s.py via ``Stemmer.Stemmer``);
no stemmer package is available in this environment, so this module is
the engine's in-repo equivalent and the single stemming spec used by
both the Ray pipeline and the pytest oracle.

The implementation tracks R1/R2 as integer offsets from the word start
(the standard Snowball convention), so suffix-in-region tests survive
in-place replacements.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

# Words stemmed as a special form (Snowball "exceptional forms").
_EXCEPTIONS1 = {
    "skis": "ski",
    "skies": "sky",
    "dying": "die",
    "lying": "lie",
    "tying": "tie",
    "idly": "idl",
    "gently": "gentl",
    "ugly": "ugli",
    "early": "earli",
    "only": "onli",
    "singly": "singl",
    # invariant forms
    "sky": "sky",
    "news": "news",
    "howe": "howe",
    "atlas": "atlas",
    "cosmos": "cosmos",
    "bias": "bias",
    "andes": "andes",
}

# Invariant after step 1a.
_EXCEPTIONS2 = frozenset(
    ("inning", "outing", "canning", "herring", "earring", "proceed", "exceed", "succeed")
)

_STEP2_SUFFIXES = (
    # (suffix, replacement) tried longest-first; special-cased: ogi, li
    ("ization", "ize"),
    ("ational", "ate"),
    ("fulness", "ful"),
    ("ousness", "ous"),
    ("iveness", "ive"),
    ("tional", "tion"),
    ("biliti", "ble"),
    ("lessli", "less"),
    ("entli", "ent"),
    ("ation", "ate"),
    ("alism", "al"),
    ("aliti", "al"),
    ("ousli", "ous"),
    ("iviti", "ive"),
    ("fulli", "ful"),
    ("enci", "ence"),
    ("anci", "ance"),
    ("abli", "able"),
    ("izer", "ize"),
    ("ator", "ate"),
    ("alli", "al"),
    ("bli", "ble"),
)

_STEP3_SUFFIXES = (
    ("ational", "ate"),
    ("tional", "tion"),
    ("alize", "al"),
    ("icate", "ic"),
    ("iciti", "ic"),
    ("ical", "ic"),
    ("ful", ""),
    ("ness", ""),
)

_STEP4_SUFFIXES = (
    "ement",
    "ance",
    "ence",
    "able",
    "ible",
    "ment",
    "ant",
    "ent",
    "ism",
    "ate",
    "iti",
    "ous",
    "ive",
    "ize",
    "al",
    "er",
    "ic",
)


def _is_vowel(word: str, i: int) -> bool:
    return word[i] in _VOWELS


def _regions(word: str) -> tuple[int, int]:
    """Return (r1, r2) offsets. R1 = after the first non-vowel following a
    vowel; special prefixes gener/commun/arsen pin R1 to the prefix end."""
    n = len(word)
    r1 = n
    for prefix in ("gener", "commun", "arsen"):
        if word.startswith(prefix):
            r1 = len(prefix)
            break
    else:
        for i in range(1, n):
            if not _is_vowel(word, i) and _is_vowel(word, i - 1):
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if not _is_vowel(word, i) and _is_vowel(word, i - 1):
            r2 = i + 1
            break
    return r1, r2


def _ends_short_syllable(word: str) -> bool:
    """True if the word ends in a short syllable: either (a) a vowel
    followed by a non-vowel other than w/x/Y, preceded by a non-vowel, or
    (b) a vowel at the start of the word followed by a non-vowel."""
    n = len(word)
    if n == 2:
        return word[0] in _VOWELS and word[1] not in _VOWELS
    if n >= 3:
        c1, v, c2 = word[-3], word[-2], word[-1]
        return (
            v in _VOWELS
            and c2 not in _VOWELS
            and c2 not in "wxY"
            and c1 not in _VOWELS
        )
    return False


def _contains_vowel(segment: str) -> bool:
    return any(ch in _VOWELS for ch in segment)


@lru_cache(maxsize=1_000_000)
def stem(word: str) -> str:
    """Stem one lowercase word. Words of length <= 2 are returned as-is
    (Snowball convention)."""
    if len(word) <= 2:
        return word

    if word.startswith("'"):
        word = word[1:]
    exc = _EXCEPTIONS1.get(word)
    if exc is not None:
        return exc

    # Mark consonant-y as Y so it is not treated as a vowel.
    if word.startswith("y"):
        word = "Y" + word[1:]
    chars = list(word)
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    word = "".join(chars)

    r1, r2 = _regions(word)

    # Step 0: strip 's' / 's / ' (longest first)
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ied") or word.endswith("ies"):
        word = word[:-3] + ("i" if len(word) > 4 else "ie")
    elif word.endswith("ss") or word.endswith("us"):
        pass
    elif word.endswith("s"):
        if _contains_vowel(word[:-2]):
            word = word[:-1]

    if word in _EXCEPTIONS2:
        return word

    # Step 1b
    if word.endswith("eedly"):
        if len(word) - 5 >= r1:
            word = word[:-3]
    elif word.endswith("eed"):
        if len(word) - 3 >= r1:
            word = word[:-1]
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem_part = word[: -len(suf)]
                if _contains_vowel(stem_part):
                    word = stem_part
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif len(word) <= r1 and _ends_short_syllable(word):
                        # short word: R1 empty after the stem
                        word += "e"
                break

    # Step 1c: y/Y -> i if preceded by a non-vowel which is not the first letter
    if len(word) > 2 and word[-1] in "yY" and word[-2] not in _VOWELS:
        word = word[:-1] + "i"

    # Step 2 (suffix must lie in R1)
    if word.endswith("ogi"):
        if len(word) - 3 >= r1 and len(word) >= 4 and word[-4] == "l":
            word = word[:-1]
    elif word.endswith("li") and not word.endswith(
        tuple(s for s, _ in _STEP2_SUFFIXES if s.endswith("li"))
    ):
        if len(word) - 2 >= r1 and len(word) >= 3 and word[-3] in _LI_ENDING:
            word = word[:-2]
    else:
        for suf, rep in _STEP2_SUFFIXES:
            if word.endswith(suf):
                if len(word) - len(suf) >= r1:
                    word = word[: -len(suf)] + rep
                break

    # Step 3 (suffix in R1; "ative" requires R2)
    if word.endswith("ative"):
        if len(word) - 5 >= r2:
            word = word[:-5]
    else:
        for suf, rep in _STEP3_SUFFIXES:
            if word.endswith(suf):
                if len(word) - len(suf) >= r1:
                    word = word[: -len(suf)] + rep
                break

    # Step 4 (suffix in R2; "ion" only after s/t)
    if word.endswith("ion"):
        if len(word) - 3 >= r2 and len(word) >= 4 and word[-4] in "st":
            word = word[:-3]
    else:
        for suf in _STEP4_SUFFIXES:
            if word.endswith(suf):
                if len(word) - len(suf) >= r2:
                    word = word[: -len(suf)]
                break

    # Step 5
    if word.endswith("e"):
        if len(word) - 1 >= r2 or (
            len(word) - 1 >= r1 and not _ends_short_syllable(word[:-1])
        ):
            word = word[:-1]
    elif word.endswith("l"):
        if len(word) - 1 >= r2 and len(word) >= 2 and word[-2] == "l":
            word = word[:-1]

    return word.replace("Y", "y")


def stem_words(words: list[str]) -> list[str]:
    """Stem a list of words (PyStemmer ``stemWords`` analogue)."""
    return [stem(w) for w in words]
