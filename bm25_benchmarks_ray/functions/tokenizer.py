"""Reference-semantics tokenization as pure functions.

Spec (behavioral parity with /root/reference/utils/__init__.py:56-143):

1. lowercase (when ``lower=True``, the reference default)
2. split with the compiled regex ``(?u)\\b\\w\\w+\\b`` — maximal runs of
   unicode word characters with length >= 2 (1-char tokens dropped)
3. drop stopwords (33-word English list, applied BEFORE stemming)
4. stem each surviving token with the Snowball English stemmer
   (reference stems the unique vocab once and remaps ids,
   /root/reference/utils/__init__.py:104-126; we get the same economy
   from an LRU cache on :func:`porter2.stem`)

The engine keys postings by the *stemmed term string* rather than an
insertion-ordered integer id: the reference's ids are an artifact of
single-process iteration order (/root/reference/utils/__init__.py:92-96)
and never affect scores, only vocab identity.
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Callable, Iterable

from .porter2 import stem as porter2_stem

TOKEN_PATTERN = r"(?u)\b\w\w+\b"
TOKEN_RE = re.compile(TOKEN_PATTERN)

# The reference's STOPWORDS_EN (/root/reference/utils/__init__.py:10-44).
STOPWORDS_EN = frozenset(
    (
        "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
        "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
        "such", "that", "the", "their", "then", "there", "these", "they",
        "this", "to", "was", "will", "with",
    )
)


def resolve_stopwords(stopwords: str | Iterable[str] | None) -> frozenset[str]:
    """Mirror of the reference's ``_infer_stopwords``
    (/root/reference/utils/__init__.py:9-54): "en"/"english"/True -> the
    33-word list; None/"none" -> empty; any iterable -> as given."""
    if stopwords in ("english", "en", True):
        return STOPWORDS_EN
    if stopwords in (None, "none", False):
        return frozenset()
    if isinstance(stopwords, str):
        raise ValueError(f"unrecognized stopwords spec: {stopwords!r}")
    return frozenset(stopwords)


def resolve_stemmer(stemmer: str | Callable | None) -> Callable[[str], str] | None:
    """"snowball"/"english"/"porter2" -> in-repo Porter2; None/"none" ->
    no stemming; else any ``str -> str`` callable."""
    if stemmer in ("snowball", "english", "porter2"):
        return porter2_stem
    if stemmer in (None, "none", False):
        return None
    if callable(stemmer):
        return stemmer
    raise ValueError(f"unrecognized stemmer spec: {stemmer!r}")


def hf_splitter(name_or_path: str) -> Callable[[str], list[str]]:
    """HuggingFace tokenizer as a splitter (the reference's alternative
    tokenization path, /root/reference/utils/huggingface.py:2-17:
    ``tokenizer(texts).input_ids`` without special tokens — here the
    token *strings*, which the engine keys postings by).  Requires the
    ``tokenizers`` package; import-gated because this container does not
    ship it."""
    try:
        from tokenizers import Tokenizer
    except ImportError as e:  # pragma: no cover - env without tokenizers
        raise ImportError(
            "HF tokenization needs the 'tokenizers' package, which is not "
            "installed in this environment; use splitter='regex' or install it"
        ) from e
    tok = (
        Tokenizer.from_file(name_or_path)
        if name_or_path.endswith(".json")
        else Tokenizer.from_pretrained(name_or_path)
    )

    def split(text: str) -> list[str]:
        return tok.encode(text, add_special_tokens=False).tokens

    return split


def resolve_splitter(spec) -> Callable[[str], list[str]]:
    """"regex" (default, the reference's ``(?u)\\b\\w\\w+\\b``),
    "hf:<name-or-tokenizer.json>" (needs the ``tokenizers`` package),
    "wordpiece:<vocab.json|vocab.txt>" (the vendored WordPiece,
    functions/wordpiece.py — no external deps), or any
    ``str -> list[str]`` callable."""
    if spec in (None, "regex"):
        return TOKEN_RE.findall
    if isinstance(spec, str) and spec.startswith("hf:"):
        return hf_splitter(spec[3:])
    if isinstance(spec, str) and spec.startswith("wordpiece:"):
        from .wordpiece import load_vocab, wordpiece_splitter

        return wordpiece_splitter(load_vocab(spec[len("wordpiece:"):]))
    if callable(spec):
        return spec
    raise ValueError(f"unrecognized splitter spec: {spec!r}")


def tokenize_text(
    text: str,
    stopwords: frozenset[str] = STOPWORDS_EN,
    stemmer: Callable[[str], str] | None = porter2_stem,
    lower: bool = True,
    splitter: Callable[[str], list[str]] | None = None,
) -> list[str]:
    """Tokenize one text to a list of (stemmed) term strings, preserving
    token order and multiplicity (query scoring is occurrence-weighted,
    SURVEY.md §2.6).  ``splitter`` swaps the regex split for an
    alternative (e.g. :func:`hf_splitter`)."""
    if lower:
        text = text.lower()
    tokens = TOKEN_RE.findall(text) if splitter is None else splitter(text)
    if stopwords:
        tokens = [t for t in tokens if t not in stopwords]
    if stemmer is not None:
        tokens = [stemmer(t) for t in tokens]
    return tokens


def term_frequencies(
    text: str,
    stopwords: frozenset[str] = STOPWORDS_EN,
    stemmer: Callable[[str], str] | None = porter2_stem,
    lower: bool = True,
) -> tuple[Counter, int]:
    """Return (Counter term -> tf, doc_len). doc_len counts all kept
    token occurrences (the reference's per-doc ``len(ids)``)."""
    tokens = tokenize_text(text, stopwords=stopwords, stemmer=stemmer, lower=lower)
    return Counter(tokens), len(tokens)


def tokenize_texts(
    texts: Iterable[str],
    stopwords: frozenset[str] = STOPWORDS_EN,
    stemmer: Callable[[str], str] | None = porter2_stem,
    lower: bool = True,
) -> list[list[str]]:
    return [
        tokenize_text(t, stopwords=stopwords, stemmer=stemmer, lower=lower)
        for t in texts
    ]
