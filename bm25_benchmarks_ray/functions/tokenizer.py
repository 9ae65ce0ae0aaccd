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


def dict_token_stream(texts_col, lower: bool = True, fast_ok: bool = True,
                      py_split: Callable[[str], list[str]] | None = None):
    """Dictionary-encoded raw token stream for a whole batch of texts:
    ``(codes, uniq, doc_of, lens)`` where ``uniq[codes]`` is the flat
    (lowercased, length>=2) token stream in doc-major order (within-doc
    occurrence order preserved), ``doc_of`` the batch-local doc index
    per occurrence and ``lens`` the per-doc token count.  Stopword
    filtering / stemming are NOT applied — callers post-process the
    small ``uniq`` side (stem-unique-once taken to its limit).

    ASCII rows take the Arrow fast path — ``utf8_lower`` → RE2 ``\\W+``
    split → length>=2 filter → ``dictionary_encode``, all C kernels, no
    per-token Python string (RE2's ASCII ``\\w`` equals Python's
    unicode ``\\w`` on ASCII input, so the streams are identical
    there).  Rows containing non-ASCII characters run the exact
    Python path per doc — ``str.lower()`` then ``TOKEN_RE`` (Python and
    Arrow lowercase DIVERGE outside ASCII: Python maps U+0130 'İ' to
    'i'+combining-dot, Arrow's simple mapping to plain 'i', so the
    ASCII routing test MUST run on the ORIGINAL bytes, never the
    Arrow-lowered ones — hypothesis-caught) — and the two streams merge
    under one dictionary.  Mixed batches keep full semantics while
    paying Python cost only for the non-ASCII fraction.
    ``fast_ok=False`` (custom splitter) routes every row through
    ``py_split``.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts_col, list):
        texts_col = pa.array(texts_col, type=pa.string())
    if isinstance(texts_col, pa.ChunkedArray):
        texts_col = texts_col.combine_chunks()
    if texts_col.null_count:
        # null text = empty doc (real corpora carry missing fields;
        # a null would poison the ASCII mask and crash the re path)
        texts_col = pc.fill_null(texts_col, "")
    m = len(texts_col)
    split = py_split if py_split is not None else TOKEN_RE.findall

    def py_stream(strings: list[str]):
        lens = np.empty(len(strings), dtype=np.int64)
        flat: list[str] = []
        for i, s in enumerate(strings):
            toks = split(s.lower() if lower else s)
            lens[i] = len(toks)
            flat.extend(toks)
        return flat, lens

    a_idx = np.empty(0, dtype=np.int64)
    if fast_ok and m:
        # routing test on the ORIGINAL text: on pure-ASCII rows Arrow
        # and Python lowercase agree, elsewhere they may not
        ascii_mask = pc.equal(
            pc.binary_length(texts_col), pc.utf8_length(texts_col)
        ).to_numpy(zero_copy_only=False)
        a_idx = np.flatnonzero(ascii_mask)
    if a_idx.size:
        sub = texts_col.take(pa.array(a_idx)) if a_idx.size < m else texts_col
        if lower:
            sub = pc.utf8_lower(sub)
        lists = pc.split_pattern_regex(sub, r"\W+")
        per_doc = pc.list_value_length(lists).to_numpy()
        toks = pc.list_flatten(lists)
        keep = pc.greater_equal(pc.binary_length(toks), 2)
        doc_of_a = np.repeat(np.arange(a_idx.size, dtype=np.int64), per_doc)[
            keep.to_numpy(zero_copy_only=False)
        ]
        toks = toks.filter(keep)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        dct = toks.dictionary_encode()
        codes_a = dct.indices.to_numpy().astype(np.int64, copy=False)
        uniq_a = np.asarray(dct.dictionary.to_pylist(), dtype=object)
        if a_idx.size == m:  # pure-ASCII batch: done
            lens = np.bincount(doc_of_a, minlength=m).astype(np.int64)
            return codes_a, uniq_a, doc_of_a, lens
        # mixed batch: python-re the non-ASCII rows (python lowercase
        # inside py_stream), merge dictionaries
        b_idx = np.flatnonzero(~ascii_mask)
        flat_b, lens_b = py_stream(
            texts_col.take(pa.array(b_idx)).to_pylist()
        )
        fb = np.asarray(flat_b, dtype=object)
        f_codes, f_uniq = pd.factorize(
            np.concatenate([uniq_a, fb]), sort=False
        )
        codes = np.concatenate([f_codes[: uniq_a.size][codes_a],
                                f_codes[uniq_a.size :]])
        doc_of = np.concatenate([a_idx[doc_of_a], np.repeat(b_idx, lens_b)])
        # doc-major order (stable: within-doc order kept per side; every
        # doc lives wholly on one side)
        order = np.argsort(doc_of, kind="stable")
        codes, doc_of = codes[order], doc_of[order]
        lens = np.bincount(doc_of, minlength=m).astype(np.int64)
        return codes, np.asarray(f_uniq, dtype=object), doc_of, lens
    # all-python path (custom splitter / non-ASCII-only / empty batch)
    flat, lens = py_stream(texts_col.to_pylist())
    doc_of = np.repeat(np.arange(m, dtype=np.int64), lens)
    if not flat:
        return np.empty(0, np.int64), np.empty(0, dtype=object), doc_of, lens
    codes, uniq = pd.factorize(np.asarray(flat, dtype=object), sort=False)
    return (
        codes.astype(np.int64, copy=False),
        np.asarray(uniq, dtype=object),
        doc_of,
        lens,
    )
