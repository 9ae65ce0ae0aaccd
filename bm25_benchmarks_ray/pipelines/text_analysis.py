"""Text-analysis operators for training-data curation: language ID,
quality scoring, token counting, document fingerprinting.

All four are single-pass ``map_batches`` transforms (no shuffle); the
heuristics are deterministic and simple enough to express in ANSI SQL,
so every one is DuckDB-oracle-checkable (driver_api).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.tokenizer import STOPWORDS_EN, TOKEN_RE

WS_RE = re.compile(r"\S+")
# BPE-ish segmentation: word pieces of <=4 chars, digits, or single
# non-space symbols (a cheap proxy for subword token counts)
BPE_RE = re.compile(r"[A-Za-z]{1,4}|[0-9]|[^\sA-Za-z0-9]")
PUNCT_RE = re.compile(r"[^\w\s]")


def _text_array(texts_col) -> pa.Array:
    import pyarrow.compute as pc

    if isinstance(texts_col, pa.ChunkedArray):
        texts_col = texts_col.combine_chunks()
    # null text rows count as empty (same as dict_token_stream): without
    # this, count_substring_regex returns null -> NaN -> INT64_MIN after
    # the int64 cast, silently poisoning quality/curate scores
    return pc.fill_null(texts_col, "")


def _stream_stats(texts_col) -> tuple[np.ndarray, np.ndarray]:
    """(n_tokens, stopword_ratio) per row, from the shared
    dictionary-encoded token stream — stopword membership tested over
    the DISTINCT tokens only, counted per doc with one bincount."""
    from ..functions.tokenizer import dict_token_stream

    codes, uniq, doc_of, lens = dict_token_stream(texts_col, lower=True)
    m = len(lens)
    if codes.size:
        sw_u = np.fromiter((u in STOPWORDS_EN for u in uniq), bool, len(uniq))
        sw_counts = np.bincount(
            doc_of, weights=sw_u[codes].astype(np.float64), minlength=m
        )
    else:
        sw_counts = np.zeros(m, dtype=np.float64)
    ratios = np.divide(
        sw_counts,
        lens,
        out=np.zeros(m, dtype=np.float64),
        where=lens > 0,
    )
    return lens, ratios


def _regex_count(texts_col, re2_pattern: str, py_re, lower: bool = False) -> np.ndarray:
    """Per-row count of non-overlapping regex matches: one Arrow
    ``count_substring_regex`` (RE2, C) pass, then the exact Python
    regex re-counts only rows containing non-ASCII characters (RE2's
    ASCII ``\\w``/``\\s`` classes differ from Python's unicode ones
    there; identical on ASCII — same argument as dict_token_stream)."""
    import pyarrow.compute as pc

    arr = _text_array(texts_col)
    target = pc.utf8_lower(arr) if lower else arr
    counts = (
        pc.count_substring_regex(target, re2_pattern)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    non_ascii = np.flatnonzero(
        pc.not_equal(pc.binary_length(arr), pc.utf8_length(arr)).to_numpy(
            zero_copy_only=False
        )
    )
    if non_ascii.size:
        sub = arr.take(pa.array(non_ascii)).to_pylist()
        for j, s in zip(non_ascii, sub):
            counts[j] = len(py_re.findall(s.lower() if lower else s))
    return counts


def language_id(ds: rd.Dataset, threshold: float = 0.08) -> rd.Dataset:
    """(doc_id, stopword_ratio, lang): 'en' when the share of tokens in
    the English stopword list reaches the threshold, else 'und'.
    Deterministic n-gram-free heuristic — statistical n-gram models slot
    in behind the same stage signature."""

    def f(batch: pa.Table) -> pa.Table:
        # the tokenizer regex drops 1-char tokens ('a', 'i'), so the
        # ratio is over >=2-char tokens — mirrored in the SQL oracle
        _, ratios = _stream_stats(batch.column("text"))
        lang = np.where(ratios >= threshold, "en", "und")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "stopword_ratio": pa.array(np.round(ratios, 6)),
                "lang": pa.array(lang, type=pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def _quality_from_col(col: pa.Array):
    """THE composite quality formula over a text array — returns
    (n_tokens, n_chars, punct_ratio, stopword_ratio, quality) arrays.
    Shared by ``quality_score``, ``curate`` and the grouped-top-k
    driver query (driver_api.q_docs_topk_per_source) so the scoring can
    never drift between them while all share QUALITY_SQL as oracle."""
    import pyarrow.compute as pc

    n_tok, swr = _stream_stats(col)
    n_chars = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    punct = np.divide(
        _regex_count(col, r"[^\w\s]", PUNCT_RE).astype(np.float64),
        n_chars,
        out=np.zeros(len(n_chars), dtype=np.float64),
        where=n_chars > 0,
    )
    length_ok = np.clip(n_tok / 20.0, 0.0, 1.0)
    punct_ok = np.clip(1.0 - 5.0 * punct, 0.0, 1.0)
    quality = np.round(
        0.5 * length_ok + 0.3 * punct_ok + 0.2 * np.clip(10 * swr, 0, 1), 6
    )
    return n_tok, n_chars, punct, swr, quality


def quality_score(ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, n_tokens, n_chars, punct_ratio, stopword_ratio,
    quality): length/punctuation/stopword heuristics with a composite
    0..1 quality score."""

    def f(batch: pa.Table) -> pa.Table:
        col = _text_array(batch.column("text"))
        n_tok, n_chars, punct, swr, quality = _quality_from_col(col)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tok),
                "n_chars": pa.array(n_chars),
                "punct_ratio": pa.array(np.round(punct, 6)),
                "stopword_ratio": pa.array(np.round(swr, 6)),
                "quality": pa.array(quality),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def token_count(ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, ws_tokens, re_tokens, bpe_tokens): whitespace tokens,
    word-regex tokens, and a BPE-ish subword proxy count."""

    def f(batch: pa.Table) -> pa.Table:
        from ..functions.tokenizer import dict_token_stream

        col = _text_array(batch.column("text"))
        ws = _regex_count(col, r"\S+", WS_RE)
        reg = dict_token_stream(col, lower=True)[3]
        bpe = _regex_count(col, r"[A-Za-z]{1,4}|[0-9]|[^\sA-Za-z0-9]", BPE_RE)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "ws_tokens": pa.array(ws),
                "re_tokens": pa.array(reg),
                "bpe_tokens": pa.array(bpe),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def winnow_fingerprint(
    ds: rd.Dataset, k: int = 5, window: int = 4
) -> rd.Dataset:
    """(doc_id, fps list<uint64>): winnowed fingerprints — the classic
    document-fingerprinting scheme (hash per k-gram of the normalized
    token stream, minimum per sliding window, deduplicated).  Two
    documents sharing a long-enough passage share fingerprints
    regardless of position, which is what the md5-whole-doc fingerprint
    cannot give.

    K-gram hashes are md5_u64 over the joined k-gram string: one
    C-speed digest per k-gram for the whole batch (no per-byte Python
    hashing), deterministic across workers, and exactly reproducible in
    SQL — the DuckDB oracle recomputes identical fingerprints."""
    from ..pipelines.dedup import md5_u64

    def f(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        # batch-level k-gram hashing: one md5_u64 call for all docs
        tok_lists = [TOKEN_RE.findall(t.lower()) for t in texts]
        grams: list[str] = []
        spans: list[tuple[int, int]] = []
        for toks in tok_lists:
            n = max(0, len(toks) - k + 1)
            start = len(grams)
            grams.extend(" ".join(toks[i : i + k]) for i in range(n))
            spans.append((start, start + n))
        all_kg = md5_u64(grams)
        out_ids, out_fps = [], []
        for doc_id, (s, e) in zip(batch.column("doc_id").to_pylist(), spans):
            kg = all_kg[s:e]
            n = kg.size
            if n == 0:
                fps = np.empty(0, dtype=np.uint64)
            elif n < window:
                fps = kg.min(keepdims=True)
            else:
                w = np.lib.stride_tricks.sliding_window_view(kg, window)
                fps = np.unique(w.min(axis=1))
            out_ids.append(doc_id)
            out_fps.append(fps.tolist())
        return pa.table(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "fps": pa.array(out_fps, type=pa.list_(pa.uint64())),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def fingerprint(ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, fp): md5 of the normalized token stream — a canonical
    content fingerprint robust to case/punctuation (the exact-dedup key
    family; a rolling/winnowed variant slots in behind the same
    signature)."""

    def f(batch: pa.Table) -> pa.Table:
        # per-doc findall+join+md5 stays: an A/B against rebuilding the
        # normalized strings through dict_token_stream + Arrow
        # binary_join measured the dictionary round-trip SLOWER (82k vs
        # 112k docs/s/core on ~23-token docs) — md5 and the join are
        # doc-level, so there is no distinct-token economy to exploit
        fps = []
        for text in batch.column("text").to_pylist():
            norm = " ".join(TOKEN_RE.findall(text.lower()))
            fps.append(hashlib.md5(norm.encode()).hexdigest())
        return pa.table(
            {"doc_id": batch.column("doc_id"), "fp": pa.array(fps, type=pa.string())}
        )

    return ds.map_batches(f, batch_format="pyarrow")
