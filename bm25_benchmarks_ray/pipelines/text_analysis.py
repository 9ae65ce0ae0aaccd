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


def language_id(ds: rd.Dataset, threshold: float = 0.08) -> rd.Dataset:
    """(doc_id, stopword_ratio, lang): 'en' when the share of tokens in
    the English stopword list reaches the threshold, else 'und'.
    Deterministic n-gram-free heuristic — statistical n-gram models slot
    in behind the same stage signature."""

    def f(batch: pa.Table) -> pa.Table:
        ratios = np.zeros(batch.num_rows, dtype=np.float64)
        for i, text in enumerate(batch.column("text").to_pylist()):
            toks = TOKEN_RE.findall(text.lower())
            # the tokenizer regex drops 1-char tokens ('a', 'i'), so the
            # ratio is over >=2-char tokens — mirrored in the SQL oracle
            if toks:
                sw = sum(1 for t in toks if t in STOPWORDS_EN)
                ratios[i] = sw / len(toks)
        lang = np.where(ratios >= threshold, "en", "und")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "stopword_ratio": pa.array(np.round(ratios, 6)),
                "lang": pa.array(lang, type=pa.string()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def quality_score(ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, n_tokens, n_chars, punct_ratio, stopword_ratio,
    quality): length/punctuation/stopword heuristics with a composite
    0..1 quality score."""

    def f(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        n_tok = np.zeros(n, dtype=np.int64)
        n_chars = np.zeros(n, dtype=np.int64)
        punct = np.zeros(n, dtype=np.float64)
        swr = np.zeros(n, dtype=np.float64)
        for i, text in enumerate(batch.column("text").to_pylist()):
            n_chars[i] = len(text)
            toks = TOKEN_RE.findall(text.lower())
            n_tok[i] = len(toks)
            if len(text):
                punct[i] = len(PUNCT_RE.findall(text)) / len(text)
            if toks:
                swr[i] = sum(1 for t in toks if t in STOPWORDS_EN) / len(toks)
        length_ok = np.clip(n_tok / 20.0, 0.0, 1.0)
        punct_ok = np.clip(1.0 - 5.0 * punct, 0.0, 1.0)
        quality = np.round(0.5 * length_ok + 0.3 * punct_ok + 0.2 * np.clip(10 * swr, 0, 1), 6)
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
        n = batch.num_rows
        ws = np.zeros(n, dtype=np.int64)
        reg = np.zeros(n, dtype=np.int64)
        bpe = np.zeros(n, dtype=np.int64)
        for i, text in enumerate(batch.column("text").to_pylist()):
            ws[i] = len(WS_RE.findall(text))
            reg[i] = len(TOKEN_RE.findall(text.lower()))
            bpe[i] = len(BPE_RE.findall(text))
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
        fps = []
        for text in batch.column("text").to_pylist():
            norm = " ".join(TOKEN_RE.findall(text.lower()))
            fps.append(hashlib.md5(norm.encode()).hexdigest())
        return pa.table(
            {"doc_id": batch.column("doc_id"), "fp": pa.array(fps, type=pa.string())}
        )

    return ds.map_batches(f, batch_format="pyarrow")
