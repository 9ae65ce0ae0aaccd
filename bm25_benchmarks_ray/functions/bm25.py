"""BM25 scoring math for the five reference variants, factored for a
distributed index.

Variant selection and defaults mirror the reference harness call-sites
(/root/reference/benchmark/on_bm25s.py:291-297,333-350 and
on_rank_bm25.py:118-128); the formulas themselves are standard public
knowledge (bm25s paper arXiv:2407.03618; SURVEY.md §2.6).

Every variant decomposes as::

    score(q, d) = sum_{token t in q} idf(t) * tf_shape(tf(t,d), dl(d))
                + |occurrences-agnostic query constant|

where

- ``idf`` depends only on (df(t), N) — a *global* per-term scalar kept
  in the small vocab table and looked up only for query terms,
- ``tf_shape`` depends only on (tf, dl, avgdl, k1, b, delta) — all known
  at segment-build time once avgdl is aggregated, so segments store
  float32 tf_shape per posting plus per-block max/min for block-max
  pruning (block_max_impact = idf * block_max_shape exactly, because
  idf is constant within a posting list),
- for bm25l/bm25+ a term *absent* from a doc still contributes
  ``idf * shape0`` (the delta-driven nonoccurrence score, doc-
  independent because tf=0 forces ctd=0).  We store the differential
  shape ``tf_shape - shape0`` in segments and add the per-query
  constant ``sum_tokens idf * shape0`` back at scoring time — ranks
  are unaffected, scores match the reference exactly (the same
  decomposition bm25s uses to keep sparse scoring exact).

All floating-point accumulation is float64 until the final cast, and
per-doc sums run in query-token order, matching the reference's
accumulation order within atol=1e-6 (on_bm25s.py:189).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

METHODS = ("lucene", "atire", "robertson", "bm25l", "bm25+", "okapi")


@dataclass(frozen=True)
class BM25Params:
    """Scoring configuration (reference defaults k1=1.5 b=0.75 delta=0.5,
    /root/reference/benchmark/on_bm25s.py:291-297; the rank-bm25 harness
    runs BM25Okapi with epsilon=0.0, on_rank_bm25.py:119-122)."""

    method: str = "lucene"
    k1: float = 1.5
    b: float = 0.75
    delta: float = 0.5
    epsilon: float = 0.0  # okapi only: negative-idf floor = eps * avg_idf

    def __post_init__(self):
        if self.method not in METHODS:
            raise ValueError(f"unknown BM25 method {self.method!r}; choose from {METHODS}")

    def key(self) -> str:
        base = f"{self.method}_k1={self.k1}_b={self.b}_delta={self.delta}"
        return base + (f"_eps={self.epsilon}" if self.method == "okapi" else "")


def avg_robertson_idf(dfs: np.ndarray, n_docs: int) -> float:
    """Mean robertson idf over the whole vocab — the base of BM25Okapi's
    epsilon floor (negatives included in the mean, as rank_bm25 does)."""
    dfs = np.asarray(dfs, dtype=np.float64)
    if dfs.size == 0:
        return 0.0
    return float(np.mean(np.log((n_docs - dfs + 0.5) / (dfs + 0.5))))


def idf(
    params: BM25Params,
    df: np.ndarray | float,
    n_docs: int,
    avg_idf: float | None = None,
) -> np.ndarray | float:
    """Per-term inverse document frequency for each variant (SURVEY §2.6).

    ``avg_idf`` (vocab-wide mean robertson idf) is required only for
    method="okapi" with epsilon != 0 — the floor for negative idfs is
    ``epsilon * avg_idf`` (rank_bm25 BM25Okapi semantics)."""
    df = np.asarray(df, dtype=np.float64)
    m = params.method
    if m in ("robertson", "okapi"):
        out = np.log((n_docs - df + 0.5) / (df + 0.5))
        if m == "okapi":
            if params.epsilon != 0.0 and avg_idf is None:
                raise ValueError("okapi with epsilon != 0 needs avg_idf")
            floor = params.epsilon * (avg_idf or 0.0)
            out = np.where(out < 0, floor, out)
    elif m == "atire":
        out = np.log(n_docs / df)
    elif m == "lucene":
        out = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    elif m == "bm25l":
        out = np.log((n_docs + 1.0) / (df + 0.5))
    else:  # bm25+
        out = np.log((n_docs + 1.0) / df)
    return out


def tf_shape(
    params: BM25Params,
    tf: np.ndarray,
    dl: np.ndarray,
    avgdl: float,
) -> np.ndarray:
    """The doc-local factor of the impact (idf excluded), float64."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    k1, b, delta = params.k1, params.b, params.delta
    norm = 1.0 - b + b * dl / avgdl
    m = params.method
    if m in ("lucene", "atire", "robertson", "okapi"):
        return tf * (k1 + 1.0) / (tf + k1 * norm)
    if m == "bm25l":
        ctd = tf / norm
        return (k1 + 1.0) * (ctd + delta) / (k1 + ctd + delta)
    # bm25+
    return (k1 + 1.0) * tf / (k1 * norm + tf) + delta


def nonoccurrence_shape(params: BM25Params) -> float:
    """tf_shape at tf=0 (doc-independent: ctd=0 regardless of dl)."""
    k1, delta = params.k1, params.delta
    if params.method == "bm25l":
        return (k1 + 1.0) * delta / (k1 + delta)
    if params.method == "bm25+":
        return float(delta)
    return 0.0


def differential_shape(
    params: BM25Params, tf: np.ndarray, dl: np.ndarray, avgdl: float
) -> np.ndarray:
    """tf_shape minus the nonoccurrence shape — what segments store.
    Always > 0 (tf_shape is strictly increasing in tf)."""
    return tf_shape(params, tf, dl, avgdl) - nonoccurrence_shape(params)


def query_constant(
    params: BM25Params, token_idfs: list[float] | np.ndarray
) -> float:
    """The doc-independent additive score every doc receives for this
    query: sum over query token *occurrences* of idf * shape0."""
    s0 = nonoccurrence_shape(params)
    if s0 == 0.0:
        return 0.0
    return float(np.sum(np.asarray(token_idfs, dtype=np.float64)) * s0)


def okapi_idf(df: np.ndarray, n_docs: int, epsilon: float = 0.0) -> np.ndarray:
    """rank_bm25 BM25Okapi idf: robertson with negative values floored to
    ``epsilon * avg_idf`` (harness pins epsilon=0.0,
    /root/reference/benchmark/on_rank_bm25.py:120-122)."""
    df = np.asarray(df, dtype=np.float64)
    raw = np.log((n_docs - df + 0.5) / (df + 0.5))
    avg = float(np.mean(raw)) if raw.size else 0.0
    return np.where(raw < 0, epsilon * avg, raw)


def score_dense(
    params: BM25Params,
    query_tokens: list[str],
    postings: dict[str, dict[int, int]],
    doc_lens: np.ndarray,
    n_docs: int,
    avgdl: float,
) -> np.ndarray:
    """Small-corpus exhaustive scorer: dense score vector over all docs
    (the reference's ``get_scores`` analogue, on_bm25s.py:133-150).
    Used by tests and the tiny-corpus fast path; accumulates in
    query-token order like the reference."""
    scores = np.zeros(n_docs, dtype=np.float64)
    s0 = nonoccurrence_shape(params)
    avg = None
    if params.method == "okapi":
        avg = avg_robertson_idf(
            np.array([len(p) for p in postings.values()]), n_docs
        )
    for tok in query_tokens:
        plist = postings.get(tok)
        if plist is None:
            # unseen query token: contributes nothing, not even shape0
            # (reference drops unseen tokens at query-tokenize time,
            # on_bm25s.py:90)
            continue
        t_idf = float(idf(params, len(plist), n_docs, avg_idf=avg))
        if s0:
            scores += t_idf * s0
        doc_ids = np.fromiter(plist.keys(), dtype=np.int64, count=len(plist))
        tfs = np.fromiter(plist.values(), dtype=np.float64, count=len(plist))
        shapes = tf_shape(params, tfs, doc_lens[doc_ids], avgdl)
        scores[doc_ids] += t_idf * (shapes - s0)
    return scores
