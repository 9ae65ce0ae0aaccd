"""Snippet extraction (pipelines/snippets.py) vs a pure-Python
reference: best-window argmax, earliest-start ties, dl < window cap,
occurrence (not distinct-term) counting, zero-hit and empty-doc
fallbacks, and stemmed-analyzer normalization."""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bm25_benchmarks_ray.config import IndexConfig
from bm25_benchmarks_ray.functions.bm25 import BM25Params
from bm25_benchmarks_ray.functions.tokenizer import STOPWORDS_EN, tokenize_text
from bm25_benchmarks_ray.pipelines.index_build import build_index
from bm25_benchmarks_ray.pipelines.snippets import snippet_topk

TOKEN_RE = re.compile(r"(?u)\b\w\w+\b")


def _kept(text: str) -> list[str]:
    return [t for t in TOKEN_RE.findall(text.lower())
            if t not in STOPWORDS_EN]


def _py_best_window(ks: list[str], terms: set[str], window: int):
    """(1-based start, score, snippet) — earliest-start argmax."""
    if not ks:
        return 1, 0, ""
    w = min(window, len(ks))
    best = (-1, -1)
    for s in range(len(ks) - w + 1):
        c = sum(1 for t in ks[s: s + w] if t in terms)
        if c > best[1]:
            best = (s, c)
    s, c = best
    return s + 1, c, " ".join(ks[s: s + w])


@pytest.fixture(scope="module")
def scorpus(ray_session, tmp_path_factory):
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "zeta zeta alpha zeta beta zeta zeta alpha beta gamma zeta",
        "the and of",              # kept stream is EMPTY (all stopwords)
        "alpha beta",              # dl < window
        "delta epsilon zeta delta epsilon zeta alpha alpha alpha zeta",
    ] + [f"filler{i:03d} words only here" for i in range(40)]
    d = tmp_path_factory.mktemp("snipcorpus")
    p = os.path.join(d, "docs.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                  "text": pa.array(texts, type=pa.string())}), p)
    idx = str(tmp_path_factory.mktemp("snipidx") / "index")
    build_index(p, idx, IndexConfig(stopwords="en", stemmer="none"),
                mode="documents", n_groups=2)
    return idx, p, texts


@pytest.mark.parametrize("query,window", [
    ("alpha beta", 4),
    ("zeta", 3),
    ("alpha beta gamma", 8),
    ("alpha epsilon", 5),
])
def test_snippets_match_python_reference(scorpus, query, window):
    idx, p, texts = scorpus
    got = snippet_topk(
        idx, p, [("q", query)], k=10, window=window,
        params=BM25Params(method="lucene"),
    ).to_pandas()
    terms = set(tokenize_text(query, stopwords=STOPWORDS_EN, stemmer=None))
    assert len(got) > 0
    for _, row in got.iterrows():
        ks = _kept(texts[int(row["doc_id"])])
        s, c, snip = _py_best_window(ks, terms, window)
        assert int(row["snip_start"]) == s, (row["doc_id"], query)
        assert int(row["snip_score"]) == c
        assert row["snippet"] == snip


def test_snippet_empty_kept_doc(scorpus):
    """A hit whose kept stream is empty (doc 2, all stopwords) gets the
    ('', start 1, score 0) fallback — only reachable via padding, so
    force it with k large enough to include zero-score docs."""
    idx, p, texts = scorpus
    got = snippet_topk(idx, p, [("q", "alpha")], k=45, window=4).to_pandas()
    row = got[got["doc_id"] == 2]
    assert len(row) == 1
    assert row.iloc[0]["snippet"] == ""
    assert int(row.iloc[0]["snip_start"]) == 1
    assert int(row.iloc[0]["snip_score"]) == 0


def test_snippet_occurrences_not_distinct(scorpus):
    """Doc 4's 'alpha alpha alpha' tail: the window counts occurrences,
    so the triple-alpha window beats earlier mixed windows for query
    'alpha' but earliest-start wins among equal windows."""
    idx, p, texts = scorpus
    got = snippet_topk(idx, p, [("q", "alpha")], k=10, window=3).to_pandas()
    row = got[got["doc_id"] == 4].iloc[0]
    assert int(row["snip_score"]) == 3
    assert row["snippet"] == "alpha alpha alpha"


def test_snippet_rank_and_score_match_plain_search(scorpus):
    """The ranking columns are exactly the plain BM25 top-k (snippets
    never perturb scores)."""
    from bm25_benchmarks_ray.pipelines.query import search

    idx, p, _ = scorpus
    params = BM25Params(method="lucene")
    got = snippet_topk(idx, p, [("q", "alpha beta")], k=10,
                       params=params).to_pandas()
    res = search(idx, [("q", "alpha beta")], params=params, k=10,
                 join_back=False).to_pandas()
    res["score"] = res["score"].round(6)
    res = res.sort_values(["qid", "score", "doc_id"],
                          ascending=[True, False, True])
    assert list(got["doc_id"]) == list(res["doc_id"])
    assert np.allclose(got["score"], res["score"])


def test_snippet_window_validation(scorpus):
    idx, p, _ = scorpus
    with pytest.raises(ValueError):
        snippet_topk(idx, p, [("q", "alpha")], window=0)


@pytest.fixture(scope="module")
def rawcorpus(ray_session, tmp_path_factory):
    """Docs with casing, punctuation and stopwords — raw excerpts must
    quote them verbatim."""
    texts = [
        "The Alpha-protocol, and its Beta variant, shipped in Gamma!",
        "  alpha...   BETA??  gamma   delta  ",
        "Alpha the beta THE gamma of delta AND epsilon zeta",
    ] + [f"Filler{i:03d}, words only here." for i in range(20)]
    d = tmp_path_factory.mktemp("rawcorpus")
    p = os.path.join(d, "docs.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                  "text": pa.array(texts, type=pa.string())}), p)
    idx = str(tmp_path_factory.mktemp("rawidx") / "index")
    build_index(p, idx, IndexConfig(stopwords="en", stemmer="none"),
                mode="documents", n_groups=2)
    return idx, p, texts


def _py_raw_excerpt(text: str, s0: int, w: int) -> str:
    """Reference: substring of the ORIGINAL text from the s0-th kept
    token's char start to the (s0+w-1)-th kept token's char end."""
    low = text.lower()
    spans = [(m.start(), m.end()) for m in TOKEN_RE.finditer(low)
             if m.group() not in STOPWORDS_EN]
    src = text if len(low) == len(text) else low
    return src[spans[s0][0]: spans[s0 + w - 1][1]]


def test_snippet_raw_quotes_original_text(rawcorpus):
    idx, p, texts = rawcorpus
    got = snippet_topk(idx, p, [("q", "alpha beta")], k=5,
                       window=3).to_pandas()
    assert len(got) > 0
    for _, row in got.iterrows():
        txt = texts[int(row["doc_id"])]
        ks = _kept(txt)
        if not ks:
            assert row["snippet_raw"] == ""
            continue
        w = min(3, len(ks))
        s0 = int(row["snip_start"]) - 1
        assert row["snippet_raw"] == _py_raw_excerpt(txt, s0, w), (
            row["doc_id"], row["snippet_raw"])
    # spot-check verbatim casing/punctuation survives: doc 0's window
    # starting at 'alpha' spans "Alpha-protocol, and its Beta variant,
    # shipped in Gamma"
    r0 = got[got["doc_id"] == 0]
    if len(r0):
        assert "Alpha" in r0.iloc[0]["snippet_raw"] or "Beta" in r0.iloc[0]["snippet_raw"]


@pytest.fixture(scope="module")
def stemcorpus(ray_session, tmp_path_factory):
    texts = [
        "running runner runs quickly jumping jumper jumps",
        "the runner was running while jumping over fences",
    ] + [f"filler{i:03d} words only here" for i in range(10)]
    d = tmp_path_factory.mktemp("stemcorpus")
    p = os.path.join(d, "docs.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                  "text": pa.array(texts, type=pa.string())}), p)
    idx = str(tmp_path_factory.mktemp("stemidx") / "index")
    build_index(p, idx, IndexConfig(stopwords="en", stemmer="porter2"),
                mode="documents", n_groups=1)
    return idx, p, texts


def test_snippet_stemmed_shows_surface_tokens(stemcorpus):
    """Under a stemmed analyzer, membership tests stems ('running'
    matches query 'run*' family) but the displayed snippet shows the
    document's SURFACE tokens, not stems."""
    idx, p, texts = stemcorpus
    got = snippet_topk(idx, p, [("q", "running")], k=3,
                       window=4).to_pandas()
    assert len(got) > 0
    top = got.iloc[0]
    # every display token is one of the document's own words
    # (lowercased surface forms), never a stem absent from the doc
    doc_words = set(
        re.findall(r"(?u)\b\w\w+\b", texts[int(top["doc_id"])].lower())
    )
    for tok in top["snippet"].split():
        assert tok in doc_words, (tok, doc_words)
    # crucially: NOT the stemmed forms — doc 0 contains 'running'
    # 'runner' 'jumping' etc., whose stems are 'run'/'runner'/'jump'
    d0 = got[got["doc_id"] == 0]
    if len(d0):
        snip = d0.iloc[0]["snippet"]
        assert "running" in snip or "jumping" in snip or "runner" in snip, snip
    # membership still counts via stems: 'running' query hits docs with
    # 'runs'/'runner' forms too
    assert int(top["snip_score"]) >= 1
