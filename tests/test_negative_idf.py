"""Negative-idf (robertson, df > N/2) ranking: unmatched docs score the
query constant and must be merged into the ranking BY SCORE — with a
negative-idf term, matched docs score negative and every unmatched doc
outranks them (the dense-vector reference semantics,
/root/reference/benchmark/on_rank_bm25.py:29-33 ranks the full score
vector).  Regression for the round-1 ADVICE repro where padding was
appended after matched docs."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bm25_benchmarks_ray.config import IndexConfig
from bm25_benchmarks_ray.functions.bm25 import BM25Params
from bm25_benchmarks_ray.pipelines.index_build import build_index
from bm25_benchmarks_ray.pipelines.query import search

from tests.oracle import build_oracle_index, oracle_topk

N_DOCS = 40


def _texts() -> list[str]:
    # "common" in docs 0..29 (df=30 > N/2=20): robertson idf < 0.
    # docs 30..39 never contain it; "rare" only in docs 5 and 35.
    texts = []
    for d in range(N_DOCS):
        parts = ["filler"]
        if d < 30:
            parts.append("common common")
        if d in (5, 35):
            parts.append("rare")
        parts.append(f"uniqword{d}")
        texts.append(" ".join(parts))
    return texts


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("negidf")
    texts = _texts()
    for i, (lo, hi) in enumerate([(0, 20), (20, N_DOCS)]):
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(lo, hi), type=pa.int64()),
                    "text": pa.array(texts[lo:hi]),
                }
            ),
            os.path.join(d, f"p{i}.parquet"),
        )
    idx = str(tmp_path_factory.mktemp("negidx") / "index")
    cfg = IndexConfig()
    man = build_index(str(d), idx, cfg, mode="documents", n_groups=2)
    oracle = build_oracle_index(texts)
    return idx, man, oracle


def test_group_doc_ranges_recorded(built):
    idx, man, oracle = built
    spans = sorted(
        (e["doc_lo"], e["doc_hi"]) for e in man.groups.values()
    )
    assert spans == [(0, 20), (20, 40)]


@pytest.mark.parametrize("mode", ["pruned", "exhaustive"])
@pytest.mark.parametrize(
    "qtext", ["common", "common rare", "common common filler", "rare"]
)
def test_robertson_negative_idf_matches_oracle(built, mode, qtext):
    idx, man, oracle = built
    params = BM25Params(method="robertson")
    res = search(idx, [("q", qtext)], params=params, k=10, mode=mode).to_pandas()
    res = res.sort_values("rank")
    exp = oracle_topk(oracle, qtext, params, k=10)
    assert list(res["doc_id"]) == [d for d, _ in exp], (mode, qtext)
    np.testing.assert_allclose(
        res["score"].to_numpy(), np.array([s for _, s in exp]), atol=1e-9
    )


@pytest.mark.parametrize("eps", [0.0, 0.25])
@pytest.mark.parametrize("qtext", ["common rare", "common", "rare filler"])
def test_okapi_epsilon_floor_matches_oracle(built, eps, qtext):
    """BM25Okapi: negative idfs floored to eps * vocab-avg idf; matched
    docs never score below the floor contribution, so the padding
    interleave differs from raw robertson."""
    idx, man, oracle = built
    params = BM25Params(method="okapi", epsilon=eps)
    res = search(idx, [("q", qtext)], params=params, k=10).to_pandas()
    res = res.sort_values("rank")
    exp = oracle_topk(oracle, qtext, params, k=10)
    got_scores = res["score"].to_numpy()
    exp_scores = np.array([s for _, s in exp])
    np.testing.assert_allclose(got_scores, exp_scores, atol=1e-9)
    for gd, gs, (ed, es) in zip(res["doc_id"], got_scores, exp):
        assert gd == ed or abs(gs - es) <= 1e-9


def test_unmatched_outrank_matched(built):
    """The concrete ADVICE scenario: single negative-idf term query →
    top-10 must be exactly the unmatched docs at score 0.0."""
    idx, man, oracle = built
    res = search(
        idx, [("q", "common")], params=BM25Params(method="robertson"), k=10
    ).to_pandas()
    res = res.sort_values("rank")
    assert list(res["doc_id"]) == list(range(30, 40))
    assert (res["score"] == 0.0).all()


@pytest.mark.parametrize("method", ["lucene", "bm25l", "bm25+"])
def test_positive_methods_unaffected(built, method):
    idx, man, oracle = built
    params = BM25Params(method=method)
    for qtext in ("common rare", "filler", "uniqword7 common"):
        res = search(idx, [("q", qtext)], params=params, k=10).to_pandas()
        res = res.sort_values("rank")
        exp = oracle_topk(oracle, qtext, params, k=10)
        got_scores = res["score"].to_numpy()
        exp_scores = np.array([s for _, s in exp])
        np.testing.assert_allclose(got_scores, exp_scores, atol=1e-6)
        for gd, gs, (ed, es) in zip(res["doc_id"], got_scores, exp):
            assert gd == ed or abs(gs - es) <= 1e-6
