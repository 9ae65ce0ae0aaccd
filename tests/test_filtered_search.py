"""Filtered retrieval (search(allowed=...) + pipelines/docfilter.py):
masked top-k vs the numpy oracle restricted to allowed docs, edge
masks, and the bitmap helpers."""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from bm25_benchmarks_ray.config import IndexConfig
from bm25_benchmarks_ray.functions.bm25 import BM25Params
from bm25_benchmarks_ray.pipelines.docfilter import (
    allowed_bitmap,
    bitmap_from_ids,
    bitmap_nbytes,
    bitmap_slice,
    invert_bitmap,
    popcount,
)
from bm25_benchmarks_ray.pipelines.index_build import build_index
from bm25_benchmarks_ray.pipelines.query import search
from bm25_benchmarks_ray.sources.transcripts import (
    synthesize_queries,
    synthesize_transcripts,
)

from tests.oracle import build_oracle_index, oracle_scores
from tests.test_end_to_end import assert_rank_identical

N_TURNS = 360


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("fcorpus")
    table = synthesize_transcripts(N_TURNS, seed=11)
    pq.write_table(table, os.path.join(d, "t.parquet"))
    idx = str(tmp_path_factory.mktemp("fidx") / "index")
    build_index(str(d), idx, IndexConfig(), mode="transcripts", n_groups=2)
    df = table.to_pandas().sort_values(["conv_id", "turn_idx"], kind="mergesort")
    oracle = build_oracle_index(list(df["text"]))
    return idx, oracle


def _mask(n: int, frac: float, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.random(n) < frac


def _oracle_filtered_topk(oracle, qtext, params, allow: np.ndarray, k: int):
    scores = oracle_scores(oracle, qtext, params)
    ids = np.flatnonzero(allow)
    s = scores[ids]
    order = np.lexsort((ids, -s))[:k]
    return [(int(ids[i]), float(s[i])) for i in order]


@pytest.mark.parametrize(
    "method", ["lucene", "atire", "robertson", "bm25l", "bm25+", "okapi"]
)
def test_filtered_matches_oracle(built, method):
    idx, oracle = built
    params = BM25Params(method=method)
    allow = _mask(N_TURNS, 0.55, seed=3)
    bm = bitmap_from_ids(np.flatnonzero(allow), N_TURNS)
    queries = synthesize_queries(15, seed=21)
    res = search(
        idx, queries, params=params, k=10, allowed=bm, join_back=False
    ).to_pandas()
    for qid, qtext in queries:
        got = res[res["qid"] == qid].sort_values("rank")
        exp = _oracle_filtered_topk(oracle, qtext, params, allow, k=10)
        assert allow[list(got["doc_id"])].all(), (method, qid)
        assert_rank_identical(
            list(got["doc_id"]), got["score"].to_numpy(), exp,
            ctx=(method, qid, qtext),
        )


def test_mask_smaller_than_k(built):
    idx, oracle = built
    ids = np.array([7, 40, 199], dtype=np.int64)
    bm = bitmap_from_ids(ids, N_TURNS)
    res = search(
        idx, synthesize_queries(6, seed=5), k=10, allowed=bm, join_back=False
    ).to_pandas()
    for qid, g in res.groupby("qid"):
        assert sorted(g["doc_id"]) == [7, 40, 199]
        assert list(g.sort_values("rank")["rank"]) == [1, 2, 3]


def test_empty_mask_returns_no_rows(built):
    idx, _ = built
    bm = np.zeros(bitmap_nbytes(N_TURNS), dtype=np.uint8)
    res = search(
        idx, synthesize_queries(3, seed=5), k=10, allowed=bm, join_back=False
    ).to_pandas()
    assert len(res) == 0


def test_zero_match_query_pads_from_allowed(built):
    idx, _ = built
    ids = np.array([31, 99, 100, 250], dtype=np.int64)
    bm = bitmap_from_ids(ids, N_TURNS)
    res = search(
        idx, [("q_oov", "zzqqxxnotaword")], k=3, allowed=bm, join_back=False
    ).to_pandas().sort_values("rank")
    assert list(res["doc_id"]) == [31, 99, 100]
    assert (res["score"] == 0.0).all()


def test_wrong_size_bitmap_raises(built):
    idx, _ = built
    with pytest.raises(ValueError, match="bitmap"):
        search(idx, [("q", "hello")], allowed=np.zeros(1, dtype=np.uint8))


def test_bitmap_roundtrip_and_slice():
    rng = np.random.RandomState(0)
    n = 1003
    ids = np.flatnonzero(rng.random(n) < 0.3)
    bm = bitmap_from_ids(ids, n)
    assert popcount(bm) == ids.size
    full = bitmap_slice(bm, 0, n)
    assert np.array_equal(np.flatnonzero(full), ids)
    # arbitrary unaligned slice
    lo, hi = 117, 901
    assert np.array_equal(bitmap_slice(bm, lo, hi), full[lo:hi])
    inv = invert_bitmap(bm, n)
    assert popcount(inv) == n - ids.size
    assert not (np.flatnonzero(bitmap_slice(inv, 0, n)) == ids[:, None]).any()


def test_bitmap_out_of_range_raises():
    with pytest.raises(ValueError):
        bitmap_from_ids(np.array([8]), 8)


def test_allowed_bitmap_distributed_matches_local(ray_session):
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.RandomState(4)
    n = 5000
    ids = np.flatnonzero(rng.random(n) < 0.2).astype(np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": ids})).repartition(7)
    got = allowed_bitmap(ds, n)
    assert np.array_equal(got, bitmap_from_ids(ids, n))
