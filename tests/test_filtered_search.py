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


# ---------------------------------------------------------------- shards

def test_compose_shards_matches_full_unaligned(ray_session):
    """Per-group shard masks == slices of the corpus-wide bitmap, with
    byte-UNALIGNED group boundaries (adjacent shards share a byte) and
    tombstones folded in."""
    from bm25_benchmarks_ray.pipelines.docfilter import compose_shards

    rng = np.random.RandomState(7)
    n = 61
    ranges = [(0, 13), (13, 27), (27, 61)]
    allow = rng.random(n) < 0.6
    deleted = np.flatnonzero(rng.random(n) < 0.2).astype(np.int64)
    full = bitmap_from_ids(np.flatnonzero(allow), n)
    sh = compose_shards(ranges, n, user=full, deleted_ids=deleted)
    ref = allow.copy()
    ref[deleted] = False
    for lo, hi in ranges + [(2, 13), (13, 20), (30, 55), (27, 28)]:
        assert np.array_equal(sh.mask(lo, hi), ref[lo:hi]), (lo, hi)
    # a span crossing a shard boundary is a caller bug -> loud error
    with pytest.raises(ValueError):
        sh.mask(10, 20)


def test_compose_shards_no_user_filter(ray_session):
    """user=None means all-allowed minus tombstones."""
    from bm25_benchmarks_ray.pipelines.docfilter import compose_shards

    n = 40
    ranges = [(0, 19), (19, 40)]
    deleted = np.array([0, 5, 19, 39], dtype=np.int64)
    sh = compose_shards(ranges, n, user=None, deleted_ids=deleted)
    ref = np.ones(n, dtype=bool)
    ref[deleted] = False
    for lo, hi in ranges:
        assert np.array_equal(sh.mask(lo, hi), ref[lo:hi])


def test_allowed_shards_distributed_matches_bitmap(ray_session):
    """Fully-distributed shard build (no corpus-wide array on the
    driver) == the full-bitmap build, sliced per group."""
    import pyarrow as pa
    import ray.data as rd

    from bm25_benchmarks_ray.pipelines.docfilter import allowed_shards

    rng = np.random.RandomState(11)
    n = 5000
    ranges = [(0, 1701), (1701, 3333), (3333, 5000)]
    ids = np.flatnonzero(rng.random(n) < 0.25).astype(np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": ids})).repartition(9)
    sh = allowed_shards(ds, n, ranges)
    full = bitmap_from_ids(ids, n)
    for lo, hi in ranges + [(100, 1701), (1701, 1800), (4000, 4444)]:
        assert np.array_equal(sh.mask(lo, hi), bitmap_slice(full, lo, hi))


def test_search_accepts_prepublished_shards(built):
    """search(allowed=BitmapShards) == search(allowed=<full bitmap>)."""
    from bm25_benchmarks_ray.pipelines.docfilter import compose_shards
    from bm25_benchmarks_ray.state.manifest import Manifest

    idx, _ = built
    man = Manifest.load(idx)
    ranges = [
        (int(e["doc_lo"]), int(e["doc_hi"]))
        for g in man.done_groups() for e in [man.groups[str(g)]]
    ]
    allow = _mask(N_TURNS, 0.5, seed=9)
    bm = bitmap_from_ids(np.flatnonzero(allow), N_TURNS)
    queries = synthesize_queries(6, seed=33)
    a = search(idx, queries, k=10, allowed=bm, join_back=False).to_pandas()
    sh = compose_shards(ranges, N_TURNS, user=bm)
    b = search(idx, queries, k=10, allowed=sh, join_back=False).to_pandas()
    key = ["qid", "rank"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_filtered_plan_ships_no_full_corpus_array(
    ray_session, tmp_path, monkeypatch
):
    """The done-bar for sharded publication: with ≥2 group ranges
    present, NO ray.put during a filtered search carries a corpus-wide
    uint8 bitmap — only per-group slices (each strictly smaller) ship.
    (Two input files → two real groups; a single-file corpus collapses
    to one group whose shard IS corpus-wide.)"""
    import ray as ray_mod

    table = synthesize_transcripts(N_TURNS, seed=11)
    d = tmp_path / "corpus2"
    d.mkdir()
    pq.write_table(table.slice(0, N_TURNS // 2), str(d / "a.parquet"))
    pq.write_table(table.slice(N_TURNS // 2), str(d / "b.parquet"))
    idx = str(tmp_path / "index2")
    build_index(str(d), idx, IndexConfig(), mode="transcripts", n_groups=2)
    from bm25_benchmarks_ray.state.manifest import Manifest

    assert len(Manifest.load(idx).done_groups()) == 2
    full_bytes = bitmap_nbytes(N_TURNS)
    put_sizes = []
    real_put = ray_mod.put

    def spy_put(obj, *a, **kw):
        if isinstance(obj, np.ndarray) and obj.dtype == np.uint8:
            put_sizes.append(obj.nbytes)
        return real_put(obj, *a, **kw)

    monkeypatch.setattr(ray_mod, "put", spy_put)
    allow = _mask(N_TURNS, 0.5, seed=17)
    bm = bitmap_from_ids(np.flatnonzero(allow), N_TURNS)
    res = search(
        idx, synthesize_queries(4, seed=5), k=10, allowed=bm,
        join_back=False,
    ).to_pandas()
    assert len(res) > 0
    assert put_sizes, "expected per-group shard puts"
    assert all(s < full_bytes for s in put_sizes), put_sizes
    assert len(put_sizes) >= 2  # one object per group
