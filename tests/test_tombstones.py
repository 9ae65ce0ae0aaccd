"""Index-level deletes (pipelines/tombstones.py): liveDocs-masked
search vs the oracle, idempotent unions, composition with user
filters, the serving path, and survival across compaction."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bm25_benchmarks_ray.config import IndexConfig
from bm25_benchmarks_ray.functions.bm25 import BM25Params
from bm25_benchmarks_ray.pipelines.docfilter import bitmap_from_ids
from bm25_benchmarks_ray.pipelines.index_build import build_index, compact_index
from bm25_benchmarks_ray.pipelines.query import search
from bm25_benchmarks_ray.pipelines.tombstones import (
    delete_docs,
    live_count,
    load_tombstones,
)
from bm25_benchmarks_ray.sources.transcripts import (
    synthesize_queries,
    synthesize_transcripts,
)

from tests.oracle import build_oracle_index, oracle_scores
from tests.test_end_to_end import assert_rank_identical

N_TURNS = 300
DELETED = np.arange(0, N_TURNS, 7, dtype=np.int64)  # every 7th doc


@pytest.fixture()
def built(ray_session, tmp_path):
    d = tmp_path / "corpus"
    d.mkdir()
    table = synthesize_transcripts(N_TURNS, seed=13)
    # two files: n_groups clamps to len(files), and the compaction
    # test needs >= 2 groups to merge
    n = table.num_rows
    pq.write_table(table.slice(0, n // 2), os.path.join(d, "t0.parquet"))
    pq.write_table(table.slice(n // 2), os.path.join(d, "t1.parquet"))
    idx = str(tmp_path / "index")
    build_index(str(d), idx, IndexConfig(), mode="transcripts", n_groups=2)
    df = table.to_pandas().sort_values(["conv_id", "turn_idx"], kind="mergesort")
    oracle = build_oracle_index(list(df["text"]))
    return idx, oracle


def _oracle_topk_restricted(oracle, qtext, params, live: np.ndarray, k: int):
    scores = oracle_scores(oracle, qtext, params)
    s = scores[live]
    order = np.lexsort((live, -s))[:k]
    return [(int(live[i]), float(s[i])) for i in order]


def test_delete_masks_search(built):
    idx, oracle = built
    assert delete_docs(idx, DELETED) == DELETED.size
    live = np.setdiff1d(np.arange(N_TURNS), DELETED)
    params = BM25Params(method="lucene")
    queries = synthesize_queries(10, seed=31)
    res = search(idx, queries, params=params, k=10, join_back=False).to_pandas()
    assert not np.isin(res["doc_id"].to_numpy(), DELETED).any()
    for qid, qtext in queries:
        got = res[res["qid"] == qid].sort_values("rank")
        exp = _oracle_topk_restricted(oracle, qtext, params, live, k=10)
        assert_rank_identical(
            list(got["doc_id"]), got["score"].to_numpy(), exp, ctx=(qid, qtext)
        )


def test_delete_union_idempotent(built):
    idx, _ = built
    assert delete_docs(idx, np.array([3, 9])) == 2
    assert delete_docs(idx, np.array([9, 12])) == 3  # union, not append
    assert delete_docs(idx, np.array([3])) == 3
    assert list(load_tombstones(idx)) == [3, 9, 12]
    assert live_count(idx) == N_TURNS - 3


def test_delete_dataset_input(built):
    import ray.data as rd

    idx, _ = built
    ds = rd.from_arrow(pa.table({"doc_id": pa.array([5, 6, 5], type=pa.int64())}))
    assert delete_docs(idx, ds) == 2
    assert list(load_tombstones(idx)) == [5, 6]


def test_delete_out_of_range_raises(built):
    idx, _ = built
    with pytest.raises(ValueError):
        delete_docs(idx, np.array([N_TURNS]))


def test_delete_composes_with_user_filter(built):
    idx, oracle = built
    delete_docs(idx, DELETED)
    rng = np.random.RandomState(8)
    user_allow = rng.random(N_TURNS) < 0.6
    bm = bitmap_from_ids(np.flatnonzero(user_allow), N_TURNS)
    live = np.flatnonzero(user_allow & ~np.isin(np.arange(N_TURNS), DELETED))
    params = BM25Params(method="bm25+")
    queries = synthesize_queries(8, seed=17)
    res = search(
        idx, queries, params=params, k=10, allowed=bm, join_back=False
    ).to_pandas()
    for qid, qtext in queries:
        got = res[res["qid"] == qid].sort_values("rank")
        exp = _oracle_topk_restricted(oracle, qtext, params, live, k=10)
        assert_rank_identical(
            list(got["doc_id"]), got["score"].to_numpy(), exp, ctx=(qid, qtext)
        )


def test_served_search_honors_tombstones(built):
    from bm25_benchmarks_ray.pipelines.serve import BM25Server

    idx, oracle = built
    delete_docs(idx, DELETED)
    live = np.setdiff1d(np.arange(N_TURNS), DELETED)
    params = BM25Params(method="lucene")
    queries = synthesize_queries(6, seed=23)
    with BM25Server(idx, params=params, join_back=False) as srv:
        res = srv.search(queries, k=10)
    assert not np.isin(res["doc_id"].to_numpy(), DELETED).any()
    for qid, qtext in queries:
        got = res[res["qid"] == qid].sort_values("rank")
        exp = _oracle_topk_restricted(oracle, qtext, params, live, k=10)
        assert_rank_identical(
            list(got["doc_id"]), got["score"].to_numpy(), exp, ctx=(qid, qtext)
        )


def test_tombstones_survive_compaction(built):
    idx, oracle = built
    delete_docs(idx, DELETED)
    compact_index(idx)  # 2 groups -> 1; sidecar must carry through
    assert load_tombstones(idx) is not None
    live = np.setdiff1d(np.arange(N_TURNS), DELETED)
    params = BM25Params(method="lucene")
    queries = synthesize_queries(5, seed=41)
    res = search(idx, queries, params=params, k=10, join_back=False).to_pandas()
    assert not np.isin(res["doc_id"].to_numpy(), DELETED).any()
    for qid, qtext in queries:
        got = res[res["qid"] == qid].sort_values("rank")
        exp = _oracle_topk_restricted(oracle, qtext, params, live, k=10)
        assert_rank_identical(
            list(got["doc_id"]), got["score"].to_numpy(), exp, ctx=(qid, qtext)
        )
