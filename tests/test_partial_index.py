"""Partial-index query (groups=...): union of per-group partial results
equals the full search — the segment-union invariant at the API level,
and the analogue of the reference's query-only/mmap load scripts."""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from bm25_benchmarks_ray.config import IndexConfig
from bm25_benchmarks_ray.functions.bm25 import BM25Params
from bm25_benchmarks_ray.pipelines.index_build import build_index
from bm25_benchmarks_ray.pipelines.query import search
from bm25_benchmarks_ray.sources.transcripts import (
    synthesize_queries,
    synthesize_transcripts,
)


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("pi")
    table = synthesize_transcripts(500, seed=23)
    n = table.num_rows
    for i in range(4):
        pq.write_table(
            table.slice(i * n // 4, n // 4), os.path.join(d, f"p{i}.parquet")
        )
    idx = str(d / "idx")
    build_index(str(d), idx, IndexConfig(), mode="transcripts", n_groups=2)
    return idx


def test_union_of_group_searches_equals_full(built):
    queries = synthesize_queries(12, seed=8)
    params = BM25Params()
    k = 8
    full = search(built, queries, params=params, k=k, join_back=False).to_pandas()
    g0 = search(built, queries, params=params, k=k, join_back=False,
                groups=[0]).to_pandas()
    g1 = search(built, queries, params=params, k=k, join_back=False,
                groups=[1]).to_pandas()
    import pandas as pd

    merged = pd.concat([g0, g1])
    for qid, _ in queries:
        f = full[full["qid"] == qid].sort_values("rank")
        m = merged[merged["qid"] == qid].sort_values(
            ["score", "doc_id"], ascending=[False, True]
        ).head(k)
        got = dict(zip(m["doc_id"], m["score"]))
        # every full-result doc with positive score must appear in the
        # merged per-group results with an identical score
        for d_, s_ in zip(f["doc_id"], f["score"]):
            if s_ > 0:
                assert d_ in got
                assert abs(got[d_] - s_) < 1e-9


def test_groups_validation(built):
    with pytest.raises(ValueError):
        search(built, [("q", "hello")], groups=[99]).to_pandas()


def test_scatter_shape_overrides_equal_results(built):
    """Explicit n_qbatch/n_slices produce identical rankings to auto."""
    import pandas as pd

    queries = synthesize_queries(10, seed=31)
    base = search(built, queries, k=5).to_pandas().sort_values(
        ["qid", "rank"]).reset_index(drop=True)
    for qb, sl in [(1, 4), (2, 2), (4, 1)]:
        alt = search(built, queries, k=5, n_qbatch=qb, n_slices=sl).to_pandas()
        alt = alt.sort_values(["qid", "rank"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(base, alt)


def test_large_k_shape_equal_results(built):
    """k >= DENSE_K_CUTOFF (dense-accumulator regime): every scatter
    shape — auto, all-q-batch, all-slice — must rank identically."""
    import pandas as pd

    from bm25_benchmarks_ray.pipelines import query as Q

    queries = synthesize_queries(10, seed=41)
    k = Q.DENSE_K_CUTOFF
    base = search(built, queries, k=k).to_pandas()
    base = base.sort_values(["qid", "rank"]).reset_index(drop=True)
    for qb, sl in [(1, 2), (2, 2), (5, 1)]:
        alt = search(built, queries, k=k, n_qbatch=qb, n_slices=sl).to_pandas()
        alt = alt.sort_values(["qid", "rank"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(base, alt)
