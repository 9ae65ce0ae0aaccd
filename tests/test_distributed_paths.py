"""Force the at-scale code branches (distributed conv-offsets groupby,
distributed vocab aggregation) that the driver-side fast paths normally
shadow below DRIVER_SIDE_ROWS."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

import bm25_benchmarks_ray.pipelines.index_build as ib
from bm25_benchmarks_ray.config import IndexConfig
from bm25_benchmarks_ray.functions.bm25 import BM25Params
from bm25_benchmarks_ray.pipelines.query import search
from bm25_benchmarks_ray.sources.transcripts import (
    synthesize_queries,
    synthesize_transcripts,
)
from tests.oracle import build_oracle_index, oracle_topk


def test_distributed_offsets_and_vocab(ray_session, tmp_path, monkeypatch):
    monkeypatch.setattr(ib, "DRIVER_SIDE_ROWS", 0)  # force Ray paths
    d = tmp_path / "corpus"
    d.mkdir()
    table = synthesize_transcripts(350, seed=19)
    n = table.num_rows
    pq.write_table(table.slice(0, n // 2), str(d / "a.parquet"))
    pq.write_table(table.slice(n // 2), str(d / "b.parquet"))
    idx = str(tmp_path / "idx")
    man = ib.build_index(str(d), idx, IndexConfig(), mode="transcripts")
    assert man.is_complete()
    assert os.path.isdir(os.path.join(idx, "vocab"))

    df = table.to_pandas().sort_values(["conv_id", "turn_idx"], kind="mergesort")
    oracle = build_oracle_index(list(df["text"]))
    assert man.stats["num_docs"] == oracle.n_docs
    assert man.stats["n_terms"] == len(oracle.postings)

    params = BM25Params()
    res = search(idx, synthesize_queries(8, seed=2), params=params, k=5).to_pandas()
    for qid, qtext in synthesize_queries(8, seed=2):
        got = res[res["qid"] == qid].sort_values("rank")
        exp = oracle_topk(oracle, qtext, params, k=5)
        import numpy as np

        np.testing.assert_allclose(
            got["score"].to_numpy(), [s for _, s in exp], atol=1e-6
        )
