"""Persistent serving actors: rank-identical to the batch pipeline."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from bm25_benchmarks_ray.config import IndexConfig
from bm25_benchmarks_ray.functions.bm25 import BM25Params
from bm25_benchmarks_ray.pipelines.index_build import build_index
from bm25_benchmarks_ray.pipelines.query import search
from bm25_benchmarks_ray.pipelines.serve import BM25Server
from bm25_benchmarks_ray.sources.transcripts import (
    synthesize_queries,
    synthesize_transcripts,
)


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("srv")
    table = synthesize_transcripts(600, seed=41)
    n = table.num_rows
    for i in range(4):
        pq.write_table(
            table.slice(i * n // 4, n // 4), os.path.join(d, f"p{i}.parquet")
        )
    idx = str(d / "idx")
    build_index(str(d), idx, IndexConfig(), mode="transcripts", n_groups=2)
    return idx


@pytest.mark.parametrize("method", ["lucene", "robertson", "bm25+", "okapi"])
def test_served_equals_batch(built, method):
    params = BM25Params(method=method)
    queries = synthesize_queries(15, seed=3)
    batch = search(built, queries, params=params, k=7).to_pandas()
    batch = batch.sort_values(["qid", "rank"]).reset_index(drop=True)
    with BM25Server(built, params=params) as srv:
        served = srv.search(queries, k=7)
        served = served.sort_values(["qid", "rank"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            batch[["qid", "doc_id", "rank", "score"]],
            served[["qid", "doc_id", "rank", "score"]],
        )
        # repeated call hits the warmed caches, same answer
        again = srv.search(queries, k=7).sort_values(["qid", "rank"]).reset_index(
            drop=True
        )
        pd.testing.assert_frame_equal(
            served[["qid", "doc_id", "rank", "score"]],
            again[["qid", "doc_id", "rank", "score"]],
        )


def test_served_zero_match_and_joinback(built):
    with BM25Server(built) as srv:
        out = srv.search([("q_oov", "zzqqxnotaword"), ("q0", "data build")], k=5)
        oov = out[out["qid"] == "q_oov"].sort_values("rank")
        assert list(oov["doc_id"]) == [0, 1, 2, 3, 4]
        assert (oov["score"] == 0.0).all()
        assert {"conv_id", "turn_idx"} <= set(out.columns)


def test_warm_then_fast_path(built):
    queries = synthesize_queries(10, seed=5)
    with BM25Server(built) as srv:
        srv.warm(queries)
        out = srv.search(queries, k=5)
        assert len(out) == 10 * 5


def test_cli_serve(built, tmp_path, capsys):
    import json

    from bm25_benchmarks_ray.cli import main

    qfile = str(tmp_path / "q.tsv")
    with open(qfile, "w") as f:
        f.write("qa\tdata build stream\nqb\tshuffle merge\n")
    out_tsv = str(tmp_path / "served.tsv")
    rc = main(["serve", "--index", built, "--queries", qfile,
               "--output", out_tsv, "--warm", "--top-k", "4"])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["queries"] == 2 and stats["rows"] == 8 and stats["warmed"]
    import pandas as pd

    res = pd.read_csv(out_tsv, sep="\t")
    assert set(res["qid"]) == {"qa", "qb"}


def test_warm_top_df(built):
    with BM25Server(built) as srv:
        srv.warm_top_df(50)
        out = srv.search([("q", "data build")], k=3)
        assert len(out) == 3
