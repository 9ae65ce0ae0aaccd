"""Query-surface edge cases: empty inputs, k larger than the corpus,
degenerate query strings."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bm25_benchmarks_ray.config import IndexConfig
from bm25_benchmarks_ray.functions.bm25 import BM25Params
from bm25_benchmarks_ray.pipelines.index_build import build_index
from bm25_benchmarks_ray.pipelines.query import search


@pytest.fixture(scope="module")
def tiny(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("edge")
    texts = ["alpha beta gamma", "beta gamma delta", "gamma delta epsilon",
             "zeta eta theta", "iota kappa lambda"]
    pq.write_table(
        pa.table({"doc_id": pa.array(range(5), type=pa.int64()),
                  "text": pa.array(texts)}),
        os.path.join(d, "docs.parquet"),
    )
    idx = str(d / "idx")
    build_index(str(d), idx, IndexConfig(), mode="documents")
    return idx


def test_k_exceeds_corpus(tiny):
    res = search(tiny, [("q", "beta")], k=50).to_pandas().sort_values("rank")
    # dense semantics: every doc ranked; matched first, then unmatched at 0
    assert len(res) == 5
    assert list(res["rank"]) == [1, 2, 3, 4, 5]
    assert set(res["doc_id"]) == set(range(5))
    assert (res["score"].iloc[:2] > 0).all()      # docs 0,1 contain beta
    assert (res["score"].iloc[2:] == 0.0).all()   # the rest pad at qconst


def test_empty_query_list(tiny):
    res = search(tiny, [], k=3).to_pandas()
    assert len(res) == 0


def test_empty_and_whitespace_query_text(tiny):
    res = search(tiny, [("qe", ""), ("qw", "   \t  ")], k=2).to_pandas()
    for qid in ("qe", "qw"):
        got = res[res["qid"] == qid].sort_values("rank")
        assert list(got["doc_id"]) == [0, 1]       # pure padding at 0
        assert (got["score"] == 0.0).all()


def test_single_doc_corpus(ray_session, tmp_path):
    pq.write_table(
        pa.table({"doc_id": pa.array([0], type=pa.int64()),
                  "text": pa.array(["only document here"])}),
        os.path.join(tmp_path, "docs.parquet"),
    )
    idx = str(tmp_path / "idx")
    build_index(str(tmp_path), idx, IndexConfig(), mode="documents")
    res = search(idx, [("q", "document"), ("q2", "missing")], k=3).to_pandas()
    q = res[res["qid"] == "q"]
    assert list(q["doc_id"]) == [0] and (q["score"] > 0).all()
    q2 = res[res["qid"] == "q2"]
    assert list(q2["doc_id"]) == [0] and (q2["score"] == 0.0).all()


def test_plan_groups_rounds_to_overlap_multiple():
    from bm25_benchmarks_ray.pipelines.index_build import (
        TARGET_GROUP_DOCS,
        _plan_groups,
    )

    # 2.4x the target -> auto plan is 3 groups; at overlap=2 that leaves
    # a half-width straggler wave, so the planner rounds DOWN to 2
    # (groups stay under 1.5x target)
    files = [f"f{i}" for i in range(24)]
    rows = [TARGET_GROUP_DOCS // 10] * 24
    assert len(_plan_groups(files, rows, None, overlap=2)) == 2
    # 1.8x target -> 2 groups is already a multiple of 2
    assert len(_plan_groups(files, rows[:18], None, overlap=2)) == 2
    # rounding down would blow past 1.5x target -> round UP instead:
    # 5 groups at 1.0x target each -> 6 groups at overlap=4? no: 5->8
    # would shrink groups, 5->4 gives 1.25x target (allowed)
    rows5 = [TARGET_GROUP_DOCS // 4] * 20  # 5.0x target
    assert len(_plan_groups(files[:20], rows5, None, overlap=2)) == 4
    # explicit n_groups is never overridden
    assert len(_plan_groups(files, rows, 3, overlap=2)) == 3
    # overlap=1 keeps the pure ceil plan
    assert len(_plan_groups(files, rows, None, overlap=1)) == 3


def test_rebuild_at_same_path_serves_new_postings(ray_session, tmp_path):
    # same index path, different corpus: no layer (worker state, plan
    # df lookups, manifest) may serve postings from the old build
    def write(texts):
        pq.write_table(
            pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                      "text": pa.array(texts)}),
            os.path.join(tmp_path, "docs.parquet"),
        )

    idx = str(tmp_path / "idx")
    write(["needle one", "hay two", "hay three"])
    build_index(str(tmp_path), idx, IndexConfig(), mode="documents", fresh=True)
    r1 = search(idx, [("q", "needle")], k=1).to_pandas()
    assert r1.iloc[0]["doc_id"] == 0

    write(["hay one", "hay two", "needle three"])
    build_index(str(tmp_path), idx, IndexConfig(), mode="documents", fresh=True)
    r2 = search(idx, [("q", "needle")], k=1).to_pandas()
    assert r2.iloc[0]["doc_id"] == 2
