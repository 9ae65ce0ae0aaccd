"""RRF fusion (pipelines/fusion.py): hand-computed fusions, tie rules,
rank-depth caps, and the multi-list / dataset-input paths."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from bm25_benchmarks_ray.pipelines.fusion import RRF_C, rrf_fuse


def _lst(rows: list[tuple[str, int, int]]) -> pa.Table:
    return pa.table(
        {
            "qid": pa.array([r[0] for r in rows], type=pa.string()),
            "doc_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "rank": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )


def _fused_dict(out) -> dict[tuple[str, int], tuple[float, int]]:
    df = out.to_pandas().sort_values(["qid", "rank"])
    return {
        (r.qid, int(r.doc_id)): (float(r.rrf), int(r.rank))
        for r in df.itertuples()
    }


def test_rrf_hand_computed(ray_session):
    # q0: doc 1 is rank 1 in list A and rank 2 in list B; doc 2 only in A
    a = _lst([("q0", 1, 1), ("q0", 2, 2)])
    b = _lst([("q0", 1, 2), ("q0", 3, 1)])
    got = _fused_dict(rrf_fuse([a, b], k=10))
    exp_d1 = round(1 / (RRF_C + 1) + 1 / (RRF_C + 2), 6)
    exp_d2 = round(1 / (RRF_C + 2), 6)
    exp_d3 = round(1 / (RRF_C + 1), 6)
    assert got[("q0", 1)] == (exp_d1, 1)
    # docs 2 and 3 tie in contribution sources but d3 has rank 1 in B
    assert got[("q0", 3)] == (exp_d3, 2)
    assert got[("q0", 2)] == (exp_d2, 3)


def test_rrf_tie_breaks_low_doc_id(ray_session):
    # identical contributions -> equal rrf -> lower doc_id wins
    a = _lst([("q0", 7, 1), ("q0", 3, 2)])
    b = _lst([("q0", 3, 1), ("q0", 7, 2)])
    df = rrf_fuse([a, b], k=2).to_pandas().sort_values("rank")
    assert list(df["doc_id"]) == [3, 7]
    assert df["rrf"].nunique() == 1


def test_rrf_k_in_caps_list_depth(ray_session):
    a = _lst([("q0", 1, 1), ("q0", 2, 25)])
    got = _fused_dict(rrf_fuse([a], k=10, k_in=20))
    assert ("q0", 2) not in got
    assert got[("q0", 1)] == (round(1 / (RRF_C + 1), 6), 1)


def test_rrf_k_truncates_output(ray_session):
    a = _lst([("q0", d, d) for d in range(1, 9)])
    df = rrf_fuse([a], k=3).to_pandas()
    assert len(df) == 3 and sorted(df["rank"]) == [1, 2, 3]


def test_rrf_many_queries_and_dataset_input(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(7)
    rows_a, rows_b = [], []
    for q in range(40):
        qid = f"q{q:03d}"
        docs = rng.permutation(100)[:10]
        for r, d in enumerate(docs, 1):
            rows_a.append((qid, int(d), r))
        docs = rng.permutation(100)[:10]
        for r, d in enumerate(docs, 1):
            rows_b.append((qid, int(d), r))
    a, b = _lst(rows_a), _lst(rows_b)
    got = _fused_dict(rrf_fuse([rd.from_arrow(a), rd.from_arrow(b)], k=5))
    # local replica
    exp: dict[str, dict[int, float]] = {}
    for qid, d, r in rows_a + rows_b:
        exp.setdefault(qid, {}).setdefault(d, 0.0)
        exp[qid][d] += 1 / (RRF_C + r)
    for qid, dd in exp.items():
        order = sorted(dd.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:5]
        for rank, (d, s) in enumerate(order, 1):
            assert got[(qid, d)] == (round(s, 6), rank)
    assert len(got) == 40 * 5


def test_rrf_single_list_is_identity_ranking(ray_session):
    a = _lst([("q0", 5, 1), ("q0", 9, 2), ("q1", 2, 1)])
    df = rrf_fuse([a], k=10).to_pandas()
    by_q = {q: list(g.sort_values("rank")["doc_id"]) for q, g in df.groupby("qid")}
    assert by_q == {"q0": [5, 9], "q1": [2]}


def test_rrf_custom_constant(ray_session):
    a = _lst([("q0", 1, 1)])
    df = rrf_fuse([a], k=1, c=10.0).to_pandas()
    assert float(df["rrf"][0]) == pytest.approx(round(1 / 11, 6))
