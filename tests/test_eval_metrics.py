"""Metric math vs hand-computed values; run-record round trip; analysis
pivots."""

from __future__ import annotations

import math

import pytest

from bm25_benchmarks_ray.functions.eval_metrics import (
    evaluate,
    map_at_k,
    ndcg_at_k,
    precision_at_k,
    recall_at_k,
    results_table_to_eval,
)

QRELS = {"d1": 2, "d2": 1, "d3": 0}          # two relevant (graded), one judged 0
SCORES = {"d1": 0.9, "d4": 0.8, "d2": 0.7}   # ranked: d1, d4, d2


def test_ndcg_hand_computed():
    # DCG@3 = 2/log2(2) + 0/log2(3) + 1/log2(4) = 2 + 0.5 = 2.5
    # IDCG@3 = 2/log2(2) + 1/log2(3)
    expected = 2.5 / (2.0 + 1.0 / math.log2(3))
    assert ndcg_at_k(QRELS, SCORES, 3) == pytest.approx(expected)


def test_map_hand_computed():
    # hits at ranks 1 (d1) and 3 (d2): AP = (1/1 + 2/3) / 2 relevant
    assert map_at_k(QRELS, SCORES, 3) == pytest.approx((1.0 + 2 / 3) / 2)


def test_recall_precision():
    assert recall_at_k(QRELS, SCORES, 1) == pytest.approx(0.5)
    assert recall_at_k(QRELS, SCORES, 3) == pytest.approx(1.0)
    assert precision_at_k(QRELS, SCORES, 2) == pytest.approx(0.5)  # d1 only
    assert precision_at_k(QRELS, SCORES, 3) == pytest.approx(2 / 3)


def test_evaluate_shapes():
    ndcg, m, r, p = evaluate({"q1": QRELS}, {"q1": SCORES}, [1, 3])
    assert set(ndcg) == {"NDCG@1", "NDCG@3"}
    assert ndcg["NDCG@1"] == pytest.approx(1.0)
    assert r["Recall@3"] == pytest.approx(1.0)


def test_results_table_to_eval():
    import pandas as pd

    df = pd.DataFrame(
        {"qid": ["q1", "q1"], "doc_id": [5, 7], "score": [1.5, 1.0]}
    )
    assert results_table_to_eval(df) == {"q1": {"5": 1.5, "7": 1.0}}


def test_run_record_roundtrip(tmp_path):
    from bm25_benchmarks_ray.pipelines.analysis import combine_results
    from bm25_benchmarks_ray.state.run_record import Timer, save_run_record

    t = Timer()
    t.start("index")
    t.stop("index", n_total=100)
    t.start("query")
    t.pause("query")
    t.resume("query")
    t.stop("query", n_total=10)
    for model in ("ray-bm25", "oracle"):
        save_run_record(
            str(tmp_path), model, "synthetic", {"k1": 1.5},
            {"num_docs": 100, "num_queries": 10}, t.to_dict(),
            scores={"ndcg": {"NDCG@10": 0.5}},
        )
    out = combine_results(str(tmp_path))
    assert len(out["runs"]) == 2
    assert set(out["qps"].columns) == {"ray-bm25", "oracle"}
    assert (out["runs"]["qps"] > 0).all()
