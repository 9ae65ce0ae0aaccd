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


def _variant_record(tmp_path, model, dataset, params, ndcg, recall):
    from bm25_benchmarks_ray.state.run_record import save_run_record

    save_run_record(
        str(tmp_path), model, dataset, params,
        {"num_docs": 100, "num_queries": 10},
        {"index": {"elapsed": 1.0}, "query": {"elapsed": 1.0}},
        scores={"ndcg": {"NDCG@10": ndcg}, "recall": {"Recall@1000": recall}},
    )


def test_tokenizer_effect_table(tmp_path):
    """(stopwords, stemmer) NDCG pivot at fixed k1/b/method
    (generate_comparisons.py:148-170 analogue)."""
    from bm25_benchmarks_ray.pipelines.analysis import (
        tokenizer_effect_table,
        variants_frame,
    )
    from bm25_benchmarks_ray.state.run_record import load_run_records

    base = {"k1": 1.5, "b": 0.75, "method": "lucene"}
    for ds in ("dsA", "dsB"):
        for sw, st, score in (
            ("en", "snowball", 0.50), ("en", None, 0.45),
            (None, "snowball", 0.48), (None, None, 0.40),
        ):
            _variant_record(
                tmp_path, "bm25s", ds,
                {**base, "stopwords": sw, "stemmer": st}, score, 0.9,
            )
    # off-grid params must be excluded from the pivot
    _variant_record(tmp_path, "bm25s", "dsA", {**base, "k1": 0.9}, 0.99, 0.9)

    df = variants_frame(load_run_records(str(tmp_path)))
    tbl = tokenizer_effect_table(df, "ndcg@10")
    assert list(tbl.columns[:3]) == ["stopwords", "stemmer", "Avg."]
    assert len(tbl) == 4
    row = tbl[(tbl["stopwords"] == "en") & (tbl["stemmer"] == "snowball")]
    assert float(row["dsA"].iloc[0]) == 50.0 and float(row["Avg."].iloc[0]) == 50.0
    assert 99.0 not in set(tbl["dsA"])


def test_variant_table_with_alt_models_and_missing(tmp_path):
    """(k1, b, method) pivot folds non-bm25s models in as method rows;
    a missing dataset cell renders '--' and blanks the Avg."""
    from bm25_benchmarks_ray.pipelines.analysis import variant_table, variants_frame
    from bm25_benchmarks_ray.state.run_record import load_run_records

    tok = {"stopwords": "en", "stemmer": "snowball"}
    for ds in ("dsA", "dsB"):
        _variant_record(
            tmp_path, "bm25s", ds,
            {**tok, "k1": 1.5, "b": 0.75, "method": "lucene"}, 0.50, 0.90,
        )
        _variant_record(
            tmp_path, "bm25s", ds,
            {**tok, "k1": 1.2, "b": 0.75, "method": "atire"}, 0.46, 0.88,
        )
    # alt model only ran on dsA -> '--' on dsB, Avg blanked
    _variant_record(tmp_path, "pisa", "dsA", {"k1": 0.9, "b": 0.4}, 0.52, 0.91)

    df = variants_frame(load_run_records(str(tmp_path)))
    tbl = variant_table(df, "ndcg@10")
    assert list(tbl.columns[:4]) == ["k1", "b", "method", "Avg."]
    pisa = tbl[tbl["method"] == "pisa"]
    assert len(pisa) == 1 and pisa["dsB"].iloc[0] == "--"
    assert pisa["Avg."].iloc[0] == "--"
    lucene = tbl[tbl["method"] == "lucene"]
    assert float(lucene["Avg."].iloc[0]) == 50.0
    rec = variant_table(df, "r@1000")
    assert float(rec[rec["method"] == "lucene"]["dsA"].iloc[0]) == 90.0


def test_multicore_results(tmp_path):
    """query_numba timing wins over query; qps_norm divides by the
    baseline model column (combine_multicore.py analogue)."""
    from bm25_benchmarks_ray.pipelines.analysis import multicore_results
    from bm25_benchmarks_ray.state.run_record import save_run_record

    save_run_record(
        str(tmp_path), "ray-bm25", "dsA", {},
        {"num_docs": 100, "num_queries": 10},
        {"index": {"elapsed": 2.0}, "query": {"elapsed": 5.0},
         "query_numba": {"elapsed": 1.0}, "tokenize_queries": {"elapsed": 1.0}},
        scores={"ndcg": {"NDCG@10": 0.5}, "recall": {"Recall@1000": 0.9}},
    )
    save_run_record(
        str(tmp_path), "es", "dsA", {},
        {"num_docs": 100, "num_queries": 10},
        {"index": {"elapsed": 2.0}, "query": {"elapsed": 10.0}},
        scores={"ndcg": {"NDCG@10": 0.5}, "recall": {"Recall@1000": 0.9}},
    )
    out = multicore_results(str(tmp_path), baseline_model="es")
    # numba 1.0 + tokenize_queries 1.0 = 2.0s -> 5 qps (NOT 10/5)
    assert out["qps"].loc["dsA", "ray-bm25"] == pytest.approx(5.0)
    assert out["qps"].loc["dsA", "es"] == pytest.approx(1.0)
    assert out["qps_norm"].loc["dsA", "ray-bm25"] == pytest.approx(5.0)
    assert out["dps"].loc["dsA", "ray-bm25"] == pytest.approx(50.0)


def test_render_markdown_without_tabulate(tmp_path):
    """the container lacks tabulate: render_markdown must still emit a
    pipe table."""
    import pandas as pd

    from bm25_benchmarks_ray.pipelines.analysis import render_markdown

    pivot = pd.DataFrame({"m1": [1.234, 2.0]}, index=pd.Index(["a", "b"], name="ds"))
    md = render_markdown(pivot)
    lines = md.splitlines()
    assert lines[0].startswith("|") and "m1" in lines[0]
    assert set(lines[1]) <= {"|", "-", " "}
    assert "1.23" in md
