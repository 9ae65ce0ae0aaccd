"""Results aggregation: run records → throughput tables (driver-side
pandas — the data is one row per run).

Mirrors /root/reference/analysis/combine_results.py:77-228: derive
qps = n_queries / query_time and dps = n_docs / index_time (corpus
tokenization folded into index time, :99-103), group mean/std over
repeated runs, pivot dataset × model, and render csv/markdown.

Variant-comparison pivots mirror
/root/reference/analysis/generate_comparisons.py:145-249: NDCG@10 /
Recall@1000 ×100 rounded to one decimal, pivoted by (stopwords,
stemmer) at fixed k1=1.5/b=0.75/method=lucene (tokenizer effect) and
by (k1, b, method) at fixed stopwords=en/stemmer=snowball (variant
effect), "Avg." leading column, missing cells rendered "--" with the
row average blanked.
"""

from __future__ import annotations

import pandas as pd

from ..state.run_record import load_run_records


def records_to_frame(records: list[dict]) -> pd.DataFrame:
    rows = []
    for r in records:
        t = r.get("timing", {})
        s = r.get("stats", {})
        q_time = t.get("query", {}).get("elapsed")
        i_time = (
            (t.get("index", {}).get("elapsed") or 0)
            + (t.get("tokenize_corpus", {}).get("elapsed") or 0)
        ) or None
        rows.append(
            {
                "model": r.get("model"),
                "dataset": r.get("dataset"),
                "date": r.get("date"),
                "num_docs": s.get("num_docs"),
                "num_queries": s.get("num_queries"),
                "qps": (s.get("num_queries") / q_time) if q_time else None,
                "dps": (s.get("num_docs") / i_time) if i_time else None,
                "max_mem_gb": r.get("max_mem_gb"),
                "ndcg@10": (r.get("scores", {}).get("ndcg", {}) or {}).get("NDCG@10"),
                "recall@1000": (r.get("scores", {}).get("recall", {}) or {}).get(
                    "Recall@1000"
                ),
            }
        )
    return pd.DataFrame(rows)


def aggregate(df: pd.DataFrame) -> pd.DataFrame:
    """Mean/std over repeated (model, dataset) runs."""
    return (
        df.groupby(["model", "dataset"])
        .agg(
            qps_mean=("qps", "mean"),
            qps_std=("qps", "std"),
            dps_mean=("dps", "mean"),
            dps_std=("dps", "std"),
            runs=("qps", "size"),
        )
        .reset_index()
    )


def pivot_qps(df: pd.DataFrame) -> pd.DataFrame:
    """dataset × model qps table (combine_results.py:174-184)."""
    agg = aggregate(df)
    return agg.pivot(index="dataset", columns="model", values="qps_mean")


def pivot_dps(df: pd.DataFrame) -> pd.DataFrame:
    agg = aggregate(df)
    return agg.pivot(index="dataset", columns="model", values="dps_mean")


def render_markdown(pivot: pd.DataFrame) -> str:
    """Markdown pipe table; falls back to a hand-rolled renderer when
    pandas' optional ``tabulate`` dependency is absent (it is in this
    container — to_markdown raises ImportError without it)."""
    df = pivot.round(2)
    try:
        return df.to_markdown()
    except ImportError:
        flat = df.reset_index()
        cells = [[("" if v is None or v != v else str(v)) for v in row]
                 for row in flat.itertuples(index=False)]
        header = [str(c) for c in flat.columns]
        widths = [
            max(len(header[i]), *(len(r[i]) for r in cells)) if cells else len(header[i])
            for i in range(len(header))
        ]
        def line(row):
            return "| " + " | ".join(v.ljust(w) for v, w in zip(row, widths)) + " |"
        sep = "|" + "|".join("-" * (w + 2) for w in widths) + "|"
        return "\n".join([line(header), sep, *map(line, cells)])


def combine_results(result_dir: str) -> dict[str, pd.DataFrame]:
    df = records_to_frame(load_run_records(result_dir))
    if df.empty:
        return {"runs": df}
    return {"runs": df, "agg": aggregate(df), "qps": pivot_qps(df), "dps": pivot_dps(df)}


# --- multicore-run aggregation (combine_multicore.py) ---


def multicore_frame(records: list[dict]) -> pd.DataFrame:
    """One row per multicore run (combine_multicore.py:38-78): the
    engine-specific timing key wins (query_numba > query_numpy >
    query), tokenize_queries folds into query time and
    tokenize_corpus into index time."""
    rows = []
    for r in records:
        t = r.get("timing", {})

        def elapsed(key):
            e = t.get(key)
            return e.get("elapsed") if e else None

        q_time = elapsed("query_numba") or elapsed("query_numpy") or elapsed("query")
        i_time = elapsed("index")
        if i_time is not None and elapsed("tokenize_corpus"):
            i_time += elapsed("tokenize_corpus")
        if q_time is not None and elapsed("tokenize_queries"):
            q_time += elapsed("tokenize_queries")
        s = r.get("stats", {})
        scores = r.get("scores", {}) or {}
        rows.append(
            {
                "model": r.get("model"),
                "dataset": r.get("dataset"),
                "ndcg@10": (scores.get("ndcg", {}) or {}).get("NDCG@10"),
                "r@1000": (scores.get("recall", {}) or {}).get("Recall@1000"),
                "qps": (s.get("num_queries") / q_time) if q_time else None,
                "dps": (s.get("num_docs") / i_time) if i_time else None,
                "max_mem_gb": r.get("max_mem_gb", -1),
            }
        )
    return pd.DataFrame(rows)


def qps_norm(qps_pivot: pd.DataFrame, baseline_model: str) -> pd.DataFrame:
    """qps normalized to one model's column (qps_norm_es analogue,
    combine_multicore.py:120)."""
    return qps_pivot.div(qps_pivot[baseline_model], axis=0).round(2)


def multicore_results(
    result_dir: str, baseline_model: str | None = None
) -> dict[str, pd.DataFrame]:
    """runs/agg/qps/dps/qps_std (+ qps_norm when a baseline model is
    named) — the combine_multicore.py artifact set."""
    df = multicore_frame(load_run_records(result_dir))
    if df.empty:
        return {}
    agg = (
        df.groupby(["model", "dataset"])
        .agg(
            **{
                "ndcg@10": ("ndcg@10", "mean"),
                "r@1000": ("r@1000", "mean"),
                "qps": ("qps", "mean"),
                "qps_std": ("qps", "std"),
                "dps": ("dps", "mean"),
                "dps_std": ("dps", "std"),
            }
        )
        .reset_index()
    )
    out = {
        "runs": df,
        "agg": agg,
        "qps": agg.pivot(index="dataset", columns="model", values="qps").round(2),
        "qps_std": agg.pivot(index="dataset", columns="model", values="qps_std").round(2),
        "dps": agg.pivot(index="dataset", columns="model", values="dps").round(2),
    }
    if baseline_model and baseline_model in out["qps"].columns:
        out["qps_norm"] = qps_norm(out["qps"], baseline_model)
    return out


# --- variant / tokenizer-effect comparisons (generate_comparisons.py) ---

_METRIC_PATHS = {"ndcg@10": ("ndcg", "NDCG@10"), "r@1000": ("recall", "Recall@1000")}


def variants_frame(records: list[dict]) -> pd.DataFrame:
    """One row per run with the variant axes. Params are read from the
    record's ``params`` dict with top-level fallback, so both this
    engine's records and reference-format records
    (generate_comparisons.py:113-130) parse."""
    rows = []
    for r in records:
        p = r.get("params") or {}

        def get(key, default=None):
            return p.get(key, r.get(key, default))

        scores = r.get("scores", {}) or {}
        row = {
            "model": r.get("model"),
            "dataset": r.get("dataset"),
            "k1": get("k1", 1.5),
            "b": get("b", 0.75),
            "delta": get("delta", 0.5),
            "method": get("method", "N/A"),
            "stopwords": get("stopwords") or "None",
            "stemmer": get("stemmer") or "None",
        }
        for metric, (outer, inner) in _METRIC_PATHS.items():
            v = (scores.get(outer, {}) or {}).get(inner)
            row[metric] = round(v * 100, 1) if v is not None else None
        rows.append(row)
    return pd.DataFrame(rows)


def _lead_with_avg(pivot: pd.DataFrame) -> pd.DataFrame:
    """Avg. first column; rows with missing cells get a blank Avg. and
    '--' placeholders (generate_comparisons.py:196-210)."""
    pivot = pivot.copy()
    pivot["Avg."] = pivot.mean(axis=1).astype(float).round(1)
    pivot.loc[pivot.isnull().sum(axis=1) > 0, "Avg."] = None
    cols = ["Avg."] + [c for c in pivot.columns if c != "Avg."]
    return pivot[cols].fillna("--").reset_index()


def tokenizer_effect_table(
    df: pd.DataFrame,
    metric: str = "ndcg@10",
    model: str = "bm25s",
    k1: float = 1.5,
    b: float = 0.75,
    method: str = "lucene",
) -> pd.DataFrame:
    """(stopwords, stemmer) × dataset pivot at fixed scoring params
    (generate_comparisons.py:148-170)."""
    sel = df[
        (df["model"] == model)
        & (df["k1"] == k1)
        & (df["b"] == b)
        & (df["method"] == method)
    ]
    pivot = sel.pivot_table(
        index=["stopwords", "stemmer"], columns="dataset", values=metric
    )
    return _lead_with_avg(pivot)


def variant_table(
    df: pd.DataFrame,
    metric: str = "ndcg@10",
    model: str = "bm25s",
    stopwords: str = "en",
    stemmer: str = "snowball",
) -> pd.DataFrame:
    """(k1, b, method) × dataset pivot at the default tokenizer; runs
    of OTHER models fold in with model name as the method row
    (generate_comparisons.py:176-215)."""
    sel = df[
        (df["model"] == model)
        & (df["stopwords"] == stopwords)
        & (df["stemmer"] == stemmer)
    ].copy()
    alt = df[df["model"] != model].copy()
    alt["method"] = alt["model"]
    sel = pd.concat([sel, alt])
    pivot = sel.pivot_table(index=["k1", "b", "method"], columns="dataset", values=metric)
    return _lead_with_avg(pivot)


def comparison_tables(result_dir: str) -> dict[str, pd.DataFrame]:
    """The four comparison artifacts of generate_comparisons.py:
    tokenizer_effect / bm25s_variants in both metrics."""
    df = variants_frame(load_run_records(result_dir))
    if df.empty:
        return {}
    return {
        "tokenizer_effect": tokenizer_effect_table(df, "ndcg@10"),
        "tokenizer_effect_recall": tokenizer_effect_table(df, "r@1000"),
        "bm25s_variants": variant_table(df, "ndcg@10"),
        "bm25s_variants_recall": variant_table(df, "r@1000"),
    }
