"""Results aggregation: run records → throughput tables (driver-side
pandas — the data is one row per run).

Mirrors /root/reference/analysis/combine_results.py:77-228: derive
qps = n_queries / query_time and dps = n_docs / index_time (corpus
tokenization folded into index time, :99-103), group mean/std over
repeated runs, pivot dataset × model, and render csv/markdown.
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
    return pivot.round(2).to_markdown()


def combine_results(result_dir: str) -> dict[str, pd.DataFrame]:
    df = records_to_frame(load_run_records(result_dir))
    if df.empty:
        return {"runs": df}
    return {"runs": df, "agg": aggregate(df), "qps": pivot_qps(df), "dps": pivot_dps(df)}
