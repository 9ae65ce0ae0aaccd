"""grouped_topk: per-key top-k with deterministic tie handling."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from bm25_benchmarks_ray.pipelines.topk import grouped_topk


def _ref(df: pd.DataFrame, k: int) -> pd.DataFrame:
    df = df.sort_values(
        ["key", "score", "id"], ascending=[True, False, True]
    ).copy()
    df["rank"] = df.groupby("key").cumcount() + 1
    return (
        df[df["rank"] <= k]
        .sort_values(["key", "rank"])
        .reset_index(drop=True)
    )


def test_grouped_topk_matches_pandas_with_ties(ray_session):
    rng = np.random.RandomState(11)
    n = 5000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "key": rng.choice([f"s{i}" for i in range(17)], n),
            # coarse scores force many exact ties
            "score": np.round(rng.rand(n), 2),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(8)
    got = (
        grouped_topk(ds, key="key", score="score", id_col="id", k=7)
        .to_pandas()
        .sort_values(["key", "rank"])
        .reset_index(drop=True)
    )
    exp = _ref(df, 7)
    pd.testing.assert_frame_equal(
        got[["id", "key", "score", "rank"]],
        exp[["id", "key", "score", "rank"]],
        check_dtype=False,
    )

    # block-layout invariance
    got2 = (
        grouped_topk(
            rd.from_arrow(pa.Table.from_pandas(df)).repartition(3),
            key="key", score="score", id_col="id", k=7,
        )
        .to_pandas()
        .sort_values(["key", "rank"])
        .reset_index(drop=True)
    )
    assert (got2["id"].to_numpy() == got["id"].to_numpy()).all()


def test_grouped_topk_small_groups(ray_session):
    """k larger than some groups: every row of those groups survives."""
    df = pd.DataFrame(
        {
            "id": np.arange(6, dtype=np.int64),
            "key": ["a", "a", "b", "b", "b", "c"],
            "score": [1.0, 2.0, 3.0, 1.0, 2.0, 9.0],
        }
    )
    got = (
        grouped_topk(
            rd.from_arrow(pa.Table.from_pandas(df)), "key", "score", "id", k=10
        )
        .to_pandas()
        .sort_values(["key", "rank"])
    )
    assert len(got) == 6
    assert list(got[got["key"] == "b"]["id"]) == [2, 4, 3]
    assert list(got[got["key"] == "b"]["rank"]) == [1, 2, 3]
