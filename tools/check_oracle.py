"""Local replica of the driver's correctness gate: run each queries()
entry and its oracle_sql() side by side at a given sf and compare
row-count, schema (column names), and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    try:
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    except TypeError:
        pass  # unhashable (list) columns: rows-only entries, order kept
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        got = normalize(to_pandas(fn(sf_dir)))
        if name not in sqls:
            print(f"{name:28s} rows={len(got)} (no SQL oracle: rows-only)")
            continue
        exp = normalize(con.execute(sqls[name]).df())
        status = []
        if len(got) != len(exp):
            status.append(f"ROWS {len(got)} != {len(exp)}")
        if list(got.columns) != list(exp.columns):
            status.append(f"SCHEMA {list(got.columns)} != {list(exp.columns)}")
        if not status:
            try:
                pd.testing.assert_frame_equal(
                    got, exp, check_dtype=True, check_exact=False, atol=1e-6, rtol=1e-9
                )
            except AssertionError as ex:
                status.append("VALUES " + str(ex).splitlines()[-1][:120])
        if status:
            failures += 1
            print(f"{name:28s} FAIL  {'; '.join(status)}")
        else:
            print(f"{name:28s} OK    rows={len(got)}")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
