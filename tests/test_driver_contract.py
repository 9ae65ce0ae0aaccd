"""Smoke tests for the driver contract in ``__ray_entry__.py``.

The driver imports ``entry`` / ``queries`` / ``oracle_sql`` and runs
them itself (full value-hash sweep lives in tools/check_oracle.py);
this guards the contract's shape in the normal test suite so a refactor
of driver_api can't silently break the registry between oracle sweeps.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"


def _load_entry_module():
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", os.path.join(REPO, "__ray_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("__ray_entry__", mod)
    spec.loader.exec_module(mod)
    return mod


def _num_rows(res) -> int:
    if hasattr(res, "count"):  # ray.data.Dataset
        return res.count()
    if hasattr(res, "num_rows"):  # pyarrow.Table
        return res.num_rows
    return len(res)  # pandas


def test_registry_keys_align(ray_session):
    mod = _load_entry_module()
    q = mod.queries()
    sql = mod.oracle_sql()
    assert q, "queries() registry is empty"
    # every oracle belongs to a real query, and (this repo's claim)
    # every query entry carries a SQL oracle — zero rows-only checks
    assert set(sql) == set(q)
    assert all(callable(fn) for fn in q.values())
    assert all(isinstance(s, str) and s.strip() for s in sql.values())


def test_entry_smoke(ray_session):
    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata not present")
    mod = _load_entry_module()
    res = mod.entry()
    assert _num_rows(res) >= 0
    # stable schema: a second call yields identical column names
    def _cols(r):
        sch = getattr(r, "schema", None)
        if sch is None:
            return sorted(r.columns)  # pandas
        if callable(sch):
            sch = sch()  # ray.data.Dataset
        return sorted(sch.names)
    cols = _cols(res)
    assert cols == _cols(mod.entry()) and cols


def test_one_query_runs_at_sf0001(ray_session):
    if not os.path.isdir(SF_DIR):
        pytest.skip("driver testdata not present")
    mod = _load_entry_module()
    q = mod.queries()
    res = q["corpus_stats"](SF_DIR)
    assert _num_rows(res) == 1
