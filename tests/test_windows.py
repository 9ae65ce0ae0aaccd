"""Window operators (sessionize / tumbling / as-of join) and the
stratified sampler on hand-computed event fixtures."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from bm25_benchmarks_ray.pipelines.sampling import stratified_sample
from bm25_benchmarks_ray.pipelines.windows import (
    US,
    asof_join,
    sessionize,
    tumbling_window,
)

MIN = 60 * US


def _events(rows):
    """rows: (event_id, user_id, minutes, event_type, value)."""
    return rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
                "ts": pa.array(
                    [r[2] * MIN for r in rows], type=pa.timestamp("us")
                ),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([r[4] for r in rows], type=pa.float64()),
            }
        )
    )


@pytest.fixture(scope="module")
def small_events(ray_session):
    # user 1: t=0, 10, 50 min  -> 40-min gap splits into 2 sessions
    # user 2: t=5 min          -> 1 single-event session
    return _events(
        [
            (0, 1, 0, "click", 1.0),
            (1, 1, 10, "purchase", 2.0),
            (2, 1, 50, "click", 4.0),
            (3, 2, 5, "purchase", 8.0),
        ]
    )


def test_sessionize_gap_split(small_events):
    out = sessionize(small_events, gap_s=1800).to_pandas()
    out = out.sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    assert out[["user_id", "session_idx", "n_events"]].values.tolist() == [
        [1, 0, 2],
        [1, 1, 1],
        [2, 0, 1],
    ]
    s0 = out.iloc[0]
    assert s0.start_us == 0 and s0.end_us == 10 * MIN and s0.sum_value == 3.0
    s1 = out.iloc[1]
    assert s1.start_us == s1.end_us == 50 * MIN and s1.sum_value == 4.0


def test_sessionize_boundary_gap_not_split(ray_session):
    # gap EXACTLY gap_s does not split (strictly-greater rule, matches
    # the SQL oracle's `tsu - prev > gap`)
    ds = _events([(0, 1, 0, "x", 1.0), (1, 1, 30, "x", 1.0)])
    out = sessionize(ds, gap_s=1800).to_pandas()
    assert len(out) == 1 and out.iloc[0].n_events == 2


def test_tumbling_window_counts(small_events):
    out = tumbling_window(small_events, width_s=3600).to_pandas()
    out = out.sort_values(["event_type", "window_start_us"]).reset_index(drop=True)
    # all events are inside the first hour window (minutes 0-50)
    assert out.values.tolist() == [
        ["click", 0, 2, 5.0],
        ["purchase", 0, 2, 10.0],
    ]


def test_tumbling_window_splits_hours(ray_session):
    ds = _events([(0, 1, 1, "x", 1.0), (1, 1, 61, "x", 2.0), (2, 1, 121, "x", 4.0)])
    out = tumbling_window(ds, width_s=3600).to_pandas()
    assert sorted(out.window_start_us) == [0, 3600 * US, 7200 * US]
    assert out.n_events.tolist() == [1, 1, 1]


def test_asof_join_basic(small_events):
    out = asof_join(small_events, "purchase", "click").to_pandas()
    out = out.sort_values("event_id").reset_index(drop=True)
    # purchase@10min matches click@0; user 2 purchase has no click
    assert len(out) == 2
    assert out.iloc[0].event_id == 1 and out.iloc[0].matched_event_id == 0
    assert np.isnan(out.iloc[1].matched_event_id)


def test_asof_join_inclusive_and_tie(ray_session):
    # right events at the SAME ts as the left match (inclusive <=);
    # two right events with equal ts resolve to the max event_id
    ds = _events(
        [
            (10, 1, 5, "click", 0.0),
            (11, 1, 5, "click", 0.0),
            (12, 1, 5, "purchase", 0.0),
            (13, 1, 4, "purchase", 0.0),  # before any click -> unmatched
        ]
    )
    out = asof_join(ds, "purchase", "click").to_pandas().sort_values("event_id")
    assert out[out.event_id == 12].matched_event_id.iloc[0] == 11
    assert np.isnan(out[out.event_id == 13].matched_event_id.iloc[0])


@pytest.fixture(scope="module")
def lang_docs(ray_session):
    langs = (["en"] * 200) + (["fr"] * 100) + (["zh"] * 100)
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(langs)), type=pa.int64()),
                "lang": pa.array(langs),
            }
        )
    )


def test_stratified_sample_rates_and_determinism(lang_docs):
    rates = {"en": 0.25, "fr": 1.0, "zh": 0.0}
    a = stratified_sample(lang_docs, rates, seed=7).to_pandas()
    b = stratified_sample(lang_docs, rates, seed=7).to_pandas()
    assert a.equals(b)  # hash decisions, not RNG
    by = a.groupby("lang").size()
    assert by.get("fr", 0) == 100  # rate 1.0 keeps everything
    assert "zh" not in by.index  # rate 0.0 drops everything
    assert 20 <= by.get("en", 0) <= 80  # ~50 of 200 at 0.25


def test_stratified_sample_monotone_subset(lang_docs):
    # raising a stratum's rate only ADDS rows (threshold rule), so
    # samples are nested — resumable re-runs with bumped quotas extend
    # rather than reshuffle the sample
    lo = stratified_sample(lang_docs, {"en": 0.2}, seed=7).to_pandas()
    hi = stratified_sample(lang_docs, {"en": 0.6}, seed=7).to_pandas()
    assert set(lo.doc_id) <= set(hi.doc_id)


def test_stratified_sample_fast_hasher(lang_docs):
    out = stratified_sample(
        lang_docs, {"en": 0.5}, seed=7, hasher="fast"
    ).to_pandas()
    assert 50 <= len(out) <= 150 and set(out.lang) == {"en"}


def test_tumbling_shuffle_path_equivalent(small_events):
    a = (
        tumbling_window(small_events, width_s=3600, shuffle=False)
        .to_pandas()
        .sort_values(["event_type", "window_start_us"])
        .reset_index(drop=True)
    )
    b = (
        tumbling_window(small_events, width_s=3600, shuffle=True)
        .to_pandas()
        .sort_values(["event_type", "window_start_us"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_sessionize_many_keys_one_partition(ray_session):
    # several keys inside one sorted partition exercise the
    # whole-partition kernel's key-boundary logic
    rows = []
    eid = 0
    for u in range(7):
        for k in range(u + 1):  # u+1 events, 40-min gaps -> u+1 sessions
            rows.append((eid, u, k * 40, "x", 1.0))
            eid += 1
    out = sessionize(_events(rows), gap_s=1800).to_pandas()
    per_user = out.groupby("user_id").size()
    assert per_user.to_dict() == {u: u + 1 for u in range(7)}
    assert (out.n_events == 1).all()
