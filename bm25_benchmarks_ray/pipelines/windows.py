"""Event-time window operators over timestamped event streams:
sessionization (gap-based session windows), tumbling-window aggregates,
and a per-key as-of join — the "windowed aggregate / as-of join" class
of custom operators a training-data pipeline needs that Ray Data has no
native verb for.

All three are expressed as compositions the streaming executor can
pipeline (the build brief's option (a)):

- ``tumbling_window`` is a per-batch partial aggregate (map-side
  combine) followed by a small ``groupby().aggregate()`` — the shuffle
  moves one row per (key, window) per block, not per event.
- ``sessionize`` and ``asof_join`` hash-shuffle by the session/join key
  (``groupby(key).map_groups``) and are vectorized inside each group
  (numpy diff/searchsorted — no Python loop over events).

Partitioning assumption (documented per the brief): ``sessionize`` and
``asof_join`` require all events of one key in one group — the groupby
provides it; skew is bounded by the busiest single key (sessions and
as-of matches are per-user streams, naturally fine-grained at scale).

Timestamps are carried as epoch MICROSECONDS (int64, matching the
parquet ``timestamp[us]`` physical values) so outputs are exactly
replicable in ANSI SQL (``epoch_us(ts)``) with no tz/unit drift.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

US = 1_000_000  # microseconds per second


def _epoch_us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """timestamp[us] column -> int64 epoch microseconds (zero-copy)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.cast(pa.int64()).to_numpy()


# -- sessionization (gap-based session windows) ------------------------

def sessionize(
    ds: rd.Dataset,
    gap_s: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> rd.Dataset:
    """Session-window aggregate: split each key's event stream wherever
    consecutive events are more than ``gap_s`` apart, then aggregate per
    session.  Returns one row per session:

        (user_id, session_idx, start_us, end_us, n_events, sum_value)

    ``session_idx`` is 0-based per key in time order — (key,
    session_idx) is the globally unique session identity.  Events are
    ordered by (ts, event_id) so equal timestamps are deterministic.
    """
    gap_us = gap_s * US

    _empty = pa.table(
        {
            key_col: pa.array([], type=pa.int64()),
            "session_idx": pa.array([], type=pa.int64()),
            "start_us": pa.array([], type=pa.int64()),
            "end_us": pa.array([], type=pa.int64()),
            "n_events": pa.array([], type=pa.int64()),
            "sum_value": pa.array([], type=pa.float64()),
        }
    )

    def per_key(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return _empty
        key = tbl.column(key_col).to_numpy()
        tsu = _epoch_us(tbl.column(ts_col))
        eid = tbl.column(id_col).to_numpy()
        val = tbl.column(value_col).to_numpy()
        order = np.lexsort((eid, tsu))
        tsu, val = tsu[order], val[order]
        # new session where the gap from the previous event exceeds gap_us
        brk = np.empty(tsu.size, dtype=np.int64)
        brk[0] = 0
        brk[1:] = (np.diff(tsu) > gap_us).astype(np.int64)
        sess = np.cumsum(brk)
        n_sessions = int(sess[-1]) + 1 if tsu.size else 0
        start = np.zeros(n_sessions, dtype=np.int64)
        end = np.zeros(n_sessions, dtype=np.int64)
        cnt = np.bincount(sess, minlength=n_sessions)
        sums = np.bincount(sess, weights=val, minlength=n_sessions)
        first = np.flatnonzero(np.concatenate(([1], brk[1:])))
        start[:] = tsu[first]
        last = np.concatenate((first[1:] - 1, [tsu.size - 1]))
        end[:] = tsu[last]
        return pa.table(
            {
                key_col: pa.array(np.full(n_sessions, key[0]), type=pa.int64()),
                "session_idx": pa.array(np.arange(n_sessions), type=pa.int64()),
                "start_us": pa.array(start, type=pa.int64()),
                "end_us": pa.array(end, type=pa.int64()),
                "n_events": pa.array(cnt.astype(np.int64), type=pa.int64()),
                "sum_value": pa.array(sums, type=pa.float64()),
            }
        )

    return ds.select_columns([key_col, ts_col, id_col, value_col]).groupby(
        key_col
    ).map_groups(per_key, batch_format="pyarrow")


# -- tumbling-window aggregate -----------------------------------------

def tumbling_window(
    ds: rd.Dataset,
    width_s: int = 3600,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    shuffle: bool = False,
) -> rd.Dataset:
    """Count + sum(value) per (key, tumbling window of ``width_s``).

    The per-batch combiner collapses each block to one row per
    (key, window) BEFORE any exchange, so what moves is
    ~|keys|x|windows| rows per block instead of per event — the partial
    -aggregate pattern every 100-TB-scale windowed count needs.  The
    final reduce defaults to coalesce-and-combine (one tiny repartition
    + one Arrow hash aggregate): the reduced cardinality is bounded by
    |keys|x|windows|, which for typical window keys is thousands of
    rows no matter the event count (a measured Ray sort-aggregate on
    the same 288k combined rows cost ~8 s of pure shuffle fixed cost).
    Pass ``shuffle=True`` for high-cardinality keys (e.g. per-user
    windows) where the reduced table itself needs to stay distributed.
    Returns (event_type, window_start_us, n_events, sum_value)."""
    width_us = width_s * US

    def combine(batch: pa.Table) -> pa.Table:
        win = (_epoch_us(batch.column(ts_col)) // width_us) * width_us
        t = pa.table(
            {
                key_col: batch.column(key_col),
                "window_start_us": pa.array(win, type=pa.int64()),
                "sum_value": batch.column(value_col),
            }
        )
        # Arrow's C++ hash aggregate: no pandas round-trip, no
        # string-column object materialization
        g = pa.TableGroupBy(t, [key_col, "window_start_us"]).aggregate(
            [("sum_value", "sum"), ([], "count_all")]
        )
        return g.rename_columns(
            [key_col, "window_start_us", "sum_value", "n_events"]
        ).select([key_col, "window_start_us", "n_events", "sum_value"])

    def round_sum(batch: pa.Table) -> pa.Table:
        # 6-decimal round on both sides (here and the SQL oracle):
        # partial-sum association differs between engines at ~1e-12 and
        # sum_value participates in the comparator's row sort.
        return batch.set_column(
            batch.schema.get_field_index("sum_value"),
            "sum_value",
            pc.round(batch.column("sum_value"), ndigits=6),
        )

    def final_combine(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch, [key_col, "window_start_us"]).aggregate(
            [("n_events", "sum"), ("sum_value", "sum")]
        )
        return g.rename_columns(
            [key_col, "window_start_us", "n_events", "sum_value"]
        )

    combined = ds.select_columns([key_col, ts_col, value_col]).map_batches(
        # whole-block batches: the combiner's output is ~|keys|x|windows|
        # rows per BATCH, so bigger batches mean a smaller exchange
        combine, batch_format="pyarrow", batch_size=None
    )
    if shuffle:
        agg = combined.groupby([key_col, "window_start_us"]).aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value", alias_name="sum_value"),
        )
    else:
        agg = combined.repartition(1).map_batches(
            final_combine, batch_format="pyarrow", batch_size=None
        )
    return agg.map_batches(round_sum, batch_format="pyarrow")


# -- as-of join ---------------------------------------------------------

def asof_join(
    ds: rd.Dataset,
    left_type: str,
    right_type: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> rd.Dataset:
    """Per-key as-of join inside one event stream: for every LEFT-type
    event, the most recent RIGHT-type event of the same key with
    ``right.ts <= left.ts`` (ties on equal right timestamps resolved to
    the highest event_id, making the match deterministic — mirrors
    DuckDB's ASOF JOIN on a ts-deduplicated right side).

    Returns (event_id, user_id, ts_us, matched_event_id, matched_ts_us)
    with nulls where no right event precedes the left one.

    Shape: filter both sides at the read -> one hash shuffle by key ->
    vectorized searchsorted per group.  Two separate datasets with the
    same schema can be as-of joined by tagging + ``union`` upstream.
    """

    def per_key(tbl: pa.Table) -> pa.Table:
        types = tbl.column(type_col).to_numpy(zero_copy_only=False)
        tsu = _epoch_us(tbl.column(ts_col))
        eid = tbl.column(id_col).to_numpy()
        key = tbl.column(key_col).to_numpy()
        lm = types == left_type
        rm = types == right_type
        l_ts, l_id = tsu[lm], eid[lm]
        out_len = int(l_ts.size)
        if out_len == 0:
            return pa.table(
                {
                    id_col: pa.array([], type=pa.int64()),
                    key_col: pa.array([], type=pa.int64()),
                    "ts_us": pa.array([], type=pa.int64()),
                    "matched_event_id": pa.array([], type=pa.int64()),
                    "matched_ts_us": pa.array([], type=pa.int64()),
                }
            )
        r_ts, r_id = tsu[rm], eid[rm]
        if r_ts.size:
            # sort rights by (ts, id); dedupe equal ts keeping max id
            order = np.lexsort((r_id, r_ts))
            r_ts, r_id = r_ts[order], r_id[order]
            last = np.concatenate((r_ts[1:] != r_ts[:-1], [True]))
            r_ts, r_id = r_ts[last], r_id[last]
            idx = np.searchsorted(r_ts, l_ts, side="right") - 1
            ok = idx >= 0
            m_id = np.where(ok, r_id[np.clip(idx, 0, None)], 0)
            m_ts = np.where(ok, r_ts[np.clip(idx, 0, None)], 0)
        else:
            ok = np.zeros(out_len, dtype=bool)
            m_id = m_ts = np.zeros(out_len, dtype=np.int64)
        valid = pa.array(ok)
        return pa.table(
            {
                id_col: pa.array(l_id, type=pa.int64()),
                key_col: pa.array(np.full(out_len, key[0]), type=pa.int64()),
                "ts_us": pa.array(l_ts, type=pa.int64()),
                "matched_event_id": pc.if_else(
                    valid, pa.array(m_id, type=pa.int64()), pa.scalar(None, pa.int64())
                ),
                "matched_ts_us": pc.if_else(
                    valid, pa.array(m_ts, type=pa.int64()), pa.scalar(None, pa.int64())
                ),
            }
        )

    def keep_types(batch: pa.Table) -> pa.Table:
        t = batch.column(type_col)
        mask = pc.or_(pc.equal(t, left_type), pc.equal(t, right_type))
        return batch.filter(mask)

    filtered = ds.select_columns([key_col, ts_col, id_col, type_col]).map_batches(
        keep_types, batch_format="pyarrow"
    )
    return filtered.groupby(key_col).map_groups(per_key, batch_format="pyarrow")
