"""Event-time window operators over timestamped event streams:
sessionization (gap-based session windows), tumbling-window aggregates,
and a per-key as-of join — the "windowed aggregate / as-of join" class
of custom operators a training-data pipeline needs that Ray Data has no
native verb for.

All three are expressed as compositions the streaming executor can
pipeline (the build brief's option (a)):

- ``tumbling_window`` is a per-batch partial aggregate (map-side
  combine) followed by a coalesce-and-combine reduce — the exchange
  moves one row per (key, window) per block, not per event.
- ``sessionize`` and ``asof_join`` sort on a HASHED key with explicit
  equally-spaced uint64 boundaries (the index build's tid-partitioning
  design, ``index_build._tid_boundaries``) and run a whole-partition
  vectorized kernel that handles every key in the block in one numpy
  pass.  NOT ``groupby(key).map_groups``: that shape dispatches one
  Python UDF call and builds one table PER KEY — at 10^9 users it is
  10^9 interpreter round-trips, the same per-group-dispatch trap the
  index merge replaced with whole-partition batches
  (stages/segments.py module docstring).

Partitioning assumption (documented per the brief): ``sessionize`` and
``asof_join`` require all events of one key in one sorted partition —
hashing the key makes the equally-spaced boundaries uniform regardless
of the key distribution, and boundaries on the hash column alone mean
no key ever straddles two partitions; skew is bounded by the busiest
single key (per-user streams, naturally fine-grained at scale).  Hash
collisions are handled exactly: the kernels break keys on the REAL key
value, the hash is only the partitioner.

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
from ray.data.aggregate import Sum

US = 1_000_000  # microseconds per second


def _epoch_us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """timestamp[us] column -> int64 epoch microseconds (zero-copy)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.cast(pa.int64()).to_numpy()


def _key_hash(keys: np.ndarray) -> np.ndarray:
    """Deterministic uint64 hash of the partition key (pandas' fixed-key
    SipHash — uniform on [0, 2^64), so equally-spaced boundaries balance
    partitions for ANY key distribution)."""
    return pd.util.hash_array(np.ascontiguousarray(keys), categorize=False)


def _hash_sorted(ds: rd.Dataset, key_col: str, sort_cols: list[str]) -> rd.Dataset:
    """Append a uint64 hash of ``key_col`` and range-sort on it with
    explicit equally-spaced boundaries; every key lands wholly inside
    one sorted partition (boundaries cut only the hash column)."""
    import ray

    from .index_build import _tid_boundaries

    def add_hkey(batch: pa.Table) -> pa.Table:
        hk = _key_hash(batch.column(key_col).to_numpy())
        return batch.append_column("hkey", pa.array(hk, type=pa.uint64()))

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    width = max(2, 2 * cpus)
    return ds.map_batches(add_hkey, batch_format="pyarrow").sort(
        ["hkey", *sort_cols], boundaries=_tid_boundaries(width)
    )


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

    def all_keys(tbl: pa.Table) -> pa.Table:
        """Every key in the sorted partition in ONE numpy pass: session
        breaks are (key change) OR (gap > gap_us); per-key session
        indices are the global break cumsum rebased at key starts."""
        if tbl.num_rows == 0:
            return _empty
        key = tbl.column(key_col).to_numpy()
        tsu = _epoch_us(tbl.column(ts_col))
        eid = tbl.column(id_col).to_numpy()
        val = tbl.column(value_col).to_numpy()
        # re-establish (key, ts, id) order locally: exact regardless of
        # how the distributed sort tie-broke equal composite keys
        order = np.lexsort((eid, tsu, key))
        key, tsu, val = key[order], tsu[order], val[order]
        n = key.size
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = key[1:] != key[:-1]
        brk = new_key.copy()
        brk[1:] |= (tsu[1:] - tsu[:-1]) > gap_us
        sess = np.cumsum(brk) - 1  # global 0-based session index
        sstart = np.flatnonzero(brk)
        send = np.append(sstart[1:], n)
        # session_idx within key: global index rebased at the key start
        kstart = np.flatnonzero(new_key)
        base = np.repeat(sess[kstart], np.diff(np.append(kstart, n)))
        sidx = (sess - base)[sstart]
        return pa.table(
            {
                key_col: pa.array(key[sstart], type=pa.int64()),
                "session_idx": pa.array(sidx, type=pa.int64()),
                "start_us": pa.array(tsu[sstart], type=pa.int64()),
                "end_us": pa.array(tsu[send - 1], type=pa.int64()),
                "n_events": pa.array(send - sstart, type=pa.int64()),
                # 6-decimal round, matching tumbling_window and the SQL
                # oracle: np.add.reduceat and DuckDB's sum accumulate in
                # different orders (~1e-14 divergence on long sessions)
                # and sum_value participates in the value-hash compare.
                "sum_value": pa.array(
                    np.round(np.add.reduceat(val, sstart), 6),
                    type=pa.float64(),
                ),
            }
        )

    sorted_ds = _hash_sorted(
        ds.select_columns([key_col, ts_col, id_col, value_col]),
        key_col,
        [ts_col, id_col],
    )
    return sorted_ds.map_batches(all_keys, batch_format="pyarrow", batch_size=None)


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

    Shape: filter + side-tag both streams at the read -> one hash-
    partitioned sort by (key, ts, side, id) -> whole-partition
    vectorized kernel.  The match is a single ``np.maximum.accumulate``
    over ``key_index * n + position`` (rights only): at each left row
    the running max decodes to the latest right AT OR BEFORE it (rights
    sort before lefts on equal ts; equal-ts rights resolve to the max
    event_id because higher ids sort later), and a decoded key index
    that differs from the row's own key means "no right yet for this
    key".  One kernel invocation per partition, every key at once — no
    per-key UDF dispatch.  Two separate datasets with the same schema
    can be as-of joined by tagging + ``union`` upstream.
    """
    _empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            key_col: pa.array([], type=pa.int64()),
            "ts_us": pa.array([], type=pa.int64()),
            "matched_event_id": pa.array([], type=pa.int64()),
            "matched_ts_us": pa.array([], type=pa.int64()),
        }
    )

    def keep_types(batch: pa.Table) -> pa.Table:
        t = batch.column(type_col)
        mask = pc.or_(pc.equal(t, left_type), pc.equal(t, right_type))
        kept = batch.filter(mask)
        # side 0 = right, 1 = left: rights sort BEFORE lefts at equal ts,
        # which is exactly the inclusive (right.ts <= left.ts) rule
        side = pc.cast(pc.equal(kept.column(type_col), left_type), pa.int8())
        return kept.drop_columns([type_col]).append_column("side", side)

    def all_keys(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return _empty
        key = tbl.column(key_col).to_numpy()
        tsu = _epoch_us(tbl.column(ts_col))
        eid = tbl.column(id_col).to_numpy()
        side = tbl.column("side").to_numpy()
        order = np.lexsort((eid, side, tsu, key))
        key, tsu, eid, side = key[order], tsu[order], eid[order], side[order]
        n = key.size
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = key[1:] != key[:-1]
        gidx = np.cumsum(new_key, dtype=np.int64) - 1  # dense key index
        pos = np.arange(n, dtype=np.int64)
        # rights carry gidx*n + pos (monotone across the partition);
        # lefts carry -1, so the running max always points at the
        # latest right seen so far — valid only if its key matches
        tag = np.where(side == 0, gidx * n + pos, np.int64(-1))
        cm = np.maximum.accumulate(tag)
        left = side == 1
        ok = left & (cm >= 0) & ((cm // n) == gidx)
        m_pos = np.where(ok, cm - gidx * n, 0)
        valid = pa.array(ok[left])
        m_id = eid[m_pos][left]
        m_ts = tsu[m_pos][left]
        return pa.table(
            {
                id_col: pa.array(eid[left], type=pa.int64()),
                key_col: pa.array(key[left], type=pa.int64()),
                "ts_us": pa.array(tsu[left], type=pa.int64()),
                "matched_event_id": pc.if_else(
                    valid, pa.array(m_id, type=pa.int64()), pa.scalar(None, pa.int64())
                ),
                "matched_ts_us": pc.if_else(
                    valid, pa.array(m_ts, type=pa.int64()), pa.scalar(None, pa.int64())
                ),
            }
        )

    filtered = ds.select_columns([key_col, ts_col, id_col, type_col]).map_batches(
        keep_types, batch_format="pyarrow"
    )
    sorted_ds = _hash_sorted(filtered, key_col, [ts_col, "side", id_col])
    return sorted_ds.map_batches(all_keys, batch_format="pyarrow", batch_size=None)
