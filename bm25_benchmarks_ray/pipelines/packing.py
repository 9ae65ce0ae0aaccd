"""Sequence packing for training-data assembly: concat-and-chunk token
spans over a document stream.

A pre-training dataloader concatenates documents in a fixed order and
slices the token stream into ``capacity``-token bins (documents may
straddle bin boundaries).  ``pack_offsets`` computes, per document, its
global token span and the bins it lands in — the metadata a packed
dataloader needs to fetch exactly the right documents per bin — as a
DISTRIBUTED PREFIX SUM, with no sort-aggregate, no driver-side row
loop, and no whole-corpus ``materialize()``:

1. phase 1 (totals): one streaming pass counts tokens per doc
   (vectorized regex) and collapses to per-bucket partial sums INSIDE
   the same UDF — only (bucket, tok) rows leave each task (one row per
   bucket touched per block; at 10^12 docs and bucket_size 2^20 the
   driver reduce sees ~10^6 rows).  The driver cumsums the bucket
   totals and broadcasts them as two sorted numpy arrays via
   ``ray.put`` (searchsorted lookup — no GB-scale Python dict).
2. phase 2 (offsets): the per-doc counts are recomputed (a second
   streaming text pass — nothing data-scale is retained between the
   phases; the alternative is pinning 24 bytes/doc of counts in the
   object store, ~24 TB at 10^12 docs), hash-sorted on the bucket with
   explicit uint64 boundaries (``windows._hash_sorted`` — every bucket
   lands wholly inside one partition), and ONE whole-partition numpy
   kernel emits every doc's span: local cumsum rebased at bucket
   starts + the broadcast bucket base.  NOT
   ``groupby(bucket).map_groups``: that dispatches one Python UDF and
   builds one pandas frame PER BUCKET (the per-group-dispatch trap
   windows.py documents).

The concat order is doc_id ascending — deterministic and exactly
replicable with an ANSI window function, so the operator is
DuckDB-oracle-checkable end to end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .text_analysis import WS_RE


def pack_offsets(
    ds: rd.Dataset,
    capacity: int = 2048,
    bucket_size: int = 1 << 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """(doc_id, n_tok, start_tok, end_tok, first_bin, last_bin) for the
    doc_id-ordered concatenation, whitespace token counts, bins of
    ``capacity`` tokens.  Zero-token docs get an empty span with
    last_bin == first_bin."""
    from .text_analysis import _regex_count
    from .windows import _hash_sorted

    docs = ds.select_columns([id_col, text_col])

    # -- phase 1: per-bucket token totals (count + collapse fused) ----
    def bucket_sums(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        n = _regex_count(batch.column(text_col), r"\S+", WS_RE)
        ub, inv = np.unique(ids // bucket_size, return_inverse=True)
        tok = np.zeros(ub.size, dtype=np.int64)
        np.add.at(tok, inv, n)
        return pa.table(
            {
                "bucket": pa.array(ub, type=pa.int64()),
                "tok": pa.array(tok, type=pa.int64()),
            }
        )

    partials = pa.concat_tables(
        docs.map_batches(bucket_sums, batch_format="pyarrow")
        # coalescing combine: fold ~8k partial rows per task so the
        # driver reduce sees O(buckets) rows, never O(buckets x blocks)
        .map_batches(
            lambda t: pa.TableGroupBy(t, "bucket")
            .aggregate([("tok", "sum")])
            .rename_columns(["bucket", "tok"]),
            batch_format="pyarrow",
            batch_size=8192,
        ).iter_batches(batch_format="pyarrow")
    )
    pb = partials.column("bucket").to_numpy()
    pt = partials.column("tok").to_numpy()
    order = np.argsort(pb, kind="stable")
    pb, pt = pb[order], pt[order]
    # final reduce of the (already tiny) partials: sum per bucket run
    if pb.size:
        newb = np.empty(pb.size, dtype=bool)
        newb[0] = True
        newb[1:] = pb[1:] != pb[:-1]
        starts = np.flatnonzero(newb)
        bkeys = pb[starts]
        btot = np.add.reduceat(pt, starts)
    else:
        bkeys = np.empty(0, dtype=np.int64)
        btot = np.empty(0, dtype=np.int64)
    bbase = np.concatenate(([0], np.cumsum(btot)))[:-1].astype(np.int64)
    # broadcast as sorted arrays + searchsorted, not a Python dict
    base_ref = ray.put((bkeys.astype(np.int64), bbase))

    # -- phase 2: per-doc spans via whole-partition prefix kernel -----
    def count(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        n = _regex_count(batch.column(text_col), r"\S+", WS_RE)
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "n_tok": pa.array(n, type=pa.int64()),
                "bucket": pa.array(ids // bucket_size, type=pa.int64()),
            }
        )

    _empty = pa.table(
        {
            id_col: pa.array([], type=pa.int64()),
            "n_tok": pa.array([], type=pa.int64()),
            "start_tok": pa.array([], type=pa.int64()),
            "end_tok": pa.array([], type=pa.int64()),
            "first_bin": pa.array([], type=pa.int64()),
            "last_bin": pa.array([], type=pa.int64()),
        }
    )

    def all_buckets(tbl: pa.Table) -> pa.Table:
        """Every bucket in the sorted partition in ONE numpy pass."""
        if tbl.num_rows == 0:
            return _empty
        keys, bases = ray.get(base_ref)
        ids = tbl.column(id_col).to_numpy()
        n = tbl.column("n_tok").to_numpy()
        b = tbl.column("bucket").to_numpy()
        order = np.lexsort((ids, b))
        ids, n, b = ids[order], n[order], b[order]
        m = b.size
        newb = np.empty(m, dtype=bool)
        newb[0] = True
        newb[1:] = b[1:] != b[:-1]
        bstart = np.flatnonzero(newb)
        runlen = np.diff(np.append(bstart, m))
        cs = np.cumsum(n)
        # local end offset within each bucket: global cumsum rebased at
        # the bucket's first row
        seg0 = np.repeat(cs[bstart] - n[bstart], runlen)
        base = bases[np.searchsorted(keys, b[bstart])]
        end = cs - seg0 + np.repeat(base, runlen)
        start = end - n
        first_bin = start // capacity
        # an empty doc sits AT start; a non-empty doc's last token is end-1
        last_bin = np.where(n > 0, (end - 1) // capacity, first_bin)
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "n_tok": pa.array(n, type=pa.int64()),
                "start_tok": pa.array(start, type=pa.int64()),
                "end_tok": pa.array(end, type=pa.int64()),
                "first_bin": pa.array(first_bin, type=pa.int64()),
                "last_bin": pa.array(last_bin, type=pa.int64()),
            }
        )

    counts = docs.map_batches(count, batch_format="pyarrow")
    sorted_ds = _hash_sorted(counts, "bucket", [id_col])
    return sorted_ds.map_batches(
        all_buckets, batch_format="pyarrow", batch_size=None
    )
