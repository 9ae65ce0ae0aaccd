"""Sequence packing for training-data assembly: concat-and-chunk token
spans over a document stream.

A pre-training dataloader concatenates documents in a fixed order and
slices the token stream into ``capacity``-token bins (documents may
straddle bin boundaries).  ``pack_offsets`` computes, per document, its
global token span and the bins it lands in — the metadata a packed
dataloader needs to fetch exactly the right documents per bin — as a
DISTRIBUTED PREFIX SUM, with no sort and no driver-side row loop:

1. one ``map_batches`` pass counts tokens per doc (vectorized regex),
2. docs are bucketed by ``doc_id // bucket_size``; a tiny
   ``groupby(bucket).sum`` yields per-bucket token totals (one row per
   bucket — at 10^12 docs and bucket_size 2^20 that is ~10^6 rows),
3. the driver cumsums the bucket totals (megabytes, not data-scale) and
   broadcasts the base-offset map via ``ray.put``,
4. ``groupby(bucket).map_groups`` computes each doc's local prefix
   inside its bucket (numpy cumsum over doc_id order) + bucket base.

Every data-scale step streams; the only driver-side state is one int64
per bucket.  The concat order is doc_id ascending — deterministic and
exactly replicable with an ANSI window function, so the operator is
DuckDB-oracle-checkable end to end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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

    def count(batch: pa.Table) -> pa.Table:
        from .text_analysis import _regex_count

        ids = batch.column(id_col).to_numpy()
        # Arrow count_substring_regex for ASCII rows, exact Python re
        # for non-ASCII rows — same values, no per-doc findall loop
        n = _regex_count(batch.column(text_col), r"\S+", WS_RE)
        return pa.table(
            {
                id_col: pa.array(ids, type=pa.int64()),
                "n_tok": pa.array(n, type=pa.int64()),
                "bucket": pa.array(ids // bucket_size, type=pa.int64()),
            }
        )

    counts = ds.select_columns([id_col, text_col]).map_batches(
        count, batch_format="pyarrow"
    ).materialize()  # two consumers below; counts is 3 ints per doc
    # (24 bytes/doc ≈ 0.2% of a text corpus — "small result" scale; the
    # alternative is recomputing the text pass for the second consumer)

    def bucket_sums(batch: pa.Table) -> pa.Table:
        # per-batch combiner: one row per (block, bucket) leaves the task
        g = pa.TableGroupBy(batch.select(["bucket", "n_tok"]), "bucket").aggregate(
            [("n_tok", "sum")]
        )
        return g.rename_columns(["bucket", "tok"])

    # partial per-bucket sums -> driver cumsum.  No Ray sort-aggregate:
    # the partials are ~|blocks|x|buckets-per-block| rows (contiguous
    # ids touch few buckets per block), and the final reduce is one
    # pandas groupby over at most ~|buckets| rows (one int64 per 2^20
    # ids at the default bucket_size)
    partials = counts.map_batches(
        bucket_sums, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    totals = (
        partials.groupby("bucket", sort=True)["tok"].sum().reset_index()
    )
    base = np.concatenate(([0], np.cumsum(totals["tok"].to_numpy())))[:-1]
    base_ref = ray.put(dict(zip(totals["bucket"].astype(np.int64), base)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        bases = ray.get(base_ref)
        g = g.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        n = g["n_tok"].to_numpy(dtype=np.int64)
        end = np.cumsum(n) + int(bases[g["bucket"].iloc[0]])
        start = end - n
        first_bin = start // capacity
        # an empty doc sits AT start; a non-empty doc's last token is end-1
        last_bin = np.where(n > 0, (end - 1) // capacity, first_bin)
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(dtype=np.int64),
                "n_tok": n,
                "start_tok": start,
                "end_tok": end,
                "first_bin": first_bin,
                "last_bin": last_bin,
            }
        )

    return counts.groupby("bucket").map_groups(per_bucket, batch_format="pandas")
