"""Posting-list segment encoding: sorted, delta+varint-compressed lists
with block-max metadata, built by groupby + map_groups.

Two-level (hierarchical-merge) build inside one Ray Data pipeline:

1. ``groupby(["term", "salt"]) → encode_run``: each reduce group holds at
   most ``salt_range`` postings for one term (salt = doc_id //
   salt_range), so a hot term (stopword-like survivor at 10^12-turn
   scale) can never blow up a single reduce task — the explicit skew
   handling the north rule asks for.
2. ``groupby("term") → merge_runs``: concatenates a term's compressed
   salt runs (10-20× smaller than raw postings) into one doc-sorted
   list per term per group and computes final block-max bounds.

The segment layout follows the PISA family the reference drives
(/root/reference/benchmark/on_pisa.py:33-51: compressed posting lists +
block-max metadata + impact-based pruning), but stores raw ``(tf, dl)``
per posting instead of one method's precomputed impacts: every BM25
variant's impact is ``idf(df) * tf_shape(tf, dl)`` with ``tf_shape``
increasing in tf and decreasing in dl, so the per-block ``(max_tf,
min_dl)`` pair upper-bounds the block impact for *any*
:class:`~bm25_benchmarks_ray.functions.bm25.BM25Params` — one index
serves all five variants (bm25s rebuilds per method,
/root/reference/benchmark/on_bm25s.py:124-128).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.codec import (
    delta_decode_doc_ids,
    delta_encode_doc_ids,
    u32_encode,
    varint_decode,
    varint_encode,
)

SEGMENT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),        # postings in this row
        ("sum_tf", pa.int64()),    # Σ tf (stats aggregation, no decode pass)
        ("doc_ids", pa.binary()),  # delta+varint, strictly increasing
        ("tfs", pa.binary()),      # varint
        ("dls", pa.binary()),      # varint
        ("bmax_tf", pa.binary()),  # u32 per block of block_size postings
        ("bmin_dl", pa.binary()),  # u32 per block
    ]
)

RUN_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("salt", pa.int32()),
        ("df", pa.int64()),
        ("sum_tf", pa.int64()),
        ("doc_ids", pa.binary()),
        ("tfs", pa.binary()),
        ("dls", pa.binary()),
    ]
)


def _block_bounds(
    tf: np.ndarray, dl: np.ndarray, block_size: int
) -> tuple[bytes, bytes]:
    """Per-block (max tf, min dl) over consecutive runs of block_size
    postings — a valid impact upper bound for every variant (see module
    docstring)."""
    n = tf.size
    n_blocks = (n + block_size - 1) // block_size
    pad = n_blocks * block_size - n
    tf_p = np.pad(tf.astype(np.uint32), (0, pad), constant_values=0)
    dl_p = np.pad(dl.astype(np.uint32), (0, pad), constant_values=np.uint32(2**32 - 1))
    bmax = tf_p.reshape(n_blocks, block_size).max(axis=1)
    bmin = dl_p.reshape(n_blocks, block_size).min(axis=1)
    return u32_encode(bmax), u32_encode(bmin)


def encode_postings(
    term: str,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    block_size: int,
) -> dict:
    """One final segment row from (already doc-sorted) posting arrays."""
    bmax, bmin = _block_bounds(tfs, dls, block_size)
    return {
        "term": term,
        "df": int(doc_ids.size),
        "sum_tf": int(tfs.sum()),
        "doc_ids": delta_encode_doc_ids(doc_ids),
        "tfs": varint_encode(tfs.astype(np.uint64)),
        "dls": varint_encode(dls.astype(np.uint64)),
        "bmax_tf": bmax,
        "bmin_dl": bmin,
    }


def decode_postings(row: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_ids:int64, tfs:int64, dls:int64) from a segment/run row."""
    doc = delta_decode_doc_ids(row["doc_ids"])
    tf = varint_decode(row["tfs"]).astype(np.int64)
    dl = varint_decode(row["dls"]).astype(np.int64)
    return doc, tf, dl


def _segment_row_table(row: dict) -> pa.Table:
    return pa.table(
        {k: pa.array([v], type=SEGMENT_SCHEMA.field(k).type) for k, v in row.items()},
        schema=SEGMENT_SCHEMA,
    )


def make_encode_run(block_size: int = 128):
    """map_groups fn over groupby(["term", "salt"]): one compressed run
    per (term, salt)."""

    def encode_run(tbl: pa.Table) -> pa.Table:
        doc = tbl.column("doc_id").to_numpy()
        order = np.argsort(doc, kind="stable")
        doc = doc[order]
        tf = tbl.column("tf").to_numpy().astype(np.int64)[order]
        dl = tbl.column("dl").to_numpy().astype(np.int64)[order]
        return pa.table(
            {
                "term": [tbl.column("term")[0].as_py()],
                "salt": pa.array([tbl.column("salt")[0].as_py()], type=pa.int32()),
                "df": pa.array([doc.size], type=pa.int64()),
                "sum_tf": pa.array([int(tf.sum())], type=pa.int64()),
                "doc_ids": pa.array([delta_encode_doc_ids(doc)], type=pa.binary()),
                "tfs": pa.array([varint_encode(tf.astype(np.uint64))], type=pa.binary()),
                "dls": pa.array([varint_encode(dl.astype(np.uint64))], type=pa.binary()),
            },
            schema=RUN_SCHEMA,
        )

    return encode_run


def make_merge_runs(block_size: int = 128):
    """map_groups fn over groupby("term") of run rows: hierarchical merge
    of a term's salt runs into one final doc-sorted segment row."""

    def merge_runs(tbl: pa.Table) -> pa.Table:
        rows = tbl.to_pylist()
        # salts carry disjoint, increasing doc ranges -> concat in salt order
        rows.sort(key=lambda r: r["salt"])
        if len(rows) == 1:
            doc, tf, dl = decode_postings(rows[0])
        else:
            parts = [decode_postings(r) for r in rows]
            doc = np.concatenate([p[0] for p in parts])
            tf = np.concatenate([p[1] for p in parts])
            dl = np.concatenate([p[2] for p in parts])
        return _segment_row_table(
            encode_postings(rows[0]["term"], doc, tf, dl, block_size)
        )

    return merge_runs


def make_encode_term_group(block_size: int = 128):
    """Single-level map_groups fn over groupby("term"): used when the
    group's doc count is within one salt range (no skew risk), skipping
    the merge level entirely."""

    def encode_term_group(tbl: pa.Table) -> pa.Table:
        doc = tbl.column("doc_id").to_numpy()
        order = np.argsort(doc, kind="stable")
        return _segment_row_table(
            encode_postings(
                tbl.column("term")[0].as_py(),
                doc[order],
                tbl.column("tf").to_numpy().astype(np.int64)[order],
                tbl.column("dl").to_numpy().astype(np.int64)[order],
                block_size,
            )
        )

    return encode_term_group
