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
    varint_encode_with_offsets,
)

SEGMENT_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("df", pa.int64()),        # postings in this row
        ("sum_tf", pa.int64()),    # Σ tf (stats aggregation, no decode pass)
        ("doc_ids", pa.binary()),  # block-reset delta+varint (see below)
        ("tfs", pa.binary()),      # varint
        ("dls", pa.binary()),      # varint
        ("bmax_tf", pa.binary()),  # u32 per block of block_size postings
        ("bmin_dl", pa.binary()),  # u32 per block
        # random-access skip table: per block, the first doc_id (int64)
        # and the byte offset of the block's first value in each varint
        # stream (u32).  Doc gaps reset to absolute at block starts, so
        # any block range decodes independently — this is what makes
        # doc-sliced query tasks and block-max skipping cheap.
        ("blk_doc0", pa.binary()),
        ("blk_off_doc", pa.binary()),
        ("blk_off_tf", pa.binary()),
        ("blk_off_dl", pa.binary()),
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
    """One final segment row from (already doc-sorted) posting arrays.

    doc_ids use *block-reset* delta coding: within a block, values are
    gaps; the first value of every block is absolute.  A whole-row
    decode is a blockwise cumsum; a range decode starts at any block."""
    n = doc_ids.size
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    starts = np.arange(0, n, block_size)
    gaps = np.empty(n, dtype=np.uint64)
    if n:
        np.subtract(
            doc_ids[1:], doc_ids[:-1], out=gaps[1:].view(np.int64), casting="unsafe"
        )
        gaps[starts] = doc_ids[starts].astype(np.uint64)
    doc_buf, doc_off = varint_encode_with_offsets(gaps, block_size)
    tf_buf, tf_off = varint_encode_with_offsets(tfs.astype(np.uint64), block_size)
    dl_buf, dl_off = varint_encode_with_offsets(dls.astype(np.uint64), block_size)
    bmax, bmin = _block_bounds(tfs, dls, block_size)
    return {
        "term": term,
        "df": int(n),
        "sum_tf": int(tfs.sum()),
        "doc_ids": doc_buf,
        "tfs": tf_buf,
        "dls": dl_buf,
        "bmax_tf": bmax,
        "bmin_dl": bmin,
        "blk_doc0": doc_ids[starts].tobytes(),
        "blk_off_doc": u32_encode(doc_off),
        "blk_off_tf": u32_encode(tf_off),
        "blk_off_dl": u32_encode(dl_off),
    }


def _blockwise_docs(gaps: np.ndarray, block_size: int) -> np.ndarray:
    """Reassemble absolute doc_ids from block-reset gaps (vectorized:
    pad to full blocks, 2-D cumsum, trim)."""
    n = gaps.size
    if n == 0:
        return np.empty(0, dtype=np.int64)
    nb = -(-n // block_size)
    m = np.zeros(nb * block_size, dtype=np.int64)
    m[:n] = gaps.astype(np.int64)
    return m.reshape(nb, block_size).cumsum(axis=1).reshape(-1)[:n]


_EMPTY3 = (
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=np.int64),
)


def decode_segment(
    row: dict, block_size: int, lo: int | None = None, hi: int | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_ids, tfs, dls) for a segment row, optionally restricted to
    doc range [lo, hi): only the covering blocks are decoded (skip-table
    byte offsets), so a doc-sliced query task pays for its share of the
    posting list, not the whole list."""
    doc0 = np.frombuffer(row["blk_doc0"], dtype=np.int64)
    nb = doc0.size
    if nb == 0:
        return _EMPTY3
    if lo is None:
        b0, b1 = 0, nb
    else:
        b0 = max(int(np.searchsorted(doc0, lo, side="right")) - 1, 0)
        b1 = int(np.searchsorted(doc0, hi, side="left"))
        if b0 >= b1:
            return _EMPTY3

    def _slice(buf: bytes, off_key: str) -> bytes:
        off = np.frombuffer(row[off_key], dtype=np.uint32)
        end = int(off[b1]) if b1 < nb else len(buf)
        return buf[int(off[b0]) : end]

    gaps = varint_decode(_slice(row["doc_ids"], "blk_off_doc"))
    doc = _blockwise_docs(gaps, block_size)
    tf = varint_decode(_slice(row["tfs"], "blk_off_tf")).astype(np.int64)
    dl = varint_decode(_slice(row["dls"], "blk_off_dl")).astype(np.int64)
    if lo is not None:
        a, b = np.searchsorted(doc, [lo, hi])
        doc, tf, dl = doc[a:b], tf[a:b], dl[a:b]
    return doc, tf, dl


def decode_selected_blocks(
    row: dict, block_size: int, blocks: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_ids, tfs, dls) for a sorted-unique array of block indices —
    ONE varint decode per stream no matter how scattered the blocks.

    Works because coding is block-reset: every block's first doc value
    is absolute, so concatenated block payloads decode independently
    (all selected blocks are full except, possibly, the row's final
    block, which can only appear last in the selection)."""
    doc0 = np.frombuffer(row["blk_doc0"], dtype=np.int64)
    nb = doc0.size
    if nb == 0 or blocks.size == 0:
        return _EMPTY3

    def gather(buf: bytes, off_key: str) -> np.ndarray:
        off = np.frombuffer(row[off_key], dtype=np.uint32)
        b = np.frombuffer(buf, dtype=np.uint8)
        starts = off[blocks].astype(np.int64)
        ends = np.where(
            blocks + 1 < nb, off[np.minimum(blocks + 1, nb - 1)], len(b)
        ).astype(np.int64)
        return np.concatenate([b[s:e] for s, e in zip(starts, ends)])

    gaps = varint_decode(gather(row["doc_ids"], "blk_off_doc"))
    doc = _blockwise_docs(gaps, block_size)
    tf = varint_decode(gather(row["tfs"], "blk_off_tf")).astype(np.int64)
    dl = varint_decode(gather(row["dls"], "blk_off_dl")).astype(np.int64)
    return doc, tf, dl


def decode_postings(row: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(doc_ids, tfs, dls) from an intermediate RUN row (plain delta
    coding — runs are merge-internal and never range-decoded)."""
    doc = delta_decode_doc_ids(row["doc_ids"])
    tf = varint_decode(row["tfs"]).astype(np.int64)
    dl = varint_decode(row["dls"]).astype(np.int64)
    return doc, tf, dl


def _segment_row_table(row: dict) -> pa.Table:
    return pa.table(
        {k: pa.array([v], type=SEGMENT_SCHEMA.field(k).type) for k, v in row.items()},
        schema=SEGMENT_SCHEMA,
    )


def _merge_run_rows(rows: list[dict]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode + concat + doc-sort a term's runs (runs hold disjoint doc
    sets by construction — one batch owns a doc — but arrive in any
    order, so the merge argsorts rather than trusting salt order)."""
    if len(rows) == 1:
        return decode_postings(rows[0])
    parts = [decode_postings(r) for r in rows]
    doc = np.concatenate([p[0] for p in parts])
    tf = np.concatenate([p[1] for p in parts])
    dl = np.concatenate([p[2] for p in parts])
    order = np.argsort(doc, kind="stable")
    return doc[order], tf[order], dl[order]


def _merge_run_table(tbl: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized merge of one term's run rows: concatenate the varint
    streams and decode each ONCE for the whole group (vs 3 decode calls
    per run row — per-call overhead dominated the merge stage), then
    reconstruct absolute doc_ids with a segmented cumsum (each run's
    first gap is absolute, so docs = csum - repeat(csum_before_run))."""
    df = tbl.column("df").to_numpy()
    doc_bufs = tbl.column("doc_ids").to_pylist()
    gaps = varint_decode(b"".join(doc_bufs))
    csum = np.cumsum(gaps.astype(np.int64))
    starts = np.concatenate(([0], np.cumsum(df)[:-1]))
    base = csum[starts] - gaps[starts].astype(np.int64)
    doc = csum - np.repeat(base, df)
    tf = varint_decode(b"".join(tbl.column("tfs").to_pylist())).astype(np.int64)
    dl = varint_decode(b"".join(tbl.column("dls").to_pylist())).astype(np.int64)
    order = np.argsort(doc, kind="stable")
    return doc[order], tf[order], dl[order]


def make_merge_runs(block_size: int = 128):
    """map_groups fn over groupby("term") of run rows: hierarchical merge
    of a term's runs into one final doc-sorted segment row."""

    def merge_runs(tbl: pa.Table) -> pa.Table:
        doc, tf, dl = _merge_run_table(tbl)
        return _segment_row_table(
            encode_postings(tbl.column("term")[0].as_py(), doc, tf, dl, block_size)
        )

    return merge_runs


def make_merge_runs_partial():
    """map_groups fn over groupby(["term", "salt"]): hierarchical
    pre-merge of one salt-range's runs into a single run row — the
    explicit skew bound for extreme groups (a hot term's merge is split
    across salts before the final per-term concat touches it)."""
    from ..functions.codec import delta_encode_doc_ids, varint_encode

    def merge_runs_partial(tbl: pa.Table) -> pa.Table:
        rows = tbl.to_pylist()
        doc, tf, dl = _merge_run_rows(rows)
        return pa.table(
            {
                "term": [rows[0]["term"]],
                "salt": pa.array([rows[0]["salt"]], type=pa.int32()),
                "df": pa.array([doc.size], type=pa.int64()),
                "sum_tf": pa.array([int(tf.sum())], type=pa.int64()),
                "doc_ids": pa.array([delta_encode_doc_ids(doc)], type=pa.binary()),
                "tfs": pa.array([varint_encode(tf.astype(np.uint64))], type=pa.binary()),
                "dls": pa.array([varint_encode(dl.astype(np.uint64))], type=pa.binary()),
            },
            schema=RUN_SCHEMA,
        )

    return merge_runs_partial
