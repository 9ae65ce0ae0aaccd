"""Query-time document filters as packed doc-id bitmaps.

Filtered retrieval ("top-k among documents WHERE <predicate>") is the
metadata-filter primitive every production search stack layers on BM25
(Lucene's filter clauses, PISA/ES filtered queries).  The engine-side
contract is one packed uint8 bitmap over [0, num_docs) — bit d
(little-endian within the byte: byte ``d >> 3``, bit ``d & 7``) set
iff doc d is eligible.  ``pipelines.query.search(allowed=...)`` ships
the bitmap once via the broadcast query plan (``ray.put``), and every
scoring task unpacks ONLY its own doc-range slice (``hi - lo`` bits),
so per-task cost is range/8 bytes of read + one vectorized mask.

Collection statistics (N, df, avgdl) deliberately stay those of the
FULL corpus — the Lucene/ES filtered-query semantics: a filter narrows
the candidate set, it does not re-weight idf.  (Index-level deletes,
which DO eventually leave the stats via compaction, are tombstones.py's
job — built on this same bitmap.)

Scale note: one bitmap over 10^12 docs is 125 GB — fine in a cluster
object store but too big to ship to every node.  The layout here
already supports the sharded fix (each task touches only bytes
``[lo>>3, hi>>3)`` of its group's contiguous doc range), so the 100-TB
path is to publish the bitmap as per-group byte slices keyed by the
manifest's (doc_lo, doc_hi) and ``ray.put`` each slice separately; the
single-array form is kept while corpora fit because one put is cheaper
than hundreds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def bitmap_nbytes(num_docs: int) -> int:
    return (int(num_docs) + 7) >> 3


def bitmap_from_ids(ids: np.ndarray, num_docs: int) -> np.ndarray:
    """Packed bitmap with exactly the given doc ids set."""
    ids = np.asarray(ids, dtype=np.int64)
    if ids.size and (ids.min() < 0 or ids.max() >= num_docs):
        raise ValueError("doc id outside [0, num_docs)")
    bits = np.zeros(bitmap_nbytes(num_docs) << 3, dtype=np.uint8)
    bits[ids] = 1
    return np.packbits(bits, bitorder="little")


def bitmap_slice(bitmap: np.ndarray, lo: int, hi: int) -> np.ndarray:
    """Boolean mask for doc range [lo, hi) — unpacks only the covering
    bytes (the per-task read path)."""
    if hi <= lo:
        return np.empty(0, dtype=bool)
    b0, b1 = lo >> 3, (hi + 7) >> 3
    bits = np.unpackbits(bitmap[b0:b1], bitorder="little")
    off = lo - (b0 << 3)
    return bits[off : off + (hi - lo)].view(np.bool_)


def invert_bitmap(bitmap: np.ndarray, num_docs: int) -> np.ndarray:
    """allowed = NOT deleted, with the pad bits past num_docs kept 0."""
    out = np.bitwise_not(bitmap)
    tail = num_docs & 7
    if tail:
        out[-1] &= np.uint8((1 << tail) - 1)
    return out


def popcount(bitmap: np.ndarray) -> int:
    return int(np.unpackbits(bitmap, bitorder="little").sum())


def allowed_bitmap(
    ids: rd.Dataset | np.ndarray,
    num_docs: int,
    id_col: str = "doc_id",
) -> np.ndarray:
    """Build the packed bitmap from the doc ids present in ``ids``.

    Pass a Ray ``Dataset`` already narrowed by the caller's predicate
    (``read_parquet(columns=[...])`` + a vectorized ``map_batches``
    filter — predicate evaluation stays distributed and column-pruned);
    this stage only converts ids to bits.  Each task packs its batch
    into one (byte_lo, bytes) chunk spanning the batch's id range, so
    the exchange to the driver carries at most ``num_docs/8`` bytes
    total (ids arrive block-contiguous from a sorted corpus) and the
    driver does a pure bytewise OR."""
    if isinstance(ids, np.ndarray):
        return bitmap_from_ids(ids, num_docs)

    nb = bitmap_nbytes(num_docs)

    def pack(batch: pa.Table) -> pa.Table:
        d = batch.column(id_col).to_numpy().astype(np.int64)
        if d.size == 0:
            return pa.table(
                {"byte_lo": pa.array([], type=pa.int64()),
                 "buf": pa.array([], type=pa.binary())}
            )
        if d.min() < 0 or d.max() >= num_docs:
            raise ValueError("doc id outside [0, num_docs)")
        b_lo = int(d.min()) >> 3
        b_hi = (int(d.max()) >> 3) + 1
        bits = np.zeros((b_hi - b_lo) << 3, dtype=np.uint8)
        bits[d - (b_lo << 3)] = 1
        return pa.table(
            {
                "byte_lo": pa.array([b_lo], type=pa.int64()),
                "buf": pa.array([np.packbits(bits, bitorder="little").tobytes()]),
            }
        )

    out = np.zeros(nb, dtype=np.uint8)
    for b in ids.map_batches(pack, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        for lo_, buf in zip(b.column("byte_lo").to_pylist(),
                            b.column("buf").to_pylist()):
            chunk = np.frombuffer(buf, dtype=np.uint8)
            out[lo_ : lo_ + chunk.size] |= chunk
    return out
