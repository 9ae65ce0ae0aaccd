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
object store but too big to ship to every node.  ``BitmapShards`` is
the sharded publication: per-group byte slices keyed by the manifest's
contiguous (doc_lo, doc_hi) ranges, each ``ray.put`` as its OWN
object, so a scoring task fetches only its group's slice (the object
store moves range/8 bytes to that node, never the corpus-wide array).
``pipelines.query.search`` builds shards whenever group ranges are
recorded (every index this engine writes); the single-array plan field
survives only as the fallback for range-less legacy indexes and the
resident serving actors (whose doc span is one group by construction).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
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


@dataclass
class BitmapShards:
    """Per-group published allowed bitmap.

    ``refs[i]`` is a ``ray.put`` ObjectRef holding the uint8 byte slice
    covering docs [doc_lo[i], doc_hi[i]) — bytes [doc_lo[i]>>3,
    (doc_hi[i]+7)>>3) of the corpus-wide bitmap.  Adjacent groups whose
    boundary is not byte-aligned each carry their own copy of the
    boundary byte; only bits inside a shard's own doc range are ever
    read from it (``bitmap_slice`` trims to the requested bit span), so
    the duplicated bits need not agree.

    The instance itself is tiny (three int64 arrays + refs) and rides
    inside the broadcast query plan; Ray tracks the nested refs, and a
    task's ``ray.get`` of one ref moves only that slice.
    """

    doc_lo: np.ndarray   # int64, sorted ascending, disjoint ranges
    doc_hi: np.ndarray
    byte_lo: np.ndarray  # == doc_lo >> 3
    refs: list
    num_docs: int
    _cache: dict = field(default_factory=dict, repr=False, compare=False)

    def shard_index(self, lo: int, hi: int) -> int:
        """Index of the single shard whose doc range covers [lo, hi)."""
        i = int(np.searchsorted(self.doc_hi, lo, side="right"))
        if i >= len(self.refs) or lo < self.doc_lo[i] or hi > self.doc_hi[i]:
            raise ValueError(
                f"doc range [{lo}, {hi}) not covered by one bitmap shard"
            )
        return i

    def mask(self, lo: int, hi: int) -> np.ndarray:
        """Boolean eligibility mask for doc range [lo, hi) — fetches
        (and per-instance caches) only the covering group's slice."""
        if hi <= lo:
            return np.empty(0, dtype=bool)
        i = self.shard_index(lo, hi)
        buf = self._cache.get(i)
        if buf is None:
            buf = self._cache[i] = np.asarray(ray.get(self.refs[i]))
        base = int(self.byte_lo[i]) << 3
        return bitmap_slice(buf, lo - base, hi - base)

    @classmethod
    def from_slices(cls, ranges: list[tuple[int, int]], slices,
                    num_docs: int) -> "BitmapShards":
        """``ranges``: sorted disjoint (doc_lo, doc_hi) per group;
        ``slices``: matching uint8 byte arrays, ``ray.put`` here."""
        lo = np.asarray([r[0] for r in ranges], dtype=np.int64)
        hi = np.asarray([r[1] for r in ranges], dtype=np.int64)
        refs = [ray.put(np.ascontiguousarray(s, dtype=np.uint8))
                for s in slices]
        return cls(lo, hi, lo >> 3, refs, int(num_docs))


def shard_byte_span(doc_lo: int, doc_hi: int) -> tuple[int, int]:
    return doc_lo >> 3, (doc_hi + 7) >> 3


def compose_shards(
    ranges: list[tuple[int, int]],
    num_docs: int,
    user: "np.ndarray | BitmapShards | None" = None,
    deleted_ids: np.ndarray | None = None,
) -> BitmapShards:
    """Publish the per-group allowed shards for ``search``.

    One group at a time (driver peak memory = one group's slice):
    start from the user filter's bytes for the group — a slice view of
    a full bitmap, or a fetch of the user's own shard — default
    all-ones; clear ``deleted_ids`` (tombstones) bits; ``ray.put``.
    Bits outside a group's doc range (boundary-byte padding) are never
    read, so they are left as-is.
    """
    ranges = sorted(ranges)
    deleted = (np.asarray(deleted_ids, dtype=np.int64)
               if deleted_ids is not None else None)
    out: list[np.ndarray] = []
    for g_lo, g_hi in ranges:
        b0, b1 = shard_byte_span(g_lo, g_hi)
        if user is None:
            buf = np.full(b1 - b0, 0xFF, dtype=np.uint8)
        elif isinstance(user, BitmapShards):
            i = user.shard_index(g_lo, g_hi)
            u0 = int(user.byte_lo[i])
            sl = np.asarray(ray.get(user.refs[i]))
            buf = sl[b0 - u0 : b1 - u0].copy()
        else:
            buf = np.asarray(user, dtype=np.uint8)[b0:b1].copy()
        if deleted is not None and deleted.size:
            i0, i1 = np.searchsorted(deleted, (g_lo, g_hi))
            d = deleted[i0:i1]
            if d.size:
                np.bitwise_and.at(
                    buf, (d >> 3) - b0,
                    np.bitwise_not(
                        np.uint8(1) << (d & 7).astype(np.uint8)),
                )
        out.append(buf)
    return BitmapShards.from_slices(ranges, out, num_docs)


def allowed_shards(
    ids: rd.Dataset,
    num_docs: int,
    ranges: list[tuple[int, int]],
    id_col: str = "doc_id",
) -> BitmapShards:
    """Distributed predicate → published shards, with NO corpus-wide
    array on the driver.  Tasks pack their id batches into byte chunks
    (as ``allowed_bitmap``), the tiny chunk table is sorted by
    ``byte_lo`` (an all-to-all over bitmap-sized data, once), and the
    driver streams it in byte order, OR-ing into the current group's
    slice and ``ray.put``-flushing each group the moment the stream
    passes its last byte — peak driver memory is one group's slice."""
    ranges = sorted(ranges)
    packed = _pack_chunks(ids, num_docs, id_col).sort("byte_lo")

    lo_a = np.asarray([r[0] for r in ranges], dtype=np.int64)
    hi_a = np.asarray([r[1] for r in ranges], dtype=np.int64)
    bufs: dict[int, np.ndarray] = {}
    refs: dict[int, object] = {}
    open_gs: list[int] = []

    def flush_until(byte_pos: int) -> None:
        while open_gs and shard_byte_span(*ranges[open_gs[0]])[1] <= byte_pos:
            g = open_gs.pop(0)
            refs[g] = ray.put(bufs.pop(g))

    for b in packed.iter_batches(batch_size=None, batch_format="pyarrow"):
        for c_lo, buf in zip(b.column("byte_lo").to_pylist(),
                             b.column("buf").to_pylist()):
            chunk = np.frombuffer(buf, dtype=np.uint8)
            flush_until(c_lo)
            # a chunk's doc span may cross group boundaries: distribute
            # its bytes into every overlapping group slice
            g0 = int(np.searchsorted(hi_a, (c_lo << 3), side="right"))
            g1 = int(np.searchsorted(lo_a, (c_lo + chunk.size) << 3))
            for g in range(g0, g1):
                b0, b1 = shard_byte_span(*ranges[g])
                if g not in bufs:
                    bufs[g] = np.zeros(b1 - b0, dtype=np.uint8)
                    open_gs.append(g)
                    open_gs.sort()
                s0 = max(c_lo, b0)
                s1 = min(c_lo + chunk.size, b1)
                if s1 > s0:
                    bufs[g][s0 - b0 : s1 - b0] |= chunk[s0 - c_lo : s1 - c_lo]
    flush_until(1 << 62)
    out_refs = []
    for g in range(len(ranges)):
        r = refs.get(g)
        if r is None:  # group matched no ids: all-zeros shard
            b0, b1 = shard_byte_span(*ranges[g])
            r = ray.put(np.zeros(b1 - b0, dtype=np.uint8))
        out_refs.append(r)
    return BitmapShards(lo_a, hi_a, lo_a >> 3, out_refs, int(num_docs))


def _pack_chunks(ids: rd.Dataset, num_docs: int, id_col: str) -> rd.Dataset:
    """Distributed id→packed-byte-chunk stage shared by
    ``allowed_bitmap`` and ``allowed_shards``."""

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

    return ids.map_batches(pack, batch_format="pyarrow")


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

    out = np.zeros(bitmap_nbytes(num_docs), dtype=np.uint8)
    for b in _pack_chunks(ids, num_docs, id_col).iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        for lo_, buf in zip(b.column("byte_lo").to_pylist(),
                            b.column("buf").to_pylist()):
            chunk = np.frombuffer(buf, dtype=np.uint8)
            out[lo_ : lo_ + chunk.size] |= chunk
    return out
