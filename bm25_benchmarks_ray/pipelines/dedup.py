"""Deduplication operators over a (doc_id, text) corpus.

Not present in the reference (SURVEY.md §2.4: "no near-dedup anywhere"),
but first-class for a training-data pipeline at 10^12-turn scale.  All
operators are Ray-Data-native:

- exact:    content hash → per-batch combiner → groupby(hash) min doc —
            the canonical hash-partition + per-group-first.
- ngram:    word n-gram shingles → inverted shingle index (groupby) →
            candidate pairs from co-occurrence → exact Jaccard.
            EXACT/ORACLE ROUTE ONLY: quadratic worst case on template-
            heavy corpora; refuses > NGRAM_MAX_DOCS docs (override with
            max_docs=None) — minhash is the scale route.
- minhash:  shingles → k minhash permutations → banded LSH buckets →
            candidates from bucket groupby → exact-Jaccard verify.
- simhash:  64-bit simhash over token features → 4-band blocking →
            Hamming-distance verify (≤ hamming_max).

Skew note: a boilerplate shingle shared by millions of docs makes the
pair-explosion O(df²).  Both ngram and minhash cap per-bucket size
(``max_bucket``) and report dropped buckets — at 100 TB you always cap
(the dropped buckets are exactly the near-duplicate *clusters* that a
cheaper clustering pass should own instead of pairwise emission).

All hashes are deterministic (md5-derived) so results are stable across
runs, workers, and the DuckDB oracles.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.tokenizer import TOKEN_RE


def _join_partitions() -> int:
    """Hash-join width: one partition per CPU (tiny pair/size tables
    relative to the corpus; the join is never the wide stage here)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, cpus)


_SEMI_JOIN_MAX_PAIRS = 20_000_000
_BROADCAST_MAX_ROWS = 2_000_000


def _broadcast_attach(
    pairs: rd.Dataset,
    small: rd.Dataset,
    val_col: str,
    out_a: str,
    out_b: str,
    id_col: str = "doc_id",
) -> rd.Dataset | None:
    """Attach ``small[val_col]`` to both sides of ``pairs`` via ONE
    broadcast-lookup ``map_batches`` — the small-side alternative to
    two hash joins, whose fixed shuffle cost (~8 s each measured at
    233k pairs × 36k docs on 32 CPUs) dwarfs these row counts.  The
    (sorted ids, values) table goes into the object store once with
    ``ray.put``; every task reads it zero-copy.  Returns ``None`` when
    ``small`` exceeds ``_BROADCAST_MAX_ROWS`` — caller falls back to
    the distributed joins (the 100-TB path when candidates are huge).
    Inner-join semantics: pairs with an id absent from ``small`` are
    dropped."""
    import ray

    small = small.materialize()
    if small.count() > _BROADCAST_MAX_ROWS:
        return None
    tbl = pa.concat_tables(
        small.select_columns([id_col, val_col]).iter_batches(batch_format="pyarrow")
    ).combine_chunks()
    ids = tbl.column(id_col).to_numpy()
    order = np.argsort(ids)
    ids_sorted = ids[order]
    vals_sorted = tbl.column(val_col).take(pa.array(order))
    ref = ray.put((ids_sorted, vals_sorted))

    def lookup(want: np.ndarray, ids_s: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        pos = np.searchsorted(ids_s, want)
        pos_c = np.minimum(pos, max(ids_s.size - 1, 0))
        hit = (pos < ids_s.size) & (ids_s[pos_c] == want) if ids_s.size else np.zeros(want.size, bool)
        return pos_c, hit

    def attach(batch: pa.Table) -> pa.Table:
        ids_s, vals = ray.get(ref)
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        pa_pos, a_hit = lookup(a, ids_s)
        pb_pos, b_hit = lookup(b, ids_s)
        keep = a_hit & b_hit
        batch = batch.filter(pa.array(keep))
        return batch.append_column(out_a, vals.take(pa.array(pa_pos[keep]))).append_column(
            out_b, vals.take(pa.array(pb_pos[keep]))
        )

    return pairs.map_batches(attach, batch_format="pyarrow")


def _semi_join_filter(
    corpus: rd.Dataset, pairs: rd.Dataset, id_col: str = "doc_id"
) -> rd.Dataset:
    """Shrink the corpus side of a pairs⋈corpus verify join to only the
    docs that actually appear in a candidate pair: collect the distinct
    pair ids (O(candidates), which the join must materialize anyway),
    broadcast the sorted array once via ``ray.put``, and filter with a
    searchsorted membership test inside ``map_batches``.  Near-dup
    candidates are a vanishing fraction of a clean corpus, so this cuts
    the join's shuffled text volume by orders of magnitude.  Beyond
    ``_SEMI_JOIN_MAX_PAIRS`` candidates the broadcast would be the
    bottleneck — return the corpus unfiltered and let the hash join do
    the work."""
    import ray

    if pairs.count() > _SEMI_JOIN_MAX_PAIRS:
        return corpus
    ids = np.unique(
        np.concatenate(
            [
                np.concatenate(
                    [b.column(c).to_numpy() for c in ("a", "b")]
                )
                for b in pairs.iter_batches(batch_format="pyarrow")
            ]
            or [np.empty(0, dtype=np.int64)]
        )
    )
    ref = ray.put(ids)

    def flt(batch: pa.Table) -> pa.Table:
        want = ray.get(ref)
        doc = batch.column(id_col).to_numpy()
        pos = np.searchsorted(want, doc)
        pos_c = np.minimum(pos, max(want.size - 1, 0))
        keep = (pos < want.size) & (want[pos_c] == doc) if want.size else np.zeros(doc.size, bool)
        return batch.filter(pa.array(keep))

    return corpus.map_batches(flt, batch_format="pyarrow")


def _stabilize(ds: rd.Dataset) -> rd.Dataset:
    """groupby().aggregate() can emit schema-less EMPTY blocks that the
    hash join's Arrow kernel rejects; map_batches is skipped on empty
    blocks so a UDF cannot fix them.  A repartition merges them into
    schema-bearing blocks (tiny pair/size tables — cheap)."""
    return ds.repartition(_join_partitions())


def _nonempty_or(ds: rd.Dataset, schema: pa.Schema) -> rd.Dataset:
    """Materialize a (small, post-cap bounded) pair stream and replace a
    fully-empty result with a TYPED empty dataset: a groupby-aggregate
    over zero rows emits schema-less blocks that the Arrow hash join
    rejects outright ("no match for key field"), and map_batches cannot
    repair them because it is skipped on empty blocks."""
    m = ds.materialize()
    if m.count() == 0:
        return rd.from_arrow(schema.empty_table())
    return m


_PAIR_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])


def _pair_run_reduce(
    pairs: rd.Dataset, count_as: str | None = None, keep: str | None = None
) -> rd.Dataset:
    """Per-(a, b) reduce over a pair stream — distinct, count, or
    min(keep) — as a hash-partitioned sort + whole-partition run kernel
    instead of Ray's sort-aggregate (same result; the aggregate's
    output builder and fixed cost measured ~8 s even on tiny inputs).
    The sort key is a uniform hash of (a, b) with explicit boundaries,
    so every pair's duplicates land in one partition; runs break on the
    real (a, b) values (collision-exact)."""

    def reduce_block(batch: pa.Table) -> pa.Table:
        schema_cols = {"a": pa.array([], type=pa.int64()),
                       "b": pa.array([], type=pa.int64())}
        if count_as:
            schema_cols[count_as] = pa.array([], type=pa.int64())
        if keep:
            schema_cols[keep] = pa.array([], type=pa.int64())
        if batch.num_rows == 0:
            return pa.table(schema_cols)
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        if keep:
            k = batch.column(keep).to_numpy()
            order = np.lexsort((k, b, a))
        else:
            order = np.lexsort((b, a))
        a, b = a[order], b[order]
        first = np.empty(a.size, dtype=bool)
        first[0] = True
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(first)
        out = {"a": pa.array(a[starts], type=pa.int64()),
               "b": pa.array(b[starts], type=pa.int64())}
        if count_as:
            out[count_as] = pa.array(
                np.diff(np.append(starts, a.size)), type=pa.int64()
            )
        if keep:
            # sorted by keep within each run: the run start is the min
            out[keep] = pa.array(k[order][starts], type=pa.int64())
        return pa.table(out)

    return _bucket_sorted(pairs, ["a", "b"]).map_batches(
        reduce_block, batch_format="pyarrow", batch_size=None
    )


def _distinct_pairs(pairs: rd.Dataset, keep: str | None = None) -> rd.Dataset:
    """Distinct (a, b); ``keep``: a column whose per-pair Min survives
    (identical across duplicates here)."""
    return _stabilize(_pair_run_reduce(pairs, keep=keep))

# -- deterministic vectorized hashing ---------------------------------

def md5_u64(strings: Iterable[str], seed: int = 0) -> np.ndarray:
    """First 8 bytes of md5(seed || s) as uint64, per string.  Kept for
    the operators whose DuckDB oracles replicate the hash bits
    (simhash, winnowing — driver_api._MD5U64_SQL); bucketing-only paths
    use :func:`fast_hash_u64` instead."""
    out = np.empty(len(strings) if hasattr(strings, "__len__") else 0, dtype=np.uint64)
    pre = str(seed).encode() + b"\x00"
    for i, s in enumerate(strings):
        out[i] = int.from_bytes(hashlib.md5(pre + s.encode()).digest()[:8], "little")
    return out


def fast_hash_u64(strings) -> np.ndarray:
    """Deterministic SipHash-1-3 per string (pandas' fixed-key C
    kernel) — the vectorized replacement for the per-string hashlib
    loop wherever the hash is only a grouping/bucketing key and no SQL
    oracle replicates its bits: exact-dedup partitions, shingle keys,
    minhash bases.  ~20× less per-call overhead than hashlib.md5 at
    10² shingles × 10¹² docs."""
    arr = np.asarray(strings, dtype=object)
    if arr.size == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(arr, categorize=False)


def _tokens(text: str) -> list[str]:
    return TOKEN_RE.findall(text.lower())


def _token_codes(texts: list[str]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Dictionary-encoded flat token stream for a whole batch:
    ``(codes, uniq, lens)`` with ``uniq[codes]`` equal to the
    concatenation of ``_tokens(t)`` over the batch in order and
    ``lens`` the per-doc token counts.

    Fast path (pure-ASCII batch — the common case at scale): Arrow
    ``utf8_lower`` → RE2 ``\\W+`` split → length>=2 filter →
    ``dictionary_encode``, all C kernels.  No per-token Python string
    is ever built, and downstream hashes touch only the DISTINCT
    tokens (Zipf streams repeat heavily: ~17× fewer strings on the
    synthetic corpora).  RE2's ASCII ``\\w`` equals Python's unicode
    ``\\w`` on ASCII input so the streams are identical there
    (asserted in tests); non-ASCII rows take the exact Python-re path
    per doc and merge under the same dictionary — unicode semantics
    unchanged (see :func:`..functions.tokenizer.dict_token_stream`)."""
    from ..functions.tokenizer import dict_token_stream

    codes, uniq, _, lens = dict_token_stream(texts, lower=True)
    return codes, uniq, lens


class _Md5Cache:
    """Cross-batch token→``md5_u64`` cache for actor-pool signer stages.

    The md5 bit pattern is pinned by the bit-replicating DuckDB oracle
    (simhash), so the hash itself cannot be swapped for a vectorizable
    family — but token streams are Zipfian, so caching distinct-token
    hashes across batches drops hashlib calls to near zero after the
    first few batches.  One vectorized ``get_indexer`` probe per batch;
    hashlib only on misses; append-only (misses are by construction not
    in the index, keeping it unique) with a size cap."""

    def __init__(self, max_size: int = 2_000_000):
        self._idx = pd.Index([], dtype=object)
        self._h = np.empty(0, dtype=np.uint64)
        self._max = max_size

    def lookup(self, uniq: np.ndarray) -> np.ndarray:
        if not len(self._idx):
            pos = np.full(len(uniq), -1, dtype=np.int64)
        else:
            pos = self._idx.get_indexer(uniq)
        out = np.empty(len(uniq), dtype=np.uint64)
        hit = pos >= 0
        out[hit] = self._h[pos[hit]]
        miss = ~hit
        if miss.any():
            mh = md5_u64(list(uniq[miss]))
            out[miss] = mh
            if len(self._idx) + int(miss.sum()) <= self._max:
                self._idx = self._idx.append(pd.Index(uniq[miss]))
                self._h = np.concatenate([self._h, mh])
        return out


def shingles(text: str, n: int = 3) -> set[str]:
    t = _tokens(text)
    if len(t) < n:
        return {" ".join(t)} if t else set()
    return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}


_POLY = np.uint64(1099511628211)  # FNV prime as the window-combine base


def shingle_hashes(
    texts: list[str], n: int = 3
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-doc DISTINCT word-``n``-gram shingle hashes for a whole
    batch, vectorized past tokenization: one SipHash pass over the flat
    token array, a degree-(n-1) polynomial combine per window (no
    shingle strings are ever built), and a doc-segmented unique.

    Returns ``(doc_idx, hash, n_distinct)``: flat (local doc index,
    shingle hash) rows plus the per-doc distinct count.  Docs shorter
    than ``n`` tokens contribute one whole-text shingle (matching
    :func:`shingles`); empty docs contribute none."""
    codes, uniq, lens = _token_codes(texts)
    m = len(texts)
    # SipHash only the DISTINCT tokens, gather per occurrence — same
    # values as hashing the flat stream (hash is per string value)
    th = fast_hash_u64(uniq)[codes] if codes.size else np.empty(0, np.uint64)
    wc = np.where(lens >= n, lens - n + 1, (lens > 0).astype(np.int64))
    off = np.concatenate(([0], np.cumsum(lens)))
    woff = np.concatenate(([0], np.cumsum(wc)))
    W = int(woff[-1])
    doc_of_w = np.repeat(np.arange(m, dtype=np.int64), wc)
    pos_in_doc = np.arange(W, dtype=np.int64) - np.repeat(woff[:-1], wc)
    wstart = off[:-1].repeat(wc) + pos_in_doc
    full = np.repeat(lens >= n, wc)
    acc = np.zeros(W, dtype=np.uint64)
    with np.errstate(over="ignore"):
        fw = np.flatnonzero(full)
        if fw.size:
            a = th[wstart[fw]].copy()
            for j in range(1, n):
                a = a * _POLY + th[wstart[fw] + j]
            acc[fw] = a
        sw = np.flatnonzero(~full)
        if sw.size:  # short docs: one window over all (< n) tokens
            d = doc_of_w[sw]
            a2 = th[off[d]].copy()
            for j in range(1, n - 1):
                msk = lens[d] > j
                a2[msk] = a2[msk] * _POLY + th[off[d[msk]] + j]
            acc[sw] = a2
    order = np.lexsort((acc, doc_of_w))
    dd, hh = doc_of_w[order], acc[order]
    keep = np.concatenate(([True], (dd[1:] != dd[:-1]) | (hh[1:] != hh[:-1]))) if dd.size else np.empty(0, bool)
    dd, hh = dd[keep], hh[keep]
    n_sh = np.bincount(dd, minlength=m).astype(np.int64)
    return dd, hh, n_sh


# -- exact dedup -------------------------------------------------------

def exact_dedup(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """Surviving doc per distinct text: hash-partition + per-group
    first.  The per-batch combiner collapses duplicates before the
    shuffle so the exchange moves one row per distinct text per block;
    survivor selection is the hash-partitioned sort + whole-partition
    min-per-run kernel (no Ray sort-aggregate — its output builder
    round-trips keys through Python ints, and its fixed cost measured
    ~8 s even on combiner-sized inputs)."""

    def combine(batch: pa.Table) -> pa.Table:
        # int64 VIEW of the u64 hash (bijective): grouping only needs
        # distinctness, and int64 avoids >2^63 Python-int round-trips
        df = pd.DataFrame(
            {
                "h": fast_hash_u64(batch.column(text_col).to_pylist()).view(np.int64),
                id_col: batch.column(id_col).to_numpy(),
            }
        )
        g = df.groupby("h", sort=False)[id_col].min().reset_index()
        return pa.table({"h": pa.array(g["h"], type=pa.int64()),
                         id_col: pa.array(g[id_col], type=pa.int64())})

    def survivors_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], type=pa.int64())})
        h = batch.column("h").to_numpy()
        doc = batch.column(id_col).to_numpy()
        order = np.lexsort((doc, h))
        hs = h[order]
        first = np.empty(hs.size, dtype=bool)
        first[0] = True
        first[1:] = hs[1:] != hs[:-1]
        return pa.table({id_col: pa.array(doc[order][first], type=pa.int64())})

    # 16384-row batches: fewer UDF dispatches (same lever as the LSH
    # signer stages; block counts are batch-size-independent)
    combined = ds.map_batches(combine, batch_format="pyarrow", batch_size=16384)
    return _bucket_sorted(combined, ["h"], prehashed=True).map_batches(
        survivors_block, batch_format="pyarrow", batch_size=None
    )


# -- n-gram Jaccard near-dup ------------------------------------------

def _shingle_rows(batch: pa.Table, n: int) -> pa.Table:
    doc_ids = batch.column("doc_id").to_numpy()
    dd, hh, n_sh = shingle_hashes(batch.column("text").to_pylist(), n)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[dd], type=pa.int64()),
            # int64 view (bijective) — uint64 keys > 2^63 break Ray's
            # Python-int round-trips in sort sampling / aggregate builds
            "sh": pa.array(hh.view(np.int64), type=pa.int64()),
            "n_sh": pa.array(n_sh[dd], type=pa.int64()),
        }
    )


class DropReport:
    """Side-metric for capped dedup buckets — the "no silent caps" rule.
    Pass one to ngram/minhash/simhash; after consuming the returned
    Dataset, ``report.get()`` returns {"dropped_buckets", "dropped_docs"}
    aggregated across all tasks (a zero-CPU counter actor).  A dropped
    bucket is a candidate *cluster* larger than max_bucket whose
    pairwise emission was skipped — at 100 TB those clusters should be
    routed to a clustering pass, not silently vanish."""

    def __init__(self):
        import ray

        @ray.remote(num_cpus=0)
        class _Counter:
            def __init__(self):
                self.buckets = 0
                self.docs = 0

            def add(self, docs: int) -> None:
                self.buckets += 1
                self.docs += docs

            def add_many(self, docs: list) -> None:
                self.buckets += len(docs)
                self.docs += sum(docs)

            def get(self) -> dict:
                return {"dropped_buckets": self.buckets, "dropped_docs": self.docs}

        self._actor = _Counter.remote()

    @property
    def handle(self):
        return self._actor

    def get(self) -> dict:
        import ray

        return ray.get(self._actor.get.remote())


def _bucket_sorted(
    rows: rd.Dataset,
    key_cols: list[str],
    width: int | None = None,
    prehashed: bool = False,
):
    """Range-sort ``rows`` so every bucket (distinct ``key_cols`` tuple)
    lands wholly inside one partition, WITHOUT ``groupby().map_groups``:
    a uniform hash of the key tuple gets explicit equally-spaced uint64
    boundaries (the index build's tid-partitioning design), so kernels
    can process every bucket in a partition in one invocation instead
    of one Python UDF dispatch + one table PER BUCKET (at 10^9 buckets
    that shape is 10^9 interpreter round-trips).  Hash collisions stay
    exact: consumers break runs on the REAL key values, which sort
    contiguously under (bkey, *key_cols).

    ``prehashed``: the single key column is ITSELF already a uniform
    64-bit hash carried as an int64 VIEW (content hash, shingle hash —
    the views avoid >2^63 Python-int round-trips in Ray's sort
    machinery) — sort directly on it, skipping the bkey pass and its
    8 B/row of exchange payload.  Boundaries are the same equal-width
    grid shifted into the int64 domain (the view is order-permuted vs
    uint64 but stays uniform, which is all balance needs).  Runs then
    break on the hash value alone, so two REAL buckets colliding in 64
    bits would merge — exactly the collision semantics those hashes
    already carry as bucket identities."""
    import ray

    from .index_build import _tid_boundaries

    if width is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        width = max(2, 2 * cpus)
    if prehashed:
        assert len(key_cols) == 1
        return rows.sort(
            key_cols, boundaries=[b - 2**63 for b in _tid_boundaries(width)]
        )

    def add_bkey(batch: pa.Table) -> pa.Table:
        mix = np.zeros(batch.num_rows, dtype=np.uint64)
        for c in key_cols:
            v = batch.column(c).to_numpy().astype(np.int64, copy=False)
            mix = mix * np.uint64(0x9E3779B97F4A7C15) + v.view(np.uint64)
        bkey = pd.util.hash_array(mix, categorize=False)
        return batch.append_column("bkey", pa.array(bkey, type=pa.uint64()))

    return rows.map_batches(add_bkey, batch_format="pyarrow").sort(
        ["bkey", *key_cols], boundaries=_tid_boundaries(width)
    )


def _bucket_runs(tbl: pa.Table, key_cols: list[str]):
    """(order, starts, ends) of bucket runs in a sorted partition: rows
    re-lexsorted locally by (key_cols, doc_id); runs break wherever any
    real key column changes."""
    cols = [tbl.column(c).to_numpy() for c in key_cols]
    doc = tbl.column("doc_id").to_numpy()
    order = np.lexsort((doc, *reversed(cols)))
    n = doc.size
    new = np.zeros(n, dtype=bool)
    new[0] = True
    for c in cols:
        cs = c[order]
        new[1:] |= cs[1:] != cs[:-1]
    starts = np.flatnonzero(new)
    return order, starts, np.append(starts[1:], n)


def bucket_pairs(
    rows: rd.Dataset,
    key_cols: list[str],
    max_bucket: int,
    drop_handle=None,
    prehashed: bool = False,
) -> rd.Dataset:
    """Candidate (a, b) pairs per bucket over (key_cols..., doc_id)
    rows — the whole-partition replacement for
    ``groupby(key_cols).map_groups(make_pairs_from_group(...))``."""

    def pairs_block(tbl: pa.Table) -> pa.Table:
        # Fully vectorized: NO per-run Python loop.  At 1.2M clean docs
        # the partition holds ~600k near-all-singleton runs — a
        # loop-per-run kernel (np.unique per bucket) measured 226 s of
        # UDF time across the band exchange; this form does run-dedup
        # with boolean masks and emits pairs grouped by run LENGTH
        # (≤ max_bucket distinct lengths, each one vectorized triu
        # broadcast), so Python iteration count is bounded by the pair
        # multiplicity spectrum, not the corpus.
        if tbl.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        order, starts, ends = _bucket_runs(tbl, key_cols)
        doc = tbl.column("doc_id").to_numpy()[order]
        n = doc.size
        first_in_run = np.zeros(n, dtype=bool)
        first_in_run[starts] = True
        # doc is sorted within each run (_bucket_runs lexsorts with
        # doc_id innermost) ⇒ duplicates are adjacent
        keep = first_in_run.copy()
        keep[1:] |= doc[1:] != doc[:-1]
        doc2 = doc[keep]
        rid2 = (np.cumsum(first_in_run) - 1)[keep]
        L = np.bincount(rid2, minlength=starts.size)
        over = L > max_bucket
        ok = (L >= 2) & ~over
        if over.any() and drop_handle is not None:
            import ray

            ray.get(drop_handle.add_many.remote([int(x) for x in L[over]]))
        if not ok.any():
            return _PAIR_SCHEMA.empty_table()
        off2 = np.concatenate(([0], np.cumsum(L)))
        out_a, out_b = [], []
        for l in np.unique(L[ok]):
            runs_l = off2[:-1][ok & (L == l)]
            ai, bi = np.triu_indices(int(l), k=1)
            out_a.append((runs_l[:, None] + ai[None, :]).ravel())
            out_b.append((runs_l[:, None] + bi[None, :]).ravel())
        return pa.table(
            {
                "a": pa.array(doc2[np.concatenate(out_a)], type=pa.int64()),
                "b": pa.array(doc2[np.concatenate(out_b)], type=pa.int64()),
            }
        )

    return _bucket_sorted(rows, key_cols, prehashed=prehashed).map_batches(
        pairs_block, batch_format="pyarrow", batch_size=None
    )


#: ngram_jaccard_pairs refuses corpora above this size unless forced —
#: raw shingle co-occurrence is quadratic in the worst case (template-
#: heavy corpora), so the exact path must not become the accidental
#: 100-TB route; minhash_lsh_pairs is the scale route.
NGRAM_MAX_DOCS = 5_000_000


def ngram_jaccard_pairs(
    ds: rd.Dataset,
    threshold: float = 0.8,
    n: int = 3,
    max_bucket: int = 256,
    drop_report: DropReport | None = None,
    max_docs: int | None = NGRAM_MAX_DOCS,
) -> rd.Dataset:
    """Pairs (a < b) with Jaccard(n-gram shingle sets) >= threshold.

    shingle → groupby(shingle) candidate pairs → groupby(pair) count =
    |A∩B|; |A∪B| recovered by hash-joining the per-doc shingle-count
    table back onto the pairs (both sides stay distributed — no
    driver-side size map).  ``drop_report`` surfaces over-cap buckets.

    This is the EXACT (small-corpus / oracle) route: candidate pairs
    come from raw shingle co-occurrence, whose worst case is quadratic
    on template-heavy corpora (measured 4.4-10.9k docs/s at 1.2M docs
    vs minhash's 71.5k).  Corpora larger than ``max_docs`` are refused
    with a pointer to ``minhash_lsh_pairs`` — pass ``max_docs=None``
    to force the exact path anyway."""
    if max_docs is not None:
        n_docs = ds.count()
        if n_docs > max_docs:
            raise ValueError(
                f"ngram_jaccard_pairs: corpus has {n_docs:,} docs > "
                f"max_docs={max_docs:,}; raw shingle co-occurrence is "
                "quadratic in the worst case. Use minhash_lsh_pairs "
                "(the LSH-bucketed scale route, exact-Jaccard verified) "
                "or pass max_docs=None to force the exact path."
            )
    sh = ds.map_batches(
        lambda b: _shingle_rows(b, n), batch_format="pyarrow", batch_size=16384
    )

    def sizes_block(batch: pa.Table) -> pa.Table:
        # one (doc, n_sh) row per doc WITHOUT a shuffle: input rows are
        # one per doc, so a per-batch shingle count is already the
        # global per-doc table (costs one extra tokenize pass; the
        # alternative — reducing the shingle rows — is a sort-aggregate
        # over ~shingles-per-doc x N rows)
        _, _, n_sh = shingle_hashes(batch.column("text").to_pylist(), n)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_sh": pa.array(n_sh, type=pa.int64()),
            }
        )

    sizes = _stabilize(
        ds.map_batches(sizes_block, batch_format="pyarrow", batch_size=16384)
    )

    pairs = bucket_pairs(
        sh.select_columns(["sh", "doc_id"]),
        ["sh"],
        max_bucket,
        drop_report.handle if drop_report else None,
        prehashed=True,  # sh IS the bucket identity (poly-hash int64 view)
    )
    # co-occurrence count per pair = |A∩B|: hash-sorted whole-partition
    # run counts (a pair repeats once per shared shingle, possibly from
    # different buckets — a genuine global reduce, done without the Ray
    # sort-aggregate's fixed cost).  Materialized (small, post-cap
    # bounded): zero candidates must short-circuit BEFORE the size join
    # — the Arrow hash join rejects an empty left side outright.
    inter = _stabilize(_pair_run_reduce(pairs, count_as="inter")).materialize()
    if inter.count() == 0:
        return rd.from_arrow(
            _PAIR_SCHEMA.append(pa.field("jaccard", pa.float64())).empty_table()
        )

    sizes = _semi_join_filter(sizes, inter)
    joined = _broadcast_attach(inter, sizes, "n_sh", "na", "nb")
    if joined is None:  # candidate set too large to broadcast: hash joins

        def rename(key: str, val: str):
            def f(b: pa.Table) -> pa.Table:
                return pa.table({key: b.column("doc_id"), val: b.column("n_sh")})

            return f

        p = _join_partitions()
        joined = inter.join(
            sizes.map_batches(rename("a", "na"), batch_format="pyarrow"),
            join_type="inner", num_partitions=p, on=("a",),
        ).join(
            sizes.map_batches(rename("b", "nb"), batch_format="pyarrow"),
            join_type="inner", num_partitions=p, on=("b",),
        )

    def score(b: pa.Table) -> pa.Table:
        i = b.column("inter").to_numpy().astype(np.float64)
        na = b.column("na").to_numpy().astype(np.float64)
        nb = b.column("nb").to_numpy().astype(np.float64)
        jac = i / (na + nb - i)
        keep = jac >= threshold
        return pa.table(
            {
                "a": pa.array(b.column("a").to_numpy()[keep], type=pa.int64()),
                "b": pa.array(b.column("b").to_numpy()[keep], type=pa.int64()),
                "jaccard": pa.array(jac[keep], type=pa.float64()),
            }
        )

    return joined.map_batches(score, batch_format="pyarrow")


# -- MinHash + LSH -----------------------------------------------------

class MinHasher:
    """Stateful actor stage: doc → k-permutation minhash signature.

    Permutations are odd-multiplier multiply-add hashes over the
    vectorized SipHash shingle base (wrap-around mod 2^64 — the
    standard multiply-shift family); a/b derive from a seeded RNG in
    __init__ (once per actor, identical across actors → identical
    signatures everywhere).  The whole batch is one outer product +
    a doc-segmented ``minimum.reduceat`` — no per-shingle or per-doc
    Python hashing anywhere."""

    def __init__(self, num_hashes: int = 128, shingle_n: int = 3, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.a = (
            rng.randint(1, 1 << 61, size=num_hashes, dtype=np.int64).astype(np.uint64)
            | np.uint64(1)
        )
        self.b = rng.randint(0, 1 << 61, size=num_hashes, dtype=np.int64).astype(
            np.uint64
        )
        self.n = shingle_n
        self.k = num_hashes

    def _signatures(self, texts: list[str]) -> np.ndarray:
        """(len(texts), k) signature matrix; all-max rows for empty docs.

        One permutation COLUMN at a time: the working set per pass is
        the flat shingle-hash array (W × 8 B, L2/L3-resident) instead
        of a (W × k) matrix streamed through DRAM — measured 4.5×
        faster than the chunked outer-product form (0.25 s vs 1.13 s
        per 20k-doc batch, identical output)."""
        m = len(texts)
        sigs = np.full((m, self.k), np.iinfo(np.uint64).max, dtype=np.uint64)
        dd, hh, _ = shingle_hashes(texts, self.n)
        if not hh.size:
            return sigs
        starts = np.flatnonzero(np.concatenate(([True], dd[1:] != dd[:-1])))
        present = dd[starts]
        out = np.empty((starts.size, self.k), dtype=np.uint64)
        with np.errstate(over="ignore"):
            tmp = np.empty_like(hh)
            for j in range(self.k):
                np.multiply(hh, self.a[j], out=tmp)
                tmp += self.b[j]
                out[:, j] = np.minimum.reduceat(tmp, starts)
        sigs[present] = out
        return sigs

    def signature(self, text: str) -> np.ndarray:
        return self._signatures([text])[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sigs = self._signatures(texts)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                # zero-copy fixed-size-list build from the flat matrix —
                # pa.array(list(sigs)) materialized a Python object per ROW
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sigs.reshape(-1)), self.k
                ),
            }
        )


def minhash_lsh_pairs(
    ds: rd.Dataset,
    threshold: float = 0.8,
    num_hashes: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
    max_bucket: int = 256,
    verify: bool = True,
    drop_report: DropReport | None = None,
) -> rd.Dataset:
    """Near-dup pairs via banded MinHash LSH, exact-Jaccard verified.

    signature (actor pool) → per-band bucket keys → groupby(band,
    bucket) candidates → dedup pairs → verify with true shingle
    Jaccard (verify=False returns raw candidates)."""
    rows_per_band = num_hashes // bands
    # 16384-row signer batches: 4x fewer UDF dispatches amortize the
    # per-call setup (cache probe, factorize, batch plumbing) — the
    # sig+sort component measured 18.0 -> 12.6 s on 1.2M docs in a
    # same-window A/B (output BLOCK counts are unchanged; Ray coalesces
    # task outputs to the target block size either way)
    # task pool: MinHasher's only state is the deterministic 2 KiB
    # permutation table — pickling it per task costs nothing, and the
    # signer-pool ramp (~30 process spawns per run) disappears
    sig = ds.map_batches(
        MinHasher(num_hashes=num_hashes, shingle_n=shingle_n),
        batch_format="pyarrow",
        batch_size=16384,
    )

    def band_rows(batch: pa.Table) -> pa.Table:
        col = batch.column("sig")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # zero-copy flat view of the fixed-size-list signatures
        sigs = col.flatten().to_numpy(zero_copy_only=False).reshape(
            batch.num_rows, -1
        ).astype(np.uint64, copy=False)
        doc = batch.column("doc_id").to_numpy()
        if sigs.size == 0:
            return pa.table({"bucket": pa.array([], type=pa.int64()),
                             "doc_id": pa.array([], type=pa.int64())})
        out_doc = np.tile(doc, bands)
        buckets = np.empty(bands * doc.size, dtype=np.uint64)
        for bi in range(bands):
            seg = sigs[:, bi * rows_per_band : (bi + 1) * rows_per_band]
            # mix the band rows into one bucket key (vectorized
            # FNV-ish), SEEDED with the band index — the hash itself
            # carries band identity, so the exchange ships one 8 B key
            # instead of (band, bucket, bkey); cross-band 64-bit
            # collisions only ADD candidates (verified downstream) at
            # ~2^-64 probability
            acc = np.full(doc.size, np.uint64(bi + 1), dtype=np.uint64)
            for c in range(seg.shape[1]):
                acc = acc * np.uint64(1099511628211) + seg[:, c]
            buckets[bi * doc.size : (bi + 1) * doc.size] = acc
        return pa.table(
            {
                # int64 view (bijective): see _shingle_rows
                "bucket": pa.array(buckets.view(np.int64), type=pa.int64()),
                "doc_id": pa.array(out_doc, type=pa.int64()),
            }
        )

    cands = _distinct_pairs(
        bucket_pairs(
            sig.map_batches(band_rows, batch_format="pyarrow"),
            ["bucket"],
            max_bucket,
            drop_report.handle if drop_report else None,
            prehashed=True,
        )
    )
    cands = cands.materialize()
    if cands.count() == 0:
        return rd.from_arrow(
            (_PAIR_SCHEMA if not verify
             else _PAIR_SCHEMA.append(pa.field("jaccard", pa.float64()))
             ).empty_table()
        )
    if not verify:
        return cands

    # exact-Jaccard verify stays distributed: hash-join each pair side
    # back to the corpus text (candidate pairs ≪ corpus; no driver-side
    # text table, no full-corpus broadcast)
    corpus = _semi_join_filter(ds.select_columns(["doc_id", "text"]), cands)

    joined = _broadcast_attach(cands, corpus, "text", "text_a", "text_b")
    if joined is None:  # candidate set too large to broadcast: hash joins

        def rename(key: str, val: str):
            def f(b: pa.Table) -> pa.Table:
                return pa.table({key: b.column("doc_id"), val: b.column("text")})

            return f

        p = _join_partitions()
        joined = cands.join(
            corpus.map_batches(rename("a", "text_a"), batch_format="pyarrow"),
            join_type="inner", num_partitions=p, on=("a",),
        ).join(
            corpus.map_batches(rename("b", "text_b"), batch_format="pyarrow"),
            join_type="inner", num_partitions=p, on=("b",),
        )

    def verify_pairs(b: pa.Table) -> pa.Table:
        """Exact-Jaccard filter, one shingle pass per DISTINCT text in
        the batch (heavy near-dup clusters repeat the same text across
        many pairs), set ops as sorted-unique uint64 intersections —
        no per-pair Python string sets.  Hash-set Jaccard ≡ string-set
        Jaccard up to 64-bit collisions (the ngram path's oracle-pinned
        semantics)."""
        m = b.num_rows
        if m == 0:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             "jaccard": pa.array([], type=pa.float64())})
        ta = b.column("text_a").to_pylist()
        tb = b.column("text_b").to_pylist()
        inv, uniq = pd.factorize(np.asarray(ta + tb, dtype=object), sort=False)
        _, hh, n_sh = shingle_hashes(list(uniq), shingle_n)
        off = np.concatenate(([0], np.cumsum(n_sh)))
        ia, ib = inv[:m], inv[m:]
        jac = np.empty(m, dtype=np.float64)
        for i in range(m):
            A = hh[off[ia[i]] : off[ia[i] + 1]]
            B = hh[off[ib[i]] : off[ib[i] + 1]]
            inter = np.intersect1d(A, B, assume_unique=True).size
            u = A.size + B.size - inter
            jac[i] = (inter / u) if u else 1.0
        keep = jac >= threshold
        return pa.table(
            {
                "a": pa.array(b.column("a").to_numpy()[keep], type=pa.int64()),
                "b": pa.array(b.column("b").to_numpy()[keep], type=pa.int64()),
                "jaccard": pa.array(jac[keep], type=pa.float64()),
            }
        )

    return joined.map_batches(verify_pairs, batch_format="pyarrow")


# -- SimHash -----------------------------------------------------------

_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)

def simhash64_batch(texts: list[str], cache: _Md5Cache | None = None) -> np.ndarray:
    """Occurrence-weighted 64-bit simhash per text, batched: ONE md5
    pass over the DISTINCT tokens of the dictionary-encoded flat token
    stream (the md5 bit pattern is pinned by the bit-replicating DuckDB
    oracle; ``cache`` — held per actor by :class:`SimhashSigner` —
    carries distinct-token hashes across batches), then one segmented
    reduceat per bit plane — no per-doc (tokens × 64) matrix, no
    per-doc Python loop."""
    codes, uniq, lens = _token_codes(texts)
    m = len(texts)
    out = np.zeros(m, dtype=np.uint64)
    if not codes.size:
        return out
    hu = cache.lookup(uniq) if cache is not None else md5_u64(list(uniq))
    h = hu[codes]
    off = np.concatenate(([0], np.cumsum(lens)))
    nz = np.flatnonzero(lens > 0)
    starts = off[nz]
    one = np.uint64(1)
    for i in range(64):
        # sum over a doc's tokens of (2·bit − 1) = 2·popcount − len
        bit = ((h >> np.uint64(i)) & one).view(np.int64)
        v = 2 * np.add.reduceat(bit, starts) - lens[nz]
        out[nz] |= (v > 0).astype(np.uint64) << np.uint64(i)
    return out


def simhash64(text: str) -> int:
    return int(simhash64_batch([text])[0])


_PROC_MD5_CACHE: _Md5Cache | None = None


class SimhashSigner:
    """Actor-pool signer stage: text → 4 (band-key, simhash) rows.

    The distinct-token md5 cache lives at worker-PROCESS level (a
    module global), so it persists across batches AND across runs —
    md5(token) never goes stale — and the stage can run as a plain
    TASK pool: no per-run signer-pool ramp, and the callable instance
    pickles empty (an instance-held cache would ship its whole
    contents with every task)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        global _PROC_MD5_CACHE
        if _PROC_MD5_CACHE is None:
            _PROC_MD5_CACHE = _Md5Cache()
        doc = batch.column("doc_id").to_numpy()
        sh = simhash64_batch(batch.column("text").to_pylist(), _PROC_MD5_CACHE)
        bandv = np.stack(
            [(sh >> np.uint64(16 * i)) & np.uint64(0xFFFF) for i in range(4)], axis=1
        )
        # one prehashed bucket key = uniform hash of (band, 16-bit
        # value): the exchange ships (doc, sim, key) instead of
        # (doc, sim, band, bucket, bkey).  A cross-(band,value) 64-bit
        # collision merely merges two candidate buckets — the exact
        # Hamming filter downstream rejects any false pair.
        mix = (
            np.repeat(np.arange(4, dtype=np.uint64), doc.size).reshape(4, -1).T
            * np.uint64(1 << 16)
            + bandv
        ).ravel()
        key = pd.util.hash_array(mix, categorize=False)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(doc, 4), type=pa.int64()),
                "sim": pa.array(np.repeat(sh, 4), type=pa.uint64()),
                "bucket": pa.array(key.view(np.int64), type=pa.int64()),
            }
        )


def simhash_pairs(
    ds: rd.Dataset,
    hamming_max: int = 3,
    max_bucket: int = 512,
    drop_report: DropReport | None = None,
) -> rd.Dataset:
    """Near-dup pairs with simhash Hamming distance <= hamming_max,
    blocked on 4 16-bit bands (any pair within distance 3 shares at
    least one exact band — pigeonhole).  ``drop_report`` surfaces
    over-cap buckets (no silent caps)."""
    drop_handle = drop_report.handle if drop_report else None

    _empty = pa.table({"a": pa.array([], type=pa.int64()),
                       "b": pa.array([], type=pa.int64()),
                       "hamming": pa.array([], type=pa.int64())})

    def sim_pairs_block(tbl: pa.Table) -> pa.Table:
        """All buckets of the sorted partition in one invocation, fully
        vectorized, with the popcount collapsed to DISTINCT-simhash
        pairs: template-heavy buckets hold many docs sharing one
        simhash, so Hamming is computed once per (sim_i, sim_j) group
        pair — (ℓ/u)² less gather/XOR work for a bucket of ℓ docs with
        u distinct sims (measured 219 core-s → ~8 core-s on the 1.2M
        synthetic corpus, identical output) — and the surviving group
        pairs expand to member pairs afterward (within-group pairs are
        Hamming 0 by construction)."""
        if tbl.num_rows == 0:
            return _empty
        order, starts, ends = _bucket_runs(tbl, ["bucket"])
        doc = tbl.column("doc_id").to_numpy()[order]
        sim = tbl.column("sim").to_numpy()[order]
        n = doc.size
        first_in_run = np.zeros(n, dtype=bool)
        first_in_run[starts] = True
        keep_row = first_in_run.copy()
        keep_row[1:] |= doc[1:] != doc[:-1]  # doc-sorted within run
        doc2, sim2 = doc[keep_row], sim[keep_row]
        rid2 = (np.cumsum(first_in_run) - 1)[keep_row]
        L = np.bincount(rid2, minlength=starts.size)
        over = L > max_bucket
        ok = (L >= 2) & ~over
        if over.any() and drop_handle is not None:
            import ray

            ray.get(drop_handle.add_many.remote([int(x) for x in L[over]]))
        if not ok.any():
            return _empty
        row_ok = ok[rid2]
        doc3, sim3, rid3 = doc2[row_ok], sim2[row_ok], rid2[row_ok]
        # (run, sim) groups contiguous; docs ascending within a group
        o3 = np.lexsort((doc3, sim3, rid3))
        doc3, sim3, rid3 = doc3[o3], sim3[o3], rid3[o3]
        g_first = np.concatenate(
            ([True], (rid3[1:] != rid3[:-1]) | (sim3[1:] != sim3[:-1]))
        ) if rid3.size else np.empty(0, bool)
        g_start = np.flatnonzero(g_first)
        g_size = np.diff(np.concatenate((g_start, [doc3.size])))
        g_run = rid3[g_start]
        g_sim = sim3[g_start]
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_h: list[np.ndarray] = []
        # (1) within-group member pairs: identical simhash → Hamming 0
        dup = g_size >= 2
        if dup.any():
            for l in np.unique(g_size[dup]):
                gs = g_start[dup & (g_size == l)]
                ai, bi = np.triu_indices(int(l), k=1)
                ia = (gs[:, None] + ai[None, :]).ravel()
                ib = (gs[:, None] + bi[None, :]).ravel()
                out_a.append(doc3[ia])
                out_b.append(doc3[ib])
                out_h.append(np.zeros(ia.size, dtype=np.int64))
        # (2) cross-group pairs within a run: ONE popcount per distinct
        # (sim_i, sim_j), then expand survivors to member pairs
        Lg = np.bincount(g_run, minlength=starts.size)
        goff = np.concatenate(([0], np.cumsum(Lg)))
        okg = Lg >= 2
        if okg.any():
            gidx_a, gidx_b = [], []
            for l in np.unique(Lg[okg]):
                runs_l = goff[:-1][okg & (Lg == l)]
                ai, bi = np.triu_indices(int(l), k=1)
                gidx_a.append((runs_l[:, None] + ai[None, :]).ravel())
                gidx_b.append((runs_l[:, None] + bi[None, :]).ravel())
            ga = np.concatenate(gidx_a)
            gb = np.concatenate(gidx_b)
            x = g_sim[ga] ^ g_sim[gb]
            # byte-LUT popcount: 8 gathers per DISTINCT-sim pair
            ham_g = (
                _POPCOUNT8[x.view(np.uint8)]
                .reshape(-1, 8)
                .sum(axis=1)
                .astype(np.int64)
            )
            keep_g = ham_g <= hamming_max
            ga, gb, ham_g = ga[keep_g], gb[keep_g], ham_g[keep_g]
            if ga.size:
                na, nb = g_size[ga], g_size[gb]
                tot = na * nb
                poff = np.concatenate(([0], np.cumsum(tot)))
                pair_of = np.repeat(np.arange(ga.size), tot)
                pos = np.arange(int(poff[-1])) - poff[pair_of]
                nb_rep = nb[pair_of]
                i = pos // nb_rep
                j = pos - i * nb_rep
                av = doc3[g_start[ga][pair_of] + i]
                bv = doc3[g_start[gb][pair_of] + j]
                # groups sort by sim, not doc — restore the canonical
                # (a < b) orientation the reducers and oracle key on
                out_a.append(np.minimum(av, bv))
                out_b.append(np.maximum(av, bv))
                out_h.append(ham_g[pair_of])
        if not out_a:
            return _empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a), type=pa.int64()),
                "b": pa.array(np.concatenate(out_b), type=pa.int64()),
                "hamming": pa.array(np.concatenate(out_h), type=pa.int64()),
            }
        )

    return _nonempty_or(
        _distinct_pairs(
            _bucket_sorted(
                ds.map_batches(
                    # task pool (pickled instance): the md5 cache is a
                    # worker-process global, so no actor ramp is paid
                    SimhashSigner(),
                    batch_format="pyarrow",
                    batch_size=16384,
                ),
                ["bucket"],
                prehashed=True,
            ).map_batches(sim_pairs_block, batch_format="pyarrow", batch_size=None),
            keep="hamming",
        ),
        _PAIR_SCHEMA.append(pa.field("hamming", pa.int64())),
    )
