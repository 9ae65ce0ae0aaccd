"""Deduplication operators over a (doc_id, text) corpus.

Not present in the reference (SURVEY.md §2.4: "no near-dedup anywhere"),
but first-class for a training-data pipeline at 10^12-turn scale.  All
operators are Ray-Data-native:

- exact:    content hash → per-batch combiner → groupby(hash) min doc —
            the canonical hash-partition + per-group-first.
- ngram:    word n-gram shingles → inverted shingle index (groupby) →
            candidate pairs from co-occurrence → exact Jaccard.
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
import ray.data as rd
from ray.data.aggregate import Count, Min

from ..functions.tokenizer import TOKEN_RE


def _join_partitions() -> int:
    """Hash-join width: one partition per CPU (tiny pair/size tables
    relative to the corpus; the join is never the wide stage here)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, cpus)


def _stabilize(ds: rd.Dataset) -> rd.Dataset:
    """groupby().aggregate() can emit schema-less EMPTY blocks that the
    hash join's Arrow kernel rejects; map_batches is skipped on empty
    blocks so a UDF cannot fix them.  A repartition merges them into
    schema-bearing blocks (tiny pair/size tables — cheap)."""
    return ds.repartition(_join_partitions())


def _distinct_pairs(pairs: rd.Dataset, keep: str | None = None) -> rd.Dataset:
    """Distinct (a, b) via a vectorized groupby-aggregate — one sort
    shuffle, no per-group Python lambdas.  ``keep``: a column whose
    per-pair Min should survive (identical across duplicates here)."""
    if keep is None:
        return _stabilize(
            pairs.groupby(["a", "b"])
            .aggregate(Count(alias_name="_n"))
            .select_columns(["a", "b"])
        )
    return _stabilize(
        pairs.groupby(["a", "b"]).aggregate(Min(keep, alias_name=keep))
    )

# -- deterministic vectorized hashing ---------------------------------

def md5_u64(strings: Iterable[str], seed: int = 0) -> np.ndarray:
    """First 8 bytes of md5(seed || s) as uint64, per string."""
    out = np.empty(len(strings) if hasattr(strings, "__len__") else 0, dtype=np.uint64)
    pre = str(seed).encode() + b"\x00"
    for i, s in enumerate(strings):
        out[i] = int.from_bytes(hashlib.md5(pre + s.encode()).digest()[:8], "little")
    return out


def _tokens(text: str) -> list[str]:
    return TOKEN_RE.findall(text.lower())


def shingles(text: str, n: int = 3) -> set[str]:
    t = _tokens(text)
    if len(t) < n:
        return {" ".join(t)} if t else set()
    return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}


# -- exact dedup -------------------------------------------------------

def exact_dedup(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """Surviving doc per distinct text: (hash-partition + per-group
    first).  The per-batch combiner collapses duplicates before the
    shuffle so the groupby moves one row per distinct text per block."""

    def combine(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "h": md5_u64(batch.column(text_col).to_pylist()),
                id_col: batch.column(id_col).to_numpy(),
            }
        )
        g = df.groupby("h", sort=False)[id_col].min().reset_index()
        return pa.table({"h": pa.array(g["h"], type=pa.uint64()),
                         id_col: pa.array(g[id_col], type=pa.int64())})

    return (
        ds.map_batches(combine, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min(id_col, alias_name=id_col))
        .select_columns([id_col])
    )


# -- n-gram Jaccard near-dup ------------------------------------------

def _shingle_rows(batch: pa.Table, n: int) -> pa.Table:
    ids: list[int] = []
    shs: list[str] = []
    sizes: list[int] = []
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        s = shingles(text, n)
        ids.extend([doc_id] * len(s))
        shs.extend(s)
        sizes.extend([len(s)] * len(s))
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "sh": pa.array(md5_u64(shs), type=pa.uint64()),
            "n_sh": pa.array(sizes, type=pa.int64()),
        }
    )


def make_pairs_from_group(max_bucket: int):
    def pairs_from_group(tbl: pa.Table) -> pa.Table:
        doc = np.unique(tbl.column("doc_id").to_numpy())
        if doc.size < 2 or doc.size > max_bucket:
            return pa.table(
                {"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())}
            )
        ai, bi = np.triu_indices(doc.size, k=1)
        return pa.table({"a": pa.array(doc[ai]), "b": pa.array(doc[bi])})

    return pairs_from_group


def ngram_jaccard_pairs(
    ds: rd.Dataset,
    threshold: float = 0.8,
    n: int = 3,
    max_bucket: int = 256,
) -> rd.Dataset:
    """Pairs (a < b) with Jaccard(n-gram shingle sets) >= threshold.

    shingle → groupby(shingle) candidate pairs → groupby(pair) count =
    |A∩B|; |A∪B| recovered by hash-joining the per-doc shingle-count
    table back onto the pairs (both sides stay distributed — no
    driver-side size map)."""
    sh = ds.map_batches(lambda b: _shingle_rows(b, n), batch_format="pyarrow")
    sizes = _stabilize(sh.groupby("doc_id").aggregate(Min("n_sh", alias_name="n_sh")))

    pairs = sh.groupby("sh").map_groups(
        make_pairs_from_group(max_bucket), batch_format="pyarrow"
    )
    # co-occurrence count per pair = |A∩B| (vectorized aggregate)
    inter = _stabilize(pairs.groupby(["a", "b"]).aggregate(Count(alias_name="inter")))

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

    Permutations are odd-multiplier multiply-add hashes over the md5
    base hash (wrap-around mod 2^64 — the standard multiply-shift
    family); a/b derive from a seeded RNG in __init__ (once per actor,
    identical across actors → identical signatures everywhere)."""

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

    def signature(self, text: str) -> np.ndarray:
        s = list(shingles(text, self.n))
        if not s:
            return np.full(self.k, np.iinfo(np.uint64).max, dtype=np.uint64)
        base = md5_u64(s)  # (m,)
        with np.errstate(over="ignore"):
            h = np.outer(base, self.a) + self.b  # (m, k), wraps mod 2^64
        return h.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        sigs = np.stack([self.signature(t) for t in texts]) if texts else np.empty((0, self.k), np.uint64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "sig": pa.array(list(sigs), type=pa.list_(pa.uint64(), self.k)),
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
) -> rd.Dataset:
    """Near-dup pairs via banded MinHash LSH, exact-Jaccard verified.

    signature (actor pool) → per-band bucket keys → groupby(band,
    bucket) candidates → dedup pairs → verify with true shingle
    Jaccard (verify=False returns raw candidates)."""
    rows_per_band = num_hashes // bands
    sig = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_hashes": num_hashes, "shingle_n": shingle_n},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def band_rows(batch: pa.Table) -> pa.Table:
        sigs = np.asarray(batch.column("sig").to_pylist(), dtype=np.uint64)
        doc = batch.column("doc_id").to_numpy()
        if sigs.size == 0:
            return pa.table({"band": pa.array([], type=pa.int32()),
                             "bucket": pa.array([], type=pa.uint64()),
                             "doc_id": pa.array([], type=pa.int64())})
        out_band = np.repeat(np.arange(bands, dtype=np.int32), doc.size)
        out_doc = np.tile(doc, bands)
        buckets = np.empty(bands * doc.size, dtype=np.uint64)
        for bi in range(bands):
            seg = sigs[:, bi * rows_per_band : (bi + 1) * rows_per_band]
            # mix the band rows into one bucket key (vectorized FNV-ish)
            acc = np.zeros(doc.size, dtype=np.uint64)
            for c in range(seg.shape[1]):
                acc = acc * np.uint64(1099511628211) + seg[:, c]
            buckets[bi * doc.size : (bi + 1) * doc.size] = acc
        return pa.table(
            {
                "band": pa.array(out_band),
                "bucket": pa.array(buckets),
                "doc_id": pa.array(out_doc, type=pa.int64()),
            }
        )

    cands = _distinct_pairs(
        sig.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band", "bucket"])
        .map_groups(make_pairs_from_group(max_bucket), batch_format="pyarrow")
    )
    if not verify:
        return cands

    # exact-Jaccard verify stays distributed: hash-join each pair side
    # back to the corpus text (candidate pairs ≪ corpus; no driver-side
    # text table, no full-corpus broadcast)
    corpus = ds.select_columns(["doc_id", "text"])

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
        out = []
        for a, bb, ta, tb in zip(
            b.column("a").to_pylist(), b.column("b").to_pylist(),
            b.column("text_a").to_pylist(), b.column("text_b").to_pylist(),
        ):
            sa, sb = shingles(ta, shingle_n), shingles(tb, shingle_n)
            u = len(sa | sb)
            j = (len(sa & sb) / u) if u else 1.0
            if j >= threshold:
                out.append((a, bb, j))
        return pa.table(
            {
                "a": pa.array([x[0] for x in out], type=pa.int64()),
                "b": pa.array([x[1] for x in out], type=pa.int64()),
                "jaccard": pa.array([x[2] for x in out], type=pa.float64()),
            }
        )

    return joined.map_batches(verify_pairs, batch_format="pyarrow")


# -- SimHash -----------------------------------------------------------

def simhash64(text: str) -> int:
    toks = _tokens(text)
    if not toks:
        return 0
    h = md5_u64(toks)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def simhash_pairs(
    ds: rd.Dataset, hamming_max: int = 3, max_bucket: int = 512
) -> rd.Dataset:
    """Near-dup pairs with simhash Hamming distance <= hamming_max,
    blocked on 4 16-bit bands (any pair within distance 3 shares at
    least one exact band — pigeonhole)."""

    def sim_rows(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id").to_numpy()
        sh = np.array(
            [simhash64(t) for t in batch.column("text").to_pylist()], dtype=np.uint64
        )
        bandv = np.stack(
            [(sh >> np.uint64(16 * i)) & np.uint64(0xFFFF) for i in range(4)], axis=1
        )
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(doc, 4), type=pa.int64()),
                "sim": pa.array(np.repeat(sh, 4), type=pa.uint64()),
                "band": pa.array(np.tile(np.arange(4, dtype=np.int32), doc.size)),
                "bucket": pa.array(bandv.ravel(), type=pa.uint64()),
            }
        )

    def pairs_with_sim(tbl: pa.Table) -> pa.Table:
        df = (
            tbl.select(["doc_id", "sim"])
            .to_pandas()
            .drop_duplicates("doc_id")
            .sort_values("doc_id")
        )
        doc = df["doc_id"].to_numpy()
        sim = df["sim"].to_numpy(dtype=np.uint64)
        if doc.size < 2 or doc.size > max_bucket:
            return pa.table({"a": pa.array([], type=pa.int64()),
                             "b": pa.array([], type=pa.int64()),
                             "hamming": pa.array([], type=pa.int64())})
        ai, bi = np.triu_indices(doc.size, k=1)
        x = sim[ai] ^ sim[bi]
        ham = np.zeros(x.size, dtype=np.int64)
        for i in range(64):
            ham += ((x >> np.uint64(i)) & np.uint64(1)).astype(np.int64)
        keep = ham <= hamming_max
        return pa.table(
            {
                "a": pa.array(doc[ai][keep]),
                "b": pa.array(doc[bi][keep]),
                "hamming": pa.array(ham[keep]),
            }
        )

    return _distinct_pairs(
        ds.map_batches(sim_rows, batch_format="pyarrow")
        .groupby(["band", "bucket"])
        .map_groups(pairs_with_sim, batch_format="pyarrow"),
        keep="hamming",
    )
