"""Embedding similarity: brute-force cosine top-k (the exact baseline),
an IVF-bucketed approximate variant (the scale path), and
threshold-based near-duplicate pairs.

Design (SURVEY-external; training-data extension):
- The query matrix is tiny → ``ray.put`` once, every task reads it
  zero-copy; per-batch scoring is one numpy matmul (vectorized).
- Exact top-k = per-batch partial top-k → driver merge (same
  scatter/gather shape as the BM25 query engine).
- IVF = k-means-lite coarse centroids (sampled fit, deterministic) →
  assign each vector to its nearest centroid inside ``map_batches`` →
  search only the ``nprobe`` closest centroids' buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _row_norms(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return n


def _cosine_matrix(m: np.ndarray, q: np.ndarray) -> np.ndarray:
    """cos(m_i, q_j) as dot/(|m_i|·|q_j|), all float64 — the exact
    association DuckDB's list_cosine_similarity uses on DOUBLE[] input,
    so scores are bit-identical to the SQL oracle."""
    return (m @ q.T) / (_row_norms(m)[:, None] * _row_norms(q)[None, :])


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    # float64 throughout: float32 matmuls diverge from the float64 SQL
    # oracle in the 7th decimal, flipping 6-decimal rounded scores.
    #
    # Zero-copy fast path: fixed-dimension embeddings stored as
    # list<double>/fixed_size_list<double> expose their flat values
    # buffer directly — reshape it (n, d) with no per-element Python
    # conversion.  Requires dense offsets (no nulls, uniform length);
    # anything else falls back to the python materialization.
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n and arr.null_count == 0:
        if pa.types.is_fixed_size_list(arr.type):
            d = arr.type.list_size
            flat = arr.values
            if flat.null_count == 0:
                m = flat.to_numpy(zero_copy_only=True).reshape(n, d)
                return m if m.dtype == np.float64 else m.astype(np.float64)
        elif pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
            off = arr.offsets.to_numpy(zero_copy_only=True)
            widths = np.diff(off)
            if widths.size and (widths == widths[0]).all():
                d = int(widths[0])
                flat = arr.values
                if flat.null_count == 0:
                    vals = flat.to_numpy(zero_copy_only=True)
                    # the list's window into the values buffer may be
                    # offset (sliced arrays): index from the first offset
                    m = vals[int(off[0]) : int(off[0]) + n * d].reshape(n, d)
                    return m if m.dtype == np.float64 else m.astype(np.float64)
    return np.asarray(arr.to_pylist(), dtype=np.float64)


def cosine_topk(
    ds: rd.Dataset,
    query_vecs: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Exact top-k by cosine for each query vector.

    Returns (qi, vec_id, rank, score); deterministic ties broken by
    vec_id asc on the 6-decimal-rounded score."""
    q = np.asarray(query_vecs, dtype=np.float64)
    q_ref = ray.put(q)

    def partial(batch: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        m = _batch_matrix(batch, vec_col)
        ids = batch.column(id_col).to_numpy()
        sims = _cosine_matrix(m, qm)  # (rows, Q)
        rows = min(k, ids.size)
        out_qi, out_id, out_s = [], [], []
        for qi in range(qm.shape[0]):
            s = sims[:, qi]
            part = np.argpartition(-s, rows - 1)[:rows] if ids.size > rows else np.arange(ids.size)
            out_qi.append(np.full(part.size, qi, dtype=np.int32))
            out_id.append(ids[part])
            out_s.append(s[part].astype(np.float64))
        return pa.table(
            {
                "qi": pa.array(np.concatenate(out_qi)),
                "vec_id": pa.array(np.concatenate(out_id), type=pa.int64()),
                "score": pa.array(np.concatenate(out_s)),
            }
        )

    parts = []
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        parts.append(b)
    tbl = pa.concat_tables(parts) if parts else pa.table(
        {"qi": pa.array([], pa.int32()), "vec_id": pa.array([], pa.int64()),
         "score": pa.array([], pa.float64())}
    )
    qi = tbl.column("qi").to_numpy()
    vid = tbl.column("vec_id").to_numpy()
    sc = np.round(tbl.column("score").to_numpy(), 6)
    order = np.lexsort((vid, -sc, qi))
    qi, vid, sc = qi[order], vid[order], sc[order]
    keep_qi, keep_id, keep_rank, keep_s = [], [], [], []
    for q_idx in np.unique(qi):
        m = qi == q_idx
        d, s = vid[m][:k], sc[m][:k]
        keep_qi.extend([int(q_idx)] * d.size)
        keep_id.append(d)
        keep_rank.append(np.arange(1, d.size + 1, dtype=np.int64))
        keep_s.append(s)
    return pa.table(
        {
            "qi": pa.array(keep_qi, type=pa.int64()),
            "vec_id": pa.array(np.concatenate(keep_id) if keep_id else [], type=pa.int64()),
            "rank": pa.array(np.concatenate(keep_rank) if keep_rank else [], type=pa.int64()),
            "score": pa.array(np.concatenate(keep_s) if keep_s else [], type=pa.float64()),
        }
    )


def fit_centroids(
    ds: rd.Dataset, n_centroids: int = 16, sample: int = 4096,
    iters: int = 8, seed: int = 3, vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic k-means-lite on a driver-side sample (the classic
    IVF coarse quantizer fit: sample fits in memory at any corpus scale
    because it is a fixed-size sample)."""
    samp = ds.limit(sample).to_pandas()
    m = _normalize(np.asarray(list(samp[vec_col]), dtype=np.float64))
    rng = np.random.RandomState(seed)
    c = m[rng.choice(m.shape[0], size=min(n_centroids, m.shape[0]), replace=False)]
    for _ in range(iters):
        assign = (m @ c.T).argmax(axis=1)
        for j in range(c.shape[0]):
            mask = assign == j
            if mask.any():
                c[j] = m[mask].mean(axis=0)
        c = _normalize(c)
    return c


IVF_CENTROIDS = "centroids.npy"
IVF_BUCKETS = "buckets"


def ivf_build(
    ds: rd.Dataset,
    index_dir: str,
    n_centroids: int = 16,
    sample: int = 4096,
    iters: int = 8,
    seed: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Materialize an IVF index: assign every vector to its nearest
    coarse centroid ONCE and write bucket-partitioned parquet
    (``buckets/bucket=K/``).  Queries then read only the probed
    buckets' partitions — assignment is a build cost, not a per-query
    scan (mirrors the BM25 group/segment design).  Returns centroids."""
    import os

    cents = fit_centroids(
        ds, n_centroids=n_centroids, sample=sample, iters=iters, seed=seed,
        vec_col=vec_col,
    )
    c_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        m = _normalize(_batch_matrix(batch, vec_col))
        b = (m @ ray.get(c_ref).T).argmax(axis=1).astype(np.int64)
        # "bucket" becomes the partition directory; "bkt" stays in the
        # row data so probed reads need no hive-partition inference
        return batch.append_column(
            "bucket", pa.array(b, type=pa.int64())
        ).append_column("bkt", pa.array(b, type=pa.int64()))

    os.makedirs(index_dir, exist_ok=True)
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, IVF_BUCKETS), partition_cols=["bucket"]
    )
    np.save(os.path.join(index_dir, IVF_CENTROIDS), cents)
    return cents


def ivf_probed_dataset(
    index_dir: str, probed: list[int]
) -> rd.Dataset:
    """Dataset over ONLY the probed buckets' partitions (directory-level
    pruning: unprobed buckets are never listed, read, or decoded)."""
    import os

    import glob

    paths = [
        f
        for b in sorted(probed)
        for f in sorted(
            glob.glob(
                os.path.join(index_dir, IVF_BUCKETS, f"bucket={b}", "*.parquet")
            )
        )
    ]
    return rd.read_parquet(paths) if paths else rd.from_items([])


def ivf_search(
    index_dir: str,
    query_vecs: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pa.Table:
    """Approximate cosine top-k over a built IVF index: score each query
    against only its nprobe nearest buckets.  Output schema matches
    cosine_topk."""
    import os

    cents = np.load(os.path.join(index_dir, IVF_CENTROIDS))
    q = np.asarray(query_vecs, dtype=np.float64)
    qn = _normalize(q)
    probes = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    probed = sorted(set(int(b) for b in probes.ravel()))
    ds = ivf_probed_dataset(index_dir, probed)
    q_ref = ray.put((q, probes))

    def partial(batch: pa.Table) -> pa.Table:
        qm, pr = ray.get(q_ref)
        m = _batch_matrix(batch, vec_col)
        mnorm = _row_norms(m)
        qnorm = _row_norms(qm)
        ids = batch.column(id_col).to_numpy()
        bucket = batch.column("bkt").to_numpy()
        out_qi, out_id, out_s = [], [], []
        for qi in range(qm.shape[0]):
            mask = np.isin(bucket, pr[qi])
            if not mask.any():
                continue
            # same dot/(|m|·|q|) float64 association as cosine_topk, so
            # a full probe (nprobe == n_centroids) is bit-identical to
            # the exact brute-force path / DuckDB oracle
            s = (m[mask] @ qm[qi]) / (mnorm[mask] * qnorm[qi])
            sub_ids = ids[mask]
            rows = min(k, sub_ids.size)
            part = (
                np.argpartition(-s, rows - 1)[:rows]
                if sub_ids.size > rows
                else np.arange(sub_ids.size)
            )
            out_qi.append(np.full(part.size, qi, dtype=np.int32))
            out_id.append(sub_ids[part])
            out_s.append(s[part].astype(np.float64))
        if not out_qi:
            return pa.table(
                {"qi": pa.array([], pa.int32()), "vec_id": pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "qi": pa.array(np.concatenate(out_qi)),
                "vec_id": pa.array(np.concatenate(out_id), type=pa.int64()),
                "score": pa.array(np.concatenate(out_s)),
            }
        )

    parts = [
        b
        for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    ]
    tbl = pa.concat_tables(parts) if parts else pa.table(
        {"qi": pa.array([], pa.int32()), "vec_id": pa.array([], pa.int64()),
         "score": pa.array([], pa.float64())}
    )
    df = tbl.to_pandas()
    df["score"] = df["score"].round(6)
    df = df.sort_values(["qi", "score", "vec_id"], ascending=[True, False, True])
    df = df.groupby("qi", sort=True).head(k).reset_index(drop=True)
    df["rank"] = df.groupby("qi").cumcount() + 1
    return pa.table(
        {
            "qi": pa.array(df["qi"].astype(np.int64)),
            "vec_id": pa.array(df["vec_id"], type=pa.int64()),
            "rank": pa.array(df["rank"].astype(np.int64)),
            "score": pa.array(df["score"], type=pa.float64()),
        }
    )


def ivf_topk(
    ds: rd.Dataset,
    query_vecs: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    index_dir: str | None = None,
) -> pa.Table:
    """Build-then-search convenience: materialize the IVF buckets (to
    ``index_dir`` or a fresh /tmp dir) and answer the queries.  Reuse
    ``ivf_build`` + ``ivf_search`` directly to amortize the build."""
    import tempfile

    if index_dir is None:
        index_dir = tempfile.mkdtemp(prefix="ivf_", dir="/tmp")
    import os

    if not os.path.exists(os.path.join(index_dir, IVF_CENTROIDS)):
        ivf_build(
            ds, index_dir, n_centroids=n_centroids,
            vec_col=vec_col, id_col=id_col,
        )
    return ivf_search(
        index_dir, query_vecs, k=k, nprobe=nprobe,
        vec_col=vec_col, id_col=id_col,
    )


_EMPTY_PAIRS = pa.table(
    {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
     "cosine": pa.array([], pa.float64())}
)


def cosine_pairs(
    ds: rd.Dataset,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Embedding near-duplicate pairs (a < b, cosine >= threshold),
    EXACT, via a block cross-product.

    The dataset is materialized once into the (distributed) object
    store; every task fetches two blocks zero-copy and emits its block
    pair's thresholded pairs — the driver holds only object refs, never
    vectors.  Exact all-pairs is inherently O(N²) flops; this is the
    oracle-matching exact path, and the minhash/simhash/IVF operators
    are the sub-quadratic approximate paths for corpus-scale near-dup."""
    refs = ds.select_columns([id_col, vec_col]).to_arrow_refs()
    nb = len(refs)
    if nb == 0:
        return rd.from_arrow(_EMPTY_PAIRS)
    tasks = [{"i": i, "j": j} for i in range(nb) for j in range(i, nb)]

    def f(batch: pa.Table) -> pa.Table:
        out = []
        for i, j in zip(batch.column("i").to_pylist(), batch.column("j").to_pylist()):
            ti = ray.get(refs[i])
            tj = ti if j == i else ray.get(refs[j])
            ids_a = ti.column(id_col).to_numpy()
            ids_b = tj.column(id_col).to_numpy()
            sims = _cosine_matrix(
                _batch_matrix(ti, vec_col), _batch_matrix(tj, vec_col)
            )
            if i == j:
                r, c = np.nonzero(np.triu(sims >= threshold, k=1))
            else:
                r, c = np.nonzero(sims >= threshold)
            if r.size == 0:
                continue
            a_ids, b_ids = ids_a[r], ids_b[c]
            lo = np.minimum(a_ids, b_ids)
            hi = np.maximum(a_ids, b_ids)
            out.append(
                pa.table(
                    {
                        "a": pa.array(lo, type=pa.int64()),
                        "b": pa.array(hi, type=pa.int64()),
                        "cosine": pa.array(
                            np.round(sims[r, c], 6), type=pa.float64()
                        ),
                    }
                )
            )
        return pa.concat_tables(out) if out else _EMPTY_PAIRS

    return rd.from_items(tasks).map_batches(f, batch_size=1, batch_format="pyarrow")


# -- Random-hyperplane LSH near-dup pairs --------------------------------

class HyperplaneSigner:
    """Stateful actor stage: embedding → per-band LSH bucket rows.

    Hyperplanes come from a seeded RNG in ``__init__`` (once per actor,
    identical across actors → identical signatures everywhere, the
    MinHasher pattern).  The whole batch is ONE (n × dim) @ (dim ×
    bands·bits) matmul; band bucket keys are a vectorized bit-pack —
    no per-row Python."""

    def __init__(
        self, dim: int, bands: int = 48, bits: int = 3, seed: int = 13,
        vec_col: str = "embedding", id_col: str = "vec_id",
    ):
        rng = np.random.RandomState(seed)
        self.h = rng.standard_normal((dim, bands * bits))
        self.bands, self.bits = bands, bits
        self.vec_col, self.id_col = vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy()
        if ids.size == 0:
            return pa.table({"bucket": pa.array([], type=pa.int64()),
                             "doc_id": pa.array([], type=pa.int64())})
        bits = (_batch_matrix(batch, self.vec_col) @ self.h) >= 0.0
        # pack each band's bits into one integer bucket key
        weights = (1 << np.arange(self.bits, dtype=np.uint64))
        per_band = bits.reshape(ids.size, self.bands, self.bits).astype(np.uint64)
        buckets = (per_band * weights[None, None, :]).sum(axis=2)  # (n, bands)
        # fold the band index into one prehashed uniform key (the
        # simhash/minhash exchange shape): ship (bucket, doc_id) only;
        # a cross-band 64-bit collision just merges candidate buckets
        # and the exact-cosine verify rejects any false pair
        mix = (
            buckets
            + np.arange(self.bands, dtype=np.uint64)[None, :]
            * np.uint64(1 << self.bits)
        ).reshape(-1)
        key = pd.util.hash_array(mix, categorize=False)
        return pa.table(
            {
                "bucket": pa.array(key.view(np.int64), type=pa.int64()),
                "doc_id": pa.array(np.repeat(ids, self.bands), type=pa.int64()),
            }
        )


def hyperplane_lsh_pairs(
    ds: rd.Dataset,
    threshold: float = 0.4,
    bands: int = 48,
    bits: int = 3,
    seed: int = 13,
    max_bucket: int = 1024,
    verify: bool = True,
    drop_report=None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> rd.Dataset:
    """Embedding near-dup pairs (a < b, exact cosine >= threshold) via
    random-hyperplane LSH — the sub-quadratic scale path that
    ``cosine_pairs`` (exact all-pairs O(N²)) is the oracle for.

    signature (actor pool, one matmul/batch) → groupby(band, bucket)
    candidates (per-bucket cap + drop reporting, the dedup machinery) →
    distributed exact-cosine verify join.  Output is EXACT with miss
    probability per qualifying pair (1 - p₁^bits)^bands where
    p₁ = 1 - arccos(threshold)/π (Goemans–Williamson):  at the
    defaults (τ=0.4 → p₁=0.631, 3-bit bands × 48) that is ≤ 1.0e-6 —
    negligible, so the DuckDB exact-pairs oracle value-hash-matches
    (the same argument as minhash_lsh_pairs' exact-Jaccard oracle).
    Tighter thresholds sharpen p₁ and allow wider bands: at τ=0.9,
    8-bit × 48 bands gives miss ≤ 2e-7 with 256-way buckets per band.

    At fixture scale low-τ LSH buckets are coarse (2^bits per band), so
    verify cost approaches all-pairs — the architecture, not this
    parameterization, is the 100-TB shape: real near-dup thresholds are
    high, buckets get selective, and over-cap clusters are counted via
    ``drop_report`` instead of silently skipped."""
    from .dedup import _distinct_pairs, _join_partitions, bucket_pairs

    if dim is None:
        first = ds.take_batch(1, batch_format="pyarrow")
        dim = len(first.column(vec_col)[0].as_py())

    # task pool: the signer's only state is the seeded hyperplane
    # matrix (dim × bands·bits floats) — pickled per task, no pool ramp
    rows = ds.map_batches(
        HyperplaneSigner(
            dim=dim, bands=bands, bits=bits, seed=seed,
            vec_col=vec_col, id_col=id_col,
        ),
        batch_format="pyarrow",
        batch_size=16384,
    )
    cands = _distinct_pairs(
        bucket_pairs(
            rows, ["bucket"], max_bucket,
            drop_report.handle if drop_report else None,
            prehashed=True,
        )
    ).materialize()
    if cands.count() == 0:
        return rd.from_arrow(_EMPTY_PAIRS)
    if not verify:
        return cands

    # exact-cosine verify stays distributed: hash-join each pair side
    # back to its embedding (candidates ≪ corpus; no driver-side table).
    # The Arrow hash join rejects list<float> payload columns, so each
    # side ships its vector as fixed-width float64 bytes instead.
    # Semi-join first: only candidate docs' vectors are considered, and
    # when that set is small enough (the common clean-corpus case) both
    # sides attach via ONE broadcast lookup instead of two hash joins.
    from .dedup import _broadcast_attach, _semi_join_filter

    def pack(b: pa.Table) -> pa.Table:
        m = np.ascontiguousarray(_batch_matrix(b, vec_col))
        packed = pa.Array.from_buffers(
            pa.binary(dim * 8), b.num_rows, [None, pa.py_buffer(m.tobytes())]
        )
        return pa.table({id_col: b.column(id_col), "embp": packed})

    emb = _semi_join_filter(
        ds.select_columns([id_col, vec_col]), cands, id_col
    ).map_batches(pack, batch_format="pyarrow")

    joined = _broadcast_attach(cands, emb, "embp", "emb_a", "emb_b", id_col=id_col)
    if joined is None:  # candidate set too large to broadcast: hash joins

        def rename(key: str, val: str):
            def f(b: pa.Table) -> pa.Table:
                return pa.table({key: b.column(id_col), val: b.column("embp")})

            return f

        p = _join_partitions()
        joined = cands.join(
            emb.map_batches(rename("a", "emb_a"), batch_format="pyarrow"),
            join_type="inner", num_partitions=p, on=("a",),
        ).join(
            emb.map_batches(rename("b", "emb_b"), batch_format="pyarrow"),
            join_type="inner", num_partitions=p, on=("b",),
        )

    def unpack(col: pa.ChunkedArray | pa.Array, n: int) -> np.ndarray:
        # fixed_size_binary data buffer IS the row-major float64 matrix
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        rows = np.frombuffer(col.buffers()[1], dtype=np.float64).reshape(-1, dim)
        return rows[col.offset : col.offset + n]

    def verify_pairs(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _EMPTY_PAIRS
        ea = unpack(b.column("emb_a"), b.num_rows)
        eb = unpack(b.column("emb_b"), b.num_rows)
        cos = (ea * eb).sum(axis=1) / (_row_norms(ea) * _row_norms(eb))
        keep = cos >= threshold
        return pa.table(
            {
                "a": pa.array(b.column("a").to_numpy()[keep], type=pa.int64()),
                "b": pa.array(b.column("b").to_numpy()[keep], type=pa.int64()),
                "cosine": pa.array(np.round(cos[keep], 6), type=pa.float64()),
            }
        )

    return joined.map_batches(verify_pairs, batch_format="pyarrow")


# -- distributed k-means clustering -------------------------------------

def embed_kmeans(
    ds: rd.Dataset,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Distributed spherical k-means over an embedding column:
    ``(vec_id, cluster)`` assignments after ``iters`` Lloyd updates.

    The clustering pass the dedup operators point their over-cap
    near-duplicate *clusters* at (pipelines/dedup.py skew note), and a
    principled coarse quantizer for IVF.  Deterministic and
    SQL-replicable end to end:

    - init: the ``k`` vectors with the smallest ids, cluster = id rank;
    - assignment: argmax cosine(v, centroid), ties to the lower
      cluster id (numpy argmax picks the first max — same rule as the
      oracle's ``ORDER BY sim DESC, c``);
    - update: per-dimension float64 MEAN of members — no
      normalization needed, cosine is scale-invariant in the centroid;
      a cluster losing all members keeps its previous centroid.

    Ray shape (per iteration): centroids broadcast once via
    ``ray.put``; ONE streaming ``map_batches`` pass emits per-block
    partial (cluster, count, sum) rows — k rows per block, the
    map-side combine — then a coalescing combine stage folds ~8k
    partial rows per task before the driver reduce, so the driver sees
    O(k × blocks/8k) rows, never O(k × blocks): at 10^6 input blocks
    the driver-side table stays thousands of rows.  The final pass
    streams assignments back as a Dataset."""
    # deterministic seeds: per-block partial min-k, tiny driver reduce
    def mink(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        if ids.size > k:
            sel = np.argpartition(ids, k)[:k]
            batch = batch.take(pa.array(sel))
        return batch.select([id_col, vec_col])

    # second mink pass with a large batch coalesces many blocks' k-row
    # partials, so the driver concat sees O(k × blocks/8k) rows — same
    # bounding as the per-iteration combine_partials below
    cand = pa.concat_tables(
        ds.map_batches(mink, batch_format="pyarrow")
        .map_batches(mink, batch_format="pyarrow", batch_size=8192)
        .iter_batches(batch_format="pyarrow")
    )
    order = np.argsort(cand.column(id_col).to_numpy(), kind="stable")[:k]
    cents = _batch_matrix(cand.take(pa.array(order)), vec_col)

    def _empty_partial(dim: int) -> pa.Table:
        # typed empty (cluster, count, sum): an untyped pa.array([])
        # for "sum" would be null-typed and break concat_tables schema
        # unification against real partials
        return pa.table(
            {
                "cluster": pa.array([], type=pa.int64()),
                "count": pa.array([], type=pa.int64()),
                "sum": pa.array([], type=pa.list_(pa.float64())),
            }
        )

    def make_psums(c_ref):
        def psums(batch: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            if batch.num_rows == 0:
                return _empty_partial(c.shape[1])
            m = _batch_matrix(batch, vec_col)
            a = _cosine_matrix(m, c).argmax(axis=1)
            sums = np.zeros((c.shape[0], m.shape[1]), dtype=np.float64)
            np.add.at(sums, a, m)
            counts = np.bincount(a, minlength=c.shape[0]).astype(np.int64)
            return pa.table(
                {
                    "cluster": pa.array(
                        np.arange(c.shape[0], dtype=np.int64)
                    ),
                    "count": pa.array(counts),
                    "sum": pa.array(list(sums)),
                }
            )

        return psums

    def combine_partials(batch: pa.Table) -> pa.Table:
        # fold many blocks' k-row partials into one k-row partial
        # (same schema in and out — composable at any depth)
        cl = batch.column("cluster").to_numpy()
        if cl.size == 0:
            return _empty_partial(0)
        cnt = batch.column("count").to_numpy()
        sm = np.asarray(batch.column("sum").to_pylist(), dtype=np.float64)
        kk = int(cl.max()) + 1
        tot = np.zeros((kk, sm.shape[1] if sm.size else 0), dtype=np.float64)
        np.add.at(tot, cl, sm)
        n = np.zeros(kk, dtype=np.int64)
        np.add.at(n, cl, cnt)
        return pa.table(
            {
                "cluster": pa.array(np.arange(kk, dtype=np.int64)),
                "count": pa.array(n),
                "sum": pa.array(list(tot)),
            }
        )

    for _ in range(iters):
        c_ref = ray.put(cents)
        parts = pa.concat_tables(
            ds.map_batches(make_psums(c_ref), batch_format="pyarrow")
            .map_batches(
                combine_partials, batch_format="pyarrow", batch_size=8192
            )
            .iter_batches(batch_format="pyarrow")
        )
        cl = parts.column("cluster").to_numpy()
        cnt = parts.column("count").to_numpy()
        sm = np.asarray(parts.column("sum").to_pylist(), dtype=np.float64)
        tot = np.zeros_like(cents)
        np.add.at(tot, cl, sm)
        n = np.zeros(cents.shape[0], dtype=np.int64)
        np.add.at(n, cl, cnt)
        nz = n > 0
        cents = np.where(nz[:, None], tot / np.maximum(n, 1)[:, None], cents)

    c_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    "cluster": pa.array([], type=pa.int64()),
                }
            )
        m = _batch_matrix(batch, vec_col)
        a = _cosine_matrix(m, c).argmax(axis=1).astype(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "cluster": pa.array(a, type=pa.int64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")
