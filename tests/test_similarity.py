"""Embedding similarity: brute-force exactness vs direct numpy, IVF
recall on clustered data, threshold pairs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from bm25_benchmarks_ray.pipelines.similarity import (
    _normalize,
    cosine_pairs,
    cosine_topk,
    fit_centroids,
    ivf_topk,
)


def _clustered(n=400, dim=32, n_clusters=8, seed=5):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim) * 3
    labels = rng.randint(0, n_clusters, size=n)
    vecs = centers[labels] + rng.randn(n, dim) * 0.3
    return vecs.astype(np.float32), labels


@pytest.fixture(scope="module")
def embdata(ray_session):
    vecs, labels = _clustered()
    t = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  type=pa.list_(pa.float32())),
        }
    )
    return t, vecs


def test_cosine_topk_exact(embdata):
    t, vecs = embdata
    q = vecs[:3]
    out = cosine_topk(rd.from_arrow(t).repartition(4), q, k=5).to_pandas()
    norm = _normalize(vecs.astype(np.float64))
    qn = _normalize(q.astype(np.float64))
    for qi in range(3):
        sims = np.round(norm @ qn[qi], 6)
        exp = np.lexsort((np.arange(len(sims)), -sims))[:5]
        got = out[out["qi"] == qi].sort_values("rank")["vec_id"].to_numpy()
        # ties at 6-decimal rounding resolved by vec_id in both
        np.testing.assert_array_equal(got, exp)


def test_ivf_recall(embdata):
    t, vecs = embdata
    q = vecs[:5]
    exact = cosine_topk(rd.from_arrow(t).repartition(4), q, k=10).to_pandas()
    approx = ivf_topk(rd.from_arrow(t).repartition(4), q, k=10,
                      n_centroids=8, nprobe=3).to_pandas()
    recalls = []
    for qi in range(5):
        e = set(exact[exact["qi"] == qi]["vec_id"])
        a = set(approx[approx["qi"] == qi]["vec_id"])
        recalls.append(len(e & a) / len(e))
    assert np.mean(recalls) >= 0.8  # clustered data, 3/8 probes


def test_cosine_pairs_threshold(embdata):
    t, vecs = embdata
    out = cosine_pairs(rd.from_arrow(t).repartition(4), threshold=0.99).to_pandas()
    norm = _normalize(vecs.astype(np.float64))
    sims = norm @ norm.T
    iu = np.triu_indices(len(vecs), k=1)
    expected = {(int(a), int(b)) for a, b in zip(*[x[sims[iu] >= 0.99] for x in iu])}
    got = {(int(a), int(b)) for a, b in zip(out["a"], out["b"])}
    assert got == expected
    assert len(got) > 0  # clustered data has close pairs


def test_fit_centroids_deterministic(embdata):
    t, _ = embdata
    c1 = fit_centroids(rd.from_arrow(t), n_centroids=8)
    c2 = fit_centroids(rd.from_arrow(t), n_centroids=8)
    np.testing.assert_array_equal(c1, c2)


def test_ivf_build_prunes_reads(embdata, tmp_path):
    """The materialized IVF index reads ONLY probed bucket partitions:
    assignment happens once at build, never per query."""
    import os

    from bm25_benchmarks_ray.pipelines.similarity import (
        IVF_BUCKETS,
        ivf_build,
        ivf_probed_dataset,
        ivf_search,
    )

    t, vecs = embdata
    idx = str(tmp_path / "ivf")
    cents = ivf_build(rd.from_arrow(t).repartition(4), idx, n_centroids=8)
    bucket_dirs = sorted(os.listdir(os.path.join(idx, IVF_BUCKETS)))
    assert len(bucket_dirs) > 1 and all(d.startswith("bucket=") for d in bucket_dirs)
    # directory-level pruning: a 2-bucket probe reads exactly those rows
    probed = [0, 1]
    pruned_rows = ivf_probed_dataset(idx, probed).count()
    total_rows = ivf_probed_dataset(
        idx, list(range(len(cents)))
    ).count()
    assert total_rows == t.num_rows
    assert 0 < pruned_rows < total_rows
    # search over the built index still answers every query
    out = ivf_search(idx, vecs[:3], k=5).to_pandas()
    assert set(out["qi"]) == {0, 1, 2}


def test_hyperplane_lsh_pairs_equals_exact(embdata):
    """LSH-with-verify output equals exact all-pairs at the defaults
    (miss probability ≤1e-6 per qualifying pair — docstring math)."""
    import pandas as pd

    from bm25_benchmarks_ray.pipelines.similarity import hyperplane_lsh_pairs

    t, _ = embdata
    ds = rd.from_arrow(t)
    tau = 0.9  # clustered fixture: same-cluster pairs sit well above
    exact = (
        cosine_pairs(ds, threshold=tau).to_pandas()
        .sort_values(["a", "b"]).reset_index(drop=True)
    )
    assert len(exact) > 50  # the fixture must actually exercise this
    lsh = (
        hyperplane_lsh_pairs(ds, threshold=tau, bands=48, bits=3)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(lsh, exact)
    # determinism: seeded hyperplanes → identical output
    again = (
        hyperplane_lsh_pairs(ds, threshold=tau, bands=48, bits=3)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(lsh, again)


def test_hyperplane_lsh_drop_report(embdata):
    """Over-cap LSH buckets are counted, never silently skipped."""
    from bm25_benchmarks_ray.pipelines.dedup import DropReport
    from bm25_benchmarks_ray.pipelines.similarity import hyperplane_lsh_pairs

    t, _ = embdata
    ds = rd.from_arrow(t)
    rep = DropReport()
    out = hyperplane_lsh_pairs(
        ds, threshold=0.9, max_bucket=4, drop_report=rep
    ).to_pandas()
    dropped = rep.get()
    # 400 vecs over 2^3-way buckets: every band bucket exceeds cap=4
    assert dropped["dropped_buckets"] > 0
    assert dropped["dropped_docs"] > 0
    assert len(out) == 0 or out["cosine"].min() >= 0.9


def test_embed_kmeans_recovers_planted_clusters(ray_session):
    """Three well-separated planted directions must come out as three
    pure clusters (k=3), regardless of which seed landed where; the
    result must be deterministic across runs."""
    from bm25_benchmarks_ray.pipelines.similarity import embed_kmeans

    rng = np.random.RandomState(5)
    centers = np.array(
        [[10.0, 0, 0, 0], [0, 10.0, 0, 0], [0, 0, 10.0, 0]]
    )
    vecs, truth = [], []
    for i in range(90):
        c = i % 3
        vecs.append(centers[c] + rng.normal(0, 0.1, 4))
        truth.append(c)
    t = pa.table(
        {
            "vec_id": pa.array(range(90), type=pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    out = embed_kmeans(
        rd.from_arrow(t).repartition(4), k=3, iters=4
    ).to_pandas().sort_values("vec_id")
    got = out["cluster"].to_numpy()
    # each truth group maps to exactly one output cluster (purity 1.0)
    for g in range(3):
        assert len(set(got[np.asarray(truth) == g])) == 1
    assert len(set(got)) == 3

    out2 = embed_kmeans(
        rd.from_arrow(t).repartition(7), k=3, iters=4
    ).to_pandas().sort_values("vec_id")
    assert (out2["cluster"].to_numpy() == got).all()  # block-layout-invariant


def test_embed_kmeans_empty_cluster_keeps_seed(ray_session):
    """A seed that attracts no members keeps its centroid instead of
    producing NaNs; all points still get valid assignments."""
    from bm25_benchmarks_ray.pipelines.similarity import embed_kmeans

    # seeds are ids 0 and 1; every point is near direction (1, 0) so
    # cluster 1 (seeded at a (1,0)-ish point too) wins everything or
    # nothing — either way no NaN and assignments stay in {0, 1}
    vecs = [[1.0, 0.01 * i] for i in range(20)]
    t = pa.table(
        {
            "vec_id": pa.array(range(20), type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
        }
    )
    out = embed_kmeans(rd.from_arrow(t), k=2, iters=3).to_pandas()
    assert out["cluster"].isin([0, 1]).all()
    assert len(out) == 20
