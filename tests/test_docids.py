"""Doc-id assignment: rank under ORDER BY (conv_id, turn_idx) without a
global sort (SURVEY.md §4.2 'stable doc numbering')."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from bm25_benchmarks_ray.sources.transcripts import synthesize_transcripts
from bm25_benchmarks_ray.stages.docids import (
    assign_doc_ids,
    conv_offsets,
    offsets_are_dense,
)


def _expected_doc_ids(table: pa.Table) -> dict:
    df = table.to_pandas().sort_values(["conv_id", "turn_idx"], kind="mergesort")
    return {
        (c, int(t)): i
        for i, (c, t) in enumerate(zip(df["conv_id"], df["turn_idx"]))
    }


def test_dense_fast_path(ray_session):
    table = synthesize_transcripts(500, seed=7)
    ds = rd.from_arrow(table).repartition(5)
    offsets = conv_offsets(ds)
    assert offsets_are_dense(offsets)
    out = assign_doc_ids(ds, offsets).to_pandas()
    expected = _expected_doc_ids(table)
    got = {
        (c, int(t)): int(d)
        for c, t, d in zip(out["conv_id"], out["turn_idx"], out["doc_id"])
    }
    assert got == expected
    assert sorted(got.values()) == list(range(len(table)))


def test_sparse_turn_fallback(ray_session):
    # gappy turn_idx (deleted turns): rank, not raw turn_idx
    table = pa.table(
        {
            "conv_id": pa.array(["b", "b", "a", "a", "a"], type=pa.string()),
            "turn_idx": pa.array([3, 9, 0, 2, 7], type=pa.int32()),
            "text": pa.array(["t1", "t2", "t3", "t4", "t5"]),
        }
    )
    ds = rd.from_arrow(table).repartition(2)
    offsets = conv_offsets(ds)
    assert not offsets_are_dense(offsets)
    out = assign_doc_ids(ds, offsets).to_pandas()
    got = {
        (c, int(t)): int(d)
        for c, t, d in zip(out["conv_id"], out["turn_idx"], out["doc_id"])
    }
    assert got == {
        ("a", 0): 0,
        ("a", 2): 1,
        ("a", 7): 2,
        ("b", 3): 3,
        ("b", 9): 4,
    }


def test_synthesizer_deterministic():
    a = synthesize_transcripts(300, seed=42)
    b = synthesize_transcripts(300, seed=42)
    assert a.equals(b)
    assert a.num_rows == 300
    # turn_idx dense within conv
    df = a.to_pandas()
    for _, g in df.groupby("conv_id"):
        assert list(g["turn_idx"]) == list(range(len(g)))


def test_join_strategy_matches_broadcast(ray_session):
    """strategy="join" (the >10^8-conv path) must produce identical
    doc ids to the broadcast fast path."""
    import pyarrow as pa
    import ray.data as rd

    from bm25_benchmarks_ray.stages.docids import assign_doc_ids, conv_offsets

    rows = [
        {"conv_id": f"c{c:03d}", "turn_idx": t, "text": f"t{c}-{t}"}
        for c in range(17)
        for t in range(c % 5 + 1)
    ]
    ds = rd.from_items(rows).repartition(4)
    offsets = conv_offsets(ds)
    a = (
        assign_doc_ids(ds, offsets, strategy="broadcast")
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    b = (
        assign_doc_ids(ds, offsets, strategy="join")
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert sorted(a["doc_id"]) == list(range(len(rows)))


def test_sparse_turn_fallback_many_convs(ray_session):
    """Randomized, many-conv exercise of the hash-sorted whole-partition
    rank kernel: doc_id must equal the global rank under ORDER BY
    (conv_id, turn_idx) for gappy turn indices."""
    rng = np.random.RandomState(5)
    convs, turns = [], []
    for c in range(137):
        cid = f"conv{c:04d}"
        n = rng.randint(1, 12)
        t = np.sort(rng.choice(np.arange(50), size=n, replace=False))
        convs += [cid] * n
        turns += list(t)
    perm = rng.permutation(len(convs))
    table = pa.table(
        {
            "conv_id": pa.array(np.asarray(convs, dtype=object)[perm]),
            "turn_idx": pa.array(np.asarray(turns, dtype=np.int64)[perm]),
        }
    )
    ds = rd.from_arrow(table).repartition(11)
    offsets = conv_offsets(ds)
    assert not offsets_are_dense(offsets)
    out = assign_doc_ids(ds, offsets).to_pandas()
    ref = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert list(ref["doc_id"]) == list(range(len(ref)))
