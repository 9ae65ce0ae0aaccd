"""Segment compaction: merged-group results must be rank-identical to
the multi-group index, with one group and (mostly) one row per term."""

from __future__ import annotations

import os

import pyarrow.dataset as pads
import pytest

from bm25_benchmarks_ray.functions.bm25 import BM25Params
from bm25_benchmarks_ray.pipelines.index_build import (
    IndexConfig,
    append_index,
    build_index,
    compact_index,
)
from bm25_benchmarks_ray.pipelines.query import search

SRC = "/root/testdata/sf0.001/documents.parquet"
QUERIES = [
    ("q0", "system cache latency"),
    ("q1", "database network error"),
    ("q2", "user login token"),
]


def _topk(idx: str, k: int = 10):
    res = search(idx, QUERIES, params=BM25Params(), k=k).to_pandas()
    return res.sort_values(["qid", "rank"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def multi_group_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("compact")
    import pyarrow.parquet as pq

    t = pq.read_table(SRC, columns=["doc_id", "text"])
    src = str(root / "src")
    os.makedirs(src)
    third = t.num_rows // 3
    for i in range(3):
        part = t.slice(i * third, third if i < 2 else t.num_rows - 2 * third)
        pq.write_table(part, os.path.join(src, f"docs_{i}.parquet"))
    idx = str(root / "idx")
    man = build_index(
        src, idx, IndexConfig(), mode="documents", n_groups=3, fresh=True
    )
    assert len(man.done_groups()) >= 2  # planner may fold small files
    return idx, man.done_groups()


def test_compact_rank_identical(multi_group_index):
    idx, gids_before = multi_group_index
    before = _topk(idx)
    man = compact_index(idx)
    assert man.done_groups() == [0] and man.is_complete()
    e = man.groups["0"]
    assert e["n_docs"] == 500 and e["compacted_from"] == gids_before
    assert e["doc_lo"] == 0 and e["doc_hi"] == 500  # contiguous spans fused
    after = _topk(idx)
    assert before[["qid", "doc_id", "rank"]].equals(after[["qid", "doc_id", "rank"]])
    assert (before.score - after.score).abs().max() < 1e-9
    # terms folded to one row each (one partition per term id range)
    seg = pads.dataset(os.path.join(idx, "segments")).to_table(columns=["term", "df"])
    assert seg.column("term").to_pandas().is_unique


def test_compact_needs_two_groups(multi_group_index):
    idx, _ = multi_group_index
    with pytest.raises(ValueError, match="at least two groups"):
        compact_index(idx)  # already compacted by prior test


def test_append_then_compact(ray_session, tmp_path):
    import pyarrow.parquet as pq

    t = pq.read_table(SRC, columns=["doc_id", "text"])
    cut = t.num_rows // 2
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    os.makedirs(a), os.makedirs(b)
    pq.write_table(t.slice(0, cut), os.path.join(a, "a.parquet"))
    pq.write_table(t.slice(cut), os.path.join(b, "b.parquet"))
    idx = str(tmp_path / "idx")
    cfg = IndexConfig()
    build_index(a, idx, cfg, mode="documents", fresh=True)
    append_index(b, idx, cfg)
    before = _topk(idx)
    man = compact_index(idx, cfg=cfg)
    assert len(man.done_groups()) == 1 and man.stats["num_docs"] == 500
    assert _topk(idx)[["qid", "doc_id", "rank"]].equals(
        before[["qid", "doc_id", "rank"]]
    )


def test_compact_preserves_overlap_validation(ray_session, tmp_path):
    """A compacted group with HOLES in its id space must still refuse an
    overlapping append (bounding range survives compaction), and a
    REJECTED append must leave the index complete and queryable."""
    import pyarrow.parquet as pq

    from bm25_benchmarks_ray.state.manifest import Manifest

    t = pq.read_table(SRC, columns=["doc_id", "text"])
    import pyarrow.compute as pc

    lo = t.slice(0, 200)  # ids 0..199
    hi = t.slice(200, 200).set_column(  # ids shifted to 1000..1199 (hole)
        0, "doc_id", pc.add(t.slice(200, 200).column("doc_id"), 800)
    )
    a, b, c = (str(tmp_path / n) for n in ("a.parquet", "b.parquet", "c.parquet"))
    pq.write_table(lo, a)
    pq.write_table(hi, b)
    pq.write_table(t.slice(50, 100), c)  # ids 50..149: inside the bound

    idx = str(tmp_path / "idx")
    build_index(a, idx, IndexConfig(), mode="documents", fresh=True)
    append_index(b, idx, IndexConfig())
    man = compact_index(idx)
    e = man.groups[str(man.done_groups()[0])]
    assert e["doc_lo"] is None  # holes: no exact contiguous range
    assert e["doc_bound_lo"] == 0 and e["doc_bound_hi"] == 1200

    with pytest.raises(ValueError, match="overlaps"):
        append_index(c, idx, IndexConfig())
    # the rejected append left the index finalized and queryable
    man2 = Manifest.load(idx)
    assert man2.is_complete() and "finalize" in man2.stages
    assert _topk(idx).shape[0] > 0
