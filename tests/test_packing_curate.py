"""Sequence packing (distributed prefix sum) and the curation composite
on hand-computed fixtures with planted duplicates."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from bm25_benchmarks_ray.pipelines.curate import curate
from bm25_benchmarks_ray.pipelines.packing import pack_offsets


def _docs(rows):
    """rows: (doc_id, text[, source])."""
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": pa.array([r[1] for r in rows]),
                "source": pa.array(
                    [(r[2] if len(r) > 2 else "src0") for r in rows]
                ),
            }
        )
    )


def test_pack_offsets_hand_computed(ray_session):
    # counts: 3, 2, 0, 4 -> cum spans [0,3) [3,5) [5,5) [5,9)
    ds = _docs(
        [(0, "a b c"), (1, "d e"), (2, ""), (3, "f g h i")]
    ).select_columns(["doc_id", "text"])
    out = (
        pack_offsets(ds, capacity=4, bucket_size=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.n_tok.tolist() == [3, 2, 0, 4]
    assert out.start_tok.tolist() == [0, 3, 5, 5]
    assert out.end_tok.tolist() == [3, 5, 5, 9]
    # capacity 4: doc1 spans tokens 3-4 -> bins 0..1 (straddles);
    # empty doc2 sits at token 5 -> bin 1; doc3 spans 5-8 -> bins 1..2
    assert out.first_bin.tolist() == [0, 0, 1, 1]
    assert out.last_bin.tolist() == [0, 1, 1, 2]


def test_pack_offsets_bucketing_invariant(ray_session):
    # the same answer regardless of bucket_size (prefix sum is exact)
    rng = np.random.RandomState(3)
    rows = [(i, " ".join(["w"] * int(rng.randint(0, 9)))) for i in range(57)]
    ds = _docs(rows).select_columns(["doc_id", "text"])
    a = pack_offsets(ds, capacity=16, bucket_size=4).to_pandas().sort_values("doc_id")
    b = pack_offsets(ds, capacity=16, bucket_size=1000).to_pandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    # spans tile the token stream exactly
    assert (a.sort_values("doc_id").end_tok.to_numpy()[:-1]
            == a.sort_values("doc_id").start_tok.to_numpy()[1:]).all()


GOOD = (
    "the quick brown fox jumps over the lazy dog and then the dog sleeps "
    "by the fire with all of his friends from the farm on a warm evening"
)
BAD_SHORT = "tiny text"
BAD_PUNCT = "!!! ??? ### $$$ %%% the " * 10


def test_curate_filters_dedups_samples(ray_session):
    # doc 0/1: identical GOOD text (exact dups) -> min doc_id survives
    # doc 2: good text, odd source -> subject to 30% sampling
    # doc 3: too short -> quality filtered
    # doc 4: punctuation soup -> quality filtered
    ds = _docs(
        [
            (0, GOOD, "src0"),
            (1, GOOD, "src2"),
            (2, GOOD + " extra words here", "src1"),
            (3, BAD_SHORT, "src0"),
            (4, BAD_PUNCT, "src0"),
        ]
    )
    out = curate(ds, rate_odd=0.3).to_pandas().sort_values("doc_id")
    assert 3 not in set(out.doc_id) and 4 not in set(out.doc_id)
    assert 1 not in set(out.doc_id)  # dup of 0: only min doc_id survives
    assert 0 in set(out.doc_id)  # even source, rate 1.0
    assert set(out.columns) == {"doc_id", "source", "quality"}


def test_curate_deterministic(ray_session):
    ds = _docs([(i, GOOD + f" variant {i}", f"src{i % 4}") for i in range(40)])
    a = curate(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = curate(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    # odd sources sampled at 30%: strictly fewer than the even full-rate
    evens = (a.source.str[3:].astype(int) % 2 == 0).sum()
    odds = len(a) - evens
    assert evens == 20 and 0 < odds < 20
