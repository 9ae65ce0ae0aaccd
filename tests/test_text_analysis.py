"""Text-analysis operators vs hand-computed values."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pytest
import ray.data as rd

from bm25_benchmarks_ray.pipelines.text_analysis import (
    fingerprint,
    language_id,
    quality_score,
    token_count,
)


@pytest.fixture(scope="module")
def ds(ray_session):
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(
                [
                    "The cat and the dog are in the house",  # stopword-heavy: en
                    "zorblax qwixt vrenmal plok dstf",       # no stopwords: und
                    "",                                        # empty
                ]
            ),
        }
    )
    return rd.from_arrow(t)


def test_language_id(ds):
    out = language_id(ds).to_pandas().set_index("doc_id")
    # tokens doc0 (>=2 chars, lowered): the cat and the dog are in the house
    # stopwords: the, and, the, are, in, the -> 6/9
    assert out.loc[0, "stopword_ratio"] == pytest.approx(6 / 9, abs=1e-6)
    assert out.loc[0, "lang"] == "en"
    assert out.loc[1, "lang"] == "und"
    assert out.loc[2, "stopword_ratio"] == 0.0


def test_token_count(ds):
    out = token_count(ds).to_pandas().set_index("doc_id")
    assert out.loc[0, "ws_tokens"] == 9
    assert out.loc[0, "re_tokens"] == 9
    assert out.loc[2, "ws_tokens"] == 0
    # bpe-ish on doc1: each word splits into <=4-char pieces
    assert out.loc[1, "bpe_tokens"] >= out.loc[1, "ws_tokens"]


def test_quality(ds):
    out = quality_score(ds).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_tokens"] == 9
    assert out.loc[0, "n_chars"] == len("The cat and the dog are in the house")
    assert out.loc[0, "punct_ratio"] == 0.0
    assert 0.0 <= out.loc[0, "quality"] <= 1.0
    assert out.loc[2, "quality"] <= 0.31  # empty: only punct term contributes


def test_winnow_fingerprint(ray_session):
    from bm25_benchmarks_ray.pipelines.text_analysis import winnow_fingerprint

    shared = "the distributed inverted index merges compressed posting segments"
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(
                [
                    f"intro words here {shared} trailing stuff",
                    f"totally different opening but then {shared} and more",
                    "nothing in common with the others at all whatsoever today",
                ]
            ),
        }
    )
    out = (
        winnow_fingerprint(rd.from_arrow(t), k=4, window=3)
        .to_pandas()
        .set_index("doc_id")
    )
    f0, f1, f2 = (set(out.loc[i, "fps"]) for i in range(3))
    assert f0 & f1  # shared passage -> shared fingerprints
    assert not (f0 & f2)
    # deterministic
    out2 = winnow_fingerprint(rd.from_arrow(t), k=4, window=3).to_pandas()
    assert sorted(map(list, out2["fps"])) == sorted(map(list, out["fps"]))


def test_fingerprint(ds):
    out = fingerprint(ds).to_pandas().set_index("doc_id")
    norm = "the cat and the dog are in the house"
    assert out.loc[0, "fp"] == hashlib.md5(norm.encode()).hexdigest()
    # case/punct robustness
    t2 = pa.table(
        {"doc_id": pa.array([0], type=pa.int64()),
         "text": ["THE cat, AND the dog ARE in the house!!"]}
    )
    out2 = fingerprint(rd.from_arrow(t2)).to_pandas()
    assert out2["fp"].iloc[0] == out.loc[0, "fp"]


def test_quality_null_text(ray_session):
    """Null text rows score like empty strings — no NaN->INT64_MIN
    poisoning through the count_substring_regex int64 cast."""
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": pa.array(["plain words here", None]),
        }
    )
    out = quality_score(rd.from_arrow(t)).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_tokens"] == 0
    assert out.loc[1, "punct_ratio"] == 0.0
    assert 0.0 <= out.loc[1, "quality"] <= 1.0
    # identical to the empty-string row semantics
    t2 = t.set_column(1, "text", pa.array(["plain words here", ""]))
    out2 = quality_score(rd.from_arrow(t2)).to_pandas().set_index("doc_id")
    assert out.loc[1].equals(out2.loc[1])
