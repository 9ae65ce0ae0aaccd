"""End-to-end rank correctness in the multi-byte varint regime.

The synthetic transcript corpus caps turns at 120 tokens
(sources/transcripts.py), so every dl (and almost every tf) fits one
varint byte — the bench/e2e surface never pushes a multi-byte dl or tf
stream through build → block-max bounds → per-stream / selected-block
decode, the exact regime the per-stream varint decode path exists for
(stages/segments.py).  This corpus makes dl ≥ 128 the common case and
plants tf ≥ 128 postings, then checks pruned top-k against the pure
numpy oracle for variants including robertson's negative-idf ordering.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bm25_benchmarks_ray.config import IndexConfig
from bm25_benchmarks_ray.functions.bm25 import BM25Params
from bm25_benchmarks_ray.pipelines.index_build import build_index
from bm25_benchmarks_ray.pipelines.query import search

from tests.oracle import build_oracle_index, oracle_topk
from tests.test_end_to_end import assert_rank_identical

N_DOCS = 300


def _make_texts() -> list[str]:
    rng = np.random.RandomState(77)
    vocab = np.array(
        [f"wordform{i:02d}" for i in range(60)]
        + ["commonterm"]  # planted in >N/2 docs: negative idf under robertson
    )
    p = 1.0 / np.arange(1, len(vocab) + 1) ** 0.9
    p /= p.sum()
    texts = []
    for d in range(N_DOCS):
        n = int(rng.randint(100, 500))  # dl mostly >= 128: multi-byte varints
        toks = list(vocab[rng.choice(len(vocab), size=n, p=p)])
        if d % 2 == 0:
            toks += ["commonterm"] * 3  # df 180/300 > N/2
        if d % 30 == 0:
            toks += ["wordform55"] * 150  # tf >= 128: multi-byte tf stream
        rng.shuffle(toks)
        texts.append(" ".join(toks))
    return texts


@pytest.fixture(scope="module")
def longdoc(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("longdoc")
    texts = _make_texts()
    t = pa.table(
        {"doc_id": pa.array(range(N_DOCS), type=pa.int64()), "text": pa.array(texts)}
    )
    for i in range(3):  # multiple input files
        pq.write_table(t.slice(i * 100, 100), os.path.join(d, f"p{i}.parquet"))
    idx = str(tmp_path_factory.mktemp("idx") / "index")
    # block_size 32 so hot terms span ~10 blocks (selected-block decode
    # must skip); salt_range 64 engages the salted pre-merge
    cfg = IndexConfig(block_size=32, salt_range=64)
    man = build_index(str(d), idx, cfg, mode="documents", n_groups=2)
    oracle = build_oracle_index(texts)
    return idx, man, oracle


def test_multibyte_streams_present(longdoc):
    idx, man, oracle = longdoc
    # the regime premise must hold or the test is vacuous
    assert (oracle.doc_lens >= 128).mean() > 0.8
    assert man.stats["num_docs"] == N_DOCS
    assert man.stats["total_len"] == int(oracle.doc_lens.sum())


@pytest.mark.parametrize("method", ["lucene", "robertson", "bm25+"])
def test_longdoc_topk_matches_oracle(longdoc, method):
    idx, man, oracle = longdoc
    params = BM25Params(method=method)
    queries = [
        ("q_hot", "commonterm wordform00"),
        ("q_tfheavy", "wordform55"),
        ("q_mix", "wordform55 commonterm wordform30"),
        ("q_rare", "wordform59 wordform58"),
    ]
    res = search(idx, queries, params=params, k=10).to_pandas()
    for qid, qtext in queries:
        got = res[res["qid"] == qid].sort_values("rank")
        exp = oracle_topk(oracle, qtext, params, k=10)
        assert_rank_identical(
            list(got["doc_id"]), got["score"].to_numpy(), exp, ctx=(method, qid)
        )


def test_longdoc_large_k_dense_path(longdoc):
    """k >= 64 routes to the dense accumulator: same regime, other path."""
    idx, man, oracle = longdoc
    params = BM25Params(method="lucene")
    res = search(idx, [("q", "commonterm wordform10")], params=params, k=100)
    got = res.to_pandas().sort_values("rank")
    exp = oracle_topk(oracle, "commonterm wordform10", params, k=100)
    assert_rank_identical(
        list(got["doc_id"]), got["score"].to_numpy(), exp, ctx="dense-k100"
    )
