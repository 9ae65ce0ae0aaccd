"""Full-pipeline conformance: Ray index build + query vs the pure-numpy
oracle (SURVEY.md §5): scores equal within atol=1e-6, ranks identical
after (score desc, doc_id asc) tie normalization."""

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
from bm25_benchmarks_ray.sources.transcripts import (
    synthesize_queries,
    synthesize_transcripts,
)

from tests.oracle import build_oracle_index, oracle_topk

N_TURNS = 400


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    table = synthesize_transcripts(N_TURNS, seed=5)
    # multiple files, deliberately NOT in conv order within files
    n = table.num_rows
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]):
        pq.write_table(table.slice(lo, hi - lo), os.path.join(d, f"p{i}.parquet"))
    return str(d), table


@pytest.fixture(scope="module")
def built(ray_session, corpus_dir, tmp_path_factory):
    d, table = corpus_dir
    idx = str(tmp_path_factory.mktemp("idx") / "index")
    # salt_range small enough that group_rows > salt_range*64 → the
    # salted (term, salt) pre-merge level is exercised
    cfg = IndexConfig(salt_range=2)
    man = build_index(d, idx, cfg, mode="transcripts", n_groups=2)
    # oracle over the same docs in (conv_id, turn_idx) order
    df = table.to_pandas().sort_values(["conv_id", "turn_idx"], kind="mergesort")
    oracle = build_oracle_index(list(df["text"]))
    return idx, cfg, man, oracle


def test_manifest_and_stats(built):
    idx, cfg, man, oracle = built
    assert man.is_complete()
    assert man.n_groups == 2
    assert man.stats["num_docs"] == N_TURNS == oracle.n_docs
    assert man.stats["total_len"] == int(oracle.doc_lens.sum())
    assert man.stats["avgdl"] == pytest.approx(oracle.avgdl)
    assert man.stats["n_terms"] == len(oracle.postings)
    for e in man.groups.values():
        assert e["n_postings"] > 0 and e["n_terms"] > 0 and e["input_files"]
        assert e["two_level"]  # salted pre-merge engaged (salt_range=2)


def assert_rank_identical(got_docs, got_scores, exp, atol=1e-6, ctx=None):
    """Rank-identical up to floating-point ties: scores must agree
    positionally within atol, and where doc ids differ the two docs must
    be an fp-tie (scores within atol) — the reference itself only
    guarantees score agreement to atol=1e-6 across its own backends
    (/root/reference/benchmark/on_bm25s.py:189) and leaves tie order
    unspecified (on_rank_bm25.py:32)."""
    exp_docs = [d for d, _ in exp]
    exp_scores = np.array([s for _, s in exp])
    np.testing.assert_allclose(got_scores, exp_scores, atol=atol, err_msg=str(ctx))
    for gd, gs, ed, es in zip(got_docs, got_scores, exp_docs, exp_scores):
        if gd != ed:
            assert abs(gs - es) <= atol, (ctx, gd, ed, gs, es)


@pytest.mark.parametrize("method", ["lucene", "atire", "robertson", "bm25l", "bm25+", "okapi"])
def test_topk_matches_oracle(built, method):
    idx, cfg, man, oracle = built
    params = BM25Params(method=method)
    queries = synthesize_queries(25, seed=9)
    res = search(idx, queries, params=params, k=10).to_pandas()
    for qid, qtext in queries:
        got = res[res["qid"] == qid].sort_values("rank")
        exp = oracle_topk(oracle, qtext, params, k=10)
        assert_rank_identical(
            list(got["doc_id"]), got["score"].to_numpy(), exp, ctx=(method, qid, qtext)
        )


def test_joinback_invariant(built, corpus_dir):
    """Per-turn text equality under stable (conv_id, turn_idx) order,
    end-to-end through the docmap join-back (BASELINE.json invariant)."""
    idx, cfg, man, oracle = built
    _, table = corpus_dir
    df = table.to_pandas().sort_values(["conv_id", "turn_idx"], kind="mergesort")
    df = df.reset_index(drop=True)
    res = search(idx, synthesize_queries(5, seed=9), k=5).to_pandas()
    for r in res.itertuples(index=False):
        row = df.iloc[int(r.doc_id)]
        assert row["conv_id"] == r.conv_id and int(row["turn_idx"]) == int(r.turn_idx)


def test_zero_match_query_pads_dense(built):
    idx, cfg, man, oracle = built
    queries = [("q_stop", "the and of to"), ("q_oov", "zzqqxxnotaword")]
    res = search(idx, queries, k=5).to_pandas()
    for qid in ("q_stop", "q_oov"):
        got = res[res["qid"] == qid].sort_values("rank")
        assert list(got["doc_id"]) == [0, 1, 2, 3, 4]
        assert (got["score"] == 0.0).all()


def test_resume_skips_done_groups(ray_session, corpus_dir, tmp_path):
    d, _ = corpus_dir
    idx = str(tmp_path / "idx2")
    cfg = IndexConfig()
    man1 = build_index(d, idx, cfg, mode="transcripts", n_groups=2)
    assert man1.is_complete()
    # simulate a crash after group 0: wipe finalize + group 1
    man1.groups.pop("1")
    man1.stages.pop("finalize")
    man1.save()
    import shutil

    shutil.rmtree(os.path.join(idx, "segments", "group=1"))
    man2 = build_index(d, idx, cfg, mode="transcripts", n_groups=2)
    assert man2.is_complete()
    assert man2.groups["0"] == man1.groups["0"]  # untouched, not rebuilt


def test_documents_mode(ray_session, tmp_path):
    texts = [
        "ray data streaming shuffle",
        "bm25 scoring with ray",
        "postings compressed varint lists",
        "streaming bm25 retrieval engine",
    ]
    p = tmp_path / "docs.parquet"
    pq.write_table(
        pa.table({"doc_id": pa.array(range(4), type=pa.int64()), "text": texts}), p
    )
    idx = str(tmp_path / "idx")
    man = build_index(str(p), idx, IndexConfig(), mode="documents")
    assert man.stats["num_docs"] == 4
    oracle = build_oracle_index(texts)
    res = search(idx, [("q0", "bm25 ray streaming")], k=4).to_pandas()
    exp = oracle_topk(oracle, "bm25 ray streaming", BM25Params(), k=4)
    got = res.sort_values("rank")
    assert list(got["doc_id"]) == [d for d, _ in exp]
    np.testing.assert_allclose(got["score"].to_numpy(), [s for _, s in exp], atol=1e-6)
