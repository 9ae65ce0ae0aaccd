"""Vendored WordPiece: trainer determinism, encoder greedy-longest
semantics, splitter wiring, and an end-to-end index+query run with
splitter="wordpiece:<vocab>" (the M9 HF-tokenizer-slot analogue,
/root/reference/utils/huggingface.py:2-17, runnable without the
``tokenizers`` package)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from bm25_benchmarks_ray.functions.wordpiece import (
    UNK,
    encode_word,
    load_vocab,
    save_vocab,
    train_wordpiece,
    wordpiece_splitter,
)


def test_encoder_greedy_longest():
    vocab = {"un", "##aff", "##able", "##ffa", "able", "b"}
    assert encode_word("unaffable", vocab) == ["un", "##aff", "##able"]
    assert encode_word("able", vocab) == ["able"]
    # unmatchable remainder -> UNK for the whole word
    assert encode_word("unz", vocab) == [UNK]
    assert encode_word("", vocab) == [UNK]
    assert encode_word("x" * 200, vocab) == [UNK]


def test_trainer_merges_frequent_pairs():
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    vocab = train_wordpiece(counts, vocab_size=40)
    # alphabet present
    assert {"l", "n", "w", "##o", "##w", "##e", "##s", "##t"} <= set(vocab)
    assert UNK in vocab
    # with budget to spare, every corpus word merges to a single token
    assert {"low", "lower", "newest", "widest"} <= set(vocab)
    # deterministic: same input -> same vocab order
    assert vocab == train_wordpiece(counts, vocab_size=40)


def test_trainer_encoder_consistency():
    counts = {"hugging": 10, "hugs": 8, "hug": 12, "pug": 4, "pun": 3}
    vocab = train_wordpiece(counts, vocab_size=30)
    vset = set(vocab)
    for w in counts:
        pieces = encode_word(w, vset)
        assert pieces != [UNK]
        assert "".join(p.removeprefix("##") for p in pieces) == w
        assert all(p.startswith("##") for p in pieces[1:])


def test_splitter_and_vocab_io(tmp_path):
    counts = {"ray": 5, "data": 5, "rays": 2}
    vocab = train_wordpiece(counts, vocab_size=25)
    p = str(tmp_path / "vocab.json")
    save_vocab(vocab, p)
    assert load_vocab(p) == vocab
    # txt format too
    pt = str(tmp_path / "vocab.txt")
    with open(pt, "w") as f:
        f.write("\n".join(vocab))
    assert load_vocab(pt) == vocab
    sp = wordpiece_splitter(vocab)
    toks = sp("ray data rays!")  # lowercasing happens upstream (tokenize_text)
    assert toks and UNK not in toks
    assert sp("Ray")[0] == UNK  # un-lowered input is out-of-alphabet


def test_resolve_splitter_wordpiece(tmp_path):
    from bm25_benchmarks_ray.functions.tokenizer import (
        resolve_splitter,
        tokenize_text,
    )

    vocab = train_wordpiece({"hello": 3, "world": 3}, vocab_size=20)
    p = str(tmp_path / "v.json")
    save_vocab(vocab, p)
    sp = resolve_splitter(f"wordpiece:{p}")
    toks = tokenize_text("hello world", stemmer=None, splitter=sp)
    assert "".join(t.removeprefix("##") for t in toks) == "helloworld"


def test_index_query_with_wordpiece(ray_session, tmp_path):
    """End-to-end: train a vocab on the corpus (distributed counts),
    build an index with splitter="wordpiece:...", query through it."""
    from bm25_benchmarks_ray.config import IndexConfig
    from bm25_benchmarks_ray.functions.wordpiece import word_counts_dataset
    from bm25_benchmarks_ray.pipelines.index_build import build_index
    from bm25_benchmarks_ray.pipelines.query import search
    from bm25_benchmarks_ray.sources.transcripts import (
        synthesize_queries,
        synthesize_transcripts,
    )
    import ray.data as rd

    d = tmp_path / "wp"
    os.makedirs(d)
    table = synthesize_transcripts(300, seed=11)
    pq.write_table(table, str(d / "p.parquet"))
    counts = word_counts_dataset(rd.from_arrow(table), column="text")
    assert sum(counts.values()) > 0
    vocab = train_wordpiece(counts, vocab_size=600)
    vp = str(d / "vocab.json")
    save_vocab(vocab, vp)

    cfg = IndexConfig(splitter=f"wordpiece:{vp}", stemmer="none")
    idx = str(d / "idx")
    build_index(str(d), idx, cfg, mode="transcripts")
    res = search(idx, synthesize_queries(5, seed=3), k=5).to_pandas()
    assert len(res) == 25
    assert (res.groupby("qid")["rank"].max() == 5).all()
    assert res["score"].notna().all()
