"""Deterministic synthetic transcript corpus (the engine's primary
input shape, BASELINE.json input_hint) and readers.

Schema: conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp[us] — one row = one conversation turn = one
BM25 document (reference analogue: one BEIR corpus entry,
/root/reference/benchmark/on_bm25s.py:54-59).

Generation follows FIXTURES.md §1: Zipf(s≈1.1) draws from a ~2k-word
vocab, plus hot terms (>30% of turns — exercises term-skew salting),
reference stopwords, morphological families (stem merging), 1-char
tokens and punctuation (min-length-2 regex), mixed case, and unicode
words. Seeded numpy; same (sf, seed) always produces identical bytes.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_SYLLABLES = [
    "ba", "co", "den", "fi", "gor", "hel", "jin", "kal", "lor", "mi",
    "nor", "pel", "qui", "ras", "sol", "tam", "ul", "vex", "wol", "zen",
]
_VERB_STEMS = [
    "index", "merg", "stream", "shuffl", "partition", "token", "compress",
    "retriev", "rank", "scor", "queri", "batch", "spill", "checkpoint",
    "broadcast", "sort", "join", "filter", "sampl", "encod",
]
_HOT_TERMS = ["pipeline", "data", "system"]  # >30% of turns
_STOPWORD_SAMPLE = ["the", "and", "of", "to", "is", "in", "that", "for"]
_NOISE = ["x", "y", "z", "k", "I", "a"]  # 1-char tokens: dropped by the regex
_UNICODE_WORDS = ["café", "naïve", "münchen", "東京", "résumé"]
_MIXED_CASE = ["Spark", "SPARK", "RayData", "BM25", "Arrow"]
_ROLES = ["user", "assistant", "tool"]


def _build_vocab(rng: np.random.RandomState, size: int = 24000) -> list[str]:
    """~24k distinct surface forms (two- and three-syllable words) — a
    corpus-realistic vocabulary scale (BEIR corpora run 10^5-10^6 terms;
    a toy vocab makes every query term as dense as a stopword and
    distorts query-time cost).  Zipf draws over this vocab give the
    long-tailed df distribution real corpora have."""
    vocab: list[str] = []
    for s1 in _SYLLABLES:
        for s2 in _SYLLABLES:
            vocab.append(s1 + s2)
    for s1 in _SYLLABLES:
        for s2 in _SYLLABLES:
            for s3 in _SYLLABLES:
                vocab.append(s1 + s2 + s3)
                if len(vocab) >= size:
                    break
            if len(vocab) >= size:
                break
        if len(vocab) >= size:
            break
    for stem in _VERB_STEMS:  # morphological families -> same Porter2 stem
        vocab += [stem + suf for suf in ("e", "es", "ed", "ing", "er")]
    vocab += _UNICODE_WORDS + _MIXED_CASE
    rng.shuffle(vocab)
    return vocab


def synthesize_transcripts(
    n_turns: int,
    seed: int = 42,
    mean_turns_per_conv: int = 22,
) -> pa.Table:
    """Build an n_turns-row transcripts table fully vectorized."""
    rng = np.random.RandomState(seed)
    vocab = np.array(_build_vocab(rng), dtype=object)
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    probs = 1.0 / ranks**1.1
    probs /= probs.sum()

    # conversation structure
    n_convs = max(1, n_turns // mean_turns_per_conv)
    sizes = rng.randint(4, 41, size=n_convs)
    while sizes.sum() < n_turns:
        sizes = np.concatenate([sizes, rng.randint(4, 41, size=16)])
    cum = np.cumsum(sizes)
    n_convs = int(np.searchsorted(cum, n_turns) + 1)
    sizes = sizes[:n_convs]
    sizes[-1] -= int(cum[n_convs - 1] - n_turns)

    conv_ids = np.repeat(
        np.array([f"conv{i:08d}" for i in range(n_convs)], dtype=object), sizes
    )
    turn_idx = np.concatenate([np.arange(s, dtype=np.int32) for s in sizes])

    # per-turn token counts: 5..120, skewed small
    lens = np.minimum(5 + rng.geometric(1 / 18.0, size=n_turns), 120)
    total = int(lens.sum())
    tokens = rng.choice(vocab, size=total, p=probs)

    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    hot = rng.random(n_turns) < 0.35  # hot terms in >30% of turns
    noise_pick = rng.randint(0, len(_NOISE), size=n_turns)
    stop_pick = rng.randint(0, len(_STOPWORD_SAMPLE), size=n_turns)
    hot_pick = rng.randint(0, len(_HOT_TERMS), size=n_turns)
    punct = rng.random(n_turns) < 0.3

    texts = np.empty(n_turns, dtype=object)
    for i in range(n_turns):
        toks = list(tokens[starts[i] : starts[i] + lens[i]])
        toks.append(_STOPWORD_SAMPLE[stop_pick[i]])
        toks.append(_NOISE[noise_pick[i]])
        if hot[i]:
            toks.append(_HOT_TERMS[hot_pick[i]])
        text = " ".join(toks)
        if punct[i]:
            text = text.replace(" ", ", ", 1) + "."
        texts[i] = text

    roles = np.array(_ROLES, dtype=object)[np.arange(n_turns) % 3]
    tools = np.where(
        roles == "tool",
        np.array([f"tool{i % 5}" for i in range(n_turns)], dtype=object),
        "",
    )
    base = np.datetime64("2026-01-01T00:00:00", "us")
    ts = base + np.arange(n_turns).astype("timedelta64[s]").astype("timedelta64[us]")

    return pa.table(
        {
            "conv_id": pa.array(conv_ids, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(roles, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array(tools, type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )


def sf_to_n_turns(sf: float) -> int:
    return max(500, int(sf * 1_200_000))


def transcripts_dir(sf: float, root: str = "/tmp/bm25rd/transcripts_v2", seed: int = 42) -> str:
    """Materialize (once) the synthetic transcripts for a scale factor as
    a directory of parquet files sized for parallel reads; return the dir."""
    out = os.path.join(root, f"sf{sf}_seed{seed}")
    done = os.path.join(out, "_SUCCESS")
    if os.path.exists(done):
        return out
    table = synthesize_transcripts(sf_to_n_turns(sf), seed=seed)
    tmp = out + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    n = table.num_rows
    rows_per_file = max(2000, n // 64)  # >=64 files: read parallelism at scale
    i = 0
    for off in range(0, n, rows_per_file):
        pq.write_table(
            table.slice(off, rows_per_file),
            os.path.join(tmp, f"part-{i:05d}.parquet"),
            row_group_size=max(1000, rows_per_file // 4),
        )
        i += 1
    os.makedirs(os.path.dirname(out), exist_ok=True)
    if os.path.exists(out):
        import shutil

        shutil.rmtree(out)
    os.replace(tmp, out)
    with open(done, "w") as f:
        f.write("ok")
    return out


def synthesize_queries(
    n_queries: int = 100, seed: int = 43
) -> list[tuple[str, str]]:
    """BEIR-style (qid, text) query set per FIXTURES.md §2: in-vocab
    terms, hot terms, OOV terms, repeated terms, one stopword-only query."""
    rng = np.random.RandomState(seed)
    vocab = _build_vocab(np.random.RandomState(42))
    out = []
    for i in range(n_queries):
        k = int(rng.randint(2, 13))
        toks = list(rng.choice(vocab, size=k))
        if rng.random() < 0.4:
            toks.append(_HOT_TERMS[rng.randint(len(_HOT_TERMS))])
        if rng.random() < 0.25:
            toks.append("zzoovterm")  # out-of-vocab: must drop out of scoring
        if rng.random() < 0.3:
            toks.append(toks[0])  # repeated term: occurrence-weighted
        out.append((f"q{i:04d}", " ".join(toks)))
    out[-1] = (f"q{n_queries - 1:04d}", "the and of to")  # stopword-only
    return out
