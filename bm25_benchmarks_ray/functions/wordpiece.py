"""Vendored WordPiece tokenizer: trainer + encoder, no external deps.

The reference exposes an alternative HuggingFace tokenization path
(/root/reference/utils/huggingface.py:2-17) that this container cannot
run (no ``tokenizers`` package, no network).  Both halves of WordPiece
are published algorithms, so they are implemented here directly:

- **Encoder** (BERT repo / WordPiece paper): per word, greedy
  longest-prefix match against the vocab; continuation pieces carry the
  ``##`` prefix; a word with any unmatchable remainder becomes [UNK].
- **Trainer** (as documented for HF's WordPieceTrainer): start from the
  alphabet (word-initial chars plus ``##``-prefixed continuation
  chars), then repeatedly merge the adjacent pair maximizing
  ``freq(pair) / (freq(first) * freq(second))`` until ``vocab_size``
  tokens exist.  Ties break lexicographically, so training is fully
  deterministic.

Scale note: training is inherently an iterative, driver-side algorithm
over the *word-frequency table* (vocabulary-sized, not corpus-sized).
:func:`word_counts_dataset` does the corpus-sized part distributed —
per-batch Counter combine, then a ``groupby(word).sum`` shuffle — and
only the aggregated counts come to the driver.
"""

from __future__ import annotations

import json
from collections import Counter
from collections.abc import Callable, Iterable

UNK = "[UNK]"
MAX_WORD_CHARS = 100


def train_wordpiece(
    word_counts: dict[str, int], vocab_size: int = 1000
) -> list[str]:
    """Deterministic WordPiece vocab from a word-frequency table."""
    # words as piece sequences: first char bare, rest ##-prefixed
    words = {
        w: [w[0]] + ["##" + c for c in w[1:]]
        for w in sorted(word_counts)
        if w
    }
    vocab: dict[str, None] = {UNK: None}
    for pieces in words.values():
        for p in pieces:
            vocab.setdefault(p, None)
    while len(vocab) < vocab_size:
        piece_freq: Counter = Counter()
        pair_freq: Counter = Counter()
        for w, pieces in words.items():
            c = word_counts[w]
            for p in pieces:
                piece_freq[p] += c
            for a, b in zip(pieces, pieces[1:]):
                pair_freq[(a, b)] += c
        if not pair_freq:
            break
        # score = freq(pair) / (freq(a) * freq(b)); deterministic ties
        best = max(
            pair_freq,
            key=lambda ab: (
                pair_freq[ab] / (piece_freq[ab[0]] * piece_freq[ab[1]]),
                ab,
            ),
        )
        a, b = best
        merged = a + b[2:]
        vocab.setdefault(merged, None)
        for w, pieces in words.items():
            out, i = [], 0
            while i < len(pieces):
                if i + 1 < len(pieces) and pieces[i] == a and pieces[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(pieces[i])
                    i += 1
            words[w] = out
    return list(vocab)


def encode_word(word: str, vocab: set[str]) -> list[str]:
    """Greedy longest-match-first WordPiece encoding of one word."""
    if not word or len(word) > MAX_WORD_CHARS:
        return [UNK]
    out: list[str] = []
    start = 0
    while start < len(word):
        end = len(word)
        cur = None
        while start < end:
            piece = word[start:end]
            if start > 0:
                piece = "##" + piece
            if piece in vocab:
                cur = piece
                break
            end -= 1
        if cur is None:
            return [UNK]
        out.append(cur)
        start = end
    return out


def wordpiece_splitter(
    vocab: Iterable[str], pre_split: Callable[[str], list[str]] | None = None
) -> Callable[[str], list[str]]:
    """A ``resolve_splitter``-compatible splitter: regex pre-tokenize
    (the engine's default word splitter) then WordPiece-encode each
    word.  Pieces (including ``##`` continuations) become the engine's
    terms — pair with ``stemmer="none"`` since pieces are sub-words."""
    from .tokenizer import TOKEN_RE

    vset = set(vocab)
    pre = pre_split or TOKEN_RE.findall

    def split(text: str) -> list[str]:
        out: list[str] = []
        for w in pre(text):
            out.extend(encode_word(w, vset))
        return out

    return split


def save_vocab(vocab: Iterable[str], path: str) -> None:
    with open(path, "w", encoding="utf-8") as f:
        json.dump(list(vocab), f)


def load_vocab(path: str) -> list[str]:
    if path.endswith(".txt"):  # BERT-style one-token-per-line
        with open(path, encoding="utf-8") as f:
            return [ln.rstrip("\n") for ln in f if ln.strip()]
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def word_counts_dataset(ds, column: str = "text", lower: bool = True) -> dict[str, int]:
    """Distributed word-frequency table over a Ray Dataset text column:
    per-batch Counter (map-side combine) → ``groupby(word).sum``
    shuffle → driver collect of the vocabulary-sized result."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from .tokenizer import TOKEN_RE

    def count_batch(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(column).to_pylist():
            if t is None:
                continue
            c.update(TOKEN_RE.findall(t.lower() if lower else t))
        return pa.table(
            {
                "word": pa.array(list(c.keys()), type=pa.string()),
                "n": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(count_batch, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )
    out: dict[str, int] = {}
    for row in agg.iter_rows():
        out[row["word"]] = int(row["n"])
    return out
