"""Stateful tokenizer stages (actor-pool map_batches).

One actor = one compiled regex + stopword frozenset + shared LRU stem
cache (the reference stems the unique vocab once per corpus,
/root/reference/utils/__init__.py:104-126; the process-wide cache on
porter2.stem gives the same unique-token-once economy across batches).

Two output shapes:
- :class:`TokenizePostings` — exploded rows, one per (doc, unique
  term): the postings-table operator (driver oracle `tokenize_tf`).
- :class:`TokenizeRuns` — the index build's map-side combiner: one
  pre-encoded compressed run per (term, batch).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import IndexConfig
from ..functions.tokenizer import (
    TOKEN_RE,
    resolve_splitter,
    resolve_stemmer,
    resolve_stopwords,
)

POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("doc_id", pa.int64()),
        ("tf", pa.int32()),
        ("dl", pa.int32()),
        ("salt", pa.int32()),
    ]
)


class TokenizePostings:
    """map_batches callable class (actor pool)."""

    def __init__(self, config: IndexConfig):
        self.findall = resolve_splitter(getattr(config, "splitter", "regex"))
        self.stopwords = resolve_stopwords(config.stopwords)
        self.stemmer = resolve_stemmer(config.stemmer)
        self.lower = config.lower
        self.salt_range = config.salt_range

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts_col = batch.column("text")
        if self.lower:
            texts_col = pc.utf8_lower(texts_col)  # vectorized Arrow kernel
        texts = texts_col.to_pylist()
        doc_ids = batch.column("doc_id").to_numpy()

        findall = self.findall
        stopwords = self.stopwords
        stemmer = self.stemmer

        terms: list[str] = []
        tfs: list[int] = []
        out_doc: list[int] = []
        dls: list[int] = []
        for i, text in enumerate(texts):
            toks = findall(text)
            if stopwords:
                toks = [t for t in toks if t not in stopwords]
            if stemmer is not None:
                toks = [stemmer(t) for t in toks]
            dl = len(toks)
            counts = Counter(toks)
            d = int(doc_ids[i])
            terms.extend(counts.keys())
            tfs.extend(counts.values())
            out_doc.extend([d] * len(counts))
            dls.extend([dl] * len(counts))

        doc_arr = np.asarray(out_doc, dtype=np.int64)
        return pa.table(
            {
                "term": pa.array(terms, type=pa.string()),
                "doc_id": pa.array(doc_arr, type=pa.int64()),
                "tf": pa.array(np.asarray(tfs, dtype=np.int32)),
                "dl": pa.array(np.asarray(dls, dtype=np.int32)),
                "salt": pa.array((doc_arr // self.salt_range).astype(np.int32)),
            },
            schema=POSTINGS_SCHEMA,
        )


class TokenizeRuns:
    """Combiner variant: per batch, emit ONE pre-encoded run row per
    term instead of one row per (term, doc) — the map-side combine that
    makes the sort(tid) shuffle move ~batch_size× fewer rows (and
    compressed binary payloads instead of raw int64 columns).  This is
    the shuffle-volume lever at 10^12-turn scale: the wide exchange
    carries (int64 tid, mostly-null term, salt, df, 3 varint blobs) per
    (term, batch), not 30+ bytes per posting and not a term string per
    run row.

    Term strings ride the exchange only on FIRST sight per actor (the
    ``seen`` set, fresh per group pipeline): every term present in a
    group is guaranteed one string-bearing run row for the merge to
    recover, while hot terms stop paying string bytes after each
    actor's first batch.  The set is capped — past ``SEEN_CAP`` unique
    terms an actor just always emits the string (graceful, bounded
    memory at open-vocabulary scale).

    Output schema == stages.segments.RUN_SCHEMA: downstream is one
    sort(tid) + whole-partition merge per group (runs are re-sorted by
    doc_id at merge, so input file order never matters).
    """

    SEEN_CAP = 4_000_000

    def __init__(self, config: IndexConfig):
        self.inner = TokenizePostings(config)
        self.salt_range = config.salt_range
        self.seen: set[str] = set()

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        from ..functions.codec import varint_encode, varint_nbytes
        from .segments import RUN_SCHEMA, term_ids

        # tokenize straight into flat token/doc arrays (no per-doc
        # Counter: tf counting falls out of the (term, doc) sort below)
        texts_col = batch.column("text")
        inner = self.inner
        if inner.lower:
            import pyarrow.compute as pc

            texts_col = pc.utf8_lower(texts_col)
        texts = texts_col.to_pylist()
        batch_doc_ids = batch.column("doc_id").to_numpy()
        findall = inner.findall
        stopwords = inner.stopwords
        stemmer = inner.stemmer
        all_tokens: list[str] = []
        doc_lens = np.empty(len(texts), dtype=np.int64)
        for i, text in enumerate(texts):
            toks = findall(text)
            if stopwords:
                toks = [t for t in toks if t not in stopwords]
            if stemmer is not None:
                toks = [stemmer(t) for t in toks]
            doc_lens[i] = len(toks)
            all_tokens.extend(toks)

        tok_doc = np.repeat(batch_doc_ids, doc_lens)
        tok_dl = np.repeat(doc_lens, doc_lens).astype(np.uint64)
        codes_all, uniq = pd.factorize(pd.Series(all_tokens, dtype=object), sort=False)
        # sort token occurrences by (term, doc); equal (term, doc) runs
        # are then contiguous → tf = run length
        order0 = np.lexsort((tok_doc, codes_all))
        c0 = codes_all[order0]
        d0 = tok_doc[order0]
        l0 = tok_dl[order0]
        if c0.size:
            new_run = np.concatenate(
                ([True], (c0[1:] != c0[:-1]) | (d0[1:] != d0[:-1]))
            )
            run_starts = np.flatnonzero(new_run)
            run_ends = np.concatenate((run_starts[1:], [c0.size]))
            tf_s = (run_ends - run_starts).astype(np.uint64)
            codes_s = c0[run_starts]
            doc_s = d0[run_starts].astype(np.int64)
            dl_s = l0[run_starts]
        else:
            tf_s = np.empty(0, dtype=np.uint64)
            codes_s = np.empty(0, dtype=np.int64)
            doc_s = np.empty(0, dtype=np.int64)
            dl_s = np.empty(0, dtype=np.uint64)
        n_terms = len(uniq)
        bounds = np.searchsorted(codes_s, np.arange(n_terms + 1))
        t_starts = bounds[:-1]

        # doc gaps with per-term absolute resets, then ONE varint encode
        # for the whole batch; per-term byte ranges come from the
        # encoded-length prefix sum (no per-term encode calls)
        gaps = np.empty(doc_s.size, dtype=np.uint64)
        if doc_s.size:
            np.subtract(
                doc_s[1:], doc_s[:-1], out=gaps[1:].view(np.int64), casting="unsafe"
            )
            gaps[t_starts] = doc_s[t_starts].astype(np.uint64)

        def encode_sliced(vals: np.ndarray) -> list[bytes]:
            buf = varint_encode(vals)
            ends = np.cumsum(varint_nbytes(vals))
            byte_bounds = np.concatenate(([0], ends))[bounds]
            return [
                buf[byte_bounds[i] : byte_bounds[i + 1]] for i in range(n_terms)
            ]

        doc_bufs = encode_sliced(gaps)
        tf_bufs = encode_sliced(tf_s)
        dl_bufs = encode_sliced(dl_s)

        df_per_term = np.diff(bounds)
        d0 = doc_s[t_starts] if doc_s.size else np.empty(0, np.int64)
        uniq_arr = np.asarray(uniq, dtype=object)
        tids = term_ids(uniq_arr)
        seen = self.seen
        if len(seen) < self.SEEN_CAP:
            term_out = [t if t not in seen else None for t in uniq_arr]
            seen.update(uniq_arr.tolist())
        else:
            term_out = list(uniq_arr)
        return pa.table(
            {
                "tid": pa.array(tids),
                "term": pa.array(term_out, type=pa.string()),
                "d0": pa.array(d0, type=pa.int64()),
                "df": pa.array(df_per_term.astype(np.int32)),
                "doc_ids": pa.array(doc_bufs, type=pa.binary()),
                "tfs": pa.array(tf_bufs, type=pa.binary()),
                "dls": pa.array(dl_bufs, type=pa.binary()),
            },
            schema=RUN_SCHEMA,
        )
