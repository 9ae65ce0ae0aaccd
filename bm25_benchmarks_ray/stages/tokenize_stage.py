"""Stateful tokenizer stage: actor-pool map_batches producing exploded
postings rows.

One actor = one compiled regex + stopword frozenset + shared LRU stem
cache (the reference stems the unique vocab once per corpus,
/root/reference/utils/__init__.py:104-126; the process-wide cache on
porter2.stem gives the same unique-token-once economy across batches).
Input batch: transcripts with doc_id.  Output batch: one row per
(doc, unique term): term:string, doc_id:int64, tf:int32, dl:int32,
salt:int32.

dl (post-filter token count) is replicated onto every posting row so
segment encoding never needs a doc-length lookup table; salt =
doc_id // salt_range is emitted here so the downstream groupby key is
ready without another pass.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import IndexConfig
from ..functions.tokenizer import TOKEN_RE, resolve_stemmer, resolve_stopwords

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
        self.findall = TOKEN_RE.findall
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


class TokenizeDocLens:
    """Lightweight variant emitting only (doc_id, dl) — used for corpus
    stats paths that do not need postings."""

    def __init__(self, config: IndexConfig):
        self.inner = TokenizePostings(config)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts_col = batch.column("text")
        if self.inner.lower:
            texts_col = pc.utf8_lower(texts_col)
        texts = texts_col.to_pylist()
        findall, stopwords = self.inner.findall, self.inner.stopwords
        dls = np.empty(len(texts), dtype=np.int32)
        for i, text in enumerate(texts):
            toks = findall(text)
            if stopwords:
                toks = [t for t in toks if t not in stopwords]
            dls[i] = len(toks)
        return pa.table(
            {"doc_id": batch.column("doc_id"), "dl": pa.array(dls)}
        )
