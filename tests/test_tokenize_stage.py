"""Tokenizer stage (actor-pool map_batches) vs the pure-function oracle."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from bm25_benchmarks_ray.config import IndexConfig
from bm25_benchmarks_ray.functions.tokenizer import term_frequencies
from bm25_benchmarks_ray.sources.transcripts import synthesize_transcripts
from bm25_benchmarks_ray.stages.tokenize_stage import TokenizePostings


def test_postings_match_oracle(ray_session):
    table = synthesize_transcripts(200, seed=11)
    table = table.append_column(
        "doc_id", pa.array(range(table.num_rows), type=pa.int64())
    )
    cfg = IndexConfig(salt_range=64)
    out = (
        rd.from_arrow(table)
        .map_batches(
            TokenizePostings,
            fn_constructor_args=(cfg,),
            batch_format="pyarrow",
            batch_size=64,
            concurrency=2,
        )
        .to_pandas()
    )
    got = {}
    for r in out.itertuples(index=False):
        got[(r.term, int(r.doc_id))] = (int(r.tf), int(r.dl), int(r.salt))

    expected = {}
    for doc_id, text in enumerate(table.column("text").to_pylist()):
        counts, dl = term_frequencies(text)
        for term, tf in counts.items():
            expected[(term, doc_id)] = (tf, dl, doc_id // 64)
    assert got == expected


def test_token_quad_flat_stream_matches_reference_pipeline():
    """_token_quad's dictionary-encoded stream must equal the per-token
    reference pipeline (lower -> regex split -> stopwords -> stem) on a
    batch mixing ASCII and non-ASCII docs: ASCII rows ride the Arrow
    RE2 fast path, non-ASCII rows the exact Python-re path, merged
    under one dictionary."""
    import numpy as np
    import pyarrow as pa

    from bm25_benchmarks_ray.config import IndexConfig
    from bm25_benchmarks_ray.functions.tokenizer import tokenize_text
    from bm25_benchmarks_ray.stages.tokenize_stage import (
        TokenizePostings,
        _token_quad,
    )

    texts = [
        "The Running runner RUNS; dogs are dogged today!",
        "",
        "stopwords only: the and of to",
        "tokyo 東京 mixed unicode doc runs again",  # non-ASCII row
        "naïve café au lait",  # non-ASCII row
        "plain ascii tail doc with runs and dogs",
    ]
    batch = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()),
         "text": pa.array(texts, type=pa.string())}
    )
    inner = TokenizePostings(IndexConfig())
    codes, uniq, doc_of, dls = _token_quad(batch.column("text"), inner)

    ref_flat, ref_lens, ref_docof = [], [], []
    for i, s in enumerate(texts):
        toks = tokenize_text(s, inner.stopwords, inner.stemmer, inner.lower)
        ref_flat.extend(toks)
        ref_lens.append(len(toks))
        ref_docof.extend([i] * len(toks))
    assert list(uniq[codes]) == ref_flat
    assert list(doc_of) == ref_docof
    assert list(dls) == ref_lens
    # every dictionary entry is used (no zero-occurrence terms leak
    # into the run rows)
    assert set(np.unique(codes)) == set(range(len(uniq)))
