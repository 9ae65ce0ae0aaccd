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
