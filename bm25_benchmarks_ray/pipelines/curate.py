"""End-to-end curation composite: the flagship "make a training corpus"
pipeline that chains the engine's curation operators the way a real
100-TB run would —

    quality filter + language filter     (ONE fused text pass)
    -> exact dedup                       (the only shuffle)
    -> deterministic stratified sample   (hash filter, no shuffle)

The fusion matters at scale: quality scoring, language ID, the dedup
content hash, and the sample decision are all per-row functions of the
same text/id, so they are computed in a single ``map_batches`` pass
(one read of each document) instead of four.  Only survivor selection
(groupby on the content hash) moves data.  Every stage reuses the
per-operator semantics that already have DuckDB replicas, so the whole
composite is value-hash-checkable end to end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


from .dedup import fast_hash_u64, md5_u64
from .sampling import MOD


def _source_threshold(sources, rate_even: float, rate_odd: float) -> np.ndarray:
    """Per-row sample threshold: even-numbered sources (src0, src2, …)
    keep at rate_even, odd at rate_odd."""
    out = np.empty(len(sources), dtype=np.uint64)
    te, to = int(round(rate_even * MOD)), int(round(rate_odd * MOD))
    for i, s in enumerate(sources):
        try:
            num = int(s[3:])
        except (ValueError, TypeError):
            num = 1
        out[i] = te if num % 2 == 0 else to
    return out


def curate(
    ds: rd.Dataset,
    quality_min: float = 0.5,
    lang_threshold: float = 0.08,
    rate_even: float = 1.0,
    rate_odd: float = 0.3,
    seed: int = 7,
) -> rd.Dataset:
    """Curated corpus: docs with quality >= ``quality_min`` whose
    stopword ratio marks them English, exact-deduplicated (min doc_id
    survives per distinct text), then stratified-sampled per source.
    Returns (doc_id, source, quality)."""

    def fused(batch: pa.Table) -> pa.Table:
        from .text_analysis import _quality_from_col, _text_array

        col = _text_array(batch.column("text"))
        texts = col.to_pylist()  # needed once for the content hash
        # shared quality formula (text_analysis._quality_from_col):
        # one definition for quality_score / curate / grouped top-k
        _n_tok, _n_chars, _punct, swr, quality = _quality_from_col(col)
        keep = (quality >= quality_min) & (np.round(swr, 6) >= lang_threshold)
        ids = batch.column("doc_id").to_numpy()
        sources = batch.column("source").to_pylist()
        # sample decision computed here (one text pass) but APPLIED
        # after dedup, on the surviving row's own bit
        thr = _source_threshold(sources, rate_even, rate_odd)
        samp = (md5_u64([str(i) for i in ids], seed) % np.uint64(MOD)) < thr
        tbl = pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "source": pa.array(sources, type=pa.string()),
                "quality": pa.array(quality, type=pa.float64()),
                "h": pa.array(fast_hash_u64(texts).view(np.int64), type=pa.int64()),
                "samp": pa.array(samp),
            }
        )
        return tbl.filter(pa.array(keep))

    def survivors_block(batch: pa.Table) -> pa.Table:
        """Min-doc_id survivor per content hash for EVERY hash in the
        sorted partition in one pass — no per-group UDF dispatch (the
        group count here is ~the distinct-document count)."""
        if batch.num_rows == 0:
            return batch.drop_columns(["h", "samp"])
        h = batch.column("h").to_numpy()
        doc = batch.column("doc_id").to_numpy()
        order = np.lexsort((doc, h))
        hs = h[order]
        first = np.empty(hs.size, dtype=bool)
        first[0] = True
        first[1:] = hs[1:] != hs[:-1]
        keep_rows = order[first]
        out = batch.take(pa.array(np.sort(keep_rows)))
        out = out.filter(out.column("samp"))
        return out.drop_columns(["h", "samp"])

    from .dedup import _bucket_sorted

    fused_rows = ds.select_columns(["doc_id", "text", "source"]).map_batches(
        fused, batch_format="pyarrow", batch_size=16384
    )
    return _bucket_sorted(fused_rows, ["h"], prehashed=True).map_batches(
        survivors_block, batch_format="pyarrow", batch_size=None
    )
