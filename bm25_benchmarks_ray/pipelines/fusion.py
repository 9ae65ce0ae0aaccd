"""Reciprocal-rank fusion (RRF): merge per-query ranked lists from
several retrieval systems into one fused ranking.

The standard hybrid-retrieval combiner (Cormack/Clarke/Buettcher, SIGIR
2009): ``fused(q, d) = Σ_lists 1 / (c + rank_list(q, d))`` over the
lists that contain ``d``, with ``c = 60`` the canonical constant.  The
reference repo benchmarks sparse BM25 engines only; fusing its BM25
ranking with the dense cosine ranking (pipelines/similarity.py) is the
natural hybrid a training-data/retrieval stack runs today, so it is a
first-class operator here.

Shape (the repo's standard exchange discipline):

1. each input list maps to ``(qid, doc_id, contrib)`` rows —
   ``contrib = 1/(c + rank)`` — with at most k rows per (query, list),
   so the union carries ``Q × k × lists`` rows total, independent of
   corpus size;
2. ONE hash exchange on qid (`dedup._bucket_sorted` explicit-boundary
   sort — every query lands wholly in one partition) and ONE
   whole-partition numpy kernel sums contributions per (qid, doc_id)
   and emits the per-query top-k with rank — no per-group dispatch
   (the windows.py:13-21 rule).

Determinism: the fused score is rounded to 6 decimals before ranking
and ties break on ascending doc_id — the same cross-engine rule every
retrieval oracle here uses.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

RRF_C = 60.0


def _contrib_table(tbl: pa.Table, c: float, k_in: int | None) -> pa.Table:
    """(qid, doc_id, rank) -> (qid, doc_id, contrib) with rank <= k_in."""
    qid = tbl.column("qid").to_numpy(zero_copy_only=False)
    doc = tbl.column("doc_id").to_numpy()
    rank = tbl.column("rank").to_numpy()
    if k_in is not None:
        keep = rank <= k_in
        qid, doc, rank = qid[keep], doc[keep], rank[keep]
    return pa.table(
        {
            "qid": pa.array(qid, type=pa.string()),
            "doc_id": pa.array(doc, type=pa.int64()),
            "contrib": pa.array(1.0 / (c + rank.astype(np.float64))),
        }
    )


def _fused_block(batch: pa.Table, k: int) -> pa.Table:
    """Whole-partition kernel: sum contribs per (qid, doc_id), then
    per-qid top-k by (rrf desc, doc_id asc) with 1-based rank.  Groups
    on the REAL qid values, so 64-bit hash collisions in the exchange
    key stay exact."""
    empty = pa.table(
        {
            "qid": pa.array([], type=pa.string()),
            "doc_id": pa.array([], type=pa.int64()),
            "rrf": pa.array([], type=pa.float64()),
            "rank": pa.array([], type=pa.int64()),
        }
    )
    if batch.num_rows == 0:
        return empty
    qcodes, quniq = pd.factorize(
        batch.column("qid").to_numpy(zero_copy_only=False), sort=True
    )
    doc = batch.column("doc_id").to_numpy()
    contrib = batch.column("contrib").to_numpy()
    # sum per (qid, doc): one lexsort + reduceat over contiguous runs
    order = np.lexsort((doc, qcodes))
    qs, ds_, cs = qcodes[order], doc[order], contrib[order]
    new_run = np.empty(qs.size, dtype=bool)
    new_run[0] = True
    new_run[1:] = (qs[1:] != qs[:-1]) | (ds_[1:] != ds_[:-1])
    starts = np.flatnonzero(new_run)
    rrf = np.round(np.add.reduceat(cs, starts), 6)
    g_q, g_d = qs[starts], ds_[starts]
    # per-qid top-k on the fused score
    order2 = np.lexsort((g_d, -rrf, g_q))
    qq, dd, ss = g_q[order2], g_d[order2], rrf[order2]
    nr = np.empty(qq.size, dtype=bool)
    nr[0] = True
    nr[1:] = qq[1:] != qq[:-1]
    run_start = np.flatnonzero(nr)
    run_id = np.cumsum(nr) - 1
    pos = np.arange(qq.size) - run_start[run_id]
    keep = pos < k
    return pa.table(
        {
            "qid": pa.array(quniq[qq[keep]], type=pa.string()),
            "doc_id": pa.array(dd[keep], type=pa.int64()),
            "rrf": pa.array(ss[keep], type=pa.float64()),
            "rank": pa.array(pos[keep] + 1, type=pa.int64()),
        }
    )


def rrf_fuse(
    lists: list[pa.Table | rd.Dataset],
    k: int = 10,
    c: float = RRF_C,
    k_in: int | None = None,
) -> rd.Dataset:
    """Fuse ranked lists — each ``(qid: string, doc_id: int64,
    rank: int)`` with rank 1-based within qid — into the per-query
    RRF top-``k``: ``(qid, doc_id, rrf, rank)``.

    ``k_in`` caps the rank depth consumed from each input list (RRF is
    conventionally run over each system's top-N); ``None`` uses every
    row given."""
    from .dedup import _bucket_sorted, fast_hash_u64

    parts: list[rd.Dataset] = []
    for lst in lists:
        if isinstance(lst, pa.Table):
            parts.append(rd.from_arrow(_contrib_table(lst, c, k_in)))
        else:
            parts.append(
                lst.map_batches(
                    lambda b, _c=c, _ki=k_in: _contrib_table(b, _c, _ki),
                    batch_format="pyarrow",
                )
            )
    union = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]

    def add_hk(batch: pa.Table) -> pa.Table:
        hk = fast_hash_u64(batch.column("qid").to_numpy(zero_copy_only=False))
        return batch.append_column(
            "_hk", pa.array(hk.view(np.int64), type=pa.int64())
        )

    hashed = union.map_batches(add_hk, batch_format="pyarrow")
    return _bucket_sorted(hashed, ["_hk"], prehashed=True).map_batches(
        lambda b: _fused_block(b.drop_columns(["_hk"]), k),
        batch_format="pyarrow",
        batch_size=None,
    )
