"""Corpus exporters.

Pyserini JsonCollection export — the reference's
``convert_to_pyserini_records`` / ``create_pyserini_json``
(/root/reference/benchmark/on_pyserini.py:70-145) emits one JSON record
``{"id": <doc id>, "contents": <flattened text>}`` per doc.  Here it is
a streaming Ray Data write: one ``.jsonl`` shard per block, no driver
materialization, resumable like any partitioned output.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def export_pyserini_jsonl(
    ds: rd.Dataset,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Write the corpus as a Pyserini JsonCollection directory."""
    import pyarrow.compute as pc

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": pc.cast(batch.column(id_col), pa.string()),
                "contents": pc.cast(batch.column(text_col), pa.string()),
            }
        )

    ds.map_batches(project, batch_format="pyarrow").write_json(out_dir)


def export_trec_run(
    results: pa.Table | "object",
    path: str,
    tag: str = "ray-bm25",
) -> int:
    """Write retrieval results as a TREC run file — the 6-column
    ``qid Q0 doc_id rank score tag`` format trec_eval and the BEIR/PISA
    tooling family consume (the reference's PISA runs emit this shape,
    /root/reference/benchmark/on_pisa.py).  Accepts the (qid, doc_id,
    rank, score) table produced by :func:`pipelines.query.search` (a
    Dataset, pyarrow Table, or pandas frame); rows are written in
    (qid, rank) order.  Returns the number of lines written."""
    if hasattr(results, "to_pandas"):
        df = results.to_pandas()
    else:
        df = results
    df = df.sort_values(["qid", "rank"], kind="mergesort")
    n = 0
    with open(path, "w") as fh:
        for qid, doc, rank, score in zip(
            df["qid"], df["doc_id"], df["rank"], df["score"]
        ):
            fh.write(f"{qid} Q0 {doc} {rank} {score:.6f} {tag}\n")
            n += 1
    return n
