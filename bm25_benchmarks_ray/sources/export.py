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
