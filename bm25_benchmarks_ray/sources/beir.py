"""BEIR-format ingestion: corpus.jsonl / queries.jsonl / qrels TSV.

The reference consumes BEIR datasets through the beir package's loaders
plus its own cqadupstack merge (/root/reference/utils/beir.py:38-112 and
benchmark/on_bm25s.py:41-66).  Here ingestion is Ray-Data-native:
``corpus.jsonl`` streams through ``read_json`` → a title+" "+text
projection (the reference's flatten, on_bm25s.py:54-59) → documents-mode
parquet with dense int doc ids ranked by external id, plus a
``docmap.parquet`` (doc_id ↔ ext_id) so query results join back to BEIR
string ids for qrels evaluation.

Scale note: below ``DRIVER_SIDE_ROWS`` only the (ext_id) column is
collected driver-side to rank ids (same budget as the conv-offsets
table).  Past it, ranking is fully distributed: a sort of the id
column alone, per-block rank offsets from the sorted blocks' row
counts (a zip-with-index over block refs — tiny driver state, one int
per block), and a hash join to attach doc_ids to the streaming text.
No full id column ever lands on the driver on that path.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

DOCMAP_FILE = "docmap.parquet"


def _corpus_files(beir_dir: str) -> list[str]:
    p = os.path.join(beir_dir, "corpus.jsonl")
    if os.path.exists(p):
        return [p]
    # cqadupstack layout: <dir>/<sub>/corpus.jsonl — disjoint union with
    # sub-corpus key prefixes (reference merge_cqa_dupstack)
    subs = sorted(glob.glob(os.path.join(beir_dir, "*", "corpus.jsonl")))
    if not subs:
        raise FileNotFoundError(f"no corpus.jsonl under {beir_dir}")
    return subs


def read_beir_corpus(beir_dir: str) -> rd.Dataset:
    """(ext_id, text) Dataset; text is the reference's title+' '+text
    flatten.  cqadupstack sub-corpora get '<sub>_' id prefixes."""
    files = _corpus_files(beir_dir)
    multi = len(files) > 1

    def project(prefix: str):
        def f(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            ids = pc.cast(batch.column("_id"), pa.string())
            if prefix:
                ids = pc.binary_join_element_wise(
                    pa.array([prefix] * batch.num_rows), ids, "_"
                )
            title = (
                pc.cast(batch.column("title"), pa.string())
                if "title" in batch.schema.names
                else pa.array([""] * batch.num_rows, type=pa.string())
            )
            text = pc.cast(batch.column("text"), pa.string())
            full = pc.utf8_trim_whitespace(
                pc.binary_join_element_wise(
                    pc.fill_null(title, ""), pc.fill_null(text, ""), " "
                )
            )
            return pa.table({"ext_id": ids, "text": full})

        return f

    parts = []
    for f in files:
        prefix = os.path.basename(os.path.dirname(f)) if multi else ""
        parts.append(rd.read_json(f).map_batches(project(prefix), batch_format="pyarrow"))
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


# rows above which id ranking goes fully distributed (below: collect
# just the id column, same pattern as index_build.DRIVER_SIDE_ROWS)
DRIVER_SIDE_ROWS = 20_000_000


def _ranked_docmap_distributed(ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, ext_id) with doc_id = global rank under ORDER BY ext_id,
    computed WITHOUT collecting the id column: sort the ids, read each
    sorted block's row count (one int per block on the driver), prefix-
    sum those into per-block rank offsets, and stamp ranks per block —
    the classic zip-with-index."""
    ids_sorted = ds.select_columns(["ext_id"]).sort("ext_id").materialize()
    bundles = list(ids_sorted.iter_internal_ref_bundles())
    refs, counts = [], []
    for b in bundles:
        for ref, meta in zip(b.block_refs, b.metadata):
            refs.append(ref)
            counts.append(meta.num_rows)
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1])).astype(np.int64)

    @ray.remote
    def stamp(block, off: int) -> pa.Table:
        t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        return pa.table(
            {
                "doc_id": pa.array(
                    off + np.arange(t.num_rows, dtype=np.int64), type=pa.int64()
                ),
                "ext_id": t.column("ext_id"),
            }
        )

    return rd.from_arrow_refs(
        [stamp.remote(r, int(o)) for r, o in zip(refs, offsets)]
    )


def beir_corpus_to_parquet(
    beir_dir: str, out_dir: str, driver_side_rows: int = DRIVER_SIDE_ROWS
) -> str:
    """Stream the BEIR corpus into documents-mode parquet: (doc_id,
    text) ranked by ext_id, plus a docmap (doc_id ↔ ext_id).  Returns
    out_dir.  Above ``driver_side_rows`` ids rank distributed and
    attach via hash join (no driver-side id collection)."""
    os.makedirs(out_dir, exist_ok=True)
    ds = read_beir_corpus(beir_dir)
    docs_dir = os.path.join(out_dir, "documents")
    os.makedirs(docs_dir, exist_ok=True)

    n = ds.count()
    if n <= driver_side_rows:
        # small path: rank the id column driver-side, broadcast the
        # SORTED Arrow array (compact buffers, no GB-scale Python dict
        # — the dedup._broadcast_attach shape); each task maps ids with
        # one C-kernel hash lookup whose position IS the rank
        ids = ds.select_columns(["ext_id"]).to_pandas()["ext_id"]
        order = pd.Index(sorted(ids))
        docmap = pd.DataFrame(
            {"doc_id": np.arange(len(order), dtype=np.int64), "ext_id": order}
        )
        pq.write_table(
            pa.Table.from_pandas(docmap, preserve_index=False),
            os.path.join(out_dir, DOCMAP_FILE),
        )
        rank_ref = ray.put(pa.array(order, type=pa.string()))

        def add_ids(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            sorted_ids = ray.get(rank_ref)
            doc_id = pc.index_in(
                batch.column("ext_id"), value_set=sorted_ids
            ).cast(pa.int64())
            return pa.table(
                {
                    "doc_id": doc_id,
                    "text": batch.column("text"),
                }
            )

        ds.map_batches(add_ids, batch_format="pyarrow").write_parquet(docs_dir)
        return out_dir

    # distributed path: sort-rank the id column, hash-join ids onto text
    docmap_ds = _ranked_docmap_distributed(ds)
    dm_dir = os.path.join(out_dir, DOCMAP_FILE)
    if os.path.isfile(dm_dir):
        os.remove(dm_dir)
    docmap_ds.write_parquet(dm_dir)  # a directory: load_docmap handles both

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    joined = ds.join(
        docmap_ds, join_type="inner", num_partitions=max(2, cpus), on=("ext_id",)
    )
    joined.select_columns(["doc_id", "text"]).write_parquet(docs_dir)
    return out_dir


def read_beir_queries(path: str) -> list[tuple[str, str]]:
    """queries.jsonl (or a dir containing it) → [(qid, text)]."""
    if os.path.isdir(path):
        path = os.path.join(path, "queries.jsonl")
    import json

    out = []
    with open(path) as f:
        for line in f:
            if not line.strip():
                continue
            d = json.loads(line)
            out.append((str(d["_id"]), d.get("text", "")))
    return out


def read_beir_qrels(path: str, split: str = "test") -> dict[str, dict[str, int]]:
    """qrels TSV (query-id<TAB>corpus-id<TAB>score, header row allowed);
    accepts the file itself, a qrels/ dir, or a dataset dir."""
    if os.path.isdir(path):
        cand = os.path.join(path, "qrels", f"{split}.tsv")
        path = cand if os.path.exists(cand) else os.path.join(path, f"{split}.tsv")
    qrels: dict[str, dict[str, int]] = {}
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 3:
                continue
            try:
                rel = int(float(parts[2]))
            except ValueError:
                continue  # header row
            qrels.setdefault(parts[0], {})[parts[1]] = rel
    return qrels


def load_docmap(path: str) -> pd.DataFrame | None:
    """docmap from a corpus dir or index dir (doc_id, ext_id) — a single
    parquet file (driver-side rank path) or a directory of parts
    (distributed rank path)."""
    import pyarrow.dataset as pads

    cands = [path] if os.path.basename(path) == DOCMAP_FILE else []
    cands.append(os.path.join(path, DOCMAP_FILE))
    for cand in cands:
        if os.path.isfile(cand):
            return pq.read_table(cand).to_pandas()
        if os.path.isdir(cand) and glob.glob(os.path.join(cand, "*.parquet")):
            return (
                pads.dataset(cand)
                .to_table()
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )
    return None


def attach_ext_ids(res: pd.DataFrame, docmap: pd.DataFrame) -> pd.DataFrame:
    """Map internal doc_id → BEIR ext_id on a results table."""
    m = dict(zip(docmap["doc_id"], docmap["ext_id"]))
    out = res.copy()
    out["ext_id"] = out["doc_id"].map(m)
    return out
