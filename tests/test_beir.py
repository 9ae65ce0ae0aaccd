"""BEIR-format ingestion end-to-end: corpus.jsonl → parquet + docmap →
documents-mode index → CLI query/eval with external string ids."""

from __future__ import annotations

import json
import os

import pytest


def _write_beir(d: str, n: int = 30, sub: str | None = None) -> None:
    root = os.path.join(d, sub) if sub else d
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "corpus.jsonl"), "w") as f:
        for i in range(n):
            f.write(
                json.dumps(
                    {
                        "_id": f"DOC-{i:03d}",
                        "title": f"topic{i % 5}",
                        "text": f"document body number {i} about topic{i % 5} "
                                f"with unique term zq{i}",
                    }
                )
                + "\n"
            )
    if sub:
        return
    with open(os.path.join(d, "queries.jsonl"), "w") as f:
        f.write(json.dumps({"_id": "q1", "text": "topic1 body"}) + "\n")
        f.write(json.dumps({"_id": "q2", "text": "zq7 unique"}) + "\n")
    os.makedirs(os.path.join(d, "qrels"), exist_ok=True)
    with open(os.path.join(d, "qrels", "test.tsv"), "w") as f:
        f.write("query-id\tcorpus-id\tscore\n")
        f.write("q1\tDOC-001\t1\n")
        f.write("q2\tDOC-007\t1\n")


def test_corpus_projection_and_docmap(ray_session, tmp_path):
    from bm25_benchmarks_ray.sources.beir import (
        beir_corpus_to_parquet,
        load_docmap,
        read_beir_corpus,
    )

    beir = str(tmp_path / "ds")
    _write_beir(beir)
    rows = read_beir_corpus(beir).to_pandas().sort_values("ext_id")
    assert len(rows) == 30
    assert rows.iloc[1]["ext_id"] == "DOC-001"
    assert rows.iloc[1]["text"].startswith("topic1 document body number 1")

    out = str(tmp_path / "pq")
    beir_corpus_to_parquet(beir, out)
    dm = load_docmap(out)
    assert list(dm["doc_id"]) == list(range(30))
    assert dm["ext_id"].is_monotonic_increasing


def test_distributed_rank_matches_driver_path(ray_session, tmp_path):
    """driver_side_rows=0 forces the sort-rank + hash-join path; the
    documents parquet and docmap must be IDENTICAL to the small path's."""
    import pyarrow.dataset as pads

    from bm25_benchmarks_ray.sources.beir import (
        beir_corpus_to_parquet,
        load_docmap,
    )

    beir = str(tmp_path / "ds")
    _write_beir(beir)
    small = str(tmp_path / "pq_small")
    dist = str(tmp_path / "pq_dist")
    beir_corpus_to_parquet(beir, small)
    beir_corpus_to_parquet(beir, dist, driver_side_rows=0)

    dm_s, dm_d = load_docmap(small), load_docmap(dist)
    assert list(dm_s["doc_id"]) == list(dm_d["doc_id"])
    assert list(dm_s["ext_id"]) == list(dm_d["ext_id"])

    def docs(p):
        return (
            pads.dataset(os.path.join(p, "documents"))
            .to_table()
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )

    a, b = docs(small), docs(dist)
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert list(a["text"]) == list(b["text"])


def test_cqadupstack_union_prefixes(ray_session, tmp_path):
    from bm25_benchmarks_ray.sources.beir import read_beir_corpus

    beir = str(tmp_path / "cqa")
    _write_beir(beir, n=4, sub="android")
    _write_beir(beir, n=3, sub="gis")
    rows = read_beir_corpus(beir).to_pandas()
    assert len(rows) == 7
    assert set(e.split("_")[0] for e in rows["ext_id"]) == {"android", "gis"}


def test_qrels_and_queries_readers(tmp_path):
    from bm25_benchmarks_ray.sources.beir import read_beir_qrels, read_beir_queries

    beir = str(tmp_path / "ds")
    _write_beir(beir)
    qs = read_beir_queries(beir)
    assert qs == [("q1", "topic1 body"), ("q2", "zq7 unique")]
    qrels = read_beir_qrels(beir)  # header skipped
    assert qrels == {"q1": {"DOC-001": 1}, "q2": {"DOC-007": 1}}


def test_cli_beir_index_query_eval(ray_session, tmp_path, capsys):
    from bm25_benchmarks_ray.cli import main

    beir = str(tmp_path / "ds")
    _write_beir(beir)
    idx = str(tmp_path / "idx")
    assert main(["index", "--mode", "beir", "--input", beir, "--index", idx]) == 0
    out_tsv = str(tmp_path / "res.tsv")
    assert main(
        ["query", "--index", idx, "--queries", os.path.join(beir, "queries.jsonl"),
         "--output", out_tsv, "--top-k", "5"]
    ) == 0
    import pandas as pd

    res = pd.read_csv(out_tsv, sep="\t")
    assert res["doc_id"].str.startswith("DOC-").all()  # external ids
    # q2 asks for the zq7 unique term: DOC-007 must be rank 1
    top = res[(res["qid"] == "q2") & (res["rank"] == 1)]
    assert list(top["doc_id"]) == ["DOC-007"]
    capsys.readouterr()
    assert main(
        ["eval", "--index", idx, "--queries", beir,
         "--qrels", os.path.join(beir, "qrels", "test.tsv")]
    ) == 0
    scores = json.loads(capsys.readouterr().out)
    # both judged docs are findable at rank 1 → perfect ndcg@10
    assert scores["ndcg"]["NDCG@10"] == 1.0


def test_pyserini_export_roundtrip(ray_session, tmp_path):
    """Pyserini JsonCollection export: one {"id","contents"} record per
    doc, readable back as JSONL."""
    import glob
    import json as _json

    import ray.data as rd

    from bm25_benchmarks_ray.sources.export import export_pyserini_jsonl

    ds = rd.from_items(
        [{"doc_id": i, "text": f"text number {i}"} for i in range(25)]
    ).repartition(3)
    out = str(tmp_path / "pyserini")
    export_pyserini_jsonl(ds, out)
    rows = []
    for f in glob.glob(out + "/*.json*"):
        with open(f) as fh:
            for line in fh:
                if line.strip():
                    rows.append(_json.loads(line))
    assert len(rows) == 25
    assert sorted(int(r["id"]) for r in rows) == list(range(25))
    assert all(set(r) == {"id", "contents"} for r in rows)
    assert rows[0]["contents"].startswith("text number")


def test_trec_run_export(ray_session, tmp_path):
    import pandas as pd

    from bm25_benchmarks_ray.sources.export import export_trec_run

    res = pd.DataFrame(
        {
            "qid": ["q1", "q0", "q0"],
            "doc_id": [7, 3, 5],
            "rank": [1, 1, 2],
            "score": [1.25, 2.5, 2.0],
        }
    )
    out = tmp_path / "run.trec"
    n = export_trec_run(res, str(out), tag="t")
    lines = out.read_text().splitlines()
    assert n == 3
    assert lines[0] == "q0 Q0 3 1 2.500000 t"
    assert lines[1] == "q0 Q0 5 2 2.000000 t"
    assert lines[2] == "q1 Q0 7 1 1.250000 t"
