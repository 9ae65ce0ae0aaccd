"""Driver-contract implementation behind ``__ray_entry__.py``.

Each ``queries()`` entry is a Ray Data pipeline over the shared test
tables; each ``oracle_sql()`` entry is the ANSI-SQL equivalent DuckDB
runs on the same parquet.  BM25 pipelines here run with
``stemmer="none"`` so the SQL oracle can replicate tokenization exactly
(DuckDB has no offline Snowball; the stemmed path is covered by the
pytest oracle instead, tests/oracle.py).  Scores are rounded to 6
decimals on BOTH sides and ranking uses the rounded score so the
driver's value-hash comparison is immune to float accumulation order.

Ray is initialised by the caller — nothing here calls ray.init().
"""

from __future__ import annotations

import hashlib
import os
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

from .config import IndexConfig
from .functions.bm25 import BM25Params
from .functions.tokenizer import STOPWORDS_EN, tokenize_text
from .pipelines.index_build import build_index
from .pipelines.query import search

CACHE_ROOT = "/tmp/bm25rd/index_cache"

# BM25 pipelines checked against DuckDB: no stemmer (see module doc).
SQL_CFG = IndexConfig(stopwords="en", stemmer="none")

# Fixed query set over the documents-table vocabulary: multi-term,
# repeated-term (occurrence weighting), stopword-bearing, and an
# OOV-bearing query (frozen-vocab drop, SURVEY.md §2.2 M7).
DOC_QUERIES: list[tuple[str, str]] = [
    ("q00", "table scan fast"),
    ("q01", "hash join merge batch"),
    ("q02", "the big query window sort"),
    ("q03", "stream stream group value"),
    ("q04", "customer order line part"),
    ("q05", "slow table filter key agg"),
    ("q06", "spark data column row"),
    ("q07", "small sort window zzunknownterm"),
]

_STOPWORDS_SQL = ", ".join(f"'{w}'" for w in sorted(STOPWORDS_EN))


def _docs_path(sf_dir: str) -> str:
    return os.path.join(sf_dir, "documents.parquet")


def documents_index(sf_dir: str, cfg: IndexConfig = SQL_CFG) -> str:
    """Build (once, cached under /tmp) the index over sf_dir's documents
    table; returns the index dir."""
    p = _docs_path(sf_dir)
    key = hashlib.sha256(
        f"{p}|{os.path.getmtime(p)}|{cfg.fingerprint()}".encode()
    ).hexdigest()[:16]
    idx = os.path.join(CACHE_ROOT, key)
    build_index(p, idx, cfg, mode="documents")  # no-op if complete
    return idx


# ---------------------------------------------------------------------
# tokenization-level operators (SURVEY.md §2.2 M2-M5, §2.4 A1-A3)
# ---------------------------------------------------------------------

def _tokens_ds(sf_dir: str):
    import ray.data as rd

    from .stages.tokenize_stage import TokenizePostings

    ds = rd.read_parquet(_docs_path(sf_dir), columns=["doc_id", "text"])
    return ds.map_batches(
        TokenizePostings,
        fn_constructor_args=(SQL_CFG,),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def q_tokenize_tf(sf_dir: str):
    """(doc_id, term, tf) postings (reference tokenize + tf count,
    /root/reference/utils/__init__.py:59-96)."""

    def cast(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "term": b.column("term"),
                "tf": b.column("tf").cast(pa.int64()),
            }
        )

    return _tokens_ds(sf_dir).map_batches(cast, batch_format="pyarrow")


def q_doc_lengths(sf_dir: str):
    """(doc_id, dl): post-filter token count per doc (the reference's
    per-doc len(ids), on_bm25s.py:116-121).  dl == Σ tf over the doc's
    terms, so this is a plain distributed aggregate over postings."""
    from ray.data.aggregate import Sum

    return (
        _tokens_ds(sf_dir)
        .map_batches(
            lambda b: pa.table(
                {"doc_id": b.column("doc_id"), "tf": b.column("tf").cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .groupby("doc_id")
        .aggregate(Sum("tf", alias_name="dl"))
    )


def q_term_df(sf_dir: str):
    """(term, df) from the built index's vocab table — exercises the
    whole segment build + finalize (SURVEY.md §2.4 A2)."""
    import ray.data as rd

    idx = documents_index(sf_dir)
    return rd.read_parquet(os.path.join(idx, "vocab"))


def q_corpus_stats(sf_dir: str):
    """One-row (num_docs, total_len, avgdl) from index stats
    (SURVEY.md §2.4 A1/A3)."""
    from .state.manifest import Manifest

    idx = documents_index(sf_dir)
    st = Manifest.load(idx).stats
    return pa.table(
        {
            "num_docs": pa.array([st["num_docs"]], type=pa.int64()),
            "total_len": pa.array([st["total_len"]], type=pa.int64()),
            "avgdl": pa.array([float(st["avgdl"])], type=pa.float64()),
        }
    )


# ---------------------------------------------------------------------
# full BM25 retrieval, all five variants (SURVEY.md §2.6)
# ---------------------------------------------------------------------

def q_bm25_topk(sf_dir: str, method: str, k: int = 10):
    idx = documents_index(sf_dir)
    res = search(
        idx,
        DOC_QUERIES,
        params=BM25Params(method=method),
        k=k,
        cfg=SQL_CFG,
        join_back=False,
    ).to_pandas()
    # deterministic cross-engine ranking: rounded score desc, doc_id asc
    res["score"] = res["score"].round(6)
    res = res.sort_values(["qid", "score", "doc_id"], ascending=[True, False, True])
    res["rank"] = res.groupby("qid").cumcount() + 1
    return pa.table(
        {
            "qid": pa.array(res["qid"], type=pa.string()),
            "doc_id": pa.array(res["doc_id"], type=pa.int64()),
            "rank": pa.array(res["rank"].astype(np.int64)),
            "score": pa.array(res["score"], type=pa.float64()),
        }
    )


# ---------------------------------------------------------------------
# SQL oracle generation
# ---------------------------------------------------------------------

TOKENS_CTE = f"""
tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\w\\w+')) AS term
  FROM documents
),
kept AS (
  SELECT doc_id, term FROM tok WHERE term NOT IN ({_STOPWORDS_SQL})
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM kept GROUP BY doc_id, term
),
dl AS (
  SELECT doc_id, count(*)::BIGINT AS dl FROM kept GROUP BY doc_id
),
dfreq AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM kept GROUP BY term
),
stats AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT AS num_docs,
         (SELECT count(*) FROM kept)::BIGINT AS total_len,
         (SELECT count(*) FROM kept)::DOUBLE
           / (SELECT count(*) FROM documents) AS avgdl
)"""


def _idf_sql(method: str) -> str:
    n, df = "stats.num_docs", "dfreq.df"
    return {
        "lucene": f"ln(1 + ({n} - {df} + 0.5) / ({df} + 0.5))",
        "atire": f"ln({n}::DOUBLE / {df})",
        "robertson": f"ln(({n} - {df} + 0.5) / ({df} + 0.5))",
        "bm25l": f"ln(({n} + 1.0) / ({df} + 0.5))",
        "bm25+": f"ln(({n} + 1.0) / {df})",
    }[method]


def _shape_sql(method: str, k1: float, b: float, delta: float) -> str:
    norm = f"(1 - {b} + {b} * dl.dl / stats.avgdl)"
    if method in ("lucene", "atire", "robertson"):
        return f"(tf.tf * ({k1} + 1.0) / (tf.tf + {k1} * {norm}))"
    if method == "bm25l":
        ctd = f"(tf.tf / {norm})"
        return f"(({k1} + 1.0) * ({ctd} + {delta}) / ({k1} + {ctd} + {delta}))"
    return f"(({k1} + 1.0) * tf.tf / ({k1} * {norm} + tf.tf) + {delta})"


def _s0(method: str, k1: float, delta: float) -> float:
    if method == "bm25l":
        return (k1 + 1.0) * delta / (k1 + delta)
    if method == "bm25+":
        return delta
    return 0.0


def _query_values_sql() -> str:
    """(qid, term, w) VALUES rows: the fixed query set tokenized with the
    same no-stem pipeline, occurrence-weighted."""
    rows = []
    for qid, text in DOC_QUERIES:
        for term, w in Counter(
            tokenize_text(text, stopwords=STOPWORDS_EN, stemmer=None)
        ).items():
            rows.append(f"('{qid}', '{term}', {w})")
    return ",\n    ".join(rows)


def bm25_topk_sql(method: str, k: int = 10) -> str:
    p = BM25Params(method=method)
    s0 = _s0(method, p.k1, p.delta)
    idf = _idf_sql(method)
    shape = _shape_sql(method, p.k1, p.b, p.delta)
    return f"""
WITH {TOKENS_CTE},
qterms(qid, term, w) AS (VALUES
    {_query_values_sql()}
),
qconst AS (
  SELECT q.qid, coalesce(sum(q.w * {idf}), 0.0) * {s0} AS c
  FROM qterms q JOIN dfreq ON dfreq.term = q.term CROSS JOIN stats
  GROUP BY q.qid
),
contrib AS (
  SELECT q.qid, tf.doc_id,
         sum(q.w * {idf} * ({shape} - {s0})) AS s
  FROM qterms q
  JOIN tf ON tf.term = q.term
  JOIN dfreq ON dfreq.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY q.qid, tf.doc_id
),
scored AS (
  SELECT c.qid, c.doc_id, round(c.s + qc.c, 6) AS score
  FROM contrib c JOIN qconst qc ON qc.qid = c.qid
),
ranked AS (
  SELECT qid, doc_id, score,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
  FROM scored
)
SELECT qid, doc_id, rank, score FROM ranked WHERE rank <= {k}
"""


ORACLE_SQL: dict[str, str] = {
    "tokenize_tf": f"WITH {TOKENS_CTE} SELECT doc_id, term, tf FROM tf",
    "doc_lengths": f"WITH {TOKENS_CTE} SELECT doc_id, dl FROM dl",
    "term_df": f"WITH {TOKENS_CTE} SELECT term, df FROM dfreq",
    "corpus_stats": f"WITH {TOKENS_CTE} SELECT num_docs, total_len, avgdl FROM stats",
    "bm25_topk_lucene": bm25_topk_sql("lucene"),
    "bm25_topk_atire": bm25_topk_sql("atire"),
    "bm25_topk_robertson": bm25_topk_sql("robertson"),
    "bm25_topk_bm25l": bm25_topk_sql("bm25l"),
    "bm25_topk_bm25plus": bm25_topk_sql("bm25+"),
}


def build_queries() -> dict:
    q = {
        "tokenize_tf": q_tokenize_tf,
        "doc_lengths": q_doc_lengths,
        "term_df": q_term_df,
        "corpus_stats": q_corpus_stats,
    }
    for name, method in [
        ("bm25_topk_lucene", "lucene"),
        ("bm25_topk_atire", "atire"),
        ("bm25_topk_robertson", "robertson"),
        ("bm25_topk_bm25l", "bm25l"),
        ("bm25_topk_bm25plus", "bm25+"),
    ]:
        q[name] = (lambda m: lambda sf_dir: q_bm25_topk(sf_dir, m))(method)
    return q


def flagship_entry():
    """Flagship pipeline on sf0.001: index the documents corpus and run
    the fixed BM25 query set end-to-end; returns the results table."""
    return q_bm25_topk("/root/testdata/sf0.001", "lucene")
