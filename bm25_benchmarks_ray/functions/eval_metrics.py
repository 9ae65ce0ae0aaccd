"""IR evaluation: NDCG / MAP / Recall / Precision @ k against qrels.

Reimplements the metric math behind the reference's
``EvaluateRetrieval.evaluate(qrels, results, [1,10,100,1000])``
(/root/reference/benchmark/on_bm25s.py:213-216; result-shape conversion
mirrors utils/beir.py:16-35).  Formulas follow the standard trec_eval
definitions (linear-gain DCG with log2 discount; AP normalized by total
relevant), which is what BEIR's pytrec_eval backend computes.

Results dict shape (BEIR-compatible): {qid: {doc_id: score}};
qrels: {qid: {doc_id: int_relevance}}.
"""

from __future__ import annotations

import math


def _ranked_docs(scores: dict[str, float], k: int) -> list[str]:
    return [
        d for d, _ in sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    ]


def ndcg_at_k(qrels_q: dict[str, int], scores: dict[str, float], k: int) -> float:
    ranked = _ranked_docs(scores, k)
    dcg = sum(
        qrels_q.get(d, 0) / math.log2(i + 2) for i, d in enumerate(ranked)
    )
    ideal = sorted((r for r in qrels_q.values() if r > 0), reverse=True)[:k]
    idcg = sum(r / math.log2(i + 2) for i, r in enumerate(ideal))
    return dcg / idcg if idcg > 0 else 0.0


def map_at_k(qrels_q: dict[str, int], scores: dict[str, float], k: int) -> float:
    relevant = {d for d, r in qrels_q.items() if r > 0}
    if not relevant:
        return 0.0
    ranked = _ranked_docs(scores, k)
    hits, ap = 0, 0.0
    for i, d in enumerate(ranked):
        if d in relevant:
            hits += 1
            ap += hits / (i + 1)
    return ap / len(relevant)


def recall_at_k(qrels_q: dict[str, int], scores: dict[str, float], k: int) -> float:
    relevant = {d for d, r in qrels_q.items() if r > 0}
    if not relevant:
        return 0.0
    ranked = set(_ranked_docs(scores, k))
    return len(ranked & relevant) / len(relevant)


def precision_at_k(qrels_q: dict[str, int], scores: dict[str, float], k: int) -> float:
    relevant = {d for d, r in qrels_q.items() if r > 0}
    ranked = _ranked_docs(scores, k)
    if not ranked:
        return 0.0
    return len([d for d in ranked if d in relevant]) / k


def evaluate(
    qrels: dict[str, dict[str, int]],
    results: dict[str, dict[str, float]],
    k_values: list[int] = [1, 10, 100, 1000],
) -> tuple[dict, dict, dict, dict]:
    """Macro-averaged (over queries present in qrels) metric dicts with
    BEIR's key shapes: NDCG@k / MAP@k / Recall@k / P@k."""
    ndcg, _map, recall, precision = {}, {}, {}, {}
    qids = [q for q in qrels if q in results]
    n = len(qids) or 1
    for k in k_values:
        ndcg[f"NDCG@{k}"] = round(
            sum(ndcg_at_k(qrels[q], results.get(q, {}), k) for q in qids) / n, 5
        )
        _map[f"MAP@{k}"] = round(
            sum(map_at_k(qrels[q], results.get(q, {}), k) for q in qids) / n, 5
        )
        recall[f"Recall@{k}"] = round(
            sum(recall_at_k(qrels[q], results.get(q, {}), k) for q in qids) / n, 5
        )
        precision[f"P@{k}"] = round(
            sum(precision_at_k(qrels[q], results.get(q, {}), k) for q in qids) / n, 5
        )
    return ndcg, _map, recall, precision


def results_table_to_eval(df) -> dict[str, dict[str, float]]:
    """(qid, doc_id, score) rows → {qid: {doc_id_str: score}} — the
    reference's postprocess_results_for_eval (utils/beir.py:16-35)."""
    out: dict[str, dict[str, float]] = {}
    for r in df.itertuples(index=False):
        out.setdefault(str(r.qid), {})[str(r.doc_id)] = float(r.score)
    return out
