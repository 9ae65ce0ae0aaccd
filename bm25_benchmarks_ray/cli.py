"""CLI entry points mirroring the reference harness surface
(/root/reference/benchmark/on_bm25s.py:263-380 argparse flags: method,
k1, b, delta, stopwords, stemmer_name, top_k, result_dir, num_runs...).

    python -m bm25_benchmarks_ray.cli index  --input DIR --index DIR [--mode transcripts]
    python -m bm25_benchmarks_ray.cli query  --index DIR --queries FILE.tsv [--method lucene]
    python -m bm25_benchmarks_ray.cli eval   --index DIR --queries FILE.tsv --qrels FILE.tsv
    python -m bm25_benchmarks_ray.cli bench  [--sf 0.1]

CLI scripts own the Ray session (init/shutdown); library code never
does."""

from __future__ import annotations

import argparse
import json
import os
import sys


def _common_index_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--stopwords", default="en", choices=["en", "none"])
    p.add_argument("--stemmer", default="snowball", choices=["snowball", "none"])
    p.add_argument("--salt-range", type=int, default=262144)
    p.add_argument("--block-size", type=int, default=128)


def _bm25_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--method", default="lucene",
                   choices=["lucene", "atire", "robertson", "bm25l", "bm25+"])
    p.add_argument("--k1", type=float, default=1.5)
    p.add_argument("--b", type=float, default=0.75)
    p.add_argument("--delta", type=float, default=0.5)
    p.add_argument("--top-k", type=int, default=10)
    p.add_argument("--query-mode", default="pruned",
                   choices=["exhaustive", "pruned"])
    p.add_argument("--samples", type=int, default=None,
                   help="seeded random query sample size (reference --samples)")


def _read_tsv(path: str) -> list[tuple[str, str]]:
    out = []
    with open(path) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 2:
                out.append((parts[0], parts[1]))
    return out


_OWNS_RAY = False


def _init_ray(num_cpus: int | None) -> None:
    global _OWNS_RAY
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
        _OWNS_RAY = True


def cmd_index(args) -> int:
    from .config import IndexConfig
    from .pipelines.index_build import build_index

    _init_ray(args.num_cpus)
    cfg = IndexConfig(
        stopwords=args.stopwords, stemmer=args.stemmer,
        salt_range=args.salt_range, block_size=args.block_size,
    )
    man = build_index(args.input, args.index, cfg, mode=args.mode, fresh=args.fresh)
    print(json.dumps({"index": args.index, "stats": man.stats,
                      "groups": len(man.done_groups())}))
    return 0


def cmd_query(args) -> int:
    from .config import IndexConfig
    from .functions.bm25 import BM25Params
    from .pipelines.query import search

    _init_ray(args.num_cpus)
    from .pipelines.query import sample_queries

    params = BM25Params(method=args.method, k1=args.k1, b=args.b, delta=args.delta)
    queries = sample_queries(_read_tsv(args.queries), args.samples)
    res = search(args.index, queries, params=params, k=args.top_k,
                 mode=args.query_mode).to_pandas()
    if args.output:
        res.to_csv(args.output, sep="\t", index=False)
        print(f"wrote {len(res)} rows to {args.output}")
    else:
        res.to_csv(sys.stdout, sep="\t", index=False)
    return 0


def cmd_eval(args) -> int:
    from .config import IndexConfig
    from .functions.bm25 import BM25Params
    from .functions.eval_metrics import evaluate, results_table_to_eval
    from .pipelines.query import search
    from .state.run_record import Timer, save_run_record

    _init_ray(args.num_cpus)
    from .pipelines.query import sample_queries

    params = BM25Params(method=args.method, k1=args.k1, b=args.b, delta=args.delta)
    queries = sample_queries(_read_tsv(args.queries), args.samples)
    qrels: dict[str, dict[str, int]] = {}
    with open(args.qrels) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) >= 3:
                qrels.setdefault(parts[0], {})[parts[1]] = int(parts[2])
    timer = Timer()
    timer.start("query")
    res = search(args.index, queries, params=params, k=args.top_k,
                 mode=args.query_mode).to_pandas()
    timer.stop("query", n_total=len(queries))
    ndcg, m, r, p = evaluate(
        qrels, results_table_to_eval(res), k_values=[1, 10, 100, 1000]
    )
    scores = {"ndcg": ndcg, "map": m, "recall": r, "precision": p}
    print(json.dumps(scores, indent=1))
    if args.result_dir:
        save_run_record(
            args.result_dir, "ray-bm25", os.path.basename(args.index),
            {"method": args.method, "k1": args.k1, "b": args.b, "delta": args.delta,
             "top_k": args.top_k},
            {"num_queries": len(queries)}, timer.to_dict(), scores=scores,
        )
    return 0


def cmd_bench(args) -> int:
    import subprocess

    env = dict(os.environ)
    if args.sf:
        env["GRAFT_BENCH_SF"] = str(args.sf)
    cmd = [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py")]
    if args.scaling:
        cmd.append("--scaling")
    return subprocess.run(cmd, env=env).returncode


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="bm25_benchmarks_ray")
    ap.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("index")
    p.add_argument("--input", required=True)
    p.add_argument("--index", required=True)
    p.add_argument("--mode", default="transcripts", choices=["transcripts", "documents"])
    p.add_argument("--fresh", action="store_true")
    _common_index_args(p)
    p.set_defaults(fn=cmd_index)

    p = sub.add_parser("query")
    p.add_argument("--index", required=True)
    p.add_argument("--queries", required=True, help="TSV: qid\\ttext")
    p.add_argument("--output", default=None)
    _bm25_args(p)
    p.set_defaults(fn=cmd_query)

    p = sub.add_parser("eval")
    p.add_argument("--index", required=True)
    p.add_argument("--queries", required=True)
    p.add_argument("--qrels", required=True, help="TSV: qid\\tdoc_id\\trel")
    p.add_argument("--result-dir", default=None)
    _bm25_args(p)
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("bench")
    p.add_argument("--sf", type=float, default=None)
    p.add_argument("--scaling", action="store_true")
    p.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    try:
        return args.fn(args)
    finally:
        import ray

        # shut down only a session we started (embedders/tests own theirs)
        if _OWNS_RAY and ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
