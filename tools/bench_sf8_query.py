"""Measure sf8 batch-query throughput on a cached index.

Usage: python tools/bench_sf8_query.py [--idx /tmp/bm25rd/idx_sf8_r3]
           [--nq 2000] [--k 1000] [--cpus 32] [--runs 2]

Fresh-session timing against an already-built index: build once with
tools (or bench.py), iterate on the query path.  Prints one JSON line
per run plus a summary.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--idx", default="/tmp/bm25rd/idx_sf8_r3")
    ap.add_argument("--nq", type=int, default=2000)
    ap.add_argument("--k", type=int, default=1000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--stats", action="store_true")
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    try:
        from bm25_benchmarks_ray.functions.bm25 import BM25Params
        from bm25_benchmarks_ray.pipelines.query import search
        from bm25_benchmarks_ray.sources.transcripts import synthesize_queries

        queries = synthesize_queries(args.nq, seed=17)
        params = BM25Params()
        # warm-up
        search(args.idx, queries[:50], params=params, k=args.k).count()
        qps = []
        for r in range(args.runs):
            t0 = time.perf_counter()
            ds = search(args.idx, queries, params=params, k=args.k)
            n = ds.count()
            el = time.perf_counter() - t0
            qps.append(args.nq / el)
            print(json.dumps({"run": r, "sec": round(el, 2),
                              "qps": round(args.nq / el, 1), "rows": n}))
            if args.stats:
                print(ds.stats())
        print(json.dumps({"k": args.k, "nq": args.nq, "cpus": args.cpus,
                          "best_qps": round(max(qps), 1)}))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
