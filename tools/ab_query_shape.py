"""A/B query task shapes (n_qbatch x n_slices) on a cached index.

Usage: python tools/ab_query_shape.py --idx /tmp/bm25rd/prof/idx_sf8.0
           --cpus 16 --nq 8000 --k 10 --shapes 16x1,16x2,24x1,16x3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--idx", default="/tmp/bm25rd/prof/idx_sf8.0")
    ap.add_argument("--nq", type=int, default=8000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--shapes", default="auto,16x1,16x2,24x1")
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
        search(args.idx, queries[:50], params=params, k=args.k).count()  # warm
        shapes = []
        for s in args.shapes.split(","):
            if s == "auto":
                shapes.append((None, None))
            else:
                qb, sl = s.split("x")
                shapes.append((int(qb), int(sl)))
        for rep in range(args.runs):
            for (qb, sl) in shapes:
                t0 = time.perf_counter()
                ds = search(args.idx, queries, params=params, k=args.k,
                            n_qbatch=qb, n_slices=sl)
                n = ds.count()
                el = time.perf_counter() - t0
                print(json.dumps({
                    "shape": f"{qb}x{sl}", "rep": rep, "sec": round(el, 2),
                    "qps": round(args.nq / el, 1), "rows": n,
                }), flush=True)
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
