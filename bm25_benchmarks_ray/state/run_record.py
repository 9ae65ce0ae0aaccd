"""Run records + phase timer: the reference's benchmark instrumentation
surface re-expressed.

- :class:`Timer` mirrors utils/benchmark.py:25-122 (named start/stop/
  pause/resume, elapsed, throughput) — used around pipeline phases.
- :func:`max_rss_gb` mirrors utils/benchmark.py:11-23.
- :func:`save_run_record` mirrors the run JSON shape + random-hex file
  naming of /root/reference/benchmark/on_bm25s.py:228-260 (model /
  dataset / params / date / stats / timing / scores), so downstream
  analysis tooling (analysis.py here, combine_results.py there) reads
  either engine's records.
"""

from __future__ import annotations

import json
import os
import resource
import secrets
import sys
import time


def max_rss_gb() -> float:
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    div = 1e9 if sys.platform == "darwin" else 1e6
    return round(rss / div, 4)


class Timer:
    """Named phase timer with pause/resume and throughput reporting."""

    def __init__(self, precision: int = 6):
        self.precision = precision
        self._t: dict[str, dict] = {}

    def start(self, name: str) -> None:
        self._t[name] = {"start": time.perf_counter(), "elapsed": 0.0, "stopped": False}

    def pause(self, name: str) -> None:
        e = self._t[name]
        e["elapsed"] += time.perf_counter() - e["start"]
        e["start"] = None

    def resume(self, name: str) -> None:
        self._t[name]["start"] = time.perf_counter()

    def stop(self, name: str, n_total: int | None = None) -> float:
        e = self._t[name]
        if e["start"] is not None:
            e["elapsed"] += time.perf_counter() - e["start"]
            e["start"] = None
        e["stopped"] = True
        e["elapsed"] = round(e["elapsed"], self.precision)
        if n_total:
            e["throughput_per_s"] = round(n_total / e["elapsed"], 2) if e["elapsed"] else None
        return e["elapsed"]

    def elapsed(self, name: str) -> float:
        return self._t[name]["elapsed"]

    def to_dict(self) -> dict:
        return {
            k: {kk: vv for kk, vv in v.items() if kk != "start"}
            for k, v in self._t.items()
        }


def save_run_record(
    result_dir: str,
    model: str,
    dataset: str,
    params: dict,
    stats: dict,
    timing: dict,
    scores: dict | None = None,
    extra: dict | None = None,
) -> str:
    """Write results/<model>/<dataset>-<hex>.json; returns the path."""
    record = {
        "model": model,
        "dataset": dataset,
        "params": params,
        "date": time.strftime("%Y-%m-%d %H:%M:%S"),
        "max_mem_gb": max_rss_gb(),
        "stats": stats,
        "timing": timing,
        "scores": scores or {},
    }
    if extra:
        record.update(extra)
    d = os.path.join(result_dir, model)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"{dataset}-{secrets.token_hex(8)}.json")
    with open(path, "w") as f:
        json.dump(record, f, indent=1)
    return path


def load_run_records(result_dir: str) -> list[dict]:
    """rglob('*-*.json') → list of run dicts (combine_results.py:75-79)."""
    import pathlib

    out = []
    for p in sorted(pathlib.Path(result_dir).rglob("*-*.json")):
        try:
            with open(p) as f:
                out.append(json.load(f))
        except (json.JSONDecodeError, OSError):
            continue
    return out
