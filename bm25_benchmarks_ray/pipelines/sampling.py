"""Deterministic stratified sampling for training-data curation.

``stratified_sample`` keeps each row with a per-stratum probability
decided by a hash of the row's id — not an RNG — so the sample is (a)
embarrassingly parallel (a pure ``map_batches`` filter, no shuffle, no
coordination), (b) stable across reruns/resumes/repartitions (the same
row always makes the same decision), and (c) exactly replicable in
ANSI SQL, which makes it DuckDB-oracle-checkable.  This is the sampling
shape a 100-TB curation pipeline needs: per-language/per-source quotas
applied at read time without materializing or shuffling anything.

Decision rule: keep iff  md5_u64(seed || str(id)) % 1e6 < rate * 1e6
(md5_u64 = dedup.md5_u64, whose bit-exact DuckDB replica is
driver_api._MD5U64_SQL).  Pass ``hasher="fast"`` to swap in the
vectorized SipHash (`dedup.fast_hash_u64`) when oracle replicability
is not needed — same determinism properties, no per-row md5 call.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from .dedup import fast_hash_u64, md5_u64

MOD = 1_000_000


def stratified_sample(
    ds: rd.Dataset,
    rates: dict[str, float],
    strat_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 7,
    default_rate: float = 0.0,
    hasher: str = "md5",
) -> rd.Dataset:
    """Hash-deterministic per-stratum sample.  ``rates`` maps stratum
    value -> keep probability in [0, 1]; strata not listed fall back to
    ``default_rate``.  Returns the input rows that survive, original
    schema preserved."""
    thresholds = {k: int(round(v * MOD)) for k, v in rates.items()}
    default_thr = int(round(default_rate * MOD))
    hash_fn = md5_u64 if hasher == "md5" else (
        lambda ids, seed=0: fast_hash_u64([f"{seed}\x00{s}" for s in ids])
    )

    def keep(batch: pa.Table) -> pa.Table:
        ids = [str(i) for i in batch.column(id_col).to_pylist()]
        h = hash_fn(ids, seed) % np.uint64(MOD)
        strata = batch.column(strat_col).to_pylist()
        thr = np.fromiter(
            (thresholds.get(s, default_thr) for s in strata),
            dtype=np.uint64,
            count=len(strata),
        )
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow")
