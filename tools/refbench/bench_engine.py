"""Single-node, single-process kernel throughput of THIS engine's
deployed vectorized kernels — the Python twin of bench_reference.rs.

Same deterministic update streams, same sketch configs; the engine
side processes them in 65,536-row chunks, the shape its Spark
aggregations see (Arrow batches buffered per partition before the
vectorized hash/absorb). `check` mirrors the Rust side's consumed
estimate so both sides provably did the same work.

Run via run_refbench.py (interleaved with the reference binary so host
phases hit both sides equally), or standalone:

    python tools/refbench/bench_engine.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

CHUNK = 65_536


def _chunks(n: int):
    for lo in range(0, n, CHUNK):
        yield lo, min(lo + CHUNK, n)


def bench_theta_update(out: dict) -> None:
    from datasketches_rust_spark.config import ThetaConfig
    from datasketches_rust_spark.functions.theta import (
        ThetaSketch,
        theta_hash_u64s,
    )

    n = 4_000_000
    cfg = ThetaConfig(lg_k=12)
    vals = np.arange(n, dtype=np.uint64)
    t0 = time.perf_counter()
    hashes = [theta_hash_u64s(vals[lo:hi], cfg.seed) for lo, hi in _chunks(n)]
    sk = ThetaSketch.from_hashes(np.concatenate(hashes), cfg)
    dt = time.perf_counter() - t0
    out["theta_update"] = {"n": n, "sec": round(dt, 4),
                           "ops_per_sec": round(n / dt),
                           "check": round(sk.estimate(), 4)}


def bench_theta_serialize(out: dict) -> None:
    from datasketches_rust_spark.config import ThetaConfig
    from datasketches_rust_spark.functions.theta import (
        ThetaSketch,
        theta_hash_u64s,
    )

    reps = 2_000
    cfg = ThetaConfig(lg_k=12)
    sk = ThetaSketch.from_hashes(
        theta_hash_u64s(np.arange(100_000, dtype=np.uint64), cfg.seed), cfg
    )
    t0 = time.perf_counter()
    total = 0
    for _ in range(reps):
        total += len(sk.serialize())
    dt = time.perf_counter() - t0
    out["theta_serialize"] = {"n": reps, "sec": round(dt, 4),
                              "ops_per_sec": round(reps / dt),
                              "check": float(total)}


def bench_hll_update(out: dict) -> None:
    from datasketches_rust_spark.functions.hll import HllSketch

    n = 4_000_000
    sk = HllSketch(12, out_of_order=True)  # dense-absorb merge path
    vals = np.arange(n, dtype=np.uint64)
    t0 = time.perf_counter()
    for lo, hi in _chunks(n):
        sk.update_u64s(vals[lo:hi])
    dt = time.perf_counter() - t0
    out["hll_update"] = {"n": n, "sec": round(dt, 4),
                         "ops_per_sec": round(n / dt),
                         "check": round(sk.estimate(), 4)}


def bench_cpc_update(out: dict) -> None:
    from datasketches_rust_spark.functions.cpc import CpcSketch

    n = 2_000_000
    sk = CpcSketch(11)
    vals = np.arange(n, dtype=np.uint64)
    t0 = time.perf_counter()
    for lo, hi in _chunks(n):
        sk.update_u64s(vals[lo:hi])
    dt = time.perf_counter() - t0
    out["cpc_update"] = {"n": n, "sec": round(dt, 4),
                         "ops_per_sec": round(n / dt),
                         "check": round(sk.estimate(), 4)}


def bench_bloom_insert(out: dict) -> None:
    from datasketches_rust_spark.functions.bloom import BloomFilter

    n = 2_000_000
    bf = BloomFilter.with_accuracy(n, 0.01)
    vals = np.arange(n, dtype=np.int64)
    t0 = time.perf_counter()
    for lo, hi in _chunks(n):
        bf.insert_batch(vals[lo:hi])
    dt = time.perf_counter() - t0
    out["bloom_insert"] = {"n": n, "sec": round(dt, 4),
                           "ops_per_sec": round(n / dt),
                           "check": float(bf.bits_used())}


def bench_countmin_update(out: dict) -> None:
    from datasketches_rust_spark.functions.countmin import CountMinSketch

    n = 4_000_000
    cm = CountMinSketch(3, 1024)
    vals = np.arange(n, dtype=np.int64)
    t0 = time.perf_counter()
    for lo, hi in _chunks(n):
        cm.update_batch(vals[lo:hi])
    dt = time.perf_counter() - t0
    out["countmin_update"] = {"n": n, "sec": round(dt, 4),
                              "ops_per_sec": round(n / dt),
                              "check": float(cm.estimate(7))}


def bench_frequencies_update(out: dict) -> None:
    from datasketches_rust_spark.functions.frequencies import FrequentItemsSketch

    n = 2_000_000
    fi = FrequentItemsSketch(1024)
    vals = (np.arange(n, dtype=np.int64) % 100_000)
    t0 = time.perf_counter()
    for lo, hi in _chunks(n):
        fi.update_batch(pd.Series(vals[lo:hi]))
    dt = time.perf_counter() - t0
    out["frequencies_update"] = {"n": n, "sec": round(dt, 4),
                                 "ops_per_sec": round(n / dt),
                                 "check": float(fi.estimate(7))}


def bench_tdigest_update(out: dict) -> None:
    from datasketches_rust_spark.functions.tdigest import TDigest

    n = 4_000_000
    td = TDigest(200)
    vals = np.arange(n, dtype=np.float64)
    t0 = time.perf_counter()
    for lo, hi in _chunks(n):
        td.update_batch(vals[lo:hi])
    dt = time.perf_counter() - t0
    out["tdigest_update"] = {"n": n, "sec": round(dt, 4),
                             "ops_per_sec": round(n / dt),
                             "check": round(td.quantile(0.5), 4)}


BENCHES = [
    bench_theta_update,
    bench_theta_serialize,
    bench_hll_update,
    bench_cpc_update,
    bench_bloom_insert,
    bench_countmin_update,
    bench_frequencies_update,
    bench_tdigest_update,
]


def main() -> None:
    out: dict = {}
    for b in BENCHES:
        b(out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
