"""Single-node, single-process kernel throughput of THIS engine's
deployed vectorized kernels — the Python twin of bench_reference.rs.

Same deterministic update streams, same sketch configs; the engine
side processes them in 65,536-row chunks, the shape its Spark
aggregations see (Arrow batches buffered per partition before the
vectorized hash/absorb). `check` mirrors the Rust side's consumed
estimate so both sides provably did the same work.

Each family is timed over TWO in-process passes and the MIN is kept —
the same warm-pass protocol as bench.py: the vectorized kernels
allocate large NumPy temporaries, and on this host a cold pass
first-touches those pages at the reclaim-phase fault rate (measured
35 s cold vs 0.4 s warm for the identical 4M-row murmur call,
BASELINE.md "host-noise story"). The warm pass re-uses the allocator's
freed buffers and measures the kernel; the Rust side allocates nothing
per update and needs no warm pass.

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
PASSES = 2


def _chunks(n: int):
    for lo in range(0, n, CHUNK):
        yield lo, min(lo + CHUNK, n)


def _timed(out: dict, name: str, n: int, one_pass) -> None:
    """Record min-of-PASSES wall time for `one_pass() -> check`."""
    best, check = float("inf"), None
    for _ in range(PASSES):
        t0 = time.perf_counter()
        check = one_pass()
        best = min(best, time.perf_counter() - t0)
    out[name] = {
        "n": n,
        "sec": round(best, 4),
        "ops_per_sec": round(n / best),
        "check": round(float(check), 4),
    }


def bench_theta_update(out: dict) -> None:
    from datasketches_rust_spark.config import ThetaConfig
    from datasketches_rust_spark.functions.theta import ThetaSketch, theta_hash_u64s

    n = 4_000_000
    cfg = ThetaConfig(lg_k=12)
    vals = np.arange(n, dtype=np.uint64)

    def one_pass():
        hashes = [theta_hash_u64s(vals[lo:hi], cfg.seed) for lo, hi in _chunks(n)]
        return ThetaSketch.from_hashes(np.concatenate(hashes), cfg).estimate()

    _timed(out, "theta_update", n, one_pass)


def bench_theta_serialize(out: dict) -> None:
    from datasketches_rust_spark.config import ThetaConfig
    from datasketches_rust_spark.functions.theta import ThetaSketch, theta_hash_u64s

    reps = 2_000
    cfg = ThetaConfig(lg_k=12)
    sk = ThetaSketch.from_hashes(
        theta_hash_u64s(np.arange(100_000, dtype=np.uint64), cfg.seed), cfg
    )

    def one_pass():
        total = 0
        for _ in range(reps):
            total += len(sk.serialize())
        return float(total)

    _timed(out, "theta_serialize", reps, one_pass)


def bench_hll_update(out: dict) -> None:
    from datasketches_rust_spark.functions.hll import HllSketch

    n = 4_000_000
    vals = np.arange(n, dtype=np.uint64)

    def one_pass():
        sk = HllSketch(12, out_of_order=True)  # dense-absorb merge path
        for lo, hi in _chunks(n):
            sk.update_u64s(vals[lo:hi])
        return sk.estimate()

    _timed(out, "hll_update", n, one_pass)


def bench_cpc_update(out: dict) -> None:
    from datasketches_rust_spark.functions.cpc import CpcSketch

    n = 2_000_000
    vals = np.arange(n, dtype=np.uint64)

    def one_pass():
        sk = CpcSketch(11)
        for lo, hi in _chunks(n):
            sk.update_u64s(vals[lo:hi])
        return sk.estimate()

    _timed(out, "cpc_update", n, one_pass)


def bench_bloom_insert(out: dict) -> None:
    from datasketches_rust_spark.functions.bloom import BloomFilter

    n = 2_000_000
    vals = np.arange(n, dtype=np.int64)

    def one_pass():
        bf = BloomFilter.with_accuracy(n, 0.01)
        for lo, hi in _chunks(n):
            bf.insert_batch(vals[lo:hi])
        return float(bf.bits_used())

    _timed(out, "bloom_insert", n, one_pass)


def bench_countmin_update(out: dict) -> None:
    from datasketches_rust_spark.functions.countmin import CountMinSketch

    n = 4_000_000
    vals = np.arange(n, dtype=np.int64)

    def one_pass():
        cm = CountMinSketch(3, 1024)
        for lo, hi in _chunks(n):
            cm.update_batch(vals[lo:hi])
        return float(cm.estimate(7))

    _timed(out, "countmin_update", n, one_pass)


def bench_frequencies_update(out: dict) -> None:
    from datasketches_rust_spark.functions.frequencies import FrequentItemsSketch

    n = 2_000_000
    vals = np.arange(n, dtype=np.int64) % 100_000

    def one_pass():
        fi = FrequentItemsSketch(1024)
        for lo, hi in _chunks(n):
            fi.update_batch(pd.Series(vals[lo:hi]))
        return float(fi.estimate(7))

    _timed(out, "frequencies_update", n, one_pass)


def bench_tdigest_update(out: dict) -> None:
    from datasketches_rust_spark.functions.tdigest import TDigest

    n = 4_000_000
    vals = np.arange(n, dtype=np.float64)

    def one_pass():
        td = TDigest(200)
        for lo, hi in _chunks(n):
            td.update_batch(vals[lo:hi])
        return td.quantile(0.5)

    _timed(out, "tdigest_update", n, one_pass)


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
