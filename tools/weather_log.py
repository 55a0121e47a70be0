"""Append host-weather probe stamps to /tmp/weather.log every ~120 s.

Round-5 helper: clean windows are rare (memory: kernel axis stayed
degraded 4+ h in round 4); a continuous log lets the builder pick the
moment to record absolute benches instead of polling by hand.
Probes are the two documented axes (BASELINE.md round-4 addenda):
first-touch fault rate and the scalar-u64 countmin kernel.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def fault_probe():
    t0 = time.perf_counter()
    a = np.empty(128 * 1024 * 1024 // 8, dtype=np.float64)
    a[::512] = 1.0
    return round(time.perf_counter() - t0, 3)


def cpu_probe():
    from datasketches_rust_spark.functions.countmin import CountMinSketch

    vals = np.arange(2_000_000, dtype=np.int64)
    warm = CountMinSketch(num_hashes=3, num_buckets=1024)
    warm.update_batch(vals[:100_000])
    best = float("inf")
    for _ in range(2):
        sk = CountMinSketch(num_hashes=3, num_buckets=1024)
        t0 = time.perf_counter()
        sk.update_batch(vals)
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


if __name__ == "__main__":
    interval = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    while True:
        f, c = fault_probe(), cpu_probe()
        with open("/tmp/weather.log", "a") as fh:
            fh.write(f"{time.strftime('%H:%M:%S')} fault={f} cpu={c}\n")
        time.sleep(interval)
