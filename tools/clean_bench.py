"""Run bench.py inside a clean host-weather window.

The container's host exhibits page-reclaim phases (BASELINE.md "Engine
scale findings"): first-touching fresh pages measures ~0.05 s/128 MB in
clean windows and whole seconds in reclaim phases, inflating every
pandas-UDF stage in lockstep. This runner polls the same probe bench.py
stamps into its artifacts and only launches the headline run once the
window is verifiably clean, so the recorded numbers measure the engine
rather than the weather.

Usage: python tools/clean_bench.py [--max-wait-s N] [--clean-s F]
Writes bench stdout to /tmp/clean_bench_stdout.txt and exits with
bench's return code. If no clean window appears within --max-wait-s
(default 3 h), runs anyway — a weather-stamped artifact beats none —
unless --no-force is given (then exits 3 without running, so an
unattended watcher can never overwrite BENCH_DETAIL.json with a
degraded record).
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time


def probe() -> float:
    import numpy as np

    t0 = time.perf_counter()
    a = np.empty(128 * 1024 * 1024 // 8, dtype=np.float64)
    a[::512] = 1.0  # touch every 4K page
    del a
    return time.perf_counter() - t0


def kernel_probe() -> float:
    """Seconds for one deployed engine kernel call (countmin
    update_batch, 2M int64 rows) — the throughput weather axis the
    fault probe misses (BASELINE.md "Round 4 addendum 2": this kernel
    measured 12.5M vs 2.5M ops/s hours apart with fault probes clean
    both times; the degraded axis is scalar u64 ALU rate, which f64
    SIMD streaming probes cannot see). Clean ≈ 0.16 s (12.5M ops/s,
    REFBENCH.json; a degraded phase measured 0.34 s on the same call);
    gate defaults to 1.5× clean."""
    import numpy as np

    sys.path.insert(0, "/root/repo")
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
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-wait-s", type=float, default=3 * 3600)
    ap.add_argument("--clean-s", type=float, default=0.8)
    ap.add_argument("--kernel-clean-s", type=float, default=0.25)
    ap.add_argument("--poll-s", type=float, default=150.0)
    ap.add_argument("--consecutive", type=int, default=2)
    ap.add_argument(
        "--no-force",
        action="store_true",
        help="exit 3 at --max-wait-s expiry instead of running degraded "
        "(a forced degraded run overwrites BENCH_DETAIL.json — unsafe "
        "for unattended watchers)",
    )
    args = ap.parse_args()

    t0 = time.monotonic()
    streak = 0
    while time.monotonic() - t0 < args.max_wait_s:
        p = probe()
        kp = kernel_probe()
        print(f"[clean_bench] probe {p:.3f}s kernel {kp:.3f}s streak {streak}", flush=True)
        if p < args.clean_s and kp < args.kernel_clean_s:
            streak += 1
            if streak >= args.consecutive:
                break
            time.sleep(20)
        else:
            streak = 0
            time.sleep(args.poll_s)
    else:
        if args.no_force:
            print("[clean_bench] max wait exceeded; --no-force set — not running", flush=True)
            return 3
        print("[clean_bench] max wait exceeded; running anyway", flush=True)

    with open("/tmp/clean_bench_stdout.txt", "w") as out:
        rc = subprocess.run(
            [sys.executable, "bench.py"], cwd="/root/repo", stdout=out,
            stderr=subprocess.STDOUT,
        ).returncode
    print(f"[clean_bench] bench exited rc={rc}", flush=True)
    return rc


if __name__ == "__main__":
    sys.exit(main())
