"""Head-to-head single-node kernel throughput: reference crate vs this
engine's vectorized kernels.

Protocol:
  1. Build the reference bench binary once (same offline recipe as
     tools/fixturegen/README.md) unless --binary points at one.
  2. Wait for a clean host window (same first-touch probe as
     tools/clean_bench.py — BASELINE.md documents multi-second reclaim
     phases that crush allocation-heavy NumPy kernels ~50x while
     leaving the allocation-free Rust loops untouched; comparing
     across that asymmetry would be meaningless).
  3. Interleave rounds: reference, engine, reference, engine, ... so
     any residual phase drift hits both sides.
  4. Per family take the MIN over rounds per side, write REFBENCH.json
     with both sides + the ratio.

Usage:
    python tools/refbench/run_refbench.py [--rounds 3] [--max-wait-s 3600]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
BUILD_DIR = "/tmp/refbench_build"


def probe() -> float:
    import numpy as np

    t0 = time.perf_counter()
    a = np.empty(128 * 1024 * 1024 // 8, dtype=np.float64)
    a[::512] = 1.0
    del a
    return time.perf_counter() - t0


def build_reference_binary() -> str:
    binary = os.path.join(BUILD_DIR, "target", "release", "bench_reference")
    src = os.path.join(REPO, "tools", "refbench", "bench_reference.rs")
    if os.path.exists(binary) and os.path.getmtime(binary) >= os.path.getmtime(src):
        return binary
    if os.path.exists(BUILD_DIR):
        shutil.rmtree(BUILD_DIR)
    shutil.copytree("/root/reference/datasketches", BUILD_DIR)
    # standalone package: inline the workspace-inherited fields,
    # drop dev-dependencies (they need the network) and lints
    with open(os.path.join(BUILD_DIR, "Cargo.toml"), "w") as f:
        f.write(
            '[package]\nname = "datasketches"\nversion = "0.2.0"\n'
            'edition = "2021"\nlicense = "Apache-2.0"\n'
            'description = "bench build"\n\n[profile.release]\ndebug = false\n'
        )
    os.makedirs(os.path.join(BUILD_DIR, "src", "bin"), exist_ok=True)
    shutil.copy(src, os.path.join(BUILD_DIR, "src", "bin"))
    subprocess.run(
        ["cargo", "build", "--release", "--bin", "bench_reference"],
        cwd=BUILD_DIR,
        check=True,
        capture_output=True,
        text=True,
    )
    return binary


def run_side(cmd: list[str]) -> dict:
    out = subprocess.run(cmd, capture_output=True, text=True, check=True, cwd=REPO)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--max-wait-s", type=float, default=3600.0)
    ap.add_argument("--clean-s", type=float, default=0.8)
    ap.add_argument("--poll-s", type=float, default=120.0)
    ap.add_argument("--binary", default=None)
    args = ap.parse_args()

    binary = args.binary or build_reference_binary()

    t0 = time.monotonic()
    p = probe()
    while p > args.clean_s and time.monotonic() - t0 < args.max_wait_s:
        print(f"[refbench] probe {p:.2f}s — waiting for a clean window", flush=True)
        time.sleep(args.poll_s)
        p = probe()
    probe_at_start = p

    ref_rounds: list[dict] = []
    eng_rounds: list[dict] = []
    for i in range(args.rounds):
        ref_rounds.append(run_side([binary]))
        eng_rounds.append(
            run_side([sys.executable, os.path.join(REPO, "tools", "refbench", "bench_engine.py")])
        )
        print(f"[refbench] round {i + 1}/{args.rounds} done", flush=True)

    families = sorted(ref_rounds[0].keys())
    result: dict = {
        "protocol": "interleaved min-of-rounds, single process per side",
        "rounds": args.rounds,
        "host_fault_probe_s": [round(probe_at_start, 3), round(probe(), 3)],
        "families": {},
    }
    for fam in families:
        r = min((rr[fam] for rr in ref_rounds), key=lambda d: d["sec"])
        e = min((er[fam] for er in eng_rounds), key=lambda d: d["sec"])
        result["families"][fam] = {
            "n": r["n"],
            "reference_ops_per_sec": r["ops_per_sec"],
            "engine_ops_per_sec": e["ops_per_sec"],
            "engine_over_reference": round(e["ops_per_sec"] / r["ops_per_sec"], 3),
            "reference_check": r["check"],
            "engine_check": e["check"],
        }
    out_path = os.path.join(REPO, "REFBENCH.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["families"], indent=1))
    print(f"[refbench] wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
