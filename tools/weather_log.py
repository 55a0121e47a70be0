"""Append host-weather probe stamps to /tmp/weather.log every ~120 s.

Round-5 helper: clean windows are rare (memory: kernel axis stayed
degraded 4+ h in round 4); a continuous log lets the builder pick the
moment to record absolute benches instead of polling by hand.
Probes are imported from bench.py — the SAME functions whose clean/
degraded thresholds BASELINE.md and the scaling gate are calibrated
against, so this log can never drift from what the artifacts stamp.
"""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import _host_cpu_probe as cpu_probe  # noqa: E402
from bench import _host_fault_probe as fault_probe  # noqa: E402

if __name__ == "__main__":
    interval = float(sys.argv[1]) if len(sys.argv) > 1 else 120.0
    while True:
        f, c = fault_probe(), cpu_probe()
        with open("/tmp/weather.log", "a") as fh:
            fh.write(f"{time.strftime('%H:%M:%S')} fault={f} cpu={c}\n")
        time.sleep(interval)
