"""Smoke test for bench.py — the driver-facing deliverable.

Runs the full parent/worker plan machinery (warm solve, headline rep,
success-parity rep, frontier emission) on CPU at a tiny batch via the
BENCH_CPU knob, and checks the signal-driven partial-emission contract.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(HERE, "bench.py")


@pytest.mark.slow
def test_bench_cpu_plan_end_to_end():
    env = {**os.environ, "BENCH_CPU": "1", "BENCH_LADDER": "8:mixed",
           "BENCH_REPS": "1", "BENCH_DEVICE_WAIT": "0",
           "BENCH_TOTAL_BUDGET": "900", "BENCH_TOL": "1e-7",
           "JAX_PLATFORMS": ""}
    out = subprocess.run([sys.executable, BENCH], env=env, cwd=HERE,
                         capture_output=True, text=True, timeout=900)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    assert d["unit"] == "ocps_per_s_per_chip"
    assert d["value"] > 0, d
    best = d["detail"]["best"]
    assert best["solved"] >= 6 and best["batch"] == 8
    fr = d["detail"]["frontier"]
    assert fr["throughput_max"] is not None
    # the success-parity rung must be certified in the same run
    assert fr["success_max"] is not None
    assert fr["success_max"]["rescue" if "rescue" in fr["success_max"]
                             else "mode"]  # mode recorded
    assert fr["success_max"]["solved"] >= best["solved"]


def test_bench_sigterm_emits_partial_result():
    env = {**os.environ, "BENCH_DEVICE_WAIT": "60",
           "BENCH_TOTAL_BUDGET": "600"}
    proc = subprocess.Popen([sys.executable, BENCH], env=env, cwd=HERE,
                            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                            text=True)
    time.sleep(4)
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=30)
    line = [l for l in out.splitlines() if l.startswith("{")]
    assert line, "no JSON emitted on SIGTERM"
    d = json.loads(line[-1])
    assert d["unit"] == "ocps_per_s_per_chip"
