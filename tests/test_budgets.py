"""Latency/memory budget asserts (reference test_flux_speed/_memory pattern).

The check runs on the real chip, so it executes tools/check_budgets.py in a
subprocess with a clean environment (this pytest session pins the virtual
CPU platform). Activates when a TPU is reachable; skips on CPU-only boxes.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    os.environ.get("NUNCHAKU_TPU_RUN_BUDGETS") != "1",
    reason="set NUNCHAKU_TPU_RUN_BUDGETS=1 to run the on-chip latency/memory "
    "budget checks (needs the real TPU; ~1 min warm, ~5 min cold)",
)
def test_latency_and_memory_budgets():
    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_budgets.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no budget output; stderr tail: {proc.stderr[-800:]}"
    results = [json.loads(l) for l in lines]
    for r in results:
        assert r["ok"], r
    assert proc.returncode == 0
