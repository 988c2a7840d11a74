"""bench.py must complete inside the driver budget — COLD (round-2
verdict: the shipped bench timed out at 10 min with zero output).

Marked tpu+slow: runs the real two-leg bench on the attached chip with a
fresh compilation-cache dir, asserts wall < 8 min and that the LAST JSON
line carries both legs.  Run explicitly:

    python -m pytest tests/test_bench_budget.py -m tpu --no-header -q
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.tpu
@pytest.mark.slow
def test_bench_completes_cold():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # tests' conftest pins cpu; undo
    env["TNERF_COMPILE_CACHE"] = tempfile.mkdtemp(prefix="bench_cold_")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    t0 = time.time()
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=560,
        cwd=REPO,
    )
    wall = time.time() - t0
    assert res.returncode == 0, res.stderr[-3000:]
    lines = [
        ln for ln in res.stdout.splitlines() if ln.startswith("{")
    ]
    assert lines, res.stdout[-2000:]
    rec = json.loads(lines[-1])
    assert rec["value"] > 0
    assert rec["parity_rays_per_sec"] and rec["parity_rays_per_sec"] > 0
    assert rec["parity_warmup_step_s"] < 2.0, rec  # round-2 gate (was 11.7)
    assert wall < 480, f"bench took {wall:.0f}s cold (budget 480)"
