"""bench.py must complete inside the driver budget and record the
steady-state parity regime.

Round-2 verdict: the shipped bench timed out at 10 min with zero output.
Round-3 verdict: the parity window started inside the 256-step density-
grid warmup and recorded the dense regime (5x below steady state).

Two gates, both marked tpu+slow (run explicitly):

    python -m pytest tests/test_bench_budget.py -m tpu --no-header -q

* cold: fresh compilation cache — the flagship record must land with
  rc=0 inside the budget; the parity leg may be budget-cut to the
  warmup regime (documented cold behavior on this 1-core host, where
  XLA compiles alone cost ~190 s).
* warm: reusing the repo-persistent cache (what the end-of-round driver
  run sees) — BOTH legs must land, parity in regime="steady", warmup
  step below the 2 s round-2 gate.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(env_extra):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # tests' conftest pins cpu; undo
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.update(env_extra)
    t0 = time.time()
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=620,
        cwd=REPO,
    )
    wall = time.time() - t0
    lines = [ln for ln in res.stdout.splitlines() if ln.startswith("{")]
    return res, wall, [json.loads(ln) for ln in lines]


@pytest.mark.tpu
@pytest.mark.slow
def test_bench_completes_cold():
    res, wall, recs = _run_bench(
        {"TNERF_COMPILE_CACHE": tempfile.mkdtemp(prefix="bench_cold_")}
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert recs, res.stdout[-2000:]
    rec = recs[-1]
    assert rec["value"] > 0
    assert wall < 560, f"bench took {wall:.0f}s cold"
    # parity is best-effort cold: if present it must be positive and
    # carry its regime tag so the driver can tell warmup from steady
    if rec.get("parity_rays_per_sec"):
        assert rec["parity_rays_per_sec"] > 0
        assert rec["parity_regime"] in ("warmup", "steady")


@pytest.mark.tpu
@pytest.mark.slow
def test_bench_steady_state_warm():
    """The driver-run scenario: repo-persistent compile cache warm."""
    res, wall, recs = _run_bench({})  # default cache dir (repo .xla_cache)
    assert res.returncode == 0, res.stderr[-3000:]
    rec = recs[-1]
    assert rec["value"] > 0
    assert rec["parity_rays_per_sec"] and rec["parity_rays_per_sec"] > 0
    assert rec["parity_regime"] == "steady", rec
    assert rec["parity_warmup_step_s"] < 2.0, rec  # round-2 gate (was 11.7)
    assert not rec.get("provisional")
    assert wall < 480, f"bench took {wall:.0f}s warm (budget 480)"
