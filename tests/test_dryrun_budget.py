"""Regression guard for the driver's multichip gate (VERDICT r2 weak #1).

Round 2's `dryrun_multichip(8)` ballooned to ~230 s of XLA compile and the
driver killed it (MULTICHIP_r02 rc=137). The fixes (trip-count-1 scan
elision, bsdfs_present BSDF gating, compact=False + remat in the dryrun
config) brought it to ~40 s on a 2-vCPU host; this test pins a generous
budget so a graph-size regression is caught in-repo before the driver sees
it. Runs in a fresh subprocess because the dryrun must own the backend
(virtual 8-device CPU platform).
"""

import os
import subprocess
import sys
import time
import warnings

#: Wall budget, calibrated to the 2-vCPU bench host (~4x the measured 39 s).
#: Machine-dependent by nature (ADVICE r3): override with DRYRUN_BUDGET_S on
#: slower/contended runners, or set DRYRUN_BUDGET_ENFORCE=0 to downgrade the
#: over-budget assertion to a warning (the rc-0/OK assertions stay hard).
BUDGET_S = float(os.environ.get("DRYRUN_BUDGET_S", "150"))
ENFORCE = os.environ.get("DRYRUN_BUDGET_ENFORCE", "1") not in ("0", "false")


def test_dryrun_multichip_wall_budget():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # dryrun sets its own platform config
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8); print('OK')"],
        cwd=repo, env=env, capture_output=True, text=True,
        timeout=BUDGET_S * 2)
    wall = time.time() - t0
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK" in out.stdout
    msg = (
        f"dryrun_multichip(8) took {wall:.0f}s (budget {BUDGET_S:.0f}s) — "
        f"the multichip gate will be killed by the driver; find what grew "
        f"the traced graph (see RenderConfig.remat docstring), or raise "
        f"DRYRUN_BUDGET_S if this host is simply slower than the bench box")
    if ENFORCE:
        assert wall < BUDGET_S, msg
    elif wall >= BUDGET_S:
        warnings.warn(msg)
