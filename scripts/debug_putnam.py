"""Diagnose the putnam_short_lmpc fallback storm (VERDICT r4 missing #1).

Runs the shipped scenario step by step and prints the solver's residuals,
state, and safe-set context on every step, so the failing regime is visible.
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from racing_lmpc_tpu.launch.runner import _SCENARIOS, CoSimulation

steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200

cs = CoSimulation(_SCENARIOS["putnam_short_lmpc"])
ctrl = cs.controller
print(f"config: N={ctrl.mpc.N} K={ctrl.mpc.K} tol={ctrl.config.tol} "
      f"zoom={ctrl.config.qp_zoom_rounds} ip_iters={ctrl.config.qp_ip_iters} "
      f"learning={ctrl.config.learning} q_state_slack={getattr(ctrl.config, 'q_state_slack', None)}")

# monkeypatch controller_cycle to capture residuals
orig_step = ctrl.step
last = {}

def wrapped(x_ic, u_ic=None):
    info = orig_step(x_ic, u_ic)
    out = info.output
    last["rp"] = float(out.r_prim)
    last["rd"] = float(out.r_dual)
    last["obj"] = float(out.obj)
    last["lam"] = np.asarray(out.convex_combi)
    return info

ctrl.step = wrapped

for i in range(steps):
    tel = cs.step()
    x = tel.state
    lam = last.get("lam", np.zeros(1))
    print(f"[{i:4d}] solved={int(tel.solved)} rp={last['rp']:9.2e} "
          f"rd={last['rd']:9.2e} obj={last['obj']:11.3e} "
          f"s={x[0]:8.2f} ey={x[1]:7.3f} epsi={x[2]:7.3f} v={x[3]:6.2f} "
          f"lam_max={lam.max():.3f} lam_sum={lam.sum():.3f}")

fb = float(np.mean([not t.solved for t in cs.telemetry]))
print(f"\nfallback_rate={fb:.3f}  laps={cs.lap_num}  lap_times={cs.lap_times}")
