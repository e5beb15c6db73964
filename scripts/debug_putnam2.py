"""Deep-dive: plan-level diagnostics for the putnam_short_lmpc fallback storm."""
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

jax.config.update("jax_platforms", "cpu")

from racing_lmpc_tpu.launch.runner import _SCENARIOS, CoSimulation

steps = int(sys.argv[1]) if len(sys.argv) > 1 else 60

cs = CoSimulation(_SCENARIOS["putnam_short_lmpc"])
ctrl = cs.controller

orig_qss = ctrl._query_safe_set
ss_info = {}

def qss(x_t):
    ss_x, ss_j = orig_qss(x_t)
    sx = np.asarray(ss_x)
    sj = np.asarray(ss_j)
    ss_info["s_rng"] = (sx[:, 0].min(), sx[:, 0].max())
    ss_info["v_rng"] = (sx[:, 3].min(), sx[:, 3].max())
    ss_info["j_rng"] = (sj.min(), sj.max())
    ss_info["xt"] = np.asarray(x_t)
    return ss_x, ss_j

ctrl._query_safe_set = qss

for i in range(steps):
    tel = cs.step()
    st = ctrl.state
    X = np.asarray(st.last_X)
    U = np.asarray(st.last_U)
    lam = np.asarray(st.lam)
    x = tel.state
    u = tel.control
    xt = ss_info["xt"]
    print(f"[{i:3d}] ok={int(tel.solved)} s={x[0]:7.2f} ey={x[1]:6.2f} "
          f"v={x[3]:5.2f} | u=({u[0]:8.1f},{u[1]:6.3f}) | "
          f"plan: vmin={X[:,3].min():5.2f} vmax={X[:,3].max():5.2f} "
          f"eymin={X[:,1].min():6.2f} eymax={X[:,1].max():6.2f} "
          f"xN=(s={X[-1,0]:7.2f},ey={X[-1,1]:5.2f},v={X[-1,3]:5.2f}) | "
          f"q@(s={xt[0]:6.1f},v={xt[3]:5.1f}) "
          f"ss_s=[{ss_info['s_rng'][0]:6.1f},{ss_info['s_rng'][1]:6.1f}] "
          f"ss_v=[{ss_info['v_rng'][0]:4.1f},{ss_info['v_rng'][1]:4.1f}] "
          f"ss_j=[{ss_info['j_rng'][0]:6.1f},{ss_info['j_rng'][1]:6.1f}] "
          f"lam_max={lam.max() if lam.size else 0:.3f}")
