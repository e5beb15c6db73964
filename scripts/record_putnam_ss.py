"""Re-record the Putnam-short warm-start safe set (seed laps for LMPC).

The reference's ``sim_putnam_short_lmpc.launch.py`` points at lap files
absent from its repository (a stale author path), so the seed laps shipped
here are recorded by THIS framework's tracking controller.  Two rules make
the seed usable by the 10 Hz IAC LMPC (learned in round 5):

1. **Start from the LMPC scenario's own launch state** (x0 v = 10 m/s,
   sim_putnam_short_lmpc.launch.py:57) so the first recorded lap contains
   the launch transient the LMPC must reproduce — a safe set made only of
   35 m/s flying laps gives the cold-started car no reachable terminal
   states.
2. **Record at a conservative velocity scale** (default 0.55).  The safe-set
   query window (32 pts/lap at dt = 0.1) spans 60-110 m of abscissa at
   flying speed; over a corner-entry speed profile the convex hull of such
   a window contains dynamically infeasible (s, v) mixtures (measured:
   terminal demand 22 m/s at a 1.3 g-limited apex the laps take at 17.5),
   which corrupts the linearized RTI plan.  A conservative seed keeps the
   hull feasible; the LMPC then improves on it lap over lap — the paper's
   learning story (arXiv:2309.10716).

Usage:  python scripts/record_putnam_ss.py [--scale 0.55] [--laps 3]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scale", type=float, default=0.55,
                    help="velocity_profile_scale for the recording run")
    ap.add_argument("--laps", type=int, default=3)
    ap.add_argument("--out", type=str, default=None,
                    help="output dir (default: the shipped data/ss/putnam_short)")
    ap.add_argument("--max-steps", type=int, default=6000)
    args = ap.parse_args()

    from racing_lmpc_tpu.config import SS_DIR
    from racing_lmpc_tpu.launch.runner import _SCENARIOS, CoSimulation, ScenarioSpec

    out = Path(args.out) if args.out else SS_DIR / "putnam_short"
    out.mkdir(parents=True, exist_ok=True)

    trk = _SCENARIOS["putnam_short_tracking_mpc"]
    lmpc = _SCENARIOS["putnam_short_lmpc"]
    spec = ScenarioSpec(**{**trk.__dict__,
                           "name": "putnam_short_ss_recording",
                           # LMPC launch state + rate (10 Hz, v0 = 10 m/s)
                           "x0_global": lmpc.x0_global,
                           "dt": lmpc.dt,
                           "velocity_profile_scale": args.scale})
    cs = CoSimulation(spec)
    # recorder wiring: the tracking controller has learning=False, so attach
    # a standalone recorder writing the shipped lap files
    from racing_lmpc_tpu.safeset import SafeSetManager, SafeSetRecorder
    mgr = SafeSetManager(args.laps + 1, nx=6, nu=2)
    rec = SafeSetRecorder(mgr, to_file=True, file_prefix=str(out / "ss_"))

    steps = 0
    while rec.lap_count < args.laps + 1 and steps < args.max_steps:
        msg = cs.vehicle_state_msg()
        x = np.array([msg.p.s, msg.p.x_tran, msg.p.e_psi,
                      msg.v.v_long, msg.v.v_tran, msg.w.w_psi])
        k_now = float(cs.track.curvature_np(x[0]))
        u_prev = np.asarray(cs._u_prev, dtype=np.float64)
        rec.step(x, u_prev, k_now, cs._t, cs.track.total_length)
        act = cs.controller_cycle(msg)
        cs.plant_cycle(act)
        steps += 1
        if steps % 100 == 0:
            tel = cs.telemetry[-1]
            print(f"[{steps:5d}] lap={rec.lap_count} s={msg.p.s:8.2f} "
                  f"v={msg.v.v_long:6.2f} solved={tel.solved}")
    fb = float(np.mean([not t.solved for t in cs.telemetry]))
    print(f"done: {rec.lap_count} laps in {steps} steps, "
          f"lap_times={rec.lap_times}, fallback={fb:.3f}")
    # the recorder writes ss_lap_1.. on completion; rename to the shipped
    # ss_lap_{1,2,3} naming if more than requested were produced
    for i in range(1, args.laps + 1):
        for suffix in ("x", "u", "k", "t"):
            f = out / f"ss_lap_{i}_{suffix}.txt"
            assert f.exists(), f"missing {f}"
    if fb > 0.05:
        print("WARNING: recording run itself had high fallback")


if __name__ == "__main__":
    main()
