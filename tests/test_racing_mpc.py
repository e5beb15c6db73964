"""RacingMPC tests: single solve, receding-horizon self-consistency, SQP.

Mirrors the closed-loop pattern of test_racing_mpc.cpp:66-161 (teleport the
state to the solver's own 1-step prediction) with numeric gates.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from racing_lmpc_tpu.config import (
    TRACK_DIR,
    barc_mpc_config,
    barc_vehicle,
    replace,
)
from racing_lmpc_tpu.models import SingleTrackPlanarModel
from racing_lmpc_tpu.mpc.racing_mpc import MPCInput, RacingMPC
from racing_lmpc_tpu.track import RacingTrajectory


@pytest.fixture(scope="module")
def setup():
    base, st = barc_vehicle()
    model = SingleTrackPlanarModel(base, st)
    track = RacingTrajectory.from_file(TRACK_DIR / "barc" / "02_barc_center.txt")
    cfg = barc_mpc_config("barc_tracking_mpc", n=10, learning=False)
    mpc = RacingMPC(cfg, model)
    return model, track, cfg, mpc


def make_input(mpc, track, x_ic, v_ref, dt=0.025):
    """Centerline reference over the horizon from the current abscissa."""
    N = mpc.N
    s0 = float(x_ic[0])
    s_hor = s0 + v_ref * dt * np.arange(N)
    s_j = jnp.asarray(s_hor, dtype=jnp.float32)
    X_ref = np.zeros((N, 6), dtype=np.float32)
    X_ref[:, 0] = s_hor
    X_ref[:, 3] = v_ref
    curv = np.asarray(track.curvature(s_j))
    bl = np.asarray(track.left_boundary(s_j))
    br = np.asarray(track.right_boundary(s_j))
    return MPCInput(
        x_ic=jnp.asarray(x_ic, dtype=jnp.float32),
        u_ic=jnp.zeros(2, dtype=jnp.float32),
        X_ref=jnp.asarray(X_ref),
        U_ref=jnp.zeros((N - 1, 2), dtype=jnp.float32),
        T_ref=jnp.full((N - 1,), dt, dtype=jnp.float32),
        bound_left=jnp.asarray(bl),
        bound_right=jnp.asarray(br),
        total_length=jnp.asarray(track.total_length, dtype=jnp.float32),
        curvatures=jnp.asarray(curv),
        vel_ref=jnp.full((N,), v_ref, dtype=jnp.float32),
        ss_x=jnp.zeros((0, 6), dtype=jnp.float32),
        ss_j=jnp.zeros((0,), dtype=jnp.float32),
    )


def test_single_solve_on_centerline(setup):
    model, track, cfg, mpc = setup
    x_ic = np.array([1.0, 0.0, 0.0, 1.5, 0.0, 0.0], dtype=np.float32)
    out, z = mpc.solve(make_input(mpc, track, x_ic, v_ref=1.5))
    assert bool(out.solved)
    X = np.asarray(out.X_optm)
    U = np.asarray(out.U_optm)
    # initial state pinned
    assert np.abs(X[0] - x_ic).max() < 1e-3
    # stays near centerline
    assert np.abs(X[:, 1]).max() < 0.2
    # control bounds respected (barc: |lon| <= 0.01 from u box, |steer| <= 0.314)
    assert np.all(U[:, 0] <= 0.0105) and np.all(U[:, 0] >= -0.0105)
    assert np.abs(U[:, 1]).max() <= 0.315
    # linearized dynamics rows hold: X[i+1] = A X[i] + B U[i] + g
    As, Bs, gs = jax.vmap(model.discrete_dynamics_jacobian)(
        out.X_optm[:-1] * 0 + make_input(mpc, track, x_ic, 1.5).X_ref[:-1],
        jnp.zeros((mpc.N - 1, 2)),
        make_input(mpc, track, x_ic, 1.5).curvatures[:-1],
        jnp.full((mpc.N - 1,), 0.025))
    pred = jnp.einsum("nij,nj->ni", As, out.X_optm[:-1]) + \
        jnp.einsum("nij,nj->ni", Bs, out.U_optm) + gs
    assert np.abs(np.asarray(pred) - X[1:]).max() < 5e-3


def test_receding_horizon_self_consistency(setup):
    # the reference's closed-loop pattern: teleport to own 1-step prediction,
    # linearizing each solve around the previous plan (true RTI)
    model, track, cfg, mpc = setup
    v_ref = 1.5
    x = np.array([0.5, 0.05, 0.02, 1.2, 0.0, 0.0], dtype=np.float32)
    z = None
    out = None
    for it in range(10):
        inp = make_input(mpc, track, x, v_ref)
        if out is not None:
            # linearize around the shifted previous solution
            X_ref = jnp.concatenate([out.X_optm[1:], out.X_optm[-1:]], axis=0)
            U_ref = jnp.concatenate([out.U_optm[1:], out.U_optm[-1:]], axis=0)
            inp = inp._replace(X_ref=X_ref, U_ref=U_ref)
        out, z = mpc.solve(inp, z_warm=z)
        assert bool(out.solved), f"iteration {it} failed: rp={float(out.r_prim)}"
        x = np.asarray(out.X_optm[1])
    # stays bounded near the centerline and tracks the velocity reference
    assert abs(float(x[1])) < 0.1
    assert abs(float(x[3]) - v_ref) < 0.5


def test_boundary_slack_activates_when_outside(setup):
    model, track, cfg, mpc = setup
    # start OUTSIDE the left boundary: the soft constraint must engage
    x = np.array([0.5, 0.55, 0.0, 1.0, 0.0, 0.0], dtype=np.float32)
    out, z = mpc.solve(make_input(mpc, track, x, 1.0))
    assert float(out.boundary_slack) > 0.0
    # and the plan comes back toward the track
    assert float(out.X_optm[-1, 1]) < 0.55


def test_sqp_reduces_dynamics_defect(setup):
    model, track, cfg, mpc = setup
    x_ic = np.array([1.0, 0.1, 0.05, 1.2, 0.0, 0.0], dtype=np.float32)
    inp = make_input(mpc, track, x_ic, 1.8)

    def defect(out):
        xp = jax.vmap(model.discrete_dynamics)(
            out.X_optm[:-1], out.U_optm, inp.curvatures[:-1],
            jnp.full((mpc.N - 1,), 0.025))
        return float(jnp.abs(xp - out.X_optm[1:]).max())

    out1, _ = mpc.solve(inp)
    out5, _ = mpc.solve_sqp(inp, iters=5)
    assert defect(out5) < max(defect(out1), 1e-4)
    assert defect(out5) < 2e-3


def test_batched_solve_matches_single(setup):
    model, track, cfg, mpc = setup
    B = 4
    xs = np.tile(np.array([1.0, 0.0, 0.0, 1.5, 0.0, 0.0], dtype=np.float32), (B, 1))
    xs[:, 1] = np.linspace(-0.1, 0.1, B)
    inps = [make_input(mpc, track, xs[b], 1.5) for b in range(B)]
    batch = MPCInput(*[
        jnp.stack([getattr(i, f) for i in inps])
        if getattr(inps[0], f) is not None else None
        for f in MPCInput._fields])
    zw = jnp.zeros((B, mpc.layout.n), dtype=jnp.float32)
    valid = jnp.zeros((B,), dtype=bool)
    outs, zs = mpc.solve_batch(batch, zw, valid)
    single, _ = mpc.solve(inps[1])
    assert np.abs(np.asarray(outs.U_optm[1]) - np.asarray(single.U_optm)).max() < 1e-4


def test_warm_start_pack(setup):
    model, track, cfg, mpc = setup
    X = jnp.ones((mpc.N, 6))
    U = jnp.full((mpc.N - 1, 2), 0.005)
    dU = jnp.zeros((mpc.N - 1, 2))
    z = mpc.warm_start_vector(X, U, dU)
    assert z.shape == (mpc.layout.n,)
    # unpacking reproduces the packed controls (condensed decision vector
    # carries only the scaled controls; X/dU are affine in them)
    su = jnp.asarray(mpc.scale_u, dtype=z.dtype)
    U_back = z[:mpc.layout.nuu].reshape(mpc.N - 1, 2) * su
    assert np.abs(np.asarray(U_back) - 0.005).max() < 1e-8
