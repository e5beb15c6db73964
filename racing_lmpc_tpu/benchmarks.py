"""Benchmark scenario builders: batched BARC LMPC problems.

Used by bench.py (driver metric) and the multi-chip dry run.  A "scenario"
is one full LMPC solve: an initial state somewhere on the BARC track, a
rolled reference over the horizon, boundary/curvature/velocity data, and a
fixed-K safe-set batch from the recorded laps.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from racing_lmpc_tpu.config import (
    SS_DIR,
    TRACK_DIR,
    barc_mpc_config,
    barc_vehicle,
)
from racing_lmpc_tpu.models import SingleTrackPlanarModel
from racing_lmpc_tpu.mpc.racing_mpc import MPCInput, RacingMPC
from racing_lmpc_tpu.safeset import SafeSetManager, SafeSetRecorder
from racing_lmpc_tpu.track import RacingTrajectory

BARC_LAPS = tuple(str(SS_DIR / "barc" / f"ss_lap_{i}") for i in (1, 2, 3))


def build_barc_lmpc(n_horizon: int = 20, num_ss: int = 48,
                    num_ss_per_lap: int = 16, learning: bool = True,
                    dt: float = 0.025, **overrides):
    """Flagship problem: BARC single-track LMPC with the recorded safe set.
    Extra kwargs override RacingMPCConfig fields (Pareto sweeps)."""
    base, st = barc_vehicle()
    model = SingleTrackPlanarModel(base, st)
    track = RacingTrajectory.from_file(TRACK_DIR / "barc" / "02_barc_center.txt")
    cfg = barc_mpc_config(
        "barc_lmpc", n=n_horizon, learning=learning,
        num_ss_pts=num_ss, num_ss_pts_per_lap=num_ss_per_lap, **overrides)
    mpc = RacingMPC(cfg, model)
    manager = None
    if learning:
        manager = SafeSetManager(3, nx=6, nu=2)
        SafeSetRecorder(manager).load(BARC_LAPS, track.total_length)
    return model, track, cfg, mpc, manager


def make_scenario_batch(mpc: RacingMPC, track, manager, batch: int,
                        dt: float = 0.025, seed: int = 0) -> MPCInput:
    """Batch of LMPC scenarios spread around the track (leading dim = batch)."""
    rng = np.random.default_rng(seed)
    N, nx, nu, K = mpc.N, mpc.nx, mpc.nu, mpc.K
    L = track.total_length
    s0 = rng.uniform(0, L, batch)
    t0 = rng.uniform(-0.1, 0.1, batch)
    v0 = rng.uniform(1.5, 2.2, batch)

    s_hor = s0[:, None] + v0[:, None] * dt * np.arange(N)[None, :]
    X_ref = np.zeros((batch, N, nx), dtype=np.float32)
    X_ref[..., 0] = s_hor
    X_ref[..., 3] = v0[:, None]
    x_ic = X_ref[:, 0].copy()
    x_ic[:, 1] = t0

    curv = track.curvature_np(s_hor).astype(np.float32)
    bl = track.left_boundary_np(s_hor).astype(np.float32)
    br = track.right_boundary_np(s_hor).astype(np.float32)
    vel = np.clip(track.velocity_np(s_hor),
                  v0[:, None] - 1.0, v0[:, None] + 1.0).astype(np.float32)

    if manager is not None and K > 0:
        ss_x = np.zeros((batch, K, nx), dtype=np.float32)
        ss_j = np.zeros((batch, K), dtype=np.float32)
        for b in range(batch):
            sx, sjc, _ = manager.query_padded(
                X_ref[b, -1], K, mpc.config.num_ss_pts_per_lap)
            ss_x[b], ss_j[b] = sx, sjc
    else:
        ss_x = np.zeros((batch, K, nx), dtype=np.float32)
        ss_j = np.zeros((batch, K), dtype=np.float32)

    return MPCInput(
        x_ic=jnp.asarray(x_ic),
        u_ic=jnp.zeros((batch, nu), dtype=jnp.float32),
        X_ref=jnp.asarray(X_ref),
        U_ref=jnp.zeros((batch, N - 1, nu), dtype=jnp.float32),
        T_ref=jnp.full((batch, N - 1), dt, dtype=jnp.float32),
        bound_left=jnp.asarray(bl),
        bound_right=jnp.asarray(br),
        total_length=jnp.full((batch,), L, dtype=jnp.float32),
        curvatures=jnp.asarray(curv),
        vel_ref=jnp.asarray(vel),
        ss_x=jnp.asarray(ss_x),
        ss_j=jnp.asarray(ss_j),
    )


def scaling_bench(device_counts=None, batch_per_device: int = 64,
                  n_horizon: int = 20, num_ss: int = 48, reps: int = 5):
    """Weak-scaling benchmark: batch grows with the device count, so perfect
    scaling keeps the per-batch latency constant (efficiency = t_1 / t_N).

    On real multi-chip hardware this measures ICI-mesh scaling of the
    scenario-parallel LMPC solve; on a virtual CPU mesh (tests/driver) it
    validates the sharded program end-to-end.  Returns a list of dicts.
    """
    import time
    from racing_lmpc_tpu.parallel import make_mesh, shard_batch, sharded_batch_solver

    if device_counts is None:
        nd = len(jax.devices())
        device_counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= nd]

    model, track, cfg, mpc, manager = build_barc_lmpc(
        n_horizon=n_horizon, num_ss=num_ss)
    results = []
    t1 = None
    for nd in device_counts:
        mesh = make_mesh(jax.devices()[:nd])
        batch = batch_per_device * nd
        inp = make_scenario_batch(mpc, track, manager, batch)
        z = jnp.zeros((batch, mpc.layout.n), dtype=jnp.float32)
        valid = jnp.zeros((batch,), dtype=bool)
        inp_s, z_s, valid_s = (shard_batch(x, mesh) for x in (inp, z, valid))
        solver = sharded_batch_solver(mpc._solve_impl, mesh)
        out, _ = solver(inp_s, z_s, valid_s)
        out.X_optm.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(reps):
            out, _ = solver(inp_s, z_s, valid_s)
        out.X_optm.block_until_ready()
        t = (time.perf_counter() - t0) / reps
        if t1 is None:
            t1 = t
        results.append({
            "devices": nd,
            "batch": batch,
            "batch_latency_ms": round(t * 1e3, 2),
            "solves_per_s": round(batch / t, 1),
            "weak_scaling_efficiency": round(t1 / t, 4),
            "solved_fraction": round(float(jnp.mean(out.solved)), 4),
        })
    return results
