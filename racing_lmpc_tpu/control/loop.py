"""MPC control-loop orchestration — the ROS-node-equivalent layer.

Parity target: ``racing_mpc/src/racing_mpc_node.cpp`` (on_step_timer,
:150-477).  The essential mechanics replicated here:

- **bootstrap**: before the first feasible solution, the reference rolls the
  current state forward with ~zero control and solves the full nonlinear
  problem with IPOPT (:210-235,298-314); here that is the SQP loop over the
  same linearized QP (``RacingMPC.solve_sqp``).
- **RTI reference = shifted previous solution**: each step shifts
  last_X/last_U/last_dU by one stage, recomputes the terminal column through
  the composed discrete dynamics, and uses the result as BOTH the cost
  reference and the linearization point (:236-258).  The raceline enters
  only through vel_ref / boundaries / curvatures interpolated at the shifted
  abscissae (:260-292).
- **velocity reference clipping** vs the current speed and the speed limit
  (max_vel_ref_diff, :269-286).
- **continuous mode** advances x_ic one step with the previous command to
  compensate actuation delay (:243-247); **step mode** uses the state as-is.
- on solver failure the previous (shifted) plan keeps flying
  (racing_mpc.cpp:358-371 catch + node :322-332).

The shift + reference interpolation + QP solve is one jitted function; the
safe-set query (stateful, host-side ring buffers) runs between shift and
solve exactly as the reference queries its ``SafeSetManager`` inside
``RacingMPC::solve`` (racing_mpc.cpp:249-277).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

from racing_lmpc_tpu.config import RacingMPCConfig
from racing_lmpc_tpu.models.base import VehicleModel
from racing_lmpc_tpu.mpc.racing_mpc import MPCInput, MPCOutput, RacingMPC
from racing_lmpc_tpu.ops.math import align_abscissa
from racing_lmpc_tpu.track.trajectory import RacingTrajectory


class RegressionSpec(NamedTuple):
    """Opt-in local error-dynamics regression (the paper's headline feature,
    arXiv:2309.10716; infrastructure in safe_set.cpp:182-245 that the
    reference node never invokes).  Each group fits the one-step prediction
    error of ONE output state from selected state/control inputs with an
    Epanechnikov-kernel weighted least squares around the current operating
    point; the resulting (dA, dB, dC) corrections enter the stage
    linearization (locally constant over the horizon)."""
    dist_max: float
    # each group: (in_state_idxs, in_control_idxs, out_state_idx)
    groups: tuple


class ControllerState(NamedTuple):
    # the solve is warm-started from these shifted trajectories each cycle
    # (racing_mpc_node.cpp:248-258) — the raw decision vector of the
    # previous solve is NOT carried (the shifted pack supersedes it)
    last_X: Array    # (N, nx) previous optimal states (shifted each step)
    last_U: Array    # (N-1, nu)
    last_dU: Array   # (N-1, nu)
    lam: Array       # (K,) previous convex combination


class StepInfo(NamedTuple):
    output: MPCOutput
    u_apply: Array       # model-control applied this step
    u_base: Array        # base (fd, fb, steer) actuation published
    used_fallback: Array  # bool: previous plan kept after a failed solve


class MPCController:
    def __init__(self, config: RacingMPCConfig, model: VehicleModel,
                 track: RacingTrajectory, dt: float,
                 safe_set_query: Callable | None = None,
                 regression: RegressionSpec | None = None):
        self.config = config
        self.model = model
        self.track = track
        self.dt = dt
        self.regression = regression
        self._pred_fn = jax.jit(jax.vmap(model.discrete_dynamics))
        self.mpc = RacingMPC(config, model)
        self.safe_set_query = safe_set_query
        # applied-command pick u[delay_step] (racing_mpc_node.hpp:61,
        # racing_mpc_node.cpp:386-402); config -1 = mode-based default
        self._delay_step = (config.delay_step if config.delay_step >= 0
                            else (1 if config.step_mode == "continuous" else 0))
        vel_idx = self.mpc.idx_vel
        x_max = np.asarray(config.x_max) if len(config.x_max) == model.nx else None
        self.speed_limit = float(x_max[vel_idx]) if x_max is not None else np.inf
        self.speed_scale = 1.0
        self.state: ControllerState | None = None

        # LMPC safe-set machinery (the reference embeds these in RacingMPC,
        # racing_mpc.cpp:56-60,240-277; here they live at the loop level)
        self.ss_manager = None
        self.ss_recorder = None
        self._ss_loaded = False
        self._time = 0.0
        if config.learning and safe_set_query is None:
            from racing_lmpc_tpu.safeset import SafeSetManager, SafeSetRecorder
            self.ss_manager = SafeSetManager(
                config.max_lap_stored, nx=model.nx, nu=model.nu)
            self.ss_recorder = SafeSetRecorder(
                self.ss_manager, to_file=config.record,
                file_prefix=config.path_prefix)

        self._step_jit = jax.jit(self._rti_step)
        self._plant_step = jax.jit(self._composed_step)

    @property
    def delay_step(self) -> int:
        return self._delay_step

    @delay_step.setter
    def delay_step(self, v: int):
        """The pick index is baked into the jitted step; re-jit on change."""
        v = int(v)
        if v != self._delay_step:
            self._delay_step = v
            self._step_jit = jax.jit(self._rti_step)

    # ------------------------------------------------------------------
    def _composed_step(self, x: Array, u: Array) -> Array:
        """Model discrete dynamics with track curvature composed in — the
        node's private ``discrete_dynamics_`` (racing_mpc_node.cpp:46-50)."""
        k = self.track.curvature(x[..., 0]) \
            if self.model.base_config.modeling.use_frenet else jnp.zeros_like(x[..., 0])
        return self.model.discrete_dynamics(
            x, u, k, jnp.asarray(self.dt, dtype=x.dtype))

    def _reference_arrays(self, X_ref: Array, dtype):
        """Interpolate bounds / curvature / raw velocity at the horizon
        abscissae (racing_mpc_node.cpp:260-268)."""
        s = X_ref[:, 0]
        return (self.track.left_boundary(s), self.track.right_boundary(s),
                self.track.curvature(s), self.track.velocity(s))

    def _clip_vel_ref(self, vel_raw: Array, current_speeds: Array,
                      speed_limit: Array, speed_scale: Array) -> Array:
        """Velocity reference clipping (racing_mpc_node.cpp:269-286)."""
        d = self.config.max_vel_ref_diff
        ref = vel_raw * speed_scale
        limit_clipped = jnp.clip(speed_limit, current_speeds - d, current_speeds + d)
        ref_clipped = jnp.minimum(
            jnp.clip(ref, current_speeds - d, current_speeds + d), limit_clipped)
        return jnp.where(ref > 0.0, ref_clipped, limit_clipped)

    # ------------------------------------------------------------------
    def build_step_input(self, x_ic: Array, u_ic: Array,
                         state: ControllerState, ss_x: Array, ss_j: Array,
                         speed_limit: Array, speed_scale: Array,
                         regs=None) -> tuple[MPCInput, Array, Array]:
        """Shift the previous plan and assemble this cycle's solver input
        (racing_mpc_node.cpp:236-292).  Pure/jittable; also callable outside
        jit to CAPTURE the exact per-cycle QP parameters — the golden-match
        test replays these through the f64 reference-QP oracle
        (mpc/reference_qp.py).  Returns (inp, z_warm, dU_ref)."""
        mpc = self.mpc
        N, nu = mpc.N, mpc.nu
        dtype = x_ic.dtype

        # continuous mode: predict one step ahead with the in-flight command
        if self.config.step_mode == "continuous":
            x_ic = self._composed_step(x_ic, state.last_U[0])

        # shift previous solution (racing_mpc_node.cpp:248-258)
        X_term = self._composed_step(state.last_X[-1], state.last_U[-1])
        X_ref = jnp.concatenate([state.last_X[1:], X_term[None]], axis=0)
        U_ref = jnp.concatenate([state.last_U[1:], state.last_U[-1:]], axis=0)
        dU_ref = jnp.concatenate(
            [state.last_dU[1:], jnp.zeros((1, nu), dtype=dtype)], axis=0)

        bl, br, curv, vel_raw = self._reference_arrays(X_ref, dtype)
        vel_ref = self._clip_vel_ref(
            vel_raw, X_ref[:, mpc.idx_vel], speed_limit, speed_scale)

        inp = MPCInput(
            x_ic=x_ic, u_ic=u_ic, X_ref=X_ref, U_ref=U_ref,
            T_ref=jnp.full((N - 1,), self.dt, dtype=dtype),
            bound_left=bl, bound_right=br,
            total_length=jnp.asarray(self.track.total_length, dtype=dtype),
            curvatures=curv, vel_ref=vel_ref, ss_x=ss_x, ss_j=ss_j,
            dA=None if regs is None else regs[0],
            dB=None if regs is None else regs[1],
            dC=None if regs is None else regs[2])

        z_warm = mpc.warm_start_vector(X_ref, U_ref, dU_ref, state.lam)
        return inp, z_warm, dU_ref

    def _nl_rollout(self, x0: Array, U: Array) -> Array:
        """Nonlinear rollout of a control plan through the composed discrete
        dynamics (curvature at each state's own abscissa) — dynamically
        consistent by construction."""
        def body(x, u):
            xn = self._composed_step(x, u)
            return xn, xn
        _, Xs = jax.lax.scan(body, x0, U)
        return jnp.concatenate([x0[None], Xs], axis=0)

    def _rti_step(self, x_ic: Array, u_ic: Array, state: ControllerState,
                  ss_x: Array, ss_j: Array, speed_limit: Array,
                  speed_scale: Array,
                  regs=None) -> tuple[ControllerState, StepInfo]:
        mpc = self.mpc
        inp, z_warm, dU_ref = self.build_step_input(
            x_ic, u_ic, state, ss_x, ss_j, speed_limit, speed_scale, regs)
        X_ref, U_ref = inp.X_ref, inp.U_ref
        n_steps = max(1, self.config.sqp_relin_steps)
        if n_steps == 1:
            out, _ = mpc._solve_impl(inp, z_warm, jnp.asarray(True))
        else:
            # In-loop SQP re-linearization (config.sqp_relin_steps > 1): the
            # reference solves the full NLP to convergence every cycle
            # (racing_mpc.cpp:85-103, IPOPT max_iter 200); one RTI
            # linearization around the shifted plan is exact enough at short
            # horizons but drifts over long fast ones (IAC Putnam: 6 s x 60
            # stages) until the "solved" plan is unphysical.  Iteration 0
            # solves at the shifted reference exactly like the RTI path;
            # each further iteration re-linearizes around the nonlinear
            # ROLLOUT of the accepted controls (physical by construction),
            # re-interpolates the track data at the rollout abscissae,
            # re-solves, and damps the control update (solve_sqp's
            # alpha = 0.5), keeping the previous iterate if the re-solve
            # fails.  One _solve_impl instance inside a lax.while_loop —
            # the jitted graph stays the size of a single solve, and the
            # loop STOPS EARLY once the damped control update falls below
            # sqp_relin_tol (scaled units): at steady state on the
            # raceline one linearization is already consistent and the
            # cycle costs a single solve; the extra re-linearizations only
            # run in the transients that need them (measured: the always-
            # run-3 variant cost 169 ms/cycle on-chip at N=60/K=96 vs the
            # 85 ms solve cap; with the SQP convergence stop the steady-
            # state cycle is one solve).
            out_sd, _ = jax.eval_shape(
                mpc._solve_impl, inp, z_warm, jnp.asarray(True))
            init = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), out_sd)
            su = jnp.asarray(mpc.scale_u, dtype=x_ic.dtype)
            tol = jnp.asarray(self.config.sqp_relin_tol, dtype=x_ic.dtype)

            def sqp_cond(c):
                prev, it, active = c
                return active & (it < n_steps)

            def sqp_body(c):
                prev, it, _ = c
                first = it == 0
                U = prev.U_optm
                X_roll = self._nl_rollout(inp.x_ic, U)
                bl, br, curv, vel_raw = self._reference_arrays(
                    X_roll, x_ic.dtype)
                vel_r = self._clip_vel_ref(
                    vel_raw, X_roll[:, mpc.idx_vel], speed_limit, speed_scale)
                inp_r = inp._replace(
                    X_ref=X_roll, U_ref=U, bound_left=bl, bound_right=br,
                    curvatures=curv, vel_ref=vel_r)
                inp_eff = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(first, a, b), inp, inp_r)
                out_r, _ = mpc._solve_impl(inp_eff, z_warm, jnp.asarray(True))
                U_new = jnp.where(
                    first, out_r.U_optm, U + 0.5 * (out_r.U_optm - U))
                X_new = jnp.where(
                    first, out_r.X_optm, self._nl_rollout(inp.x_ic, U_new))
                cand = out_r._replace(U_optm=U_new, X_optm=X_new)
                keep = first | out_r.solved
                nxt = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(keep, a, b), cand, prev)
                # SQP convergence on the APPLIED stages: the gate metric and
                # the flown command are u[0..delay]; the tail of a 60-stage
                # horizon keeps wiggling on its degenerate face long after
                # the applied controls have converged (measured: whole-
                # horizon du never fell below tol in steady state, so the
                # loop always ran all rounds — 169 ms/cycle).  The shifted
                # warm start re-handles the tail next cycle; a transient
                # that matters moves the head stages far beyond tol.  A
                # failed re-solve also stops (the next round would re-solve
                # the identical subproblem).
                du = jnp.max(jnp.abs(U_new[:4] - U[:4]) / su)
                active = jnp.where(first, jnp.asarray(True),
                                   out_r.solved & (du >= tol))
                return nxt, it + 1, active

            out, _, _ = jax.lax.while_loop(
                sqp_cond, sqp_body, (init, jnp.asarray(0), jnp.asarray(True)))

        # on failure keep flying the shifted previous plan
        ok = out.solved
        new_X = jnp.where(ok, out.X_optm, X_ref)
        new_U = jnp.where(ok, out.U_optm, U_ref)
        new_dU = jnp.where(ok, out.dU_optm, dU_ref)
        new_lam = jnp.where(ok, out.convex_combi, state.lam) \
            if self.config.learning else state.lam
        new_state = ControllerState(new_X, new_U, new_dU, new_lam)

        u_apply = new_U[self.delay_step]
        x_apply = new_X[self.delay_step]
        u_base = self.model.to_base_control(x_apply, u_apply)
        return new_state, StepInfo(
            output=out, u_apply=u_apply, u_base=u_base,
            used_fallback=~ok)

    # ------------------------------------------------------------------
    def bootstrap(self, x_ic: Array, sqp_iters: int = 8) -> ControllerState:
        """First-solution bootstrap (racing_mpc_node.cpp:210-235): roll the
        state forward with ~zero control, then SQP to a feasible plan."""
        mpc = self.mpc
        N, nu, nx = mpc.N, mpc.nu, mpc.nx
        dtype = jnp.asarray(x_ic).dtype
        U0 = jnp.full((N - 1, nu), 1e-9, dtype=dtype)
        xs = [jnp.asarray(x_ic, dtype=dtype)]
        for i in range(N - 1):
            xs.append(self._plant_step(xs[-1], U0[i]))
        X0 = jnp.stack(xs)

        bl, br, curv, vel_raw = self._reference_arrays(X0, dtype)
        vel_ref = self._clip_vel_ref(
            vel_raw, X0[:, mpc.idx_vel],
            jnp.asarray(self.speed_limit, dtype=dtype),
            jnp.asarray(self.speed_scale, dtype=dtype))
        ss_x, ss_j = self._query_safe_set(X0[-1])
        inp = MPCInput(
            x_ic=jnp.asarray(x_ic, dtype=dtype),
            u_ic=jnp.zeros((nu,), dtype=dtype),
            X_ref=X0, U_ref=U0,
            T_ref=jnp.full((N - 1,), self.dt, dtype=dtype),
            bound_left=bl, bound_right=br,
            total_length=jnp.asarray(self.track.total_length, dtype=dtype),
            curvatures=curv, vel_ref=vel_ref, ss_x=ss_x, ss_j=ss_j)
        out, _ = mpc.solve_sqp(inp, iters=sqp_iters)
        lam = out.convex_combi if self.config.learning else jnp.zeros((0,), dtype=dtype)
        self.state = ControllerState(out.X_optm, out.U_optm, out.dU_optm, lam)
        return self.state

    def _query_safe_set(self, x_terminal: Array):
        """Fixed-K safe-set query (racing_mpc.cpp:249-277).  Falls back to
        pinning the terminal hull at the terminal reference when no laps are
        stored yet (the reference leaves zero-valued Opti parameters there,
        which degenerates to x_N ~ 0 — we keep the plan consistent instead)."""
        K = self.mpc.K
        if not self.config.learning:
            return (jnp.zeros((K, self.mpc.nx), dtype=jnp.float32),
                    jnp.zeros((K,), dtype=jnp.float32))
        x_t = np.asarray(x_terminal)
        if self.safe_set_query is not None:
            ss_x, ss_j = self.safe_set_query(x_t, K)
            return (jnp.asarray(ss_x, dtype=jnp.float32),
                    jnp.asarray(ss_j, dtype=jnp.float32))
        ss_x, ss_j, found = self.ss_manager.query_padded(
            x_t, K, self.config.num_ss_pts_per_lap)
        if not found:
            ss_x = np.tile(x_t, (K, 1))
            ss_j = np.zeros(K, dtype=np.float32)
        return (jnp.asarray(ss_x, dtype=jnp.float32),
                jnp.asarray(ss_j, dtype=jnp.float32))

    def change_trajectory(self, new_track: RacingTrajectory):
        """Raceline hot-swap with frenet re-projection of the stored plan
        (racing_mpc_node.cpp change_trajectory, :509-571): every pose of the
        previous solution is converted old-frenet -> global -> new-frenet
        (body velocities are frame-independent), so the shifted warm start
        stays valid across the switch.  The jitted step closes over the
        track's spline tables, so the step function is re-jitted (compile
        cache per trajectory, mirroring the reference's per-trajectory
        interpolant rebuild)."""
        old = self.track
        if self.state is not None:
            X = self.state.last_X                       # (N, nx) old frenet
            pose_g = jax.vmap(old.frenet_to_global)(X[:, :3])
            s_seed = new_track.nearest_waypoint_abscissa(pose_g[:, :2])
            pose_f = jax.vmap(new_track.global_to_frenet)(pose_g, s_seed)
            X_new = jnp.concatenate([pose_f, X[:, 3:]], axis=-1)
            self.state = self.state._replace(last_X=X_new)
        self.track = new_track
        self._step_jit = jax.jit(self._rti_step)
        self._plant_step = jax.jit(self._composed_step)

    def on_trajectory_command(self, cmd, track_map=None):
        """Apply a ``TrajectoryCommand`` (lmpc_msgs): raceline switch via the
        trajectory map, speed limit, velocity-profile scale
        (racing_mpc_node.cpp:131-148,479-507,573-598)."""
        if track_map is not None and cmd.trajectory_index >= 0:
            try:
                tr = track_map.get_trajectory(int(cmd.trajectory_index))
            except KeyError:
                tr = None   # unknown index ignored (node logs+skips, :495)
            if tr is not None and tr is not self.track:
                self.change_trajectory(tr)
        if cmd.speed_limit > 0.0:
            self.speed_limit = float(cmd.speed_limit)
        if cmd.velocity_profile_scale > 0.0:
            self.speed_scale = float(cmd.velocity_profile_scale)

    def step(self, x_ic: Array, u_ic: Array | None = None) -> StepInfo:
        """One control cycle.  ``x_ic`` is the current model state (Frenet),
        ``u_ic`` the previously applied model control."""
        x_np = np.asarray(x_ic, dtype=np.float64)
        x_ic = jnp.asarray(x_ic, dtype=jnp.float32)
        if u_ic is None:
            u_ic = jnp.zeros((self.mpc.nu,), dtype=jnp.float32)

        # LMPC bookkeeping: lazy lap load + per-step recording
        # (racing_mpc.cpp:240-246)
        if self.ss_recorder is not None:
            if self.config.load and not self._ss_loaded:
                self.ss_recorder.load(self.config.load_path, self.track.total_length)
                self._ss_loaded = True
            # host spline twin: a device round trip per recorder step would
            # dominate the cycle on tunneled/remote TPUs
            k_now = float(self.track.curvature_np(x_np[0]))
            self.ss_recorder.step(
                x_np, np.asarray(u_ic), k_now, self._time,
                self.track.total_length)
            self._time += self.dt

        if self.state is None:
            self.bootstrap(x_ic)
        # safe-set query at the (to-be-shifted) terminal point
        ss_x, ss_j = self._query_safe_set(self.state.last_X[-1])
        regs = self._query_regression(x_np, np.asarray(u_ic))
        self.state, info = self._step_jit(
            x_ic, jnp.asarray(u_ic, dtype=jnp.float32), self.state, ss_x, ss_j,
            jnp.asarray(self.speed_limit, dtype=jnp.float32),
            jnp.asarray(self.speed_scale, dtype=jnp.float32), regs)
        return info

    def _query_regression(self, x_np: np.ndarray, u_np: np.ndarray):
        """Per-step error-dynamics regression around the current operating
        point -> (dA, dB, dC) corrections, or None when disabled/no laps."""
        if (self.regression is None or self.ss_manager is None
                or self.ss_manager.num_laps == 0):
            return None
        from racing_lmpc_tpu.safeset.safe_set import RegQuery
        nx, nu = self.model.nx, self.model.nu
        groups = self.regression.groups
        # ONE multi-group query: the group-independent one-step prediction
        # sweep over the stored laps runs once instead of once per group
        res = self.ss_manager.query_regression(RegQuery(
            x=tuple(np.concatenate([x_np[list(in_x)], u_np[list(in_u)]])
                    for in_x, in_u, _ in groups),
            dist_max=self.regression.dist_max,
            reg_in_state_idxs=tuple(tuple(g[0]) for g in groups),
            reg_in_control_idxs=tuple(tuple(g[1]) for g in groups),
            reg_out_state_idxs=tuple((g[2],) for g in groups),
            A=np.zeros((nx, nx)), B=np.zeros((nx, nu)), C=np.zeros(nx),
            f=lambda x, u, k, dt: self.model.discrete_dynamics(x, u, k, dt)))
        return (jnp.asarray(res.A, dtype=jnp.float32),
                jnp.asarray(res.B, dtype=jnp.float32),
                jnp.asarray(res.C, dtype=jnp.float32))
