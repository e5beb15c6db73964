"""In-process co-simulation runners mirroring the reference launch files.

Parity target: ``racing_lmpc_launch/launch/{barc,putnam}/*.launch.py`` — each
launch spawns a simulator node (global frame, ``use_frenet: False``) and an
MPC node (Frenet frame) connected by DDS topics.  Here both live in one
process connected by the same message dataclasses; the per-step global<->
Frenet conversions of the two nodes (racing_simulator_node.cpp:266-284,
racing_mpc_node.cpp:180-186) run exactly as in the reference, which makes
these runners an end-to-end exercise of the full stack including the track
projections.

Entry points (same scenario names as the launch files):
    sim_barc_lmpc, sim_barc_tracking_mpc, sim_putnam_short_lmpc,
    sim_putnam_short_tracking_mpc, sim_putnam_config_a_tracking_mpc

Run e.g.:  python -m racing_lmpc_tpu.launch.runner barc_lmpc --steps 400
"""

from __future__ import annotations

import argparse
import json
import time
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from racing_lmpc_tpu.config import (
    PARAM_DIR,
    SS_DIR,
    TRACK_DIR,
    SimulatorConfig,
    load_ros_params,
    mpc_config_from_params,
    simulator_config_from_params,
    single_track_config_from_params,
    vehicle_config_from_params,
)
from racing_lmpc_tpu.control.loop import MPCController
from racing_lmpc_tpu.control.telemetry import CycleProfiler
from racing_lmpc_tpu.models import SingleTrackPlanarModel
from racing_lmpc_tpu.msgs import MPCTelemetry, VehicleActuationMsg, VehicleStateMsg
from racing_lmpc_tpu.sim import RacingSimulator
from racing_lmpc_tpu.track import RacingTrajectory, RacingTrajectoryMap


@dataclass
class ScenarioSpec:
    name: str
    vehicle_base_yaml: str
    vehicle_model_yaml: str
    mpc_yaml: str
    track_dir: str
    sim_track_file: str
    default_traj_idx: int
    x0_global: tuple
    dt: float = 0.025
    velocity_profile_scale: float = 1.0
    delay_step: int | None = None   # None = use the MPC config / mode default
    n_override: int | None = None
    load_laps: tuple = ()
    mpc_extra: dict = field(default_factory=dict)


# the five shipped launch scenarios (racing_lmpc_launch/launch/**)
_SCENARIOS = {
    "barc_lmpc": ScenarioSpec(
        name="barc_lmpc",
        vehicle_base_yaml="barc_base.param.yaml",
        vehicle_model_yaml="barc_single_track.param.yaml",
        mpc_yaml="barc_lmpc.param.yaml",
        track_dir="barc", sim_track_file="barc/02_barc_center.txt",
        default_traj_idx=2,
        x0_global=(1.0, 0.0, 0.0, 1.5, 0.0, 0.0),
        velocity_profile_scale=0.9,
        load_laps=tuple(str(SS_DIR / "barc" / f"ss_lap_{i}") for i in (1, 2, 3)),
    ),
    "barc_tracking_mpc": ScenarioSpec(
        name="barc_tracking_mpc",
        vehicle_base_yaml="barc_base.param.yaml",
        vehicle_model_yaml="barc_single_track.param.yaml",
        mpc_yaml="barc_tracking_mpc.param.yaml",
        track_dir="barc", sim_track_file="barc/02_barc_center.txt",
        default_traj_idx=2,
        x0_global=(1.0, 0.0, 0.0, 1.5, 0.0, 0.0),
        velocity_profile_scale=0.9,
    ),
    "putnam_short_lmpc": ScenarioSpec(
        name="putnam_short_lmpc",
        vehicle_base_yaml="iac_car_base.param.yaml",
        vehicle_model_yaml="iac_car_single_track.param.yaml",
        mpc_yaml="iac_car_lmpc.param.yaml",
        track_dir="putnam_short",
        sim_track_file="putnam_short/08_putnam_short_optm.txt",
        default_traj_idx=8,
        x0_global=(-10.0, 2.0, 3.14, 10.0, 0.0, 0.0),
        dt=0.1,
        # warm-start safe set recorded with the tracking controller on this
        # raceline (the reference's launch points at laps absent from its
        # repo — a stale author path; these replace them).  This 10 Hz IAC
        # LMPC configuration drifts into transient x-box LP-infeasibilities
        # (~0.05 rad over one stage, elastic-LP certified); the ELASTIC
        # state boxes (q_state_slack, racing_mpc.py) absorb them instead of
        # forcing fallbacks — the reference cannot run this scenario as
        # shipped at all (missing lap files).
        load_laps=tuple(str(SS_DIR / "putnam_short" / f"ss_lap_{i}")
                        for i in (1, 2, 3)),
        # sqp_relin_steps=3: at 10 Hz with a 6 s, 60-stage horizon one RTI
        # linearization drifts far enough from the rollout that the QP's
        # "solved" plans go unphysical at corner transitions (observed:
        # planned ey 14 m / v -1.7 while "solved", commanding panic
        # braking); re-linearizing around the nonlinear rollout restores
        # the reference's converged-NLP-per-cycle semantics
        # (racing_mpc.cpp:85-103, IPOPT max_iter 200 at this same 10 Hz).
        mpc_extra={"q_state_slack": 2000.0, "sqp_relin_steps": 3},
    ),
    "putnam_short_tracking_mpc": ScenarioSpec(
        name="putnam_short_tracking_mpc",
        vehicle_base_yaml="iac_car_base.param.yaml",
        vehicle_model_yaml="iac_car_single_track.param.yaml",
        mpc_yaml="iac_car_tracking_mpc.param.yaml",
        track_dir="putnam_short",
        sim_track_file="putnam_short/08_putnam_short_optm.txt",
        default_traj_idx=8,
        x0_global=(-10.0, 2.0, 3.14, 15.0, 0.0, 0.0),
    ),
    "putnam_config_a_tracking_mpc": ScenarioSpec(
        name="putnam_config_a_tracking_mpc",
        vehicle_base_yaml="iac_car_base.param.yaml",
        vehicle_model_yaml="iac_car_single_track.param.yaml",
        mpc_yaml="iac_car_tracking_mpc.param.yaml",
        track_dir="putnam", sim_track_file="putnam/10_putnam_optm.txt",
        default_traj_idx=10,
        x0_global=(-10.0, 2.0, 3.14, 15.0, 0.0, 0.0),
    ),
}


class CoSimulation:
    """Lock-step simulator + controller, the in-process equivalent of the
    two-node launch ("step" co-simulation mode)."""

    def __init__(self, spec: ScenarioSpec, n_override: int | None = None,
                 mpc_overrides: dict | None = None):
        self.spec = spec
        params = load_ros_params(PARAM_DIR / spec.vehicle_base_yaml,
                                 PARAM_DIR / spec.vehicle_model_yaml)
        base = vehicle_config_from_params(params)
        st = single_track_config_from_params(params)

        # simulator model runs in the global frame (launch: use_frenet False)
        base_global = type(base)(**{
            **base.__dict__,
            "modeling": type(base.modeling)(
                use_frenet=False,
                integrator_type=base.modeling.integrator_type,
                sample_throttle=base.modeling.sample_throttle)})
        self.sim_model = SingleTrackPlanarModel(base_global, st)
        self.ctrl_model = SingleTrackPlanarModel(base, st)

        self.track = RacingTrajectory.from_file(TRACK_DIR / spec.sim_track_file)
        self.track_map = RacingTrajectoryMap(TRACK_DIR / spec.track_dir)

        overrides = {**spec.mpc_extra, **(mpc_overrides or {})}
        if spec.load_laps:
            overrides.setdefault("load", True)
            overrides.setdefault("load_path", spec.load_laps)
        if n_override:
            overrides["n"] = n_override
        overrides.setdefault("step_mode", "step")
        mpc_cfg = mpc_config_from_params(
            load_ros_params(PARAM_DIR / spec.mpc_yaml), **overrides)

        self.controller = MPCController(mpc_cfg, self.ctrl_model, self.track,
                                        spec.dt)
        self.controller.speed_scale = spec.velocity_profile_scale
        if spec.delay_step is not None:
            self.controller.delay_step = spec.delay_step

        self.simulator = RacingSimulator(
            SimulatorConfig(dt=spec.dt, x0=spec.x0_global, step_mode="step"),
            self.sim_model, self.track)

        self.profiler = CycleProfiler(capacity=40)
        self.telemetry: list[MPCTelemetry] = []
        self.lap_times: list[float] = []
        self._lap_start_t = 0.0
        self._t = 0.0
        self._last_s = None
        self._s_prev_seed = None
        self._u_prev = jnp.zeros((self.ctrl_model.nu,), dtype=jnp.float32)
        self.lap_num = 0
        # optional state estimator hook: maps the (possibly noisy) published
        # VehicleStateMsg to the msg the controller consumes — the in-process
        # seam where the reference would run ekf_state_estimator between the
        # simulator and the MPC node topics
        self.state_filter = None

    # ------------------------------------------------------------------
    def vehicle_state_msg(self) -> VehicleStateMsg:
        """Global sim state -> full VehicleStateMsg incl. parametric pose
        and velocity (racing_simulator_node update_vehicle_state_msg,
        :203-238)."""
        # host spline twins: one device pull for the state, all frenet/
        # curvature bookkeeping on the host (a device call per quantity
        # would dominate the loop on tunneled/remote TPUs)
        x = np.asarray(self.simulator.x)
        pf = self.track.global_to_frenet_np(
            x[:3].astype(np.float64), s_prev=self._s_prev_seed)
        self._s_prev_seed = float(pf[0])
        msg = VehicleStateMsg(t=self._t)
        msg.x.x, msg.x.y = float(x[0]), float(x[1])
        msg.e.psi = float(x[2])
        msg.v.v_long, msg.v.v_tran = float(x[3]), float(x[4])
        msg.w.w_psi = float(x[5])
        msg.p.s, msg.p.x_tran, msg.p.e_psi = map(float, pf)
        k = float(self.track.curvature_np(pf[0]))
        msg.pt.ds = float(
            (x[3] * np.cos(pf[2]) - x[4] * np.sin(pf[2])) / (1.0 - pf[1] * k))
        msg.pt.dx_tran = float(x[3] * np.sin(pf[2]) + x[4] * np.cos(pf[2]))
        msg.pt.de_psi = float(x[5] - k * msg.pt.ds)
        msg.lap_num = float(self.lap_num)
        return msg

    def controller_cycle(self, msg: VehicleStateMsg) -> VehicleActuationMsg:
        """Controller node half: VehicleStateMsg -> solve -> actuation
        (racing_mpc_node on_step_timer, :150-477)."""
        if self.state_filter is not None:
            msg = self.state_filter(msg)
        x_frenet = jnp.asarray(
            [msg.p.s, msg.p.x_tran, msg.p.e_psi,
             msg.v.v_long, msg.v.v_tran, msg.w.w_psi], dtype=jnp.float32)

        t0 = time.perf_counter()
        info = self.controller.step(x_frenet, u_ic=self._u_prev)
        # ONE host<->device round trip for everything this cycle consumes
        u_base, u_apply, obj, x0, fb = jax.device_get(
            (info.u_base, info.u_apply, info.output.obj,
             info.output.X_optm[0], info.used_fallback))
        solve_time = time.perf_counter() - t0
        self.profiler.add_cycle_stats(solve_time)
        self._u_prev = info.u_apply

        # actuation: dominant-force sign split (racing_mpc_node.cpp:396-402)
        u_a = u_base[0] if abs(u_base[0]) > abs(u_base[1]) else u_base[1]
        act = VehicleActuationMsg(t=self._t, u_a=float(u_a),
                                  u_steer=float(u_base[2]))

        tel = MPCTelemetry(
            trajectory_index=self.spec.default_traj_idx,
            solved=not bool(fb),
            cost=float(obj),
            state=[float(v) for v in x0],
            control=[float(v) for v in u_apply],
            solve_time=solve_time)
        self.telemetry.append(tel)
        return act

    def plant_cycle(self, act: VehicleActuationMsg) -> VehicleStateMsg:
        """Simulator node half: actuation -> plant step -> next state msg
        (racing_simulator_node on_state_update, :240-332)."""
        # simulator sign-splits u_a back (racing_simulator_node.cpp:249-254)
        fd = max(act.u_a, 0.0)
        fb = min(act.u_a, 0.0)
        self.simulator.step(jnp.asarray([fd, fb, act.u_steer], dtype=jnp.float32))

        msg = self.vehicle_state_msg()
        # lap counting by abscissa wrap (racing_simulator_node.cpp:266-284)
        s_now = msg.p.s
        if self._last_s is not None and self._last_s - s_now > 0.5 * self.track.total_length:
            self.lap_num += 1
            if self._lap_start_t > 0.0 or self.lap_num > 1:
                self.lap_times.append(self._t - self._lap_start_t)
            self._lap_start_t = self._t
        self._last_s = s_now
        self._t += self.spec.dt
        return msg

    def step(self) -> MPCTelemetry:
        """One lock-step cycle: state -> MPC -> actuation -> plant."""
        msg = self.vehicle_state_msg()
        act = self.controller_cycle(msg)
        self.plant_cycle(act)
        return self.telemetry[-1]

    def run(self, steps: int, log_every: int = 0) -> dict:
        for i in range(steps):
            tel = self.step()
            if log_every and i % log_every == 0:
                x = np.asarray(self.simulator.x)
                print(f"[{i:5d}] t={self._t:7.2f}s lap={self.lap_num} "
                      f"s={self._last_s:7.2f} solved={tel.solved} "
                      f"solve={tel.solve_time * 1e3:6.1f}ms")
        prof = self.profiler.profile()
        diag = prof.to_diagnostic_status(
            f"{self.spec.name} MPC Solve Time", "s", self.spec.dt)
        return {
            "laps": self.lap_num,
            "lap_times": self.lap_times,
            "fallback_rate": float(np.mean(
                [not t.solved for t in self.telemetry])),
            "solve_time": {"min": prof.min, "mean": prof.mean, "max": prof.max},
            "diagnostics": diag,
        }

    def export_telemetry(self, path: str | Path):
        Path(path).write_text(json.dumps([t.to_dict() for t in self.telemetry]))


class ContinuousCoSimulation:
    """Continuous-mode co-simulation on a simulated clock.

    The reference's continuous mode runs both nodes on wall-clock timers:
    the simulator integrates and publishes ``vehicle_state`` every sim tick
    (racing_simulator_node.cpp:125-129 timer + the state-republish KEEPALIVE
    :172-189 that keeps publishing even when no actuation arrives), while
    the MPC node solves on its own period and delay-compensates by
    advancing x_ic one step with the in-flight command and applying
    ``u[delay_step]`` (racing_mpc_node.cpp:114-118,386-402;
    control/loop.py continuous branch).  Here the same topology runs on a
    deterministic simulated clock: one plant tick every ``sim_dt``
    (continuous_simulator.param.yaml: 0.01 s), one controller cycle every
    ``spec.dt`` (0.025 s), actuation taking effect on the NEXT plant tick.

    ``actuation_gate(t) -> bool`` simulates actuation loss: while it
    returns False the controller output is dropped, and the keepalive path
    keeps the plant integrating and publishing with the last command.
    """

    def __init__(self, spec: ScenarioSpec, sim_dt: float = 0.01,
                 n_override: int | None = None, mpc_overrides: dict | None = None):
        ov = dict(mpc_overrides or {})
        ov["step_mode"] = "continuous"
        self.cs = CoSimulation(spec, n_override=n_override, mpc_overrides=ov)
        self.sim_dt = sim_dt
        self.ctrl_dt = spec.dt      # controller timer period (two timers
        # with a non-integer ratio, like the reference's 25 ms MPC timer
        # over the 10 ms continuous simulator; scheduled by accumulator)
        self._next_ctrl_t = 0.0
        # delayed-actuation pick: the command computed now is applied
        # delay_step control periods later (racing_mpc_node.hpp:61); the
        # continuous-mode default of 1 comes from RacingMPCConfig.delay_step
        # = -1 (auto) — an explicit config value is honored as-is
        self.cs.simulator = type(self.cs.simulator)(
            SimulatorConfig(dt=sim_dt, x0=spec.x0_global,
                            step_mode="continuous"),
            self.cs.sim_model, self.cs.track)
        self.act: VehicleActuationMsg | None = None
        self.published: list[VehicleStateMsg] = []
        self._tick = 0

    def _plant_tick(self):
        """One sim integration + state publish at the sim rate
        (racing_simulator_node.cpp:240-332, lap counting :266-284)."""
        cs = self.cs
        act = self.act or VehicleActuationMsg(t=cs._t, u_a=0.0, u_steer=0.0)
        fd = max(act.u_a, 0.0)
        fb = min(act.u_a, 0.0)
        cs.simulator.step(jnp.asarray([fd, fb, act.u_steer], dtype=jnp.float32))
        msg = cs.vehicle_state_msg()
        s_now = msg.p.s
        if cs._last_s is not None and \
                cs._last_s - s_now > 0.5 * cs.track.total_length:
            cs.lap_num += 1
            if cs._lap_start_t > 0.0 or cs.lap_num > 1:
                cs.lap_times.append(cs._t - cs._lap_start_t)
            cs._lap_start_t = cs._t
        cs._last_s = s_now
        cs._t += self.sim_dt
        self.published.append(msg)
        return msg

    def run(self, sim_steps: int, actuation_gate=None) -> dict:
        cs = self.cs
        msg = cs.vehicle_state_msg()
        for _ in range(sim_steps):
            if cs._t >= self._next_ctrl_t - 1e-9:
                self._next_ctrl_t += self.ctrl_dt
                act = cs.controller_cycle(msg)
                if actuation_gate is None or actuation_gate(cs._t):
                    self.act = act
                # else: actuation lost — the plant keeps flying the last
                # command and keeps publishing (keepalive)
            msg = self._plant_tick()
            self._tick += 1
        prof = cs.profiler.profile()
        return {
            "laps": cs.lap_num,
            "lap_times": cs.lap_times,
            "published_states": len(self.published),
            "controller_cycles": len(cs.telemetry),
            "fallback_rate": float(np.mean(
                [not t.solved for t in cs.telemetry])) if cs.telemetry else 0.0,
            "solve_time": {"min": prof.min, "mean": prof.mean, "max": prof.max},
        }


def _make(name: str, **kw) -> CoSimulation:
    return CoSimulation(_SCENARIOS[name], **kw)


def sim_barc_lmpc(**kw) -> CoSimulation:
    return _make("barc_lmpc", **kw)


def sim_barc_tracking_mpc(**kw) -> CoSimulation:
    return _make("barc_tracking_mpc", **kw)


def sim_putnam_short_lmpc(**kw) -> CoSimulation:
    return _make("putnam_short_lmpc", **kw)


def sim_putnam_short_tracking_mpc(**kw) -> CoSimulation:
    return _make("putnam_short_tracking_mpc", **kw)


def sim_putnam_config_a_tracking_mpc(**kw) -> CoSimulation:
    return _make("putnam_config_a_tracking_mpc", **kw)


class BusCoSimulation:
    """Two-node co-simulation over the native pub/sub bus: the controller
    and the simulator run as separate subscribers exchanging
    ``vehicle_state`` / ``vehicle_actuation`` messages, the in-process
    equivalent of the reference's two ROS2 processes over DDS in ``step``
    mode — each message triggers the other side
    (racing_mpc_node.cpp:96-129; racing_simulator_node.cpp:111-142).

    Requires the native runtime (racing_lmpc_tpu.native.Bus).
    """

    STATE_FMT = "<8d"       # t, s, x_tran, e_psi, v_long, v_tran, w_psi, lap
    ACT_FMT = "<3d"         # t, u_a, u_steer

    def __init__(self, spec: ScenarioSpec, **kw):
        import struct
        import threading
        from racing_lmpc_tpu import native
        if not native.available():
            raise RuntimeError(f"native bus unavailable: {native.build_error()}")
        self._struct = struct
        self.cs = CoSimulation(spec, **kw)
        self.bus = native.Bus()
        self._remaining = 0
        self._done = threading.Event()
        self._errors: list[BaseException] = []
        self.bus.subscribe("vehicle_state", self._on_state)
        self.bus.subscribe("vehicle_actuation", self._on_actuation)

    # -- controller node ------------------------------------------------
    def _on_state(self, topic: str, payload: bytes):
        try:
            if self._remaining <= 0:
                self._done.set()
                return
            t, s, x_tran, e_psi, v_long, v_tran, w_psi, lap = \
                self._struct.unpack(self.STATE_FMT, payload)
            msg = VehicleStateMsg(t=t)
            msg.p.s, msg.p.x_tran, msg.p.e_psi = s, x_tran, e_psi
            msg.v.v_long, msg.v.v_tran = v_long, v_tran
            msg.w.w_psi = w_psi
            msg.lap_num = lap
            act = self.cs.controller_cycle(msg)
            self.bus.publish("vehicle_actuation", self._struct.pack(
                self.ACT_FMT, act.t, act.u_a, act.u_steer))
        except BaseException as e:  # surface errors to the driving thread
            self._errors.append(e)
            self._done.set()

    # -- simulator node ---------------------------------------------------
    def _on_actuation(self, topic: str, payload: bytes):
        try:
            t, u_a, u_steer = self._struct.unpack(self.ACT_FMT, payload)
            msg = self.cs.plant_cycle(
                VehicleActuationMsg(t=t, u_a=u_a, u_steer=u_steer))
            self._remaining -= 1
            self._publish_state(msg)
        except BaseException as e:
            self._errors.append(e)
            self._done.set()

    def _publish_state(self, msg: VehicleStateMsg):
        self.bus.publish("vehicle_state", self._struct.pack(
            self.STATE_FMT, msg.t, msg.p.s, msg.p.x_tran, msg.p.e_psi,
            msg.v.v_long, msg.v.v_tran, msg.w.w_psi, msg.lap_num))

    # ---------------------------------------------------------------------
    def run(self, steps: int, timeout_s: float = 600.0) -> dict:
        """Kick off the message loop and wait for ``steps`` full cycles."""
        self._remaining = steps
        self._done.clear()
        self._publish_state(self.cs.vehicle_state_msg())
        if not self._done.wait(timeout_s):
            raise TimeoutError(f"bus co-simulation did not finish {steps} steps")
        if self._errors:
            raise self._errors[0]
        cs = self.cs
        prof = cs.profiler.profile()
        return {
            "laps": cs.lap_num,
            "lap_times": cs.lap_times,
            "steps": len(cs.telemetry),
            "fallback_rate": float(np.mean(
                [not t.solved for t in cs.telemetry])) if cs.telemetry else 0.0,
            "solve_time": {"min": prof.min, "mean": prof.mean, "max": prof.max},
            "bus_messages": self.bus.delivered,
        }

    def close(self):
        self.bus.close()


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("scenario", choices=sorted(_SCENARIOS))
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--horizon", type=int, default=None,
                   help="override the MPC horizon N")
    p.add_argument("--telemetry-out", type=str, default=None)
    p.add_argument("--log-every", type=int, default=40)
    args = p.parse_args()
    cosim = _make(args.scenario, n_override=args.horizon)
    summary = cosim.run(args.steps, log_every=args.log_every)
    if args.telemetry_out:
        cosim.export_telemetry(args.telemetry_out)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
