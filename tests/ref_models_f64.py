"""Independent f64 transcription of the reference vehicle dynamics.

This module is a SECOND, separate implementation of the three reference
models' continuous dynamics and RK4/Euler discretization, written directly
from the C++ sources in a different style (plain numpy scalars, no JAX, no
shared helpers with ``racing_lmpc_tpu.models``) so that a transcription
error in the package models cannot self-confirm through the match chain
(the engine and the f64 oracle both consume ``models/*.py`` Jacobians —
VERDICT r3 missing #2).

Sources transcribed:
- single track:  single_track_planar_model.cpp:195-418
- kinematic:     kinematic_bicycle_model.cpp:146-307
- double track:  double_track_planar_model.cpp:160-366
- RK4/Euler:     lmpc_utils/utils.cpp:88-123

Jacobians come from COMPLEX-STEP differentiation (h = 1e-30), which is
machine-precision exact and entirely independent of jax.jacfwd.  All
formulas keep the reference's quirks verbatim, notably:
- ``ax`` (load-transfer longitudinal accel) omits air density in the drag
  term (``0.5*cd*A*v^2``, single_track_planar_model.cpp:267) while the
  body-frame forces include it;
- the kinematic model's rear vertical load uses ``lr`` where the single
  track uses ``lf`` (kinematic_bicycle_model.cpp:218 vs
  single_track_planar_model.cpp:274);
- GRAVITY = 9.8 exactly (``#define GRAVITY 9.8``).
"""

import numpy as np

G = 9.8


def _p(base, cfg):
    """Flatten the parameter tree into the locals the formulas use."""
    ch, aero, pt = base.chassis, base.aero, base.powertrain
    l = ch.wheel_base
    lr = ch.cg_ratio * l          # "cg to front axle" naming kept as in C++
    lf = l - lr
    return dict(
        kd_f=pt.kd, kb_f=base.front_brake.bias, m=ch.total_mass,
        Jzz=ch.moi, l=l, lr=lr, lf=lf, twf=ch.tw_f, twr=ch.tw_r,
        fr=ch.fr, hcog=ch.cg_height, cl_f=aero.cl_f, cl_r=aero.cl_r,
        rho=aero.air_density, A=aero.frontal_area, cd=aero.drag_coeff,
        mu=cfg.mu,
        Bf=base.front_tyre.pacejka_b, Cf=base.front_tyre.pacejka_c,
        Ef=base.front_tyre.pacejka_e, Fz0_f=base.front_tyre.pacejka_fz0,
        eps_f=base.front_tyre.pacejka_eps,
        Br=base.rear_tyre.pacejka_b, Cr=base.rear_tyre.pacejka_c,
        Er=base.rear_tyre.pacejka_e, Fz0_r=base.rear_tyre.pacejka_fz0,
        eps_r=base.rear_tyre.pacejka_eps,
    )


# ---------------------------------------------------------------------------
# single track (single_track_planar_model.cpp:195-337)
# ---------------------------------------------------------------------------

def single_track_xdot(x, u, k, base, cfg):
    p = _p(base, cfg)
    py, phi, vx, vy, omega = x[1], x[2], x[3], x[4], x[5]
    v_sq = vx * vx
    if cfg.simplify_lon_control:
        lon = u[0]
        fd = lon * (np.tanh(lon) * 0.5 + 0.5) * 1000.0
        fb = lon * (np.tanh(-lon) * 0.5 + 0.5) * 1000.0
        delta = u[1]
    else:
        fd, fb, delta = u[0], u[1], u[2]

    Fx_fl = (0.5 * p["kd_f"] * fd + 0.5 * p["kb_f"] * fb
             - 0.5 * p["fr"] * p["m"] * G * p["lr"] / p["l"])
    Fx_rl = (0.5 * (1 - p["kd_f"]) * fd + 0.5 * (1.0 - p["kb_f"]) * fb
             - 0.5 * p["fr"] * p["m"] * G * p["lf"] / p["l"])
    # NOTE: no air density in this drag term (reference :267)
    ax = (fd + fb - 0.5 * p["cd"] * p["A"] * v_sq - p["fr"] * p["m"] * G) / p["m"]
    ll = p["lf"] + p["lr"]
    Fz_fl = (0.5 * p["m"] * G * p["lr"] / ll - 0.5 * p["hcog"] / ll * p["m"] * ax
             + 0.25 * p["cl_f"] * p["rho"] * p["A"] * v_sq)
    Fz_rl = (0.5 * p["m"] * G * p["lf"] / ll + 0.5 * p["hcog"] / ll * p["m"] * ax
             + 0.25 * p["cl_r"] * p["rho"] * p["A"] * v_sq)
    a_fl = delta - np.arctan((p["lf"] * omega + vy) / (vx + 1e-3))
    a_rl = np.arctan((p["lr"] * omega - vy) / (vx + 1e-3))
    # simplified Pacejka, "version B" (:298-300)
    Fy_fl = p["mu"] * Fz_fl * np.sin(p["Cf"] * np.arctan(p["Bf"] * a_fl))
    Fy_rl = p["mu"] * Fz_rl * np.sin(p["Cr"] * np.arctan(p["Br"] * a_rl))

    omega_dot = (1.0 / p["Jzz"]) * (
        -(2 * Fy_rl) * p["lr"]
        + ((2 * Fy_fl) * np.cos(delta) + (2 * Fx_fl) * np.sin(delta)) * p["lf"])
    vx_dot = (1.0 / p["m"]) * (
        (2 * Fx_rl) + (2 * Fx_fl) * np.cos(delta) - (2 * Fy_fl) * np.sin(delta)
        - 0.5 * p["cd"] * p["rho"] * p["A"] * v_sq) + omega * vy
    vy_dot = (1.0 / p["m"]) * (
        (2 * Fy_rl) + (2 * Fy_fl) * np.cos(delta)
        + (2 * Fx_fl) * np.sin(delta)) - omega * vx

    px_dot = vx * np.cos(phi) - vy * np.sin(phi)
    py_dot = vx * np.sin(phi) + vy * np.cos(phi)
    phi_dot = omega
    if base.modeling.use_frenet:
        px_dot = px_dot / (1 - py * k)
        phi_dot = phi_dot - k * px_dot
    return np.array([px_dot, py_dot, phi_dot, vx_dot, vy_dot, omega_dot])


# ---------------------------------------------------------------------------
# kinematic bicycle (kinematic_bicycle_model.cpp:146-236)
# ---------------------------------------------------------------------------

def kinematic_xdot(x, u, k, base, cfg):
    p = _p(base, cfg)
    py, phi, v = x[1], x[2], x[3]
    fd, fb, delta = u[0], u[1], u[2]
    v_sq = v * v

    beta = np.arctan(p["lr"] * np.tan(delta) / p["l"])
    S = p["l"] / np.tan(delta)
    R = S / np.cos(beta)
    phi_dot = v / R
    px_dot = v * np.cos(beta + phi)
    py_dot = v * np.sin(beta + phi)
    ax = (fd + fb - 0.5 * p["cd"] * p["A"] * v_sq - p["fr"] * p["m"] * G) / p["m"]
    v_dot = ax
    if base.modeling.use_frenet:
        px_dot = px_dot / (1 - py * k)
        phi_dot = phi_dot - k * px_dot
    return np.array([px_dot, py_dot, phi_dot, v_dot])


def kinematic_forces(x, u, base, cfg):
    """(Fx_fl, Fx_rl, Fz_fl, Fz_rl) of kinematic_bicycle_model.cpp:201-221.
    NOTE the rear vertical load uses ``lr`` in the reference (:218)."""
    p = _p(base, cfg)
    v_sq = x[3] * x[3]
    fd, fb = u[0], u[1]
    Fx_fl = (0.5 * p["kd_f"] * fd + 0.5 * p["kb_f"] * fb
             - 0.5 * p["fr"] * p["m"] * G * p["lr"] / p["l"])
    Fx_rl = (0.5 * (1 - p["kd_f"]) * fd + 0.5 * (1.0 - p["kb_f"]) * fb
             - 0.5 * p["fr"] * p["m"] * G * p["lf"] / p["l"])
    ax = (fd + fb - 0.5 * p["cd"] * p["A"] * v_sq - p["fr"] * p["m"] * G) / p["m"]
    ll = p["lf"] + p["lr"]
    Fz_fl = (0.5 * p["m"] * G * p["lr"] / ll - 0.5 * p["hcog"] / ll * p["m"] * ax
             + 0.25 * p["cl_f"] * p["rho"] * p["A"] * v_sq)
    Fz_rl = (0.5 * p["m"] * G * p["lr"] / ll + 0.5 * p["hcog"] / ll * p["m"] * ax
             + 0.25 * p["cl_r"] * p["rho"] * p["A"] * v_sq)
    return Fx_fl, Fx_rl, Fz_fl, Fz_rl


# ---------------------------------------------------------------------------
# double track (double_track_planar_model.cpp:160-332)
# ---------------------------------------------------------------------------

def _dt_forces(x, u, gamma_y, base, cfg):
    p = _p(base, cfg)
    v, beta, omega, delta = x[5], x[4], x[3], u[2]
    fd, fb = u[0], u[1]
    v_sq = v ** 2

    Fx_f = (0.5 * p["kd_f"] * fd + 0.5 * p["kb_f"] * fb
            - 0.5 * p["fr"] * p["m"] * G * p["lr"] / p["l"])
    Fx_r = (0.5 * (1 - p["kd_f"]) * fd + 0.5 * (1.0 - p["kb_f"]) * fb
            - 0.5 * p["fr"] * p["m"] * G * p["lf"] / p["l"])
    ax = (fd + fb - 0.5 * p["cd"] * p["A"] * v_sq - p["fr"] * p["m"] * G) / p["m"]
    ll = p["lf"] + p["lr"]
    Fz_f = (0.5 * p["m"] * G * p["lr"] / ll - 0.5 * p["hcog"] / ll * p["m"] * ax
            + 0.25 * p["cl_f"] * p["rho"] * p["A"] * v_sq)
    Fz_fl = Fz_f - cfg.kroll_f * gamma_y
    Fz_fr = Fz_f + cfg.kroll_f * gamma_y
    # reference uses lr in the rear static term here too (:234)
    Fz_r = (0.5 * p["m"] * G * p["lr"] / ll + 0.5 * p["hcog"] / ll * p["m"] * ax
            + 0.25 * p["cl_r"] * p["rho"] * p["A"] * v_sq)
    Fz_rl = Fz_r - (1.0 - cfg.kroll_f) * gamma_y
    Fz_rr = Fz_r + (1.0 - cfg.kroll_f) * gamma_y

    vb_x, vb_y = v * np.cos(beta), v * np.sin(beta)
    a_fl = delta - np.arctan((p["lf"] * omega + vb_y) / (vb_x - 0.5 * p["twf"] * omega))
    a_fr = delta - np.arctan((p["lf"] * omega + vb_y) / (vb_x + 0.5 * p["twf"] * omega))
    a_rl = np.arctan((p["lr"] * omega - vb_y) / (vb_x - 0.5 * p["twr"] * omega))
    a_rr = np.arctan((p["lr"] * omega - vb_y) / (vb_x + 0.5 * p["twr"] * omega))

    def pacejka(Fz, a, B, C, E, Fz0, eps):
        return (p["mu"] * Fz * (1.0 + eps * Fz / Fz0)
                * np.sin(C * np.arctan(B * a - E * (B * a - np.arctan(B * a)))))

    Fy_fl = pacejka(Fz_fl, a_fl, p["Bf"], p["Cf"], p["Ef"], p["Fz0_f"], p["eps_f"])
    Fy_fr = pacejka(Fz_fr, a_fr, p["Bf"], p["Cf"], p["Ef"], p["Fz0_f"], p["eps_f"])
    Fy_rl = pacejka(Fz_rl, a_rl, p["Br"], p["Cr"], p["Er"], p["Fz0_r"], p["eps_r"])
    Fy_rr = pacejka(Fz_rr, a_rr, p["Br"], p["Cr"], p["Er"], p["Fz0_r"], p["eps_r"])
    return (Fx_f, Fx_f, Fx_r, Fx_r), (Fy_fl, Fy_fr, Fy_rl, Fy_rr), \
        (Fz_fl, Fz_fr, Fz_rl, Fz_rr)


def double_track_gamma_y(x, u, base, cfg, iters=80):
    """Implicit lateral load transfer: fixed-point of
    gamma = hcog/(0.5 (twf+twr)) * (Fy_rl+Fy_rr + (Fx_fl+Fx_fr) sin(d)
            + (Fy_fl+Fy_fr) cos(d))   (double_track_planar_model.cpp:316-332,
    solved there with a Newton rootfinder from gamma=0).  The map is a mild
    contraction at racing loads; a fixed-point sweep is analytic, so it
    propagates complex-step perturbations exactly."""
    p = _p(base, cfg)
    delta = u[2]
    scale = p["hcog"] / (0.5 * (p["twf"] + p["twr"]))
    gamma = 0.0 * (x[0] + u[0])     # carries complex parts of inputs
    for _ in range(iters):
        Fx, Fy, _ = _dt_forces(x, u, gamma, base, cfg)
        gamma = scale * (Fy[2] + Fy[3] + (Fx[0] + Fx[1]) * np.sin(delta)
                         + (Fy[0] + Fy[1]) * np.cos(delta))
    return gamma


def double_track_xdot(x, u, k, base, cfg):
    p = _p(base, cfg)
    py, phi, omega, beta, v = x[1], x[2], x[3], x[4], x[5]
    delta = u[2]
    v_sq = v ** 2
    gamma = double_track_gamma_y(x, u, base, cfg)
    (Fx_fl, Fx_fr, Fx_rl, Fx_rr), (Fy_fl, Fy_fr, Fy_rl, Fy_rr), _ = \
        _dt_forces(x, u, gamma, base, cfg)

    v_dot = (1.0 / p["m"]) * (
        (Fx_rl + Fx_rr) * np.cos(beta) + (Fx_fl + Fx_fr) * np.cos(delta - beta)
        + (Fy_rl + Fy_rr) * np.sin(beta) - (Fy_fl + Fy_fr) * np.sin(delta - beta)
        - 0.5 * p["cd"] * p["rho"] * p["A"] * v_sq * np.cos(beta))
    beta_dot = -omega + (1.0 / (p["m"] * v)) * (
        -(Fx_rl + Fx_rr) * np.sin(beta) + (Fx_fl + Fx_fr) * np.sin(delta - beta)
        + (Fy_rl + Fy_rr) * np.cos(beta) + (Fy_fl + Fy_fr) * np.cos(delta - beta)
        + 0.5 * p["cd"] * p["rho"] * p["A"] * v_sq * np.sin(beta))
    omega_dot = (1.0 / p["Jzz"]) * (
        (Fx_rr - Fx_rl) * p["twr"] / 2 - (Fy_rl + Fy_rr) * p["lr"]
        + ((Fx_fr - Fx_fl) * np.cos(delta) + (Fy_fl - Fy_fr) * np.sin(delta))
        * p["twf"] / 2.0
        + ((Fy_fl + Fy_fr) * np.cos(delta) + (Fx_fl + Fx_fr) * np.sin(delta))
        * p["lf"])

    vx = v * np.cos(phi + beta)
    vy = v * np.sin(phi + beta)
    phi_dot = omega
    if base.modeling.use_frenet:
        vx = vx / (1 - py * k)
        phi_dot = phi_dot - k * vx
    return np.array([vx, vy, phi_dot, omega_dot, beta_dot, v_dot])


# ---------------------------------------------------------------------------
# discretization + complex-step Jacobians (utils.cpp:88-123)
# ---------------------------------------------------------------------------

def rk4(xdot_fn, x, u, k, dt, base, cfg):
    k1 = xdot_fn(x, u, k, base, cfg)
    k2 = xdot_fn(x + dt / 2.0 * k1, u, k, base, cfg)
    k3 = xdot_fn(x + dt / 2.0 * k2, u, k, base, cfg)
    k4 = xdot_fn(x + dt * k3, u, k, base, cfg)
    return x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)


def euler(xdot_fn, x, u, k, dt, base, cfg):
    return x + dt * xdot_fn(x, u, k, base, cfg)


def discrete(xdot_fn, x, u, k, dt, base, cfg):
    if base.modeling.integrator_type == "rk4":
        return rk4(xdot_fn, x, u, k, dt, base, cfg)
    return euler(xdot_fn, x, u, k, dt, base, cfg)


def cstep_jacobians(xdot_fn, x, u, k, dt, base, cfg):
    """(Ad, Bd, gd) of the discrete map by complex-step differentiation —
    exact to f64 rounding, no AD involved.  gd = x+ - Ad x - Bd u, the
    affine remainder of single_track_planar_model.cpp:377-387."""
    h = 1e-30
    x = np.asarray(x, np.complex128)
    u = np.asarray(u, np.complex128)
    nx, nu = len(x), len(u)
    Ad = np.zeros((nx, nx))
    Bd = np.zeros((nx, nu))
    for i in range(nx):
        xp = x.copy()
        xp[i] += 1j * h
        Ad[:, i] = discrete(xdot_fn, xp, u, k, dt, base, cfg).imag / h
    for j in range(nu):
        up = u.copy()
        up[j] += 1j * h
        Bd[:, j] = discrete(xdot_fn, x, up, k, dt, base, cfg).imag / h
    xp1 = discrete(xdot_fn, x.real, u.real, k, dt, base, cfg).real
    gd = xp1 - Ad @ x.real - Bd @ u.real
    return Ad, Bd, gd
