"""Math-core unit tests against closed forms (reference: lmpc_utils)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from racing_lmpc_tpu.ops import (
    align_abscissa,
    align_yaw,
    bilinear_interpolate,
    c2d,
    euler,
    fit_periodic_spline,
    global_to_frenet_rotation,
    interp1d,
    lateral_sign,
    rk4,
)


def test_align_yaw_basic():
    # wraps to the representative nearest the second angle
    assert np.isclose(float(align_yaw(jnp.array(0.1), jnp.array(2 * np.pi))),
                      2 * np.pi + 0.1)
    assert np.isclose(float(align_yaw(jnp.array(6.2), jnp.array(0.0))),
                      6.2 - 2 * np.pi)
    # already aligned
    assert np.isclose(float(align_yaw(jnp.array(1.0), jnp.array(1.5))), 1.0)
    # batched
    y = align_yaw(jnp.array([0.1, 6.2]), jnp.zeros(2))
    assert np.allclose(np.asarray(y), [0.1, 6.2 - 2 * np.pi], atol=1e-6)


def test_align_yaw_result_within_pi():
    rng = np.random.default_rng(0)
    y1 = rng.uniform(-20, 20, 100)
    y2 = rng.uniform(-20, 20, 100)
    out = np.asarray(align_yaw(jnp.array(y1), jnp.array(y2)))
    assert np.all(np.abs(out - y2) <= np.pi + 1e-5)
    # congruence mod 2pi
    assert np.allclose(np.mod(out - y1 + np.pi, 2 * np.pi) - np.pi, 0.0, atol=1e-5)


def test_align_abscissa():
    L = 100.0
    # behind by more than half a lap -> shift forward
    assert np.isclose(float(align_abscissa(jnp.array(5.0), jnp.array(95.0), jnp.array(L))),
                      105.0)
    assert np.isclose(float(align_abscissa(jnp.array(95.0), jnp.array(5.0), jnp.array(L))),
                      -5.0)
    assert np.isclose(float(align_abscissa(jnp.array(40.0), jnp.array(60.0), jnp.array(L))),
                      40.0)
    rng = np.random.default_rng(1)
    s1 = rng.uniform(-300, 300, 200)
    s2 = rng.uniform(-300, 300, 200)
    out = np.asarray(align_abscissa(jnp.array(s1), jnp.array(s2), jnp.full(200, L)),
                     dtype=np.float64)
    assert np.all(np.abs(out - s2) <= L / 2 + 1e-3)
    d = np.mod(out - s1, L)
    assert np.all(np.minimum(d, L - d) < 1e-3)  # congruent mod L (f32 rounding)


def test_lateral_sign():
    pose = jnp.array([0.0, 0.0, 0.0])  # at origin heading +x
    assert float(lateral_sign(jnp.array([1.0, 1.0]), pose)) == 1.0   # left
    assert float(lateral_sign(jnp.array([1.0, -1.0]), pose)) == -1.0  # right


def test_global_to_frenet_rotation():
    p = jnp.array([1.0, 1.0])
    p0 = jnp.array([1.0, 0.0])
    out = np.asarray(global_to_frenet_rotation(p, p0, jnp.array(np.pi / 2)))
    assert np.allclose(out, [1.0, 0.0], atol=1e-6)


def test_rk4_exact_on_linear_system():
    # dx/dt = -x: RK4 matches exp(-dt) to 4th order
    dyn = lambda x, u, k: -x
    x0 = jnp.array([1.0])
    out = rk4(dyn, x0, jnp.zeros(1), 0.0, 0.01)
    assert np.isclose(float(out[0]), np.exp(-0.01), atol=1e-10)
    out_e = euler(dyn, x0, jnp.zeros(1), 0.0, 0.01)
    assert np.isclose(float(out_e[0]), 0.99, atol=1e-7)


def test_c2d_matches_closed_form():
    # double integrator: A=[[0,1],[0,0]], B=[[0],[1]]
    A = jnp.array([[0.0, 1.0], [0.0, 0.0]])
    B = jnp.array([[0.0], [1.0]])
    dt = 0.1
    Ad, Bd = c2d(A, B, dt)
    assert np.allclose(np.asarray(Ad), [[1, dt], [0, 1]], atol=1e-6)
    assert np.allclose(np.asarray(Bd), [[dt**2 / 2], [dt]], atol=1e-6)


def test_interp1d_clamps():
    x = jnp.array([0.0, 1.0, 2.0])
    y = jnp.array([0.0, 10.0, 40.0])
    assert np.isclose(float(interp1d(x, y, jnp.array(0.5))), 5.0)
    assert np.isclose(float(interp1d(x, y, jnp.array(1.5))), 25.0)
    # clamp (no extrapolation)
    assert np.isclose(float(interp1d(x, y, jnp.array(-1.0))), 0.0)
    assert np.isclose(float(interp1d(x, y, jnp.array(5.0))), 40.0)
    # extrapolation on
    assert np.isclose(float(interp1d(x, y, jnp.array(3.0), extrapolate=True)), 70.0)


def test_bilinear_interpolate():
    xg = jnp.array([0.0, 1.0])
    yg = jnp.array([0.0, 1.0])
    z = jnp.array([[0.0, 1.0], [2.0, 3.0]])  # z[x, y]
    assert np.isclose(float(bilinear_interpolate(xg, yg, z, 0.5, 0.5)), 1.5)
    assert np.isclose(float(bilinear_interpolate(xg, yg, z, 0.0, 1.0)), 1.0)
    assert np.isclose(float(bilinear_interpolate(xg, yg, z, 1.0, 0.0)), 2.0)
    # clamped outside
    assert np.isclose(float(bilinear_interpolate(xg, yg, z, 2.0, 2.0)), 3.0)


def test_periodic_spline_interpolates_and_wraps():
    # sample a smooth periodic function on a nonuniform grid
    L = 10.0
    rng = np.random.default_rng(2)
    s = np.sort(rng.uniform(0, L, 64))
    s[0] = 0.3  # nonzero start like real track files
    f = lambda t: np.stack([np.sin(2 * np.pi * t / L),
                            np.cos(4 * np.pi * t / L)], axis=-1)
    sp = fit_periodic_spline(s, f(s), L, dtype=jnp.float64)

    # exact at knots
    v = np.asarray(sp.eval(jnp.array(s)))
    assert np.allclose(v, f(s), atol=1e-10)

    # close between knots
    q = np.linspace(0, 3 * L, 200)  # includes out-of-period wrap
    v = np.asarray(sp.eval(jnp.array(q)))
    assert np.allclose(v, f(q), atol=5e-3)

    # derivative check vs analytic
    d = np.asarray(sp.eval_d(jnp.array(q)))
    d_true = np.stack([2 * np.pi / L * np.cos(2 * np.pi * q / L),
                       -4 * np.pi / L * np.sin(4 * np.pi * q / L)], axis=-1)
    assert np.allclose(d, d_true, atol=5e-2)

    # periodicity: value at s and s + L identical
    v1 = np.asarray(sp.eval(jnp.array([1.234])))
    v2 = np.asarray(sp.eval(jnp.array([1.234 + L])))
    assert np.allclose(v1, v2, atol=1e-9)


def test_spline_jit_and_vmap():
    L = 5.0
    s = np.linspace(0.1, L, 32, endpoint=False)
    sp = fit_periodic_spline(s, np.sin(2 * np.pi * s / L), L)
    f = jax.jit(lambda q: sp.eval(q))
    out = f(jnp.linspace(0, L, 50))
    assert out.shape == (50, 1)
