"""Track-model tests on the real reference track files.

Mirrors test_racing_trajectory.cpp (frenet<->global round trip) plus numeric
assertions on curvature/boundary/velocity interpolants against the raw table
columns.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from racing_lmpc_tpu.config import TRACK_DIR
from racing_lmpc_tpu.track import RacingTrajectory, RacingTrajectoryMap, TrajectoryIndex


@pytest.fixture(scope="module")
def barc():
    return RacingTrajectory.from_file(TRACK_DIR / "barc" / "02_barc_center.txt")


@pytest.fixture(scope="module")
def putnam():
    return RacingTrajectory.from_file(TRACK_DIR / "putnam" / "3_putnam_center.txt")


def test_total_length(barc):
    assert np.isclose(barc.total_length, 17.0142237, atol=1e-5)


def test_waypoint_reproduction(barc):
    T = TrajectoryIndex
    s = jnp.asarray(barc.table[:, T.DIST_TO_SF_BWD])
    xy = np.asarray(barc.position(s))
    assert np.abs(xy - barc.table[:, :2]).max() < 1e-5


def test_yaw_matches_table(barc):
    T = TrajectoryIndex
    s = jnp.asarray(barc.table[:, T.DIST_TO_SF_BWD])
    yaw = np.asarray(barc.yaw(s))
    yaw_tbl = barc.table[:, T.YAW]
    d = np.arctan2(np.sin(yaw - yaw_tbl), np.cos(yaw - yaw_tbl))
    # table yaws are finite-difference based; spline tangent agrees to ~degree
    assert np.abs(d).mean() < 0.05
    assert np.abs(d).max() < 0.2


def test_curvature_is_yaw_rate_along_s(barc):
    # kappa = d(yaw)/ds for an arc-length parameterized curve.  (The table's
    # CURVATURE column is not curvature — the reference never reads it and
    # derives kappa from the spline, racing_trajectory.cpp:100-113.)
    s = np.linspace(0.1, barc.total_length, 400, endpoint=False)
    k = np.asarray(barc.curvature(jnp.asarray(s, dtype=jnp.float32)))
    h = 1e-2
    yaw_p = np.asarray(barc.yaw(jnp.asarray(s + h, dtype=jnp.float32)))
    yaw_m = np.asarray(barc.yaw(jnp.asarray(s - h, dtype=jnp.float32)))
    dyaw = np.arctan2(np.sin(yaw_p - yaw_m), np.cos(yaw_p - yaw_m)) / (2 * h)
    assert np.abs(k - dyaw).max() < 5e-2
    # BARC oval: top curvature magnitude ~1/R with R ~ 0.9-1.1 m
    assert 0.8 < np.abs(k).max() < 1.3


def test_velocity_and_boundaries(barc):
    T = TrajectoryIndex
    s = jnp.asarray(barc.table[:, T.DIST_TO_SF_BWD])
    v = np.asarray(barc.velocity(s))
    assert np.abs(v - barc.table[:, T.SPEED]).max() < 1e-4
    d_left = np.hypot(barc.table[:, T.PX] - barc.table[:, T.LEFT_BOUND_X],
                      barc.table[:, T.PY] - barc.table[:, T.LEFT_BOUND_Y])
    bl = np.asarray(barc.left_boundary(s))
    br = np.asarray(barc.right_boundary(s))
    assert np.abs(bl - d_left).max() < 1e-4
    assert np.all(bl > 0) and np.all(br < 0)


def test_frenet_global_roundtrip(barc):
    # start from frenet poses, convert to global and back
    rng = np.random.default_rng(7)
    n = 64
    s = rng.uniform(0, barc.total_length, n)
    t = rng.uniform(-0.3, 0.3, n)
    xi = rng.uniform(-0.5, 0.5, n)
    pf = jnp.asarray(np.stack([s, t, xi], axis=-1), dtype=jnp.float32)
    pg = barc.frenet_to_global(pf)
    pf_back = np.asarray(barc.global_to_frenet(pg))
    s_err = np.abs(np.mod(pf_back[:, 0] - s + barc.total_length / 2,
                          barc.total_length) - barc.total_length / 2)
    assert s_err.max() < 2e-3
    assert np.abs(pf_back[:, 1] - t).max() < 2e-3
    d_xi = np.arctan2(np.sin(pf_back[:, 2] - xi), np.cos(pf_back[:, 2] - xi))
    assert np.abs(d_xi).max() < 2e-3


def test_global_to_frenet_with_previous_seed(barc):
    pf = jnp.asarray([[5.0, 0.1, 0.0]], dtype=jnp.float32)
    pg = barc.frenet_to_global(pf)
    out = np.asarray(barc.global_to_frenet(pg, s_prev=jnp.asarray([4.8])))
    assert np.isclose(out[0, 0], 5.0, atol=1e-3)
    assert np.isclose(out[0, 1], 0.1, atol=1e-3)


def test_roundtrip_putnam_long_track(putnam):
    # long track (~1.6 km) exercises f32 abscissa resolution
    rng = np.random.default_rng(8)
    n = 32
    s = rng.uniform(0, putnam.total_length, n)
    t = rng.uniform(-2.0, 2.0, n)
    pf = jnp.asarray(np.stack([s, t, np.zeros(n)], axis=-1), dtype=jnp.float32)
    pg = putnam.frenet_to_global(pf)
    pf_back = np.asarray(putnam.global_to_frenet(pg))
    s_err = np.abs(np.mod(pf_back[:, 0] - s + putnam.total_length / 2,
                          putnam.total_length) - putnam.total_length / 2)
    assert s_err.max() < 2e-2
    assert np.abs(pf_back[:, 1] - t).max() < 2e-2


def test_projection_jit_vmap(barc):
    f = jax.jit(lambda p: barc.global_to_frenet(p))
    batch = jnp.tile(jnp.asarray([[0.5, -0.5, 0.1]], dtype=jnp.float32), (128, 1))
    out = f(batch)
    assert out.shape == (128, 3)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_wrap_at_start_finish(barc):
    # a point just before s=0 must project near L (wrap), not diverge
    pf = jnp.asarray([[barc.total_length - 0.05, 0.0, 0.0]], dtype=jnp.float32)
    pg = barc.frenet_to_global(pf)
    out = np.asarray(barc.global_to_frenet(pg))
    d = np.mod(out[0, 0] + 0.05, barc.total_length)
    assert min(d, barc.total_length - d) < 1e-2


def test_trajectory_map():
    m = RacingTrajectoryMap(TRACK_DIR / "barc")
    assert m.indices() == [2, 15]
    assert m.names[2] == "barc_center"
    tr = m.get_trajectory(15)
    assert tr.total_length > 10.0


def test_host_accessors_match_device(barc):
    """The SciPy host twins must agree with the device splines."""
    rng = np.random.default_rng(3)
    s = rng.uniform(-barc.total_length, 2 * barc.total_length, (7, 5))
    sj = jnp.asarray(s, dtype=jnp.float32)
    for host_fn, dev_fn in [
        (barc.curvature_np, barc.curvature),
        (barc.velocity_np, barc.velocity),
        (barc.left_boundary_np, barc.left_boundary),
        (barc.right_boundary_np, barc.right_boundary),
        (barc.yaw_np, barc.yaw),
    ]:
        np.testing.assert_allclose(
            host_fn(s), np.asarray(dev_fn(sj)), rtol=2e-4, atol=2e-4)
