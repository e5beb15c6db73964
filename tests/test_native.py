"""Native C++ runtime tests: every component is checked against its numpy
twin so the fallback and native paths stay interchangeable.

Parity targets: racing_trajectory.cpp:25-36 (table loading),
trajectory_kd_tree.hpp:69-121 (CGAL k-NN), safe_set.cpp:33-191 (lap store +
TBB-parallel query), cycle_profiler.hpp:69-136, and the DDS/rclcpp pub-sub
topology of racing_mpc_node.cpp:96-129.
"""

import numpy as np
import pytest

from racing_lmpc_tpu import native
from racing_lmpc_tpu.config import TRACK_DIR

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native runtime: {native.build_error()}")


def test_table_loader_matches_numpy():
    path = TRACK_DIR / "barc" / "02_barc_center.txt"
    a = native.load_table(path)
    b = np.loadtxt(path)
    assert a.shape == b.shape == (b.shape[0], 17)
    np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_table_loader_missing_file():
    with pytest.raises(OSError):
        native.load_table("/nonexistent/file.txt")


def test_kdtree_knn_matches_bruteforce():
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(777, 2)).astype(np.float32)
    tree = native.KdTree2D(pts)
    q = rng.normal(size=(64, 2)).astype(np.float32) * 2.0
    k = 7
    idx, d2 = tree.knn(q, k)
    bf = np.sum((q[:, None, :] - pts[None]) ** 2, axis=-1)
    d2_bf = np.sort(bf, axis=1)[:, :k]
    np.testing.assert_allclose(np.sort(d2, axis=1), d2_bf, rtol=1e-6)
    # indices must point at matching-distance points
    np.testing.assert_allclose(
        np.take_along_axis(bf, idx.astype(np.int64), axis=1), d2, rtol=1e-6)


def test_kdtree_k_larger_than_n():
    pts = np.zeros((3, 2), dtype=np.float32)
    tree = native.KdTree2D(pts)
    idx, d2 = tree.knn(np.ones((1, 2), dtype=np.float32), 5)
    assert (idx[0, 3:] == -1).all() and np.isinf(d2[0, 3:]).all()


def _make_laps(rng, L=17.0, n_laps=3):
    laps = []
    for lap in range(n_laps):
        T = 150 + 11 * lap
        x = rng.normal(size=(T, 6)).astype(np.float32) * 0.3
        x[:, 0] = np.linspace(0, L, T, endpoint=False)
        u = rng.normal(size=(T, 2)).astype(np.float32)
        laps.append((x, u, np.zeros(T), np.arange(T) * 0.025))
    return laps


def test_native_safe_set_matches_python_query():
    from racing_lmpc_tpu.safeset.safe_set import SafeSetManager, SSQuery
    rng = np.random.default_rng(11)
    L = 17.0
    mgr_py = SafeSetManager(max_laps=3, nx=6, use_native=False)
    mgr_nat = SafeSetManager(max_laps=3, nx=6, use_native=True)
    assert mgr_nat._native is not None
    for x, u, k, t in _make_laps(rng, L):
        mgr_py.add_lap(x, u, k, t, L)
        mgr_nat.add_lap(x, u, k, t, L)

    for qs in (0.3, 8.0, 16.9):
        qx = np.array([qs, 0.05, 0, 1.5, 0, 0], dtype=np.float32)
        q = SSQuery(qx, 1.0, 48, 16)
        a = mgr_py.query(q)
        b = mgr_nat.query(q)
        assert a.x.shape == b.x.shape
        # per-lap sets must agree (ordering within equal distances may vary)
        np.testing.assert_allclose(
            np.sort(a.x[:, 0]), np.sort(b.x[:, 0]), atol=1e-6)
        np.testing.assert_allclose(np.sort(a.J), np.sort(b.J), atol=1e-6)


def test_native_safe_set_ring_buffer_eviction():
    rng = np.random.default_rng(5)
    ss = native.NativeSafeSet(max_laps=2, nx=6)
    for x, u, k, t in _make_laps(rng, n_laps=3):
        ss.add_lap(x, 17.0)
    assert ss.num_laps == 2


def test_cycle_profiler_window():
    prof = native.CycleProfiler(4)
    for v in [5.0, 1.0, 3.0, 2.0, 4.0]:  # first value evicted
        prof.add(v)
    st = prof.stats()
    assert st["count"] == 4
    assert st["min"] == 1.0 and st["max"] == 4.0
    assert abs(st["mean"] - 2.5) < 1e-12


def test_bus_pubsub_order_and_flush():
    bus = native.Bus()
    got = []
    bus.subscribe("a", lambda t, p: got.append(p))
    other = []
    bus.subscribe("b", lambda t, p: other.append(p))
    for i in range(20):
        bus.publish("a", bytes([i]))
    bus.publish("b", b"x")
    bus.flush()
    assert got == [bytes([i]) for i in range(20)]  # serialized, in order
    assert other == [b"x"]
    assert bus.delivered == 21
    bus.close()


def test_bus_cosimulation_smoke():
    """5 lock-step cycles of simulator<->controller over the bus."""
    from racing_lmpc_tpu.launch.runner import BusCoSimulation, _SCENARIOS
    cosim = BusCoSimulation(_SCENARIOS["barc_tracking_mpc"], n_override=10)
    try:
        summary = cosim.run(5, timeout_s=300.0)
        assert summary["steps"] == 5
        assert summary["bus_messages"] >= 10  # 5 state + 5 actuation
        assert summary["fallback_rate"] <= 0.4
    finally:
        cosim.close()
