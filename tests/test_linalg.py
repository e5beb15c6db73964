"""Unit tests for the in-house batched linear algebra (ops/pallas_linalg).

These kernels replace XLA's layout-sensitive `cholesky` / `triangular_solve`
/ pivoted-LU custom calls on the IPM hot path; their numerics gate the whole
solver, so they get direct coverage beyond the QP-level tests.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from racing_lmpc_tpu.ops.pallas_linalg import (
    _chol_small, _tri_inv_small, chol_lower, gj_inverse, tri_inv_lower)


def _spd(rng, B, n, cond_boost=0.0):
    A = rng.normal(size=(B, n, n)).astype(np.float32)
    H = np.einsum("bij,bik->bjk", A, A) + n * np.eye(n, dtype=np.float32)
    if cond_boost:
        # widen the spectrum: scale rows/cols by 10^[0, cond_boost]
        s = 10.0 ** rng.uniform(0, cond_boost, size=(B, n)).astype(np.float32)
        H = H * s[:, :, None] * s[:, None, :]
    return H


@pytest.mark.parametrize("n", [1, 5, 32, 87, 96, 130])
def test_chol_lower_matches_numpy(n):
    rng = np.random.default_rng(n)
    H = _spd(rng, 7, n)
    L = np.asarray(jax.jit(chol_lower)(jnp.asarray(H)))
    L_ref = np.linalg.cholesky(H.astype(np.float64))
    err = np.abs(L - L_ref).max() / np.abs(L_ref).max()
    assert err < 5e-6
    # strictly upper part is exactly zero
    assert np.all(L[..., np.triu_indices(n, 1)[0], np.triu_indices(n, 1)[1]] == 0)


def test_chol_lower_wide_spectrum():
    rng = np.random.default_rng(0)
    H = _spd(rng, 5, 64, cond_boost=3.0)   # cond ~ 1e6
    L = np.asarray(jax.jit(chol_lower)(jnp.asarray(H)))
    rec = np.einsum("bij,bkj->bik", L, L)
    rel = np.abs(rec - H).max() / np.abs(H).max()
    assert rel < 1e-5


def test_chol_lower_nan_on_indefinite():
    H = np.eye(8, dtype=np.float32)[None].repeat(3, 0)
    H[1, 5, 5] = -1.0
    L = np.asarray(jax.jit(chol_lower)(jnp.asarray(H)))
    assert not np.isnan(L[0]).any() and not np.isnan(L[2]).any()
    assert np.isnan(L[1]).any()   # the IPM's step_ok guard relies on this


def test_tri_inv_small_and_blocked():
    rng = np.random.default_rng(2)
    for n, fn in ((24, _tri_inv_small), (87, tri_inv_lower)):
        L = np.linalg.cholesky(_spd(rng, 4, n).astype(np.float64)).astype(np.float32)
        Xi = np.asarray(jax.jit(fn)(jnp.asarray(L)))
        err = np.abs(Xi @ L - np.eye(n, dtype=np.float32)).max()
        assert err < 5e-5, (n, err)


def test_chol_small_column_semantics():
    rng = np.random.default_rng(3)
    H = _spd(rng, 2, 16)
    L = np.asarray(jax.jit(_chol_small)(jnp.asarray(H)))
    np.testing.assert_allclose(
        L, np.linalg.cholesky(H.astype(np.float64)).astype(np.float32),
        atol=1e-4)


def test_gj_inverse_needs_pivoting():
    # leading 2x2 block singular without row exchange: unpivoted GJ fails,
    # the swap-free pivoted kernel must handle it
    A = np.array([[[0.0, 1.0, 0.0],
                   [1.0, 0.0, 0.0],
                   [0.0, 0.0, 1.0]]], dtype=np.float32)
    Ai = np.asarray(gj_inverse(jnp.asarray(A), interpret=True))
    np.testing.assert_allclose(Ai[0] @ A[0], np.eye(3), atol=1e-6)


def test_gj_inverse_random_batch():
    rng = np.random.default_rng(4)
    A = rng.normal(size=(33, 16, 16)).astype(np.float32)
    A += 4 * np.eye(16, dtype=np.float32)
    Ai = np.asarray(gj_inverse(jnp.asarray(A), interpret=True))
    err = np.abs(np.einsum("bij,bjk->bik", Ai, A)
                 - np.eye(16, dtype=np.float32)).max()
    assert err < 2e-4


def test_chol_tri_inv_fused_interpret():
    # the fused Pallas kernel, run in interpret mode on CPU: same numerics
    # as the blocked unfused path
    from racing_lmpc_tpu.ops.pallas_linalg import chol_tri_inv_fused
    rng = np.random.default_rng(3)
    H = _spd(rng, 10, 87)
    Li = np.asarray(chol_tri_inv_fused(jnp.asarray(H), rows_per_program=4,
                                       interpret=True))
    L_ref = np.linalg.cholesky(H.astype(np.float64))
    Li_ref = np.linalg.inv(L_ref)
    err = np.abs(Li - Li_ref).max() / np.abs(Li_ref).max()
    assert err < 5e-5


def test_chol_tri_inv_custom_vmap():
    from racing_lmpc_tpu.ops.pallas_linalg import chol_tri_inv
    rng = np.random.default_rng(4)
    H = _spd(rng, 6, 40)
    # unbatched call
    one = np.asarray(jax.jit(chol_tri_inv)(jnp.asarray(H[0])))
    # batched call goes through the custom-vmap rule
    batched = np.asarray(jax.jit(jax.vmap(chol_tri_inv))(jnp.asarray(H)))
    Li_ref = np.linalg.inv(np.linalg.cholesky(H.astype(np.float64)))
    assert np.abs(one - Li_ref[0]).max() < 1e-4
    assert np.abs(batched - Li_ref).max() < 1e-4


# ---------------------------------------------------------------------------
# compensated (double-word) f32 arithmetic — ops/compensated.py
# ---------------------------------------------------------------------------

def test_compensated_matvec_beats_f32_floor():
    """A @ x in compensated f32 must match numpy f64 far below the plain-f32
    rounding floor — this is what the zoomed QP refinement stands on."""
    from racing_lmpc_tpu.ops.compensated import matvec_compensated
    rng = np.random.default_rng(3)
    A64 = rng.standard_normal((137, 201))
    x64 = rng.standard_normal(201)
    A = jnp.asarray(A64, jnp.float32)
    x = jnp.asarray(x64, jnp.float32)
    # the comparison target uses the f32-ROUNDED data at f64 (the compensated
    # matvec cannot know the pre-rounding values)
    ref = np.asarray(A, np.float64) @ np.asarray(x, np.float64)
    hi, lo = jax.jit(matvec_compensated)(A, x)
    err_comp = np.abs((np.asarray(hi, np.float64)
                       + np.asarray(lo, np.float64)) - ref).max()
    err_plain = np.abs(np.asarray(A @ x, np.float64) - ref).max()
    assert err_comp < 1e-11, err_comp
    assert err_comp < err_plain / 100.0


def test_compensated_cancellation():
    """Residual-style cancellation: b - A x with b = fl(A x) must resolve the
    true tiny remainder, not f32 noise."""
    from racing_lmpc_tpu.ops.compensated import (
        matvec_compensated, two_sum)
    rng = np.random.default_rng(7)
    A = jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)
    x = jnp.asarray(rng.standard_normal(64), jnp.float32)
    b = A @ x    # plain f32 product, carries ~1e-7 rounding
    hi, lo = matvec_compensated(A, x)
    # r = b - (A x) exactly: the compensated value of the residual
    rh, e = two_sum(b, -hi)
    r = np.asarray(rh, np.float64) + np.asarray(e - lo, np.float64)
    ref = (np.asarray(b, np.float64)
           - np.asarray(A, np.float64) @ np.asarray(x, np.float64))
    assert np.abs(r - ref).max() < 1e-12
