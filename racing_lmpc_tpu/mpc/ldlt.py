"""Blocked unpivoted LDL^T factorization for quasi-definite KKT systems.

XLA's batched LU on TPU spends most of its time in row pivoting (58 ms vs
2.9 ms for an equal-size matmul at batch 256).  Interior-point KKT matrices
are symmetric *quasi-definite* after regularization ([[H, A'], [A, -dI]]
with H > 0, d > 0), and Vanderbei's result guarantees an LDL^T factorization
exists for ANY symmetric permutation — no pivoting needed.  This module
implements a right-looking block LDL^T (block-diagonal D) where every
operation is a batched matmul or a tiny block inverse, i.e. exactly what the
MXU is good at.

The block count is static (Python loop, unrolled at trace time), all slices
are static, and everything vmaps over a leading batch dimension.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array


class LDLTFactors(NamedTuple):
    L: Array        # (..., n, n) unit-block-lower (diag blocks = I)
    Dinv: Array     # (..., nb, b, b) inverses of the diagonal blocks


def unpivoted_inverse(A: Array) -> Array:
    """Dense inverse by unrolled unpivoted Gauss-Jordan.

    XLA's batched ``jnp.linalg.inv`` (pivoted LU) costs ~5 ms per dispatch on
    TPU for (256, 64, 64) — pivoting dominates.  For diagonal KKT blocks
    under the interleaved quasi-definite ordering, pivots are safe without
    row exchanges, and the n unrolled rank-1 steps below are pure batched
    arithmetic that XLA pipelines to near-zero marginal cost.
    """
    n = A.shape[-1]
    eye = jnp.eye(n, dtype=A.dtype)
    # work on the augmented [M | I] block so one rank-1 update serves both
    MI = jnp.concatenate(
        [A, jnp.broadcast_to(eye, A.shape).astype(A.dtype)], axis=-1)

    def body(k, MI):
        onehot = jax.nn.one_hot(k, n, dtype=A.dtype)
        row = jnp.einsum("i,...ij->...j", onehot, MI)
        d = jnp.einsum("i,...i->...", onehot, row[..., :n])[..., None]
        p = row / d
        col = MI[..., :, :n] @ onehot
        # eliminate column k everywhere, then restore the pivot row
        return (MI - col[..., :, None] * p[..., None, :]
                + onehot[:, None] * p[..., None, :])

    MI = jax.lax.fori_loop(0, n, body, MI)
    return MI[..., :, n:]


def unpivoted_inverse_pairs(A: Array) -> Array:
    """Dense inverse by 2x2-block-pivot Gauss-Jordan.

    Scalar unpivoted elimination fails on quasi-definite PAIRS
    [[eps, a], [a, -delta]] (both diagonals tiny, coupling O(1)): either
    scalar pivot causes 1/eps element growth.  Eliminating the pair as one
    2x2 block pivot — whose analytic inverse is bounded by 1/a — is stable.
    The interleaved KKT ordering guarantees every even-offset adjacent pair
    is either such a coupled pair or has healthy diagonals, so a fixed
    pairwise sweep needs no pivot search.
    """
    n = A.shape[-1]
    assert n % 2 == 0
    MI = jnp.concatenate(
        [A, jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape).astype(A.dtype)],
        axis=-1)

    def body(k, MI):
        o = 2 * k
        sel = jax.nn.one_hot(jnp.stack([o, o + 1]), n, dtype=A.dtype)  # (2, n)
        rows = jnp.einsum("pi,...ij->...pj", sel, MI)                  # (..., 2, 2n)
        # 2x2 pivot P[p, q] = rows[p, o + q]
        piv = jnp.einsum("...pj,qj->...pq", rows[..., :, :n], sel)
        det = piv[..., 0, 0] * piv[..., 1, 1] - piv[..., 0, 1] * piv[..., 1, 0]
        pinv = jnp.stack([
            jnp.stack([piv[..., 1, 1], -piv[..., 0, 1]], axis=-1),
            jnp.stack([-piv[..., 1, 0], piv[..., 0, 0]], axis=-1),
        ], axis=-2) / det[..., None, None]
        prows = pinv @ rows                                            # (..., 2, 2n)
        cols = jnp.einsum("...ij,pj->...ip", MI[..., :, :n], sel)      # (..., n, 2)
        return MI - cols @ prows + jnp.einsum("pi,...pj->...ij", sel, prows)

    MI = jax.lax.fori_loop(0, n // 2, body, MI)
    return MI[..., :, n:]


def ldlt_factor(K: Array, block: int = 64, inv_fn=None) -> LDLTFactors:
    """Factor a symmetric quasi-definite K = L D L^T.

    ``K``: (..., n, n) with n a multiple of ``block`` (pad at the call site).

    Left-looking formulation: the k-th block column of the implicitly
    Schur-updated matrix is computed as ONE accumulated matmul
    S = K[:, k] - W_{0..k-1} @ L_rows(k)^T with W_j = L[:, j] D_j, and the
    factors are collected as panel lists — no functional updates of the full
    trailing matrix, which on TPU would copy the whole (n, n) buffer every
    step (the right-looking version spent most of its time in those copies).
    """
    n = K.shape[-1]
    assert n % block == 0, f"n={n} must be a multiple of block={block}"
    if inv_fn is None:
        inv_fn = jnp.linalg.inv
    nb = n // block
    b = block
    batch = K.shape[:-2]
    eye_b = jnp.eye(b, dtype=K.dtype)

    L_cols: list[Array] = []   # (..., n, b) unit-lower panels
    W_cols: list[Array] = []   # (..., n, b) panels L[:, j] D_j
    Dinvs: list[Array] = []
    for k in range(nb):
        lo = k * b
        hi = lo + b
        S = K[..., :, lo:hi]
        if k > 0:
            Wcat = jnp.concatenate(W_cols, axis=-1)               # (..., n, k b)
            Lrow = jnp.concatenate(
                [Lc[..., lo:hi, :] for Lc in L_cols], axis=-1)    # (..., b, k b)
            S = S - Wcat @ jnp.swapaxes(Lrow, -1, -2)
        akk = S[..., lo:hi, :]
        dinv = inv_fn(akk)
        Dinvs.append(dinv)
        below = S[..., hi:, :] @ dinv                              # (..., r, b)
        zeros_top = jnp.zeros((*batch, lo, b), dtype=K.dtype)
        eye_mid = jnp.broadcast_to(eye_b, (*batch, b, b))
        L_cols.append(jnp.concatenate([zeros_top, eye_mid, below], axis=-2))
        # W = L[:, k] D_k = [0; D_k; S_below]
        W_cols.append(jnp.concatenate(
            [zeros_top, akk, S[..., hi:, :]], axis=-2))
    L = jnp.concatenate(L_cols, axis=-1)
    return LDLTFactors(L=L, Dinv=jnp.stack(Dinvs, axis=-3))


def ldlt_solve(f: LDLTFactors, r: Array) -> Array:
    """Solve K x = r given the factors.  ``r``: (..., n)."""
    b = f.Dinv.shape[-1]
    n = f.L.shape[-1]
    nb = n // b
    # forward: L y = r (unit block lower)
    y = r
    for k in range(1, nb):
        lo = k * b
        # y[k] -= L[k, :lo] @ y[:lo]
        upd = jnp.einsum("...ij,...j->...i", f.L[..., lo:lo + b, :lo], y[..., :lo])
        y = y.at[..., lo:lo + b].add(-upd)
    # diagonal: w = D^{-1} y
    w = jnp.einsum(
        "...kij,...kj->...ki", f.Dinv,
        y.reshape(*y.shape[:-1], nb, b)).reshape(*y.shape)
    # backward: L^T x = w
    x = w
    for k in range(nb - 2, -1, -1):
        lo = k * b
        hi = lo + b
        upd = jnp.einsum("...ji,...j->...i", f.L[..., hi:, lo:hi], x[..., hi:])
        x = x.at[..., lo:hi].add(-upd)
    return x


def pad_to_block(K: Array, r1_dim: int, block: int = 64) -> int:
    """Padded size for an (r1_dim) system rounded up to the block size."""
    return ((r1_dim + block - 1) // block) * block
