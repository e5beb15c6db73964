"""Pallas/blocked TPU kernels for the small dense linear algebra inside the
QP solver: batched Cholesky, triangular inverse, and Gauss-Jordan inverse.

XLA's linalg custom calls (`cholesky`, `triangular_solve`, pivoted LU via
`lu`/`inv`) are all avoided on the hot path — they are layout-sensitive on
TPU (batch-minormost operand layouts make them ~60x slower, profiled at
2.44 ms vs 0.04 ms for a (256, 87, 87) cholesky) and the pivoted-LU
while-loop costs ~4.4 ms per (256, 64, 64) dispatch regardless.

The Gauss-Jordan kernel runs a swap-free partially-pivoted elimination
entirely in VMEM:

- each grid program loads ``R`` blocks (R, b, 2b augmented) into VMEM and
  performs the full b-step elimination on-chip — no HBM round trips between
  steps and no kernel-dispatch overhead per step;
- partial pivoting WITHOUT row swaps: at step k the pivot row p is the
  not-yet-used row maximizing |M[p, k]|; after all steps the left half of
  the augmented matrix is the row-permutation matrix P (one-hot rows), so
  A^{-1} = P^T . right_half — one final (b, b) matmul on the MXU instead of
  bookkeeping swaps;
- everything is batched over the R blocks in-program, so each of the b
  sequential steps is a well-shaped (R, b, 2b) VPU operation.

Numerically this is textbook partial-pivoted Gauss-Jordan — the same growth
bound as LAPACK's getri path — robust when barrier weights span ~1e8.
"""

from __future__ import annotations

import functools
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gj_body(MI: Array, n_steps: int) -> Array:
    """Swap-free pivoted Gauss-Jordan on an augmented batch (R, b, 2b).

    Pure-JAX body shared by the Pallas kernel and the interpret/CPU
    fallback.  Returns the eliminated augmented matrix whose left half is a
    permutation matrix.
    """
    R, b, b2 = MI.shape
    dtype = MI.dtype
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (R, b), 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (R, b, b2), 2)

    def step(k, carry):
        MI, used = carry
        # column k extracted by masked reduction (dynamic_slice of a value is
        # not lowerable in Pallas TPU); masks stay float throughout — Mosaic
        # cannot insert minor dims on i1 vectors.
        col = jnp.sum(jnp.where(col_ids == k, MI, 0.0), axis=2)        # (R, b)
        score = jnp.abs(col) - used * jnp.asarray(1e30, dtype)
        p = jnp.argmax(score, axis=-1)                                  # (R,)
        oh = (row_ids == p[:, None]).astype(dtype)                      # (R, b)
        # pivot row and pivot value (contract against the one-hot)
        prow = jnp.sum(oh[..., None] * MI, axis=1)                      # (R, 2b)
        d = jnp.sum(oh * col, axis=-1)                                  # (R,)
        prow = prow / d[:, None]
        # elimination factors against the SCALED pivot row (prow[k] == 1)
        f = (1.0 - oh) * col
        MI = MI - f[..., None] * prow[:, None, :]
        # set row p to the scaled pivot row
        MI = MI * (1.0 - oh[..., None]) + oh[..., None] * prow[:, None, :]
        return MI, used + oh

    MI, _ = jax.lax.fori_loop(
        0, n_steps, step, (MI, jnp.zeros((R, b), dtype=dtype)))
    return MI


def _gj_inverse_batch(A: Array) -> Array:
    """Inverse of a batch (R, b, b) by augmented pivoted GJ (pure JAX)."""
    R, b, _ = A.shape
    eye = jnp.broadcast_to(jnp.eye(b, dtype=A.dtype), (R, b, b))
    MI = jnp.concatenate([A, eye], axis=-1)
    MI = _gj_body(MI, b)
    left, right = MI[..., :b], MI[..., b:]
    # left is the row-permutation matrix P (P[p, k] = 1): A^{-1} = P^T right.
    # HIGHEST precision: the default 1-pass bf16 MXU product would truncate
    # the f32 inverse entries to ~4e-3 relative error.
    return jax.lax.dot_general(
        left, right, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=A.dtype,
        precision=jax.lax.Precision.HIGHEST)


def _gj_kernel(a_ref, out_ref):
    out_ref[...] = _gj_inverse_batch(a_ref[...])


@functools.partial(jax.jit, static_argnames=("rows_per_program", "interpret"))
def gj_inverse(A: Array, rows_per_program: int = 16,
               interpret: bool = False) -> Array:
    """Batched pivoted Gauss-Jordan inverse: (..., b, b) -> (..., b, b).

    On TPU this runs as a Pallas kernel with ``rows_per_program`` blocks per
    grid program, the whole elimination resident in VMEM.  On other
    backends (tests run on a CPU mesh) it falls back to the identical
    pure-JAX elimination.
    """
    b = A.shape[-1]
    batch_shape = A.shape[:-2]
    G = int(np.prod(batch_shape)) if batch_shape else 1
    A2 = A.reshape(G, b, b)

    on_tpu = jax.default_backend() == "tpu"
    if not (on_tpu or interpret):
        return _gj_inverse_batch(A2).reshape(A.shape)

    R = max(1, min(rows_per_program, G))
    pad = (-G) % R
    if pad:
        eye = jnp.broadcast_to(jnp.eye(b, dtype=A.dtype), (pad, b, b))
        A2 = jnp.concatenate([A2, eye], axis=0)
    Gp = A2.shape[0]

    out = pl.pallas_call(
        _gj_kernel,
        grid=(Gp // R,),
        in_specs=[pl.BlockSpec((R, b, b), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, b, b), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, b, b), A.dtype),
        interpret=interpret,
    )(A2)
    if pad:
        out = out[:G]
    return out.reshape(A.shape)


def _last_dim_iota(like: Array) -> Array:
    """int32 iota along the last dim, shaped like ``like``.

    Generated in-graph (``broadcasted_iota``) instead of a numpy constant so
    the same code traces inside a Pallas kernel (captured array constants
    are rejected there); XLA constant-folds it on the regular path.
    """
    return jax.lax.broadcasted_iota(jnp.int32, like.shape, like.ndim - 1)


def _chol_small(S: Array) -> Array:
    """Unrolled column Cholesky of a small SPD batch (..., b, b), b <= ~32.

    Pure VPU arithmetic (rank-1 updates), no custom call: XLA's `cholesky`
    custom call on TPU is layout-sensitive — inside the IPM program layout
    assignment feeds it batch-minormost (1, 2, 0) operands and it runs ~60x
    slower (2.4 ms vs 0.04 ms at (256, 87, 87), profiled).  Indefinite
    inputs produce NaN via sqrt(negative), which the IPM's step_ok guard
    relies on.  Const-free (traces inside Pallas kernels).
    """
    b = S.shape[-1]
    cols = []
    M = S
    iota = None
    for j in range(b):
        d = jnp.sqrt(M[..., j, j])                       # NaN if not PD
        lj = M[..., :, j] / d[..., None]
        if iota is None:
            iota = _last_dim_iota(lj)
        lj = jnp.where(iota >= j, lj, 0.0)               # (..., b)
        cols.append(lj)
        M = M - lj[..., :, None] * lj[..., None, :]
    # stack columns (scatter-free: .at[].set per column lowers to 1 scatter
    # per step, measurably slow on TPU)
    return jnp.stack(cols, axis=-1)


def _tri_inv_small(L: Array) -> Array:
    """Unrolled forward-substitution inverse of small lower-triangular
    (..., b, b) batches — replaces the `triangular_solve` custom call for
    the blocked base cases (same TPU layout sensitivity as `cholesky`).
    Const-free (traces inside Pallas kernels)."""
    b = L.shape[-1]
    zero = jnp.zeros_like(L[..., 0, :])
    iota = _last_dim_iota(zero)
    rows: list = []
    for i in range(b):
        # scatter-free: restack the rows computed so far (rows >= i are
        # zero, so the contraction only sees k < i).  The contraction is a
        # rank-matched batched matmul — einsum's rank-mismatched matvec
        # (`...k,...kj->...j`) has no Mosaic lowering inside Pallas.
        X = jnp.stack(rows + [zero] * (b - i), axis=-2) if i else None
        acc = jnp.matmul(L[..., i:i + 1, :], X)[..., 0, :] if i else zero
        e_i = (iota == i).astype(L.dtype)
        rows.append((e_i - acc) / L[..., i, i][..., None])
    return jnp.stack(rows, axis=-2)


def chol_lower(H: Array, block: int = 32) -> Array:
    """Blocked right-looking Cholesky of SPD batches (..., n, n) -> lower L.

    Diagonal blocks factorize with the unrolled `_chol_small`; panels and
    Schur updates are (batched) matmuls on the MXU.  Everything stays in
    f32 with HIGHEST matmul precision — the factor feeds KKT solves that a
    bf16-truncated product would corrupt (see mpc/ipm.py).
    """
    n = H.shape[-1]
    batch_shape = H.shape[:-2]
    pad = (-n) % block
    npad = n + pad
    if pad:
        # embed H in the leading block of a padded SPD matrix (identity tail)
        Hp = jnp.zeros(batch_shape + (npad, npad), dtype=H.dtype)
        Hp = Hp.at[..., :n, :n].set(H)
        Hp = Hp.at[..., n:, n:].set(jnp.eye(pad, dtype=H.dtype))
    else:
        Hp = H
    nb = npad // block
    mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

    def blk(i, j):
        return Hp[..., i * block:(i + 1) * block, j * block:(j + 1) * block]

    Lb = [[None] * nb for _ in range(nb)]
    Dinv_T = [None] * nb
    for k in range(nb):
        S = blk(k, k)
        for j in range(k):
            S = S - mm(Lb[k][j], jnp.swapaxes(Lb[k][j], -1, -2))
        Lkk = _chol_small(S)
        Lb[k][k] = Lkk
        if k + 1 < nb:
            Dinv_T[k] = jnp.swapaxes(_tri_inv_small(Lkk), -1, -2)
        for i in range(k + 1, nb):
            P = blk(i, k)
            for j in range(k):
                P = P - mm(Lb[i][j], jnp.swapaxes(Lb[k][j], -1, -2))
            Lb[i][k] = mm(P, Dinv_T[k])

    zero = jnp.zeros(batch_shape + (block, block), dtype=H.dtype)
    rows = [jnp.concatenate(
        [Lb[i][j] if j <= i else zero for j in range(nb)], axis=-1)
        for i in range(nb)]
    out = jnp.concatenate(rows, axis=-2)
    return out[..., :n, :n]


def tri_inv_lower(L: Array, block: int = 32) -> Array:
    """Explicit inverse of a lower-triangular matrix by blocked substitution.

    XLA's ``triangular_solve`` lowers to an ``InvertDiagBlocksLowerTriangular``
    custom call whose scoped-VMEM scratch scales with batch x n^2 — at the
    LMPC shapes (vmap batch 256, n = 87 condensed variables) it exceeds the
    16 MB scoped VMEM limit and the compile FAILS.  Inverting L explicitly
    with small-block base cases + matmuls keeps everything on the MXU, and
    turns every subsequent solve into a single matmul (the right trade on
    TPU, where one (256, n, n) matmul is far cheaper than a substitution
    custom call).

    Works on (..., n, n); zero-fills the strictly-upper part of the result.
    """
    n = L.shape[-1]
    batch_shape = L.shape[:-2]
    pad = (-n) % block
    npad = n + pad
    if pad:
        eye_pad = jnp.zeros(L.shape[:-2] + (pad, npad), dtype=L.dtype)
        eye_pad = eye_pad.at[..., :, n:].set(jnp.eye(pad, dtype=L.dtype))
        Lp = jnp.concatenate([
            jnp.concatenate(
                [L, jnp.zeros(L.shape[:-2] + (n, pad), dtype=L.dtype)],
                axis=-1),
            eye_pad], axis=-2)
    else:
        Lp = L
    nb = npad // block

    # base: invert the diagonal blocks with the pivot-free pairwise GJ —
    # diagonal blocks of a Cholesky factor are themselves lower-triangular
    # with positive diagonal, so unpivoted elimination is stable.
    def blk(i, j):
        return Lp[..., i * block:(i + 1) * block, j * block:(j + 1) * block]

    # diagonal-block inverses via the unrolled substitution — the
    # `triangular_solve` custom call shares the TPU layout sensitivity of
    # `cholesky` (see _chol_small) and is avoided entirely.
    Dinv = [_tri_inv_small(blk(i, i)) for i in range(nb)]

    # block-column forward substitution: X_ij = -Dinv_i sum_k L_ik X_kj
    X = [[None] * nb for _ in range(nb)]
    mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    for j in range(nb):
        X[j][j] = Dinv[j]
        for i in range(j + 1, nb):
            acc = mm(blk(i, j), X[j][j])
            for k in range(j + 1, i):
                acc = acc + mm(blk(i, k), X[k][j])
            X[i][j] = -mm(Dinv[i], acc)
    zero = jnp.zeros(batch_shape + (block, block), dtype=L.dtype)
    rows = [jnp.concatenate(
        [X[i][j] if j <= i else zero for j in range(nb)], axis=-1)
        for i in range(nb)]
    out = jnp.concatenate(rows, axis=-2)
    return out[..., :n, :n]


def _chol_tri_inv_kernel(a_ref, o_ref):
    # the whole factor+invert runs on one VMEM-resident block: ~100
    # sequential small steps with zero HBM round trips between them
    with jax.default_matmul_precision("highest"):
        o_ref[...] = tri_inv_lower(chol_lower(a_ref[...]))


def chol_tri_inv_fused(H: Array, rows_per_program: int = 8,
                       block: int = 32, interpret: bool = False) -> Array:
    """Fused ``L^-1`` of ``chol(H)`` as ONE Pallas kernel over batch chunks.

    The blocked Cholesky + triangular inverse are ~100 sequential small ops
    (rank-1 updates, row substitutions); as separate XLA kernels each one
    pays dispatch overhead and an HBM round trip of the full batch —
    profiled at ~0.6 ms per IPM iteration at (256, 87, 87), ~50% of the
    whole iteration.  Here each grid program loads ``rows_per_program``
    matrices into VMEM and runs the entire factor+invert on-chip.

    **Measured verdict (v5e, (256, 87, 87) f32)**: the fused kernel does
    NOT beat the XLA-pipelined unfused path at the LMPC shapes — grid
    programs execute sequentially on the single TensorCore, so per-chunk
    ops of R<=8 samples underfill the VPU lanes (3.5 ms/call vs ~0.6 ms
    in-program unfused), and Mosaic's scoped-VMEM stack for the unrolled
    elimination is ~0.73 MB/sample, capping R at ~16 (R=32 OOMs the 16 MB
    scoped VMEM).  Kept as a building block for small-n / huge-batch
    regimes; the IPM stays on the unfused path (see `chol_tri_inv`).

    Inputs are padded to a multiple of ``block`` with an identity tail
    (keeps SPD) OUTSIDE the kernel, so the in-kernel code takes the
    constant-free pad=0 path.
    """
    n = H.shape[-1]
    batch_shape = H.shape[:-2]
    G = int(np.prod(batch_shape)) if batch_shape else 1
    dtype = H.dtype

    pad = (-n) % block
    npad = n + pad
    H2 = H.reshape(G, n, n)
    if pad:
        Hp = jnp.zeros((G, npad, npad), dtype=dtype)
        Hp = Hp.at[:, :n, :n].set(H2)
        Hp = Hp.at[:, n:, n:].set(jnp.eye(pad, dtype=dtype))
    else:
        Hp = H2

    R = max(1, min(rows_per_program, G))
    bpad = (-G) % R
    if bpad:
        eye = jnp.broadcast_to(jnp.eye(npad, dtype=dtype), (bpad, npad, npad))
        Hp = jnp.concatenate([Hp, eye], axis=0)
    Gp = Hp.shape[0]

    out = pl.pallas_call(
        _chol_tri_inv_kernel,
        grid=(Gp // R,),
        in_specs=[pl.BlockSpec((R, npad, npad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((R, npad, npad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Gp, npad, npad), dtype),
        interpret=interpret,
    )(Hp)
    return out[:G, :n, :n].reshape(H.shape)


@jax.custom_batching.custom_vmap
def chol_tri_inv(H: Array) -> Array:
    """``L^-1`` for ``L = chol(H)`` — an ALTERNATE composed entry point.

    The IPM (mpc/ipm.py) calls ``chol_lower`` and ``tri_inv_lower``
    separately (it reuses the intermediate ``L``); this wrapper exists for
    callers that want the composition as one swappable op: it carries a
    custom-vmap rule so the batched implementation can be redirected per
    shape regime.  The measured default on v5e keeps the XLA-pipelined
    unfused path (see `chol_tri_inv_fused`'s verdict for why the Pallas
    fusion loses at the LMPC shapes); callers in small-n / huge-batch
    regimes can use `chol_tri_inv_fused` directly.
    """
    return tri_inv_lower(chol_lower(H))


@chol_tri_inv.def_vmap
def _chol_tri_inv_vmap(axis_size, in_batched, H):
    del axis_size
    (h_batched,) = in_batched
    return tri_inv_lower(chol_lower(H)), h_batched


def inv_small(M: Array) -> Array:
    """Closed-form inverse for tiny trailing dims (1/2/3): adjugate over
    determinant.  `jnp.linalg.solve`/`inv` lower to the pivoted-LU custom
    call, which costs ~2.8 ms per solve batch inside the Riccati scan
    (profiled, batch 256, 2x2!) under TPU's batch-minormost layouts; the
    closed form is a handful of fused VPU ops.  Falls back to
    `jnp.linalg.inv` for larger sizes."""
    k = M.shape[-1]
    if k == 1:
        return 1.0 / M
    if k == 2:
        a, b = M[..., 0, 0], M[..., 0, 1]
        c, d = M[..., 1, 0], M[..., 1, 1]
        det = a * d - b * c
        adj = jnp.stack([jnp.stack([d, -b], -1),
                         jnp.stack([-c, a], -1)], -2)
        return adj / det[..., None, None]
    if k == 3:
        m = [[M[..., i, j] for j in range(3)] for i in range(3)]
        cof = [[m[(i+1) % 3][(j+1) % 3] * m[(i+2) % 3][(j+2) % 3]
                - m[(i+1) % 3][(j+2) % 3] * m[(i+2) % 3][(j+1) % 3]
                for j in range(3)] for i in range(3)]
        det = sum(m[0][j] * cof[0][j] for j in range(3))
        adj = jnp.stack([jnp.stack([cof[j][i] for j in range(3)], -1)
                         for i in range(3)], -2)
        return adj / det[..., None, None]
    return jnp.linalg.inv(M)


def solve_small(M: Array, X: Array) -> Array:
    """``M^{-1} X`` through `inv_small` (see there for why not linalg.solve)."""
    return inv_small(M) @ X
