"""Compensated (double-word) f32 linear algebra for solution refinement.

TPUs have no float64.  The zoomed QP refinement (mpc/ipm.py) needs KKT
residuals far below the plain-f32 cancellation floor: the true residual of a
near-converged iterate is ~1e-8 while a single f32 matvec carries ~eps_f32 *
|A||x| ~ 1e-7 of rounding, so the refinement step would chase noise.  This
module evaluates  A @ x + b  with error-free transformations:

- **TwoProd** via Veltkamp splitting (no FMA required): every elementwise
  product a*b is represented exactly as  p + e  with p = fl(a*b);
- **TwoSum tree reduction**: the product terms are reduced pairwise with the
  Knuth TwoSum, carrying the rounding error of every addition into a side
  accumulator that is summed ordinarily (its total is O(eps * result), so
  its own rounding is O(eps^2)).

The result is a double-word (hi, lo) pair accurate to ~eps_f32^2 * condition
of the sum — in practice absolute errors ~1e-12 on O(1) data, measured
against numpy float64 in tests/test_linalg.py.

All ops are elementwise/VPU-friendly; cost is ~10x a plain matvec, which is
noise next to one IPM iteration.  Everything jits and vmaps.

No reference counterpart (the reference runs CasADi/OSQP at f64,
racing_mpc.cpp:85-103); this module is what makes f64-grade answers
reachable from f32 TPU hardware.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

_SPLIT = 4097.0  # 2^12 + 1, Veltkamp split constant for f32 (24-bit mantissa)


def _split(a: Array) -> tuple[Array, Array]:
    """Veltkamp split: a = hi + lo exactly, each with <= 12 mantissa bits."""
    t = _SPLIT * a
    hi = t - (t - a)
    return hi, a - hi


def two_prod(a: Array, b: Array) -> tuple[Array, Array]:
    """Error-free product: a * b = p + e exactly (Dekker, split-based)."""
    p = a * b
    a1, a2 = _split(a)
    b1, b2 = _split(b)
    e = ((a1 * b1 - p) + a1 * b2 + a2 * b1) + a2 * b2
    return p, e


def two_sum(a: Array, b: Array) -> tuple[Array, Array]:
    """Error-free sum (Knuth): a + b = s + e exactly."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def sum_compensated(p: Array, axis: int = -1) -> tuple[Array, Array]:
    """Reduce ``p`` along ``axis`` to a double-word (hi, lo) sum.

    Pairwise TwoSum tree: the value lane is reduced exactly-with-error-
    capture; the captured errors are summed ordinarily (their total is
    O(eps * |sum|), so its rounding is second-order).
    """
    p = jnp.moveaxis(p, axis, -1)
    err = jnp.zeros_like(p[..., :1]).sum(axis=-1)   # scalar-shaped zeros
    while p.shape[-1] > 1:
        n = p.shape[-1]
        if n % 2 == 1:
            p = jnp.concatenate([p, jnp.zeros_like(p[..., :1])], axis=-1)
            n += 1
        s, e = two_sum(p[..., 0::2], p[..., 1::2])
        err = err + jnp.sum(e, axis=-1)
        p = s
    return p[..., 0], err


def matvec_compensated(A: Array, x: Array) -> tuple[Array, Array]:
    """A @ x as a double-word (hi, lo) pair, accurate to ~eps^2.

    ``A`` is (m, n), ``x`` is (n,).  Elementwise TwoProd + compensated tree
    reduction; never touches the MXU, so it is immune to reduced-precision
    matmul accumulation.
    """
    p, e = two_prod(A, x[None, :])
    hi, lo = sum_compensated(p, axis=-1)
    return hi, lo + jnp.sum(e, axis=-1)


def dot_compensated(a: Array, b: Array) -> tuple[Array, Array]:
    """a . b as a double-word (hi, lo) pair."""
    p, e = two_prod(a, b)
    hi, lo = sum_compensated(p, axis=-1)
    return hi, lo + jnp.sum(e, axis=-1)


def add_dw(hi: Array, lo: Array, b: Array) -> tuple[Array, Array]:
    """(hi + lo) + b as a renormalized double-word pair."""
    s, e = two_sum(hi, b)
    return s, e + lo


def matvec_acc_compensated(A: Array, x: Array, b: Array) -> tuple[Array, Array]:
    """A @ x + b as a double-word (hi, lo) pair (b exact f32)."""
    hi, lo = matvec_compensated(A, x)
    return add_dw(hi, lo, b)
