"""Batched small-matrix kernels that stay on the VPU.

XLA lowers a batched ``dot_general`` with tiny contraction/output dims
(e.g. [T, 8, 8] @ [T, 8, 8]) to one MXU pass PER BATCH ELEMENT — measured
1-4 ms for the Kalman filter's [128, 8, 8] covariance chains on a v5e,
versus microseconds of actual arithmetic. Likewise ``jnp.linalg.solve`` /
``cholesky`` on batched 4x4 systems lower to per-element LU loops.

Everything here is written as broadcast-multiply-reduce and statically
unrolled substitution: pure elementwise VPU work over the batch axis that
XLA fuses with its neighbors. Used by the Kalman filter (kalman.py) whose
predict/update/warp/maha run inside every frame kernel.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ['bmm', 'bmv', 'quad_form', 'chol', 'chol_solve', 'chol4',
           'chol_solve4', 'maha_sq_chol4']


def bmm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched matmul ``a @ b`` for tiny trailing dims via broadcast-sum.

    a: [..., m, k], b: [..., k, n] (leading dims broadcast). Keeps the
    batch on the VPU lanes instead of looping MXU passes.
    """
    return jnp.sum(a[..., :, :, None] * b[..., None, :, :], axis=-2)


def bmv(a: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched matvec ``a @ v``: a [..., m, k], v [..., k] -> [..., m]."""
    return jnp.sum(a * v[..., None, :], axis=-1)


def quad_form(f: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """``f @ c @ f.T`` batched: f [..., m, k], c [..., k, k] -> [..., m, m]."""
    return bmm(bmm(f, c), jnp.swapaxes(f, -1, -2))


def chol(a: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Closed-form Cholesky of batched SPD n x n matrices (statically
    unrolled Cholesky-Banachiewicz; all ops elementwise over the batch;
    n read from the static trailing shape, intended for n <= ~10).

    Invalid (non-SPD) inputs produce clamped garbage rather than NaN —
    callers mask invalid rows downstream, matching how the masked frame
    kernels treat padding.
    """
    n = a.shape[-1]
    l = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = a[..., i, j]
            for k in range(j):
                s = s - l[i][k] * l[j][k]
            if i == j:
                l[i][j] = jnp.sqrt(jnp.maximum(s, eps))
            else:
                l[i][j] = s / l[j][j]
    z = jnp.zeros_like(l[0][0])
    rows = [jnp.stack([l[i][j] if j <= i else z for j in range(n)], axis=-1)
            for i in range(n)]
    return jnp.stack(rows, axis=-2)


def _fwd_sub(l: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve L z = b for lower-triangular n x n L; b [..., n, m]."""
    n = l.shape[-1]
    z = []
    for i in range(n):
        s = b[..., i, :]
        for k in range(i):
            s = s - l[..., i, k, None] * z[k]
        z.append(s / l[..., i, i, None])
    return jnp.stack(z, axis=-2)


def _bwd_sub(l: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Solve L^T x = z; z [..., n, m]."""
    n = l.shape[-1]
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = z[..., i, :]
        for k in range(i + 1, n):
            s = s - l[..., k, i, None] * x[k]
        x[i] = s / l[..., i, i, None]
    return jnp.stack(x, axis=-2)


def chol_solve(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``a @ x = b`` for batched SPD n x n a; b [..., n, m]."""
    l = chol(a)
    return _bwd_sub(l, _fwd_sub(l, b))


# 4x4 aliases (the Kalman measurement-space size)
chol4 = chol
chol_solve4 = chol_solve


def maha_sq_chol4(a: jnp.ndarray, diff: jnp.ndarray) -> jnp.ndarray:
    """Squared Mahalanobis ``diff^T a^-1 diff`` for batched SPD 4x4 a.

    a [..., 4, 4], diff [..., 4, n] -> [..., n].
    """
    l = chol(a)
    y = _fwd_sub(l, diff)
    return jnp.sum(y * y, axis=-2)
