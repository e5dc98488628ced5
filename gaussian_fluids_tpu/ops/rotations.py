"""Rotation / covariance reparameterisation.

The mixture stores *log inverse* scales ``s`` ("scalings reverse", reference
2D/GSR.py:40) and a rotation (angle in 2D, quaternion in 3D). The inverse
covariance is

    Sigma^{-1} = R @ diag(exp(2 s)) @ R^T

(reference 2D/GSR.py:93-108 via A = R S, Sigma^{-1} = A A^T with
S = diag(exp(s)); 3D/GSR.py:93-116 with the quaternion normalised
in-function, 3D/GSR.py:97-99).

Everything here is elementwise / small-matrix math — pure jnp, batched over
the leading axis, differentiable by JAX AD (replacing the reference's
hand-derived dR/dq_i matrices, 3D/GSR.py:328-352).
"""

from __future__ import annotations

import jax.numpy as jnp


def rotation_matrix_2d(angle: jnp.ndarray) -> jnp.ndarray:
    """(N,) angle -> (N, 2, 2) rotation matrices (reference 2D/GSR.py:96-102)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def rotation_matrix_3d(quat: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) quaternion (r, x, y, z) -> (N, 3, 3), normalising first
    (reference 3D/GSR.py:96-110)."""
    q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
        axis=-1)
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
        axis=-1)
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
        axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rotation_matrix(rotations: jnp.ndarray, d: int) -> jnp.ndarray:
    if d == 2:
        return rotation_matrix_2d(rotations)
    return rotation_matrix_3d(rotations)


def precision_matrix(scalings: jnp.ndarray, rotations: jnp.ndarray,
                     d: int) -> jnp.ndarray:
    """Inverse covariance Sigma^{-1} = R diag(e^{2s}) R^T, shape (N, d, d)."""
    R = rotation_matrix(rotations, d)
    e2s = jnp.exp(2.0 * scalings)  # (N, d)
    return jnp.einsum("nik,nk,njk->nij", R, e2s, R)


def packed_precision_entries(scalings: jnp.ndarray, rotations: jnp.ndarray,
                             d: int) -> jnp.ndarray:
    """(N, d(d+1)/2) upper-triangle entries of Sigma^{-1}, closed-form
    ELEMENTWISE — diagonal first, then off-diagonals (i<j) lexicographic
    (the kernel packing, ops/pallas/gsr_centered._off_pairs).

    Equivalent to slicing :func:`precision_matrix` but much better on TPU:
    the batched einsum lowers to bf16 MXU matmuls (rounding the precision
    entries themselves) followed by a serial slice fusion — profiled at
    ~290us/epoch at N=5120, ~30%% of a projection epoch. This form is a
    single f32 VPU fusion and exact."""
    e = jnp.exp(2.0 * scalings)
    if d == 2:
        c, s = jnp.cos(rotations), jnp.sin(rotations)
        a, b = e[..., 0], e[..., 1]
        return jnp.stack([c * c * a + s * s * b,
                          s * s * a + c * c * b,
                          c * s * (a - b)], axis=-1)
    q = rotations / jnp.linalg.norm(rotations, axis=-1, keepdims=True)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rows = (
        (1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)),
        (2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)),
        (2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)),
    )
    e0, e1, e2 = e[..., 0], e[..., 1], e[..., 2]

    def pij(i, j):
        ri, rj = rows[i], rows[j]
        return ri[0] * rj[0] * e0 + ri[1] * rj[1] * e1 + ri[2] * rj[2] * e2

    return jnp.stack([pij(0, 0), pij(1, 1), pij(2, 2),
                      pij(0, 1), pij(0, 2), pij(1, 2)], axis=-1)
