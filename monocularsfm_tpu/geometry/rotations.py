"""Rotation parameterisations: angle-axis <-> matrix <-> quaternion.

The reference leans on cv::Rodrigues (src/Reconstruction/Registrant.cpp:96-97)
and Ceres' AngleAxisRotatePoint (src/Optimizer/CeresBundleOptimizer.cpp:29-36).
Here the conversions are written as branch-free batched jnp so they can sit
inside jit/vmap/grad — the Taylor-stabilised small-angle paths make them safe
to differentiate at theta -> 0 (needed by the bundle-adjustment Jacobians).

Conventions: rotations are world->camera; angle-axis vectors are (3,) with
magnitude = rotation angle in radians; quaternions are (w, x, y, z) to match
the COLMAP text export consumed downstream.
"""

from __future__ import annotations

import jax.numpy as jnp
from monocularsfm_tpu.utils.precision import mm

_EPS = 1e-12


def angle_axis_to_matrix(aa: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula, batched over leading dims. aa: (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(aa * aa, axis=-1, keepdims=True)  # (..., 1)
    theta = jnp.sqrt(theta2 + _EPS)
    # sin(t)/t and (1-cos t)/t^2 with stable small-angle expansions.
    small = theta2[..., 0] < 1e-8
    sinc = jnp.where(small, 1.0 - theta2[..., 0] / 6.0, jnp.sin(theta[..., 0]) / theta[..., 0])
    cosc = jnp.where(
        small, 0.5 - theta2[..., 0] / 24.0, (1.0 - jnp.cos(theta[..., 0])) / theta2[..., 0]
    )
    x, y, z = aa[..., 0], aa[..., 1], aa[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )  # (..., 3, 3) skew-symmetric
    eye = jnp.broadcast_to(jnp.eye(3, dtype=aa.dtype), K.shape)
    K2 = mm(K, K)
    return eye + sinc[..., None, None] * K + cosc[..., None, None] * K2


def matrix_to_angle_axis(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse Rodrigues, batched. R: (..., 3, 3) -> (..., 3).

    Uses the quaternion route (stable for angles near 0 and near pi).
    """
    q = matrix_to_quaternion(R)
    w = q[..., 0]
    v = q[..., 1:]
    vnorm = jnp.linalg.norm(v, axis=-1)
    # angle = 2*atan2(|v|, w); axis = v/|v|
    angle = 2.0 * jnp.arctan2(vnorm, w)
    scale = jnp.where(vnorm > 1e-12, angle / jnp.maximum(vnorm, _EPS), 2.0 / jnp.maximum(w, _EPS))
    return v * scale[..., None]


def matrix_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix to unit quaternion (w, x, y, z), batched, branch-free.

    Computes all four Shepperd candidates and selects the best-conditioned one
    with jnp.where — no data-dependent control flow, so it vmaps and jits.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidate 4*q_i^2 - 1 style magnitudes.
    qw2 = jnp.maximum(0.0, 1.0 + tr)
    qx2 = jnp.maximum(0.0, 1.0 + m00 - m11 - m22)
    qy2 = jnp.maximum(0.0, 1.0 - m00 + m11 - m22)
    qz2 = jnp.maximum(0.0, 1.0 - m00 - m11 + m22)

    # Candidate quaternions, each scaled by its dominant component.
    def _safe(x):
        return jnp.maximum(jnp.sqrt(x), 1e-12)

    sw, sx, sy, sz = _safe(qw2), _safe(qx2), _safe(qy2), _safe(qz2)
    cand_w = jnp.stack([sw, (m21 - m12) / sw, (m02 - m20) / sw, (m10 - m01) / sw], axis=-1)
    cand_x = jnp.stack([(m21 - m12) / sx, sx, (m01 + m10) / sx, (m02 + m20) / sx], axis=-1)
    cand_y = jnp.stack([(m02 - m20) / sy, (m01 + m10) / sy, sy, (m12 + m21) / sy], axis=-1)
    cand_z = jnp.stack([(m10 - m01) / sz, (m02 + m20) / sz, (m12 + m21) / sz, sz], axis=-1)

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # (..., 4cand, 4comp)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, axis=-1), axis=-2)[..., 0, :]
    q = q * 0.5
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # Canonicalise sign: w >= 0 (COLMAP convention).
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) to rotation matrix, batched."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1)
    row1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1)
    row2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def angle_axis_rotate_point(aa: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Rotate points by angle-axis without forming the matrix.

    Mirrors Ceres' AngleAxisRotatePoint (the BA residual's rotation op,
    reference src/Optimizer/CeresBundleOptimizer.cpp:29-36) but batched:
    aa: (..., 3), pts: (..., 3) broadcastable.
    """
    theta2 = jnp.sum(aa * aa, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta2 + _EPS)
    small = theta2 < 1e-8
    cos_t = jnp.where(small[..., 0], 1.0 - theta2[..., 0] / 2.0, jnp.cos(theta[..., 0]))[..., None]
    sinc = jnp.where(small[..., 0], 1.0 - theta2[..., 0] / 6.0, jnp.sin(theta[..., 0]) / theta[..., 0])[
        ..., None
    ]
    w_cross_p = jnp.cross(aa, pts)
    w_dot_p = jnp.sum(aa * pts, axis=-1, keepdims=True)
    one_m_cos_over_t2 = jnp.where(
        small[..., 0], 0.5 - theta2[..., 0] / 24.0, (1.0 - cos_t[..., 0]) / theta2[..., 0]
    )[..., None]
    return pts * cos_t + w_cross_p * sinc + aa * (w_dot_p * one_m_cos_over_t2)
