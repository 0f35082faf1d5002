"""Essential-matrix estimation, decomposition, and pose recovery.

Reference parity: Initializer::RecoverPoseFromFundanmental calls
cv::findEssentialMat + cv::recoverPose on the F-inliers (Initializer.cpp:306-
360; the comment at :306-309 explains why it re-estimates E rather than using
E = K^T F K directly).  We mirror that: estimate E with RANSAC on
K^-1-normalised coordinates (8-point + (1,1,0) singular-value projection —
batched-friendly, statistically equivalent to the 5-point solver at our
hypothesis counts), decompose into the 4 (R, t) candidates, and pick the
candidate by cheirality over the inliers, exactly recoverPose's test.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from monocularsfm_tpu.estimators.fundamental import (
    _eight_point_rows,
    _solve_nullspace_9,
    sampson_distance,
)
from monocularsfm_tpu.estimators.ransac import sample_minimal_sets, score_hypotheses
from monocularsfm_tpu.geometry.triangulation import triangulate_two_view
from monocularsfm_tpu.utils.precision import mm

_HIGHEST = jax.lax.Precision.HIGHEST


def _enforce_essential(E: jnp.ndarray) -> jnp.ndarray:
    """Project onto the essential manifold: singular values (1, 1, 0)."""
    U, _, Vt = jnp.linalg.svd(E)
    S = jnp.zeros(E.shape[:-2] + (3,), E.dtype).at[..., 0].set(1.0).at[..., 1].set(1.0)
    return mm(U, S[..., :, None] * Vt)


def _fit_e(x1n, x2n, idx=None, weights=None):
    if idx is not None:
        x1n = x1n[idx]
        x2n = x2n[idx]
    rows = _eight_point_rows(x1n, x2n)
    e = _solve_nullspace_9(rows, weights)
    E = e.reshape(e.shape[:-1] + (3, 3))
    return _enforce_essential(E)


def pixels_to_normalized(K: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixel -> normalized camera coords (no distortion; inputs pre-undistorted)."""
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    return jnp.stack(
        [(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1
    )


@functools.partial(jax.jit, static_argnames=("num_hyps",))
def estimate_essential_ransac(
    key: jax.Array,
    xn1: jnp.ndarray,
    xn2: jnp.ndarray,
    mask: jnp.ndarray,
    threshold_norm: float | jnp.ndarray,
    num_hyps: int = 2048,
):
    """RANSAC E on normalized coords. threshold_norm ~ threshold_px / focal.

    Returns dict with E, inliers, num_inliers, success.
    """
    xn1 = xn1.astype(jnp.float32)
    xn2 = xn2.astype(jnp.float32)
    n = xn1.shape[0]
    sets = sample_minimal_sets(key, num_hyps, n, 8, mask)
    E = jax.vmap(lambda idx: _fit_e(xn1, xn2, idx))(sets)
    res = sampson_distance(E, xn1[None], xn2[None])
    thr2 = jnp.asarray(threshold_norm) ** 2
    best, inl, counts = score_hypotheses(res, mask, thr2)
    E_best = E[best]

    def refit(Ec, _):
        r = sampson_distance(Ec[None], xn1[None], xn2[None])[0]
        w = ((r <= thr2) & mask).astype(jnp.float32)
        E2 = _fit_e(xn1, xn2, weights=w)
        c_new = jnp.sum((sampson_distance(E2[None], xn1[None], xn2[None])[0] <= thr2) & mask)
        c_old = jnp.sum((sampson_distance(Ec[None], xn1[None], xn2[None])[0] <= thr2) & mask)
        return jnp.where(c_new >= c_old, E2, Ec), None

    E_best, _ = jax.lax.scan(refit, E_best, None, length=2)
    res_best = sampson_distance(E_best[None], xn1[None], xn2[None])[0]
    inliers = (res_best <= thr2) & mask
    num_inl = jnp.sum(inliers)
    return {
        "E": E_best,
        "inliers": inliers,
        "num_inliers": num_inl,
        "success": num_inl >= 8,
    }


def decompose_essential(E: jnp.ndarray):
    """E -> 4 candidate (R, t) pairs, stacked: R (4,3,3), t (4,3), |t| = 1."""
    U, _, Vt = jnp.linalg.svd(E)
    # Keep rotations proper.
    U = U * jnp.sign(jnp.linalg.det(U))[..., None, None]
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))[..., None, None]
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = mm(U, W, Vt)
    R2 = mm(U, W.T, Vt)
    t = U[..., :, 2]
    Rs = jnp.stack([R1, R1, R2, R2], axis=-3)
    ts = jnp.stack([t, -t, t, -t], axis=-2)
    return Rs, ts


@jax.jit
def recover_pose_from_essential(
    E: jnp.ndarray, xn1: jnp.ndarray, xn2: jnp.ndarray, mask: jnp.ndarray
):
    """cv::recoverPose equivalent: pick the (R, t) with max cheirality support.

    Camera 1 is the identity; returns (R, t, points3d (N, 3), front_mask (N,))
    where front_mask marks inliers triangulated in front of both cameras with
    a sane depth (reference also rejects reproj > threshold downstream).
    """
    Rs, ts = decompose_essential(E)  # (4,3,3), (4,3)
    eye = jnp.eye(3, dtype=E.dtype)
    zero = jnp.zeros((3,), E.dtype)

    def tri(R, t):
        X = triangulate_two_view(
            eye, zero, R, t, xn1, xn2
        )  # (N, 3) in cam-1 frame (world = cam 1)
        z1 = X[..., 2]
        z2 = (jnp.einsum("ij,nj->ni", R, X, precision=_HIGHEST) + t)[..., 2]
        front = (z1 > 0) & (z2 > 0) & mask
        return X, front

    Xs, fronts = jax.vmap(tri)(Rs, ts)  # (4,N,3), (4,N)
    counts = jnp.sum(fronts, axis=1)
    best = jnp.argmax(counts)
    return Rs[best], ts[best], Xs[best], fronts[best]
