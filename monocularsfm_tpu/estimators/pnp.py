"""Batched PnP (absolute pose from 2D-3D matches) with RANSAC + GN polish.

Reference parity: Registrant::Register wraps cv::solvePnPRansac (P3P/AP3P/
EPNP/UPNP — with the EPNP enum quirk dispatching UPNP, Registrant.cpp:52-57),
thresholds >= 15 inliers / 4 px / conf 0.9999 (Registrant.h:22-27), and
Rodrigues conversion of the result (:96-97).

TPU-native design: the minimal solver is the 6-point DLT (linear resection) —
a 12x12 eigh per hypothesis, which batches perfectly; the winning hypothesis
is polished by a fixed-iteration Gauss-Newton on its inliers (the role the
iterative refinement inside solvePnPRansac plays).  With thousands of
parallel hypotheses the one-extra-point minimal set costs a few percent of
success probability per draw but the batch is exhaustive at SfM match counts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from monocularsfm_tpu.estimators.ransac import sample_minimal_sets, score_hypotheses
from monocularsfm_tpu.geometry.rotations import (
    angle_axis_to_matrix,
    matrix_to_angle_axis,
)

_HIGHEST = jax.lax.Precision.HIGHEST


def _p6p_rows(X: jnp.ndarray, xn: jnp.ndarray) -> jnp.ndarray:
    """DLT resection rows. X: (..., 3) world, xn: (..., 2) normalized image.

    Returns (..., 2, 12) rows of A p = 0 with p = vec(P) row-major."""
    u, v = xn[..., 0], xn[..., 1]
    one = jnp.ones_like(u)
    zero = jnp.zeros_like(u)
    Xh = jnp.concatenate([X, one[..., None]], axis=-1)  # (..., 4)
    z4 = jnp.stack([zero] * 4, axis=-1)
    r0 = jnp.concatenate([Xh, z4, -u[..., None] * Xh], axis=-1)
    r1 = jnp.concatenate([z4, Xh, -v[..., None] * Xh], axis=-1)
    return jnp.stack([r0, r1], axis=-2)


def _fit_p6p(X, xn, idx=None, weights=None):
    """Linear resection -> (R (3,3), t (3)). Batched over leading dims of idx."""
    if idx is not None:
        X = X[idx]
        xn = xn[idx]
    rows = _p6p_rows(X, xn).reshape((-1, 12)) if idx is not None else _p6p_rows(X, xn)
    if rows.ndim > 2:
        rows = rows.reshape(rows.shape[:-3] + (-1, 12))
    if weights is not None:
        w = jnp.repeat(weights, 2, axis=-1)
        rows = rows * w[..., None]
    AtA = jnp.einsum("...ri,...rj->...ij", rows, rows, precision=_HIGHEST)
    _, V = jnp.linalg.eigh(AtA)
    p = V[..., :, 0]
    P = p.reshape(p.shape[:-1] + (3, 4))
    M = P[..., :, :3]
    # Procrustes projection of M onto SO(3), recovering scale + sign.
    U, S, Vt = jnp.linalg.svd(M)
    detUV = jnp.linalg.det(U @ Vt)
    D = jnp.ones(S.shape, S.dtype).at[..., 2].set(jnp.sign(detUV))
    R = U @ (D[..., :, None] * Vt)
    scale = jnp.mean(S * D, axis=-1)
    scale = jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
    t = P[..., :, 3] / scale[..., None]
    return R, t


def _reproj_err_px(K, R, t, X, uv):
    xc = jnp.einsum("...ij,...nj->...ni", R, X, precision=_HIGHEST) + t[..., None, :]
    z = xc[..., 2]
    behind = z <= 1e-6
    zs = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    u = K[0, 0] * xc[..., 0] / zs + K[0, 2]
    v = K[1, 1] * xc[..., 1] / zs + K[1, 2]
    err2 = (u - uv[..., 0]) ** 2 + (v - uv[..., 1]) ** 2
    # Points behind the camera are never inliers.
    return jnp.where(behind, 1e18, err2)


@functools.partial(jax.jit, static_argnames=("num_hyps", "refine_iters"))
def estimate_pnp_ransac(
    key: jax.Array,
    K: jnp.ndarray,
    X: jnp.ndarray,
    uv: jnp.ndarray,
    mask: jnp.ndarray,
    threshold_px: float | jnp.ndarray = 4.0,
    num_hyps: int = 4096,
    refine_iters: int = 10,
):
    """RANSAC P6P + Gauss-Newton polish.

    X: (N, 3) world points; uv: (N, 2) pixels; mask: (N,) validity.
    Returns dict(R, t, angle_axis, inliers, num_inliers, success,
    mean_inlier_error_px).
    """
    X = X.astype(jnp.float32)
    uv = uv.astype(jnp.float32)
    fx, fy = K[0, 0], K[1, 1]
    xn = jnp.stack([(uv[:, 0] - K[0, 2]) / fx, (uv[:, 1] - K[1, 2]) / fy], axis=-1)

    n = X.shape[0]
    sets = sample_minimal_sets(key, num_hyps, n, 6, mask)
    R, t = jax.vmap(lambda idx: _fit_p6p(X, xn, idx))(sets)  # (M,3,3), (M,3)
    err2 = _reproj_err_px(K, R, t, X[None], uv[None])  # (M, N)
    thr2 = jnp.asarray(threshold_px) ** 2
    best, inl_best, counts = score_hypotheses(err2, mask, thr2)
    R_best, t_best = R[best], t[best]

    # Gauss-Newton polish on the winner's inliers, in angle-axis + t.
    aa0 = matrix_to_angle_axis(R_best)
    params0 = jnp.concatenate([aa0, t_best])

    def residuals(params, w):
        Rp = angle_axis_to_matrix(params[:3])
        xc = jnp.einsum("ij,nj->ni", Rp, X, precision=_HIGHEST) + params[3:]
        z = jnp.where(jnp.abs(xc[:, 2]) < 1e-6, 1e-6, xc[:, 2])
        u = fx * xc[:, 0] / z + K[0, 2]
        v = fy * xc[:, 1] / z + K[1, 2]
        r = jnp.stack([u - uv[:, 0], v - uv[:, 1]], axis=-1) * w[:, None]
        return r.reshape(-1)

    def gn_step(params, _):
        w = (
            (_reproj_err_px(K, angle_axis_to_matrix(params[:3]), params[3:], X, uv) <= thr2)
            & mask
        ).astype(jnp.float32)
        J = jax.jacfwd(residuals)(params, w)  # (2N, 6)
        r = residuals(params, w)
        JtJ = J.T @ J
        Jtr = J.T @ r
        # Levenberg damping keeps the step safe when inlier geometry is thin.
        damp = 1e-6 * jnp.trace(JtJ) / 6.0
        step = jnp.linalg.solve(JtJ + damp * jnp.eye(6, dtype=JtJ.dtype), Jtr)
        new = params - step
        # Accept only non-degenerate steps.
        new = jnp.where(jnp.all(jnp.isfinite(new)), new, params)
        return new, None

    params, _ = jax.lax.scan(gn_step, params0, None, length=refine_iters)
    R_fin = angle_axis_to_matrix(params[:3])
    t_fin = params[3:]
    err2_fin = _reproj_err_px(K, R_fin, t_fin, X, uv)
    inliers = (err2_fin <= thr2) & mask
    num_inl = jnp.sum(inliers)
    # Fall back to the unpolished winner if GN diverged.
    better = num_inl >= jnp.sum(inl_best)
    R_fin = jnp.where(better, R_fin, R_best)
    t_fin = jnp.where(better, t_fin, t_best)
    err2_fin = jnp.where(better, err2_fin, _reproj_err_px(K, R_best, t_best, X, uv))
    inliers = (err2_fin <= thr2) & mask
    num_inl = jnp.sum(inliers)
    mean_err = jnp.sqrt(
        jnp.sum(jnp.where(inliers, err2_fin, 0.0)) / jnp.maximum(num_inl, 1)
    )
    return {
        "R": R_fin,
        "t": t_fin,
        "angle_axis": matrix_to_angle_axis(R_fin),
        "inliers": inliers,
        "num_inliers": num_inl,
        "success": num_inl >= 6,
        "mean_inlier_error_px": mean_err,
    }
