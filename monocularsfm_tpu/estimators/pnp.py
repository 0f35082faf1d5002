"""Batched PnP (absolute pose from 2D-3D matches) with RANSAC + GN polish.

Reference parity: Registrant::Register wraps cv::solvePnPRansac (P3P/AP3P/
EPNP/UPNP — with the EPNP enum quirk dispatching UPNP, Registrant.cpp:52-57),
thresholds >= 15 inliers / 4 px / conf 0.9999 (Registrant.h:22-27), and
Rodrigues conversion of the result (:96-97).

TPU-native design, two minimal solvers behind one RANSAC harness:

* "p6p" — 6-point DLT (linear resection): a 12x12 eigh per hypothesis,
  batches perfectly.
* "epnp" — 5-point EPnP (Lepetit et al. 2009, the solver family the
  reference's cv::solvePnPRansac draws from): barycentric coordinates w.r.t.
  4 control points, 12x12 eigh null space (5 points -> a 2-dimensional null
  space, exactly what the N=1/N=2 beta cases span), betas refined by a
  fixed-iteration Gauss-Newton on the 6 control-point distance constraints,
  pose via Procrustes — every step batched linear algebra.  Each sample
  yields TWO candidate models (both beta cases); scoring over all N points
  picks the winner, so the case selection OpenCV does by reprojection falls
  out of the ordinary RANSAC scoring pass.  The 5-point sample is ~1/w more
  likely to be all-inlier per draw than a 6-point DLT sample at inlier
  ratio w.

The winning hypothesis is polished by a fixed-iteration Gauss-Newton on its
inliers (the role of the iterative refinement inside solvePnPRansac).
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


_CTRL_PAIRS = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))


def _procrustes_pose(Xw: jnp.ndarray, Xc: jnp.ndarray):
    """Rigid R, t with R @ Xw + t ~= Xc (Horn's method). Xw/Xc: (n, 3)."""
    cw = jnp.mean(Xw, axis=0)
    cc = jnp.mean(Xc, axis=0)
    H = jnp.einsum(
        "ni,nj->ij", Xw - cw, Xc - cc, precision=_HIGHEST
    )  # world x camera
    U, _, Vt = jnp.linalg.svd(H)
    D = jnp.diag(
        jnp.array([1.0, 1.0, 1.0], H.dtype)
    ).at[2, 2].set(jnp.sign(jnp.linalg.det(Vt.T @ U.T)))
    R = Vt.T @ D @ U.T
    t = cc - R @ cw
    return R, t


def _fit_epnp5(X, xn, idx):
    """EPnP on a 5-point sample -> two candidate (R, t) models (beta cases
    N=1 and N=2, each Gauss-Newton-refined on the distance constraints).
    Returns (R (2,3,3), t (2,3))."""
    Xs = X[idx]   # (5, 3)
    xs = xn[idx]  # (5, 2) normalized image coords

    # Control points: centroid + principal directions (planar samples keep a
    # tiny extent along the normal so the barycentric system stays solvable;
    # degenerate samples just produce losing hypotheses).
    c0 = jnp.mean(Xs, axis=0)
    A = Xs - c0
    lam, v = jnp.linalg.eigh(A.T @ A)  # ascending
    s = jnp.sqrt(jnp.maximum(lam, 1e-10) / Xs.shape[0])
    ctrl = jnp.concatenate([c0[None], c0[None] + s[:, None] * v.T], axis=0)

    # Barycentric coordinates of the sample points w.r.t. the control points.
    Ch = jnp.concatenate([ctrl.T, jnp.ones((1, 4), Xs.dtype)], axis=0)
    Xh = jnp.concatenate([Xs, jnp.ones((Xs.shape[0], 1), Xs.dtype)], axis=1).T
    Ch = Ch + 1e-10 * jnp.eye(4, dtype=Xs.dtype)
    alphas = jnp.linalg.solve(Ch, Xh).T  # (n pts, 4 ctrl)

    # M x = 0 over camera-frame control-point coordinates x (12,).
    u, w = xs[:, 0], xs[:, 1]
    npts = Xs.shape[0]
    zero = jnp.zeros_like(alphas)
    ru = jnp.stack([alphas, zero, -alphas * u[:, None]], axis=-1).reshape(npts, 12)
    rv = jnp.stack([zero, alphas, -alphas * w[:, None]], axis=-1).reshape(npts, 12)
    M = jnp.concatenate([ru, rv], axis=0)  # (2n, 12)
    _, V = jnp.linalg.eigh(
        jnp.einsum("ri,rj->ij", M, M, precision=_HIGHEST)
    )
    vk = V[:, :2].T.reshape(2, 4, 3)  # two smallest null-space vectors

    # Pairwise control-point distance constraints.
    ii = jnp.array([p[0] for p in _CTRL_PAIRS])
    jj = jnp.array([p[1] for p in _CTRL_PAIRS])
    dw2 = jnp.sum((ctrl[ii] - ctrl[jj]) ** 2, axis=-1)  # (6,)
    dv = vk[:, ii] - vk[:, jj]                           # (2, 6, 3)

    # Case N=1: scale of v1 alone (least squares on distances).
    n1 = jnp.sqrt(jnp.maximum(jnp.sum(dv[0] ** 2, axis=-1), 1e-12))
    beta_c1 = jnp.sum(n1 * jnp.sqrt(dw2)) / jnp.maximum(jnp.sum(n1**2), 1e-12)
    betas1 = jnp.array([beta_c1, 0.0], dw2.dtype)

    # Case N=2: solve [b1^2, b1 b2, b2^2] from the 6 linear constraints.
    d11 = jnp.sum(dv[0] * dv[0], axis=-1)
    d12 = jnp.sum(dv[0] * dv[1], axis=-1)
    d22 = jnp.sum(dv[1] * dv[1], axis=-1)
    L = jnp.stack([d11, 2.0 * d12, d22], axis=-1)  # (6, 3)
    LtL = L.T @ L + 1e-10 * jnp.eye(3, dtype=L.dtype)
    b = jnp.linalg.solve(LtL, L.T @ dw2)
    b1 = jnp.sqrt(jnp.abs(b[0]))
    b2 = jnp.sign(b[1]) * jnp.sqrt(jnp.abs(b[2]))
    betas2 = jnp.array([b1, b2], dw2.dtype)

    def gn_refine(betas):
        # Minimise sum_p (||sum_k beta_k dv_k||^2 - dw2_p)^2 over the betas.
        def step(bs, _):
            diff = jnp.einsum("k,kpi->pi", bs, dv)          # (6, 3)
            r = jnp.sum(diff**2, axis=-1) - dw2             # (6,)
            J = 2.0 * jnp.einsum("pi,kpi->pk", diff, dv)    # (6, 2)
            JtJ = J.T @ J + 1e-8 * jnp.eye(2, dtype=J.dtype)
            new = bs - jnp.linalg.solve(JtJ, J.T @ r)
            return jnp.where(jnp.all(jnp.isfinite(new)), new, bs), None
        out, _ = jax.lax.scan(step, betas, None, length=5)
        return out

    def pose_from_betas(betas):
        cc = jnp.einsum("k,kij->ij", betas, vk)  # camera-frame ctrl (4, 3)
        pc = alphas @ cc                          # camera-frame sample points
        # EPnP sign convention: points must sit in front of the camera.
        flip = jnp.where(jnp.mean(pc[:, 2]) < 0.0, -1.0, 1.0)
        return _procrustes_pose(Xs, pc * flip)

    R1, t1 = pose_from_betas(gn_refine(betas1))
    R2, t2 = pose_from_betas(gn_refine(betas2))
    return jnp.stack([R1, R2]), jnp.stack([t1, t2])


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


@functools.partial(
    jax.jit, static_argnames=("num_hyps", "refine_iters", "method")
)
def estimate_pnp_ransac(
    key: jax.Array,
    K: jnp.ndarray,
    X: jnp.ndarray,
    uv: jnp.ndarray,
    mask: jnp.ndarray,
    threshold_px: float | jnp.ndarray = 4.0,
    num_hyps: int = 4096,
    refine_iters: int = 10,
    method: str = "p6p",
):
    """RANSAC PnP (minimal solver per `method`) + Gauss-Newton polish.

    X: (N, 3) world points; uv: (N, 2) pixels; mask: (N,) validity.
    method: "p6p" (6-point DLT) | "epnp" (5-point EPnP, two beta-case
    models per sample).  Returns dict(R, t, angle_axis, inliers,
    num_inliers, success, mean_inlier_error_px).
    """
    X = X.astype(jnp.float32)
    uv = uv.astype(jnp.float32)
    fx, fy = K[0, 0], K[1, 1]
    xn = jnp.stack([(uv[:, 0] - K[0, 2]) / fx, (uv[:, 1] - K[1, 2]) / fy], axis=-1)

    n = X.shape[0]
    if method == "epnp":
        sets = sample_minimal_sets(key, num_hyps, n, 5, mask)
        R, t = jax.vmap(lambda idx: _fit_epnp5(X, xn, idx))(sets)
        R = R.reshape(-1, 3, 3)  # (2*M, 3, 3): both beta cases compete
        t = t.reshape(-1, 3)
    elif method == "p6p":
        sets = sample_minimal_sets(key, num_hyps, n, 6, mask)
        R, t = jax.vmap(lambda idx: _fit_p6p(X, xn, idx))(sets)  # (M,3,3), (M,3)
    else:
        raise ValueError(f"unknown pnp method {method!r}")
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
