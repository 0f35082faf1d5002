"""Batched 4-point homography estimation, RANSAC, and decomposition.

Reference parity: Initializer::FindHomography uses cv::findHomography
(RANSAC, 12 px, conf 0.9999; Initializer.cpp:103-129) for the H/F model
selection, and RecoverPoseFromHomography tests every candidate from
cv::decomposeHomographyMat by triangulation support (Initializer.cpp:168-296).

The decomposition here is the Faugeras-Lustman SVD construction (the same
family as OpenCV's Malis-Vargas analytic version): 4 candidate (R, t, n)
solutions, scored downstream by cheirality exactly like the essential path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from monocularsfm_tpu.estimators.ransac import sample_minimal_sets, score_hypotheses
from monocularsfm_tpu.estimators.fundamental import _hartley_normalize
from monocularsfm_tpu.utils.precision import mm

_HIGHEST = jax.lax.Precision.HIGHEST


def _dlt_rows(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Two DLT rows per correspondence for H x1 ~ x2. (..., 2) -> (..., 2, 9)."""
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    one = jnp.ones_like(u1)
    zero = jnp.zeros_like(u1)
    r0 = jnp.stack([u1, v1, one, zero, zero, zero, -u2 * u1, -u2 * v1, -u2], axis=-1)
    r1 = jnp.stack([zero, zero, zero, u1, v1, one, -v2 * u1, -v2 * v1, -v2], axis=-1)
    return jnp.stack([r0, r1], axis=-2)


def _fit_h(x1, x2, idx=None, weights=None):
    if idx is not None:
        x1 = x1[idx]
        x2 = x2[idx]
    rows = _dlt_rows(x1, x2)  # (..., R, 2, 9)
    rows = rows.reshape(rows.shape[:-3] + (-1, 9))
    if weights is not None:
        w = jnp.repeat(weights, 2, axis=-1)
        rows = rows * w[..., None]
    AtA = jnp.einsum("...ri,...rj->...ij", rows, rows, precision=_HIGHEST)
    _, V = jnp.linalg.eigh(AtA)
    h = V[..., :, 0]
    return h.reshape(h.shape[:-1] + (3, 3))


def transfer_error(H: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Squared forward transfer error |Hx1 - x2|^2 (OpenCV RANSAC's measure).

    H: (..., 3, 3), x1/x2: (..., N, 2) -> (..., N)."""
    ones = jnp.ones(x1.shape[:-1] + (1,), x1.dtype)
    x1h = jnp.concatenate([x1, ones], axis=-1)
    y = jnp.einsum("...ij,...nj->...ni", H, x1h, precision=_HIGHEST)
    w = y[..., 2]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    proj = y[..., :2] / w[..., None]
    return jnp.sum((proj - x2) ** 2, axis=-1)


def symmetric_transfer_error(H, Hinv, x1, x2):
    return 0.5 * (transfer_error(H, x1, x2) + transfer_error(Hinv, x2, x1))


@functools.partial(jax.jit, static_argnames=("num_hyps",))
def estimate_homography_ransac(
    key: jax.Array,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    mask: jnp.ndarray,
    threshold_px: float | jnp.ndarray = 12.0,
    num_hyps: int = 2048,
):
    """RANSAC 4-point H in pixel coords. Returns dict(H, inliers, ...)."""
    x1 = x1.astype(jnp.float32)
    x2 = x2.astype(jnp.float32)
    # Hartley-normalise: the raw pixel DLT's A^T A spans ~1e11 in f32 and eigh
    # loses the nullspace entirely; in the normalised frame it is ~O(1).
    x1n, T1 = _hartley_normalize(x1, mask)
    x2n, T2 = _hartley_normalize(x2, mask)
    T2inv = jnp.linalg.inv(T2)

    def denorm(Hn):
        return mm(T2inv, Hn, T1)

    n = x1.shape[0]
    sets = sample_minimal_sets(key, num_hyps, n, 4, mask)
    H = jax.vmap(lambda idx: denorm(_fit_h(x1n, x2n, idx)))(sets)
    res = transfer_error(H, x1[None], x2[None])
    thr2 = jnp.asarray(threshold_px) ** 2
    best, inl, counts = score_hypotheses(res, mask, thr2)
    H_best = H[best]

    def refit(Hc, _):
        r = transfer_error(Hc[None], x1[None], x2[None])[0]
        w = ((r <= thr2) & mask).astype(jnp.float32)
        H2 = denorm(_fit_h(x1n, x2n, weights=w))
        c_new = jnp.sum((transfer_error(H2[None], x1[None], x2[None])[0] <= thr2) & mask)
        c_old = jnp.sum((transfer_error(Hc[None], x1[None], x2[None])[0] <= thr2) & mask)
        return jnp.where(c_new >= c_old, H2, Hc), None

    H_best, _ = jax.lax.scan(refit, H_best, None, length=2)
    res_best = transfer_error(H_best[None], x1[None], x2[None])[0]
    inliers = (res_best <= thr2) & mask
    num_inl = jnp.sum(inliers)
    H_best = H_best / jnp.where(jnp.abs(H_best[2, 2]) > 1e-12, H_best[2, 2], 1.0)
    return {
        "H": H_best,
        "inliers": inliers,
        "num_inliers": num_inl,
        "success": num_inl >= 4,
    }


def decompose_homography(H_euc: jnp.ndarray):
    """Faugeras-Lustman decomposition of a *Euclidean* homography K^-1 H K.

    Returns (R (4,3,3), t (4,3), n (4,3)) candidate motions (|t| arbitrary
    scale).  Degenerate pure-rotation case collapses all candidates to
    R = H/d2, t = 0.
    """
    U, S, Vt = jnp.linalg.svd(H_euc)
    d1, d2, d3 = S[0], S[1], S[2]
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    # Normalise by the middle singular value.
    d1n = d1 / d2
    d3n = d3 / d2
    denom = jnp.maximum(d1n ** 2 - d3n ** 2, 1e-12)
    x1m = jnp.sqrt(jnp.maximum((d1n ** 2 - 1.0) / denom, 0.0))
    x3m = jnp.sqrt(jnp.maximum((1.0 - d3n ** 2) / denom, 0.0))
    sin_t_m = (d1n - d3n) * x1m * x3m
    cos_t = d1n * x3m ** 2 + d3n * x1m ** 2

    eps = jnp.array([(1.0, 1.0), (1.0, -1.0), (-1.0, 1.0), (-1.0, -1.0)], H_euc.dtype)

    def cand(e):
        e1, e3 = e[0], e[1]
        x1, x3 = e1 * x1m, e3 * x3m
        sin_t = e1 * e3 * sin_t_m
        Rp = jnp.array(
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], H_euc.dtype
        )
        Rp = (
            Rp.at[0, 0].set(cos_t).at[0, 2].set(-sin_t)
            .at[2, 0].set(sin_t).at[2, 2].set(cos_t)
        )
        tp = (d1n - d3n) * jnp.stack([x1, jnp.zeros((), H_euc.dtype), -x3])
        npl = jnp.stack([x1, jnp.zeros((), H_euc.dtype), x3])
        R = s * mm(U, Rp, Vt)
        t = jnp.einsum("ij,j->i", U, tp, precision=_HIGHEST)
        nrm = jnp.einsum("ji,j->i", Vt, npl, precision=_HIGHEST)
        return R, t, nrm

    R, t, nvec = jax.vmap(cand)(eps)
    # Degenerate pure rotation (d1 ~ d2 ~ d3): R = s*U*Vt, t = 0.
    pure = (d1n - d3n) < 1e-5
    R_pure = s * mm(U, Vt)
    R = jnp.where(pure, jnp.broadcast_to(R_pure, R.shape), R)
    t = jnp.where(pure, jnp.zeros_like(t), t)
    return R, t, nvec
