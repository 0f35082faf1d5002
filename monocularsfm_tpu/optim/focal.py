"""Shared-focal refinement (the reference's refine_focal_length option).

Reference parity: CeresBundleOptimizer.cpp:76-121 adds one global focal[2]
(fx, fy) parameter block shared by every residual when refine_focal_length
is set (default off, CeresBundleOptimizer.h:19-22).

TPU-native formulation: rather than widening the Schur system by two global
columns (which would couple every point block), we alternate — a full
pose/point LM solve at fixed K, then a closed-form damped Gauss-Newton step
on (fx, fy) with poses/points fixed (the 2x2 normal equations have an exact
solution), repeated for a few outer rounds.  Block coordinate descent on
(poses+points | focal); converges to the same stationary point for the
mild focal errors this option exists to absorb.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from monocularsfm_tpu.optim.ba import BundleProblem, bundle_adjust

_HIGHEST = jax.lax.Precision.HIGHEST


@jax.jit
def _focal_step(prob: BundleProblem):
    """One damped GN step on (fx, fy) at fixed poses/points."""
    K = prob.K
    w = (
        prob.obs_valid
        & prob.point_valid[:, None]
        & prob.cam_valid[prob.obs_cam]
    ).astype(jnp.float32)
    R_obs = prob.R[prob.obs_cam]
    t_obs = prob.t[prob.obs_cam]
    p = jnp.einsum("ptij,pj->pti", R_obs, prob.X, precision=_HIGHEST) + t_obs
    z = jnp.where(jnp.abs(p[..., 2]) < 1e-6, 1e-6, p[..., 2])
    xn = p[..., 0] / z
    yn = p[..., 1] / z
    ru = (K[0] * xn + K[2] - prob.obs_uv[..., 0]) * w
    rv = (K[1] * yn + K[3] - prob.obs_uv[..., 1]) * w
    # d ru / d fx = xn ; d rv / d fy = yn (independent 1-D problems).
    a11 = jnp.sum((xn * w) ** 2)
    a22 = jnp.sum((yn * w) ** 2)
    g1 = jnp.sum(ru * xn * w)
    g2 = jnp.sum(rv * yn * w)
    damp = 1e-6
    dfx = -g1 / jnp.maximum(a11 * (1 + damp), 1e-12)
    dfy = -g2 / jnp.maximum(a22 * (1 + damp), 1e-12)
    K_new = K.at[0].add(dfx).at[1].add(dfy)
    return K_new


def bundle_adjust_refine_focal(
    prob: BundleProblem,
    outer_iters: int = 3,
    max_iterations: int = 50,
    **kwargs,
):
    """Shared-focal bundle adjustment.

    Delegates to the joint solver (bundle_adjust(refine_focal=True)), which
    carries the two global focal columns inside the Schur-reduced camera
    system — block-coordinate alternation (the earlier design here) crawls
    along the f/Z valley and is kept only as _focal_step for diagnostics.
    """
    del outer_iters  # kept for API compatibility
    return bundle_adjust(
        prob, max_iterations=max_iterations, refine_focal=True, **kwargs
    )
