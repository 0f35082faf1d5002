"""Landmark-sharded distributed bundle adjustment.

The SPMD design (SURVEY.md section 2, parallelism plan (d)): each chip owns
a slab of landmarks and their observations; cameras are replicated.  Every
LM iteration each chip computes its residuals, Jacobian blocks, point
(V, g_p) blocks and its *contribution* to the reduced camera system; the
camera-side quantities (U, rhs, Schur S, cost, predicted reduction) are
psum-reduced over ICI, the replicated dense solve happens identically on
every chip, and point back-substitution is purely local.  One collective-
synchronised lax.while_loop drives the whole optimisation with zero host
round-trips.

The math lives in optim/ba.py (bundle_adjust_impl with axis_name); this
module owns the mesh plumbing: padding the point axis to the mesh size,
sharding specs, and shard_map invocation.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from monocularsfm_tpu.optim.ba import BundleProblem, bundle_adjust_impl


def _pad_points(prob: BundleProblem, multiple: int) -> BundleProblem:
    Pn = prob.X.shape[0]
    target = ((Pn + multiple - 1) // multiple) * multiple
    pad = target - Pn
    if pad == 0:
        return prob
    return BundleProblem(
        K=prob.K,
        R=prob.R,
        t=prob.t,
        X=jnp.pad(prob.X, ((0, pad), (0, 0))),
        cam_valid=prob.cam_valid,
        cam_const=prob.cam_const,
        point_valid=jnp.pad(prob.point_valid, (0, pad)),
        obs_cam=jnp.pad(prob.obs_cam, ((0, pad), (0, 0))),
        obs_uv=jnp.pad(prob.obs_uv, ((0, pad), (0, 0), (0, 0))),
        obs_valid=jnp.pad(prob.obs_valid, ((0, pad), (0, 0))),
    )


def distributed_bundle_adjust(
    prob: BundleProblem,
    mesh: Mesh,
    max_iterations: int = 50,
    solve_mode: str = "dense",
    **kwargs,
):
    """Run LM with the point/observation axis sharded over `mesh`.

    Returns the same dict as bundle_adjust (X gathered back to full size).
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    orig_P = prob.X.shape[0]
    prob = _pad_points(prob, n_dev)

    pt = P(axis)          # shard axis 0 (points / observations)
    rep = P()             # replicated
    in_specs = BundleProblem(
        K=rep, R=rep, t=rep,
        X=pt,
        cam_valid=rep, cam_const=rep,
        point_valid=pt,
        obs_cam=pt, obs_uv=pt, obs_valid=pt,
    )
    out_specs = {
        "R": rep, "t": rep, "X": pt, "K": rep,
        "cost_initial": rep, "cost_final": rep, "iterations": rep,
        "rmse_initial": rep, "rmse_final": rep, "mean_reproj_error": rep,
        "num_residuals": rep,
    }

    fn = jax.jit(
        jax.shard_map(
            functools.partial(
                bundle_adjust_impl,
                max_iterations=max_iterations,
                solve_mode=solve_mode,
                axis_name=axis,
                **kwargs,
            ),
            mesh=mesh,
            in_specs=(in_specs,),
            out_specs=out_specs,
        )
    )
    out = fn(prob)
    out["X"] = out["X"][:orig_P]
    return out
