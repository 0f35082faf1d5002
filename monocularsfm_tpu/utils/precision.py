"""High-precision small-matrix products.

TPU MXU contracts f32 operands in bf16 by default; for the small
precision-critical products in the estimators/geometry (3x3 pose algebra,
normal equations, SVD re-projections) the ~0.4% bf16 rounding is
catastrophic — e.g. the PnP Gauss-Newton polish stalls at ~6 degrees of
rotation error on TPU while CPU reaches 0.03 degrees (round-4 triage of the
round-3 TPU quality failure).  `mm` chains jnp.matmul at Precision.HIGHEST;
the cost is irrelevant at these sizes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HIGHEST = jax.lax.Precision.HIGHEST


def mm(*ms):
    """Left-to-right matrix product at HIGHEST precision."""
    out = ms[0]
    for m in ms[1:]:
        out = jnp.matmul(out, m, precision=_HIGHEST)
    return out
