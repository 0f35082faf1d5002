"""monocularsfm_tpu — a TPU-native incremental Structure-from-Motion engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
nebula-beta/MonocularSfM (COLMAP-style incremental SfM):

    extract SIFT -> match -> geometric verification -> incremental
    reconstruction (init / PnP-register / triangulate / bundle-adjust)
    -> export point cloud + poses.

Design stance (see SURVEY.md section 7): the host orchestrates the inherently
sequential incremental loop; the device executes all O(N*D), O(pairs),
O(points), O(residuals) math as batched, fixed-shape, masked computations.
State is struct-of-arrays with capacity padding, because XLA wants static
shapes while the incremental loop constantly grows and shrinks sets.
"""

__version__ = "0.1.0"

import jax as _jax

# TPU MXUs contract f32 operands in bf16 by default.  Geometry code is
# littered with small contractions whose 0.4% bf16 rounding is catastrophic
# (pose polish, eigh/svd/solve internals — round-4 triage measured PnP
# registration residuals of ~2 px on TPU vs 0.45 px on CPU from this alone),
# and the explicit Precision.HIGHEST annotations cannot reach the matmuls
# inside jnp.linalg decompositions.  Default the whole package to f32
# three-pass precision; the deliberate bf16 fast paths (descriptor matmuls
# in ops/matching + the Pallas matcher) cast their operands to bf16
# explicitly, which the default does not upcast.
_jax.config.update("jax_default_matmul_precision", "float32")

from monocularsfm_tpu import types  # noqa: F401
