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

# Persistent XLA compilation cache: remote TPU compiles cost 20-40 s per
# shape over the axon tunnel; without a disk cache every fresh process pays
# them again.  Respect an explicit user setting.
if _jax.config.jax_compilation_cache_dir is None:
    import pathlib as _pathlib

    _jax.config.update(
        "jax_compilation_cache_dir",
        str(_pathlib.Path.home() / ".cache" / "monocularsfm_tpu_xla"),
    )

from monocularsfm_tpu import types  # noqa: F401
