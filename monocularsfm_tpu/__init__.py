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

from monocularsfm_tpu import types  # noqa: F401
