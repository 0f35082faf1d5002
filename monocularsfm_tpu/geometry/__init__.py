"""Batched differentiable geometry — the most reused math in the system.

Reference parity: src/Reconstruction/Projection.cpp (projection, reprojection
error, parallax), src/Reconstruction/Triangulator.cpp (multi-view DLT), and
the Rodrigues conversions OpenCV supplies to the reference.  Everything here
is pure jnp, shaped for vmap/jit, and unit-tested against closed-form ground
truth (tests/test_geometry.py).
"""

from monocularsfm_tpu.geometry.rotations import (
    angle_axis_to_matrix,
    matrix_to_angle_axis,
    matrix_to_quaternion,
    quaternion_to_matrix,
)
from monocularsfm_tpu.geometry.projection import (
    project,
    project_points,
    calculate_reprojection_error,
    calculate_parallax_angle_deg,
    has_positive_depth,
    camera_center,
)
from monocularsfm_tpu.geometry.triangulation import (
    triangulate_two_view,
    triangulate_n_view,
)

__all__ = [
    "angle_axis_to_matrix",
    "matrix_to_angle_axis",
    "matrix_to_quaternion",
    "quaternion_to_matrix",
    "project",
    "project_points",
    "calculate_reprojection_error",
    "calculate_parallax_angle_deg",
    "has_positive_depth",
    "camera_center",
    "triangulate_two_view",
    "triangulate_n_view",
]
