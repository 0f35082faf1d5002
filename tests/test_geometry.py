"""Unit tests for the batched geometry layer against closed-form ground truth.

Mirrors the numerics of reference src/Reconstruction/Projection.cpp and
Triangulator.cpp (see docstrings in monocularsfm_tpu/geometry/)."""

import numpy as np
import jax.numpy as jnp
import pytest

from monocularsfm_tpu.geometry import (
    angle_axis_to_matrix,
    matrix_to_angle_axis,
    matrix_to_quaternion,
    quaternion_to_matrix,
    project,
    calculate_reprojection_error,
    calculate_parallax_angle_deg,
    has_positive_depth,
    camera_center,
    triangulate_two_view,
    triangulate_n_view,
)
from monocularsfm_tpu.geometry.rotations import angle_axis_rotate_point


def random_rotations(rng, n):
    aa = rng.normal(size=(n, 3))
    aa *= rng.uniform(0, np.pi, size=(n, 1)) / np.linalg.norm(aa, axis=1, keepdims=True)
    return aa


class TestRotations:
    def test_round_trip_angle_axis(self, rng):
        aa = random_rotations(rng, 64)
        R = angle_axis_to_matrix(jnp.asarray(aa))
        aa2 = matrix_to_angle_axis(R)
        np.testing.assert_allclose(np.asarray(aa2), aa, atol=1e-5)

    def test_matrix_orthonormal(self, rng):
        aa = random_rotations(rng, 32)
        R = np.asarray(angle_axis_to_matrix(jnp.asarray(aa)))
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-6)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-6)

    def test_small_angle_stable(self):
        aa = jnp.array([[1e-10, 0, 0], [0.0, 0.0, 0.0]])
        R = angle_axis_to_matrix(aa)
        np.testing.assert_allclose(np.asarray(R), np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-7)

    def test_quaternion_round_trip(self, rng):
        aa = random_rotations(rng, 64)
        R = angle_axis_to_matrix(jnp.asarray(aa))
        q = matrix_to_quaternion(R)
        R2 = quaternion_to_matrix(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
        # w >= 0 canonical sign
        assert np.all(np.asarray(q)[:, 0] >= 0)

    def test_angle_axis_rotate_point_matches_matrix(self, rng):
        aa = random_rotations(rng, 16)
        pts = rng.normal(size=(16, 3))
        R = angle_axis_to_matrix(jnp.asarray(aa))
        out1 = np.einsum("nij,nj->ni", np.asarray(R), pts)
        out2 = np.asarray(angle_axis_rotate_point(jnp.asarray(aa), jnp.asarray(pts)))
        np.testing.assert_allclose(out2, out1, atol=1e-5)


class TestProjection:
    def test_project_matches_manual(self, ring_scene):
        s = ring_scene
        uv = project(
            jnp.asarray(s.K), jnp.asarray(s.R[:, None]), jnp.asarray(s.t[:, None]),
            jnp.asarray(s.points[None]),
        )
        np.testing.assert_allclose(np.asarray(uv), s.observations, atol=1e-3)

    def test_reprojection_error_zero_on_exact(self, ring_scene):
        s = ring_scene
        err = calculate_reprojection_error(
            jnp.asarray(s.K), jnp.asarray(s.R[:, None]), jnp.asarray(s.t[:, None]),
            jnp.asarray(s.points[None]), jnp.asarray(s.observations),
        )
        assert float(np.asarray(err)[s.visible].max()) < 1e-3

    def test_positive_depth(self, ring_scene):
        s = ring_scene
        pd = has_positive_depth(
            jnp.asarray(s.R[:, None]), jnp.asarray(s.t[:, None]), jnp.asarray(s.points[None])
        )
        # All visible points must have positive depth.
        assert np.all(np.asarray(pd)[s.visible])

    def test_camera_center(self, ring_scene):
        s = ring_scene
        C = np.asarray(camera_center(jnp.asarray(s.R), jnp.asarray(s.t)))
        # x_cam of the center must be 0.
        xc = np.einsum("cij,cj->ci", s.R, C) + s.t
        np.testing.assert_allclose(xc, 0, atol=1e-5)

    def test_parallax_angle(self):
        # Equilateral configuration: 60 degrees exactly.
        C1 = jnp.array([0.0, 0.0, 0.0])
        C2 = jnp.array([1.0, 0.0, 0.0])
        X = jnp.array([0.5, np.sqrt(3) / 2, 0.0])
        ang = calculate_parallax_angle_deg(C1, C2, X)
        np.testing.assert_allclose(float(ang), 60.0, atol=1e-4)
        # Degenerate: X at a camera center -> 0, not NaN.
        ang0 = calculate_parallax_angle_deg(C1, C2, C1)
        assert float(ang0) == 0.0
        # Obtuse gets folded to <= 90 (reference Projection.cpp:188-192).
        Xmid = jnp.array([0.5, 0.05, 0.0])
        angm = calculate_parallax_angle_deg(C1, C2, Xmid)
        assert float(angm) <= 90.0


class TestTriangulation:
    def test_two_view_exact(self, ring_scene):
        s = ring_scene
        Kinv = np.linalg.inv(s.K)
        i, j = 0, 5
        vis = s.visible[i] & s.visible[j]
        uv1 = s.observations[i][vis]
        uv2 = s.observations[j][vis]
        xn1 = (np.concatenate([uv1, np.ones((len(uv1), 1))], axis=1) @ Kinv.T)[:, :2]
        xn2 = (np.concatenate([uv2, np.ones((len(uv2), 1))], axis=1) @ Kinv.T)[:, :2]
        X = triangulate_two_view(
            jnp.asarray(s.R[i]), jnp.asarray(s.t[i]),
            jnp.asarray(s.R[j]), jnp.asarray(s.t[j]),
            jnp.asarray(xn1), jnp.asarray(xn2),
        )
        np.testing.assert_allclose(np.asarray(X), s.points[vis], atol=5e-2)

    def test_n_view_masked(self, ring_scene):
        s = ring_scene
        Kinv = np.linalg.inv(s.K)
        vis_all = s.visible.all(axis=0)
        idx = np.where(vis_all)[0][:100]
        uv = s.observations[:, idx]  # (C, P, 2)
        ones = np.ones(uv.shape[:-1] + (1,))
        xn = (np.concatenate([uv, ones], axis=-1) @ Kinv.T)[..., :2]
        C = s.num_cameras
        P = len(idx)
        # Mask out half the views for half the points; result should still be exact.
        mask = np.ones((P, C), dtype=bool)
        mask[: P // 2, C // 2:] = False
        X = triangulate_n_view(
            jnp.asarray(np.broadcast_to(s.R, (P, C, 3, 3))),
            jnp.asarray(np.broadcast_to(s.t, (P, C, 3))),
            jnp.asarray(np.transpose(xn, (1, 0, 2))),
            jnp.asarray(mask),
        )
        np.testing.assert_allclose(np.asarray(X), s.points[idx], atol=5e-2)


class TestSimilarityAlign:
    def test_umeyama_recovers_transform(self, rng):
        from monocularsfm_tpu.utils.synthetic import similarity_align

        src = rng.normal(size=(50, 3))
        aa = random_rotations(rng, 1)[0]
        R = np.asarray(angle_axis_to_matrix(jnp.asarray(aa)))
        s, t = 2.5, np.array([1.0, -2.0, 0.5])
        dst = s * src @ R.T + t
        (s2, R2, t2), rms = similarity_align(src, dst)
        assert rms < 1e-6
        np.testing.assert_allclose(s2, s, atol=1e-6)
