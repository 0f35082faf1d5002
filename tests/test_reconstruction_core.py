"""SceneGraph / RegisterGraph / Map unit tests + undistortion."""

import numpy as np
import pytest

from monocularsfm_tpu.reconstruction import SceneGraph, RegisterGraph, Map
from monocularsfm_tpu.ops.undistort import undistort_pixels, distort
import jax.numpy as jnp


class TestSceneGraph:
    def _toy(self):
        # 3 images, 4 keypoints each. Feature chains:
        #  (0,0)-(1,0)-(2,0)  long track;  (0,1)-(1,1)  two-view.
        matches = {
            (0, 1): np.array([[0, 0], [1, 1], [2, 3]], np.int32),
            (1, 2): np.array([[0, 0], [2, 2]], np.int32),
        }
        nk = {0: 4, 1: 4, 2: 4}
        return SceneGraph().load(matches, nk, min_num_matches=2)

    def test_correspondences(self):
        g = self._toy()
        imgs, kpts = g.find_correspondences(1, 0)
        assert set(zip(imgs.tolist(), kpts.tolist())) == {(0, 0), (2, 0)}
        pairs = g.find_correspondences_between_images(0, 1)
        assert pairs.shape == (3, 2)
        pairs_r = g.find_correspondences_between_images(1, 0)
        np.testing.assert_array_equal(pairs[:, 0], pairs_r[:, 1])

    def test_two_view_observation(self):
        g = self._toy()
        assert g.is_two_view_observation(0, 1)      # only (0,1)-(1,1)
        assert not g.is_two_view_observation(1, 0)  # part of a 3-chain

    def test_two_view_observation_skipped_in_triangulation_feed(self):
        # Reference Map.cpp:450-452: a feature matched in exactly one pair
        # (both endpoints degree 1) must never enter the triangulation
        # work list — in the python fallback AND the native path.
        g = self._toy()
        K = np.array([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]])
        kps = np.array([[10, 10], [20, 20], [30, 30], [40, 40]], np.float32)
        from monocularsfm_tpu import native as native_mod

        for use_native in ([False, True] if native_mod.available() else [False]):
            m = Map(K)
            for i in range(3):
                m.load_image(i, f"im{i}", kps)
            m.attach_scene_graph(g, use_native=use_native)
            for i in range(3):
                m.add_image_pose(i, np.eye(3), np.array([float(i), 0.0, 0.0]))
            for image_id in range(3):
                for seed_kpt, track in m.get_triangulation_tracks(image_id):
                    assert (image_id, seed_kpt) != (0, 1)
                    assert (image_id, seed_kpt) != (1, 1)
                    assert (0, 1) not in track and (1, 1) not in track

    def test_min_num_matches_prunes(self):
        matches = {
            (0, 1): np.array([[0, 0]], np.int32),
            (1, 2): np.array([[0, 0], [1, 1], [2, 2]], np.int32),
        }
        g = SceneGraph().load(matches, {0: 4, 1: 4, 2: 4}, min_num_matches=3)
        assert (0, 1) not in g.pair_matches and (1, 2) in g.pair_matches

    def test_counts(self):
        g = self._toy()
        assert g.num_correspondences(1) == 3 + 2
        assert g.num_observations_of_image(1) == 4  # kpts 0,1,3 (pair 0-1) + 2 (pair 1-2)


class TestRegisterGraph:
    def test_two_bucket_ordering(self):
        # Mirrors UnitTest/RegisterGraphTest.cpp: 5 nodes, register 0 and 1;
        # candidates sorted by registered-neighbor count desc, fresh first.
        g = RegisterGraph(max_trials=3)
        for a, b in [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (3, 4)]:
            g.add_edge(a, b)
        g.set_registered(0)
        g.set_registered(1)
        ids = g.get_next_image_ids()
        assert ids[0] == 2  # two registered neighbors
        assert ids[1] == 3  # one
        assert 4 not in ids  # zero registered neighbors
        # A failed trial moves an image to the retry bucket.
        g.add_trial(2)
        ids2 = g.get_next_image_ids()
        assert ids2[0] == 3 and ids2[-1] == 2
        # Exhausted budget drops it.
        g.add_trial(2)
        g.add_trial(2)
        assert 2 not in g.get_next_image_ids()

    def test_registered_neighbor_counts(self):
        g = RegisterGraph()
        g.add_edge(0, 1)
        g.add_edge(0, 2)
        g.set_registered(0)
        g.set_registered(0)  # idempotent
        assert g.num_registered_neighbor[1] == 1
        assert g.num_registered() == 1


class TestUndistort:
    def test_round_trip(self, rng):
        K = np.array([[800.0, 0, 320], [0, 810.0, 240], [0, 0, 1]])
        dist = np.array([-0.02, 0.004, 1e-4, -2e-4], np.float32)
        xn = rng.uniform(-0.4, 0.4, size=(500, 2)).astype(np.float32)
        xd = distort(jnp.asarray(xn), jnp.asarray(dist))
        xu = np.asarray(
            undistort_pixels(
                np.asarray(xd) * [800, 810] + [320, 240], K, dist
            )
        )
        expected = xn * [800, 810] + [320, 240]
        np.testing.assert_allclose(xu, expected, atol=1e-3)

    def test_matches_opencv(self, rng):
        cv2 = __import__("cv2")
        K = np.array([[900.0, 0, 512], [0, 900.0, 384], [0, 0, 1]])
        dist = np.array([-0.03, 0.01, 5e-4, -5e-4])
        uv = rng.uniform([100, 100], [900, 670], size=(200, 2)).astype(np.float64)
        ours = np.asarray(undistort_pixels(uv, K, dist))
        cv = cv2.undistortPoints(
            uv.reshape(-1, 1, 2), K, np.r_[dist, 0.0], P=K
        ).reshape(-1, 2)
        np.testing.assert_allclose(ours, cv, atol=2e-2)


class TestMap:
    def _map_with_two_images(self, ring_scene):
        s = ring_scene
        m = Map(s.K)
        for i in (0, 1):
            m.load_image(i, f"im{i}", s.observations[i][:50])
        m.add_image_pose(0, s.R[0], s.t[0])
        m.add_image_pose(1, s.R[1], s.t[1])
        return m, s

    def test_point_lifecycle(self, ring_scene):
        m, s = self._map_with_two_images(ring_scene)
        pid = m.add_point3d(s.points[0], [(0, 0), (1, 0)])
        assert m.num_points3D == 1
        assert m.images[0].point3D[0] == pid
        errs = m.reproj_errors_of_track(pid)
        assert errs.max() < 1e-3  # exact synthetic data
        m.remove_observation(pid, 0, 0)
        # Track fell below 2 -> point deleted, back-pointers cleared.
        assert m.num_points3D == 0
        assert m.images[1].point3D[0] == -1
        m.debug_check()

    def test_growth(self, ring_scene):
        m, s = self._map_with_two_images(ring_scene)
        for k in range(40):
            m.add_point3d(s.points[k], [(0, k), (1, k)])
        assert m.num_points3D == 40
        m.debug_check()
