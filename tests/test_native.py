"""Native C++ scene-graph core vs the pure-Python fallback: exact equality."""

import numpy as np
import pytest

from monocularsfm_tpu import native
from monocularsfm_tpu.reconstruction import SceneGraph, Map
from monocularsfm_tpu.utils.synthetic import camera_ring_scene

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


def _make_state(seed=0, num_cameras=6, num_points=300, register=(0, 1, 2)):
    scene = camera_ring_scene(num_cameras=num_cameras, num_points=num_points, seed=seed)
    rng = np.random.default_rng(seed)
    keypoints = {}
    kpt_of = {}
    for c in range(num_cameras):
        vis = np.nonzero(scene.visible[c])[0]
        keypoints[c] = scene.observations[c][vis].astype(np.float32)
        inv = np.full(num_points, -1, np.int64)
        inv[vis] = np.arange(len(vis))
        kpt_of[c] = inv
    matches = {}
    for i in range(num_cameras):
        for j in range(i + 1, num_cameras):
            common = np.nonzero(scene.visible[i] & scene.visible[j])[0]
            if len(common) < 10:
                continue
            matches[(i, j)] = np.stack(
                [kpt_of[i][common], kpt_of[j][common]], 1
            ).astype(np.int32)
    g = SceneGraph().load(matches, {c: len(keypoints[c]) for c in keypoints})

    def build_map(use_native):
        m = Map(scene.K)
        for c in range(num_cameras):
            m.load_image(c, f"im{c}", keypoints[c])
        m.attach_scene_graph(g, use_native=use_native)
        for c in register:
            m.add_image_pose(c, scene.R[c], scene.t[c])
        # Create some 3D points on the first two images' shared features.
        pairs = g.find_correspondences_between_images(0, 1)
        for row in range(0, len(pairs), 3):
            k0, k1 = int(pairs[row, 0]), int(pairs[row, 1])
            if m.images[0].point3D[k0] >= 0 or m.images[1].point3D[k1] >= 0:
                continue
            # Which world point is this? invert kpt_of.
            p_world = np.nonzero(kpt_of[0] == k0)[0][0]
            m.add_point3d(scene.points[p_world], [(0, k0), (1, k1)])
        return m

    return build_map, scene


class TestNativeParity:
    def test_get_2d3d_matches_python(self):
        build_map, _ = _make_state()
        m_nat = build_map(use_native=True)
        m_py = build_map(use_native=False)
        assert m_nat._native is not None and m_py._native is None
        for image_id in (2, 3, 4):
            k_n, p_n, uv_n, xyz_n = m_nat.get_2d3d(image_id)
            k_p, p_p, uv_p, xyz_p = m_py.get_2d3d(image_id)
            np.testing.assert_array_equal(k_n, k_p)
            np.testing.assert_array_equal(p_n, p_p)
            np.testing.assert_allclose(uv_n, uv_p)

    def test_triangulation_tracks_match_python(self):
        build_map, _ = _make_state()
        m_nat = build_map(use_native=True)
        m_py = build_map(use_native=False)
        for image_id in (1, 2):
            tr_n = m_nat.get_triangulation_tracks(image_id)
            tr_p = m_py.get_triangulation_tracks(image_id)
            assert len(tr_n) == len(tr_p)
            for (kn, tn), (kp, tp) in zip(tr_n, tr_p):
                assert kn == kp
                assert set(tn) == set(tp)

    def test_mirror_consistency_after_mutations(self):
        build_map, _ = _make_state()
        m = build_map(use_native=True)
        g = m.scene_graph
        # Delete a point and check the node mirror went back to -1.
        pid = int(m.point_ids()[0])
        track = list(m.track(pid))
        m.delete_point3d(pid)
        for image_id, kpt in track:
            node = g._node_offset[image_id] + kpt
            assert m._node_p3d[node] == -1
        m.debug_check()
