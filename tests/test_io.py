"""Export round trips: COLMAP text (write+read+resume), PLY, OpenMVS binary."""

import numpy as np
import pytest

from monocularsfm_tpu.reconstruction.map_state import Map
from monocularsfm_tpu.io.colmap import write_colmap, read_colmap, map_from_colmap
from monocularsfm_tpu.io.ply import write_ply, write_ply_binary, read_ply
from monocularsfm_tpu.io.openmvs import write_openmvs, read_openmvs_summary


@pytest.fixture
def small_map(ring_scene):
    s = ring_scene
    m = Map(s.K)
    n_img, n_pts = 4, 60
    for i in range(n_img):
        m.load_image(i, f"img_{i:04d}.jpg", s.observations[i][:200],
                     colors=np.full((200, 3), [10, 20, 30], np.uint8))
        m.add_image_pose(i, s.R[i], s.t[i])
    for p in range(n_pts):
        if all(s.visible[i, p] for i in range(n_img)):
            m.add_point3d(s.points[p], [(i, p) for i in range(n_img)])
    return m


class TestColmap:
    def test_round_trip(self, small_map, tmp_path):
        write_colmap(small_map, tmp_path, width=1024, height=768)
        model = read_colmap(tmp_path)
        assert model["cameras"][1]["model"] == "PINHOLE"
        assert len(model["images"]) == 4
        assert len(model["points"]) == small_map.num_points3D
        # Pose round trip.
        for i, im in model["images"].items():
            np.testing.assert_allclose(im["R"], small_map.images[i].R, atol=1e-5)
            np.testing.assert_allclose(im["t"], small_map.images[i].t, atol=1e-6)
        # Track round trip + 2D->3D backpointers.
        for pid, pt in model["points"].items():
            assert set(pt["track"]) == set(small_map.track(pid))

    def test_resume_from_checkpoint(self, small_map, tmp_path):
        write_colmap(small_map, tmp_path, width=1024, height=768)
        restored = map_from_colmap(tmp_path)
        assert restored.num_points3D == small_map.num_points3D
        assert len(restored.registered_ids) == 4
        restored.debug_check()
        st_a = small_map.statistics()
        st_b = restored.statistics()
        assert abs(st_a.mean_reprojection_error - st_b.mean_reprojection_error) < 1e-4


class TestPly:
    def test_ascii_and_binary(self, small_map, tmp_path):
        write_ply(small_map, tmp_path / "a.ply")
        write_ply_binary(small_map, tmp_path / "b.ply")
        xa, ca = read_ply(tmp_path / "a.ply")
        xb, cb = read_ply(tmp_path / "b.ply")
        assert len(xa) == small_map.num_points3D
        np.testing.assert_allclose(xa, xb, atol=1e-5)
        np.testing.assert_array_equal(ca, cb)
        # BGR -> RGB flip happened.
        assert tuple(ca[0]) == (30, 20, 10)


class TestOpenMVS:
    def test_writer_structure(self, small_map, tmp_path):
        p = tmp_path / "scene.mvs"
        write_openmvs(small_map, p, width=1024, height=768, image_dir="imgs")
        info = read_openmvs_summary(p)
        assert info["version"] == 2
        assert info["platforms"] == 1
        assert info["images"] == 4
        assert info["vertices"] == small_map.num_points3D
        raw = p.read_bytes()
        assert raw[:4] == b"MVSI"
