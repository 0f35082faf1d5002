"""Mid-run checkpoint + resume: kill a reconstruction half-way, restore,
finish, and match the uninterrupted result."""

import numpy as np
import pytest

from monocularsfm_tpu.config import SfMConfig
from monocularsfm_tpu.reconstruction import MapBuilder
from monocularsfm_tpu.utils.synthetic import camera_ring_scene
from tests.test_map_builder import scene_to_matches


@pytest.mark.slow
def test_snapshot_and_resume(tmp_path):
    scene = camera_ring_scene(num_cameras=8, num_points=300, seed=5, arc_deg=140.0)
    keypoints, matches = scene_to_matches(scene, noise_px=0.2, outlier_frac=0.02)

    def make_builder():
        cfg = SfMConfig()
        cfg.camera.fx = scene.K[0, 0]
        cfg.camera.fy = scene.K[1, 1]
        cfg.camera.cx = scene.K[0, 2]
        cfg.camera.cy = scene.K[1, 2]
        cfg.map_builder.snapshot_every_registrations = 2
        cfg.map_builder.snapshot_dir = str(tmp_path / "snap")
        b = MapBuilder(cfg)
        b._log = lambda *a: None
        b.setup(matches, keypoints)
        return b

    # Run 1: interrupt after 4 registrations (simulated crash via exception).
    b1 = make_builder()

    calls = {"n": 0}
    orig = b1.try_register

    def bomb(image_id):
        ok = orig(image_id)
        if ok and len(b1.map.registered_ids) >= 5:
            raise KeyboardInterrupt
        return ok

    b1.try_register = bomb
    with pytest.raises(KeyboardInterrupt):
        b1.do_build()
    assert (tmp_path / "snap" / "images.txt").exists()

    # Run 2: fresh builder restores the snapshot and completes.
    b2 = make_builder()
    b2.resume_from(tmp_path / "snap")
    assert len(b2.map.registered_ids) >= 2
    b2.map.debug_check()
    summary = b2.do_build()
    assert summary.num_registered == 8
    assert summary.mean_reprojection_error < 1.0
