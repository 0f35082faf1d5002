"""Reconstruction with lens distortion (gerrard-hall-style k1/k2/p1/p2).

Observations are synthetically distorted; the Map must undistort once at
load (reference Map.cpp:45-69, :96-103) and the reconstruction must recover
the trajectory as if the camera were pinhole.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from monocularsfm_tpu.config import SfMConfig
from monocularsfm_tpu.ops.undistort import distort
from monocularsfm_tpu.reconstruction import MapBuilder
from monocularsfm_tpu.utils.synthetic import camera_ring_scene, similarity_align
from tests.test_map_builder import scene_to_matches

DIST = np.array([-0.08, 0.012, 4e-4, -6e-4])


def _distort_keypoints(keypoints, K):
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    out = {}
    for i, uv in keypoints.items():
        xn = np.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy], axis=-1)
        xd = np.asarray(distort(jnp.asarray(xn), jnp.asarray(DIST)))
        out[i] = np.stack(
            [xd[:, 0] * fx + cx, xd[:, 1] * fy + cy], axis=-1
        ).astype(np.float32)
    return out


@pytest.mark.slow
def test_distorted_reconstruction():
    scene = camera_ring_scene(num_cameras=8, num_points=400, seed=17, arc_deg=140.0)
    keypoints, matches = scene_to_matches(scene, noise_px=0.2, outlier_frac=0.03)
    keypoints = _distort_keypoints(keypoints, scene.K)

    cfg = SfMConfig()
    cfg.camera.fx = scene.K[0, 0]
    cfg.camera.fy = scene.K[1, 1]
    cfg.camera.cx = scene.K[0, 2]
    cfg.camera.cy = scene.K[1, 2]
    cfg.camera.k1, cfg.camera.k2, cfg.camera.p1, cfg.camera.p2 = DIST
    builder = MapBuilder(cfg)
    builder._log = lambda *a: None
    builder.setup(matches, keypoints)
    summary = builder.do_build()

    assert summary.num_registered == 8, summary
    assert summary.mean_reprojection_error < 0.8, summary

    m = builder.map
    est = np.array(
        [-m.images[i].R.T @ m.images[i].t for i in sorted(m.registered_ids)]
    )
    gt = np.array(
        [-scene.R[i].T @ scene.t[i] for i in sorted(m.registered_ids)]
    )
    _, rms = similarity_align(est, gt)
    scale = np.linalg.norm(gt - gt.mean(0), axis=1).mean()
    assert rms / scale < 0.02, f"trajectory error {rms/scale:.4f}"
