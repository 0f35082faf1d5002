"""End-to-end incremental reconstruction on a synthetic scene.

Generates ground-truth correspondences (with outlier contamination and pixel
noise) directly — isolating the reconstruction layer from SIFT/matching —
then requires the MapBuilder loop to register every camera and recover the
trajectory up to a similarity transform.
"""

import numpy as np
import pytest

from monocularsfm_tpu.config import SfMConfig
from monocularsfm_tpu.reconstruction import MapBuilder
from monocularsfm_tpu.utils.synthetic import camera_ring_scene, similarity_align


def scene_to_matches(scene, noise_px=0.3, outlier_frac=0.05, seed=0):
    """Build per-image keypoint lists + pairwise matches from ground truth."""
    rng = np.random.default_rng(seed)
    C = scene.num_cameras
    keypoints = {}
    kpt_of_point = {}  # (cam, point) -> kpt index
    for c in range(C):
        vis = np.nonzero(scene.visible[c])[0]
        uv = scene.observations[c][vis] + rng.normal(scale=noise_px, size=(len(vis), 2))
        keypoints[c] = uv.astype(np.float32)
        for k, p in enumerate(vis):
            kpt_of_point[(c, int(p))] = k
    matches = {}
    for i in range(C):
        for j in range(i + 1, C):
            common = np.nonzero(scene.visible[i] & scene.visible[j])[0]
            if len(common) < 8:
                continue
            m = np.array(
                [[kpt_of_point[(i, int(p))], kpt_of_point[(j, int(p))]] for p in common],
                np.int32,
            )
            # Outlier contamination: rewire a fraction of matches.
            n_out = int(len(m) * outlier_frac)
            if n_out:
                rows = rng.choice(len(m), n_out, replace=False)
                m[rows, 1] = rng.integers(0, len(keypoints[j]), n_out)
            matches[(i, j)] = m
    return keypoints, matches


@pytest.mark.slow
def test_full_reconstruction():
    scene = camera_ring_scene(num_cameras=10, num_points=500, seed=21, arc_deg=150.0)
    keypoints, matches = scene_to_matches(scene)

    cfg = SfMConfig()
    cfg.camera.fx = scene.K[0, 0]
    cfg.camera.fy = scene.K[1, 1]
    cfg.camera.cx = scene.K[0, 2]
    cfg.camera.cy = scene.K[1, 2]
    builder = MapBuilder(cfg)
    builder.setup(matches, keypoints)
    summary = builder.do_build()
    print(summary)

    assert summary.num_registered == scene.num_cameras
    assert summary.num_points3D > 350
    assert summary.mean_reprojection_error < 1.0

    # Trajectory parity up to similarity (monocular gauge freedom).
    m = builder.map
    est_centers = np.array(
        [-m.images[i].R.T @ m.images[i].t for i in sorted(m.registered_ids)]
    )
    gt_centers = np.array(
        [-scene.R[i].T @ scene.t[i] for i in sorted(m.registered_ids)]
    )
    _, rms = similarity_align(est_centers, gt_centers)
    scale = np.linalg.norm(gt_centers - gt_centers.mean(0), axis=1).mean()
    assert rms / scale < 0.01, f"trajectory error {rms/scale:.4f} of scene scale"
