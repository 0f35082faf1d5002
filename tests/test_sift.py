"""SIFT quality: cross-view match consistency, cv2 repeatability, invariances."""

import numpy as np
import pytest
import jax.numpy as jnp

from monocularsfm_tpu.ops.sift import SIFT
from monocularsfm_tpu.ops.matching import match_descriptors_pair, matches_to_pairs
from monocularsfm_tpu.utils.synthetic import render_textured_images


@pytest.fixture(scope="module")
def rendered():
    imgs, K, R, t = render_textured_images(
        num_cameras=3, width=320, height=240, arc_deg=30.0, scene_seed=5
    )
    return imgs, K, R, t


@pytest.fixture(scope="module")
def sift():
    return SIFT(num_features=1500, k_per_octave=1024)


def _match(d1, d2, cap=2048):
    da = np.zeros((cap, 128), np.float32)
    db = np.zeros((cap, 128), np.float32)
    ma = np.zeros(cap, bool)
    mb = np.zeros(cap, bool)
    da[: len(d1)] = d1
    db[: len(d2)] = d2
    ma[: len(d1)] = True
    mb[: len(d2)] = True
    idx = match_descriptors_pair(
        jnp.asarray(da), jnp.asarray(db), jnp.asarray(ma), jnp.asarray(mb),
        ratio=0.8, max_distance=0.7, col_tile=256,
    )
    return matches_to_pairs(idx)


class TestSift:
    def test_cross_view_matches_follow_geometry(self, rendered, sift):
        """Matches between two views of the textured plane must satisfy the
        ground-truth homography induced by the plane."""
        imgs, K, R, t = rendered
        kp1, d1 = sift.extract(imgs[0])
        kp2, d2 = sift.extract(imgs[1])
        assert len(kp1) > 300 and len(kp2) > 300
        i, j = _match(d1, d2)
        assert len(i) > 80, f"only {len(i)} matches"
        # Ground-truth homography for plane z=0 (world): H = K (R2 - t2 n^T
        # / d) R1^-1 K^-1 expressed via relative pose of cam1->cam2.
        R12 = R[1] @ R[0].T
        t12 = t[1] - R12 @ t[0]
        # Plane z=0 world in cam-1 frame: n_c = R1 @ [0,0,1], d_c = distance.
        n_w = np.array([0.0, 0.0, 1.0])
        n_c = R[0] @ n_w
        C1 = -R[0].T @ t[0]
        d_c = abs(float(n_w @ C1))  # plane passes through origin
        H = K @ (R12 + np.outer(t12, n_c) / d_c) @ np.linalg.inv(K)
        p1 = np.c_[kp1[i, :2], np.ones(len(i))]
        proj = p1 @ H.T
        proj = proj[:, :2] / proj[:, 2:]
        err = np.linalg.norm(proj - kp2[j, :2], axis=1)
        inlier_frac = (err < 3.0).mean()
        assert inlier_frac > 0.8, f"homography inlier fraction {inlier_frac:.2f}"

    def test_repeatability_vs_opencv(self, rendered, sift):
        cv2 = __import__("cv2")
        imgs, *_ = rendered
        kp, _ = sift.extract(imgs[0])
        cv_kp = cv2.SIFT_create(nfeatures=1500).detect(imgs[0], None)
        cv_xy = np.array([k.pt for k in cv_kp])
        assert len(cv_xy) > 100
        # Fraction of cv2 keypoints that we also detect within 2 px.
        d = np.linalg.norm(cv_xy[:, None, :] - kp[None, :, :2], axis=2)
        repeat = (d.min(axis=1) < 2.0).mean()
        assert repeat > 0.9, f"repeatability vs OpenCV {repeat:.2f}"

    def test_match_count_parity_vs_opencv(self, rendered, sift):
        """End-to-end detector+descriptor quality: cross-view verified match
        counts on the rendered scene must reach OpenCV SIFT's (the metric
        registration rate actually depends on — SURVEY hard part #2)."""
        cv2 = __import__("cv2")
        imgs, *_ = rendered
        kp1, d1 = sift.extract(imgs[0])
        kp2, d2 = sift.extract(imgs[1])
        ours_i, ours_j = _match(d1, d2)

        cv_sift = cv2.SIFT_create(nfeatures=1500)
        ck1, cd1 = cv_sift.detectAndCompute(imgs[0], None)
        ck2, cd2 = cv_sift.detectAndCompute(imgs[1], None)
        # RootSIFT-normalise cv2's descriptors so both go through the SAME
        # matcher with the same thresholds.
        def rootsift(d):
            d = d / np.maximum(np.abs(d).sum(axis=1, keepdims=True), 1e-12)
            return np.sqrt(d).astype(np.float32)
        cv_i, cv_j = _match(rootsift(cd1), rootsift(cd2))
        assert len(ours_i) >= 0.8 * len(cv_i), (
            f"ours {len(ours_i)} matches vs cv2 {len(cv_i)}"
        )

    def test_num_features_cap_by_scale(self, rendered):
        imgs, *_ = rendered
        s_small = SIFT(num_features=200, k_per_octave=1024)
        kp, desc = s_small.extract(imgs[0])
        assert len(kp) == 200 and len(desc) == 200
        # Kept the *largest* scales (reference top-scale policy).
        s_full = SIFT(num_features=5000, k_per_octave=1024)
        kp_full, _ = s_full.extract(imgs[0])
        assert kp[:, 2].min() >= np.percentile(kp_full[:, 2], 70)

    def test_descriptor_rootsift_norms(self, rendered, sift):
        imgs, *_ = rendered
        _, desc = sift.extract(imgs[0])
        # RootSIFT: unit L2 and non-negative.
        np.testing.assert_allclose(np.linalg.norm(desc, axis=1), 1.0, atol=1e-4)
        assert (desc >= 0).all()
