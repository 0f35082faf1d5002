"""RANSAC estimators (F/E/H/PnP) on synthetic scenes with outliers."""

import numpy as np
import jax
import jax.numpy as jnp

from monocularsfm_tpu.estimators import (
    estimate_fundamental_ransac,
    estimate_essential_ransac,
    estimate_homography_ransac,
    estimate_pnp_ransac,
    recover_pose_from_essential,
)
from monocularsfm_tpu.estimators.essential import pixels_to_normalized
from monocularsfm_tpu.estimators.homography import decompose_homography
from monocularsfm_tpu.utils.synthetic import camera_ring_scene


def _two_view_data(scene, i, j, cap=512, outlier_frac=0.3, noise=0.5, seed=0):
    rng = np.random.default_rng(seed)
    vis = scene.visible[i] & scene.visible[j]
    uv1 = scene.observations[i][vis]
    uv2 = scene.observations[j][vis]
    n = min(len(uv1), cap)
    uv1, uv2 = uv1[:n].copy(), uv2[:n].copy()
    if noise:
        uv1 += rng.normal(scale=noise, size=uv1.shape)
        uv2 += rng.normal(scale=noise, size=uv2.shape)
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    uv2[out_idx] = rng.uniform(0, [scene.width, scene.height], size=(n_out, 2))
    x1 = np.zeros((cap, 2), np.float32)
    x2 = np.zeros((cap, 2), np.float32)
    m = np.zeros(cap, bool)
    x1[:n], x2[:n], m[:n] = uv1, uv2, True
    gt_inlier = np.zeros(cap, bool)
    gt_inlier[:n] = True
    gt_inlier[out_idx] = False
    return x1, x2, m, gt_inlier


def _gt_F(scene, i, j):
    R = scene.R[j] @ scene.R[i].T
    t = scene.t[j] - R @ scene.t[i]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    Kinv = np.linalg.inv(scene.K)
    F = Kinv.T @ E @ Kinv
    return F / np.linalg.norm(F)


class TestFundamental:
    def test_recovers_inliers_with_outliers(self, ring_scene):
        x1, x2, m, gt = _two_view_data(ring_scene, 0, 4)
        out = estimate_fundamental_ransac(
            jax.random.PRNGKey(0), jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(m),
            threshold_px=4.0, num_hyps=1024,
        )
        inl = np.asarray(out["inliers"])
        assert bool(out["success"])
        # Finds nearly all true inliers, almost no outliers.
        assert inl[gt].mean() > 0.95
        assert inl[~gt & m].mean() < 0.05

    def test_f_matches_ground_truth(self, ring_scene):
        x1, x2, m, gt = _two_view_data(ring_scene, 0, 4, outlier_frac=0.0, noise=0.0)
        out = estimate_fundamental_ransac(
            jax.random.PRNGKey(1), jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(m),
            threshold_px=1.0, num_hyps=512,
        )
        F = np.asarray(out["F"])
        Fgt = _gt_F(ring_scene, 0, 4)
        # Up to sign.
        err = min(np.abs(F - Fgt).max(), np.abs(F + Fgt).max())
        assert err < 5e-3, err


class TestEssential:
    def test_pose_recovery(self, ring_scene):
        s = ring_scene
        i, j = 0, 4
        x1, x2, m, gt = _two_view_data(s, i, j, outlier_frac=0.2, noise=0.3)
        K = jnp.asarray(s.K.astype(np.float32))
        xn1 = pixels_to_normalized(K, jnp.asarray(x1))
        xn2 = pixels_to_normalized(K, jnp.asarray(x2))
        thr = 4.0 / float(s.K[0, 0])
        out = estimate_essential_ransac(
            jax.random.PRNGKey(2), xn1, xn2, jnp.asarray(m), thr, num_hyps=1024
        )
        assert bool(out["success"])
        R, t, X, front = recover_pose_from_essential(out["E"], xn1, xn2, out["inliers"])
        # Ground-truth relative pose cam_i -> cam_j.
        R_gt = s.R[j] @ s.R[i].T
        t_gt = s.t[j] - R_gt @ s.t[i]
        t_gt = t_gt / np.linalg.norm(t_gt)
        R_err = np.degrees(
            np.arccos(np.clip((np.trace(np.asarray(R).T @ R_gt) - 1) / 2, -1, 1))
        )
        t_est = np.asarray(t)
        t_cos = abs(float(t_est @ t_gt))
        assert R_err < 1.0, R_err
        assert t_cos > 0.999, t_cos
        # Majority of inliers triangulate in front.
        assert float(np.asarray(front).sum()) > 0.8 * float(np.asarray(out["num_inliers"]))


class TestHomography:
    def _planar_scene(self, seed=0, n=300, cap=512, noise=0.3, outlier_frac=0.2):
        rng = np.random.default_rng(seed)
        K = np.array([[800.0, 0, 320], [0, 800.0, 240], [0, 0, 1]])
        # Plane z = 5 in cam-1 frame; cam2 displaced + rotated.
        X = np.c_[rng.uniform(-2, 2, (n, 2)), np.full(n, 5.0)]
        aa = np.array([0.05, -0.12, 0.03])
        from monocularsfm_tpu.geometry import angle_axis_to_matrix

        R = np.asarray(angle_axis_to_matrix(jnp.asarray(aa)))
        t = np.array([0.4, -0.1, 0.2])
        x1 = (X / X[:, 2:]) @ K.T
        Xc2 = X @ R.T + t
        x2 = (Xc2 / Xc2[:, 2:]) @ K.T
        uv1, uv2 = x1[:, :2], x2[:, :2]
        uv1 = uv1 + rng.normal(scale=noise, size=uv1.shape)
        uv2 = uv2 + rng.normal(scale=noise, size=uv2.shape)
        n_out = int(n * outlier_frac)
        oi = rng.choice(n, n_out, replace=False)
        uv2[oi] += rng.uniform(30, 200, size=(n_out, 2))
        p1 = np.zeros((cap, 2), np.float32)
        p2 = np.zeros((cap, 2), np.float32)
        m = np.zeros(cap, bool)
        p1[:n], p2[:n], m[:n] = uv1, uv2, True
        gt = np.zeros(cap, bool)
        gt[:n] = True
        gt[oi] = False
        return K, R, t, p1, p2, m, gt

    def test_planar_ransac_and_decomposition(self):
        K, R_gt, t_gt, x1, x2, m, gt = self._planar_scene()
        out = estimate_homography_ransac(
            jax.random.PRNGKey(3), jnp.asarray(x1), jnp.asarray(x2), jnp.asarray(m),
            threshold_px=6.0, num_hyps=1024,
        )
        inl = np.asarray(out["inliers"])
        assert bool(out["success"])
        assert inl[gt].mean() > 0.9
        assert inl[~gt & m].mean() < 0.1
        # Decompose Euclidean homography; one candidate must match (R_gt, t_gt dir).
        Kj = jnp.asarray(K.astype(np.float32))
        H_euc = jnp.linalg.inv(Kj) @ out["H"].astype(jnp.float32) @ Kj
        Rs, ts, ns = decompose_homography(H_euc)
        Rs, ts = np.asarray(Rs), np.asarray(ts)
        t_dir = t_gt / np.linalg.norm(t_gt)
        best_rot = 180.0
        for c in range(4):
            r_err = np.degrees(
                np.arccos(np.clip((np.trace(Rs[c].T @ R_gt) - 1) / 2, -1, 1))
            )
            tn = ts[c] / max(np.linalg.norm(ts[c]), 1e-12)
            if r_err < best_rot and abs(float(tn @ t_dir)) > 0.99:
                best_rot = r_err
        assert best_rot < 1.0, best_rot


class TestPnP:
    def test_register_with_outliers(self, ring_scene):
        s = ring_scene
        rng = np.random.default_rng(5)
        c = 3
        vis = s.visible[c]
        X = s.points[vis]
        uv = s.observations[c][vis].copy()
        n = len(X)
        uv += rng.normal(scale=0.4, size=uv.shape)
        n_out = int(0.3 * n)
        oi = rng.choice(n, n_out, replace=False)
        uv[oi] = rng.uniform(0, [s.width, s.height], size=(n_out, 2))
        cap = 512
        Xp = np.zeros((cap, 3), np.float32)
        uvp = np.zeros((cap, 2), np.float32)
        m = np.zeros(cap, bool)
        k = min(n, cap)
        Xp[:k], uvp[:k], m[:k] = X[:k], uv[:k], True
        out = estimate_pnp_ransac(
            jax.random.PRNGKey(4), jnp.asarray(s.K.astype(np.float32)),
            jnp.asarray(Xp), jnp.asarray(uvp), jnp.asarray(m),
            threshold_px=4.0, num_hyps=2048,
        )
        assert bool(out["success"])
        R_err = np.degrees(
            np.arccos(np.clip((np.trace(np.asarray(out["R"]).T @ s.R[c]) - 1) / 2, -1, 1))
        )
        t_err = np.linalg.norm(np.asarray(out["t"]) - s.t[c])
        assert R_err < 0.5, R_err
        assert t_err < 0.05, t_err
        assert float(out["mean_inlier_error_px"]) < 1.5

    def test_fails_gracefully_with_too_few_points(self):
        cap = 64
        out = estimate_pnp_ransac(
            jax.random.PRNGKey(0), jnp.eye(3, dtype=jnp.float32) * 100,
            jnp.zeros((cap, 3)), jnp.zeros((cap, 2)), jnp.zeros(cap, bool),
            num_hyps=64,
        )
        assert not bool(out["success"])

    def test_epnp_recovers_pose(self, ring_scene):
        s = ring_scene
        rng = np.random.default_rng(11)
        c = 5
        vis = s.visible[c]
        X = s.points[vis]
        uv = s.observations[c][vis].copy()
        uv += rng.normal(scale=0.4, size=uv.shape)
        cap = 512
        k = min(len(X), cap)
        Xp = np.zeros((cap, 3), np.float32)
        uvp = np.zeros((cap, 2), np.float32)
        m = np.zeros(cap, bool)
        Xp[:k], uvp[:k], m[:k] = X[:k], uv[:k], True
        out = estimate_pnp_ransac(
            jax.random.PRNGKey(9), jnp.asarray(s.K.astype(np.float32)),
            jnp.asarray(Xp), jnp.asarray(uvp), jnp.asarray(m),
            threshold_px=4.0, num_hyps=1024, method="epnp",
        )
        assert bool(out["success"])
        R_err = np.degrees(np.arccos(np.clip(
            (np.trace(np.asarray(out["R"]).T @ s.R[c]) - 1) / 2, -1, 1)))
        assert R_err < 0.5, R_err
        assert np.linalg.norm(np.asarray(out["t"]) - s.t[c]) < 0.05

    def test_epnp_beats_p6p_at_high_outlier_ratio(self, ring_scene):
        """The 5-point minimal sample survives low-inlier registrations the
        6-point DLT sample misses at the same hypothesis budget (the
        outlier-fragility concern of substituting P6P for the reference's
        P3P/EPnP family)."""
        s = ring_scene
        rng = np.random.default_rng(3)
        c = 2
        vis = s.visible[c]
        X = s.points[vis]
        uv = s.observations[c][vis].copy()
        n = len(X)
        n_out = int(0.7 * n)
        oi = rng.choice(n, n_out, replace=False)
        uv[oi] = rng.uniform(0, [s.width, s.height], size=(n_out, 2))
        cap = 512
        k = min(n, cap)
        Xp = np.zeros((cap, 3), np.float32)
        uvp = np.zeros((cap, 2), np.float32)
        m = np.zeros(cap, bool)
        Xp[:k], uvp[:k], m[:k] = X[:k], uv[:k], True
        out = estimate_pnp_ransac(
            jax.random.PRNGKey(1), jnp.asarray(s.K.astype(np.float32)),
            jnp.asarray(Xp), jnp.asarray(uvp), jnp.asarray(m),
            threshold_px=4.0, num_hyps=512, method="epnp",
        )
        R_err = np.degrees(np.arccos(np.clip(
            (np.trace(np.asarray(out["R"]).T @ s.R[c]) - 1) / 2, -1, 1)))
        assert bool(out["success"]) and R_err < 1.0, R_err

    def test_p3p_minimal_exact(self, ring_scene):
        """Noise-free 3-point fit: one of the Grunert quartic roots must be
        the exact pose (Registrant.cpp:52-57 SOLVEPNP_P3P parity)."""
        from monocularsfm_tpu.estimators.pnp import _fit_p3p

        s = ring_scene
        c = 4
        vis = np.nonzero(s.visible[c])[0][:3]
        X = jnp.asarray(s.points[vis], jnp.float32)
        uv = s.observations[c][vis]
        K = s.K
        xn = jnp.asarray(np.stack([
            (uv[:, 0] - K[0, 2]) / K[0, 0],
            (uv[:, 1] - K[1, 2]) / K[1, 1],
        ], axis=-1), jnp.float32)
        R4, t4 = _fit_p3p(X, xn, jnp.arange(3))
        errs = []
        for i in range(4):
            Ri, ti = np.asarray(R4[i]), np.asarray(t4[i])
            if not np.all(np.isfinite(Ri)):
                continue
            errs.append(np.degrees(np.arccos(np.clip(
                (np.trace(Ri.T @ s.R[c]) - 1) / 2, -1, 1)))
                + np.linalg.norm(ti - s.t[c]))
        # f32 quartic + Procrustes resolves the true root to ~1 degree even
        # on narrow-FOV (ill-conditioned) samples — far from the spurious
        # roots (~100 deg); RANSAC scoring + GN polish finish the job in use.
        assert errs and min(errs) < 2.0, errs

    def test_p3p_ransac_recovers_pose(self, ring_scene):
        s = ring_scene
        rng = np.random.default_rng(17)
        c = 6
        vis = s.visible[c]
        X = s.points[vis]
        uv = s.observations[c][vis].copy()
        n = len(X)
        uv += rng.normal(scale=0.4, size=uv.shape)
        n_out = int(0.5 * n)
        oi = rng.choice(n, n_out, replace=False)
        uv[oi] = rng.uniform(0, [s.width, s.height], size=(n_out, 2))
        cap = 512
        k = min(n, cap)
        Xp = np.zeros((cap, 3), np.float32)
        uvp = np.zeros((cap, 2), np.float32)
        m = np.zeros(cap, bool)
        Xp[:k], uvp[:k], m[:k] = X[:k], uv[:k], True
        out = estimate_pnp_ransac(
            jax.random.PRNGKey(2), jnp.asarray(s.K.astype(np.float32)),
            jnp.asarray(Xp), jnp.asarray(uvp), jnp.asarray(m),
            threshold_px=4.0, num_hyps=512, method="p3p",
        )
        assert bool(out["success"])
        R_err = np.degrees(np.arccos(np.clip(
            (np.trace(np.asarray(out["R"]).T @ s.R[c]) - 1) / 2, -1, 1)))
        assert R_err < 1.0, R_err
        assert np.linalg.norm(np.asarray(out["t"]) - s.t[c]) < 0.05

    def test_ap3p_alias_matches_p3p(self, ring_scene):
        """config value "ap3p" (Registrant.cpp:46-50) runs the same batched
        quartic solver as "p3p" — identical output for identical keys."""
        s = ring_scene
        c = 3
        vis = s.visible[c]
        X = s.points[vis][:128]
        uv = s.observations[c][vis][:128]
        cap = 128
        m = np.ones(cap, bool)[: len(X)]
        Xp = np.zeros((cap, 3), np.float32)
        uvp = np.zeros((cap, 2), np.float32)
        mp = np.zeros(cap, bool)
        Xp[: len(X)], uvp[: len(X)], mp[: len(X)] = X, uv, m
        args = (jax.random.PRNGKey(5), jnp.asarray(s.K.astype(np.float32)),
                jnp.asarray(Xp), jnp.asarray(uvp), jnp.asarray(mp))
        o1 = estimate_pnp_ransac(*args, num_hyps=128, method="p3p")
        o2 = estimate_pnp_ransac(*args, num_hyps=128, method="ap3p")
        np.testing.assert_array_equal(np.asarray(o1["R"]), np.asarray(o2["R"]))
        np.testing.assert_array_equal(np.asarray(o1["t"]), np.asarray(o2["t"]))

    def test_upnp_recovers_pose_and_focal(self, ring_scene):
        """Unknown-focal resection (cv::SOLVEPNP_UPNP role,
        Registrant.cpp:52-63): feed a K whose focal is wrong by 25% — the
        calibrated solvers would be poisoned, UPnP must recover both the
        true pose and the true focal from the data."""
        s = ring_scene
        rng = np.random.default_rng(3)
        c = 5
        vis = s.visible[c]
        X = s.points[vis]
        uv = s.observations[c][vis].copy()
        uv += rng.normal(scale=0.2, size=uv.shape)
        n = len(X)
        cap = 512
        k = min(n, cap)
        Xp = np.zeros((cap, 3), np.float32)
        uvp = np.zeros((cap, 2), np.float32)
        m = np.zeros(cap, bool)
        Xp[:k], uvp[:k], m[:k] = X[:k], uv[:k], True
        K_wrong = s.K.copy().astype(np.float32)
        K_wrong[0, 0] *= 1.25
        K_wrong[1, 1] *= 1.25
        out = estimate_pnp_ransac(
            jax.random.PRNGKey(9), jnp.asarray(K_wrong),
            jnp.asarray(Xp), jnp.asarray(uvp), jnp.asarray(m),
            threshold_px=4.0, num_hyps=512, method="upnp",
        )
        assert bool(out["success"])
        f_est = float(out["focal"])
        assert abs(f_est - s.K[0, 0]) / s.K[0, 0] < 0.05, f_est
        R_err = np.degrees(np.arccos(np.clip(
            (np.trace(np.asarray(out["R"]).T @ s.R[c]) - 1) / 2, -1, 1)))
        assert R_err < 2.0, R_err


class TestRansacConfidence:
    def test_default_rounds_reach_reference_ceiling(self):
        """With a weak best model, the derived max_rounds must let the
        hypothesis budget reach the reference's 10000-iteration ceiling
        (Initializer.cpp:103-159) instead of silently capping at 4 rounds."""
        from monocularsfm_tpu.estimators import rounds_to_confidence

        # 20% inliers on an 8-point model: need = log(1-0.9999)/log(1-w^8)
        # >> 10000 -> the ceiling binds.
        r = rounds_to_confidence(0.9999, 20, 100, 8, 2048)
        assert r * 2048 >= 10000, r
        # A strong model still terminates after one round.
        r1 = rounds_to_confidence(0.9999, 95, 100, 8, 2048)
        assert r1 == 1, r1
