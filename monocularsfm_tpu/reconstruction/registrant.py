"""Image registration: absolute pose from 2D-3D correspondences.

Reference parity: src/Reconstruction/Registrant.cpp — solvePnPRansac with
>= 15 inliers / 4 px / conf .9999 (Registrant.h:22-27), Rodrigues conversion
(:96-97), per-point residual report (:100-110).  Device path: the batched
P6P RANSAC + GN polish in estimators/pnp.py.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from monocularsfm_tpu.config import RegistrantConfig
from monocularsfm_tpu.estimators import estimate_pnp_ransac, rounds_to_confidence


@dataclasses.dataclass
class RegistrantStatistics:
    is_succeed: bool = False
    num_point2D_3D_correspondences: int = 0
    num_inliers: int = 0
    ave_residual: float = 0.0


def _pad_cap(n: int, minimum: int = 512) -> int:
    cap = minimum
    while cap < n:
        cap *= 2
    return cap


class Registrant:
    def __init__(self, K: np.ndarray, config: RegistrantConfig | None = None):
        self.K = np.asarray(K, np.float64)
        self.cfg = config or RegistrantConfig()
        self._key = jax.random.PRNGKey(7)

    def register(self, xyz: np.ndarray, uv: np.ndarray):
        """Returns (stats, R, t, inlier_mask (n,)) — Nones on failure."""
        cfg = self.cfg
        stats = RegistrantStatistics(num_point2D_3D_correspondences=len(xyz))
        if len(xyz) < cfg.abs_pose_min_num_inliers:
            return stats, None, None, None
        n = len(xyz)
        cap = _pad_cap(n)
        X = np.zeros((cap, 3), np.float32)
        U = np.zeros((cap, 2), np.float32)
        m = np.zeros(cap, bool)
        X[:n], U[:n], m[:n] = xyz, uv, True
        Kj = jnp.asarray(self.K.astype(np.float32))
        Xj, Uj, mj = jnp.asarray(X), jnp.asarray(U), jnp.asarray(m)

        def run_round():
            self._key, key = jax.random.split(self._key)
            return estimate_pnp_ransac(
                key, Kj, Xj, Uj, mj,
                threshold_px=cfg.abs_pose_max_error_px,
                num_hyps=cfg.ransac_iterations,
                method=cfg.pnp_method,
            )

        # Adaptive continuation: keep dispatching identically-shaped
        # hypothesis rounds until the classic 1-(1-w^m)^k >= confidence bound
        # holds for the best model seen (cv::solvePnPRansac's adaptive
        # termination, inverted for batch hardware).
        sample_size = {"p3p": 3, "ap3p": 3, "epnp": 5}.get(cfg.pnp_method, 6)
        # Enough rounds to reach the reference's 10000-hypothesis ceiling
        # (Registrant.h:22-27) so the confidence bound is always honored.
        max_rounds = max(1, -(-10000 // max(cfg.ransac_iterations, 1)))
        out = run_round()
        rounds = 1
        while rounds < rounds_to_confidence(
            cfg.ransac_confidence, int(out["num_inliers"]), n,
            sample_size, cfg.ransac_iterations, max_rounds=max_rounds,
        ):
            out2 = run_round()
            if int(out2["num_inliers"]) > int(out["num_inliers"]):
                out = out2
            rounds += 1
        from monocularsfm_tpu.estimators import num_ransac_iterations

        need = num_ransac_iterations(
            cfg.ransac_confidence, int(out["num_inliers"]) / max(n, 1),
            sample_size,
        )
        if need > rounds * cfg.ransac_iterations:
            from monocularsfm_tpu.utils.caps import warn_cap

            warn_cap(
                "PnP RANSAC stopped at max_rounds=%d (%d hypotheses) with "
                "the %.4f confidence bound unmet (needs %d)",
                max_rounds, rounds * cfg.ransac_iterations,
                cfg.ransac_confidence, need,
            )
        stats.num_inliers = int(out["num_inliers"])
        stats.ave_residual = float(out["mean_inlier_error_px"])
        if stats.num_inliers < cfg.abs_pose_min_num_inliers:
            return stats, None, None, None
        stats.is_succeed = True
        inl = np.asarray(out["inliers"])[:n]
        return stats, np.asarray(out["R"], np.float64), np.asarray(out["t"], np.float64), inl
