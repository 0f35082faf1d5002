"""Multi-device tests on the virtual 8-device CPU mesh.

Distributed results must match single-device results bit-for-... well,
within f32 reduction-order tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from monocularsfm_tpu.parallel import (
    make_mesh,
    distributed_bundle_adjust,
    sharded_match_pairs,
)
from monocularsfm_tpu.optim import bundle_adjust
from tests.test_bundle_adjustment import _build_problem


def test_virtual_mesh_available():
    assert len(jax.devices()) == 8


class TestDistributedBA:
    def test_matches_single_device(self, ring_scene):
        prob = _build_problem(ring_scene, noise_px=0.4, perturb=0.6)
        single = bundle_adjust(prob, max_iterations=30)
        for n_dev in (2, 8):
            mesh = make_mesh(n_dev)
            dist = distributed_bundle_adjust(prob, mesh, max_iterations=30)
            assert np.asarray(dist["X"]).shape == np.asarray(prob.X).shape
            assert abs(
                float(dist["rmse_final"]) - float(single["rmse_final"])
            ) < 5e-3, (float(dist["rmse_final"]), float(single["rmse_final"]))
            np.testing.assert_allclose(
                np.asarray(dist["R"]), np.asarray(single["R"]), atol=5e-3
            )

    def test_pcg_mode_distributed(self, ring_scene):
        prob = _build_problem(ring_scene, noise_px=0.4, perturb=0.4)
        mesh = make_mesh(4)
        dist = distributed_bundle_adjust(
            prob, mesh, max_iterations=20, solve_mode="pcg", pcg_iters=60
        )
        single = bundle_adjust(prob, max_iterations=20, solve_mode="pcg", pcg_iters=60)
        assert abs(float(dist["rmse_final"]) - float(single["rmse_final"])) < 1e-2

    def test_point_count_not_divisible(self, ring_scene):
        # 400 points over 8 devices pads to 400; try 403 via pnt_pad=3.
        prob = _build_problem(ring_scene, perturb=0.3, pnt_pad=3)
        mesh = make_mesh(8)
        dist = distributed_bundle_adjust(prob, mesh, max_iterations=10)
        assert np.isfinite(float(dist["rmse_final"]))

    @pytest.mark.parametrize("mode,pcg", [("dense", 0), ("pcg", 40)])
    def test_segmented_continuation_matches_monolithic(
        self, ring_scene, mode, pcg
    ):
        """The fn_cont path (solver state fed back through shard_map across
        bounded dispatch segments) must match a single monolithic dispatch —
        round-3 advisor flag: this path shipped untested because auto
        dispatch sizing never segments at test problem sizes."""
        prob = _build_problem(ring_scene, noise_px=0.4, perturb=0.4)
        mesh = make_mesh(4)
        kw = dict(solve_mode=mode)
        if pcg:
            kw["pcg_iters"] = pcg
        mono = distributed_bundle_adjust(
            prob, mesh, max_iterations=12, dispatch_iters=12, **kw)
        seg = distributed_bundle_adjust(
            prob, mesh, max_iterations=12, dispatch_iters=3, **kw)
        assert abs(
            float(seg["rmse_final"]) - float(mono["rmse_final"])
        ) < 1e-3, (float(seg["rmse_final"]), float(mono["rmse_final"]))
        np.testing.assert_allclose(
            np.asarray(seg["R"]), np.asarray(mono["R"]), atol=1e-3)


class TestShardedMatching:
    def test_matches_single_device(self, rng):
        from monocularsfm_tpu.ops.matching import match_pairs_batch

        cap = 256
        bank = np.zeros((6, cap, 128), np.float32)
        mask = np.zeros((6, cap), bool)
        for i in range(6):
            n = 100 + 10 * i
            v = rng.normal(size=(n, 128)).astype(np.float32)
            bank[i, :n] = v / np.linalg.norm(v, axis=1, keepdims=True)
            mask[i, :n] = True
        pairs = np.array(
            [[i, j] for i in range(6) for j in range(i + 1, 6)], np.int32
        )  # 15 pairs, not divisible by 8
        mesh = make_mesh(8)
        out = np.asarray(
            sharded_match_pairs(
                jnp.asarray(bank), jnp.asarray(mask), pairs, mesh, col_tile=cap
            )
        )
        ref = np.asarray(
            match_pairs_batch(
                jnp.asarray(bank), jnp.asarray(mask), jnp.asarray(pairs),
                col_tile=cap,
            )
        )
        np.testing.assert_array_equal(out, ref)

    @pytest.mark.parametrize("cross_check", [True, False])
    def test_ring_all_pairs_matches_direct(self, rng, cross_check):
        from monocularsfm_tpu.ops.matching import match_descriptors_pair
        from monocularsfm_tpu.parallel.sharded_matching import (
            ring_all_pairs_matching,
        )

        cap, n_img = 256, 8
        # Noisy copies of one descriptor set -> plenty of mutual matches.
        base = rng.normal(size=(cap, 128)).astype(np.float32)
        bank = np.zeros((n_img, cap, 128), np.float32)
        mask = np.zeros((n_img, cap), bool)
        for i in range(n_img):
            n = 180 + 5 * i
            v = base[:n] + 0.05 * rng.normal(size=(n, 128)).astype(np.float32)
            bank[i, :n] = v / np.linalg.norm(v, axis=1, keepdims=True)
            mask[i, :n] = True
        mesh = make_mesh(4)
        res = ring_all_pairs_matching(
            bank, mask, mesh, cross_check=cross_check, col_tile=cap
        )
        # Compact streamed output: {(a, b): (m, 2)}; never an (I, I, N) map.
        total = 0
        for q in range(n_img):
            for b in range(n_img):
                if q == b or (cross_check and q > b):
                    continue
                ref = np.asarray(
                    match_descriptors_pair(
                        jnp.asarray(bank[q]), jnp.asarray(bank[b]),
                        jnp.asarray(mask[q]), jnp.asarray(mask[b]),
                        cross_check=cross_check, col_tile=cap,
                    )
                )
                i_ref = np.nonzero(ref >= 0)[0]
                expected = np.stack([i_ref, ref[i_ref]], axis=1)
                got = res.get((q, b), np.zeros((0, 2), np.int32))
                got = got[np.argsort(got[:, 0])]
                np.testing.assert_array_equal(got, expected, err_msg=f"{q},{b}")
                total += len(expected)
        assert total > 0  # the fixture must actually produce matches


class TestPipelineSharding:
    """The parallel layer reached THROUGH the pipeline (not standalone):
    MapBuilder.global_ba consults ParallelConfig.shard_ba and dispatches
    distributed_bundle_adjust on the mesh; matchers shard pair slabs."""

    @pytest.mark.slow
    def test_map_builder_1_vs_8_device_parity(self):
        from monocularsfm_tpu.config import SfMConfig
        from monocularsfm_tpu.reconstruction import MapBuilder
        from monocularsfm_tpu.utils.synthetic import (
            camera_ring_scene, similarity_align,
        )
        from tests.test_map_builder import scene_to_matches

        scene = camera_ring_scene(
            num_cameras=20, num_points=500, seed=9, arc_deg=170.0
        )
        keypoints, matches = scene_to_matches(scene, seed=9)

        def build(shard_ba: bool):
            cfg = SfMConfig()
            cfg.camera.fx = scene.K[0, 0]
            cfg.camera.fy = scene.K[1, 1]
            cfg.camera.cx = scene.K[0, 2]
            cfg.camera.cy = scene.K[1, 2]
            cfg.parallel.shard_ba = shard_ba
            # Force the at-scale solver path (PCG / sharded) mid-pipeline.
            cfg.bundle.dense_max_images = 8
            b = MapBuilder(cfg)
            b.setup(matches, keypoints)
            return b, b.do_build()

        b1, s1 = build(shard_ba=False)
        b8, s8 = build(shard_ba=True)
        assert s1.num_registered == scene.num_cameras
        assert s8.num_registered == scene.num_cameras
        # Same registered set; same map size within reduction-order jitter.
        assert set(b1.map.registered_ids) == set(b8.map.registered_ids)
        assert abs(s1.num_points3D - s8.num_points3D) <= max(
            5, 0.02 * s1.num_points3D
        )
        assert abs(
            s1.mean_reprojection_error - s8.mean_reprojection_error
        ) < 5e-2
        # Trajectories agree with ground truth (hence with each other).
        for b in (b1, b8):
            est = np.array([
                -b.map.images[i].R.T @ b.map.images[i].t
                for i in sorted(b.map.registered_ids)
            ])
            gt = np.array([
                -scene.R[i].T @ scene.t[i]
                for i in sorted(b.map.registered_ids)
            ])
            _, rms = similarity_align(est, gt)
            scale = np.linalg.norm(gt - gt.mean(0), axis=1).mean()
            assert rms / scale < 0.01

    def test_matcher_shard_parity(self, tmp_path, rng):
        """BruteFeatureMatcher writes identical matches with sharding on/off
        (pair-sharded dispatch is bit-identical: same kernel per pair)."""
        from monocularsfm_tpu.config import MatchingConfig, ParallelConfig
        from monocularsfm_tpu.database import Database
        from monocularsfm_tpu.features.matching import BruteFeatureMatcher

        n_img, n_kp = 6, 200
        base = rng.normal(size=(n_kp, 128)).astype(np.float32)
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        uv = rng.uniform(20, 600, size=(n_kp, 2)).astype(np.float32)

        def make_db(path):
            db = Database(path)
            ids = []
            for i in range(n_img):
                d = base + 0.02 * rng.normal(size=base.shape).astype(np.float32)
                d /= np.linalg.norm(d, axis=1, keepdims=True)
                kp = np.concatenate(
                    [uv, np.full((n_kp, 1), 2.0, np.float32),
                     np.zeros((n_kp, 1), np.float32)], axis=1,
                )
                iid = db.write_image(f"im{i}.png")
                db.write_keypoints(iid, kp)
                db.write_descriptors(iid, d)
                ids.append(iid)
            db.close()
            return ids

        make_db(tmp_path / "a.db")
        make_db(tmp_path / "b.db")
        mcfg = MatchingConfig(min_num_matches_verified=15,
                              ransac_iterations=256, pair_batch=4)
        BruteFeatureMatcher(mcfg).run_matching(
            str(tmp_path / "a.db"), log=lambda *a: None)
        BruteFeatureMatcher(
            mcfg, parallel=ParallelConfig(shard_matching=True)
        ).run_matching(str(tmp_path / "b.db"), log=lambda *a: None)

        da, db_ = Database(tmp_path / "a.db"), Database(tmp_path / "b.db")
        ma, mb = da.read_all_matches(), db_.read_all_matches()
        da.close()
        db_.close()
        assert set(ma) == set(mb)
        for k in ma:
            np.testing.assert_array_equal(ma[k], mb[k])
