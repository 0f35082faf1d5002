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
        assert res.shape == (n_img, n_img, cap)
        total = 0
        for q in range(n_img):
            for b in range(n_img):
                if q == b:
                    continue
                ref = np.asarray(
                    match_descriptors_pair(
                        jnp.asarray(bank[q]), jnp.asarray(bank[b]),
                        jnp.asarray(mask[q]), jnp.asarray(mask[b]),
                        cross_check=cross_check, col_tile=cap,
                    )
                )
                np.testing.assert_array_equal(res[q, b], ref, err_msg=f"{q},{b}")
                total += (ref >= 0).sum()
        assert total > 0  # the fixture must actually produce matches
