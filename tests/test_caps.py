"""Forced-truncation tests: every bound that can drop data must log.

SURVEY "no silent caps" principle — when the ring matcher's per-pair
max_matches, the triangulation feed's max_track, or a RANSAC round budget
binds, a warning appears on the `monocularsfm_tpu.caps` logger.
"""

import logging

import numpy as np
import pytest


CAPS = "monocularsfm_tpu.caps"


def test_ring_matcher_logs_max_matches_truncation(rng, caplog):
    from monocularsfm_tpu.parallel import make_mesh
    from monocularsfm_tpu.parallel.sharded_matching import (
        ring_all_pairs_matching,
    )

    cap, n_img = 128, 4
    base = rng.normal(size=(cap, 128)).astype(np.float32)
    bank = np.zeros((n_img, cap, 128), np.float32)
    mask = np.ones((n_img, cap), bool)
    for i in range(n_img):
        v = base + 0.02 * rng.normal(size=(cap, 128)).astype(np.float32)
        bank[i] = v / np.linalg.norm(v, axis=1, keepdims=True)
    mesh = make_mesh(4)
    with caplog.at_level(logging.WARNING, logger=CAPS):
        res = ring_all_pairs_matching(
            bank, mask, mesh, col_tile=cap, max_matches=8
        )
    assert any("max_matches" in r.message for r in caplog.records), (
        "expected a max_matches truncation warning"
    )
    # Output is still capped and well-formed.
    assert all(len(v) <= 8 for v in res.values())


def test_triangulation_feed_logs_max_track_cap(caplog):
    from monocularsfm_tpu.reconstruction.map_state import Map
    from monocularsfm_tpu.reconstruction.scene_graph import SceneGraph

    # Star topology: keypoint 0 of image 0 matches keypoint 0 of images
    # 1..7 -> one track of length 8, capped at max_track=4.
    n_img = 8
    matches = {
        (0, j): np.array([[0, 0]] + [[k, k] for k in range(1, 12)], np.int32)
        for j in range(1, n_img)
    }
    num_kpts = {i: 16 for i in range(n_img)}
    g = SceneGraph().load(matches, num_kpts, min_num_matches=2)
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    m = Map(K)
    for i in range(n_img):
        m.load_image(i, f"im{i}", np.tile(np.arange(16)[:, None], (1, 2)).astype(float))
    m.attach_scene_graph(g)
    for i in range(1, n_img):
        m.add_image_pose(i, np.eye(3), np.array([0.1 * i, 0, 0]))
    with caplog.at_level(logging.WARNING, logger=CAPS):
        tracks = m.get_triangulation_tracks(0, max_track=4)
    # Image 0 is unregistered but the feed is for it: keypoint 0's track
    # spans the 7 registered partners (+ seed) -> capped at 4.
    assert any("max_track" in r.message for r in caplog.records)
    assert all(len(tr) <= 4 for _, tr in tracks)


def test_pnp_round_budget_reaches_reference_ceiling(rng, caplog):
    """Round-5 contract: the adaptive round budget is derived so the
    hypothesis count always reaches the reference's 10000-iteration ceiling
    (Registrant.h:22-27) — the old 'stopped at max_rounds with confidence
    unmet' warning is unreachable, even on pure noise."""
    from monocularsfm_tpu.config import RegistrantConfig
    from monocularsfm_tpu.reconstruction.registrant import Registrant

    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    cfg = RegistrantConfig(ransac_iterations=2048,
                           abs_pose_min_num_inliers=15)
    reg = Registrant(K, cfg)
    # Pure noise: no consistent pose exists, so the best model's inlier
    # ratio stays tiny and the adaptive loop must run to the ceiling.
    xyz = rng.normal(size=(200, 3)) * 5 + [0, 0, 10]
    uv = rng.uniform(0, 640, size=(200, 2))
    with caplog.at_level(logging.WARNING, logger=CAPS):
        stats, R, t, inl = reg.register(xyz, uv)
    assert not any("max_rounds" in r.message for r in caplog.records)
    assert R is None  # noise must not register
