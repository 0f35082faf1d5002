"""Shared-focal refinement + async visualization artifacts."""

import dataclasses
import numpy as np

from monocularsfm_tpu.optim import bundle_adjust_refine_focal
from tests.test_bundle_adjustment import _build_problem


def test_focal_refinement_recovers_true_focal(ring_scene):
    # Joint solve: the two global focal columns ride inside the Schur system,
    # so LM walks the f/Z valley directly.
    prob = _build_problem(ring_scene, noise_px=0.2, perturb=0.2)
    true_f = float(np.asarray(prob.K)[0])
    bad_K = np.asarray(prob.K).copy()
    bad_K[0] *= 1.03
    bad_K[1] *= 1.03
    prob_bad = dataclasses.replace(prob, K=np.asarray(bad_K, np.float32))
    out = bundle_adjust_refine_focal(prob_bad, max_iterations=80)
    rec_f = float(np.asarray(out["K"])[0])
    assert abs(rec_f - true_f) / true_f < 0.01, (rec_f, true_f)
    assert float(out["rmse_final"]) < 0.25  # at the 0.2 px noise floor


def test_refine_focal_off_keeps_K(ring_scene):
    from monocularsfm_tpu.optim import bundle_adjust

    prob = _build_problem(ring_scene, noise_px=0.2, perturb=0.2)
    out = bundle_adjust(prob, max_iterations=10)
    np.testing.assert_array_equal(np.asarray(out["K"]), np.asarray(prob.K))


def test_async_viz_writes_artifacts(tmp_path, ring_scene):
    from monocularsfm_tpu.reconstruction.map_state import Map
    from monocularsfm_tpu.viz import AsyncVisualization

    s = ring_scene
    m = Map(s.K)
    for i in range(2):
        m.load_image(i, f"im{i}", s.observations[i][:50])
        m.add_image_pose(i, s.R[i], s.t[i])
    for k in range(30):
        m.add_point3d(s.points[k], [(0, k), (1, k)])

    viz = AsyncVisualization(tmp_path / "viz").start()
    viz.update(m)
    viz.close()
    assert (tmp_path / "viz" / "live.ply").exists()
    assert (tmp_path / "viz" / "viewer.html").exists()
    state = (tmp_path / "viz" / "state.json").read_text()
    assert '"num_points": 30' in state
    # PLY has the right vertex count.
    txt = (tmp_path / "viz" / "live.ply").read_text()
    assert "element vertex 30" in txt
