"""Benchmark: global-bundle-adjustment LM throughput on a south-building-
scale problem (128 cameras, ~200k observations — the hot kernel every
reconstruction spends most of its device time in; reference regime:
Ceres SPARSE_SCHUR on CPU, src/Optimizer/CeresBundleOptimizer.cpp:262-276).

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline = speedup over the same solver executed on the host CPU (a
Ceres-class baseline: identical algorithm, identical problem, Eigen-backed
XLA CPU backend), measured once per machine and cached in
.bench_cpu_baseline.json.  Logs go to stderr.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent
CACHE = REPO / ".bench_cpu_baseline.json"

CAMS = 128
POINTS = 40000
TRACK = 8
ITERS = 50


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_problem():
    sys.path.insert(0, str(REPO))
    from monocularsfm_tpu.optim import make_bundle_problem
    from monocularsfm_tpu.utils.synthetic import camera_ring_scene
    from monocularsfm_tpu.geometry import angle_axis_to_matrix
    import jax.numpy as jnp

    scene = camera_ring_scene(num_cameras=CAMS, num_points=POINTS,
                              noise_px=0.5, seed=2)
    rng = np.random.default_rng(0)
    obs_cam = np.zeros((POINTS, TRACK), np.int32)
    obs_uv = np.zeros((POINTS, TRACK, 2), np.float32)
    obs_valid = np.zeros((POINTS, TRACK), bool)
    for p in range(POINTS):
        cams = np.where(scene.visible[:, p])[0]
        if len(cams) > TRACK:
            cams = rng.choice(cams, TRACK, replace=False)
        obs_cam[p, : len(cams)] = cams
        obs_uv[p, : len(cams)] = scene.observations[cams, p]
        obs_valid[p, : len(cams)] = True
    aa = rng.normal(scale=0.01, size=(CAMS, 3))
    R = np.einsum(
        "cij,cjk->cik",
        np.asarray(angle_axis_to_matrix(jnp.asarray(aa))), scene.R,
    )
    t = scene.t + rng.normal(scale=0.02, size=(CAMS, 3))
    X = scene.points + rng.normal(scale=0.02, size=scene.points.shape)
    cam_const = np.zeros(CAMS, bool)
    cam_const[0] = True
    K4 = np.array(
        [scene.K[0, 0], scene.K[1, 1], scene.K[0, 2], scene.K[1, 2]], np.float32
    )
    prob = make_bundle_problem(K4, R, t, X, obs_cam, obs_uv, obs_valid, cam_const)
    return prob, int(obs_valid.sum())


def measure(iters=ITERS):
    import jax

    from monocularsfm_tpu.optim import bundle_adjust

    prob, nobs = build_problem()
    log(f"backend={jax.default_backend()} problem: {CAMS} cams, "
        f"{POINTS} points, {nobs} obs")
    # Warm up (compile).
    out = bundle_adjust(prob, max_iterations=iters)
    jax.block_until_ready(out["cost_final"])
    t0 = time.perf_counter()
    out = bundle_adjust(prob, max_iterations=iters)
    jax.block_until_ready(out["cost_final"])
    dt = time.perf_counter() - t0
    n_it = int(out["iterations"])
    log(f"{n_it} LM iters in {dt:.3f}s -> {n_it/dt:.2f} iters/s | "
        f"rmse {float(out['rmse_initial']):.3f} -> {float(out['rmse_final']):.4f}"
        f" | mean reproj {float(out['mean_reproj_error']):.4f} px")
    return n_it / dt


def cpu_baseline() -> float:
    """Same solve on host CPU, measured in a subprocess; cached."""
    if CACHE.exists():
        data = json.loads(CACHE.read_text())
        log(f"cpu baseline (cached): {data['iters_per_sec']:.3f} iters/s")
        return data["iters_per_sec"]
    log("measuring cpu baseline (subprocess)...")
    env = dict(os.environ, JAX_PLATFORMS="cpu", BENCH_CPU_CHILD="1")
    res = subprocess.run(
        [sys.executable, __file__], env=env, capture_output=True, text=True,
        timeout=1800,
    )
    line = res.stdout.strip().splitlines()[-1]
    val = json.loads(line)["value"]
    CACHE.write_text(json.dumps({"iters_per_sec": val}))
    log(f"cpu baseline (measured): {val:.3f} iters/s")
    return val


def main():
    if os.environ.get("BENCH_CPU_CHILD"):
        import jax

        jax.config.update("jax_platforms", "cpu")
        ips = measure(iters=20)
        print(json.dumps({
            "metric": "global_ba_lm_iters_per_sec_cpu",
            "value": ips, "unit": "iters/s", "vs_baseline": 1.0,
        }))
        return
    # Compilation cache trims warm-up cost across rounds.
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir", str(REPO / ".jax_cache")
        )
    except Exception:
        pass
    ips = measure()
    try:
        base = cpu_baseline()
        speedup = ips / base if base > 0 else None
    except Exception as e:  # never fail the bench on baseline trouble
        log(f"cpu baseline failed: {e}")
        speedup = None
    print(json.dumps({
        "metric": "global_ba_lm_iters_per_sec",
        "value": round(ips, 3),
        "unit": "iters/s",
        "vs_baseline": round(speedup, 3) if speedup else None,
    }))


if __name__ == "__main__":
    main()
