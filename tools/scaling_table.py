"""BA scaling table: 1 chip / 1 host (8-device mesh) / 2 hosts (2 procs).

Produces the BASELINE.md scaling report rows (SURVEY.md section 5
distributed plan).  The >= 2-host row runs two jax.distributed CPU
processes joined over gloo (the DCN stand-in available in this container);
its purpose is the cross-process correctness + scaling POINT, not absolute
speed — absolute throughput comes from the single-chip TPU row.

Usage:
  python tools/scaling_table.py --mode tpu    # 1-chip row (real v5e)
  python tools/scaling_table.py --mode host   # 8-device CPU mesh row
  python tools/scaling_table.py --mode dcn    # 2-process gloo row
Each prints one JSON line; run the modes in separate interpreters (backend
flags must be set before jax initialises).
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import socket
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

CAMS = 256
POINTS = 50_000
TRACK = 6
LM_ITERS = 10
PCG_INNER = 50


def build_problem():
    import bench

    return bench._ring_problem(CAMS, POINTS, TRACK, seed=3)


def measure(mesh=None, label=""):
    import jax

    from monocularsfm_tpu.optim import bundle_adjust

    prob, nobs = build_problem()
    kw = dict(max_iterations=LM_ITERS, solve_mode="pcg", pcg_iters=PCG_INNER)
    if mesh is not None:
        from monocularsfm_tpu.parallel import distributed_bundle_adjust

        run = lambda: distributed_bundle_adjust(prob, mesh, **kw)
    else:
        run = lambda: bundle_adjust(prob, **kw)
    out = run()
    float(out["cost_final"])  # host transfer: hard sync (block_until_ready
    t0 = time.perf_counter()  # is unreliable over the axon tunnel)
    out = run()
    float(out["cost_final"])
    dt = time.perf_counter() - t0
    n_it = int(out["iterations"])
    return {
        "label": label,
        "backend": jax.default_backend(),
        "devices": int(jax.device_count()),
        "processes": int(jax.process_count()),
        "cams": CAMS, "points": POINTS, "obs": nobs,
        "lm_iters_per_sec": round(n_it / dt, 4),
        "rmse_final": round(float(out["rmse_final"]), 5),
    }


def _dcn_worker():
    proc_id = int(os.environ["SCALE_PROC_ID"])
    nproc = int(os.environ["SCALE_NPROC"])
    port = os.environ["SCALE_PORT"]
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)
    from monocularsfm_tpu.parallel import init_multi_host, make_mesh

    init_multi_host(f"localhost:{port}", nproc, proc_id)
    mesh = make_mesh()
    res = measure(mesh, label=f"{nproc}-host (gloo DCN stand-in)")
    if proc_id == 0:
        print(json.dumps(res))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["tpu", "host", "dcn", "_dcn_worker"],
                    required=True)
    args = ap.parse_args()
    if args.mode == "_dcn_worker":
        _dcn_worker()
        return
    if args.mode == "tpu":
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            str(pathlib.Path.home() / ".cache" / "monocularsfm_tpu_xla"))
        print(json.dumps(measure(None, label="1 chip (TPU v5e)")))
    elif args.mode == "host":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8")
        import jax

        jax.config.update("jax_platforms", "cpu")
        from monocularsfm_tpu.parallel import make_mesh

        mesh = make_mesh()
        print(json.dumps(measure(mesh, label="1 host, 8-device mesh (CPU)")))
    else:  # dcn: spawn 2 workers
        s = socket.socket(); s.bind(("localhost", 0))
        port = s.getsockname()[1]; s.close()
        procs = []
        for i in range(2):
            env = dict(os.environ, SCALE_PROC_ID=str(i), SCALE_NPROC="2",
                       SCALE_PORT=str(port), JAX_PLATFORMS="cpu")
            procs.append(subprocess.Popen(
                [sys.executable, __file__, "--mode", "_dcn_worker"],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True, cwd=str(REPO)))
        for i, p in enumerate(procs):
            out, err = p.communicate(timeout=3600)
            if p.returncode != 0:
                sys.stderr.write(err[-3000:])
                sys.exit(1)
            if i == 0:
                print(out.strip().splitlines()[-1])


if __name__ == "__main__":
    main()
