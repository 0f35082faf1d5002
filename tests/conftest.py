"""Test harness: force a virtual 8-device CPU mesh before JAX initialises.

This is the fake-backend mechanism the reference never needed (SURVEY.md
section 4): all sharding/pjit code paths run in CI on N virtual CPU devices
via --xla_force_host_platform_device_count, no TPU required.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Force CPU even when the ambient environment selects a TPU platform
# (JAX_PLATFORMS=axon in the driver image): unit tests must be hermetic and
# fast.  Set MONOSFM_TEST_TPU=1 to run the suite on real hardware instead.
# The driver image's sitecustomize imports jax before conftest runs, so the
# env var alone is too late — use jax.config.update, which works any time
# before the first backend initialisation.
if os.environ.get("MONOSFM_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass  # older jax: XLA_FLAGS fallback above covers it

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from monocularsfm_tpu.utils import synthetic  # noqa: E402


@pytest.fixture(scope="session")
def ring_scene():
    return synthetic.camera_ring_scene(num_cameras=8, num_points=400, noise_px=0.0, seed=3)


@pytest.fixture(scope="session")
def noisy_scene():
    return synthetic.camera_ring_scene(num_cameras=10, num_points=600, noise_px=0.5, seed=7)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
