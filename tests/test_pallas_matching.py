"""Pallas matcher (interpret mode on CPU) vs the XLA scan matcher: equality."""

import numpy as np
import jax.numpy as jnp
import pytest

from monocularsfm_tpu.ops.matching import match_descriptors_pair
from monocularsfm_tpu.ops.pallas_matching import match_descriptors_pair_pallas
from tests.test_matching import _planted_pair


@pytest.mark.parametrize("cross", [True, False])
def test_pallas_matches_scan(rng, cross):
    da, db, ma, mb, _ = _planted_pair(rng, n=300, cap=1024, noise=0.2)
    ref = np.asarray(
        match_descriptors_pair(
            jnp.asarray(da), jnp.asarray(db), jnp.asarray(ma), jnp.asarray(mb),
            ratio=0.85, max_distance=0.9, cross_check=cross, col_tile=256,
        )
    )
    out = np.asarray(
        match_descriptors_pair_pallas(
            jnp.asarray(da), jnp.asarray(db), jnp.asarray(ma), jnp.asarray(mb),
            ratio=0.85, max_distance=0.9, cross_check=cross,
            row_tile=256, col_tile=256, interpret=True,
        )
    )
    agree = (out == ref).mean()
    assert agree > 0.995, f"agreement {agree}"


def test_pallas_all_masked(rng):
    cap = 512
    z = np.zeros((cap, 128), np.float32)
    out = np.asarray(
        match_descriptors_pair_pallas(
            jnp.asarray(z), jnp.asarray(z),
            jnp.zeros(cap, bool), jnp.zeros(cap, bool),
            row_tile=256, col_tile=256, interpret=True,
        )
    )
    assert np.all(out == -1)
