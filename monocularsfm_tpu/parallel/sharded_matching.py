"""Pair-parallel descriptor matching over a device mesh.

Parallelism plan (b) from SURVEY.md section 2: the pair list shards across
chips while the descriptor bank is replicated (collections whose banks
exceed one chip's HBM rotate bank shards around the ICI ring instead — the
SfM analogue of ring attention; see ring_bank_matching below for the
single-host formulation).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from monocularsfm_tpu.ops.matching import match_descriptors_pair, match_pairs_batch


def sharded_match_pairs(
    desc_bank: jnp.ndarray,
    mask_bank: jnp.ndarray,
    pair_ids: np.ndarray,
    mesh: Mesh,
    ratio: float = 0.8,
    max_distance: float = 0.7,
    cross_check: bool = True,
    col_tile: int = 1024,
):
    """Match a list of image pairs, pair list sharded over the mesh.

    pair_ids: (Np, 2) int32.  Pads the pair list to a multiple of the mesh
    size (duplicate last pair; caller slices).  Returns (Np, N) index maps.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    n_pairs = len(pair_ids)
    target = ((n_pairs + n_dev - 1) // n_dev) * n_dev
    if target != n_pairs:
        pair_ids = np.concatenate(
            [pair_ids, np.repeat(pair_ids[-1:], target - n_pairs, axis=0)]
        )
    pair_ids = jnp.asarray(pair_ids, jnp.int32)

    fn = jax.jit(
        jax.shard_map(
            functools.partial(
                match_pairs_batch,
                ratio=ratio, max_distance=max_distance,
                cross_check=cross_check, col_tile=col_tile,
            ),
            mesh=mesh,
            in_specs=(P(), P(), P(axis)),
            out_specs=P(axis),
        )
    )
    out = fn(desc_bank, mask_bank, pair_ids)
    return out[:n_pairs]


def ring_bank_matching(
    desc_a: jnp.ndarray,
    bank_b: jnp.ndarray,
    mask_a: jnp.ndarray,
    mask_bank_b: jnp.ndarray,
    mesh: Mesh,
    ratio: float = 0.8,
    max_distance: float = 0.7,
):
    """One query image vs a *sharded* descriptor bank (bank > HBM regime).

    Each device holds a shard of candidate images' descriptors; the query
    descriptors are replicated.  Every device matches the query against its
    local shard; results gather back.  This is the building block the
    ring-pipelined all-pairs schedule composes (rotation of bank shards via
    ppermute happens at the slab-scheduling level).

    bank_b: (I_shard_total, N, D) sharded on axis 0 over the mesh.
    Returns (I_shard_total, N_query) index maps of query->candidate matches.
    """
    axis = mesh.axis_names[0]

    def local(da, bank, ma, mbank):
        def one(b_desc, b_mask):
            return match_descriptors_pair(
                da, b_desc, ma, b_mask,
                ratio=ratio, max_distance=max_distance,
                col_tile=min(1024, bank.shape[1]),
            )

        return jax.vmap(one)(bank, mbank)

    fn = jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(axis), P(), P(axis)),
            out_specs=P(axis),
        )
    )
    return fn(desc_a, bank_b, mask_a, mask_bank_b)
