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


def ring_all_pairs_matching(
    desc_bank: np.ndarray,
    mask_bank: np.ndarray,
    mesh: Mesh,
    ratio: float = 0.8,
    max_distance: float = 0.7,
    cross_check: bool = True,
    col_tile: int = 1024,
):
    """All-pairs matching with the descriptor bank SHARDED over the mesh —
    the ring-attention analogue for SfM (SURVEY.md section 5: "rotate
    descriptor shards around the ICI ring").

    Each device keeps only I/n_dev images resident; at ring step k it matches
    its resident queries against the bank shard that arrived via ppermute
    (k hops around the ring), then forwards that shard to its neighbour.
    Per-chip HBM stays O(2 * I/n_dev * N * D) regardless of collection size.

    With cross_check=True matches are mutual, so the B->A map is the inverse
    of the A->B map and only floor(n/2)+1 ring steps are needed (each
    unordered device pair meets once); the missing direction is filled by
    index inversion on host.  Without cross-check the full n steps run.

    desc_bank: (I, N, D) float32, I divisible by mesh size.
    Returns (I, I, N) int32: out[q, b] = match map of image q vs image b
    (-1 where unmatched; diagonal untouched).
    """
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    I, N, D = desc_bank.shape
    assert I % n == 0, "pad the image list to a multiple of the mesh size"
    i_loc = I // n
    steps = (n // 2 + 1) if cross_check else n
    fwd = [(i, (i + 1) % n) for i in range(n)]

    def local(desc, mask):  # (i_loc, N, D), (i_loc, N) per device
        desc = desc.astype(jnp.bfloat16)  # halves ICI traffic; the matmul
        # runs in bf16 anyway (ops/matching.py casts internally).

        def step(carry, _):
            rd, rm = carry

            def one_query(qd, qm):
                def one_bank(bd, bm):
                    return match_descriptors_pair(
                        qd, bd, qm, bm,
                        ratio=ratio, max_distance=max_distance,
                        cross_check=cross_check, col_tile=col_tile,
                    )

                return jax.vmap(one_bank)(rd, rm)

            out = jax.vmap(one_query)(desc, mask)  # (i_loc, i_loc, N)
            rd = jax.lax.ppermute(rd, axis, fwd)
            rm = jax.lax.ppermute(rm, axis, fwd)
            return (rd, rm), out

        _, outs = jax.lax.scan(step, (desc, mask), None, length=steps)
        return outs  # (steps, i_loc_query, i_loc_bank, N)

    fn = jax.jit(
        jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=P(None, axis),
        )
    )
    out = np.asarray(
        fn(jnp.asarray(desc_bank), jnp.asarray(mask_bank))
    )  # (steps, I, i_loc, N): [k, d*i_loc+q, b] = query (d,q) vs shard (d-k)%n

    res = np.full((I, I, N), -1, np.int32)
    covered = np.zeros((n, n), bool)
    for k in range(steps):
        for d in range(n):
            src = (d - k) % n
            res[d * i_loc:(d + 1) * i_loc, src * i_loc:(src + 1) * i_loc] = \
                out[k, d * i_loc:(d + 1) * i_loc]
            covered[d, src] = True
    if cross_check:
        # Mutual matches: derive the uncovered direction by inversion.
        for dq in range(n):
            for ds in range(n):
                if covered[dq, ds] or not covered[ds, dq]:
                    continue
                for q in range(dq * i_loc, (dq + 1) * i_loc):
                    for b in range(ds * i_loc, (ds + 1) * i_loc):
                        m = res[b, q]
                        j = np.nonzero(m >= 0)[0]
                        res[q, b][m[j]] = j
    return res


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
