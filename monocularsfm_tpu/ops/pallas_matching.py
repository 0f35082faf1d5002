"""Pallas TPU kernel for descriptor matching (fused matmul + top-2).

The XLA version in ops/matching.py streams column tiles with lax.scan; this
kernel goes one level lower: the similarity tile lives only in VMEM, the MXU
matmul and both directions' running top-2 statistics are fused in one pass,
and nothing O(N^2) ever touches HBM.

Grid layout: (num_col_tiles, num_row_tiles) — row index is the fast axis, so
for a fixed column tile the kernel sweeps all rows, finishing that tile's
column statistics (written at the last row step), while per-row statistics
accumulate in VMEM scratch across the whole kernel and are flushed on the
final grid step.

Outputs (all (N,) vectors): row top1/top2 similarity + top1 index, column
top1/top2 similarity + column argmax — the same six statistics the scan
version produces; the ratio/cross-check decision logic is shared plain jnp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _match_kernel(
    a_ref, b_ref, ma_ref, mb_ref,
    rt1_ref, ri1_ref, rt2_ref, ct1_ref, ci1_ref, ct2_ref,
    acc_t1, acc_i1, acc_t2, col_t1, col_i1, col_t2,
):
    c = pl.program_id(0)
    r = pl.program_id(1)
    num_c = pl.num_programs(0)
    num_r = pl.num_programs(1)
    Tr = a_ref.shape[0]
    Tc = b_ref.shape[0]

    # Row accumulators init on the very first grid step (they span all rows).
    @pl.when((c == 0) & (r == 0))
    def _():
        acc_t1[:] = jnp.full_like(acc_t1, NEG)
        acc_i1[:] = jnp.zeros_like(acc_i1)
        acc_t2[:] = jnp.full_like(acc_t2, NEG)

    # Column accumulators init at each column tile's first row step.
    @pl.when(r == 0)
    def _():
        col_t1[:] = jnp.full_like(col_t1, NEG)
        col_i1[:] = jnp.zeros_like(col_i1)
        col_t2[:] = jnp.full_like(col_t2, NEG)

    sims = jax.lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Tr, Tc)
    sims = jnp.where(mb_ref[:].reshape(1, Tc) != 0, sims, NEG)
    sims = jnp.where(ma_ref[:].reshape(Tr, 1) != 0, sims, NEG)

    # ---- row-direction top-2 within this tile ----
    t1 = jnp.max(sims, axis=1)
    arg = jnp.argmax(sims, axis=1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)
    t2 = jnp.max(jnp.where(cols == arg[:, None], NEG, sims), axis=1)
    gidx = arg + c * Tc

    row_slice = pl.ds(r * Tr, Tr)
    old_t1 = acc_t1[row_slice]
    old_i1 = acc_i1[row_slice]
    old_t2 = acc_t2[row_slice]
    take = t1 > old_t1
    new_t1 = jnp.where(take, t1, old_t1)
    new_i1 = jnp.where(take, gidx, old_i1)
    loser = jnp.where(take, old_t1, t1)
    new_t2 = jnp.maximum(loser, jnp.maximum(old_t2, t2))
    acc_t1[row_slice] = new_t1
    acc_i1[row_slice] = new_i1
    acc_t2[row_slice] = new_t2

    # ---- column-direction top-2 within this tile ----
    ct1 = jnp.max(sims, axis=0)
    carg = jnp.argmax(sims, axis=0).astype(jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 0)
    ct2 = jnp.max(jnp.where(rows == carg[None, :], NEG, sims), axis=0)
    gcarg = carg + r * Tr

    oc1 = col_t1[:]
    oi1 = col_i1[:]
    oc2 = col_t2[:]
    ctake = ct1 > oc1
    nc1 = jnp.where(ctake, ct1, oc1)
    ni1 = jnp.where(ctake, gcarg, oi1)
    closer = jnp.where(ctake, oc1, ct1)
    nc2 = jnp.maximum(closer, jnp.maximum(oc2, ct2))
    col_t1[:] = nc1
    col_i1[:] = ni1
    col_t2[:] = nc2

    # Flush column stats when this column tile's row sweep completes.
    @pl.when(r == num_r - 1)
    def _():
        ct1_ref[:] = col_t1[:]
        ci1_ref[:] = col_i1[:]
        ct2_ref[:] = col_t2[:]

    # Flush row stats on the overall last step.
    @pl.when((c == num_c - 1) & (r == num_r - 1))
    def _():
        rt1_ref[:] = acc_t1[:]
        ri1_ref[:] = acc_i1[:]
        rt2_ref[:] = acc_t2[:]


@functools.partial(
    jax.jit, static_argnames=("row_tile", "col_tile", "interpret")
)
def _match_stats_pallas(
    desc_a, desc_b, mask_a, mask_b,
    row_tile: int = 512, col_tile: int = 512, interpret: bool = False,
):
    n_a, d = desc_a.shape
    n_b = desc_b.shape[0]
    assert n_a % row_tile == 0 and n_b % col_tile == 0
    num_r = n_a // row_tile
    num_c = n_b // col_tile

    a = desc_a.astype(jnp.bfloat16)
    b = desc_b.astype(jnp.bfloat16)
    ma = mask_a.astype(jnp.int32)
    mb = mask_b.astype(jnp.int32)

    grid = (num_c, num_r)
    out_shapes = (
        jax.ShapeDtypeStruct((n_a,), jnp.float32),  # row top1
        jax.ShapeDtypeStruct((n_a,), jnp.int32),    # row top1 idx
        jax.ShapeDtypeStruct((n_a,), jnp.float32),  # row top2
        jax.ShapeDtypeStruct((n_b,), jnp.float32),  # col top1
        jax.ShapeDtypeStruct((n_b,), jnp.int32),    # col argmax (row idx)
        jax.ShapeDtypeStruct((n_b,), jnp.float32),  # col top2
    )
    row_out_spec = pl.BlockSpec((n_a,), lambda c, r: (0,), memory_space=pltpu.VMEM)
    col_out_spec = pl.BlockSpec((col_tile,), lambda c, r: (c,), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _match_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, d), lambda c, r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((col_tile, d), lambda c, r: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile,), lambda c, r: (r,), memory_space=pltpu.VMEM),
            pl.BlockSpec((col_tile,), lambda c, r: (c,), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            row_out_spec, row_out_spec, row_out_spec,
            col_out_spec, col_out_spec, col_out_spec,
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((n_a,), jnp.float32),
            pltpu.VMEM((n_a,), jnp.int32),
            pltpu.VMEM((n_a,), jnp.float32),
            pltpu.VMEM((col_tile,), jnp.float32),
            pltpu.VMEM((col_tile,), jnp.int32),
            pltpu.VMEM((col_tile,), jnp.float32),
        ],
        interpret=interpret,
    )(a, b, ma, mb)


@functools.partial(
    jax.jit,
    static_argnames=("ratio", "max_distance", "cross_check", "row_tile",
                     "col_tile", "interpret"),
)
def match_descriptors_pair_pallas(
    desc_a, desc_b, mask_a, mask_b,
    ratio: float = 0.8,
    max_distance: float = 0.7,
    cross_check: bool = True,
    row_tile: int = 512,
    col_tile: int = 512,
    interpret: bool = False,
):
    """Drop-in equivalent of ops.matching.match_descriptors_pair."""
    n_a = desc_a.shape[0]
    n_b = desc_b.shape[0]
    t1, i1, t2, col1, colarg, col2 = _match_stats_pallas(
        desc_a, desc_b, mask_a, mask_b,
        row_tile=row_tile, col_tile=col_tile, interpret=interpret,
    )

    def dist(sim):
        return jnp.sqrt(jnp.maximum(2.0 - 2.0 * sim, 0.0))

    d1, d2 = dist(t1), dist(t2)
    ok = mask_a & (t1 > NEG / 2)
    ok &= d1 < ratio * d2
    ok &= d1 <= max_distance
    if cross_check:
        j = jnp.clip(i1, 0, n_b - 1)
        ok &= colarg[j] == jnp.arange(n_a, dtype=jnp.int32)
        ok &= dist(col1[j]) < ratio * dist(col2[j])
    return jnp.where(ok, i1, -1).astype(jnp.int32)
