"""Pallas TPU kernel for descriptor matching (fused matmul + top-2).

The XLA version in ops/matching.py streams column tiles with lax.scan; this
kernel goes one level lower: the (Tr, Tc) similarity tile lives only in VMEM
— the MXU matmul and both directions' per-tile top-2 statistics are fused in
one pass, and nothing O(N^2) ever touches HBM.

Layout is chosen for Mosaic: every grid step writes its tile's row/column
top-2 partials to *statically blocked* outputs, flattened so the block
alignment rules hold (Mosaic requires the last two block dims to be
(8k, 128k) or equal to the array dims — a (1, T) block over a (G, N)
array violates the sublane rule, so we store partials as (1, G*N)):

    row partials: (1, num_col_tiles * N_A)  — block (1, Tr) at (0, c*num_r + r)
    col partials: (1, num_row_tiles * N_B)  — block (1, Tc) at (0, r*num_c + c)

so the kernel needs no cross-tile scratch, no dynamic VMEM slices, and no
grid-order assumptions (dynamic 1-D scratch accumulation trips Mosaic's
alignment prover: "cannot statically prove index is a multiple of 1024").
The cross-tile merge is a tiny O(num_tiles * N) jnp epilogue — ~3 MB of
partials against a 17 GFLOP matmul.

Outputs after the merge match ops/matching.py's six statistics exactly; the
ratio/cross-check decision logic is shared plain jnp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _match_tile_kernel(
    a_ref, b_ref, ma_ref, mb_ref,
    rt1_ref, ri1_ref, rt2_ref, ct1_ref, ci1_ref, ct2_ref,
):
    c = pl.program_id(0)
    r = pl.program_id(1)
    Tr = a_ref.shape[0]
    Tc = b_ref.shape[0]

    # Explicit bf16 operands + DEFAULT precision: the package-wide
    # jax_default_matmul_precision=float32 would otherwise stamp an fp32
    # contract precision on bf16 operands, which Mosaic rejects ("Bad lhs
    # type"); bf16 x bf16 -> f32 accumulate is the intended single-pass MXU
    # path (same semantics as the XLA matcher's explicit bf16 cast).
    sims = jax.lax.dot_general(
        a_ref[:].astype(jnp.bfloat16), b_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )  # (Tr, Tc)
    sims = jnp.where(mb_ref[0, :].reshape(1, Tc) != 0, sims, NEG)
    sims = jnp.where(ma_ref[0, :].reshape(Tr, 1) != 0, sims, NEG)

    # Row-direction top-2 within this tile (global column indices).
    t1 = jnp.max(sims, axis=1)
    arg = jnp.argmax(sims, axis=1).astype(jnp.int32)
    cols = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)
    t2 = jnp.max(jnp.where(cols == arg[:, None], NEG, sims), axis=1)
    rt1_ref[0, :] = t1
    ri1_ref[0, :] = arg + c * Tc
    rt2_ref[0, :] = t2

    # Column-direction top-2 within this tile (global row indices).
    ct1 = jnp.max(sims, axis=0)
    carg = jnp.argmax(sims, axis=0).astype(jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 0)
    ct2 = jnp.max(jnp.where(rows == carg[None, :], NEG, sims), axis=0)
    ct1_ref[0, :] = ct1
    ci1_ref[0, :] = carg + r * Tr
    ct2_ref[0, :] = ct2


def _merge_partials(t1p, i1p, t2p):
    """Merge per-tile top-2 partials along axis 0. (G, N) -> 3 x (N,)."""
    g = jnp.argmax(t1p, axis=0)
    t1 = jnp.take_along_axis(t1p, g[None], axis=0)[0]
    i1 = jnp.take_along_axis(i1p, g[None], axis=0)[0]
    # Runner-up: the winning tile contributes its top2, every other tile its
    # top1.
    G = t1p.shape[0]
    tile_ids = jnp.arange(G, dtype=jnp.int32)[:, None]
    rest = jnp.where(tile_ids == g[None, :], t2p, t1p)
    t2 = jnp.max(rest, axis=0)
    return t1, i1, t2


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
    # Masks as (1, N) int32: 1-D VMEM operands trip Mosaic/XLA tiled-layout
    # mismatches, 2-D (1, tile) blocks are always legal.
    ma = mask_a.astype(jnp.int32).reshape(1, n_a)
    mb = mask_b.astype(jnp.int32).reshape(1, n_b)

    grid = (num_c, num_r)
    out_shapes = (
        jax.ShapeDtypeStruct((1, num_c * n_a), jnp.float32),  # row top1 partials
        jax.ShapeDtypeStruct((1, num_c * n_a), jnp.int32),    # row top1 idx
        jax.ShapeDtypeStruct((1, num_c * n_a), jnp.float32),  # row top2
        jax.ShapeDtypeStruct((1, num_r * n_b), jnp.float32),  # col top1 partials
        jax.ShapeDtypeStruct((1, num_r * n_b), jnp.int32),    # col argmax
        jax.ShapeDtypeStruct((1, num_r * n_b), jnp.float32),  # col top2
    )
    row_out_spec = pl.BlockSpec(
        (1, row_tile), lambda c, r: (0, c * num_r + r), memory_space=pltpu.VMEM
    )
    col_out_spec = pl.BlockSpec(
        (1, col_tile), lambda c, r: (0, r * num_c + c), memory_space=pltpu.VMEM
    )

    rt1, ri1, rt2, ct1, ci1, ct2 = pl.pallas_call(
        _match_tile_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((row_tile, d), lambda c, r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((col_tile, d), lambda c, r: (c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, row_tile), lambda c, r: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, col_tile), lambda c, r: (0, c), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            row_out_spec, row_out_spec, row_out_spec,
            col_out_spec, col_out_spec, col_out_spec,
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(a, b, ma, mb)

    t1, i1, t2 = _merge_partials(
        rt1.reshape(num_c, n_a), ri1.reshape(num_c, n_a), rt2.reshape(num_c, n_a)
    )
    col1, colarg, col2 = _merge_partials(
        ct1.reshape(num_r, n_b), ci1.reshape(num_r, n_b), ct2.reshape(num_r, n_b)
    )
    return t1, i1, t2, col1, colarg, col2


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
