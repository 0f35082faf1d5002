"""Pallas TPU kernels for the SIFT Gaussian pyramid.

Reference parity: the reference's pyramid is cv::SIFT's buildGaussianPyramid
(incremental cv::GaussianBlur per scale, FeatureUtils.cpp:14-36 via
cv2.SIFT).  Here every scale is blurred directly from the octave base with
the composed sigma (Gaussian semigroup — same math up to kernel truncation),
so one vertical + one horizontal pass produces ALL scales of an octave.

Why a kernel at all: XLA:TPU's conv emitter wants channels in the lane
dimension; a 5-channel depthwise blur gets a channel-minor layout padded
5 -> 128 lanes (25x HBM expansion, observed OOM at 5 MP), and per-scale
1-channel convs run ~75x below HBM speed.  The Pallas formulation streams
(TILE_H + 2r, W) slabs through VMEM and applies all C x T taps as
VPU multiply-adds — one HBM read of the base per pass, speed-of-light
traffic, image-minor layouts everywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _tile_h(Wp: int, C: int) -> int:
    """Slab height: the kernel's VMEM footprint (halo scratch + double-
    buffered out blocks) scales with C x tile_h x Wp; shrink the tile for
    wide images (observed: 32-row slabs fit at W=2560 but blow the 16 MB
    scoped-vmem limit at the 6400-px upsampled 3200-px regime)."""
    th = 32
    while th > 8 and C * th * (Wp + 128) * 4 * 3 > 6_000_000:
        th //= 2
    return th


def _blur_v_kernel(k_ref, x_ref, o_ref, scratch, sem):
    """Vertical taps: x (N, Hp + T-1, W) HBM -> o block (1, C, TILE_H, W)."""
    n = pl.program_id(0)
    h = pl.program_id(1)
    C, T = k_ref.shape
    th = o_ref.shape[2]
    cp = pltpu.make_async_copy(
        x_ref.at[n, pl.ds(h * th, scratch.shape[0]), :], scratch, sem)
    cp.start()
    cp.wait()
    for c in range(C):          # static unroll: C x T VPU multiply-adds
        acc = k_ref[c, 0] * scratch[0:th, :]
        for t in range(1, T):
            acc = acc + k_ref[c, t] * scratch[t:t + th, :]
        o_ref[0, c] = acc


def _blur_h_kernel(k_ref, x_ref, o_ref, scratch, sem):
    """Horizontal taps: x (N, C, Hp, Wp + T-1) HBM -> o (1, C, TILE_H, Wp)."""
    n = pl.program_id(0)
    h = pl.program_id(1)
    C, T = k_ref.shape
    th = o_ref.shape[2]
    w = o_ref.shape[3]
    cp = pltpu.make_async_copy(
        x_ref.at[n, :, pl.ds(h * th, th), :], scratch, sem)
    cp.start()
    cp.wait()
    for c in range(C):
        acc = k_ref[c, 0] * scratch[c, :, 0:w]
        for t in range(1, T):
            acc = acc + k_ref[c, t] * scratch[c, :, t:t + w]
        o_ref[0, c] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def blur_multi(base_b: jnp.ndarray, kernels: jnp.ndarray,
               interpret: bool = False) -> jnp.ndarray:
    """(B, H, W) f32 -> (B, C, H, W): per-channel separable Gaussian blurs.

    kernels: (C, T) f32, T odd; channel c is blurred with kernels[c] along
    both axes.  Edges replicate (cv::BORDER_REPLICATE, matching
    ops/sift._blur2d)."""
    B, H, W = base_b.shape
    C, T = kernels.shape
    r = (T - 1) // 2
    Wp = _round_up(W, 128)
    tile_h = _tile_h(Wp, C)
    Hp = _round_up(H, tile_h)
    # Mosaic DMA slices must align to the (8, 128) tile: round the halo
    # slab heights/widths up and over-replicate the edge padding.
    rh = _round_up(T - 1, 8)
    rw = _round_up(T - 1, 128)
    grid = (B, Hp // tile_h)
    kernels = kernels.astype(jnp.float32)

    # Vertical pass. Pad: blur halo (r) + slab/tile alignment, replicated.
    x = jnp.pad(base_b.astype(jnp.float32),
                ((0, 0), (r, (rh - r) + (Hp - H)), (0, Wp - W)), mode="edge")
    v = pl.pallas_call(
        _blur_v_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, C, tile_h, Wp), lambda n, h: (n, 0, h, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, Hp, Wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_h + rh, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(kernels, x)

    # Horizontal pass.  Re-pad from the TRUE width-W edge (the alignment
    # tail may be narrower than the halo when W is already 128-aligned).
    v = jnp.pad(v[:, :, :, :W],
                ((0, 0), (0, 0), (0, 0), (r, (rw - r) + (Wp - W))),
                mode="edge")
    out = pl.pallas_call(
        _blur_h_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, C, tile_h, Wp), lambda n, h: (n, 0, h, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, Hp, Wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, tile_h, Wp + rw), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(kernels, v)

    return out[:, :, :H, :W]
