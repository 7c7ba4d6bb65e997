"""Pallas TPU kernel: 3x3 SAME conv on a lane-flattened (T, F) layout.

This is the MXU-shaped formulation of the MISO-net dense convolutions
(reference model.py:437-482), whose 24-32 output channels leave XLA's
direct conv at ~8% MXU utilization (PERF.md): with out-channels on the
*lane* axis every matmul pads N to 128, capping utilization at N/128.

Here the conv runs transposed, out = W[N, 9C] @ P[9C, M]:

  * the spectrogram is flattened to position columns ``col = t*Fp + f``
    with the time-frequency axis on *lanes* (dense 128-aligned tiles)
    and channels on sublanes;
  * each of the 9 taps of the 3x3 stencil becomes a static lane
    *rotation* of a VMEM window (Mosaic's alignment rules forbid
    unaligned lane slices, but ``tpu.dynamic_rotate`` is legal — 32-bit
    only, so windows are kept f32 and cast on store);
  * the 9 rotated pieces are stacked at *sublane* offsets (8-aligned,
    always legal) to form the dense im2col patch ``P [9C, TM]`` —
    contraction depth 9C instead of C;
  * one matmul per tile computes all N outputs with N on the *sublane*
    axis of the result, where padding granularity is 8, not 128;
  * bias + optional ELU + the (T, F)-validity mask fuse into the
    epilogue.

Layout framing: arrays are ``[B, C, (n_m + 2) * TM]`` — one zero pad
block of TM lanes on each side of the n_m data tiles.  Position p lives
at column ``TM + p``.  The pad blocks give every window DMA (which
reaches 256 lanes past the tile on both sides) a legal 128-aligned
source, and kernels write zeros into them so *output framing equals
input framing* and layers chain with no re-padding pass.  Rows are
padded to ``Fp >= F + 1`` so the zero gap between consecutive rows
doubles as the SAME-padding halo: position (t, f=-1) reads row t-1's
pad column, which is zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def slack_for(fp: int) -> int:
    """Window slack: smallest multiple of 128 covering the max tap shift
    fp+1.  Must not exceed tile_m (the pad-block width)."""
    return 128 * (-(-(fp + 1) // 128))


def _flat_geometry(t: int, f: int, tile_m: int) -> tuple[int, int, int, int]:
    """(Fp, m_out, n_m, x_width) for a [T, F] plane."""
    fp = 128 if f == 127 else max(f + 1, ((f + 1 + 7) // 8) * 8)
    m_out = t * fp
    n_m = -(-m_out // tile_m)
    x_width = (n_m + 2) * tile_m
    return fp, m_out, n_m, x_width


def flatten_tf(x: jnp.ndarray, tile_m: int = 2048) -> jnp.ndarray:
    """[B, T, F, C] (any real dtype) -> f32 [B, C, Wx] flat layout."""
    b, t, f, c = x.shape
    fp, m_out, n_m, x_width = _flat_geometry(t, f, tile_m)
    x = x.astype(jnp.float32)
    x = jnp.pad(x, [(0, 0), (0, 0), (0, fp - f), (0, 0)])
    x = x.transpose(0, 3, 1, 2).reshape(b, c, m_out)
    return jnp.pad(x, [(0, 0), (0, 0), (tile_m, x_width - tile_m - m_out)])


def unflatten_tf(y: jnp.ndarray, t: int, f: int, tile_m: int = 2048) -> jnp.ndarray:
    """[B, N, Wx] flat layout -> [B, T, F, N]."""
    b, n, _ = y.shape
    fp, m_out, _, _ = _flat_geometry(t, f, tile_m)
    y = y[:, :, tile_m : tile_m + m_out].reshape(b, n, t, fp)[:, :, :, :f]
    return y.transpose(0, 2, 3, 1)


def load_window(x_hbm, win_ref, sem, bb, mm, tile_m, slack):
    """Start the [C, TM + 2*slack] window DMA for data tile mm (0-based).
    Window covers positions [mm*TM - slack, mm*TM + TM + slack); the
    array's pad blocks make the source always in-bounds and the offset
    is a multiple of 128."""
    copy = pltpu.make_async_copy(
        x_hbm.at[bb, :, pl.ds(mm * tile_m + tile_m - slack,
                              tile_m + 2 * slack)],
        win_ref,
        sem,
    )
    copy.start()
    return copy


def tap_patches(dst_ref, src, rows, fp, tile_m, to_dtype):
    """Write the 9 tap patches of window ``src`` [rows, TM+2*SLACK] into
    ``dst_ref`` [9*rows, TM] (sublane-blocked by tap j = 3*dt + df).
    Returns the center-tap piece as f32.

    Window index of position (tile offset i, tap (dt, df)) is
    ``i + slack + (dt-1)*fp + (df-1)``.  When fp is a multiple of 128
    the dt-shifts are lane-tile-aligned, so 3 rotations (one per df)
    cover all 9 taps via aligned slices; otherwise 9 rotations."""
    w_win = src.shape[-1]
    slack = (w_win - tile_m) // 2
    center = None
    if fp % 128 == 0:
        for df in range(3):
            s0 = slack - fp + df - 1
            rolled = pltpu.roll(src, w_win - s0, 1)
            for dt in range(3):
                j = 3 * dt + df
                piece = rolled[:, dt * fp : dt * fp + tile_m]
                dst_ref[j * rows : (j + 1) * rows, :] = piece.astype(to_dtype)
                if dt == 1 and df == 1:
                    center = piece
    else:
        for dt in range(3):
            for df in range(3):
                j = 3 * dt + df
                s = slack + (dt - 1) * fp + (df - 1)
                rolled = pltpu.roll(src, w_win - s, 1)
                piece = rolled[:, :tile_m]
                dst_ref[j * rows : (j + 1) * rows, :] = piece.astype(to_dtype)
                if dt == 1 and df == 1:
                    center = piece
    return center


def _conv_kernel(c, n, n_m, tile_m, fp, m_out, f, fuse_elu,
                 x_hbm, w_ref, b_ref, o_ref, win_ref, p_ref, sem):
    bb = pl.program_id(0)
    m = pl.program_id(1)          # 0 and n_m+1 are pad blocks

    @pl.when((m == 0) | (m == n_m + 1))
    def _():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    @pl.when((m > 0) & (m <= n_m))
    def _():
        mm = m - 1
        slack = (win_ref.shape[-1] - tile_m) // 2
        copy = load_window(x_hbm, win_ref, sem, bb, mm, tile_m, slack)
        copy.wait()
        tap_patches(p_ref, win_ref[:, :], c, fp, tile_m, p_ref.dtype)
        acc = jax.lax.dot_general(
            w_ref[:, :], p_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc + b_ref[:, :]
        if fuse_elu:
            # expm1 has no Mosaic lowering; exp(x)-1 is fine for x <= 0
            acc = jnp.where(acc > 0, acc, jnp.exp(jnp.minimum(acc, 0.0)) - 1.0)
        # zero the F-gap and tail columns
        col = jax.lax.broadcasted_iota(jnp.int32, (n, tile_m), 1) + mm * tile_m
        valid = ((col % fp) < f) & (col < m_out)
        o_ref[0] = jnp.where(valid, acc, 0.0).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("t", "f", "tile_m", "fuse_elu", "out_dtype"),
)
def conv3x3_flat(
    x_flat: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    t: int,
    f: int,
    tile_m: int = 2048,
    fuse_elu: bool = False,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """3x3 stride-1 SAME conv over the flat layout.

    x_flat  [B, C, Wx] f32 from :func:`flatten_tf` (C <= 128)
    w       [3, 3, C, N] (HWIO, as flax nn.Conv stores it)
    bias    [N]
    returns [B, N, Wx] ``out_dtype`` in the same framing, gap/tail/pad
    columns zeroed.
    """
    b, c, _ = x_flat.shape
    n = w.shape[-1]
    fp, m_out, n_m, x_width = _flat_geometry(t, f, tile_m)
    assert x_flat.shape[2] == x_width, (x_flat.shape, x_width)
    slack = slack_for(fp)
    assert slack <= tile_m, (slack, tile_m)
    w2 = w.reshape(9 * c, n).T.astype(jnp.bfloat16)
    b2 = bias.reshape(n, 1).astype(jnp.float32)

    kern = functools.partial(
        _conv_kernel, c, n, n_m, tile_m, fp, m_out, f, fuse_elu
    )
    return pl.pallas_call(
        kern,
        grid=(b, n_m + 2),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((n, 9 * c), lambda bb, m: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda bb, m: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n, tile_m), lambda bb, m: (bb, 0, m),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, x_width), jnp.dtype(out_dtype)),
        scratch_shapes=[
            pltpu.VMEM((c, tile_m + 2 * slack), x_flat.dtype),
            pltpu.VMEM((9 * c, tile_m), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
    )(x_flat, w2, b2)


def conv3x3_nhwc_via_flat(
    x: jnp.ndarray, w: jnp.ndarray, bias: jnp.ndarray,
    tile_m: int = 2048, fuse_elu: bool = False,
) -> jnp.ndarray:
    """Convenience NHWC wrapper (flatten -> kernel -> unflatten)."""
    b, t, f, c = x.shape
    xf = flatten_tf(x, tile_m)
    y = conv3x3_flat(xf, w, bias, t=t, f=f, tile_m=tile_m, fuse_elu=fuse_elu)
    return unflatten_tf(y, t, f, tile_m)
