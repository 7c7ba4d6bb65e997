"""The lane-flattened (T, F) layout: geometry and framing helpers shared
by every fused Pallas kernel in this package (dense_flat.py,
dense_stack.py, stencil_flat.py, stencil_bwd.py).

This is the MXU-shaped formulation of the MISO-net dense convolutions
(reference model.py:437-482), whose 24-32 output channels leave XLA's
direct conv at ~8% MXU utilization (PERF.md): with out-channels on the
*lane* axis every matmul pads N to 128, capping utilization at N/128.

The kernels run the conv transposed, out = W[N, 9C] @ P[9C, M]:

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

import jax.numpy as jnp

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


# (The original standalone per-conv kernel this module shipped in round 1
# was superseded by the fused DenseBlock/stencil kernels — dense_flat.py,
# dense_stack.py, stencil_flat.py — which share the framing above; only
# the layout/geometry helpers remain here.)
