"""Pallas TPU kernel: 3x3 SAME convolution as explicit im2col matmul.

Targets the DenseBlock convolutions that dominate MISO-net FLOPs.  The MXU
contraction for a direct small-channel conv is K = C_in (24-32) — mostly
padding.  This kernel materializes the im2col patch matrix in VMEM so the
contraction becomes K = 9*C_in (216-288) against the stacked output width N,
and fuses the bias add.

Memory strategy: the input stays in HBM; each (batch, T-tile) grid step DMAs
its (TT+2)-high window into a VMEM scratch (windows overlap by 2 rows, which
BlockSpec tiling cannot express), builds patches with 9 static slices staged
through a second scratch (stores normalize the 9 different vector-layout
offsets), and runs one [TT*Fp, 9C] x [9C, N] matmul.

Mosaic constraints found while bringing this up (see PERF.md):
  * reshapes merging sublane dims need the minor dim padded to 8;
  * vectors sliced at different (sublane, lane) offsets cannot be
    concatenated directly — stage through a scratch ref.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(
    tt, f_out, c_in, n_out, x_hbm, w_ref, b_ref, o_ref, win_ref, patch_ref, sem
):
    """x_hbm [B, T+2, F+2, C] (HBM); w [9C, N]; b [1, N];
    o [1, TT, F, N]; win_ref VMEM [TT+2, F+2, C]; patch_ref VMEM
    [TT*Fp, 9C]."""
    bb = pl.program_id(0)
    t = pl.program_id(1)
    copy = pltpu.make_async_copy(
        x_hbm.at[bb, pl.ds(t * tt, tt + 2)], win_ref, sem
    )
    copy.start()

    f_pad = (-f_out) % 8
    fp = f_out + f_pad
    copy.wait()
    for j, (dt, df) in enumerate(
        (dt, df) for dt in range(3) for df in range(3)
    ):
        piece = jax.lax.slice(
            win_ref[:, :, :], (dt, df, 0), (dt + tt, df + f_out, c_in)
        )                                                # [TT, F, C]
        if f_pad:
            piece = jnp.pad(piece, ((0, 0), (0, f_pad), (0, 0)))
        patch_ref[:, j * c_in : (j + 1) * c_in] = piece.reshape(
            tt * fp, c_in
        )
    out = jnp.dot(
        patch_ref[:, :], w_ref[:, :], preferred_element_type=jnp.float32
    ).reshape(tt, fp, n_out)
    o_ref[0] = out[:, :f_out, :] + b_ref[0, :]


@functools.partial(jax.jit, static_argnames=("tile_t",))
def conv3x3_same_pallas(
    x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray, tile_t: int = 32
) -> jnp.ndarray:
    """3x3 stride-1 SAME conv, NHWC.

    x [B, T, F, C]; w [3, 3, C, N]; b [N] -> [B, T, F, N] in x.dtype.
    T is padded to a tile multiple internally."""
    bsz, t, f, c = x.shape
    n = w.shape[-1]
    t_pad = (-t) % tile_t
    xp = jnp.pad(x, [(0, 0), (1, 1 + t_pad), (1, 1), (0, 0)])
    t_tot = t + t_pad
    fp = f + (-f) % 8

    # w [3,3,C,N] -> [9C, N] matching the (dt, df) slice concat order.
    w2 = w.reshape(9 * c, n).astype(x.dtype)

    out = pl.pallas_call(
        functools.partial(_conv_kernel, tile_t, f, c, n),
        grid=(bsz, t_tot // tile_t),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((9 * c, n), lambda bb, tt_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda bb, tt_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_t, f, n),
            lambda bb, tt_: (bb, tt_, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, t_tot, f, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_t + 2, f + 2, c), x.dtype),
            pltpu.VMEM((tile_t * fp, 9 * c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(xp, w2, b.reshape(1, n).astype(jnp.float32))
    return out[:, :t].astype(x.dtype)
