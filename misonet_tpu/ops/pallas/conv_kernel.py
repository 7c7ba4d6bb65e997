"""Pallas TPU kernel: 3x3 SAME convolution as explicit im2col matmul.

Targets the DenseBlock convolutions that dominate MISO-net FLOPs.  The MXU
contraction for a direct small-channel conv is K = C_in (24-32) — mostly
padding.  This kernel materializes the im2col patch matrix in VMEM so the
contraction becomes K = 9*C_in (216-288) against the stacked output width N,
and fuses the bias add.

Layout: grid (B, T_tiles).  The padded input for one batch element stays
VMEM-resident across its T tiles (a few MB at these shapes); each step
slices a (TT+2)-high window, builds patches with 9 static slices + concat,
and runs one [TT*F, 9C] x [9C, N] matmul.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(tt, f_out, c_in, n_out, x_ref, w_ref, b_ref, o_ref, patch_ref):
    """x [1, T+2, F+2, C] (full, VMEM-resident); w [9C, N]; b [1, N];
    o [1, TT, F, N] for tile t = program_id(1); patch_ref scratch
    [TT*Fp, 9C] (Fp = F rounded up to the 8-sublane granule).

    The 9 shifted views have different (sublane, lane) offsets, so they are
    materialized through the scratch buffer (stores normalize layouts)
    rather than concatenated as vectors."""
    t = pl.program_id(1)
    f_pad = (-f_out) % 8
    fp = f_out + f_pad
    window = x_ref[0, pl.ds(t * tt, tt + 2), :, :]       # [TT+2, F+2, C]
    for j, (dt, df) in enumerate(
        (dt, df) for dt in range(3) for df in range(3)
    ):
        piece = jax.lax.slice(
            window, (dt, df, 0), (dt + tt, df + f_out, c_in)
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

    x [B, T, F, C]; w [3, 3, C, N]; b [N] -> [B, T, F, N] float32->x.dtype.
    T is padded to a tile multiple internally."""
    bsz, t, f, c = x.shape
    n = w.shape[-1]
    t_pad = (-t) % tile_t
    xp = jnp.pad(x, [(0, 0), (1, 1 + t_pad), (1, 1), (0, 0)])
    t_tot = t + t_pad

    # w [3,3,C,N] -> [9C, N] matching the (dt, df) slice concat order.
    w2 = w.reshape(9 * c, n).astype(x.dtype)

    out = pl.pallas_call(
        functools.partial(_conv_kernel, tile_t, f, c, n),
        grid=(bsz, t_tot // tile_t),
        in_specs=[
            pl.BlockSpec(
                (1, t_tot + 2, f + 2, c),
                lambda bb, tt_: (bb, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
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
            pltpu.VMEM((tile_t * (f + (-f) % 8), 9 * c), x.dtype)
        ],
    )(xp, w2, b.reshape(1, n).astype(jnp.float32))
    return out[:, :t].astype(x.dtype)
