"""Pallas TPU kernel: fused framing + Hann window + real DFT.

The STFT decomposes as frames -> window -> rFFT.  XLA's rfft works on TPU,
but it materializes the [T, nperseg] frame tensor in HBM between the gather
and the FFT.  This kernel keeps one signal row resident in VMEM, builds the
overlapped frames with static slices (nperseg = 4*hop), windows them, and
computes the 256-point real DFT as two MXU matmuls against cos/sin basis
matrices — for small fixed transform sizes the dense DFT hits the MXU harder
than the FFT's butterflies, and nothing round-trips to HBM.

Produces exactly `ops.stft.stft_scaled` (the reference's feature transform,
data.py:77-78) for signals already padded to the scipy boundary convention;
the public wrapper below handles padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from misonet_tpu.config import StftConfig
from misonet_tpu.ops.stft import hann_periodic


def _dft_matrices(length: int) -> tuple[np.ndarray, np.ndarray]:
    """cos/sin bases [length, F] for the real DFT: Z = x @ (cos - i sin)."""
    f = length // 2 + 1
    n = np.arange(length)[:, None]
    k = np.arange(f)[None, :]
    ang = 2.0 * np.pi * n * k / length
    return np.cos(ang).astype(np.float32), -np.sin(ang).astype(np.float32)


def _stft_kernel(num_frames, length, hop, x_ref, win_ref, cos_ref, sin_ref,
                 re_ref, im_ref):
    """One grid step = one signal row.

    x_ref [1, S]; win [1, length]; cos/sin [length, F];
    re/im [1, T, F] outputs."""
    r = length // hop
    blocks = x_ref[0, :].reshape(-1, hop)           # [S/hop, hop]
    parts = [
        jax.lax.slice_in_dim(blocks, j, j + num_frames, axis=0)
        for j in range(r)
    ]
    frames = jnp.concatenate(parts, axis=1)          # [T, r*hop=length]
    frames = frames * win_ref[0, :]
    re_ref[0] = jnp.dot(frames, cos_ref[:, :], preferred_element_type=jnp.float32)
    im_ref[0] = jnp.dot(frames, sin_ref[:, :], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("length", "hop"))
def _stft_rows(x: jnp.ndarray, length: int, hop: int) -> jnp.ndarray:
    """[R, S] padded rows -> [R, T, F] complex64 via the Pallas kernel."""
    rows, s = x.shape
    num_frames = (s - length) // hop + 1
    f = length // 2 + 1
    win = hann_periodic(length).astype(np.float32)[None, :]
    cos, sin = _dft_matrices(length)

    kernel = functools.partial(_stft_kernel, num_frames, length, hop)
    re, im = pl.pallas_call(
        kernel,
        grid=(rows,),
        in_specs=[
            pl.BlockSpec((1, s), lambda r: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, length), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((length, f), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((length, f), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, num_frames, f), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_frames, f), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, num_frames, f), jnp.float32),
            jax.ShapeDtypeStruct((rows, num_frames, f), jnp.float32),
        ],
    )(x.astype(jnp.float32), jnp.asarray(win), jnp.asarray(cos), jnp.asarray(sin))
    return jax.lax.complex(re, im)


def stft_scaled_pallas(x: jnp.ndarray, cfg: StftConfig) -> jnp.ndarray:
    """Drop-in for ops.stft.stft_scaled using the fused Pallas kernel.
    [..., S] -> [..., T, F] complex64."""
    length, hop = cfg.length, cfg.hop
    half = length // 2
    padded = x.shape[-1] + 2 * half
    extra = (-(padded - length)) % hop
    pads = [(0, 0)] * (x.ndim - 1) + [(half, half + extra)]
    xp = jnp.pad(x.astype(jnp.float32), pads)
    lead = xp.shape[:-1]
    rows = 1
    for d in lead:
        rows *= d
    z = _stft_rows(xp.reshape(rows, xp.shape[-1]), length, hop)
    return z.reshape(*lead, *z.shape[1:])
