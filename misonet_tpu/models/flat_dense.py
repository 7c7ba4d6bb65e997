"""DenseBlockFlat: the DenseBlock (reference model.py:437-482) computed by
the fused Pallas dense-layer kernel (ops/pallas/dense_flat.py).

Identical mathematics and parameter structure to ``models.blocks.DenseBlock``
(param names ``conv{i}_kernel``/``conv{i}_bias``; the InstanceNorms are
parameter-free), so the two are checkpoint-interchangeable.  The difference
is purely computational: tensors stay in the lane-flattened layout, raw
(pre-normalization) in bf16, with per-(batch, channel) statistics carried
alongside; conv + bias + ELU + IN are fused into one kernel per layer and
no intermediate tensor makes an extra HBM pass.

Data contract for a flat tensor bundle: ``(x, scale, mean)`` where
``x`` bf16 [B, C, Wx] holds *raw* values (gap columns zero) and
``scale = 1/sigma``, ``mean`` f32 [B, C] are its InstanceNorm statistics;
consumers see ``(x - mean) * scale``.  An already-normalized tensor is
bundled with ``scale=1, mean=0``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from misonet_tpu.ops.pallas.conv_flat import flatten_tf, unflatten_tf
from misonet_tpu.ops.pallas.dense_flat import (
    dense_layer_flat,
    mask_field,
    stats_to_scale_mean,
)


def tensor_stats(x_flat: jnp.ndarray, t: int, f: int):
    """InstanceNorm statistics of a raw flat tensor (gap columns must be
    zero so the sums see only the T*F valid positions)."""
    x32 = x_flat.astype(jnp.float32)
    count = t * f
    mean = x32.sum(-1) / count
    var = jnp.maximum((x32 * x32).sum(-1) / count - mean * mean, 0.0)
    return jnp.float32(1.0) / jnp.sqrt(var + 1e-5), mean


def normalize_flat(x_flat, scale, mean, mask_row):
    """Materialize the normalized tensor (for block outputs leaving the
    flat pipeline).  mask_row [Wx] re-zeroes the gap columns."""
    y = (x_flat.astype(jnp.float32) - mean[:, :, None]) * scale[:, :, None]
    return y * mask_row


class DenseBlockFlat(nn.Module):
    """Drop-in DenseBlock over flat tensor bundles.

    __call__((x, scale, mean), t=, f=) -> (y, y_scale, y_mean) where y is
    the 5th layer's raw output bundle (reference returns the 5th layer's
    normalized output; normalize on use)."""

    g1: int
    g2: int

    @nn.compact
    def __call__(self, bundle, *, t: int, f: int, tile_m: int = 2048,
                 precise: bool = False):
        x, scale, mean = bundle
        init_ch = x.shape[1]
        widths = [self.g1] * 4 + [self.g2]
        in_chs = [init_ch + i * self.g1 for i in range(5)]

        stack, scales, means = x, scale, mean
        for i in range(5):
            kernel = self.param(
                f"conv{i + 1}_kernel",
                nn.initializers.lecun_normal(),
                (3, 3, in_chs[i], widths[i]),
                jnp.float32,
            )
            bias = self.param(
                f"conv{i + 1}_bias", nn.initializers.zeros,
                (widths[i],), jnp.float32,
            )
            y, su, sq = dense_layer_flat(
                stack, kernel, bias, scales, means,
                t=t, f=f, tile_m=tile_m, precise=precise,
            )
            sc_i, mn_i = stats_to_scale_mean(su, sq, t * f)
            if i < 4:
                stack = jnp.concatenate([stack, y], axis=1)
                scales = jnp.concatenate([scales, sc_i], axis=1)
                means = jnp.concatenate([means, mn_i], axis=1)
            else:
                return y, sc_i, mn_i


def to_flat_bundle(x_nhwc, *, normalized: bool, tile_m: int = 2048,
                   dtype=jnp.bfloat16):
    """NHWC tensor -> flat bundle.  ``normalized=True`` marks a tensor
    that is already in its final (post-IN) form — identity statistics;
    otherwise IN statistics are computed here (one cheap reduce)."""
    b, t, f, c = x_nhwc.shape
    xf = flatten_tf(x_nhwc, tile_m).astype(dtype)
    if normalized:
        scale = jnp.ones((b, c), jnp.float32)
        mean = jnp.zeros((b, c), jnp.float32)
    else:
        scale, mean = tensor_stats(xf, t, f)
    return xf, scale, mean


def from_flat_bundle(bundle, t: int, f: int, dtype, tile_m: int = 2048):
    """Flat bundle -> normalized NHWC tensor (for trunk convs/deconvs)."""
    x, scale, mean = bundle
    mask_row = jnp.asarray(mask_field(t, f, tile_m)[0])
    y = normalize_flat(x, scale, mean, mask_row)
    return unflatten_tf(y, t, f, tile_m).astype(dtype)
