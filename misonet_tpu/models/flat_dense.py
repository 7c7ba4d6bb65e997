"""DenseBlockFlat: the DenseBlock (reference model.py:437-482) computed by
the fused Pallas dense-layer kernel (ops/pallas/dense_flat.py).

Identical mathematics and parameter structure to ``models.blocks.DenseBlock``
(param names ``conv{i}_kernel``/``conv{i}_bias``; the InstanceNorms are
parameter-free), so the two are checkpoint-interchangeable.  The difference
is purely computational: tensors stay in the lane-flattened layout, raw
(pre-normalization) in bf16, with per-(batch, channel) statistics carried
alongside; conv + bias + ELU + IN fuse into one kernel per layer; and the
DenseNet stack is a *tuple* of tensors handed to the kernel individually —
the concatenation is logical, never an HBM copy.

Data contract for a flat bundle: ``(tensors, scale, mean)`` where
``tensors`` is a tuple of raw [B, g_i, Wx] arrays (gap columns zero) and
``scale = 1/sigma``, ``mean`` f32 [B, sum(g_i)] are their InstanceNorm
statistics; consumers see ``(x - mean) * scale``.  An already-normalized
tensor is bundled with ``scale=1, mean=0``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from misonet_tpu.ops.pallas.conv_flat import (
    _flat_geometry,
    flatten_tf,
    slack_for,
    unflatten_tf,
)
from misonet_tpu.ops.pallas.dense_flat import (
    mask_field,
    stats_to_scale_mean,
)
from misonet_tpu.ops.pallas.flat_grad import (
    conv_down_flat_ad,
    deconv_up_flat_ad,
    enc0_down_flat_ad,
    final_deconv_flat_ad,
)
from misonet_tpu.ops.pallas.stencil_flat import (
    interleave_up,
    s2d_flat,
)


def _fp_of(f: int) -> int:
    """Padded row width the flat layout uses for F bins (conv_flat
    _flat_geometry)."""
    return 128 if f == 127 else max(f + 1, ((f + 1 + 7) // 8) * 8)


def flat_plan_supported(num_bins: int, nb: int, en, de_full) -> bool:
    """True iff the fused flat pipeline supports this model geometry.

    The fused kernels are specialized to the production U-Net shape
    (SURVEY.md §2.1): they require, at every encoder dense level 0-4 and
    its decoder mirror,

      * a power-of-two padded row width Fp (dense_flat.py Fp assert),
      * exact framing Fp == F + 1 so the deconv's doubled grid lines up
        (stencil_flat.py deconv framing assert), which combined with the
        VALID stride-2 ladder means F = 2^k - 1 down the whole ladder,
      * 8-aligned fused-conv output channels (MASK_ROWS) capped at 128.

    Anything else (small test geometries, non-129/257-bin STFTs, narrow
    channel plans) runs the plain XLA ConvBlock/DenseBlock/DeconvBlock
    path, which is fully general.
    """
    if nb < 7 or len(en) < 5 or len(de_full) != nb + 1:
        return False
    f = num_bins - 2  # enc0: 3x3 freq-VALID stride-1 (129 -> 127)
    ladder = [f]
    for _ in range(4):  # encoder trunk convs at flat levels 1-4
        if f < 3:
            return False
        f_next = (f - 3) // 2 + 1
        if _fp_of(f_next) * 2 != _fp_of(f):  # s2d phase split framing
            return False
        f = f_next
        ladder.append(f)
    for fi in ladder:
        fp = _fp_of(fi)
        if fp & (fp - 1) or fp != fi + 1:
            return False
    # fused-conv output channels: encoder levels 0-4 ...
    for i in range(5):
        if en[i] % 8 or en[i] > 128:
            return False
    # ... decoder DenseBlocks (widths cin//2 x4 + cin) and DeconvUps
    for i in range(nb - 5, nb):
        cin = de_full[i] + en[nb - 1 - i]
        if cin % 16 or cin > 128:
            return False
        if i < nb - 1 and (de_full[i + 1] % 8 or de_full[i + 1] > 128):
            return False
    return True


def resolve_flat(setting, *, num_bins: int, nb: int, en, de_full) -> bool:
    """Resolve the ModelConfig.flat_dense setting to a concrete bool.

    False -> plain XLA path.  True -> force the fused Pallas path (raises
    on unsupported geometry; on non-TPU backends the caller must wrap
    execution in ``pltpu.force_tpu_interpret_mode()``).  "auto" -> fused
    path iff running on a TPU backend AND the geometry qualifies.
    """
    if setting is False:
        return False
    ok = flat_plan_supported(num_bins, nb, en, de_full)
    if setting is True:
        if not ok:
            raise ValueError(
                "flat_dense=True but the fused flat pipeline does not "
                f"support this geometry (F={num_bins}, nb={nb}, en={tuple(en)}, "
                f"de={tuple(de_full)}); it needs the F = 2^k - 1 VALID "
                "stride-2 ladder and 8-aligned channels <= 128 — use "
                "flat_dense='auto' to fall back to the XLA path."
            )
        return True
    if setting == "auto":
        import jax

        return ok and jax.default_backend() == "tpu"
    raise ValueError(f"flat_dense must be True, False or 'auto', got {setting!r}")


def pick_tile_m(t: int, f: int, init_ch: int, g1: int, g2: int,
                precise: bool = False) -> int:
    """Lane-tile size for a DenseBlock geometry: small enough that the
    heaviest stacked call's buffers fit VMEM comfortably and the grid has
    a few data tiles to pipeline, large enough to amortize per-tile
    fixed work (mask build, epilogue, DMA ramp).

    The budget models the stacked kernel (ops/pallas/dense_stack.py) at
    the *decoder* mirror of this level, which shares the tile via the
    skip bundle: skip concat doubles the init tensors and widens g2 —
    patch (K0 columns), double-buffered acc in/out, window and output
    tiles, all bf16.  Measured on v5e: F=127/63 levels pick 4096 (enc0
    1.93 -> 1.66 ms, enc1 1.13 -> 0.95 ms), small-F levels stay at
    1024-2048 where a 4096 grid would have too few tiles to pipeline."""
    fp = 128 if f == 127 else max(f + 1, ((f + 1 + 7) // 8) * 8)
    m_out = t * fp
    slack = slack_for(fp)
    r16 = -(-init_ch // 16) * 16
    k0 = 9 * 2 * r16 + 16
    n_tot = 4 * g1 + 2 * g2
    # precise mode stores the patch, windows and acc in f32 — double those
    # terms or the real compiler's 16 MB scoped-vmem limit is exceeded
    # (found by compiling entry()'s float32 flagship on the chip; the
    # interpret backend never enforces the limit)
    el = 4 if precise else 2
    bytes_per_col = el * k0 + 8 * n_tot + 4 * g2 + 2 * el * r16
    tile = 4096
    while tile > 2 * slack and m_out < 4 * tile:
        tile //= 2
    while tile > 2 * slack and bytes_per_col * tile > (13 << 20):
        tile //= 2
    return max(tile, 2 * slack, 512)


def tensor_stats(x_flat: jnp.ndarray, t: int, f: int):
    """InstanceNorm statistics of a raw flat tensor (gap columns must be
    zero so the sums see only the T*F valid positions)."""
    x32 = x_flat.astype(jnp.float32)
    count = t * f
    mean = x32.sum(-1) / count
    var = jnp.maximum((x32 * x32).sum(-1) / count - mean * mean, 0.0)
    return jnp.float32(1.0) / jnp.sqrt(var + 1e-5), mean


class DenseBlockFlat(nn.Module):
    """Drop-in DenseBlock over flat tensor bundles.

    __call__((tensors, scale, mean), t=, f=) -> (y, y_scale, y_mean):
    the 5th layer's *raw* output with its statistics (the reference
    returns the normalized output; normalize on use).

    Computation is the input-grouped stacked formulation
    (ops/pallas/dense_stack.py): one wide-N kernel call per source tensor
    instead of one narrow-N call per layer, which lifts MXU occupancy off
    the N/128 cap.  Parameters are identical to ``models.blocks.DenseBlock``
    (checkpoint-interchangeable)."""

    g1: int
    g2: int

    @nn.compact
    def __call__(self, bundle, *, t: int, f: int, tile_m: int = 2048,
                 precise: bool = False, quant: bool = False):
        from misonet_tpu.ops.pallas.dense_stack import dense_block_stacked

        tensors, scales, means = bundle
        tensors = tuple(tensors)
        init_ch = sum(x.shape[1] for x in tensors)
        widths = [self.g1] * 4 + [self.g2]
        in_chs = [init_ch + i * self.g1 for i in range(5)]

        kernels = [
            self.param(
                f"conv{i + 1}_kernel",
                nn.initializers.lecun_normal(),
                (3, 3, in_chs[i], widths[i]),
                jnp.float32,
            )
            for i in range(5)
        ]
        biases = [
            self.param(
                f"conv{i + 1}_bias", nn.initializers.zeros,
                (widths[i],), jnp.float32,
            )
            for i in range(5)
        ]
        y, su, sq = dense_block_stacked(
            tensors, scales, means, kernels, biases,
            t=t, f=f, tile_m=tile_m, precise=precise, quant=quant,
        )
        sc, mn = stats_to_scale_mean(su, sq, t * f)
        return y, sc, mn


def to_flat_bundle(x_nhwc, *, normalized: bool, tile_m: int = 2048,
                   dtype=jnp.bfloat16):
    """NHWC tensor -> single-tensor flat bundle.  ``normalized=True``
    marks a tensor already in its final (post-IN) form — identity
    statistics; otherwise IN statistics are computed here (one reduce)."""
    b, t, f, c = x_nhwc.shape
    xf = flatten_tf(x_nhwc, tile_m).astype(dtype)
    if normalized:
        scale = jnp.ones((b, c), jnp.float32)
        mean = jnp.zeros((b, c), jnp.float32)
    else:
        scale, mean = tensor_stats(xf, t, f)
    return (xf,), scale, mean


def as_bundle(b):
    """Normalize to the (tensors_tuple, scale, mean) bundle form — single
    raw tensors (e.g. DenseBlockFlat outputs) get wrapped."""
    tensors, scale, mean = b
    if not isinstance(tensors, (tuple, list)):
        tensors = (tensors,)
    return tuple(tensors), scale, mean


def merge_bundles(*bundles):
    """Logical channel-concat of flat bundles (no data movement)."""
    bundles = [as_bundle(b) for b in bundles]
    tensors = sum((tuple(b[0]) for b in bundles), ())
    scale = jnp.concatenate([b[1] for b in bundles], axis=1)
    mean = jnp.concatenate([b[2] for b in bundles], axis=1)
    return tensors, scale, mean


def normalize_flat(x_flat, scale, mean, mask_row):
    """Materialize the normalized tensor (for block outputs leaving the
    flat pipeline).  mask_row [Wx] re-zeroes the gap columns."""
    y = (x_flat.astype(jnp.float32) - mean[:, :, None]) * scale[:, :, None]
    return y * mask_row


def from_flat_bundle(single, t: int, f: int, dtype, tile_m: int = 2048):
    """(y, scale, mean) single raw tensor -> normalized NHWC tensor."""
    x, scale, mean = single
    mask_row = jnp.asarray(mask_field(t, f, tile_m)[0])
    y = normalize_flat(x, scale, mean, mask_row)
    return unflatten_tf(y, t, f, tile_m).astype(dtype)


class _ConvParams(nn.Module):
    """Parameter holder matching nn.Conv / ConvTranspose2dTorch param
    names+shapes, so flat and XLA paths are checkpoint-interchangeable."""

    features: int
    c_in: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, self.c_in, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return kernel, bias


class TrunkDownFlat(nn.Module):
    """Encoder trunk conv (3x3, stride (1,2), freq-VALID) + ELU on flat
    bundles — ConvBlock's fused flat counterpart (same param tree:
    <name>/Conv_0/{kernel,bias}).  Consumes the previous DenseBlock's raw
    bundle, returns the raw conv+ELU output with its IN statistics."""

    features: int

    @nn.compact
    def __call__(self, bundle, *, t: int, f_in: int, tile_in: int,
                 tile_out: int, precise: bool = False):
        (x,), scale, mean = as_bundle(bundle)
        kernel, bias = _ConvParams(self.features, x.shape[1], name="Conv_0")()
        f_out = (f_in - 3) // 2 + 1
        xe, xo = s2d_flat(x, t, f_in, tile_in, tile_out)
        y, su, sq = conv_down_flat_ad(
            xe, xo, kernel, bias, scale, mean,
            t=t, f_in=f_in, tile_m=tile_out, precise=precise,
        )
        sc, mn = stats_to_scale_mean(su, sq, t * f_out)
        return (y,), sc, mn


class DeconvUpFlat(nn.Module):
    """Decoder transpose conv (3x3, stride (1,2), torch geometry) + ELU on
    flat bundles — DeconvBlock's fused flat counterpart (same param tree:
    <name>/ConvTranspose2dTorch_0/{kernel,bias})."""

    features: int

    @nn.compact
    def __call__(self, bundle, *, t: int, f_in: int, tile_in: int,
                 tile_out: int, precise: bool = False):
        (x,), scale, mean = as_bundle(bundle)
        kernel, bias = _ConvParams(
            self.features, x.shape[1], name="ConvTranspose2dTorch_0"
        )()
        y2, su, sq = deconv_up_flat_ad(
            x, kernel, bias, scale, mean,
            t=t, f_in=f_in, tile_m=tile_in, precise=precise,
        )
        y, sc, mn = interleave_up(y2, su, sq, t, f_in, tile_in, tile_out)
        return (y,), sc, mn


class Enc0Flat(nn.Module):
    """Encoder block 0's trunk conv (3x3, stride 1, freq-VALID 129 -> 127,
    no ELU/IN — reference init_Conv2d_, model.py:401-406) computed straight
    from the channel-major complex-stacked input into the flat framing —
    no NHWC transpose, no layout pass (stencil_flat.enc0_down_flat).
    Param tree matches ConvBlock: <name>/Conv_0/{kernel,bias}."""

    features: int

    @nn.compact
    def __call__(self, x_cm, *, t: int, tile_m: int, precise: bool = False):
        kernel, bias = _ConvParams(
            self.features, x_cm.shape[1], name="Conv_0"
        )()
        y = enc0_down_flat_ad(
            x_cm, kernel, bias, t=t, tile_m=tile_m, precise=precise
        )
        b = x_cm.shape[0]
        # bare conv: the consumer sees it unnormalized (identity stats)
        return (
            (y,),
            jnp.ones((b, self.features), jnp.float32),
            jnp.zeros((b, self.features), jnp.float32),
        )


class FinalDeconvFlat(nn.Module):
    """The decoder's final bare ConvTranspose (torch geometry, 127 -> 129
    bins — reference last_Deconv2d_, model.py:418-423) on flat bundles.
    Params ``kernel``/``bias`` directly on this module, matching the XLA
    path's bare ConvTranspose2dTorch named the same way.  Returns
    (bins 0..127 flat [B, N, Wx], bin 128 [B, N, T])."""

    features: int

    @nn.compact
    def __call__(self, bundle, *, t: int, f: int, tile_m: int,
                 precise: bool = False):
        (x,), scale, mean = as_bundle(bundle)
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, x.shape[1], self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return final_deconv_flat_ad(
            x, kernel, bias, scale, mean,
            t=t, f=f, tile_m=tile_m, precise=precise,
        )
