"""The MISO separation / enhancement networks.

One parameterized U-Net/TCN (``MISONet``) covers all three reference models —
they differ only in input channel count and output speaker count
(reference model.py: MISO_1 :8-163, MISO_2 :166-278, MISO_3 :282-395):

  * MISO1 (separation):   input = C-mic mixture            -> 2 speakers
  * MISO2 (joint enh.):   input = mixture + 2xMISO1 + 2xBF -> 2 speakers
  * MISO3 (per-spk enh.): input = mixture + 1xMISO1 + 1xBF -> 1 speaker

API: complex spectrogram in, complex spectrogram out, exactly like the
reference's ``forward(complex STFT) -> complex STFT`` (model.py:76-111).
Internally complex is handled as stacked real channels in the same
(all-real, all-imag) order as the reference (model.py:80,:105-106), but laid
out NHWC ([B, T, F, C]) for the TPU MXU instead of torch's NCHW.

Architecture (reference model.py:40-73 + NN_BSS.yml:120-123):

  encoder   7 blocks; freq ladder 129->127->63->31->15->7->3->1,
            channels [2*Cin, 24, 32, 32, 32, 32, 64, 128];
            blocks 0-4 carry DenseBlocks, block 0 has no ELU/IN on its conv
  TCN       2 repeats x 7 dilated temporal blocks at [B, T, 128]
  decoder   mirrors the encoder with skip concatenation (channels double),
            DenseBlocks on blocks 2-6, final transposed conv bare
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from misonet_tpu.config import ModelConfig
from misonet_tpu.models.blocks import (
    ConvBlock,
    DeconvBlock,
    ConvTranspose2dTorch,
    DenseBlock,
    TemporalConvNet,
)
from misonet_tpu.models.flat_dense import (
    DeconvUpFlat,
    DenseBlockFlat,
    Enc0Flat,
    FinalDeconvFlat,
    TrunkDownFlat,
    from_flat_bundle,
    merge_bundles,
    pick_tile_m,
    resolve_flat,
    to_flat_bundle,
)


def _dtype_of(cfg: ModelConfig) -> jnp.dtype:
    return jnp.dtype(cfg.compute_dtype)


class MISONet(nn.Module):
    """U-Net + TCN complex spectral mapping network.

    Input:  complex64 [B, C_in, T, F]   (F = 129 for the 8 kHz config)
    Output: complex64 [B, num_spks, T, F]
    """

    cfg: ModelConfig
    num_spks: int = 2
    # Mesh for the sequence-parallel TCN (cfg.sequence_parallel); static
    # model attribute like cfg (jax.sharding.Mesh is hashable).
    sp_mesh: object = None

    @nn.compact
    def __call__(self, mixture: jnp.ndarray) -> jnp.ndarray:
        assert mixture.ndim == 4, f"expected [B, C, T, F], got {mixture.shape}"
        dtype = _dtype_of(self.cfg)
        nb = self.cfg.num_bottleneck
        en = list(self.cfg.en_channels)
        de = list(self.cfg.de_channels) + [2 * self.num_spks]
        assert len(en) == nb and len(de) == nb + 1

        # Complex -> stacked real channels (channel-major, like the input).
        x_cm = jnp.concatenate([mixture.real, mixture.imag], axis=1)

        # --- encoder ---------------------------------------------------
        # Flat path: levels 0-4 stay in the lane-flattened bundle form end
        # to end — enc0's trunk conv reads the channel-major input
        # directly (no NHWC transpose at all), the strided trunk convs,
        # DenseBlocks, and skip hand-offs all operate on raw tensors + IN
        # statistics, with no NHWC materialization between the input and
        # enc5.
        flat = resolve_flat(
            self.cfg.flat_dense,
            num_bins=mixture.shape[3], nb=nb, en=en, de_full=de,
        )
        precise = self.cfg.compute_dtype == "float32"
        fdt = jnp.float32 if precise else jnp.bfloat16
        # int8 DenseBlock matmuls (decode-only, ModelConfig.quant_int8)
        qnt = bool(getattr(self.cfg, "quant_int8", False)) and not precise
        if not flat:
            x = x_cm.transpose(0, 2, 3, 1).astype(dtype)  # [B, T, F, 2C]
        skips = []       # NHWC arrays, or (bundle, f, tile) on the flat path
        bundle = None
        tc = fc = tile = None
        for i in range(nb):
            freq_stride = 1 if i in (0, nb - 1) else 2
            if flat and i == 0:
                tc, fc = x_cm.shape[2], mixture.shape[3] - 2
                tile = pick_tile_m(tc, fc, en[0], en[0], en[0],
                                   precise=precise)
                # enc0's trunk has no ELU/IN (reference init_Conv2d_,
                # model.py:401-406): consumed as-is -> identity stats
                bundle = Enc0Flat(en[0], name="enc0")(
                    x_cm, t=tc, tile_m=tile, precise=precise
                )
                bundle = DenseBlockFlat(
                    en[0], en[0], name="enc0_dense"
                )(bundle, t=tc, f=fc, tile_m=tile, precise=precise,
                  quant=qnt)
                skips.append((bundle, fc, tile))
                continue
            if flat and 1 <= i <= 4:
                f_out = (fc - 3) // 2 + 1
                tile_out = pick_tile_m(tc, f_out, en[i], en[i], en[i],
                                       precise=precise)
                bundle = TrunkDownFlat(en[i], name=f"enc{i}")(
                    bundle, t=tc, f_in=fc, tile_in=tile, tile_out=tile_out,
                    precise=precise,
                )
                fc, tile = f_out, tile_out
                bundle = DenseBlockFlat(
                    en[i], en[i], name=f"enc{i}_dense"
                )(bundle, t=tc, f=fc, tile_m=tile, precise=precise,
                  quant=qnt)
                skips.append((bundle, fc, tile))
                continue
            if flat and i == 5:
                x = from_flat_bundle(bundle, tc, fc, dtype, tile_m=tile)
            x = ConvBlock(
                en[i],
                strides=(1, freq_stride),
                act_norm=(i != 0),
                dtype=dtype,
                name=f"enc{i}",
            )(x)
            if i < 5:
                x = DenseBlock(
                    en[i], en[i], dtype=dtype, name=f"enc{i}_dense"
                )(x)
            skips.append(x)

        # --- TCN bottleneck ([B, T, 1, C] -> [B, T, C]) -----------------
        b, t, f_bott, c = x.shape
        assert f_bott == 1, (
            f"bottleneck frequency axis must reduce to 1, got {f_bott} "
            f"(input F must be 129 for the default 7-block plan)"
        )
        if self.cfg.sequence_parallel and self.sp_mesh is not None:
            from misonet_tpu.parallel.tcn_sp import TemporalConvNetSP

            h = TemporalConvNetSP(
                repeats=self.cfg.tcn_repeats,
                blocks=self.cfg.tcn_blocks,
                features=self.cfg.tcn_channels,
                norm_type=self.cfg.norm_type,
                mesh=self.sp_mesh,
                name="tcn",
            )(x[:, :, 0, :])
        else:
            h = TemporalConvNet(
                repeats=self.cfg.tcn_repeats,
                blocks=self.cfg.tcn_blocks,
                features=self.cfg.tcn_channels,
                norm_type=self.cfg.norm_type,
                dtype=dtype,
                name="tcn",
            )(x[:, :, 0, :])
        x = h[:, :, None, :]

        # --- decoder with skip concatenation ----------------------------
        # Flat path: from dec2 on, the decoder tensor, the skip concat
        # (logical — separate tensors, no copy), the DenseBlock, and the
        # frequency-up deconvs all stay in bundle form; NHWC reappears
        # only for the final stride-1 transpose conv.
        bundle = None
        for i in range(nb):
            skip = skips[nb - 1 - i]
            if i >= nb - 5 and flat:
                skip_b, fc, tile = skip
                if i == nb - 5:  # entering the flat pipeline from the
                    # last XLA decoder level's output
                    assert x.shape[2] == fc, (x.shape, fc)
                    bundle = to_flat_bundle(
                        x, normalized=True, tile_m=tile, dtype=fdt
                    )
                merged = merge_bundles(bundle, skip_b)
                cin = sum(t_.shape[1] for t_ in merged[0])
                bundle = DenseBlockFlat(
                    cin // 2, cin, name=f"dec{i}_dense"
                )(merged, t=tc, f=fc, tile_m=tile, precise=precise,
                  quant=qnt)
                if i == nb - 1:
                    # final bare transpose conv fused on the flat layout;
                    # output assembled channel-major directly (no NHWC)
                    y, y128 = FinalDeconvFlat(de[i + 1], name=f"dec{i}")(
                        bundle, t=tc, f=fc, tile_m=tile, precise=precise
                    )
                    b = y.shape[0]
                    main = y[:, :, tile : tile + tc * (fc + 1)].reshape(
                        b, de[i + 1], tc, fc + 1
                    ).astype(jnp.float32)
                    out = jnp.concatenate(
                        [main, y128.astype(jnp.float32)[:, :, :, None]],
                        axis=3,
                    )  # [B, 2*num_spks, T, 129]
                    real, imag = jnp.split(out, 2, axis=1)
                    return jax.lax.complex(real, imag)
                tile_next = skips[nb - 2 - i][2]
                bundle = DeconvUpFlat(de[i + 1], name=f"dec{i}")(
                    bundle, t=tc, f_in=fc, tile_in=tile,
                    tile_out=tile_next, precise=precise,
                )
                continue
            elif i >= 2:
                x = jnp.concatenate([x, skip], axis=-1)
                cin = x.shape[-1]
                x = DenseBlock(
                    cin // 2, cin, dtype=dtype, name=f"dec{i}_dense"
                )(x)
            else:
                x = jnp.concatenate([x, skip], axis=-1)
            if i == nb - 1:
                x = ConvTranspose2dTorch(
                    de[i + 1], strides=(1, 1), dtype=dtype, name=f"dec{i}"
                )(x)
            else:
                freq_stride = 1 if i == 0 else 2
                x = DeconvBlock(
                    de[i + 1], strides=(1, freq_stride), dtype=dtype, name=f"dec{i}"
                )(x)

        # NHWC -> NCHW, stacked real -> complex (model.py:103-111).
        x = x.transpose(0, 3, 1, 2).astype(jnp.float32)
        real, imag = jnp.split(x, 2, axis=1)
        return jax.lax.complex(real, imag)


def make_miso1(cfg: ModelConfig, num_spks: int = 2, sp_mesh=None) -> MISONet:
    """Separation net: C-mic complex mixture -> num_spks sources at the
    reference mic (reference model.py:8-111, run.py:65-68).  ``sp_mesh``
    activates the sequence-parallel TCN when cfg.sequence_parallel."""
    return MISONet(cfg=cfg, num_spks=num_spks, sp_mesh=sp_mesh)


def make_miso2(cfg: ModelConfig, num_spks: int = 2, sp_mesh=None) -> MISONet:
    """Joint enhancement net over mixture + per-speaker MISO1 + BF stacks
    (input channels C + 2*num_spks; reference model.py:166-278)."""
    return MISONet(cfg=cfg, num_spks=num_spks, sp_mesh=sp_mesh)


def make_miso3(cfg: ModelConfig, sp_mesh=None) -> MISONet:
    """Per-speaker enhancement net over mixture + 1 MISO1 + 1 BF channel
    (input channels C + 2; reference model.py:282-395, run.py:127)."""
    return MISONet(cfg=cfg, num_spks=1, sp_mesh=sp_mesh)


def enhance_input(
    mixture: jnp.ndarray, miso1: jnp.ndarray, bf: jnp.ndarray
) -> jnp.ndarray:
    """Stack the enhancement-net conditioning channels: mixture [B, C, T, F]
    + MISO1 estimates [B, S, T, F] + beamformed estimates [B, S, T, F]
    -> [B, C+2S, T, F] (reference model.py:233-247, :350-364).

    NOTE the reference's trainer/tester actually pass (mix, BF, MISO1) into
    forward(mix, MISO1, BF) — the two conditioning blocks are swapped
    relative to the parameter names, consistently at both train and test
    time (SURVEY.md §2.4).  Semantically the net just sees two conditioning
    channels, so we define the canonical order (MISO1 then BF) and use it
    consistently everywhere."""
    return jnp.concatenate([mixture, miso1, bf], axis=1)
