"""Flat stencil kernels (strided trunk conv, frequency-up deconv) vs the
XLA ConvBlock/DeconvBlock modules (reference model.py:40-73, :401-433).

The flat ops consume raw tensors + InstanceNorm stats and fold the
normalization into the weights; parity is checked against the module
applied to the explicitly normalized input, in interpret mode / fp32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from misonet_tpu.models.blocks import ConvBlock, ConvTranspose2dTorch
from misonet_tpu.ops.pallas.conv_flat import flatten_tf, unflatten_tf
from misonet_tpu.ops.pallas.dense_flat import stats_to_scale_mean
from misonet_tpu.ops.pallas.stencil_flat import (
    conv_down_flat,
    deconv_up_flat,
    interleave_up,
    s2d_flat,
)

TILE = 256


def _raw_with_stats(rng, b, t, f, c):
    """A raw tensor plus its InstanceNorm statistics (bundle contract)."""
    x = jnp.asarray(rng.standard_normal((b, t, f, c)).astype(np.float32))
    x32 = x.astype(jnp.float32)
    mean = x32.mean((1, 2))
    var = x32.var((1, 2))
    scale = 1.0 / jnp.sqrt(var + 1e-5)
    x_norm = (x - mean[:, None, None, :]) * scale[:, None, None, :]
    return x, x_norm, scale, mean


@pytest.mark.parametrize("b,t,f_in,c,n", [(2, 12, 15, 8, 16), (1, 9, 31, 16, 8)])
def test_conv_down_flat_matches_convblock(b, t, f_in, c, n):
    rng = np.random.default_rng(0)
    x, x_norm, scale, mean = _raw_with_stats(rng, b, t, f_in, c)
    f_out = (f_in - 3) // 2 + 1

    block = ConvBlock(n, strides=(1, 2), act_norm=True, norm=False)
    params = block.init(jax.random.key(0), x_norm)
    ref = block.apply(params, x_norm)  # conv + ELU, raw (no IN)

    w = params["params"]["Conv_0"]["kernel"]
    bias = params["params"]["Conv_0"]["bias"]
    with pltpu.force_tpu_interpret_mode():
        xf = flatten_tf(x, TILE).astype(jnp.float32)
        xe, xo = s2d_flat(xf, t, f_in, TILE, TILE)
        y, su, sq = conv_down_flat(
            xe, xo, w, bias, scale, mean,
            t=t, f_in=f_in, tile_m=TILE, precise=True,
        )
    out = unflatten_tf(y, t, f_out, TILE)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-3)
    # fused stats match the output's InstanceNorm statistics
    sc, mn = stats_to_scale_mean(su, sq, t * f_out)
    np.testing.assert_allclose(
        np.asarray(mn), np.asarray(ref.mean((1, 2))), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(sc),
        np.asarray(1.0 / jnp.sqrt(ref.astype(jnp.float32).var((1, 2)) + 1e-5)),
        rtol=1e-3,
    )


@pytest.mark.parametrize("b,t,f_in,c,n", [(2, 12, 7, 8, 16), (1, 9, 15, 16, 8)])
def test_deconv_up_flat_matches_convtranspose(b, t, f_in, c, n):
    rng = np.random.default_rng(1)
    x, x_norm, scale, mean = _raw_with_stats(rng, b, t, f_in, c)
    f_out = 2 * f_in + 1

    mod = ConvTranspose2dTorch(n, strides=(1, 2))
    params = mod.init(jax.random.key(0), x_norm)
    ref = jax.nn.elu(mod.apply(params, x_norm))  # DeconvBlock pre-IN

    w = params["params"]["kernel"]
    bias = params["params"]["bias"]
    with pltpu.force_tpu_interpret_mode():
        xf = flatten_tf(x, TILE).astype(jnp.float32)
        y2, su, sq = deconv_up_flat(
            xf, w, bias, scale, mean,
            t=t, f_in=f_in, tile_m=TILE, precise=True,
        )
        yf, sc, mn = interleave_up(y2, su, sq, t, f_in, TILE, TILE)
    out = unflatten_tf(yf, t, f_out, TILE)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(mn), np.asarray(ref.mean((1, 2))), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(sc),
        np.asarray(1.0 / jnp.sqrt(ref.astype(jnp.float32).var((1, 2)) + 1e-5)),
        rtol=1e-3,
    )
