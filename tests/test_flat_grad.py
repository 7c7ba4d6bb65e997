"""Autodiff of the fused flat-layout kernels (ops/pallas/flat_grad.py).

Two layers of checks, both in interpret mode / fp32 (precise=True):

1. the pure-JAX twins compute exactly what the Pallas kernels compute
   (y, sum, sumsq) — the twins' VJP is the custom backward, so twin==kernel
   makes the gradients exact;
2. end-to-end gradients of the flat modules (DenseBlockFlat, TrunkDownFlat,
   DeconvUpFlat with full bundle plumbing) match the plain XLA modules
   (DenseBlock, ConvBlock, DeconvBlock) — same math, same parameters
   (reference model.py:401-482 semantics).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from misonet_tpu.models.blocks import (
    ConvBlock,
    DeconvBlock,
    DenseBlock,
)
from misonet_tpu.models.flat_dense import (
    DeconvUpFlat,
    DenseBlockFlat,
    TrunkDownFlat,
    from_flat_bundle,
    to_flat_bundle,
)
from misonet_tpu.ops.pallas.conv_flat import flatten_tf
from misonet_tpu.ops.pallas.dense_flat import dense_layer_flat
from misonet_tpu.ops.pallas.flat_grad import (
    _conv_down_twin,
    _deconv_up_twin,
    _dense_twin,
)
from misonet_tpu.ops.pallas.stencil_flat import (
    conv_down_flat,
    deconv_up_flat,
    s2d_flat,
)

TILE = 256


def _inorm(x, eps=1e-5):
    """Functional InstanceNorm over (T, F) per channel (model.py:413)."""
    mean = x.mean((1, 2), keepdims=True)
    var = x.var((1, 2), keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


def _raw_with_stats(rng, b, t, f, c):
    x = jnp.asarray(rng.standard_normal((b, t, f, c)).astype(np.float32))
    mean = x.mean((1, 2))
    scale = 1.0 / jnp.sqrt(x.var((1, 2)) + 1e-5)
    return x, scale, mean


def _tree_allclose(a, b, atol, rtol):
    fa, _ = jax.tree_util.tree_flatten(a)
    fb, _ = jax.tree_util.tree_flatten(b)
    assert len(fa) == len(fb)
    for ga, gb in zip(fa, fb):
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gb), atol=atol, rtol=rtol
        )


# ---------------------------------------------------------------------------
# 1. twins == kernels
# ---------------------------------------------------------------------------


def test_dense_twin_matches_kernel():
    rng = np.random.default_rng(0)
    b, t, f = 1, 12, 15
    x1, sc1, mn1 = _raw_with_stats(rng, b, t, f, 8)
    x2, sc2, mn2 = _raw_with_stats(rng, b, t, f, 8)
    xs = tuple(flatten_tf(x, TILE) for x in (x1, x2))
    scale = jnp.concatenate([sc1, sc2], axis=1)
    mean = jnp.concatenate([mn1, mn2], axis=1)
    w = jnp.asarray(rng.standard_normal((3, 3, 16, 8)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(8).astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        yk, sk, qk = dense_layer_flat(
            xs, w, bias, scale, mean, t=t, f=f, tile_m=TILE, precise=True
        )
    yt, st, qt = _dense_twin(t, f, TILE, True, jnp.float32,
                             xs, w, bias, scale, mean)
    np.testing.assert_allclose(np.asarray(yt), np.asarray(yk),
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(st), np.asarray(sk), atol=2e-3)
    np.testing.assert_allclose(np.asarray(qt), np.asarray(qk),
                               atol=2e-3, rtol=1e-4)


def test_conv_down_twin_matches_kernel():
    rng = np.random.default_rng(1)
    b, t, f_in, c, n = 2, 12, 15, 8, 16
    x, scale, mean = _raw_with_stats(rng, b, t, f_in, c)
    w = jnp.asarray(rng.standard_normal((3, 3, c, n)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        xf = flatten_tf(x, TILE)
        xe, xo = s2d_flat(xf, t, f_in, TILE, TILE)
        yk, sk, qk = conv_down_flat(
            xe, xo, w, bias, scale, mean,
            t=t, f_in=f_in, tile_m=TILE, precise=True,
        )
    yt, st, qt = _conv_down_twin(t, f_in, TILE, True, jnp.float32,
                                 xe, xo, w, bias, scale, mean)
    np.testing.assert_allclose(np.asarray(yt), np.asarray(yk),
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(st), np.asarray(sk), atol=2e-3)
    np.testing.assert_allclose(np.asarray(qt), np.asarray(qk),
                               atol=2e-3, rtol=1e-4)


def test_deconv_up_twin_matches_kernel():
    rng = np.random.default_rng(2)
    b, t, f_in, c, n = 2, 12, 7, 8, 16
    x, scale, mean = _raw_with_stats(rng, b, t, f_in, c)
    w = jnp.asarray(rng.standard_normal((3, 3, c, n)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        xf = flatten_tf(x, TILE)
        yk, sk, qk = deconv_up_flat(
            xf, w, bias, scale, mean,
            t=t, f_in=f_in, tile_m=TILE, precise=True,
        )
    yt, st, qt = _deconv_up_twin(t, f_in, TILE, True, jnp.float32,
                                 xf, w, bias, scale, mean)
    np.testing.assert_allclose(np.asarray(yt), np.asarray(yk),
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(st), np.asarray(sk), atol=2e-3)
    np.testing.assert_allclose(np.asarray(qt), np.asarray(qk),
                               atol=2e-3, rtol=1e-4)


# ---------------------------------------------------------------------------
# 2. flat-path gradients == plain-path gradients
# ---------------------------------------------------------------------------


def test_dense_block_flat_grads_match_plain():
    rng = np.random.default_rng(3)
    b, t, f, c = 1, 12, 15, 8
    g1 = g2 = 8
    x = jnp.asarray(rng.standard_normal((b, t, f, c)).astype(np.float32))
    probe = jnp.asarray(rng.standard_normal((b, t, f, g2)).astype(np.float32))

    plain = DenseBlock(g1, g2)
    params = plain.init(jax.random.key(0), x)

    def loss_plain(params, x):
        return jnp.sum(plain.apply(params, x) * probe)

    flat = DenseBlockFlat(g1, g2)

    def loss_flat(params, x):
        bundle = to_flat_bundle(x, normalized=True, tile_m=TILE,
                                dtype=jnp.float32)
        out = flat.apply(params, bundle, t=t, f=f, tile_m=TILE, precise=True)
        y = from_flat_bundle(out, t, f, jnp.float32, tile_m=TILE)
        return jnp.sum(y * probe)

    gp = jax.grad(loss_plain, argnums=(0, 1))(params, x)
    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_flat, argnums=(0, 1))(params, x)
    _tree_allclose(gf, gp, atol=5e-3, rtol=5e-3)


def test_trunk_down_flat_grads_match_convblock():
    rng = np.random.default_rng(4)
    b, t, f_in, c, n = 1, 12, 15, 8, 16
    f_out = (f_in - 3) // 2 + 1
    x = jnp.asarray(rng.standard_normal((b, t, f_in, c)).astype(np.float32))
    probe = jnp.asarray(
        rng.standard_normal((b, t, f_out, n)).astype(np.float32)
    )

    block = ConvBlock(n, strides=(1, 2), act_norm=True, norm=False)
    params = block.init(jax.random.key(1), x)

    def loss_plain(params, x):
        xn = _inorm(x)
        y = block.apply(params, xn)             # conv + ELU (raw)
        return jnp.sum(_inorm(y) * probe)

    trunk = TrunkDownFlat(n)

    def loss_flat(params, x):
        bundle = to_flat_bundle(x, normalized=False, tile_m=TILE,
                                dtype=jnp.float32)
        out = trunk.apply(params, bundle, t=t, f_in=f_in, tile_in=TILE,
                          tile_out=TILE, precise=True)
        y = from_flat_bundle((out[0][0], out[1], out[2]), t, f_out,
                             jnp.float32, tile_m=TILE)
        return jnp.sum(y * probe)

    gp = jax.grad(loss_plain, argnums=(0, 1))(params, x)
    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_flat, argnums=(0, 1))(params, x)
    _tree_allclose(gf, gp, atol=5e-3, rtol=5e-3)


def test_deconv_up_flat_grads_match_deconvblock():
    rng = np.random.default_rng(5)
    b, t, f_in, c, n = 1, 12, 7, 8, 16
    f_out = 2 * f_in + 1
    x = jnp.asarray(rng.standard_normal((b, t, f_in, c)).astype(np.float32))
    probe = jnp.asarray(
        rng.standard_normal((b, t, f_out, n)).astype(np.float32)
    )

    block = DeconvBlock(n, strides=(1, 2))
    params = block.init(jax.random.key(2), x)
    # DeconvBlock param tree: ConvTranspose2dTorch_0/{kernel,bias} — the
    # same names DeconvUpFlat uses, so one param set serves both paths.

    def loss_plain(params, x):
        xn = _inorm(x)
        return jnp.sum(block.apply(params, xn) * probe)

    deconv = DeconvUpFlat(n)

    def loss_flat(params, x):
        bundle = to_flat_bundle(x, normalized=False, tile_m=TILE,
                                dtype=jnp.float32)
        out = deconv.apply(params, bundle, t=t, f_in=f_in, tile_in=TILE,
                           tile_out=TILE, precise=True)
        y = from_flat_bundle((out[0][0], out[1], out[2]), t, f_out,
                             jnp.float32, tile_m=TILE)
        return jnp.sum(y * probe)

    gp = jax.grad(loss_plain, argnums=(0, 1))(params, x)
    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_flat, argnums=(0, 1))(params, x)
    _tree_allclose(gf, gp, atol=5e-3, rtol=5e-3)
