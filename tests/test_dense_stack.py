"""Stacked (input-grouped) DenseBlock kernel: forward and gradient parity
against the plain DenseBlock module (reference model.py:437-482 semantics).

DenseBlockFlat now routes through ops/pallas/dense_stack.py — one wide-N
kernel call per source tensor with an HBM partial-preactivation
accumulator — so these tests pin down exactly the properties the
restructuring must preserve: bit-level forward math (precise mode), the
custom-VJP backward (including the bias gradient, which is sensitive to
gap/pad-column cotangent handling), and multi-tensor (decoder skip-concat)
bundles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from misonet_tpu.models.blocks import DenseBlock
from misonet_tpu.models.flat_dense import (
    DenseBlockFlat,
    from_flat_bundle,
    merge_bundles,
    to_flat_bundle,
)


def _loss_weights(y):
    return jnp.sin(jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape))


@pytest.mark.parametrize(
    "shape,g1,g2",
    [
        ((1, 12, 15, 8), 8, 8),     # encoder-like
        ((2, 9, 7, 8), 8, 16),      # decoder-like final width
    ],
)
@pytest.mark.slow
def test_stacked_gradients_match_plain(shape, g1, g2):
    b, t, f, c = shape
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    plain = DenseBlock(g1, g2)
    params = plain.init(jax.random.key(0), x)

    def loss_plain(p, xv):
        y = plain.apply(p, xv)
        return (y * _loss_weights(y)).sum()

    flat = DenseBlockFlat(g1, g2)

    def loss_flat(p, xv):
        bundle = to_flat_bundle(xv, normalized=True, tile_m=256,
                                dtype=jnp.float32)
        y, sc, mn = flat.apply(p, bundle, t=t, f=f, tile_m=256, precise=True)
        out = from_flat_bundle((y, sc, mn), t, f, jnp.float32, tile_m=256)
        return (out * _loss_weights(out)).sum()

    gp, gxp = jax.grad(loss_plain, argnums=(0, 1))(params, x)
    with pltpu.force_tpu_interpret_mode():
        gf, gxf = jax.grad(loss_flat, argnums=(0, 1))(params, x)

    for a, bb in zip(jax.tree.leaves(gp), jax.tree.leaves(gf)):
        scale = np.abs(np.asarray(a)).max() + 1e-9
        np.testing.assert_allclose(
            np.asarray(bb) / scale, np.asarray(a) / scale, atol=1e-4
        )
    scale = np.abs(np.asarray(gxp)).max()
    np.testing.assert_allclose(
        np.asarray(gxf) / scale, np.asarray(gxp) / scale, atol=1e-4
    )


def test_stacked_multi_tensor_bundle_matches_plain():
    """Decoder-style two-tensor bundle (logical skip concat)."""
    b, t, f = 2, 10, 7
    g1, g2 = 8, 16
    rng = np.random.default_rng(5)
    xa = jnp.asarray(rng.standard_normal((b, t, f, 8)).astype(np.float32))
    xb = jnp.asarray(rng.standard_normal((b, t, f, 8)).astype(np.float32))
    x = jnp.concatenate([xa, xb], axis=-1)

    plain = DenseBlock(g1, g2)
    params = plain.init(jax.random.key(0), x)
    ref = plain.apply(params, x)

    flat = DenseBlockFlat(g1, g2)
    with pltpu.force_tpu_interpret_mode():
        ba = to_flat_bundle(xa, normalized=True, tile_m=256, dtype=jnp.float32)
        bb2 = to_flat_bundle(xb, normalized=True, tile_m=256, dtype=jnp.float32)
        merged = merge_bundles(ba, bb2)
        y, sc, mn = flat.apply(params, merged, t=t, f=f, tile_m=256,
                               precise=True)
        out = from_flat_bundle((y, sc, mn), t, f, jnp.float32, tile_m=256)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-3)


def test_stacked_bf16_forward_error_bound():
    """bf16 (precise=False) stacked forward vs the f32 plain DenseBlock:
    the partial-preactivation accumulator rides HBM in bf16 across up to
    4 calls, so the inference path's drift must stay within the bf16
    accumulation class (ADVICE r3: previously only the precise path was
    forward-tested, leaving bf16 accumulator regressions uncaught)."""
    b, t, f = 2, 10, 7
    g1, g2 = 8, 16
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((b, t, f, 8)).astype(np.float32))

    plain = DenseBlock(g1, g2)
    params = plain.init(jax.random.key(0), x)
    ref = np.asarray(plain.apply(params, x))

    flat = DenseBlockFlat(g1, g2)
    with pltpu.force_tpu_interpret_mode():
        bundle = to_flat_bundle(x, normalized=True, tile_m=256,
                                dtype=jnp.bfloat16)
        y, sc, mn = flat.apply(params, bundle, t=t, f=f, tile_m=256,
                               precise=False)
        out = np.asarray(
            from_flat_bundle((y, sc, mn), t, f, jnp.float32, tile_m=256)
        )

    scale = np.abs(ref).max()
    # bf16 inputs + bf16 HBM accumulator: ~1e-2 relative class
    np.testing.assert_allclose(out / scale, ref / scale, atol=4e-2)
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999, corr


def test_stacked_int8_quant_error_bound():
    """int8 decode path (dense_stack_flat quant=True) vs the f32 plain
    DenseBlock: activations quantize at a static power-of-two scale
    (QS=16 on IN-normalized inputs), weights per-output-row — the error
    class is ~int8 SQNR (rms ~3% of the unit-variance output), an order
    above bf16 but far below model accuracy (PERF.md r5).  Covers the
    single-tensor encoder bundle and the two-tensor decoder skip bundle
    (multi-group pack_plan at q=32)."""
    b, t, f = 2, 10, 7
    g1, g2 = 8, 16
    rng = np.random.default_rng(11)
    xa = jnp.asarray(rng.standard_normal((b, t, f, 8)).astype(np.float32))
    xb = jnp.asarray(rng.standard_normal((b, t, f, 8)).astype(np.float32))

    plain = DenseBlock(g1, g2)
    for tensors in [(xa,), (xa, xb)]:
        x = jnp.concatenate(tensors, axis=-1)
        params = plain.init(jax.random.key(1), x)
        ref = np.asarray(plain.apply(params, x))

        flat = DenseBlockFlat(g1, g2)
        with pltpu.force_tpu_interpret_mode():
            merged = merge_bundles(*[
                to_flat_bundle(xi, normalized=True, tile_m=256,
                               dtype=jnp.bfloat16)
                for xi in tensors
            ])
            y, sc, mn = flat.apply(params, merged, t=t, f=f, tile_m=256,
                                   quant=True)
            out = np.asarray(
                from_flat_bundle((y, sc, mn), t, f, jnp.float32, tile_m=256)
            )

        d = out - ref
        rms = np.sqrt((d ** 2).mean()) / (np.sqrt((ref ** 2).mean()) + 1e-9)
        assert rms < 0.08, rms
        assert np.abs(d).max() < 0.4 * np.abs(ref).max(), np.abs(d).max()
        corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
        assert corr > 0.995, corr
