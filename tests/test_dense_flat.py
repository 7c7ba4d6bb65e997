"""Fused flat DenseBlock kernel vs the plain DenseBlock module.

The flat pipeline must reproduce the reference DenseBlock semantics
(conv3x3 SAME -> +bias -> ELU -> InstanceNorm per layer, DenseNet concat;
reference model.py:437-482) exactly: same parameters, same output, with
the normalization folded into the conv (see ops/pallas/dense_flat.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from misonet_tpu.models.blocks import DenseBlock
from misonet_tpu.models.flat_dense import (
    DenseBlockFlat,
    from_flat_bundle,
    to_flat_bundle,
)


@pytest.mark.parametrize(
    "shape,g1,g2",
    [
        ((1, 12, 15, 8), 8, 8),     # encoder-like: init == g1 == g2
        ((2, 9, 7, 8), 8, 16),      # decoder-like: wider final layer
    ],
)
def test_dense_block_flat_matches_plain(shape, g1, g2):
    b, t, f, c = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    plain = DenseBlock(g1, g2)
    params = plain.init(jax.random.key(0), x)
    ref = plain.apply(params, x)

    flat = DenseBlockFlat(g1, g2)
    with pltpu.force_tpu_interpret_mode():
        bundle = to_flat_bundle(x, normalized=True, tile_m=256,
                                dtype=jnp.float32)
        y, sc, mn = flat.apply(
            params, bundle, t=t, f=f, tile_m=256, precise=True
        )
        out = from_flat_bundle((y, sc, mn), t, f, jnp.float32, tile_m=256)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-3)


def test_flat_bundle_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 6, 5, 8)).astype(np.float32))
    (xf,), sc, mn = to_flat_bundle(x, normalized=True, tile_m=256)
    back = from_flat_bundle((xf, sc, mn), 6, 5, jnp.float32, tile_m=256)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-2)


@pytest.mark.slow
def test_misonet_flat_dense_matches_plain():
    """Full MISO1 forward: flat_dense path == plain path (f32/precise)."""
    from misonet_tpu.config import ModelConfig
    from misonet_tpu.models import make_miso1

    b, c, t, f = 1, 2, 8, 129
    rng = np.random.default_rng(2)
    mix = jnp.asarray(
        rng.standard_normal((b, c, t, f)).astype(np.float32)
        + 1j * rng.standard_normal((b, c, t, f)).astype(np.float32)
    )
    plain = make_miso1(ModelConfig(compute_dtype="float32"))
    params = plain.init(jax.random.key(0), mix)
    ref = plain.apply(params, mix)

    flat = make_miso1(ModelConfig(compute_dtype="float32", flat_dense=True))
    with pltpu.force_tpu_interpret_mode():
        out = flat.apply(params, mix)

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-4, rtol=5e-3
    )
