"""Pallas fused STFT kernel vs the stock rfft implementation (interpret
mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from misonet_tpu.config import StftConfig
from misonet_tpu.ops.pallas.stft_kernel import stft_scaled_pallas
from misonet_tpu.ops.stft import stft_scaled

CFG = StftConfig()


@pytest.mark.parametrize("shape", [(8000,), (2, 3, 8000), (6, 4096)])
def test_pallas_stft_matches_stock(shape):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(np.float32)
    ref = np.asarray(stft_scaled(jnp.asarray(x), CFG))
    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(stft_scaled_pallas(jnp.asarray(x), CFG))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3)
