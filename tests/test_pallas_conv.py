"""Pallas im2col conv kernel vs XLA conv (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from misonet_tpu.ops.pallas.conv_kernel import conv3x3_same_pallas


@pytest.mark.parametrize(
    "shape",
    [
        (2, 40, 17, 8, 24),   # uneven F, small C
        (1, 32, 16, 4, 8),    # aligned F
        (1, 33, 7, 6, 12),    # T not a tile multiple
    ],
)
def test_conv3x3_matches_xla(shape):
    b_, t, f, c, n = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b_, t, f, c)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, c, n)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    ref = (
        jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        + b
    )
    with pltpu.force_tpu_interpret_mode():
        ours = conv3x3_same_pallas(x, w, b, tile_t=16)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-4)
