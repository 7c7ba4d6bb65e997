"""Inference-stack tests: circular-shift decode alignment + full cascade
shapes (reference tester.py:201-255, :846-975)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from misonet_tpu.config import ModelConfig
from misonet_tpu.inference import make_full_array_decode, align_slots, make_cascade
from misonet_tpu.models import make_miso1, make_miso3

SMALL = ModelConfig(
    num_bottleneck=4,
    en_channels=(8, 8, 8, 16),
    de_channels=(16, 8, 8, 8),
    tcn_repeats=1,
    tcn_blocks=2,
    tcn_channels=16,
    compute_dtype="float32",
)
B, C, T, F = 2, 3, 16, 17


def test_align_slots_identity_and_swap():
    # slot 0 closest to candidate 1 and vice versa -> swap
    d = jnp.asarray([[[5.0, 1.0], [1.0, 5.0]], [[1.0, 5.0], [5.0, 1.0]]])
    idx = np.asarray(align_slots(d))
    np.testing.assert_array_equal(idx, [[1, 0], [0, 1]])


def test_align_slots_three_way():
    rng = np.random.default_rng(0)
    # construct cost with known optimal permutation (2,0,1)
    d = np.full((1, 3, 3), 10.0)
    d[0, 0, 2] = d[0, 1, 0] = d[0, 2, 1] = 0.1
    idx = np.asarray(align_slots(jnp.asarray(d)))
    np.testing.assert_array_equal(idx[0], [2, 0, 1])


@pytest.fixture(scope="module")
def miso1():
    model = make_miso1(SMALL)
    x = jax.lax.complex(
        jax.random.normal(jax.random.key(0), (1, C, T, F)),
        jax.random.normal(jax.random.key(1), (1, C, T, F)),
    )
    params = model.init(jax.random.key(2), x)
    return model, params


def test_full_array_decode_shapes(miso1):
    model, params = miso1
    decode = make_full_array_decode(model, num_mics=C, ref_ch=0)
    mix = jax.lax.complex(
        jax.random.normal(jax.random.key(3), (B, C, T, F)),
        jax.random.normal(jax.random.key(4), (B, C, T, F)),
    )
    out = decode(params, mix)
    assert out.shape == (B, 2, C, T, F)
    assert out.dtype == jnp.complex64
    # ref channel of the decode equals the plain ref-ch forward
    direct = model.apply(params, mix)
    np.testing.assert_allclose(
        np.asarray(out[:, :, 0]), np.asarray(direct), atol=1e-5
    )


def test_full_array_decode_alignment_consistency(miso1):
    """Each shifted run must be speaker-aligned: magnitudes of each output
    slot across mics should be closer to the ref-run slot than the swap."""
    model, params = miso1
    decode = make_full_array_decode(model, num_mics=C, ref_ch=0)
    mix = jax.lax.complex(
        jax.random.normal(jax.random.key(5), (1, C, T, F)),
        jax.random.normal(jax.random.key(6), (1, C, T, F)),
    )
    out = np.asarray(decode(params, mix))  # [1, S, C, T, F]
    ref = np.abs(out[:, :, 0])  # [1, S, T, F]
    for mic in range(1, C):
        shifted = np.abs(out[:, :, mic])
        same = sum(
            np.abs(shifted[0, s] - ref[0, s]).sum() for s in range(2)
        )
        swap = sum(
            np.abs(shifted[0, s] - ref[0, 1 - s]).sum() for s in range(2)
        )
        assert same <= swap + 1e-3


def test_cascade_shapes(miso1):
    model1, params1 = miso1
    model3 = make_miso3(SMALL)
    x3 = jax.lax.complex(
        jax.random.normal(jax.random.key(7), (1, C + 2, T, F)),
        jax.random.normal(jax.random.key(8), (1, C + 2, T, F)),
    )
    params3 = model3.init(jax.random.key(9), x3)
    cascade = make_cascade(model1, model3, num_mics=C, ref_ch=0, joint=False)
    mix = jax.lax.complex(
        jax.random.normal(jax.random.key(10), (B, C, T, F)),
        jax.random.normal(jax.random.key(11), (B, C, T, F)),
    )
    out = cascade(params1, params3, mix)
    assert out["miso1"].shape == (B, 2, T, F)
    assert out["miso1_full"].shape == (B, 2, C, T, F)
    assert out["bf"].shape == (B, 2, T, F)
    assert out["enhanced"].shape == (B, 2, T, F)
    for v in out.values():
        assert np.isfinite(np.asarray(v.real)).all()
