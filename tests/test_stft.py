"""STFT/iSTFT parity against scipy.signal — the reference's DSP backend
(reference dataloader/data.py:49-66, tester.py:186-198)."""

import numpy as np
import pytest
import scipy.signal

from misonet_tpu.config import StftConfig
from misonet_tpu.ops import stft, istft, stft_scaled, istft_scaled
from misonet_tpu.ops.stft import hann_periodic, matlab_scale

CFG = StftConfig()


def _scipy_stft(x):
    _, _, z = scipy.signal.stft(
        x, fs=CFG.fs, window=CFG.window, nperseg=CFG.length, noverlap=CFG.overlap
    )
    return z  # [F, T]


def _scipy_istft(z):
    _, t = scipy.signal.istft(
        z, fs=CFG.fs, window=CFG.window, nperseg=CFG.length, noverlap=CFG.overlap
    )
    return t


def test_window_matches_scipy():
    np.testing.assert_allclose(
        hann_periodic(256), scipy.signal.get_window("hann", 256), atol=1e-12
    )


@pytest.mark.parametrize("n", [32000, 31871, 8000, 256, 300])
def test_stft_matches_scipy(n):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n).astype(np.float32)
    ours = np.asarray(stft(x, CFG))          # [T, F]
    ref = _scipy_stft(x).T                   # [T, F]
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_stft_num_frames_helper():
    for n in [32000, 31871, 8000, 256, 300]:
        x = np.zeros(n, np.float32)
        assert stft(x, CFG).shape[-2] == CFG.num_frames(n)
    assert CFG.num_frames(32000) == 501  # 4 s @ 8 kHz (SURVEY.md §7)


def test_stft_batched_channels():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 6, 8000)).astype(np.float32)
    z = np.asarray(stft(x, CFG))
    assert z.shape[:2] == (2, 6)
    np.testing.assert_allclose(z[1, 3], _scipy_stft(x[1, 3]).T, atol=2e-6)


@pytest.mark.parametrize("n", [32000, 8000, 300])
def test_istft_matches_scipy(n):
    rng = np.random.default_rng(2)
    x = rng.standard_normal(n).astype(np.float32)
    z = _scipy_stft(x)
    ours = np.asarray(istft(np.ascontiguousarray(z.T), CFG, n))
    ref = _scipy_istft(z)[:n]
    np.testing.assert_allclose(ours, ref, atol=2e-6)


@pytest.mark.parametrize("n", [32000, 12345])
def test_roundtrip_reference_scaling(n):
    """The reference composition: stft/scale -> model -> *scale -> istft
    (data.py:78, tester.py:151-155) must reconstruct the waveform."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal(n).astype(np.float32)
    z = stft_scaled(x, CFG)
    y = np.asarray(istft_scaled(z, CFG, n))
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_scaled_equals_scipy_composition():
    """stft_scaled == scipy stft / matlab_scale, bit-for-bit semantics."""
    rng = np.random.default_rng(4)
    x = rng.standard_normal(16000).astype(np.float32)
    ours = np.asarray(stft_scaled(x, CFG))
    ref = _scipy_stft(x).T / matlab_scale(CFG)
    np.testing.assert_allclose(ours, ref, atol=5e-4)


def test_stft_is_jittable_and_grads():
    import jax
    import jax.numpy as jnp

    def loss(x):
        z = stft_scaled(x, CFG)
        return jnp.sum(jnp.abs(z) ** 2)

    g = jax.grad(loss)(jnp.ones(4096, jnp.float32))
    assert g.shape == (4096,)
    assert np.isfinite(np.asarray(g)).all()


def test_istft_masked_matches_exact_crop():
    """istft_scaled_masked of a bucket-padded spectrogram (frames past
    t_valid zero, t_valid traced) must equal istft_scaled of the
    t_valid-cropped spectrogram — the bucket-static synthesis used by the
    evaluator's _istft_multi, one compile per bucket instead of one per
    utterance length."""
    import jax.numpy as jnp

    from misonet_tpu.ops.stft import istft_scaled_masked

    rng = np.random.default_rng(8)
    out_len = 5000 - 63                    # NOT a hop multiple
    bucket = 8192
    x = rng.standard_normal(out_len).astype(np.float32)
    xb = np.pad(x, (0, bucket - out_len))
    z = np.asarray(stft_scaled(jnp.asarray(xb), CFG))   # [T_b, F]
    t_valid = CFG.num_frames(out_len)
    z_masked = z.copy()
    z_masked[t_valid:] = 0.0

    exact = np.asarray(
        istft_scaled(jnp.asarray(z[:t_valid]), CFG, out_len)
    )
    masked = np.asarray(
        istft_scaled_masked(jnp.asarray(z_masked), t_valid, CFG, bucket)
    )[:out_len]
    np.testing.assert_allclose(masked, exact, atol=1e-5)
    # two different t_valid values reuse ONE compiled signature
    masked2 = np.asarray(
        istft_scaled_masked(jnp.asarray(z_masked), t_valid - 3, CFG, bucket)
    )
    assert np.isfinite(masked2).all()
