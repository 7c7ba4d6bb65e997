"""SI-SDR metric tests (new capability — the reference repo has no metric
code, SURVEY.md §6)."""

import jax.numpy as jnp
import numpy as np

from misonet_tpu.metrics import si_sdr, si_sdr_pit, numpy_si_sdr


def test_si_sdr_perfect_reconstruction_high():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(8000).astype(np.float32)
    val = float(si_sdr(jnp.asarray(x), jnp.asarray(x)))
    assert val > 60


def test_si_sdr_scale_invariance():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(8000).astype(np.float32)
    noisy = x + 0.1 * rng.standard_normal(8000).astype(np.float32)
    a = float(si_sdr(jnp.asarray(noisy), jnp.asarray(x)))
    b = float(si_sdr(jnp.asarray(3.7 * noisy), jnp.asarray(x)))
    np.testing.assert_allclose(a, b, atol=1e-3)
    np.testing.assert_allclose(a, numpy_si_sdr(noisy, x), atol=1e-3)


def test_si_sdr_pit_picks_best_permutation():
    rng = np.random.default_rng(2)
    s = rng.standard_normal((2, 4000)).astype(np.float32)
    est = s[::-1] + 0.01 * rng.standard_normal((2, 4000)).astype(np.float32)
    swapped = float(si_sdr_pit(jnp.asarray(est), jnp.asarray(s)))
    assert swapped > 30  # PIT must find the swap
    batched = si_sdr_pit(jnp.asarray(est[None]), jnp.asarray(s[None]))
    np.testing.assert_allclose(float(batched[0]), swapped, atol=1e-4)
