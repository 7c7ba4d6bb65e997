"""Loss-function tests against brute-force numpy oracles
(reference criterion.py semantics)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from misonet_tpu.losses import (
    loss_upit,
    loss_upit_overest,
    loss_enhance,
    magnitude_distance,
    best_permutation,
)

EPS = 1e-8


def _rand_complex(rng, shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
        np.complex64
    )


def _oracle_pair_l1(est, ref, alpha=0.0):
    l1r = np.sum(np.abs(est.real - ref.real))
    l1i = np.sum(np.abs(est.imag - ref.imag))
    mag = np.sqrt(est.real**2 + est.imag**2 + EPS)
    l1m = np.sum(np.abs(mag - np.abs(ref)))
    over = alpha * np.sum(np.maximum(mag - np.abs(ref), 0.0))
    return l1r + l1i + l1m + over


def _oracle_upit(est, ref, alpha=0.0):
    """Brute-force per-batch min over permutations."""
    B, S = est.shape[:2]
    total = 0.0
    for b in range(B):
        best = np.inf
        for perm in itertools.permutations(range(S)):
            val = sum(
                _oracle_pair_l1(est[b, perm[s]], ref[b, s], alpha) for s in range(S)
            )
            best = min(best, val)
        total += best
    return total / B


def test_upit_matches_bruteforce():
    rng = np.random.default_rng(0)
    est = _rand_complex(rng, (3, 2, 20, 17))
    ref = _rand_complex(rng, (3, 2, 20, 17))
    ours = float(loss_upit(jnp.asarray(est), jnp.asarray(ref)))
    np.testing.assert_allclose(ours, _oracle_upit(est, ref), rtol=1e-5)


def test_upit_three_speakers():
    rng = np.random.default_rng(1)
    est = _rand_complex(rng, (2, 3, 10, 9))
    ref = _rand_complex(rng, (2, 3, 10, 9))
    ours = float(loss_upit(jnp.asarray(est), jnp.asarray(ref)))
    np.testing.assert_allclose(ours, _oracle_upit(est, ref), rtol=1e-5)


def test_upit_permutation_invariant():
    rng = np.random.default_rng(2)
    est = _rand_complex(rng, (1, 2, 16, 8))
    ref = _rand_complex(rng, (1, 2, 16, 8))
    a = float(loss_upit(jnp.asarray(est), jnp.asarray(ref)))
    b = float(loss_upit(jnp.asarray(est[:, ::-1]), jnp.asarray(ref)))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_upit_overest_matches_bruteforce():
    rng = np.random.default_rng(3)
    est = _rand_complex(rng, (2, 2, 12, 7))
    ref = _rand_complex(rng, (2, 2, 12, 7))
    ours = float(loss_upit_overest(jnp.asarray(est), jnp.asarray(ref), 0.3))
    np.testing.assert_allclose(ours, _oracle_upit(est, ref, 0.3), rtol=1e-5)


def test_loss_enhance():
    rng = np.random.default_rng(4)
    est = _rand_complex(rng, (4, 1, 12, 7))
    ref = _rand_complex(rng, (4, 1, 12, 7))
    ours = float(loss_enhance(jnp.asarray(est), jnp.asarray(ref)))
    oracle = _oracle_pair_l1(est, ref) / 4
    np.testing.assert_allclose(ours, oracle, rtol=1e-5)


def test_loss_is_differentiable():
    rng = np.random.default_rng(5)
    ref = jnp.asarray(_rand_complex(rng, (1, 2, 8, 5)))

    def f(r, i):
        return loss_upit(jax.lax.complex(r, i), ref)

    gr, gi = jax.grad(f, argnums=(0, 1))(
        jnp.ones((1, 2, 8, 5)), jnp.ones((1, 2, 8, 5))
    )
    assert np.isfinite(np.asarray(gr)).all() and np.isfinite(np.asarray(gi)).all()


def test_best_permutation_alignment():
    """Swapped estimates must be mapped back to reference order
    (tester.py:125-147 semantics: out[s] takes estimate align_index[s])."""
    rng = np.random.default_rng(6)
    ref = _rand_complex(rng, (2, 2, 16, 9))
    est = ref[:, ::-1].copy()  # estimates are the references, swapped
    dist = magnitude_distance(jnp.asarray(est), jnp.asarray(ref))
    align = np.asarray(best_permutation(dist))
    np.testing.assert_array_equal(align, np.array([[1, 0], [1, 0]]))
    # applying the alignment restores reference order
    realigned = np.take_along_axis(est, align[:, :, None, None], axis=1)
    np.testing.assert_allclose(np.abs(realigned), np.abs(ref), rtol=1e-6)
