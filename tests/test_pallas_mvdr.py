"""Pallas Hermitian-solve kernel vs numpy oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _systems(rng, shape, m):
    a = (rng.standard_normal(shape + (m, m)) + 1j * rng.standard_normal(shape + (m, m))).astype(np.complex64)
    r = np.einsum("...ij,...kj->...ik", a, a.conj()) + 0.1 * np.eye(m)
    r = 0.5 * (r + np.conj(r.swapaxes(-1, -2)))
    d = (rng.standard_normal(shape + (m,)) + 1j * rng.standard_normal(shape + (m,))).astype(np.complex64)
    return r.astype(np.complex64), d


@pytest.mark.parametrize("shape,m", [((2, 129), 6), ((7,), 6), ((300,), 4)])
def test_hermitian_solve_matches_numpy(shape, m):
    from jax.experimental.pallas import tpu as pltpu

    from misonet_tpu.ops.pallas.mvdr_solve import hermitian_solve_pallas

    rng = np.random.default_rng(0)
    r, d = _systems(rng, shape, m)
    diag = 1e-6
    with pltpu.force_tpu_interpret_mode():
        ours = np.asarray(
            hermitian_solve_pallas(jnp.asarray(r), jnp.asarray(d), diag=diag)
        )
    ref = np.linalg.solve(
        r.astype(np.complex128) + diag * np.eye(m), d[..., None]
    )[..., 0]
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)
