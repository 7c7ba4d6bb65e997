"""Evaluation metrics.

The reference repo has no metric code at all (SURVEY.md §6) — quality was
judged from TensorBoard spectrograms.  The framework provides the metric
layer the paper evaluates with (SI-SDR et al.), jit-able and batched.
"""

from __future__ import annotations

import itertools

import jax.numpy as jnp
import numpy as np

EPS = 1e-8


def si_sdr(estimate: jnp.ndarray, reference: jnp.ndarray) -> jnp.ndarray:
    """Scale-invariant SDR in dB (Le Roux et al. 2019).

    estimate, reference: [..., T] time-domain signals.  Returns [...]."""
    ref = reference - reference.mean(axis=-1, keepdims=True)
    est = estimate - estimate.mean(axis=-1, keepdims=True)
    dot = jnp.sum(est * ref, axis=-1, keepdims=True)
    energy = jnp.sum(ref**2, axis=-1, keepdims=True)
    target = dot / (energy + EPS) * ref
    noise = est - target
    ratio = jnp.sum(target**2, axis=-1) / (jnp.sum(noise**2, axis=-1) + EPS)
    return 10.0 * jnp.log10(ratio + EPS)


def sdr(estimate: jnp.ndarray, reference: jnp.ndarray) -> jnp.ndarray:
    """Plain (scale-dependent) SDR in dB: [..., T] -> [...]."""
    noise = estimate - reference
    ratio = jnp.sum(reference**2, axis=-1) / (jnp.sum(noise**2, axis=-1) + EPS)
    return 10.0 * jnp.log10(ratio + EPS)


def si_sdr_pit(estimates: jnp.ndarray, references: jnp.ndarray) -> jnp.ndarray:
    """Permutation-optimal mean SI-SDR for multi-speaker output.

    estimates, references: [S, T] (or [B, S, T]).  Returns scalar (or [B]):
    the max over speaker permutations of the mean per-speaker SI-SDR."""
    if estimates.ndim == 2:
        estimates = estimates[None]
        references = references[None]
        squeeze = True
    else:
        squeeze = False
    num_spks = estimates.shape[1]
    pair = si_sdr(estimates[:, :, None], references[:, None, :])  # [B, S, S]
    perms = list(itertools.permutations(range(num_spks)))
    scores = jnp.stack(
        [
            jnp.mean(
                jnp.stack([pair[:, p[s], s] for s in range(num_spks)], axis=1),
                axis=1,
            )
            for p in perms
        ],
        axis=1,
    )  # [B, S!]
    out = jnp.max(scores, axis=1)
    return out[0] if squeeze else out


def pesq(estimate: np.ndarray, reference: np.ndarray, fs: int = 8000):
    """PESQ (ITU-T P.862) hook.

    Requires the ``pesq`` package (native libpesq); returns None when
    unavailable so evaluation loops report it opportunistically alongside
    SI-SDR.  An in-tree P.862 reimplementation is explicitly descoped
    (BASELINE.md): without the ITU conformance vectors it could not be
    validated, and the reference repo neither computes nor publishes PESQ."""
    try:
        from pesq import pesq as _pesq  # type: ignore
    except ImportError:
        return None
    mode = "nb" if fs <= 8000 else "wb"
    return float(_pesq(fs, np.asarray(reference), np.asarray(estimate), mode))


def numpy_si_sdr(estimate: np.ndarray, reference: np.ndarray) -> float:
    """Host-side oracle for tests (independent numpy implementation)."""
    ref = reference - reference.mean()
    est = estimate - estimate.mean()
    target = np.dot(est, ref) / (np.dot(ref, ref) + EPS) * ref
    noise = est - target
    return float(10 * np.log10(np.dot(target, target) / (np.dot(noise, noise) + EPS) + EPS))
