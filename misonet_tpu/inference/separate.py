"""MISO1 inference: circular-shift full-array decode + PIT alignment.

The paper's trick for recovering each speaker's *multi-channel* image (needed
for spatial covariance estimation): run the separation net once per
microphone, circularly shifting the array so every mic becomes the reference,
then align the speaker ordering of every shifted run to the reference-mic run
by minimum magnitude distance (reference MISO1_Inference, tester.py:201-255;
duplicated :580-634, :1014-1068, data.py:264-318 — one canonical
implementation here).

The reference loops M sequential forwards with host-side alignment
(SURVEY.md §3.4 hot loop a).  Here all M shifts are folded into the batch
axis of ONE forward pass, and the data-dependent permutation alignment is a
static einsum + argmin + gather — the whole decode is a single jitted
computation."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from misonet_tpu.losses import _perm_one_hot


def align_slots(dist: jnp.ndarray) -> jnp.ndarray:
    """Minimum-cost slot assignment from a pairwise distance matrix.

    dist: [..., S, S] where dist[..., slot, candidate] is the cost of
    assigning `candidate` to `slot`.  Returns int indices [..., S]:
    the candidate chosen for each slot under the best global permutation
    (the one-hot-einsum-argmin pattern of tester.py:137-147)."""
    s = dist.shape[-1]
    one_hot = jnp.asarray(_perm_one_hot(s))          # [S!, S, S]
    per_perm = jnp.einsum("...ij,pij->...p", dist, one_hot)
    best = jnp.argmin(per_perm, axis=-1)             # [...]
    perms = jnp.argmax(one_hot, axis=2)              # [S!, S]
    return perms[best]                               # [..., S]


def magnitude(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(x.real**2 + x.imag**2)


def make_full_array_decode(model, num_mics: int, ref_ch: int = 0):
    """Build the jitted full-array decode:

    (params, mix [B, C, T, F] complex) -> [B, S, C, T, F] complex
    where output channel c is each speaker's estimated image at mic c.

    All M circular shifts run as one batched forward; each shifted run's
    speaker order is aligned to the reference-mic run by min magnitude
    distance (tester.py:234-252).  The reference's B=1-only indexing bug at
    tester.py:252 (assigning one batch element's alignment to the whole
    batch) is fixed by construction — alignment is per (shift, batch)."""

    @jax.jit
    def decode(params, mix: jnp.ndarray) -> jnp.ndarray:
        b, m, t, f = mix.shape
        assert m == num_mics
        # Shift order [ref_ch, ref_ch+1, ..., ref_ch-1] (tester.py:216-217);
        # run m puts mic `shift` first, estimating images at mic `shift`.
        shifts = jnp.stack(
            [jnp.roll(mix, -sh, axis=1) for sh in range(num_mics)], axis=0
        )  # [M, B, C, T, F]
        est = model.apply(params, shifts.reshape(num_mics * b, m, t, f))
        s = est.shape[1]
        est = est.reshape(num_mics, b, s, t, f)      # [M, B, S, T, F]

        ref_est = est[ref_ch]                        # [B, S, T, F]
        # dist[m, b, slot, cand] = || |ref_est[b,slot]| - |est[m,b,cand]| ||_1
        dist = jnp.sum(
            jnp.abs(magnitude(ref_est)[None, :, :, None] - magnitude(est)[:, :, None]),
            axis=(-2, -1),
        )                                            # [M, B, S, S]
        idx = align_slots(dist)                      # [M, B, S]
        aligned = jnp.take_along_axis(est, idx[..., None, None], axis=2)
        # [M, B, S, T, F] -> [B, S, M, T, F]
        return aligned.transpose(1, 2, 0, 3, 4)

    return decode


