"""The full MISO1 -> MVDR -> MISO2/MISO3 cascade as one on-device pipeline.

Reference counterpart: Tester_Enhance.inference (tester.py:846-975): per
chunk, MISO1_Inference -> align -> Apply_Beamforming per speaker (CPU NumPy)
-> MISO3_inference per speaker -> iSTFT.  Here the whole chain is a single
jitted computation per chunk batch; the per-speaker MVDR and MISO3 passes
are folded into batched axes rather than python loops.

Note on argument order: the reference's trainer/tester call
``model(mix, bf, MISO1)`` against ``forward(self, mixture, MISO1, BF)``
(tester.py:1242 vs model.py:350) — conditioning channels are swapped but
consistently so at train and test time (SURVEY.md §2.4).  We use the
canonical (MISO1, BF) order consistently.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from misonet_tpu.beamforming.mvdr import mvdr_beamform
from misonet_tpu.inference.separate import make_full_array_decode
from misonet_tpu.models import enhance_input


def beamform_sources(
    miso1_full: jnp.ndarray, mix: jnp.ndarray, ref_ch: int = 0
) -> jnp.ndarray:
    """Per-speaker MVDR over the speaker axis.

    miso1_full: [B, S, C, T, F] multi-channel per-speaker images
    mix:        [B, C, T, F]
    -> beamformed [B, S, T, F] (tester.py:917-924 loops speakers; vmapped
    here)."""
    return jax.vmap(
        lambda src: mvdr_beamform(src, mix, ref_ch=ref_ch),
        in_axes=1,
        out_axes=1,
    )(miso1_full)


def make_cascade(
    miso1_model,
    enhance_model,
    num_mics: int,
    ref_ch: int = 0,
    joint: bool = False,
):
    """Build the jitted end-to-end cascade step.

    (miso1_params, enh_params, mix [B, C, T, F]) ->
        dict(miso1 [B,S,T,F], miso1_full [B,S,C,T,F], bf [B,S,T,F],
             enhanced [B,S,T,F])

    joint=False: MISO3 per-speaker enhancement (speakers folded into batch,
    reference tester.py:935-939);
    joint=True:  MISO2 joint enhancement (tester.py:940-947)."""

    decode = make_full_array_decode(miso1_model, num_mics, ref_ch)

    @jax.jit
    def cascade(miso1_params, enh_params, mix: jnp.ndarray):
        b, c, t, f = mix.shape
        miso1_full = decode(miso1_params, mix)           # [B, S, C, T, F]
        s = miso1_full.shape[1]
        miso1_ref = miso1_full[:, :, ref_ch]             # [B, S, T, F]
        bf = beamform_sources(miso1_full, mix, ref_ch)   # [B, S, T, F]

        if joint:
            x = enhance_input(mix, miso1_ref, bf)        # [B, C+2S, T, F]
            enhanced = enhance_model.apply(enh_params, x)
        else:
            # fold speakers into the batch axis for one MISO3 forward
            mix_rep = jnp.repeat(mix, s, axis=0)         # [B*S, C, T, F]
            m1 = miso1_ref.reshape(b * s, 1, t, f)
            bf_ = bf.reshape(b * s, 1, t, f)
            x = enhance_input(mix_rep, m1, bf_)          # [B*S, C+2, T, F]
            enhanced = enhance_model.apply(enh_params, x)  # [B*S, 1, T, F]
            enhanced = enhanced.reshape(b, s, t, f)

        return {
            "miso1": miso1_ref,
            "miso1_full": miso1_full,
            "bf": bf,
            "enhanced": enhanced,
        }

    return cascade
