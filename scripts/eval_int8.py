"""SI-SDR cost of the int8 decode path on a TRAINED separator.

Restores the checkpoint written by ``examples/train_synthetic.py --save``
and scores the same held-out synthetic mixtures (seeds 10_000+i) with the
bf16 flat decode vs ``quant_int8=True`` — the end-to-end quality datum
for the PERF.md int8 entry.

Run:  python examples/train_synthetic.py --steps 3000 --save /tmp/int8_ckpt
      python scripts/eval_int8.py --ckpt /tmp/int8_ckpt
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/misonet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from misonet_tpu.config import ModelConfig, OptimizerConfig, StftConfig
from misonet_tpu.data.synthetic import synth_mixture
from misonet_tpu.metrics import numpy_si_sdr
from misonet_tpu.models import make_miso1
from misonet_tpu.ops.stft import istft_scaled, stft_scaled
from misonet_tpu.train import create_train_state, make_optimizer
from misonet_tpu.utils.checkpoint import load_checkpoint


def pit_si_sdr(est: np.ndarray, refs: np.ndarray) -> float:
    a = 0.5 * (numpy_si_sdr(est[0], refs[0]) + numpy_si_sdr(est[1], refs[1]))
    b = 0.5 * (numpy_si_sdr(est[0], refs[1]) + numpy_si_sdr(est[1], refs[0]))
    return float(max(a, b))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/int8_ckpt")
    ap.add_argument("--eval-utts", type=int, default=8)
    ap.add_argument("--samples", type=int, default=32000)
    ap.add_argument("--voiced", action="store_true")
    args = ap.parse_args()

    stft_cfg = StftConfig()
    cfg16 = ModelConfig(compute_dtype="bfloat16")
    cfg8 = dataclasses.replace(cfg16, quant_int8=True)
    m16, m8 = make_miso1(cfg16), make_miso1(cfg8)

    evals = [
        synth_mixture(10_000 + i, args.samples, 6, voiced=args.voiced)
        for i in range(args.eval_utts)
    ]

    probe = stft_scaled(
        jnp.asarray(evals[0]["mix"][None].transpose(0, 2, 1)), stft_cfg
    )
    params0 = jax.jit(m16.init)(jax.random.key(0), probe)
    opt = make_optimizer(OptimizerConfig(lr=1e-3))
    target = jax.jit(lambda p: create_train_state(p, opt))(params0)
    state, meta = load_checkpoint(args.ckpt, "demo", target)
    print(f"restored {args.ckpt}/demo meta={meta}", flush=True)

    def scorer(model):
        @jax.jit
        def separate(params, mix_wave):
            mix = stft_scaled(mix_wave.transpose(0, 2, 1), stft_cfg)
            est = model.apply(params, mix)
            return istft_scaled(est, stft_cfg, mix_wave.shape[1])

        scores = []
        for d in evals:
            est = np.asarray(
                separate(state.params, jnp.asarray(d["mix"][None]))
            )[0]
            scores.append(pit_si_sdr(est, d["ref"]))
        return float(np.mean(scores))

    base = float(np.mean([
        pit_si_sdr(np.stack([d["mix"][:, 0]] * 2), d["ref"]) for d in evals
    ]))
    s16 = scorer(m16)
    s8 = scorer(m8)
    print(f"mixture SI-SDR:      {base:6.2f} dB", flush=True)
    print(f"bf16 decode SI-SDR:  {s16:6.2f} dB", flush=True)
    print(f"int8 decode SI-SDR:  {s8:6.2f} dB  (cost {s16 - s8:+.2f} dB)",
          flush=True)


if __name__ == "__main__":
    main()
