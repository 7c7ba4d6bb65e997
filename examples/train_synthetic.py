#!/usr/bin/env python
"""End-to-end training demo on synthetic multi-microphone mixtures.

Trains the full-size MISO1 separation net (2.59M params, bf16 on TPU) on
synthetic 6-channel reverberant 2-speaker mixtures, then evaluates SI-SDR of
the separated output against the mixture baseline — a self-contained proof
that the training dynamics, PIT loss, and inference stack learn to separate.

Run:  python examples/train_synthetic.py [--steps 2000] [--eval-utts 8]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/misonet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from misonet_tpu.config import DatasetConfig, ModelConfig, OptimizerConfig, StftConfig
from misonet_tpu.data.synthetic import synth_mixture
from misonet_tpu.metrics import numpy_si_sdr
from misonet_tpu.models import make_miso1
from misonet_tpu.ops.stft import istft_scaled, stft_scaled
from misonet_tpu.train import (
    create_train_state,
    make_optimizer,
    make_separate_wave_train_step,
)
from misonet_tpu.utils.checkpoint import save_checkpoint


def pit_si_sdr(est: np.ndarray, refs: np.ndarray) -> float:
    import itertools

    best = -np.inf
    for perm in itertools.permutations(range(refs.shape[0])):
        val = np.mean(
            [numpy_si_sdr(est[perm[s]], refs[s]) for s in range(refs.shape[0])]
        )
        best = max(best, val)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--train-utts", type=int, default=256)
    ap.add_argument("--eval-utts", type=int, default=8)
    ap.add_argument("--samples", type=int, default=32000)
    ap.add_argument("--save", default="")
    ap.add_argument("--voiced", action="store_true",
                    help="harmonic pseudo-speech sources (the cascade "
                         "demo's regime) instead of modulated noise")
    ap.add_argument("--config", default="",
                    help="YAML config (e.g. configs/reverb_2mix.yml): "
                         "takes the model plan, STFT and mic count from it "
                         "instead of the SMS-WSJ defaults")
    args = ap.parse_args()

    import dataclasses

    num_ch = 6
    if args.config:
        from misonet_tpu.config import load_yaml

        cfg = load_yaml(args.config)
        stft_cfg = cfg.stft
        num_ch = cfg.dataset.num_ch_utilize
        mcfg = cfg.miso1
    else:
        stft_cfg = StftConfig()
        mcfg = ModelConfig()
    platform = jax.devices()[0].platform
    compute = "bfloat16" if platform != "cpu" else "float32"
    model = make_miso1(dataclasses.replace(mcfg, compute_dtype=compute))

    print(f"platform={platform} compute={compute} ch={num_ch} "
          f"F={stft_cfg.num_bins}", flush=True)
    print("generating data...", flush=True)
    train = [
        synth_mixture(i, args.samples, num_ch, voiced=args.voiced)
        for i in range(args.train_utts)
    ]
    evals = [
        synth_mixture(10_000 + i, args.samples, num_ch, voiced=args.voiced)
        for i in range(args.eval_utts)
    ]
    mix_all = np.stack([d["mix"] for d in train])  # [N, S, C]
    ref_all = np.stack([d["ref"] for d in train])  # [N, 2, S]

    probe = stft_scaled(jnp.asarray(mix_all[: args.batch]).transpose(0, 2, 1), stft_cfg)
    params = model.init(jax.random.key(0), probe)
    opt = make_optimizer(OptimizerConfig(lr=1e-3))
    state = create_train_state(params, opt)
    step = make_separate_wave_train_step(model, opt, stft_cfg)

    # Stage the whole corpus in HBM once; batches are gathered on device so
    # the host ships nothing per step (the tunnel transfer would otherwise
    # dominate the 130 ms step).  Ship in <=128 MB slices — the relay
    # rejects single transfer bodies past ~256 MB (HTTP 413).
    def stage(a: np.ndarray) -> jnp.ndarray:
        n = max(1, -(-a.nbytes // (128 << 20)))
        k = -(-len(a) // n)
        pieces = []
        for i in range(n):
            p = jnp.asarray(a[i * k : (i + 1) * k])
            float(p.ravel()[0])  # force this slice's transfer through
            pieces.append(p)
        return pieces[0] if n == 1 else jnp.concatenate(pieces, axis=0)

    mix_dev = stage(mix_all)
    ref_dev = stage(ref_all)

    # corpus arrays are jit ARGUMENTS, not closure constants — a closed-over
    # value can be inlined into the compiled program, and a corpus-sized
    # literal overflows the relay's compile-request body (HTTP 413)
    @jax.jit
    def gather(mix_dev, ref_dev, idx):
        return jnp.take(mix_dev, idx, axis=0), jnp.take(ref_dev, idx, axis=0)

    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    for it in range(args.steps):
        idx = jnp.asarray(rng.integers(0, args.train_utts, args.batch))
        mix_b, ref_b = gather(mix_dev, ref_dev, idx)
        state, metrics = step(state, mix_b, ref_b)
        if it % 100 == 0 or it == args.steps - 1:
            loss = float(metrics["loss"])  # forces completion
            dt = time.perf_counter() - t0
            print(f"step {it}: loss {loss:.0f} ({dt:.0f}s)", flush=True)

    # ---- evaluate: separated SI-SDR vs mixture baseline ----------------
    @jax.jit
    def separate(params, mix_wave):
        mix = stft_scaled(mix_wave.transpose(0, 2, 1), stft_cfg)
        est = model.apply(params, mix)
        return istft_scaled(est, stft_cfg, mix_wave.shape[1])

    base_scores, est_scores = [], []
    for d in evals:
        refs = d["ref"]
        mix0 = d["mix"][:, 0]  # reference-mic mixture
        base_scores.append(pit_si_sdr(np.stack([mix0, mix0]), refs))
        est = np.asarray(separate(state.params, jnp.asarray(d["mix"][None])))[0]
        est_scores.append(pit_si_sdr(est, refs))

    base = float(np.mean(base_scores))
    sep = float(np.mean(est_scores))
    print(f"mixture SI-SDR: {base:.2f} dB", flush=True)
    print(f"MISO1 separated SI-SDR: {sep:.2f} dB", flush=True)
    print(f"improvement: {sep - base:.2f} dB", flush=True)

    if args.save:
        save_checkpoint(args.save, "demo", state, {"si_sdr": sep, "base": base})
        print(f"checkpoint saved to {args.save}/demo", flush=True)


if __name__ == "__main__":
    main()
