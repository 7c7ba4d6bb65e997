"""Training-step timing on TPU: fused flat_dense forward + XLA backward
(ops/pallas/flat_grad.py custom VJPs) vs the plain XLA path.

Same scan-differencing protocol as bench.py (axon relay is async and
dedupes identical dispatches).

Usage: python scripts/profile_train.py [--steps-small 2] [--steps-large 8]
"""

from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/misonet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from misonet_tpu.config import ModelConfig, StftConfig
from misonet_tpu.losses import loss_upit
from misonet_tpu.models import make_miso1

B, C, SPKS = 8, 6, 2


def time_train(name, model, mix, ref, n_small, n_large):
    params = jax.jit(model.init)(jax.random.key(0), mix[:1])

    def loss_fn(params, mix, ref):
        est = model.apply(params, mix)
        return loss_upit(est, ref)

    # chain through mix so the scan cannot be hoisted: perturb input.
    # EVERY gradient leaf must stay live (optax.global_norm) — consuming a
    # single leaf lets XLA dead-code-eliminate most of the weight-gradient
    # convolutions and under-measures the backward (this bug made the r3
    # numbers 65.1/83.4 ms; honest protocol: bench_train_variants.py).
    import optax

    @partial(jax.jit, static_argnums=3)
    def loop2(params, mix, ref, n):
        def body(carry, _):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, mix + carry.astype(mix.dtype), ref
            )
            gn = optax.global_norm(grads)
            return loss * 1e-12 + gn * 1e-12, ()

        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return out

    float(loop2(params, mix, ref, n_small))
    float(loop2(params, mix, ref, n_large))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop2(params, mix, ref, n_small))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop2(params, mix, ref, n_large))
        t_l = time.perf_counter() - t0
        dts.append((t_l - t_s) / (n_large - n_small))
    dt = min(dts)
    chunk_s = 4.0
    print(f"{name:<28s} {dt * 1e3:8.2f} ms/step "
          f"{B * chunk_s / dt:8.1f} audio-s/s")
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps-small", type=int, default=2)
    ap.add_argument("--steps-large", type=int, default=8)
    args = ap.parse_args()

    stft = StftConfig()
    t = stft.num_frames(int(4.0 * stft.fs))
    f = stft.num_bins
    kr, ki, k2, k3 = jax.random.split(jax.random.key(1), 4)
    mix = jax.lax.complex(
        jax.random.normal(kr, (B, C, t, f)), jax.random.normal(ki, (B, C, t, f))
    )
    ref = jax.lax.complex(
        jax.random.normal(k2, (B, SPKS, t, f)),
        jax.random.normal(k3, (B, SPKS, t, f)),
    )

    for name, flat in (("train plain XLA", False), ("train flat_dense", True)):
        model = make_miso1(
            ModelConfig(compute_dtype="bfloat16", flat_dense=flat)
        )
        time_train(name, model, mix, ref, args.steps_small, args.steps_large)


if __name__ == "__main__":
    main()
