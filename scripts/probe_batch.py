"""Forward-throughput batch-size scaling probe on TPU (scan protocol).

Finds the audio-s/s/chip-maximizing batch for the MISO1 forward — fixed
per-dispatch overheads and sub-peak tile occupancy amortize with B, and
the production decode path genuinely batches chunks
(inference/evaluate.py batches all of an utterance's chunks through one
forward).  Usage: python scripts/probe_batch.py [B ...]
"""

from __future__ import annotations

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
from misonet_tpu.models import make_miso1


def main() -> None:
    batches = [int(a) for a in sys.argv[1:]] or [8, 16, 32]
    stft = StftConfig()
    t, f, c = stft.num_frames(int(4.0 * stft.fs)), stft.num_bins, 6
    model = make_miso1(ModelConfig(compute_dtype="bfloat16", flat_dense=True))

    for b in batches:
        kr, ki, kp = jax.random.split(jax.random.key(0), 3)
        mix = jax.lax.complex(
            jax.random.normal(kr, (b, c, t, f)),
            jax.random.normal(ki, (b, c, t, f)),
        )
        params = jax.jit(model.init)(kp, mix[:1])

        @partial(jax.jit, static_argnums=2)
        def loop(params, mix, n):
            def body(carry, _):
                out = model.apply(params, mix + carry.astype(mix.dtype))
                return jnp.abs(out).mean() * 1e-12, ()

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return carry

        n_s, n_l = 2, max(4, 96 // b)
        float(loop(params, mix, n_s))
        float(loop(params, mix, n_l))
        dts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(loop(params, mix, n_s))
            a = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(loop(params, mix, n_l))
            bb = time.perf_counter() - t0
            dts.append((bb - a) / (n_l - n_s))
        dt = min(dts)
        print(f"B={b:3d}: {dt * 1e3:7.2f} ms/fwd  {b * 4.0 / dt:8.1f} audio-s/s")


if __name__ == "__main__":
    main()
