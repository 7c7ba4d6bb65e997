"""Benchmark: MISO1 separation throughput in audio-seconds/s/chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "audio-s/s/chip", "vs_baseline": N}

The workload is the reference pipeline's hot loop — the MISO1 forward on
4-second 6-channel chunks ([B, 6, 501, 129] complex spectrograms,
SURVEY.md §3 hot-loop a).  ``vs_baseline`` compares against the PyTorch
reference model forward measured on CPU in this container
(BENCH_BASELINE.json; north star is >=8x, /root/repo/BASELINE.json).

Timing protocol: the axon relay executes asynchronously and dedupes
identical dispatches, so wall-timing repeated ``fn(x)`` calls measures
nothing.  We instead time one jitted computation containing a
data-dependent scan of N model forwards, fetch a scalar result (which
forces completion), and difference two trip counts to cancel the fixed
dispatch/transfer overhead.
"""

from __future__ import annotations

import json
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/misonet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from misonet_tpu.config import ModelConfig, StftConfig
from misonet_tpu.models import make_miso1


def main() -> None:
    stft_cfg = StftConfig()
    chunk_seconds = 4.0
    t = stft_cfg.num_frames(int(chunk_seconds * stft_cfg.fs))  # 501
    f = stft_cfg.num_bins                                      # 129
    b, c = 8, 6

    platform = jax.devices()[0].platform
    on_tpu = platform != "cpu"
    compute = "bfloat16" if on_tpu else "float32"
    # flat_dense: the fused Pallas conv+ELU+InstanceNorm DenseBlock path
    # (ops/pallas/dense_flat.py) — TPU-only fast path, parity-tested.
    model = make_miso1(ModelConfig(compute_dtype=compute, flat_dense=on_tpu))

    kr, ki, kp = jax.random.split(jax.random.key(0), 3)
    mix = jax.lax.complex(
        jax.random.normal(kr, (b, c, t, f)), jax.random.normal(ki, (b, c, t, f))
    )
    # jit the init: unjitted it dispatches per-param ops through the axon
    # relay (~50 ms each), adding minutes before the benchmark starts
    params = jax.jit(model.init)(kp, mix[:1])

    @partial(jax.jit, static_argnums=2)
    def loop(params, mix, n):
        def body(carry, _):
            out = model.apply(params, mix + carry.astype(mix.dtype))
            return jnp.abs(out).mean() * 1e-12, ()
        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return carry

    n_small, n_large = 2, 12
    float(loop(params, mix, n_small))  # compile + warmup
    float(loop(params, mix, n_large))

    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(params, mix, n_small))
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop(params, mix, n_large))
        t_large = time.perf_counter() - t0
        dts.append((t_large - t_small) / (n_large - n_small))
    dt = min(dts)  # per-forward seconds, overhead cancelled

    audio_s_per_s = b * chunk_seconds / dt
    baseline = json.loads(
        (Path(__file__).parent / "BENCH_BASELINE.json").read_text()
    )["audio_seconds_per_s"]

    print(
        json.dumps(
            {
                "metric": "miso1_separation_throughput",
                "value": round(audio_s_per_s, 2),
                "unit": "audio-s/s/chip",
                "vs_baseline": round(audio_s_per_s / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
