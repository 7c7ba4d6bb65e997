"""Benchmark: MISO1 separation throughput in audio-seconds/s/chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "audio-s/s/chip", "vs_baseline": N}

Default workload is the reference pipeline's hot inference loop — the
MISO1 forward on 4-second 6-channel chunks ([B, 6, 501, 129] complex
spectrograms, SURVEY.md §3 hot-loop a).  ``--train`` times the production
training hot loop instead (fwd + uPIT loss + grads + Adam, reference
trainer.py:144-212).  ``vs_baseline`` compares the forward against the
PyTorch reference model forward measured on CPU in this container
(BENCH_BASELINE.json; north star is >=8x, /root/repo/BASELINE.json);
in --train mode it compares against this framework's plain-XLA train
step under the identical protocol (BENCH_TRAIN_BASELINE.json — the
reference publishes no training throughput).

The model is built with ``flat_dense="auto"`` — the production resolver
(models/flat_dense.py::resolve_flat) that picks the fused Pallas path on
TPU and plain XLA elsewhere — so the bench exercises exactly what users
get.

Timing protocol: the axon relay executes asynchronously and dedupes
identical dispatches, so wall-timing repeated ``fn(x)`` calls measures
nothing.  We instead time one jitted computation containing a
data-dependent scan of N model iterations, fetch a scalar result (which
forces completion), and difference two trip counts to cancel the fixed
dispatch/transfer overhead.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/misonet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from misonet_tpu.config import ModelConfig, StftConfig
from misonet_tpu.models import make_miso1


def _timed_scan(loop, *args) -> float:
    """Per-iteration seconds of ``loop(*args, n)`` via trip-count
    differencing (cancels the fixed dispatch/transfer overhead)."""
    n_small, n_large = 2, 12
    float(loop(*args, n_small))  # compile + warmup
    float(loop(*args, n_large))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args, n_small))
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop(*args, n_large))
        t_large = time.perf_counter() - t0
        dts.append((t_large - t_small) / (n_large - n_small))
    return min(dts)


def main() -> None:
    train = "--train" in sys.argv[1:]
    stft_cfg = StftConfig()
    chunk_seconds = 4.0
    t = stft_cfg.num_frames(int(chunk_seconds * stft_cfg.fs))  # 501
    f = stft_cfg.num_bins                                      # 129
    b, c = 8, 6

    platform = jax.devices()[0].platform
    compute = "bfloat16" if platform != "cpu" else "float32"
    # flat_dense="auto": the production resolver — fused Pallas kernels on
    # TPU when the geometry qualifies, plain XLA otherwise.
    model = make_miso1(ModelConfig(compute_dtype=compute, flat_dense="auto"))

    kr, ki, kp = jax.random.split(jax.random.key(0), 3)
    mix = jax.lax.complex(
        jax.random.normal(kr, (b, c, t, f)), jax.random.normal(ki, (b, c, t, f))
    )
    # jit the init: unjitted it dispatches per-param ops through the axon
    # relay (~50 ms each), adding minutes before the benchmark starts
    params = jax.jit(model.init)(kp, mix[:1])

    if train:
        import optax

        from misonet_tpu.losses import loss_upit
        from misonet_tpu.train.state import create_train_state

        ref = jax.lax.complex(
            jax.random.normal(kr, (b, 2, t, f)),
            jax.random.normal(ki, (b, 2, t, f)),
        )
        optimizer = optax.adam(1e-3)
        state0 = jax.jit(lambda p: create_train_state(p, optimizer))(params)

        @partial(jax.jit, static_argnums=3)
        def loop(state, mix, ref, n):
            def body(state, _):
                def loss_fn(p):
                    return loss_upit(model.apply(p, mix), ref)

                loss, grads = jax.value_and_grad(loss_fn)(state.params)
                updates, opt_state = optimizer.update(
                    grads, state.opt_state, state.params
                )
                new_params = optax.apply_updates(state.params, updates)
                return (
                    state.replace(
                        step=state.step + 1,
                        params=new_params,
                        opt_state=opt_state,
                    ),
                    loss,
                )

            state, losses = jax.lax.scan(body, state, None, length=n)
            return losses[-1]

        dt = _timed_scan(loop, state0, mix, ref)
        metric = "miso1_train_step_throughput"
    else:

        @partial(jax.jit, static_argnums=2)
        def loop(params, mix, n):
            def body(carry, _):
                out = model.apply(params, mix + carry.astype(mix.dtype))
                return jnp.abs(out).mean() * 1e-12, ()

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return carry

        dt = _timed_scan(loop, params, mix)
        metric = "miso1_separation_throughput"

    audio_s_per_s = b * chunk_seconds / dt
    # --train compares against the plain-XLA train step measured under the
    # same protocol (BENCH_TRAIN_BASELINE.json) — the upstream repo
    # publishes no training throughput, and dividing a train number by the
    # forward-only CPU baseline would be apples-to-oranges.
    baseline_file = (
        "BENCH_TRAIN_BASELINE.json" if train else "BENCH_BASELINE.json"
    )
    baseline = json.loads(
        (Path(__file__).parent / baseline_file).read_text()
    )["audio_seconds_per_s"]

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(audio_s_per_s, 2),
                "unit": "audio-s/s/chip",
                "vs_baseline": round(audio_s_per_s / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
