"""Train-step timing per compute path on the real TPU.

Usage: python scripts/bench_train_variants.py {flat|xla} [--fwd]

Times one full training step (fwd + uPIT loss + grads + Adam, B=8 at the
production [6, 501, 129] geometry) with the scan/trip-count-differencing
protocol from bench.py, for the fused Pallas path (flat) or the plain XLA
path (xla).  --fwd times the forward alone instead.  Feeds the PERF.md
fused-backward before/after table.
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

import optax

from misonet_tpu.config import ModelConfig, StftConfig
from misonet_tpu.losses import loss_upit
from misonet_tpu.models import make_miso1
from misonet_tpu.train.state import create_train_state


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "flat"
    fwd_only = "--fwd" in sys.argv[2:]
    flat = variant == "flat"
    stft_cfg = StftConfig()
    t = stft_cfg.num_frames(int(4.0 * stft_cfg.fs))
    f = stft_cfg.num_bins
    b, c = 8, 6

    model = make_miso1(ModelConfig(compute_dtype="bfloat16", flat_dense=flat))
    kr, ki, kp = jax.random.split(jax.random.key(0), 3)
    mix = jax.lax.complex(
        jax.random.normal(kr, (b, c, t, f)), jax.random.normal(ki, (b, c, t, f))
    )
    ref = jax.lax.complex(
        jax.random.normal(ki, (b, 2, t, f)), jax.random.normal(kr, (b, 2, t, f))
    )
    params = jax.jit(model.init)(kp, mix[:1])
    optimizer = optax.adam(1e-3)
    state0 = jax.jit(lambda p: create_train_state(p, optimizer))(params)

    if fwd_only:

        @partial(jax.jit, static_argnums=2)
        def loop(params, mix, n):
            def body(carry, _):
                out = model.apply(params, mix + carry.astype(mix.dtype))
                return jnp.abs(out).mean() * 1e-12, ()

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
            return carry

        args = (params, mix)
    else:

        @partial(jax.jit, static_argnums=3)
        def loop(state, mix, ref, n):
            def body(state, _):
                def loss_fn(p):
                    return loss_upit(model.apply(p, mix), ref)

                loss, grads = jax.value_and_grad(loss_fn)(state.params)
                updates, opt_state = optimizer.update(
                    grads, state.opt_state, state.params
                )
                return (
                    state.replace(
                        step=state.step + 1,
                        params=optax.apply_updates(state.params, updates),
                        opt_state=opt_state,
                    ),
                    loss,
                )

            state, losses = jax.lax.scan(body, state, None, length=n)
            return losses[-1]

        args = (state0, mix, ref)

    n_small, n_large = 2, 10
    t0 = time.perf_counter()
    float(loop(*args, n_small))
    print(f"compile+warmup: {time.perf_counter() - t0:.1f}s", flush=True)
    float(loop(*args, n_large))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args, n_small))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop(*args, n_large))
        t_l = time.perf_counter() - t0
        dts.append((t_l - t_s) / (n_large - n_small))
    dt = min(dts)
    what = "fwd" if fwd_only else "train step"
    print(
        f"{variant} {what}: {dt * 1e3:.2f} ms  "
        f"({b * 4.0 / dt:.1f} audio-s/s/chip)  runs={[f'{d*1e3:.2f}' for d in dts]}"
    )


if __name__ == "__main__":
    main()
