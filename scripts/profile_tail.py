"""Attribute the non-flat-kernel tail of the train step: the uPIT loss's
own fwd+bwd (gradient w.r.t. the estimate) and the Adam update, at bench
shapes.  Subtracting these plus the measured flat fwd/bwd from the 38.3 ms
step isolates the XLA stages' (enc5/6, TCN, dec0/1) backward cost."""
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

from misonet_tpu.losses import loss_upit

B, S, T, F = 8, 2, 501, 129


def timed(fn, *args, n_small=2, n_large=12):
    @partial(jax.jit, static_argnums=len(args))
    def loop(*a):
        *xs, n = a

        def body(carry, _):
            return fn(carry, *xs), ()

        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return out

    float(loop(*args, n_small))
    float(loop(*args, n_large))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(loop(*args, n_small)); a = time.perf_counter() - t0
        t0 = time.perf_counter(); float(loop(*args, n_large)); b = time.perf_counter() - t0
        dts.append((b - a) / (n_large - n_small))
    return min(dts)


def main():
    kr, ki = jax.random.split(jax.random.key(0))
    est = jax.lax.complex(
        jax.random.normal(kr, (B, S, T, F)), jax.random.normal(ki, (B, S, T, F))
    )
    ref = est * 0.9

    def loss_fwd(carry, est, ref):
        return loss_upit(est + carry.astype(est.dtype), ref) * 1e-12

    def loss_fwdbwd(carry, est, ref):
        def f(e):
            return loss_upit(e, ref)

        l, g = jax.value_and_grad(f)(est + carry.astype(est.dtype))
        return (l + jnp.abs(g).sum()) * 1e-12

    t1 = timed(loss_fwd, est, ref)
    t2 = timed(loss_fwdbwd, est, ref)
    print(f"loss_upit fwd:        {t1*1e3:7.3f} ms")
    print(f"loss_upit fwd+bwd:    {t2*1e3:7.3f} ms")

    # Adam update over a MISO-sized param tree (2.6M params)
    params = {f"p{i}": jax.random.normal(kr, (128, 128)) for i in range(160)}
    opt = optax.adam(1e-3)
    state = jax.jit(opt.init)(params)

    def adam_step(carry, params, state):
        grads = jax.tree.map(lambda x: x * (1e-6 + carry), params)
        updates, state2 = opt.update(grads, state, params)
        p2 = optax.apply_updates(params, updates)
        return jax.tree.leaves(p2)[0].sum() * 1e-12

    t3 = timed(adam_step, params, state)
    print(f"adam update (2.6M):   {t3*1e3:7.3f} ms")

    # TCN bottleneck (the dominant XLA stage of the tail): R=2 x X=7
    # dilated blocks at bench shapes [8, 501, 128], fwd and fwd+bwd
    from misonet_tpu.config import ModelConfig
    from misonet_tpu.models.blocks import TemporalConvNet

    cfg = ModelConfig()
    tcn = TemporalConvNet(
        repeats=cfg.tcn_repeats, blocks=cfg.tcn_blocks,
        features=cfg.tcn_channels, norm_type=cfg.norm_type,
        dtype=jnp.bfloat16,
    )
    x = jax.random.normal(kr, (B, T, 128), jnp.bfloat16)
    tp = jax.jit(tcn.init)(jax.random.key(2), x)

    def tcn_fwd(carry, tp, x):
        return tcn.apply(tp, x + carry.astype(x.dtype)).astype(
            jnp.float32
        ).sum() * 1e-12

    def tcn_fwdbwd(carry, tp, x):
        def f(p):
            return tcn.apply(p, x + carry.astype(x.dtype)).astype(
                jnp.float32
            ).sum()

        l, g = jax.value_and_grad(f)(tp)
        return (l + sum(jnp.abs(v).sum() for v in jax.tree.leaves(g))) * 1e-12

    t4 = timed(tcn_fwd, tp, x)
    t5 = timed(tcn_fwdbwd, tp, x)
    print(f"TCN fwd:              {t4*1e3:7.3f} ms")
    print(f"TCN fwd+bwd:          {t5*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
