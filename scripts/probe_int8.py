"""Measure-first probe for the int8 decode idea (PERF.md roadmap #2):
raw Pallas matmul throughput, bf16 x bf16 -> f32 vs int8 x int8 -> int32,
at the flat dense kernels' shapes.

The flat forward's matmuls are ``w[N, K] @ p[K, TM]`` with N = stacked
consumer widths (144/120/96/.../24) and K = packed patch rows (~9 * C).
v5e int8 peak is 2x bf16, but the row-occupancy cap (N/128-blocks) and
the int8 (32, 128) min tile both bite harder at these small N/K — this
probe answers whether int8 can beat bf16 at OUR shapes before any kernel
is rewritten.  Run on the real chip:

    python scripts/probe_int8.py
"""
from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/misonet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _matmul_kernel(w_ref, p_ref, o_ref, *, acc_dtype):
    o_ref[:, :] = jax.lax.dot_general(
        w_ref[:, :], p_ref[:, :],
        (((1,), (0,)), ((), ())),
        preferred_element_type=acc_dtype,
    )


def make_matmul(n, k, m_total, tile_m, dtype, acc_dtype):
    grid = (m_total // tile_m,)
    return pl.pallas_call(
        functools.partial(_matmul_kernel, acc_dtype=acc_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, k), lambda i: (0, 0)),
            pl.BlockSpec((k, tile_m), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((n, tile_m), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((n, m_total), acc_dtype),
    )


def timed(fn, *args):
    """Scan trip-count differencing (see bench.py protocol)."""

    @functools.partial(jax.jit, static_argnums=(len(args),))
    def loop(*a):
        (w, p), n = a[:-1], a[-1]

        def body(c, _):
            # fold the carry into w so the matmul is NOT loop-invariant
            # (XLA would hoist it out of the scan otherwise)
            y = fn(w + c.astype(w.dtype), p)
            return (y[0, 0] & 1).astype(jnp.int32) if y.dtype == jnp.int32 \
                else (y[0, 0] * 1e-9).astype(jnp.float32), ()

        c0 = jnp.int32(0) if args[0].dtype == jnp.int8 else jnp.float32(0.0)
        out, _ = jax.lax.scan(body, c0, None, length=n)
        return out.astype(jnp.float32)

    n_s, n_l = 10, 210
    float(loop(*args, n_s))
    float(loop(*args, n_l))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(loop(*args, n_s)); a = time.perf_counter() - t0
        t0 = time.perf_counter(); float(loop(*args, n_l)); b = time.perf_counter() - t0
        dts.append((b - a) / (n_l - n_s))
    return min(dts)


def probe(n, k, m_total=524288, tile_m=2048):
    rng = jax.random.key(n * 1000 + k)
    kw, kp = jax.random.split(rng)
    flops = 2 * n * k * m_total

    w16 = jax.random.normal(kw, (n, k), jnp.float32).astype(jnp.bfloat16)
    p16 = jax.random.normal(kp, (k, m_total), jnp.float32).astype(jnp.bfloat16)
    f16 = make_matmul(n, k, m_total, tile_m, jnp.bfloat16, jnp.float32)
    t16 = timed(f16, w16, p16)

    w8 = jax.random.randint(kw, (n, k), -127, 127, jnp.int8)
    p8 = jax.random.randint(kp, (k, m_total), -127, 127, jnp.int8)
    f8 = make_matmul(n, k, m_total, tile_m, jnp.int8, jnp.int32)
    t8 = timed(f8, w8, p8)

    print(
        f"N={n:4d} K={k:5d}: bf16 {t16*1e3:7.3f} ms ({flops/t16/1e12:6.1f} TF/s)"
        f"  int8 {t8*1e3:7.3f} ms ({flops/t8/1e12:6.1f} TOP/s)"
        f"  speedup {t16/t8:4.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    print(f"platform={jax.devices()[0].platform}", flush=True)
    # Flat-kernel shapes: dec6 stacked call0 (N=144 rows incl. mask block,
    # K=9*48ch packed ~448), enc-side N=120 K~224, narrow tail N=24, plus
    # aligned controls (128/256) to read the pure-occupancy effect.
    for n, k in [(144, 448), (120, 224), (96, 448), (24, 224),
                 (128, 512), (256, 512)]:
        probe(n, k)
    for n, k in [(128, 2048), (512, 2048)]:
        probe(n, k, tile_m=512)
