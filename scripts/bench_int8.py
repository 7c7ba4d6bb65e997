"""int8 decode benchmark (PERF.md r5): full MISO1 forward, bf16 flat vs
quant_int8 flat, same weights — throughput and output agreement on the
real chip.  bench.py scan protocol (trip-count differencing)."""
from __future__ import annotations

import dataclasses
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/misonet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from misonet_tpu.config import ModelConfig
from misonet_tpu.models import make_miso1

B, C, T, F = 8, 6, 501, 129
CHUNK_S = 4.0


def timed_forward(model, params, xr, xi):
    @partial(jax.jit, static_argnums=(3,))
    def loop(params, xr, xi, n):
        def body(c, _):
            y = model.apply(params, jax.lax.complex(xr + c, xi))
            return jnp.float32(jnp.abs(y).sum() * 1e-12), ()

        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return out

    n_s, n_l = 2, 12
    float(loop(params, xr, xi, n_s))
    float(loop(params, xr, xi, n_l))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(loop(params, xr, xi, n_s)); a = time.perf_counter() - t0
        t0 = time.perf_counter(); float(loop(params, xr, xi, n_l)); b = time.perf_counter() - t0
        dts.append((b - a) / (n_l - n_s))
    return min(dts)


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((B, C, T, F)).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal((B, C, T, F)).astype(np.float32))

    cfg16 = ModelConfig(flat_dense="auto")
    cfg8 = dataclasses.replace(cfg16, quant_int8=True)
    m16, m8 = make_miso1(cfg16), make_miso1(cfg8)
    # NB eager ``xr + 1j*xi`` would device_put a complex scalar constant —
    # complex host->device is UNIMPLEMENTED on this backend (PERF.md);
    # lax.complex keeps the transfer real-only.
    params = jax.jit(m16.init)(jax.random.key(0), jax.lax.complex(xr, xi))

    def fetch(model):
        # complex64 device_get is UNIMPLEMENTED on this backend (PERF.md)
        @jax.jit
        def f(params, xr, xi):
            y = model.apply(params, jax.lax.complex(xr, xi))
            return y.real, y.imag

        yr, yi = f(params, xr, xi)
        return np.asarray(yr) + 1j * np.asarray(yi)

    y16 = fetch(m16)
    y8 = fetch(m8)
    d = np.abs(y8 - y16)
    rel = np.sqrt((d ** 2).mean()) / np.sqrt((np.abs(y16) ** 2).mean())
    print(f"output rel-rms int8 vs bf16: {rel:.4f} "
          f"(max|d| {d.max():.3f} / |y| max {np.abs(y16).max():.3f})",
          flush=True)

    t16 = timed_forward(m16, params, xr, xi)
    t8 = timed_forward(m8, params, xr, xi)
    au = B * CHUNK_S
    print(f"bf16 forward: {t16*1e3:7.2f} ms  {au/t16:7.1f} audio-s/s", flush=True)
    print(f"int8 forward: {t8*1e3:7.2f} ms  {au/t8:7.1f} audio-s/s  "
          f"({t16/t8:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
