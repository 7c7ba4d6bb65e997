"""Micro-attribution of the flat trunk conv (enc1 geometry): s2d glue vs
kernel, and tile-size sensitivity.  The group-1 profile shows trunk enc1 at
~1.0 ms for ~5.5 GFLOP (~3% MXU) — far below the dense kernels' ~24% at the
same grid, so something besides the matmul dominates."""

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

from misonet_tpu.models.flat_dense import pick_tile_m, to_flat_bundle
from misonet_tpu.ops.pallas.stencil_flat import conv_down_flat, s2d_flat

B, T = 8, 501
DT = jnp.bfloat16


def timeit(name, fn, *args, n_small=4, n_large=40):
    @partial(jax.jit, static_argnums=0)
    def loop(n, *a):
        def body(carry, _):
            out = fn(*jax.tree.map(lambda v: v + carry.astype(v.dtype), a))
            leaves = jax.tree.leaves(out)
            return jnp.abs(leaves[0].astype(jnp.float32)).mean() * 1e-12, ()

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return carry

    float(loop(n_small, *args))
    float(loop(n_large, *args))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(n_small, *args))
        a = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop(n_large, *args))
        b = time.perf_counter() - t0
        dts.append((b - a) / (n_large - n_small))
    print(f"{name:<52s} {min(dts) * 1e3:8.3f} ms", flush=True)


def main() -> None:
    key = jax.random.key(0)
    f_in, c_in, c_out = 127, 24, 32
    f_out = (f_in - 3) // 2 + 1
    tile_in = pick_tile_m(T, f_in, c_in, c_in, c_in)
    x = jax.random.normal(key, (B, T, f_in, c_in), DT)
    (xf,), scale, mean = to_flat_bundle(x, normalized=False, tile_m=tile_in)
    w = jax.random.normal(jax.random.key(1), (3, 3, c_in, c_out), jnp.float32)
    bias = jnp.zeros((c_out,), jnp.float32)

    for tile_out in (1024, 2048, 4096):
        xe, xo = jax.jit(
            s2d_flat, static_argnums=(1, 2, 3, 4)
        )(xf, T, f_in, tile_in, tile_out)

        timeit(
            f"s2d_flat F={f_in} tile {tile_in}->{tile_out}",
            lambda v, ti=tile_in, to=tile_out: s2d_flat(v, T, f_in, ti, to)[0],
            xf,
        )
        timeit(
            f"conv_down_flat kernel only F={f_in}->{f_out} tile={tile_out}",
            lambda a, b2, to=tile_out: conv_down_flat(
                a, b2, w, bias, scale, mean,
                t=T, f_in=f_in, tile_m=to,
            )[0],
            xe, xo,
        )
        timeit(
            f"trunk total (s2d + kernel) tile={tile_out}",
            lambda v, ti=tile_in, to=tile_out: conv_down_flat(
                *s2d_flat(v, T, f_in, ti, to), w, bias, scale, mean,
                t=T, f_in=f_in, tile_m=to,
            )[0],
            xf,
        )


if __name__ == "__main__":
    main()
