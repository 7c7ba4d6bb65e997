"""Tile-size probe for the heavy decoder DenseBlock stages (F=127, F=63):
times dense_block_stacked at several tile_m on the real chip."""
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

from misonet_tpu.models.flat_dense import DenseBlockFlat, to_flat_bundle, merge_bundles

B, T = 8, 501


def probe(f, c_half, g1, g2, tile, quant=False):
    rng = jax.random.key(f * 1000 + tile)
    ka, kb, kp = jax.random.split(rng, 3)
    xa = jax.random.normal(ka, (B, T, f, c_half), jnp.float32)
    xb = jax.random.normal(kb, (B, T, f, c_half), jnp.float32)
    flat = DenseBlockFlat(g1, g2)

    def build(xa, xb):
        ba = to_flat_bundle(xa, normalized=True, tile_m=tile, dtype=jnp.bfloat16)
        bb = to_flat_bundle(xb, normalized=True, tile_m=tile, dtype=jnp.bfloat16)
        return merge_bundles(ba, bb)

    params = jax.jit(flat.init, static_argnames=("t", "f", "tile_m"))(
        kp, build(xa[:1], xb[:1]), t=T, f=f, tile_m=tile
    )

    @partial(jax.jit, static_argnums=(3,))
    def loop(params, xa, xb, n):
        def body(carry, _):
            bundle = build(xa + carry, xb)
            y, sc, mn = flat.apply(params, bundle, t=T, f=f, tile_m=tile, quant=quant)
            return jnp.float32(jnp.sum(mn) * 1e-12), ()

        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return out

    n_s, n_l = 2, 12
    float(loop(params, xa, xb, n_s))
    float(loop(params, xa, xb, n_l))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(loop(params, xa, xb, n_s)); a = time.perf_counter() - t0
        t0 = time.perf_counter(); float(loop(params, xa, xb, n_l)); b = time.perf_counter() - t0
        dts.append((b - a) / (n_l - n_s))
    print(f"F={f} cin={2*c_half} g1={g1} g2={g2} tile={tile} quant={quant}: "
          f"{min(dts)*1e3:7.3f} ms", flush=True)


which = sys.argv[1] if len(sys.argv) > 1 else "dec6"
if which == "int8":
    for geo in [(127, 24, 24, 48), (63, 32, 32, 64), (31, 32, 32, 64)]:
        for quant in (False, True):
            probe(*geo, 4096 if geo[0] >= 63 else 1024, quant=quant)
else:
    tiles = [int(x) for x in sys.argv[2:]] or [2048, 4096]
    for tile in tiles:
        if which == "dec6":
            probe(127, 24, 24, 48, tile)
        else:
            probe(63, 32, 32, 64, tile)
