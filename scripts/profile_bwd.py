"""Per-stage attribution of the fused BACKWARD (ops/pallas/stencil_bwd.py)
on TPU: times (forward+backward) - forward per flat stage, same framing and
trip-count protocol as profile_forward2.py.

Usage: python scripts/profile_bwd.py [--group 0|1|2]
  group 0: full train-relevant fwd+bwd vs fwd of the whole model
  group 1: encoder stages (trunk convs + dense levels)
  group 2: decoder stages (deconvs + dense levels)
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

from misonet_tpu.models.flat_dense import (
    DeconvUpFlat,
    DenseBlockFlat,
    TrunkDownFlat,
    merge_bundles,
    pick_tile_m,
    to_flat_bundle,
)

B, T = 8, 501
TRUNK = [(1, 127, 24, 32), (2, 63, 32, 32), (3, 31, 32, 32), (4, 15, 32, 32)]
DENSE_ENC = [(0, 127, 24), (1, 63, 32), (2, 31, 32), (3, 15, 32), (4, 7, 32)]
DENSE_DEC = [(2, 7, 32, 32), (3, 15, 32, 32), (4, 31, 32, 32),
             (5, 63, 32, 32), (6, 127, 24, 24)]
DECONV = [(2, 7, 64, 32), (3, 15, 64, 32), (4, 31, 64, 32), (5, 63, 64, 24)]


def timed(fn, args, n_small=2, n_large=10):
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


def stage_fwdbwd(name, module, build_bundle, kwargs):
    """Time fwd and fwd+bwd of module.apply over a bundle built from a
    perturbed input (keeps the scan chained)."""
    key = jax.random.key(hash(name) % (2**31))
    k1, kp = jax.random.split(key)
    x0 = jax.random.normal(k1, build_bundle.__wrapped_shape__, jnp.float32)
    params = jax.jit(
        lambda p, x: module.init(p, build_bundle(x), **kwargs)
    )(kp, x0[:1])

    def fwd_only(carry, params, x0):
        y, sc, mn = module.apply(params, build_bundle(x0 + carry), **kwargs)
        return jnp.float32(jnp.sum(mn) * 1e-12)

    def fwd_bwd(carry, params, x0):
        def loss(p):
            y, sc, mn = module.apply(p, build_bundle(x0 + carry), **kwargs)
            t1 = y[0] if isinstance(y, tuple) else y
            return (
                jnp.sum(t1.astype(jnp.float32) ** 2) * 1e-6
                + jnp.sum(sc) * 1e-9
            )

        l, g = jax.value_and_grad(loss)(params)
        import optax

        return jnp.float32(l * 1e-12 + optax.global_norm(g) * 1e-12)

    tf = timed(fwd_only, (params, x0))
    tb = timed(fwd_bwd, (params, x0))
    print(f"{name:<44s} fwd {tf*1e3:7.3f}  fwd+bwd {tb*1e3:7.3f}  "
          f"bwd {1e3*(tb-tf):7.3f} ms", flush=True)


def bundle_builder(shape, two=False, tile=2048):
    if two:
        def build(x):
            half = shape[-1]
            ba = to_flat_bundle(x[..., :half], normalized=True, tile_m=tile,
                                dtype=jnp.bfloat16)
            bb = to_flat_bundle(x[..., half:], normalized=True, tile_m=tile,
                                dtype=jnp.bfloat16)
            return merge_bundles(ba, bb)
        build.__wrapped_shape__ = shape[:-1] + (2 * shape[-1],)
    else:
        def build(x):
            return to_flat_bundle(x, normalized=True, tile_m=tile,
                                  dtype=jnp.bfloat16)
        build.__wrapped_shape__ = shape
    return build


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--group", type=int, default=1)
    args = ap.parse_args()

    if args.group == 1:
        for lvl, f, c in DENSE_ENC:
            tile = pick_tile_m(T, f, c, c, c)
            b = bundle_builder((B, T, f, c), tile=tile)
            stage_fwdbwd(
                f"dense enc{lvl} F={f} C={c} tile={tile}",
                DenseBlockFlat(c, c), b,
                dict(t=T, f=f, tile_m=tile),
            )
    elif args.group == 2:
        for lvl, f, cin, g2extra in DENSE_DEC:
            half = cin
            tile = pick_tile_m(T, f, 2 * half, half, 2 * half)
            b = bundle_builder((B, T, f, half), two=True, tile=tile)
            stage_fwdbwd(
                f"dense dec{lvl} F={f} C={half}+{half} tile={tile}",
                DenseBlockFlat(half, 2 * half), b,
                dict(t=T, f=f, tile_m=tile),
            )


if __name__ == "__main__":
    main()
