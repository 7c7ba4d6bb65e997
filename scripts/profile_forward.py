"""Per-stage timing of the MISO1 forward on TPU.

Times each architectural stage standalone with the scan-differencing
protocol from bench.py (the axon relay is async + dedupes, so each
measurement is one jitted scan of N chained iterations, two trip counts
differenced).  Stages:

  * trunk convs (PaddedConv / nn.Conv) per encoder level
  * fused flat DenseBlocks per level (enc + dec geometries)
  * flat layout conversions (to/from bundle)
  * deconvs per decoder level
  * TCN
  * full forward (reference point)

Usage: python scripts/profile_forward.py [--full-only]
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

from misonet_tpu.config import ModelConfig
from misonet_tpu.models import make_miso1
from misonet_tpu.models.blocks import ConvBlock, DeconvBlock, TemporalConvNet
from misonet_tpu.models.flat_dense import (
    DenseBlockFlat,
    from_flat_bundle,
    pick_tile_m,
    to_flat_bundle,
)

B, T = 8, 501


def timeit(name, fn, params, x, n_small=2, n_large=10):
    """Median per-iteration seconds of a chained scan of fn."""

    @partial(jax.jit, static_argnums=2)
    def loop(params, x, n):
        def body(carry, _):
            out = fn(params, x + carry.astype(x.dtype))
            return jnp.abs(out.astype(jnp.float32)).mean() * 1e-12, ()

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return carry

    float(loop(params, x, n_small))
    float(loop(params, x, n_large))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(params, x, n_small))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop(params, x, n_large))
        t_l = time.perf_counter() - t0
        dts.append((t_l - t_s) / (n_large - n_small))
    dt = min(dts)
    print(f"{name:<42s} {dt * 1e3:8.3f} ms")
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full-only", action="store_true")
    args = ap.parse_args()

    key = jax.random.key(0)
    dtype = jnp.bfloat16
    total = 0.0

    cfg = ModelConfig(compute_dtype="bfloat16", flat_dense=True)
    model = make_miso1(cfg)
    kr, ki, kp = jax.random.split(key, 3)
    mix = jax.lax.complex(
        jax.random.normal(kr, (B, 6, T, 129)), jax.random.normal(ki, (B, 6, T, 129))
    )
    params = jax.jit(model.init)(kp, mix[:1])
    t_full = timeit("FULL forward (flat_dense)", model.apply, params, mix)
    if args.full_only:
        return

    # encoder geometries: (F_in, C_in, C_out, stride)
    enc = [
        (129, 12, 24, 1),
        (127, 24, 32, 2),
        (63, 32, 32, 2),
        (31, 32, 32, 2),
        (15, 32, 32, 2),
        (7, 32, 64, 2),
        (3, 64, 128, 1),
    ]
    for i, (f_in, c_in, c_out, s) in enumerate(enc):
        m = ConvBlock(c_out, strides=(1, s), act_norm=(i != 0), norm=False,
                      dtype=dtype)
        x = jax.random.normal(key, (B, T, f_in, c_in), dtype)
        p = jax.jit(m.init)(kp, x)
        total += timeit(f"enc{i} trunk conv F={f_in} {c_in}->{c_out}/{s}",
                        m.apply, p, x)

    # dense block geometries (enc levels 0-4 and dec levels 2-6)
    dense = [
        ("enc0", 127, 24, 24, 24),
        ("enc1", 63, 32, 32, 32),
        ("enc2", 31, 32, 32, 32),
        ("enc3", 15, 32, 32, 32),
        ("enc4", 7, 32, 32, 32),
        ("dec2", 7, 64, 32, 64),
        ("dec3", 15, 64, 32, 64),
        ("dec4", 31, 64, 32, 64),
        ("dec5", 63, 64, 32, 64),
        ("dec6", 127, 48, 24, 48),
    ]
    for name, f, c_in, g1, g2 in dense:
        tile = pick_tile_m(T, f, c_in, g1, g2)
        m = DenseBlockFlat(g1, g2)
        x = jax.random.normal(key, (B, T, f, c_in), dtype)

        def fwd(p, x, m=m, f=f, tile=tile):
            bundle = to_flat_bundle(x, normalized=True, tile_m=tile)
            yb = m.apply(p, bundle, t=T, f=f, tile_m=tile)
            return from_flat_bundle(yb, T, f, dtype, tile_m=tile)

        bundle0 = to_flat_bundle(x, normalized=True, tile_m=tile)
        p = jax.jit(partial(m.init, t=T, f=f, tile_m=tile))(kp, bundle0)
        total += timeit(f"dense {name} F={f} C={c_in} g1={g1} g2={g2}",
                        fwd, p, x)

    # deconvs: (F_in, C_in, C_out, stride, last)
    dec = [
        (1, 256, 64, 1, False),
        (3, 128, 32, 2, False),
        (7, 64, 32, 2, False),
        (15, 64, 32, 2, False),
        (31, 64, 32, 2, False),
        (63, 64, 24, 2, False),
        (127, 48, 4, 1, True),
    ]
    from misonet_tpu.models.blocks import ConvTranspose2dTorch

    for i, (f_in, c_in, c_out, s, last) in enumerate(dec):
        m = (
            ConvTranspose2dTorch(c_out, strides=(1, s), dtype=dtype)
            if last
            else DeconvBlock(c_out, strides=(1, s), dtype=dtype)
        )
        x = jax.random.normal(key, (B, T, f_in, c_in), dtype)
        p = jax.jit(m.init)(kp, x)
        total += timeit(f"dec{i} deconv F={f_in} {c_in}->{c_out}/{s}",
                        m.apply, p, x)

    # TCN
    m = TemporalConvNet(dtype=dtype)
    x = jax.random.normal(key, (B, T, 128), dtype)
    p = jax.jit(m.init)(kp, x)
    total += timeit("TCN (2x7 blocks, 128ch)", m.apply, p, x)

    print(f"{'SUM of stages':<42s} {total * 1e3:8.3f} ms")
    print(f"{'FULL forward':<42s} {t_full * 1e3:8.3f} ms")


if __name__ == "__main__":
    main()
