"""Accurate per-stage attribution of the flat-path MISO1 forward on TPU.

Differences from profile_forward.py: reproduces the production wiring
exactly (TrunkDownFlat with s2d glue, DeconvUpFlat with interleave,
bundle conversions, the XLA stages enc5/enc6/dec0/dec1 and the final
transpose conv, complex input packing), and uses large trip counts so the
relay noise (~±1 ms at n=10) averages out.

Usage: python scripts/profile_forward2.py [--group N]
  group 0: full + input/output glue + XLA stages + TCN
  group 1: flat trunk convs + dense enc levels
  group 2: flat deconvs + dense dec levels
(split into groups so a single run stays under the 10 min relay window)
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
from misonet_tpu.models.blocks import (
    ConvBlock,
    ConvTranspose2dTorch,
    DeconvBlock,
    TemporalConvNet,
)
from misonet_tpu.models.flat_dense import (
    DenseBlockFlat,
    DeconvUpFlat,
    TrunkDownFlat,
    from_flat_bundle,
    merge_bundles,
    pick_tile_m,
    to_flat_bundle,
)

B, T = 8, 501
DT = jnp.bfloat16
# encoder flat ladder: (name, f_in, c_in, c_out) for trunk levels 1-4
TRUNK = [(1, 127, 24, 32), (2, 63, 32, 32), (3, 31, 32, 32), (4, 15, 32, 32)]
DENSE_ENC = [(0, 127, 24), (1, 63, 32), (2, 31, 32), (3, 15, 32), (4, 7, 32)]
# decoder: (i, f_in level, bundle channels, skip channels, out channels)
DECONV = [(2, 7, 64, 32), (3, 15, 64, 32), (4, 31, 64, 32), (5, 63, 64, 24)]
DENSE_DEC = [(2, 7, 32, 32), (3, 15, 32, 32), (4, 31, 32, 32),
             (5, 63, 32, 32), (6, 127, 24, 24)]


def timeit(name, fn, params, x, n_small=4, n_large=40):
    @partial(jax.jit, static_argnums=2)
    def loop(params, x, n):
        def body(carry, _):
            out = fn(params, jax.tree.map(
                lambda a: a + carry.astype(a.dtype), x))
            return jnp.abs(out.astype(jnp.float32)).mean() * 1e-12, ()

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return carry

    float(loop(params, x, n_small))
    float(loop(params, x, n_large))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(params, x, n_small))
        a = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(loop(params, x, n_large))
        b = time.perf_counter() - t0
        dts.append((b - a) / (n_large - n_small))
    dt = min(dts)
    print(f"{name:<46s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def bundle_input(key, f, c, tile):
    x = jax.random.normal(key, (B, T, f, c), DT)
    return to_flat_bundle(x, normalized=False, tile_m=tile)


def group0(key, kp):
    model = make_miso1(ModelConfig(compute_dtype="bfloat16", flat_dense=True))
    kr, ki = jax.random.split(key)
    mix = jax.lax.complex(
        jax.random.normal(kr, (B, 6, T, 129)),
        jax.random.normal(ki, (B, 6, T, 129)),
    )
    params = jax.jit(model.init)(kp, mix[:1])
    timeit("FULL forward (flat)", model.apply, params, mix, 2, 14)

    xla = make_miso1(ModelConfig(compute_dtype="bfloat16", flat_dense=False))
    timeit("FULL forward (plain XLA)", xla.apply, params, mix, 2, 14)

    # input packing: complex -> stacked real NHWC
    def pack(_, mix):
        x = jnp.concatenate([mix.real, mix.imag], axis=1)
        return x.transpose(0, 2, 3, 1).astype(DT)

    timeit("input complex->NHWC pack", pack, None, mix)

    # enc0 trunk conv (XLA, stride 1, 12->24, no act)
    m = ConvBlock(24, strides=(1, 1), act_norm=False, dtype=DT)
    x = jax.random.normal(key, (B, T, 129, 12), DT)
    p = jax.jit(m.init)(kp, x)
    timeit("enc0 trunk conv (XLA) F=129 12->24", m.apply, p, x)

    # to_flat_bundle of enc0 output + back (the conversion pair)
    tile = pick_tile_m(T, 127, 24, 24, 24)
    x0 = jax.random.normal(key, (B, T, 127, 24), DT)
    timeit("to_flat_bundle F=127 C=24",
           lambda _, a: to_flat_bundle(a, normalized=True, tile_m=tile)[0][0],
           None, x0)

    # XLA tail stages
    for name, f_in, c_in, c_out, s, mod in [
        ("enc5 conv F=7 32->64/2", 7, 32, 64, 2, "conv"),
        ("enc6 conv F=3 64->128/1", 3, 64, 128, 1, "conv"),
        ("dec0 deconv F=1 256->128/1", 1, 256, 128, 1, "dec"),
        ("dec1 deconv F=3 256->64/2", 3, 256, 64, 2, "dec"),
        ("dec6 final convT F=127 48->4/1", 127, 48, 4, 1, "last"),
    ]:
        if mod == "conv":
            m = ConvBlock(c_out, strides=(1, s), dtype=DT)
        elif mod == "dec":
            m = DeconvBlock(c_out, strides=(1, s), dtype=DT)
        else:
            m = ConvTranspose2dTorch(c_out, strides=(1, s), dtype=DT)
        x = jax.random.normal(key, (B, T, f_in, c_in), DT)
        p = jax.jit(m.init)(kp, x)
        timeit(name, m.apply, p, x)

    m = TemporalConvNet(dtype=DT)
    x = jax.random.normal(key, (B, T, 128), DT)
    p = jax.jit(m.init)(kp, x)
    timeit("TCN (2x7, 128ch)", m.apply, p, x)


def group1(key, kp):
    for lvl, f_in, c_in, c_out in TRUNK:
        f_out = (f_in - 3) // 2 + 1
        tile_in = pick_tile_m(T, f_in, c_in, c_in, c_in)
        tile_out = pick_tile_m(T, f_out, c_out, c_out, c_out)
        m = TrunkDownFlat(c_out)
        bundle = bundle_input(key, f_in, c_in, tile_in)

        def fwd(p, b, m=m, f_in=f_in, tile_in=tile_in, tile_out=tile_out):
            return m.apply(p, b, t=T, f_in=f_in, tile_in=tile_in,
                           tile_out=tile_out)[0][0]

        p = jax.jit(partial(m.init, t=T, f_in=f_in, tile_in=tile_in,
                            tile_out=tile_out))(kp, bundle)
        timeit(f"trunk flat enc{lvl} F={f_in}->{f_out} {c_in}->{c_out}",
               fwd, p, bundle)

    for lvl, f, c in DENSE_ENC:
        tile = pick_tile_m(T, f, c, c, c)
        m = DenseBlockFlat(c, c)
        bundle = bundle_input(key, f, c, tile)

        def fwd(p, b, m=m, f=f, tile=tile):
            return m.apply(p, b, t=T, f=f, tile_m=tile)[0]

        p = jax.jit(partial(m.init, t=T, f=f, tile_m=tile))(kp, bundle)
        timeit(f"dense flat enc{lvl} F={f} C={c}", fwd, p, bundle)


def group2(key, kp):
    k1, k2 = jax.random.split(key)
    for lvl, f, cb, cs in DENSE_DEC:
        tile = pick_tile_m(T, f, cb + cs, (cb + cs) // 2, cb + cs)
        m = DenseBlockFlat((cb + cs) // 2, cb + cs)
        b1 = bundle_input(k1, f, cb, tile)
        b2 = bundle_input(k2, f, cs, tile)
        merged = merge_bundles(b1, b2)

        def fwd(p, mg, m=m, f=f, tile=tile):
            return m.apply(p, mg, t=T, f=f, tile_m=tile)[0]

        p = jax.jit(partial(m.init, t=T, f=f, tile_m=tile))(kp, merged)
        timeit(f"dense flat dec{lvl} F={f} C={cb}+{cs}", fwd, p, merged)

    for lvl, f_in, c_in, c_out in DECONV:
        f_out = 2 * f_in + 1
        tile_in = pick_tile_m(T, f_in, c_in, c_in, c_in)
        tile_out = pick_tile_m(T, f_out, c_out, c_out, c_out)
        m = DeconvUpFlat(c_out)
        bundle = bundle_input(key, f_in, c_in, tile_in)

        def fwd(p, b, m=m, f_in=f_in, tile_in=tile_in, tile_out=tile_out):
            return m.apply(p, b, t=T, f_in=f_in, tile_in=tile_in,
                           tile_out=tile_out)[0][0]

        p = jax.jit(partial(m.init, t=T, f_in=f_in, tile_in=tile_in,
                            tile_out=tile_out))(kp, bundle)
        timeit(f"deconv flat dec{lvl} F={f_in}->{f_out} {c_in}->{c_out}",
               fwd, p, bundle)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--group", type=int, default=0)
    args = ap.parse_args()
    key = jax.random.key(0)
    kp = jax.random.key(1)
    [group0, group1, group2][args.group](key, kp)


if __name__ == "__main__":
    main()
