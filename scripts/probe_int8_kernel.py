"""Mosaic feasibility probe for the in-kernel int8 quantization path:
f32 -> int8 round/clip/convert + VMEM int8 stores at 32-row offsets +
int8 x int8 -> int32 dot + f32 dequant epilogue, all in ONE kernel —
exactly the ops the quantized dense_stack variant needs.  Run on chip."""
from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/misonet_jax_cache")

QS = 16.0
N, K, M = 64, 128, 512


def kernel(x_ref, w_ref, rs_ref, o_ref, p_ref):
    # quantize-store the two 32-row halves at 32-aligned offsets, plus a
    # synthetic indicator block, like the real kernel's group stores
    x = x_ref[:, :].astype(jnp.float32)
    q0 = jnp.clip(jnp.round(x[:32] * QS), -127.0, 127.0).astype(jnp.int8)
    q1 = jnp.clip(jnp.round(x[32:64] * QS), -127.0, 127.0).astype(jnp.int8)
    p_ref[0:32, :] = q0
    p_ref[32:64, :] = q1
    rows = jax.lax.broadcasted_iota(jnp.int32, (32, M), 0)
    field = rows == 0
    p_ref[64:96, :] = (field.astype(jnp.int32) * 16).astype(jnp.int8)
    z = jax.lax.dot_general(
        w_ref[:, :], p_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[:, :] = z.astype(jnp.float32) * rs_ref[:, :]


def main():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(96, M)).astype(np.float32)
    x[64:] = 0.0
    wf = rng.normal(size=(N, 96)).astype(np.float32)
    rs = (np.abs(wf).max(axis=1, keepdims=True) / 127.0).astype(np.float32)
    w8 = np.clip(np.round(wf / rs), -127, 127).astype(np.int8)

    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, M), jnp.float32),
        scratch_shapes=[pltpu.VMEM((96, M), jnp.int8)],
    )(jnp.asarray(x), jnp.asarray(w8), jnp.asarray(rs / QS))
    out = np.asarray(jax.device_get(out))

    # reference: dequantized math in f64
    xq = np.clip(np.round(x[:64] * QS), -127, 127)
    p = np.concatenate([xq, np.zeros((32, M))], 0)
    p[64] = 16.0
    ref = (w8.astype(np.float64) @ p) * (rs / QS)
    err = np.abs(out - ref).max()
    print(f"platform={jax.devices()[0].platform} max|err|={err:.3e} "
          f"ref_scale={np.abs(ref).max():.3f}", flush=True)
    assert err < 1e-3 * np.abs(ref).max(), "int8 kernel path mismatch"
    print("OK: in-kernel f32->int8 quantize/store/dot/dequant all lower",
          flush=True)


if __name__ == "__main__":
    main()
