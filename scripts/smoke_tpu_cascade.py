"""Real-chip smoke of every model family + inference path on the fused
flat pipeline: MISO1 full-array decode, MVDR, MISO3 and MISO2 enhance
forwards, and one fused MISO3 train step.  Catches TPU-only lowering
issues (Mosaic restrictions, complex-transfer limits) the CPU interpret
tests cannot."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/misonet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import optax

from misonet_tpu.beamforming.mvdr import mvdr_beamform
from misonet_tpu.config import ModelConfig
from misonet_tpu.inference.separate import make_full_array_decode
from misonet_tpu.losses import loss_enhance
from misonet_tpu.models import enhance_input, make_miso1, make_miso3
from misonet_tpu.ops.complex_utils import to_host
from misonet_tpu.train.state import create_train_state

B, C, T, F = 2, 6, 501, 129


def check(name, fn):
    t0 = time.perf_counter()
    out = fn()
    host = to_host(out) if jnp.iscomplexobj(out) else np.asarray(out)
    assert np.isfinite(host).all(), f"{name}: non-finite output"
    print(f"{name:<40s} OK  {host.shape}  ({time.perf_counter()-t0:.1f}s incl. compile)",
          flush=True)
    return out


def main():
    cfg = ModelConfig(compute_dtype="bfloat16", flat_dense="auto")
    kr, ki, kp = jax.random.split(jax.random.key(0), 3)
    mix = jax.lax.complex(
        jax.random.normal(kr, (B, C, T, F)), jax.random.normal(ki, (B, C, T, F))
    )

    miso1 = make_miso1(cfg)
    p1 = jax.jit(miso1.init)(kp, mix[:1])
    decode = make_full_array_decode(miso1, C, ref_ch=0)
    full = check("MISO1 full-array decode [B,S,C,T,F]",
                 lambda: decode(p1, mix))

    bf = check("MVDR on decode output [B,T,F]",
               lambda: jax.jit(mvdr_beamform)(full[:, 0], mix))

    miso3 = make_miso3(cfg)
    x3 = enhance_input(mix, full[:, 0, 0:1] * 0 + full[:, 0, 0][:, None],
                       bf[:, None])
    p3 = jax.jit(miso3.init)(kp, x3[:1])
    check("MISO3 enhance forward (fused path)",
          lambda: jax.jit(miso3.apply)(p3, x3))

    ref = full[:, 0, 0][:, None]
    opt = optax.adam(1e-3)
    state = jax.jit(lambda p: create_train_state(p, opt))(p3)

    @jax.jit
    def train_step(state, x, ref):
        def loss_fn(p):
            return loss_enhance(miso3.apply(p, x), ref)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        return loss, optax.global_norm(grads)

    out = check("MISO3 fused train step (loss, grad_norm)",
                lambda: jnp.stack([*train_step(state, x3, ref)]))
    host = np.asarray(out)
    print(f"loss={host[0]:.4f} grad_norm={host[1]:.4f}")


if __name__ == "__main__":
    main()
