"""Real-chip smoke of the REVERB 2MIX geometry (configs/reverb_2mix.yml:
16 kHz, F=257, 8-level U-Net, 384-channel bottleneck, 8 mics — the
reference's commented 8-block plan, NN_BSS.yml:115-117): full MISO1
forward on the fused flat pipeline AND one fused wave train step.
Catches TPU-only lowering issues at the 257-bin ladder that the CPU
interpret parity test (tests/test_flat_resolution.py) cannot.

Run:  python scripts/smoke_tpu_reverb.py [--t 256]
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/misonet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from misonet_tpu.config import OptimizerConfig, load_yaml
from misonet_tpu.models import make_miso1
from misonet_tpu.models.flat_dense import resolve_flat
from misonet_tpu.ops.complex_utils import to_host
from misonet_tpu.train import (
    create_train_state,
    make_optimizer,
    make_separate_wave_train_step,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=256, help="frames")
    ap.add_argument("--batch", type=int, default=2)
    args = ap.parse_args()

    cfg = load_yaml(
        Path(__file__).resolve().parents[1] / "configs" / "reverb_2mix.yml"
    )
    mcfg = dataclasses.replace(cfg.miso1, compute_dtype="bfloat16")
    f = cfg.stft.num_bins
    assert f == 257, f
    de_full = list(mcfg.de_channels) + [4]
    print(
        "flat plan @257:",
        resolve_flat("auto", num_bins=f, nb=mcfg.num_bottleneck,
                     en=mcfg.en_channels, de_full=de_full),
        flush=True,
    )

    model = make_miso1(mcfg)
    b, c, t = args.batch, cfg.dataset.num_ch_utilize, args.t
    kr, ki, kp = jax.random.split(jax.random.key(0), 3)
    mix = jax.lax.complex(
        jax.random.normal(kr, (b, c, t, f)), jax.random.normal(ki, (b, c, t, f))
    )
    t0 = time.perf_counter()
    params = jax.jit(model.init)(kp, mix)
    out = jax.jit(model.apply)(params, mix)
    host = to_host(out)
    assert host.shape == (b, 2, t, f), host.shape
    assert np.isfinite(host).all()
    print(
        f"MISO1 forward @ REVERB geometry OK {host.shape} "
        f"({time.perf_counter() - t0:.1f}s incl. compile)",
        flush=True,
    )

    # fused wave train step at the 16 kHz STFT (512/128 hop)
    samples = (t - 1) * cfg.stft.hop
    rng = np.random.default_rng(0)
    mix_w = jnp.asarray(rng.standard_normal((b, samples, c)).astype(np.float32))
    ref_w = jnp.asarray(
        rng.standard_normal((b, 2, samples)).astype(np.float32)
    )
    opt = make_optimizer(OptimizerConfig(lr=1e-3))
    state = create_train_state(params, opt)
    step = make_separate_wave_train_step(model, opt, cfg.stft)
    t0 = time.perf_counter()
    state, metrics = step(state, mix_w, ref_w)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    print(
        f"fused wave train step OK loss={loss:.1f} "
        f"({time.perf_counter() - t0:.1f}s incl. compile)",
        flush=True,
    )


if __name__ == "__main__":
    main()
