"""Real-chip smoke + throughput of the streaming CSS path: per-block
decode -> running SCM -> MVDR on the long-form recording pipeline
(inference/css.py), previously validated only on the CPU mesh."""
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

from misonet_tpu.config import DatasetConfig, ModelConfig, StftConfig
from misonet_tpu.inference.css import StreamingCSS
from misonet_tpu.models import make_miso1


def main():
    cfg = StftConfig()
    ds = DatasetConfig()
    model = make_miso1(ModelConfig(compute_dtype="bfloat16", flat_dense="auto"))
    kr, ki, kp = jax.random.split(jax.random.key(0), 3)
    chunk = ds.chunk_samples
    probe = jax.lax.complex(
        jax.random.normal(kr, (1, ds.num_ch, cfg.num_frames(chunk), cfg.num_bins)),
        jax.random.normal(ki, (1, ds.num_ch, cfg.num_frames(chunk), cfg.num_bins)),
    )
    params = jax.jit(model.init)(kp, probe)

    css = StreamingCSS(model, params, cfg, ds, forget=0.98)
    state = css.init_state()
    rng = np.random.default_rng(0)
    n_blocks = 8
    t0 = time.perf_counter()
    for i in range(n_blocks):
        block = rng.standard_normal((chunk, ds.num_ch)).astype(np.float32) * 0.1
        state, bf_wave, m1_wave = css.process_block(state, block)
    assert np.isfinite(bf_wave).all() and np.isfinite(m1_wave).all()
    dt = time.perf_counter() - t0
    # per-block latency incl. compile on the first block; steady-state is
    # dominated by the decode forward (see bench_decode.py)
    print(
        f"StreamingCSS {n_blocks} x 4 s blocks OK on "
        f"{jax.devices()[0].platform}; bf wave {bf_wave.shape}, "
        f"{dt:.1f}s total incl. compile"
    )

    # cross-fade overlap mode on a long-form recording (css.process
    # overlap>0: blocks advance by chunk-overlap, triangular seam blend)
    total = int(3.5 * chunk)
    wave = rng.standard_normal((total, ds.num_ch)).astype(np.float32) * 0.1
    t0 = time.perf_counter()
    out = css.process(wave, overlap=chunk // 4)
    assert out["beamformed"].shape == (2, total)
    assert np.isfinite(out["beamformed"]).all()
    print(
        f"CSS overlap mode OK {out['beamformed'].shape} "
        f"({time.perf_counter() - t0:.1f}s)"
    )


if __name__ == "__main__":
    main()
