"""Real-chip smoke of the full utterance evaluator: split -> batched
decode -> alignment -> stitch -> utterance-mode re-STFT -> full SCM ->
MVDR -> iSTFT, with reference signals and SI-SDR scoring."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/misonet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from misonet_tpu.config import DatasetConfig, ModelConfig, StftConfig
from misonet_tpu.inference.evaluate import CascadeEvaluator
from misonet_tpu.models import make_miso1


def main():
    cfg = StftConfig()
    ds = DatasetConfig()
    model = make_miso1(ModelConfig(compute_dtype="bfloat16", flat_dense="auto"))
    kr, ki, kp = jax.random.split(jax.random.key(0), 3)
    t = cfg.num_frames(ds.chunk_samples)
    probe = jax.lax.complex(
        jax.random.normal(kr, (1, ds.num_ch, t, cfg.num_bins)),
        jax.random.normal(ki, (1, ds.num_ch, t, cfg.num_bins)),
    )
    params = jax.jit(model.init)(kp, probe)

    ev = CascadeEvaluator(model, params, cfg, ds, beamform_utterance=True)
    rng = np.random.default_rng(0)
    # 2.4-chunk utterance with a NON-hop-multiple length (the frame-count
    # regime fixed this round) and clean refs for alignment + SI-SDR
    out_len = int(2.4 * ds.chunk_samples) - 63
    mix = rng.standard_normal((out_len, ds.num_ch)).astype(np.float32) * 0.1
    refs = rng.standard_normal((2, out_len)).astype(np.float32) * 0.1
    t0 = time.perf_counter()
    res = ev.process(mix, refs)
    dt = time.perf_counter() - t0
    assert res.separated.shape == (2, out_len)
    assert res.beamformed.shape == (2, out_len)
    assert np.isfinite(res.separated).all() and np.isfinite(res.beamformed).all()
    print(
        f"CascadeEvaluator utterance mode OK on {jax.devices()[0].platform}: "
        f"separated {res.separated.shape}, beamformed {res.beamformed.shape}, "
        f"SI-SDR {res.si_sdr}, {dt:.1f}s incl. compile"
    )


if __name__ == "__main__":
    main()
