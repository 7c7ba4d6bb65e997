"""Observability tests: MetricWriter logging set (reference utils/writer.py
MyWriter — scalars, spectrograms, audio, MFCC) and the NumPy MFCC features."""

import numpy as np
import pytest

from misonet_tpu.config import StftConfig
from misonet_tpu.utils.writer import MetricWriter, mfcc_features


def test_mfcc_features_shape_and_tone():
    cfg = StftConfig()
    t = np.arange(cfg.fs, dtype=np.float32) / cfg.fs
    wav = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    m = mfcc_features(wav, cfg, n_mfcc=40)
    assert m.shape[0] == 40
    assert m.shape[1] >= cfg.fs // cfg.hop
    assert np.isfinite(m).all()
    # a pure tone has most energy in the low-order cepstral coefficients
    assert np.abs(m[:5]).mean() > np.abs(m[20:]).mean()


def test_mfcc_silence_is_finite():
    cfg = StftConfig()
    m = mfcc_features(np.zeros(cfg.fs, np.float32), cfg)
    assert np.isfinite(m).all()


def test_writer_logs_full_set(tmp_path):
    pytest.importorskip("tensorboardX")
    cfg = StftConfig()
    w = MetricWriter(tmp_path / "tb", cfg)
    rng = np.random.default_rng(0)
    spec = rng.normal(size=(64, cfg.num_bins)) + 1j * rng.normal(
        size=(64, cfg.num_bins)
    )
    wav = rng.normal(size=cfg.fs).astype(np.float32)

    w.scalar("loss", 1.0, step=0)
    w.scalars({"a": 1.0, "b": 2.0}, step=0, prefix="val/")
    w.spectrogram("spec", spec, step=0)
    w.audio("audio", spec, step=0, num_samples=4000)
    w.mfcc("mfcc", wav, step=0)
    w.step_start()
    w.step_end(step=0, audio_seconds=4.0)
    w.close()
    assert any((tmp_path / "tb").iterdir())


def test_profiling_utilities():
    """StepTimer rolling throughput (now backing MetricWriter.step_end)
    and device_memory_stats return sane values."""
    import time as _time

    from misonet_tpu.utils.profiling import StepTimer, device_memory_stats

    t = StepTimer(window=3)
    for _ in range(5):
        t.start()
        _time.sleep(0.002)
        dt = t.stop(audio_seconds=1.0)
        assert dt > 0
    assert len(t.samples) == 3             # rolling window
    assert t.audio_seconds_per_second > 0

    stats = device_memory_stats()
    assert isinstance(stats, dict) and len(stats) >= 1
