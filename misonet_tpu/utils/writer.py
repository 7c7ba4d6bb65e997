"""Observability: TensorBoard-compatible scalar / spectrogram / audio
logging.

Equivalent of the reference's MyWriter (utils/writer.py:15-135 — which ships
with unresolved merge-conflict markers, SURVEY.md §1) rebuilt cleanly on
tensorboardX: the same logging set — loss scalars, log-power spectrogram
images (jet colormap, clim [-140, -50] dB, utils/plotting.py:24-39), and
iSTFT'd audio (writer.py:32-68) — plus step timing for throughput tracking.
Degrades to a no-op if tensorboardX is unavailable.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from misonet_tpu.config import StftConfig
from misonet_tpu.ops.stft import istft_scaled


class MetricWriter:
    def __init__(self, logdir: str | Path, stft_cfg: StftConfig | None = None):
        self.stft_cfg = stft_cfg or StftConfig()
        try:
            from tensorboardX import SummaryWriter

            Path(logdir).mkdir(parents=True, exist_ok=True)
            self._tb = SummaryWriter(str(logdir))
        except Exception:
            self._tb = None
        from misonet_tpu.utils.profiling import StepTimer

        self._timer = StepTimer()
        self._step_running = False

    # -- scalars ----------------------------------------------------------
    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._tb:
            self._tb.add_scalar(tag, float(value), step)

    def scalars(self, values: dict[str, float], step: int, prefix: str = "") -> None:
        for k, v in values.items():
            self.scalar(f"{prefix}{k}", v, step)

    # -- spectrograms ------------------------------------------------------
    def spectrogram(self, tag: str, spec: np.ndarray, step: int) -> None:
        """Log-power spectrogram image of complex [T, F] (plotting.py:24-39:
        20*log10|S|, clim [-140, -50])."""
        if not self._tb:
            return
        mag = np.abs(np.asarray(spec)).T  # [F, T], freq on y
        db = 20.0 * np.log10(np.maximum(mag, 1e-10))
        lo, hi = -140.0, -50.0
        img = np.clip((db - lo) / (hi - lo), 0.0, 1.0)[::-1]  # low freq bottom
        self._tb.add_image(tag, _jet(img), step, dataformats="HWC")

    # -- audio -------------------------------------------------------------
    def audio(self, tag: str, spec: np.ndarray, step: int, num_samples: int) -> None:
        """iSTFT a complex [T, F] spectrogram and log as audio
        (writer.py:32-68 equivalent)."""
        if not self._tb:
            return
        wav = np.asarray(istft_scaled(np.asarray(spec), self.stft_cfg, num_samples))
        peak = np.abs(wav).max() or 1.0
        try:
            self._tb.add_audio(
                tag, (wav / peak)[None, :], step, sample_rate=self.stft_cfg.fs
            )
        except ModuleNotFoundError:
            # tensorboardX audio encoding needs soundfile, which this image
            # lacks; skip audio logging rather than fail the epoch.
            pass

    # -- MFCC (writer.py:72-101 / plotting.py:12-22 equivalent) -----------
    def mfcc(self, tag: str, wav: np.ndarray, step: int, n_mfcc: int = 40) -> None:
        """MFCC image of a waveform (the reference computes these with
        librosa and plots them; dead code upstream — log_MFCC is never
        called — but part of the observability surface)."""
        if not self._tb:
            return
        coeffs = mfcc_features(
            np.asarray(wav, np.float32), self.stft_cfg, n_mfcc=n_mfcc
        )  # [n_mfcc, frames]
        lo, hi = coeffs.min(), coeffs.max()
        img = (coeffs - lo) / (hi - lo + 1e-10)
        self._tb.add_image(tag, _jet(img[::-1]), step, dataformats="HWC")

    # -- timing (trainer.py:216-221 equivalent) ---------------------------
    def step_start(self) -> None:
        self._timer.start()
        self._step_running = True

    def step_end(self, step: int, audio_seconds: float | None = None) -> None:
        if not self._step_running:
            return
        if audio_seconds:
            dt = self._timer.stop(audio_seconds)
        else:
            # time the step but keep the rolling throughput window clean —
            # a (dt, 0.0) sample would deflate perf/audio_s_per_s
            dt = self._timer.discard()
        self.scalar("perf/step_ms", dt * 1e3, step)
        if audio_seconds:
            # rolling-window throughput (utils/profiling.StepTimer): the
            # north-star audio-s/s metric smoothed over recent steps
            self.scalar(
                "perf/audio_s_per_s", self._timer.audio_seconds_per_second,
                step,
            )
        self._step_running = False

    def close(self) -> None:
        if self._tb:
            self._tb.close()


def mfcc_features(
    wav: np.ndarray, stft_cfg: StftConfig, n_mfcc: int = 40, n_mels: int = 64
) -> np.ndarray:
    """MFCCs from a waveform, NumPy-only (the reference delegates to
    librosa.feature.mfcc, writer.py:80): power spectrogram -> mel filterbank
    (HTK-style) -> log -> orthonormal DCT-II, keeping ``n_mfcc`` coefficients.
    Returns [n_mfcc, frames]."""
    n, hop = stft_cfg.length, stft_cfg.hop
    pad = np.pad(wav, (n // 2, n // 2))
    frames = 1 + (len(pad) - n) // hop
    idx = np.arange(n)[None, :] + hop * np.arange(frames)[:, None]
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)  # periodic hann
    spec = np.abs(np.fft.rfft(pad[idx] * win, axis=1)) ** 2  # [frames, F]

    # mel filterbank
    fs = stft_cfg.fs
    mel = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)
    imel = lambda m: 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    pts = imel(np.linspace(mel(0.0), mel(fs / 2), n_mels + 2))
    bins = np.fft.rfftfreq(n, 1.0 / fs)
    lo, ce, hi = pts[:-2, None], pts[1:-1, None], pts[2:, None]
    fb = np.maximum(
        0.0,
        np.minimum((bins - lo) / (ce - lo + 1e-10), (hi - bins) / (hi - ce + 1e-10)),
    )  # [n_mels, F]
    logmel = np.log(spec @ fb.T + 1e-10)  # [frames, n_mels]

    # orthonormal DCT-II over the mel axis
    k = np.arange(n_mfcc)[:, None]
    m = np.arange(n_mels)[None, :]
    dct = np.cos(np.pi * k * (2 * m + 1) / (2 * n_mels)) * np.sqrt(2.0 / n_mels)
    dct[0] /= np.sqrt(2.0)
    return dct @ logmel.T  # [n_mfcc, frames]


def _jet(x: np.ndarray) -> np.ndarray:
    """Minimal jet colormap [H, W] in [0,1] -> [H, W, 3] uint8 (the
    reference uses matplotlib's jet, plotting.py:31)."""
    r = np.clip(1.5 - np.abs(4 * x - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * x - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * x - 1), 0, 1)
    return (np.stack([r, g, b], axis=-1) * 255).astype(np.uint8)
