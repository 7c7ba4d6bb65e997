"""WAV I/O on the host.

The reference reads with librosa and writes with soundfile
(dataloader/data.py:613, tester.py:181); neither is installed in this image,
so everything routes through scipy.io.wavfile with the same numeric
conventions: float arrays in [-1, 1], int16 quantization via MaxINT16
scaling on write (tester.py:156-157)."""

from __future__ import annotations

from pathlib import Path

import numpy as np
import scipy.io.wavfile as wf

MAX_INT16 = np.iinfo(np.int16).max


def read_wav(path: str | Path) -> tuple[np.ndarray, int]:
    """Read a wav file -> (float32 [S] or [S, C] in [-1, 1], sample rate)."""
    sr, data = wf.read(str(path))
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    return data, sr


def write_wav(path: str | Path, data: np.ndarray, sample_rate: int) -> None:
    """Write float [-1,1] (or already-int16) audio as int16 PCM, matching the
    reference's MaxINT16 quantization (tester.py:156-157)."""
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    if data.dtype != np.int16:
        data = np.clip(data, -1.0, 1.0)
        data = (data * MAX_INT16).astype(np.int16)
    wf.write(str(path), sample_rate, data)
