"""Golden-fixture test over the reference's published stage outputs.

/root/reference/sample/ holds the reference pipeline's outputs for one
real test_eval92 utterance (3_441c040w_445c040o) at every cascade stage —
Clean (6-ch images), MISO1, Beamforming, MISO3 (README.md:38-68).  These
are the only trained-model artifacts in the reference repo, so they pin
down our *evaluation* stack end-to-end on real data: wav decode
(data/wavio.py), the SI-SDR metric layer (metrics.py), and the PIT
speaker alignment — the published separations must score as clearly
separated (positive SI-SDR against the clean reference-mic images) with
a consistent permutation across stages."""

from pathlib import Path

import numpy as np
import pytest

from misonet_tpu.data.wavio import read_wav
from misonet_tpu.metrics import numpy_si_sdr

SAMPLE = Path("/root/reference/sample")
UTT = "3_441c040w_445c040o"

pytestmark = pytest.mark.skipif(
    not SAMPLE.exists(), reason="reference sample fixtures unavailable"
)


def _load(stage: str) -> list[np.ndarray]:
    out = []
    for spk in (0, 1):
        w, fs = read_wav(SAMPLE / stage / f"{UTT}_{spk}.wav")
        assert fs == 8000
        out.append(np.asarray(w, np.float64))
    return out


def _pit_scores(ests, refs):
    """Best-permutation per-speaker SI-SDR of 2 estimates vs 2 references."""
    a = [numpy_si_sdr(ests[i], refs[j]) for i in (0, 1) for j in (0, 1)]
    straight = (a[0] + a[3]) / 2
    swapped = (a[1] + a[2]) / 2
    if straight >= swapped:
        return (a[0], a[3]), False
    return (a[1], a[2]), True


def test_golden_stage_outputs_score_as_separated():
    clean = [c[:, 0] for c in _load("Clean")]  # reference-mic image
    scores = {}
    perms = {}
    # floors per stage (measured: MISO1 ~9.0/7.3, BF ~2.1/3.7, MISO3
    # ~8.7/10.4 dB): the linear MVDR dips against the reverberant clean
    # image and the MISO3 enhancement recovers above MISO1 — the cascade
    # shape the paper reports.  Anything near 0 dB means our metric/IO
    # stack or the alignment is broken.
    floors = {"MISO1": 5.0, "Beamforming": 1.0, "MISO3": 5.0}
    for stage, floor in floors.items():
        ests = _load(stage)
        (s0, s1), swapped = _pit_scores(ests, clean)
        scores[stage] = (s0 + s1) / 2
        perms[stage] = swapped
        assert s0 > floor and s1 > floor, (stage, s0, s1)
    assert scores["MISO3"] > scores["Beamforming"]
    # the cascade keeps one consistent speaker assignment end to end
    assert perms["MISO1"] == perms["Beamforming"] == perms["MISO3"], perms


def test_golden_wav_decode_shapes():
    clean = _load("Clean")
    assert clean[0].shape == (64059, 6)
    miso1 = _load("MISO1")
    assert miso1[0].shape == (64059,)
    # int16-quantized pipeline outputs stay in [-1, 1)
    for stage in ("MISO1", "Beamforming", "MISO3"):
        for w in _load(stage):
            assert np.abs(w).max() <= 1.0
