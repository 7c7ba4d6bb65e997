"""Utterance-level evaluator tests on synthetic corpora (reference
Tester_Separate / Tester_Beamforming / Tester_Enhance paths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from misonet_tpu.config import DatasetConfig, ModelConfig, StftConfig
from misonet_tpu.data.extraction import discover_smswsj
from misonet_tpu.data.synthetic import synth_shard_dir
from misonet_tpu.inference.evaluate import CascadeEvaluator, _pit_si_sdr
from misonet_tpu.models import make_miso1, make_miso3
from misonet_tpu.ops.stft import stft_scaled

STFT = StftConfig(fs=8000, length=32, overlap=24)  # 17 bins
SMALL = ModelConfig(
    num_bottleneck=4,
    en_channels=(8, 8, 8, 16),
    de_channels=(16, 8, 8, 8),
    tcn_repeats=1,
    tcn_blocks=2,
    tcn_channels=16,
    compute_dtype="float32",
)
DS = DatasetConfig(num_ch=3, num_ch_utilize=3, num_spks=2, ref_ch=0,
                   chunk_time=0.25, least_time=0.125)  # 2000-sample chunks


@pytest.fixture(scope="module")
def models():
    miso1 = make_miso1(SMALL)
    probe = jax.lax.complex(
        jnp.zeros((1, 3, 16, 17)), jnp.zeros((1, 3, 16, 17))
    )
    p1 = miso1.init(jax.random.key(0), probe)
    miso3 = make_miso3(SMALL)
    probe3 = jax.lax.complex(
        jnp.zeros((1, 5, 16, 17)), jnp.zeros((1, 5, 16, 17))
    )
    p3 = miso3.init(jax.random.key(1), probe3)
    return miso1, p1, miso3, p3


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    synth_shard_dir(root, num_utts=2, num_samples=4500, num_ch=3,
                    chunk=2000, least=1000)
    return discover_smswsj(root / "wav", root / "wav", num_spks=2)


def test_separate_only(models, corpus, tmp_path):
    miso1, p1, _, _ = models
    ev = CascadeEvaluator(miso1, p1, STFT, DS, beamform_utterance=False)
    from misonet_tpu.data.wavio import read_wav

    mix, _ = read_wav(corpus[0].mix_path)
    refs = np.stack([read_wav(p)[0] for p in corpus[0].source_paths])
    res = ev.process(mix, refs)
    assert res.separated.shape == (2, mix.shape[0])
    assert np.isfinite(res.separated).all()
    assert "miso1" in res.si_sdr


def test_full_cascade_utterance_mode(models, corpus, tmp_path):
    miso1, p1, miso3, p3 = models
    ev = CascadeEvaluator(
        miso1, p1, STFT, DS,
        enhance_model=miso3, enhance_params=p3,
        beamform_utterance=True,
    )
    scores = ev.evaluate_corpus(corpus, tmp_path / "out", write=True)
    assert set(scores) == {"miso1", "beamform", "enhanced"}
    assert all(np.isfinite(v) for v in scores.values())
    # wavs written per stage and speaker (tester.py:181-183 convention)
    for stage in ["MISO1", "Beamforming", "Enhanced"]:
        wavs = list((tmp_path / "out" / stage).glob("*.wav"))
        assert len(wavs) == 2 * len(corpus)


def test_miso2_joint_chunk_mode(models, corpus, tmp_path):
    """MISO2 joint enhancement through the chunk-mode beamformer
    (tester.py:940-947 + :453-543)."""
    from misonet_tpu.models import make_miso2

    miso1, p1, _, _ = models
    miso2 = make_miso2(SMALL)
    probe = jax.lax.complex(
        jnp.zeros((1, 3 + 4, 16, 17)), jnp.zeros((1, 3 + 4, 16, 17))
    )
    p2 = miso2.init(jax.random.key(3), probe)
    ev = CascadeEvaluator(
        miso1, p1, STFT, DS,
        enhance_model=miso2, enhance_params=p2, joint=True,
        beamform_utterance=False,
    )
    from misonet_tpu.data.wavio import read_wav

    mix, _ = read_wav(corpus[0].mix_path)
    refs = np.stack([read_wav(p)[0] for p in corpus[0].source_paths])
    res = ev.process(mix, refs)
    assert res.enhanced is not None
    assert res.enhanced.shape == (2, mix.shape[0])
    assert np.isfinite(res.enhanced).all()


def test_refless_chain_alignment(models, corpus):
    miso1, p1, _, _ = models
    ev = CascadeEvaluator(miso1, p1, STFT, DS, beamform_utterance=False)
    from misonet_tpu.data.wavio import read_wav

    mix, _ = read_wav(corpus[0].mix_path)
    res = ev.process(mix, refs=None)
    assert res.separated.shape == (2, mix.shape[0])
    assert np.isfinite(res.separated).all()


def test_pit_si_sdr_helper():
    rng = np.random.default_rng(0)
    refs = rng.standard_normal((2, 4000)).astype(np.float32)
    assert _pit_si_sdr(refs[::-1], refs) > 50  # swap resolved
