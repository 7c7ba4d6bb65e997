"""Streaming CSS tests (BASELINE.json config 5: long-form block-wise
processing with streaming covariance updates)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from misonet_tpu.config import DatasetConfig, ModelConfig, StftConfig
from misonet_tpu.data.synthetic import synth_mixture
from misonet_tpu.inference.css import StreamingCSS
from misonet_tpu.models import make_miso1

STFT = StftConfig(fs=8000, length=32, overlap=24)
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
                   chunk_time=0.25, least_time=0.125)


@pytest.fixture(scope="module")
def css():
    miso1 = make_miso1(SMALL)
    probe = jax.lax.complex(jnp.zeros((1, 3, 16, 17)), jnp.zeros((1, 3, 16, 17)))
    params = miso1.init(jax.random.key(0), probe)
    return StreamingCSS(miso1, params, STFT, DS)


def test_streaming_blocks_accumulate(css):
    d = synth_mixture(0, num_samples=6000, num_ch=3)
    out = css.process(d["mix"])
    assert out["beamformed"].shape == (2, 6000)
    assert out["miso1"].shape == (2, 6000)
    assert np.isfinite(out["beamformed"]).all()


def test_streaming_state_frames_grow(css):
    d = synth_mixture(1, num_samples=4000, num_ch=3)
    from misonet_tpu.ops.chunk import split_chunks

    pieces, _ = split_chunks(d["mix"], DS.chunk_samples)
    state = css.init_state(2)
    f0 = float(state.frames)
    state, bf, m1 = css.process_block(state, pieces[0])
    f1 = float(state.frames)
    state, bf, m1 = css.process_block(state, pieces[1])
    f2 = float(state.frames)
    assert f0 == 0 and f1 > 0 and f2 > f1


def test_forgetting_factor(css):
    miso1 = make_miso1(SMALL)
    probe = jax.lax.complex(jnp.zeros((1, 3, 16, 17)), jnp.zeros((1, 3, 16, 17)))
    params = miso1.init(jax.random.key(0), probe)
    css_f = StreamingCSS(miso1, params, STFT, DS, forget=0.5)
    d = synth_mixture(2, num_samples=4000, num_ch=3)
    out = css_f.process(d["mix"])
    assert np.isfinite(out["beamformed"]).all()


def test_crossfade_stitch_reconstructs_consistent_blocks():
    """Cross-fade OLA of blocks cut from one signal with overlap must
    reproduce that signal exactly (weights are normalized, edges incl.)."""
    from misonet_tpu.inference.css import crossfade_stitch

    rng = np.random.default_rng(3)
    sig = rng.standard_normal((2, 1000)).astype(np.float32)
    chunk, hop = 300, 200
    n = -(-(1000 - (chunk - hop)) // hop)
    padded = np.pad(sig, [(0, 0), (0, (n - 1) * hop + chunk - 1000)])
    blocks = np.stack(
        [padded[:, i * hop : i * hop + chunk] for i in range(n)]
    )
    out = crossfade_stitch(blocks, hop, 1000)
    np.testing.assert_allclose(out, sig, atol=1e-6)


def test_streaming_overlap_mode(css):
    """overlap>0: cross-fade stitched output has the full length and stays
    finite; block count covers the recording."""
    d = synth_mixture(5, num_samples=6000, num_ch=3)
    out = css.process(d["mix"], overlap=DS.chunk_samples // 2)
    assert out["beamformed"].shape == (2, 6000)
    assert out["miso1"].shape == (2, 6000)
    assert np.isfinite(out["beamformed"]).all()
    assert np.isfinite(out["miso1"]).all()
