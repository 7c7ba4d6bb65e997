"""Data pipeline tests: ETL extraction, shard dataset, batcher, and the
wave-input train step (reference dataloader/SMS_WSJ.py + data.py)."""

import pickle

import numpy as np
import pytest

from misonet_tpu.data import ShardDataset, Batcher, synth_mixture, synth_shard_dir
from misonet_tpu.data.wavio import read_wav, write_wav

FS, CHUNK, LEAST = 8000, 32000, 16000


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((1000, 3)) * 0.1).astype(np.float32)
    write_wav(tmp_path / "a.wav", x, FS)
    y, sr = read_wav(tmp_path / "a.wav")
    assert sr == FS and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1e-4)  # int16 quantization


@pytest.fixture(scope="module")
def shard_dir(tmp_path_factory):
    return synth_shard_dir(
        tmp_path_factory.mktemp("data"),
        num_utts=4,
        num_samples=48000,  # -> 2 chunks/utt (windows at 0 and 16000)
        num_ch=6,
        chunk=CHUNK,
        least=LEAST,
    )


def test_extraction_and_dataset(shard_dir):
    ds = ShardDataset(shard_dir)
    assert len(ds) >= 8
    item = ds[0]
    assert item["mix"].shape == (CHUNK, 6)
    assert item["ref"].shape == (2, CHUNK)
    assert item["mix"].dtype == np.float32


def test_dataset_host_sharding(shard_dir):
    full = ShardDataset(shard_dir)
    parts = [ShardDataset(shard_dir, host_index=i, host_count=2) for i in range(2)]
    assert len(parts[0]) + len(parts[1]) == len(full)
    names = {f.name for p in parts for f in p.files}
    assert names == {f.name for f in full.files}


def test_batcher_shapes_and_determinism(shard_dir):
    ds = ShardDataset(shard_dir)
    batches = list(Batcher(ds, batch_size=4, shuffle=True, seed=7))
    assert len(batches) == len(ds) // 4
    b = batches[0]
    assert b["mix"].shape == (4, CHUNK, 6)
    assert b["ref"].shape == (4, 2, CHUNK)


def test_reference_pickle_format(tmp_path):
    """Legacy reference shards ({mix, ref1, ref2} pickles, data.py:72-77)
    load through the same dataset."""
    d = synth_mixture(0, CHUNK, 4)
    payload = {"mix": d["mix"], "ref1": d["ref"][0], "ref2": d["ref"][1]}
    with open(tmp_path / "x.pickle", "wb") as f:
        pickle.dump(payload, f)
    ds = ShardDataset(tmp_path)
    item = ds[0]
    assert item["mix"].shape == (CHUNK, 4)
    np.testing.assert_allclose(item["ref"][0], d["ref"][0])


@pytest.mark.slow
def test_wave_train_step(shard_dir):
    """End-to-end config-1 slice (BASELINE.json): wave batch -> on-device
    STFT -> MISO1 forward -> uPIT loss -> update, loss finite & decreasing."""
    import jax
    from misonet_tpu.config import ModelConfig, OptimizerConfig, StftConfig
    from misonet_tpu.models import make_miso1
    from misonet_tpu.train import (
        create_train_state,
        make_optimizer,
        make_separate_wave_train_step,
    )

    ds = ShardDataset(shard_dir)
    batch = next(iter(Batcher(ds, batch_size=2, shuffle=False)))
    # trim to a short window so the CPU test stays fast
    mix = batch["mix"][:, :4096, :]
    ref = batch["ref"][:, :, :4096]

    stft_cfg = StftConfig()
    model = make_miso1(ModelConfig(compute_dtype="float32"))
    import jax.numpy as jnp
    from misonet_tpu.ops.stft import stft_scaled

    probe = stft_scaled(jnp.asarray(mix).transpose(0, 2, 1), stft_cfg)
    params = model.init(jax.random.key(0), probe)
    opt = make_optimizer(OptimizerConfig())
    state = create_train_state(params, opt)
    step = make_separate_wave_train_step(model, opt, stft_cfg)

    losses = []
    for _ in range(3):
        state, metrics = step(state, jnp.asarray(mix), jnp.asarray(ref))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_companion_extraction(tmp_path):
    """early/tail/noise companions chunk with the same windows and ride in
    the shard (reference SMS_WSJ.py:44-69, :102-127 save_flag contract)."""
    from misonet_tpu.data.extraction import (
        ExtractionSpec,
        discover_smswsj,
        extract_utterance,
    )

    rng = np.random.default_rng(1)
    n = 48000
    obs, src, early, noise = (
        tmp_path / d for d in ("observation", "speech_source", "early", "noise")
    )
    for d in (obs, src, early, noise):
        d.mkdir()
    write_wav(obs / "u0.wav", rng.standard_normal((n, 6)) * 0.1, FS)
    for s in range(2):
        write_wav(src / f"u0_{s}.wav", rng.standard_normal(n) * 0.1, FS)
        write_wav(early / f"u0_{s}.wav", rng.standard_normal(n) * 0.1, FS)
    noise_sig = (rng.standard_normal((n, 6)) * 0.01).astype(np.float32)
    write_wav(noise / "u0.wav", noise_sig, FS)

    specs = discover_smswsj(obs, src, 2, early_dir=early, noise_dir=noise)
    assert len(specs) == 1
    assert dict(specs[0].companions).keys() == {"early1", "early2", "noise"}

    out = tmp_path / "shards"
    n_chunks = extract_utterance(specs[0], out, CHUNK, LEAST)
    assert n_chunks == 3  # windows at 0, 16000, + padded tail at 32000

    ds = ShardDataset(out, extra_keys=("early1", "early2", "noise"))
    item = ds[0]
    assert item["early1"].shape == (CHUNK,)       # per-spk -> ref-mic mono
    assert item["noise"].shape == (CHUNK, 6)      # noise keeps channels
    np.testing.assert_allclose(
        item["noise"], noise_sig[:CHUNK], atol=1e-4
    )

    # without extra_keys the item contract is unchanged
    assert set(ShardDataset(out)[0].keys()) == {"mix", "ref"}


def test_batcher_abandoned_iterator_releases_producer(shard_dir):
    """Breaking out of a Batcher mid-epoch must unblock and terminate the
    producer thread (it would otherwise sit forever on a full queue
    holding multi-MB batches — a leak in a long-running trainer)."""
    import threading
    import time

    ds = ShardDataset(shard_dir)
    before = {t.ident for t in threading.enumerate()}
    it = iter(Batcher(ds, batch_size=1, shuffle=False, prefetch=1))
    next(it)          # producer running, queue filling
    it.close()        # abandon mid-epoch (generator finally -> abandoned)
    deadline = time.monotonic() + 5.0
    while time.monotonic() < deadline:
        extra = [
            t for t in threading.enumerate()
            if t.ident not in before and t.is_alive()
        ]
        if not extra:
            break
        time.sleep(0.05)
    assert not extra, f"producer thread leaked: {extra}"


def test_pcm24_write_matches_pcm16_quantization(tmp_path):
    """PCM_24 output (the reference's soundfile byte format, tester.py:157)
    must read back EXACTLY equal to the PCM_16 write — same int16
    quantization upstream, 24-bit frames = int16 << 8 on disk."""
    import numpy as np

    from misonet_tpu.data.wavio import read_wav, write_wav

    rng = np.random.default_rng(11)
    x = (rng.standard_normal((3000, 2)) * 0.4).astype(np.float32)
    write_wav(tmp_path / "a16.wav", x, 8000)
    write_wav(tmp_path / "a24.wav", x, 8000, subtype="PCM_24")
    a, sr_a = read_wav(tmp_path / "a16.wav")
    b, sr_b = read_wav(tmp_path / "a24.wav")
    assert sr_a == sr_b == 8000
    np.testing.assert_array_equal(a, b)
    # mono path
    write_wav(tmp_path / "m24.wav", x[:, 0], 8000, subtype="PCM_24")
    m, _ = read_wav(tmp_path / "m24.wav")
    np.testing.assert_array_equal(m, a[:, 0])


def test_pcm24_odd_data_chunk_is_word_aligned(tmp_path):
    """RIFF chunks must be word-aligned: a mono PCM_24 file with an odd
    frame count has an odd data chunk (frames*3 bytes) and needs a zero
    pad byte, counted in the RIFF size but not the data size field."""
    import struct

    import numpy as np

    from misonet_tpu.data.wavio import read_wav, write_wav

    rng = np.random.default_rng(12)
    x = (rng.standard_normal(101) * 0.4).astype(np.float32)  # 303-byte data
    write_wav(tmp_path / "odd.wav", x, 8000, subtype="PCM_24")
    raw = (tmp_path / "odd.wav").read_bytes()
    assert len(raw) % 2 == 0                      # file is word-aligned
    riff_size = struct.unpack("<I", raw[4:8])[0]
    assert riff_size == len(raw) - 8              # pad counted in RIFF size
    data_size = struct.unpack("<I", raw[40:44])[0]
    assert data_size == 101 * 3                   # data size excludes pad
    y, _ = read_wav(tmp_path / "odd.wav")
    assert y.shape[0] == 101


def test_voiced_synthetic_sources():
    """voiced=True harmonic pseudo-speech: deterministic per seed, correct
    shapes, bounded amplitude, and spectrally sparse (energy concentrated
    in far fewer bins than the white-noise default — the property that
    gives the cascade demo its speech-like separation regime)."""
    import numpy as np

    from misonet_tpu.data.synthetic import synth_mixture

    a = synth_mixture(3, 16000, 4, voiced=True)
    b = synth_mixture(3, 16000, 4, voiced=True)
    np.testing.assert_array_equal(a["mix"], b["mix"])
    assert a["mix"].shape == (16000, 4) and a["ref"].shape == (2, 16000)
    assert np.abs(a["mix"]).max() < 1.0

    def sparsity(x):
        p = np.abs(np.fft.rfft(x)) ** 2
        p = np.sort(p)[::-1]
        return p[:200].sum() / p.sum()   # top-200-bin energy share

    voiced = sparsity(a["ref"][0])
    noise = sparsity(synth_mixture(3, 16000, 4)["ref"][0])
    assert voiced > 0.6 > noise
