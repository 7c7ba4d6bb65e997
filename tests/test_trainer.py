"""Trainer-loop integration tests on tiny synthetic data (small model plan,
short chunks).  Covers: epoch loop, validation, checkpoint+resume, plateau
LR, and the enhancement stage's frozen-MISO1 + MVDR feature path."""

import jax
import numpy as np
import pytest

from misonet_tpu.config import (
    DatasetConfig,
    ModelConfig,
    OptimizerConfig,
    StftConfig,
    TrainerConfig,
)
from misonet_tpu.models import make_miso1, make_miso3
from misonet_tpu.train.trainer import SeparationTrainer, EnhanceTrainer

# F=17 ladder -> nperseg 32 (17 bins), hop 8
pytestmark = pytest.mark.slow

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
DS = DatasetConfig(num_ch=3, num_ch_utilize=3, num_spks=2, ref_ch=0)
SAMPLES = 512  # frames: (512+32)/8 ... small


def _batches(seed, n=2, b=2):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        out.append(
            {
                "mix": rng.standard_normal((b, SAMPLES, 3)).astype(np.float32) * 0.1,
                "ref": rng.standard_normal((b, 2, SAMPLES)).astype(np.float32) * 0.1,
            }
        )
    return out


def test_separation_trainer_end_to_end(tmp_path):
    model = make_miso1(SMALL)
    cfg = TrainerConfig(
        epochs=2, save_folder=str(tmp_path / "ck"), checkpoint_every=1,
        print_freq=100,
    )
    tr = SeparationTrainer(
        model, cfg, OptimizerConfig(), STFT, DS,
        train_data=_batches(0), val_data=_batches(1, n=1),
    )
    hist = tr.train()
    assert len(hist["train"]) == 2 and len(hist["val"]) == 2
    assert all(np.isfinite(hist["train"]))
    # checkpoints exist: periodic + best
    names = {p.name for p in (tmp_path / "ck").iterdir()}
    assert "epoch000" in names and "best" in names


def test_separation_trainer_resume(tmp_path):
    model = make_miso1(SMALL)
    ck = str(tmp_path / "ck")
    cfg = TrainerConfig(epochs=1, save_folder=ck, checkpoint_every=1, print_freq=100)
    tr = SeparationTrainer(
        model, cfg, OptimizerConfig(), STFT, DS,
        train_data=_batches(0), val_data=_batches(1, n=1),
    )
    tr.train()

    cfg2 = TrainerConfig(
        epochs=2, save_folder=ck, checkpoint_every=1, resume="epoch000",
        print_freq=100,
    )
    tr2 = SeparationTrainer(
        model, cfg2, OptimizerConfig(), STFT, DS,
        train_data=_batches(2), val_data=_batches(3, n=1),
    )
    hist = tr2.train()
    assert tr2.start_epoch == 1
    # history carries over epoch 0 and adds epoch 1
    assert len(hist["train"]) == 2


def test_enhance_trainer_smoke(tmp_path):
    """MISO3 stage: frozen MISO1 decode + on-device MVDR features -> one
    training epoch with finite loss (reference trainer.py:353-442)."""
    miso1 = make_miso1(SMALL)
    batch = _batches(4, n=1, b=1)[0]
    import jax.numpy as jnp
    from misonet_tpu.ops.stft import stft_scaled

    probe = stft_scaled(jnp.asarray(batch["mix"]).transpose(0, 2, 1), STFT)
    miso1_params = miso1.init(jax.random.key(0), probe)

    miso3 = make_miso3(SMALL)
    cfg = TrainerConfig(
        epochs=1, save_folder=str(tmp_path / "ck3"), checkpoint_every=1,
        print_freq=100,
    )
    tr = EnhanceTrainer(
        miso3, miso1, miso1_params, cfg, OptimizerConfig(), STFT, DS,
        train_data=_batches(5, n=1, b=1), val_data=_batches(6, n=1, b=1),
        joint=False,
    )
    hist = tr.train()
    assert np.isfinite(hist["train"][0]) and np.isfinite(hist["val"][0])


def test_enhance_trainer_resume_and_writer(tmp_path):
    """EnhanceTrainer resumes from its own checkpoints (the reference
    resumes both trainers from model_load, trainer.py:54-71) and logs the
    reference's eval stage set (mix/clean/MISO1/BF/enhanced spectrograms +
    audio, trainer.py:445-497)."""
    miso1 = make_miso1(SMALL)
    batch = _batches(7, n=1, b=1)[0]
    import jax.numpy as jnp
    from misonet_tpu.ops.stft import stft_scaled

    probe = stft_scaled(jnp.asarray(batch["mix"]).transpose(0, 2, 1), STFT)
    miso1_params = miso1.init(jax.random.key(0), probe)

    class RecordingWriter:
        def __init__(self):
            self.scalars, self.specs, self.audios = [], [], []
        def scalar(self, tag, value, step):
            self.scalars.append(tag)
        def spectrogram(self, tag, spec, step):
            self.specs.append(tag)
        def audio(self, tag, spec, step, num_samples):
            self.audios.append(tag)
        def step_start(self):
            pass
        def step_end(self, step, audio_seconds=None):
            pass

    writer = RecordingWriter()
    miso3 = make_miso3(SMALL)
    ck = str(tmp_path / "ck3")
    cfg = TrainerConfig(epochs=1, save_folder=ck, checkpoint_every=1,
                        print_freq=100)
    tr = EnhanceTrainer(
        miso3, miso1, miso1_params, cfg, OptimizerConfig(), STFT, DS,
        train_data=_batches(8, n=1, b=1), val_data=_batches(9, n=1, b=1),
        joint=False, writer=writer,
    )
    tr.train()
    for tag in ("val/mix", "val/clean_s0", "val/miso1_s0", "val/bf_s0",
                "val/enhanced_s0"):
        assert tag in writer.specs and tag in writer.audios, tag
    assert "train/loss" in writer.scalars
    assert "val/epoch_loss" in writer.scalars

    cfg2 = TrainerConfig(epochs=2, save_folder=ck, checkpoint_every=1,
                         resume="epoch000", print_freq=100)
    tr2 = EnhanceTrainer(
        miso3, miso1, miso1_params, cfg2, OptimizerConfig(), STFT, DS,
        train_data=_batches(10, n=1, b=1), val_data=_batches(11, n=1, b=1),
        joint=False,
    )
    hist = tr2.train()
    assert tr2.start_epoch == 1
    assert len(hist["train"]) == 2


def test_separation_trainer_overest_loss(tmp_path):
    """overest_alpha wires loss_upit_overest (the reference's loss_uPIT_v1
    with its commented alpha=(epoch+1)*0.03 schedule, trainer.py:176-178)
    into the jitted wave train step: trains finitely and its loss sits
    above the plain-uPIT trainer's on identical data/params (the penalty
    is non-negative)."""
    data, val = _batches(0), _batches(1, n=1)
    losses = {}
    for alpha in (0.0, 0.05):
        model = make_miso1(SMALL)
        cfg = TrainerConfig(
            epochs=1, save_folder=str(tmp_path / f"ck{alpha}"),
            checkpoint_every=5, print_freq=100, overest_alpha=alpha,
        )
        tr = SeparationTrainer(
            model, cfg, OptimizerConfig(), STFT, DS,
            train_data=data, val_data=val,
        )
        hist = tr.train()
        assert np.isfinite(hist["train"]).all()
        losses[alpha] = hist["train"][0]
    assert losses[0.05] >= losses[0.0]
