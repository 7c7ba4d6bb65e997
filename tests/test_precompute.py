"""Precomputed-feature workflow: save MISO1/BF companions, load through the
dataset, train the enhancement stage from them (reference
load_MISO1_Output / load_MVDR_Output modes)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from misonet_tpu.config import (
    DatasetConfig,
    ModelConfig,
    OptimizerConfig,
    StftConfig,
    TrainerConfig,
)
from misonet_tpu.data import Batcher, ShardDataset
from misonet_tpu.data.precompute import precompute_enhance_features
from misonet_tpu.data.synthetic import synth_shard_dir
from misonet_tpu.models import make_miso1, make_miso3
from misonet_tpu.ops.stft import stft_scaled
from misonet_tpu.train.trainer import EnhanceTrainer

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


@pytest.mark.slow
def test_precompute_and_train(tmp_path):
    shard_dir = synth_shard_dir(
        tmp_path, num_utts=2, num_samples=2000, num_ch=3,
        chunk=2000, least=1000,
    )
    miso1 = make_miso1(SMALL)
    probe = jax.lax.complex(jnp.zeros((1, 3, 16, 17)), jnp.zeros((1, 3, 16, 17)))
    p1 = miso1.init(jax.random.key(0), probe)

    n = precompute_enhance_features(
        miso1, p1, shard_dir, STFT, DS, batch_size=2
    )
    assert n == 4  # 2 utts x 2 chunks (tail window zero-padded)
    feats = sorted(shard_dir.glob("*.feat.npz"))
    assert len(feats) == 4
    with np.load(feats[0]) as z:
        t = STFT.num_frames(2000)
        assert z["miso1"].shape == (2, t, 17)
        assert z["bf"].shape == (2, t, 17)
        assert z["miso1"].dtype == np.complex64

    # dataset surfaces the companions; plain mode ignores them
    ds = ShardDataset(shard_dir, with_features=True)
    item = ds[0]
    assert "miso1" in item and "bf" in item
    assert len(ShardDataset(shard_dir).files) == 4  # .feat.npz not indexed

    # enhancement training consumes the precomputed path
    batches = list(Batcher(ds, batch_size=2, shuffle=False))
    miso3 = make_miso3(SMALL)
    cfg = TrainerConfig(epochs=1, save_folder=str(tmp_path / "ck"),
                        checkpoint_every=1, print_freq=100)
    tr = EnhanceTrainer(
        miso3, miso1, p1, cfg, OptimizerConfig(), STFT, DS,
        train_data=batches, val_data=batches, joint=False,
    )
    hist = tr.train()
    assert np.isfinite(hist["train"][0])
