"""REVERB 2-mix model plan: the 8-level / 384-channel U-Net at 16 kHz
(reference config/REVERB_2MIX.yml — dead config upstream since run.py:290
hard-codes NN_BSS.yml; see configs/reverb_2mix.yml for the deviations that
make the plan actually runnable)."""

import pytest
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from misonet_tpu.config import load_yaml
from misonet_tpu.models import make_miso1

CONFIG = Path(__file__).parent.parent / "configs" / "reverb_2mix.yml"


def test_reverb_yaml_loads():
    cfg = load_yaml(CONFIG)
    assert cfg.dataset.name == "REVERB_2MIX"
    assert cfg.dataset.fs == 16000
    assert cfg.dataset.num_ch == 8
    assert cfg.stft.num_bins == 257
    assert cfg.stft.hop == 128  # 8 ms at 16 kHz
    assert cfg.miso1.num_bottleneck == 8
    assert cfg.miso1.en_channels[-1] == 384
    # TCN width follows the bottleneck (the reference hard-codes 128 at
    # model.py:31, which would crash its own 384 plan)
    assert cfg.miso1.tcn_channels == 384


@pytest.mark.slow
def test_reverb_plan_forward_and_ladder():
    """The F=257 frequency ladder closes to 1 at the bottleneck and the
    decoder mirrors back to 257 (the reference's own 8-block stride pattern
    strands the ladder at F=2, so this plan never ran upstream)."""
    cfg = load_yaml(CONFIG)
    model = make_miso1(cfg.miso1)
    b, c, t, f = 1, cfg.dataset.num_ch, 8, cfg.stft.num_bins
    kr, ki, kp = jax.random.split(jax.random.key(0), 3)
    x = jax.lax.complex(
        jax.random.normal(kr, (b, c, t, f)), jax.random.normal(ki, (b, c, t, f))
    )
    params = model.init(kp, x)
    y = model.apply(params, x)
    assert y.shape == (b, 2, t, f)
    assert y.dtype == jnp.complex64
    assert np.isfinite(np.asarray(y.real)).all()
    assert np.isfinite(np.asarray(y.imag)).all()
