"""flat_dense='auto' resolution: geometry predicate + backend gating
(ModelConfig.flat_dense contract, config.py; VERDICT r2 item 1/2)."""

import jax
import jax.numpy as jnp
import pytest

from misonet_tpu.config import ModelConfig
from misonet_tpu.models import make_miso1
from misonet_tpu.models.flat_dense import flat_plan_supported, resolve_flat

EN = (24, 32, 32, 32, 32, 64, 128)
DE = (128, 64, 32, 32, 32, 32, 24, 4)
EN8 = (24, 32, 32, 32, 32, 64, 128, 384)
DE8 = (384, 128, 64, 32, 32, 32, 32, 24, 4)


def test_production_geometries_supported():
    assert flat_plan_supported(129, 7, EN, DE)          # SMS-WSJ
    assert flat_plan_supported(257, 8, EN8, DE8)        # REVERB 2MIX


@pytest.mark.parametrize("f", [17, 33, 65, 128, 130, 251])
def test_off_ladder_bins_unsupported(f):
    assert not flat_plan_supported(f, 7, EN, DE)


def test_narrow_channels_unsupported():
    assert not flat_plan_supported(129, 7, (12, 32, 32, 32, 32, 64, 128), DE)
    assert not flat_plan_supported(
        129, 7, EN, (128, 64, 32, 32, 32, 32, 12, 4)
    )


def test_auto_resolves_off_tpu():
    on_tpu = jax.default_backend() == "tpu"
    assert resolve_flat("auto", num_bins=129, nb=7, en=EN, de_full=DE) == on_tpu
    # unsupported geometry -> False everywhere
    assert resolve_flat("auto", num_bins=33, nb=7, en=EN, de_full=DE) is False
    assert resolve_flat(False, num_bins=129, nb=7, en=EN, de_full=DE) is False


def test_forced_true_raises_on_bad_geometry():
    with pytest.raises(ValueError, match="fused flat pipeline"):
        resolve_flat(True, num_bins=33, nb=7, en=EN, de_full=DE)


@pytest.mark.slow
def test_default_model_runs_on_any_backend():
    """A default-config model (flat_dense='auto') must construct and run
    on whatever backend the test runs on — the round-2 regression."""
    model = make_miso1(ModelConfig(compute_dtype="float32"))
    mix = jax.lax.complex(
        jnp.ones((1, 6, 8, 129), jnp.float32),
        jnp.zeros((1, 6, 8, 129), jnp.float32),
    )
    params = jax.jit(model.init)(jax.random.key(0), mix)
    out = jax.jit(model.apply)(params, mix)
    assert out.shape == (1, 2, 8, 129)
    assert jnp.isfinite(out.real).all()


@pytest.mark.slow
def test_reverb_geometry_full_forward_flat_vs_plain():
    """Full MISO1 forward at the REVERB 2MIX production geometry (F=257,
    8 levels, 384-channel bottleneck, configs/reverb_2mix.yml — the
    reference's commented 8-block plan, NN_BSS.yml:115-117): the fused
    flat path must match the plain XLA path in precise mode.  Before this
    test only the geometry PREDICATE was pinned (flat_plan_supported);
    this runs the actual 257-bin ladder end to end."""
    import dataclasses
    from pathlib import Path

    import numpy as np
    from jax.experimental import pallas as _pl  # noqa: F401
    from jax.experimental.pallas import tpu as pltpu

    from misonet_tpu.config import load_yaml

    cfg = load_yaml(
        Path(__file__).resolve().parents[1] / "configs" / "reverb_2mix.yml"
    )
    mcfg = dataclasses.replace(cfg.miso1, compute_dtype="float32")
    assert mcfg.num_bottleneck == 8

    b, c, t, f = 1, 2, 8, cfg.stft.num_bins
    assert f == 257
    rng = np.random.default_rng(9)
    mix = jnp.asarray(
        rng.standard_normal((b, c, t, f)).astype(np.float32)
        + 1j * rng.standard_normal((b, c, t, f)).astype(np.float32)
    )

    plain = make_miso1(dataclasses.replace(mcfg, flat_dense=False))
    params = plain.init(jax.random.key(0), mix)
    ref = plain.apply(params, mix)
    assert ref.shape == (b, 2, t, f)

    flat = make_miso1(dataclasses.replace(mcfg, flat_dense=True))
    with pltpu.force_tpu_interpret_mode():
        out = flat.apply(params, mix)

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-4, rtol=5e-3
    )
