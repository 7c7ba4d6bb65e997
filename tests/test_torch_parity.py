"""Ultimate architecture parity test: identical weights loaded into the
reference PyTorch MISO_1 and our MISONet must produce numerically matching
complex spectrogram outputs.

Imports the reference implementation read-only from /root/reference (skipped
when unavailable).  This validates every structural choice — conv/transpose
geometry and kernel conventions, norm placement and statistics, DenseBlock
wiring, TCN dilations, skip concatenation order, complex packing."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
# Append (not insert-at-0) so reference top-level modules (run, trainer,
# utils, ...) never shadow same-named modules of this repo in later tests.
if REF not in sys.path:
    sys.path.append(REF)

try:
    from model import MISO_1  # reference model.py
except Exception:  # pragma: no cover
    MISO_1 = None

import jax
import jax.numpy as jnp

from misonet_tpu.config import ModelConfig
from misonet_tpu.models import make_miso1
from misonet_tpu.utils.port_torch import port_miso_state_dict

pytestmark = pytest.mark.skipif(MISO_1 is None, reason="reference unavailable")

EN = [24, 32, 32, 32, 32, 64, 128]
DE = [128, 64, 32, 32, 32, 32, 24]


@pytest.mark.parametrize("num_ch", [6])
def test_forward_parity_with_reference(num_ch):
    torch.manual_seed(0)
    ref_model = MISO_1(2, num_ch, 7, list(EN), list(DE), "IN").eval()

    b, t, f = 1, 40, 129
    rng = np.random.default_rng(0)
    x = (
        rng.standard_normal((b, num_ch, t, f))
        + 1j * rng.standard_normal((b, num_ch, t, f))
    ).astype(np.complex64)

    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(x)).numpy()

    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    params = port_miso_state_dict(sd)

    ours_model = make_miso1(ModelConfig(compute_dtype="float32"))
    ours = np.asarray(ours_model.apply(params, jnp.asarray(x)))

    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours.real, ref_out.real, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(ours.imag, ref_out.imag, atol=2e-4, rtol=2e-4)


def test_ported_params_structure_matches_init():
    """The ported tree must be structurally identical to a fresh init (same
    paths, same shapes) so optimizers/checkpoints interoperate."""
    torch.manual_seed(1)
    ref_model = MISO_1(2, 6, 7, list(EN), list(DE), "IN")
    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    ported = port_miso_state_dict(sd)

    model = make_miso1(ModelConfig(compute_dtype="float32"))
    x = jax.lax.complex(jnp.zeros((1, 6, 8, 129)), jnp.zeros((1, 6, 8, 129)))
    init = model.init(jax.random.key(0), x)

    flat_init = jax.tree_util.tree_flatten_with_path(init)[0]
    flat_port = jax.tree_util.tree_flatten_with_path(ported)[0]
    paths_init = {jax.tree_util.keystr(p): v.shape for p, v in flat_init}
    paths_port = {jax.tree_util.keystr(p): np.shape(v) for p, v in flat_port}
    assert paths_init == paths_port


@pytest.mark.parametrize("num_ch", [6])
def test_miso2_forward_parity_with_reference(num_ch):
    """Joint-enhancement numerical twin: the reference MISO_2 module
    (model.py:166-278 — mixture C ch + MISO1 both-speaker 2 ch + BF
    both-speaker 2 ch conditioning, num_spks complex outputs) at identical
    ported weights vs our make_miso2 + enhance_input.  Pins the
    conditioning-channel interleave (model.py:243-247: real parts of
    mix/MISO1/BF then imag parts — which is exactly what the stacked
    complex packing produces when enhance_input orders channels
    mix, MISO1, BF) and port_torch for MISO_2 checkpoints."""
    from model import MISO_2  # reference model.py

    from misonet_tpu.models import enhance_input, make_miso2

    num_spks = 2
    torch.manual_seed(2)
    ref_model = MISO_2(num_spks, num_ch, 7, list(EN), list(DE), "IN").eval()

    b, t, f = 1, 40, 129
    rng = np.random.default_rng(2)

    def cx(c):
        return (
            rng.standard_normal((b, c, t, f))
            + 1j * rng.standard_normal((b, c, t, f))
        ).astype(np.complex64)

    mix, miso1, bf = cx(num_ch), cx(num_spks), cx(num_spks)

    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(mix), torch.from_numpy(miso1),
            torch.from_numpy(bf),
        ).numpy()

    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    params = port_miso_state_dict(sd)

    ours_model = make_miso2(ModelConfig(compute_dtype="float32"))
    stacked = enhance_input(
        jnp.asarray(mix), jnp.asarray(miso1), jnp.asarray(bf)
    )
    ours = np.asarray(ours_model.apply(params, stacked))

    assert ours.shape == ref_out.shape
    scale = np.abs(ref_out).max()
    np.testing.assert_allclose(ours / scale, ref_out / scale, atol=2e-5)


@pytest.mark.parametrize("num_ch", [6])
def test_miso3_forward_parity_with_reference(num_ch):
    """Enhancement-stage numerical twin: the reference MISO_3 module
    (model.py:282-395 — mixture + 1 MISO1 + 1 BF conditioning, one output
    source) at identical ported weights vs our make_miso3 +
    enhance_input.  Channel stacking order (mix, MISO1, BF per real/imag
    part — model.py:360-364) must match exactly; together with the
    decode/MVDR twins in test_pipeline_parity.py this pins every stage of
    the Tester_Enhance cascade (tester.py:846-975)."""
    from model import MISO_3  # reference model.py

    from misonet_tpu.models import enhance_input, make_miso3

    torch.manual_seed(1)
    ref_model = MISO_3(1, num_ch, 7, list(EN), list(DE), "IN").eval()

    b, t, f = 1, 40, 129
    rng = np.random.default_rng(1)

    def cx(c):
        return (
            rng.standard_normal((b, c, t, f))
            + 1j * rng.standard_normal((b, c, t, f))
        ).astype(np.complex64)

    mix, miso1, bf = cx(num_ch), cx(1), cx(1)

    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(mix), torch.from_numpy(miso1),
            torch.from_numpy(bf),
        ).numpy()

    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    params = port_miso_state_dict(sd)

    ours_model = make_miso3(ModelConfig(compute_dtype="float32"))
    stacked = enhance_input(
        jnp.asarray(mix), jnp.asarray(miso1), jnp.asarray(bf)
    )
    ours = np.asarray(ours_model.apply(params, stacked))

    assert ours.shape == ref_out.shape
    scale = np.abs(ref_out).max()
    np.testing.assert_allclose(ours / scale, ref_out / scale, atol=2e-5)
