"""Numerical-twin parity of the inference cascade against the ACTUAL
reference code (/root/reference/tester.py), stage by stage:

  * circular-shift full-array decode: reference ``MISO1_Inference``
    (tester.py:580-634, B=1 path) vs ``make_full_array_decode``;
  * MVDR: reference ``Apply_Beamforming`` (tester.py:637-794 — SCM, eigh
    steering, ref-mic + sqrt(M/||d||) normalization, phase correction,
    diagonal-loaded solve) vs ``mvdr_beamform``.

Identical ported weights, identical inputs; the backbone forward parity is
covered separately by test_torch_parity.py.  Runs the reference's torch/
NumPy CPU path read-only; compatibility shims (np.complex, a stub
``soundfile`` module) are injected so the 2021-era code imports under this
image's numpy 2.0 / no-soundfile environment.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.append(REF)

# --- import-time shims for the reference module (not used by our code) ---
if not hasattr(np, "complex"):
    np.complex = complex  # numpy 2.0 removed the alias; tester.py:672 uses it
import scipy.signal  # noqa: E402  (tester.py calls scipy.signal.* via `scipy`)

# tester.py imports soundfile (absent in this image) at module top; shim it
# ONLY for that import — pytest imports this file at collection time, and a
# hollow soundfile left in sys.modules would break tensorboardX's
# ModuleNotFoundError guard in unrelated tests (utils/writer.py audio path).
_sf_stub = "soundfile" not in sys.modules
if _sf_stub:
    sys.modules["soundfile"] = types.ModuleType("soundfile")
try:
    import tester as ref_tester  # /root/reference/tester.py
    from model import MISO_1
except Exception:  # pragma: no cover
    ref_tester = MISO_1 = None
finally:
    if _sf_stub:
        del sys.modules["soundfile"]


def _np1x_solve(a, b):
    """numpy 1.x solve semantics: a trailing-vector b (b.ndim == a.ndim-1)
    is solved as stacked vectors.  numpy 2.0 changed this to matrix
    interpretation, which breaks the reference's
    ``solve(R_noise, steering_vector)`` (tester.py:788) — restore the
    behavior the 2021-era code was written against."""
    a, b = np.asarray(a), np.asarray(b)
    if b.ndim == a.ndim - 1:
        return np.linalg.solve(a, b[..., None])[..., 0]
    return np.linalg.solve(a, b)


if ref_tester is not None:
    ref_tester.solve = _np1x_solve

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from misonet_tpu.beamforming.mvdr import mvdr_beamform  # noqa: E402
from misonet_tpu.config import ModelConfig  # noqa: E402
from misonet_tpu.inference.separate import make_full_array_decode  # noqa: E402
from misonet_tpu.models import make_miso1  # noqa: E402
from misonet_tpu.utils.port_torch import port_miso_state_dict  # noqa: E402

pytestmark = pytest.mark.skipif(
    ref_tester is None, reason="reference unavailable"
)


def _ref_beamformer():
    """A Tester_Beamforming shell carrying only what MISO1_Inference /
    Apply_Beamforming read (self.model, self.num_spks); __init__ needs
    loaders and checkpoint paths irrelevant to the numerics."""
    tb = object.__new__(ref_tester.Tester_Beamforming)
    return tb


@pytest.fixture(scope="module")
def twin():
    """(reference torch model, our model, ported params) at production
    F=129 geometry with a short time axis."""
    torch.manual_seed(0)
    en = [24, 32, 32, 32, 32, 64, 128]
    de = [128, 64, 32, 32, 32, 32, 24]
    ref_model = MISO_1(2, 6, 7, en, de, "IN").eval()
    sd = {k: v.numpy() for k, v in ref_model.state_dict().items()}
    params = port_miso_state_dict(sd)
    ours = make_miso1(ModelConfig(compute_dtype="float32"))
    return ref_model, ours, params


def test_full_array_decode_parity(twin):
    """Reference MISO1_Inference (M sequential forwards + host-side PIT
    alignment, tester.py:580-634) vs our single batched decode."""
    ref_model, ours, params = twin
    b, m, t, f = 1, 6, 24, 129
    rng = np.random.default_rng(1)
    mix = (
        rng.standard_normal((b, m, t, f))
        + 1j * rng.standard_normal((b, m, t, f))
    ).astype(np.complex64)

    tb = _ref_beamformer()
    tb.model = ref_model
    tb.num_spks = 2
    with torch.no_grad():
        ref_out = tb.MISO1_Inference(torch.from_numpy(mix), ref_ch=0)
    ref_out = np.stack([s.numpy() for s in ref_out], axis=1)  # [B,S,M,T,F]

    decode = make_full_array_decode(ours, m, ref_ch=0)
    got = np.asarray(decode(params, jnp.asarray(mix)))        # [B,S,M,T,F]

    assert got.shape == ref_out.shape
    np.testing.assert_allclose(got.real, ref_out.real, atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(got.imag, ref_out.imag, atol=2e-3, rtol=2e-3)


def test_mvdr_parity():
    """Reference Apply_Beamforming vs mvdr_beamform on a synthetic
    near-rank-1 source (what MISO1 image estimates look like, and the
    regime where the power-iteration steering matches eigh's principal
    eigenvector after ref-mic normalization)."""
    b, m, t, f = 1, 6, 64, 33
    rng = np.random.default_rng(2)

    def crand(*shape):
        return (
            rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
        ).astype(np.complex128)

    steer = crand(b, f, m)
    sig = crand(b, f, t)
    source = steer[:, :, :, None] * sig[:, :, None, :] + 0.02 * crand(b, f, m, t)
    noise = 0.5 * crand(b, f, m, t)
    mix = source + noise                                   # [B, F, M, T]

    tb = _ref_beamformer()
    ref_bf = tb.Apply_Beamforming(source, mix).numpy()     # [B, T, F]

    to_ours = lambda x: jnp.asarray(x.transpose(0, 2, 3, 1))  # -> [B,M,T,F]
    got = np.asarray(
        mvdr_beamform(to_ours(source), to_ours(mix), ref_ch=0)
    )                                                      # [B, T, F]

    assert got.shape == ref_bf.shape
    # complex64 pipeline + power iteration vs float64 LAPACK eigh: compare
    # to the beamformed signal scale
    scale = np.abs(ref_bf).max()
    np.testing.assert_allclose(got / scale, ref_bf / scale, atol=5e-3)


def test_mvdr_parity_on_decode_output(twin):
    """End-to-end MVDR stage on REAL decode outputs: reference
    Apply_Beamforming fed the reference MISO1_Inference estimates vs our
    mvdr_beamform fed our decode estimates — the full
    separation+beamforming cascade numerical twin (tester.py:361-442,
    chunk flavor)."""
    ref_model, ours, params = twin
    b, m, t, f = 1, 6, 24, 129
    rng = np.random.default_rng(3)
    mix = (
        rng.standard_normal((b, m, t, f))
        + 1j * rng.standard_normal((b, m, t, f))
    ).astype(np.complex64)

    tb = _ref_beamformer()
    tb.model = ref_model
    tb.num_spks = 2
    with torch.no_grad():
        ref_dec = tb.MISO1_Inference(torch.from_numpy(mix), ref_ch=0)
    # [B,M,T,F] -> reference beamformer layout [B,F,M,T]
    ref_src = ref_dec[0].numpy().transpose(0, 3, 1, 2).astype(np.complex128)
    ref_mix = mix.transpose(0, 3, 1, 2).astype(np.complex128)
    ref_bf = tb.Apply_Beamforming(ref_src, ref_mix).numpy()  # [B,T,F]

    decode = make_full_array_decode(ours, m, ref_ch=0)
    full = decode(params, jnp.asarray(mix))                  # [B,S,M,T,F]
    # random-weight sources have a tiny spectral gap (unlike trained
    # near-rank-1 estimates), so drive the power iteration to full
    # convergence for the eigh comparison (measured: 3.2e-5 @ 300 trips)
    got = np.asarray(
        mvdr_beamform(full[:, 0], jnp.asarray(mix), ref_ch=0, power_iters=300)
    )

    scale = np.abs(ref_bf).max()
    np.testing.assert_allclose(got / scale, ref_bf / scale, atol=1e-3)
