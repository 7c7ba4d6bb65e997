"""Composed Tester_Enhance twin: the reference's full enhance chain
(/root/reference/tester.py:846-975)

  per-chunk MISO1 decode -> per-chunk alignment to the clean sources ->
  per-speaker MVDR -> MISO3 -> per-chunk iSTFT -> gap trim -> stitch

replayed end to end with the reference's own primitives (MISO1_Inference,
Apply_Beamforming, the loader's scipy STFT convention, the reference MISO_3
module at ported weights) against ``CascadeEvaluator`` with enhance enabled —
in BOTH beamforming modes:

  chunk mode       the literal tester.py:846-975 composition (MVDR per split)
  utterance mode   BF per tester.py:340-451 (stitch -> re-STFT -> one SCM ->
                   MVDR -> iSTFT), then the same per-chunk MISO3 tail on the
                   re-chunked BF wave — the evaluator's default composition

The stage twins (decode test_pipeline_parity.py, MVDR ditto, MISO_3 forward
test_torch_parity.py, utterance BF test_utterance_parity.py) pin each link;
this file pins the COMPOSITION: the chunk/utterance frame grids the
conditioning channels sit on, the gap bookkeeping through the enhance tail,
and the per-chunk norm-statistics regime.

NOTE on argument order: the reference's Tester_Enhance calls
``self.model(mix, bf, m1)`` into ``MISO_3.forward(mixture, MISO1, BF)`` —
the two conditioning tensors are swapped relative to the parameter names,
consistently at train AND test time (model.py:350-364, trainer.py; see
models/miso.py::enhance_input).  The slot names are therefore just labels;
the oracle feeds the canonical (mix, m1, bf) order that our enhance_input
uses, matching the MISO_3 forward twin's convention.
"""

import itertools

import numpy as np
import pytest
import scipy.signal

import test_pipeline_parity as tpp
import test_utterance_parity as tup

torch = pytest.importorskip("torch")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(tpp.ref_tester is None, reason="reference unavailable"),
]

from misonet_tpu.config import DatasetConfig, ModelConfig, StftConfig  # noqa: E402
from misonet_tpu.inference.evaluate import CascadeEvaluator  # noqa: E402
from misonet_tpu.models import make_miso1, make_miso3  # noqa: E402


def _align_chunk(est, clean, s_num):
    """Reference per-chunk PIT alignment to the clean sources
    (tester.py:888-914).  est: list per spk of [M, T, F] torch; clean
    [S, T, F] torch."""
    est_ref = torch.stack([e[0] for e in est])           # ref_ch = 0
    dist = (
        (est_ref.abs()[None, :] - clean.abs()[:, None]).abs().sum((-2, -1))
    )
    best, best_perm = None, None
    for perm in itertools.permutations(range(s_num)):
        v = float(sum(dist[i, perm[i]] for i in range(s_num)))
        if best is None or v < best:
            best, best_perm = v, perm
    return [est[best_perm[s]] for s in range(s_num)]


def _ref_enhance_chain(
    ref_m1, ref_m3, cfg, mix_wave, refs, chunk, utterance_bf, ref_ch=0
):
    """tester.py:846-975 (B=1) with the reference's own primitives; in
    utterance_bf mode the MVDR stage is tester.py:340-451 instead and its
    output wave is re-chunked for the MISO3 tail.  Returns enhanced
    [S, out_len]."""
    scale = np.sqrt(
        1.0 / scipy.signal.get_window("hann", cfg.length).sum() ** 2
    )
    tb = tpp._ref_beamformer()
    tb.model = ref_m1
    s_num = refs.shape[0]
    tb.num_spks = s_num

    n_samp = mix_wave.shape[0]
    num = -(-n_samp // chunk)
    gap = num * chunk - n_samp
    mixp = np.pad(mix_wave, [(0, gap), (0, 0)])
    refp = np.pad(refs.T, [(0, gap), (0, 0)])

    obs_chunks, m1_chunks = [], []
    for si in range(num):
        seg = mixp[si * chunk : (si + 1) * chunk]
        observe = torch.from_numpy(
            tup._loader_stft(cfg, seg).transpose(0, 2, 1)
        )[None].to(torch.complex64)                      # [1, M, T, F]
        clean = torch.from_numpy(
            tup._loader_stft(cfg, refp[si * chunk : (si + 1) * chunk])
            .transpose(0, 2, 1)
        ).to(torch.complex64)
        with torch.no_grad():
            est = tb.MISO1_Inference(observe, ref_ch=ref_ch)
        est = [e[0] for e in est]
        aligned = _align_chunk(est, clean, s_num)        # per spk [M, T, F]
        obs_chunks.append(observe)
        m1_chunks.append(aligned)

    # ---- MVDR stage --------------------------------------------------
    bf_chunks = [[None] * s_num for _ in range(num)]     # per chunk per spk [T, F]
    if not utterance_bf:
        # tester.py:921-925: Apply_Beamforming per split per speaker
        for si in range(num):
            obs_bf = (
                obs_chunks[si][0].numpy().transpose(2, 0, 1)[None]
            ).astype(np.complex128)                      # [1, F, M, T]
            for s in range(s_num):
                src_bf = (
                    m1_chunks[si][s].numpy().transpose(2, 0, 1)[None]
                ).astype(np.complex128)
                bf = np.asarray(tb.Apply_Beamforming(src_bf, obs_bf))
                bf_chunks[si][s] = bf[0]                 # [T, F]
    else:
        # tester.py:340-451: stitch -> full re-STFT -> one SCM -> MVDR ->
        # iSTFT, then re-chunk the BF wave onto the chunk frame grid
        t_e, t_obs = [None] * s_num, None
        for si in range(num):
            for s in range(s_num):
                spec = (m1_chunks[si][s].numpy() * scale).transpose(0, 2, 1)
                tw = tup._ref_istft(cfg, spec)           # [M, chunk]
                if si == num - 1 and gap:
                    tw = tw[:, : chunk - gap]
                t_e[s] = tw if si == 0 else np.append(t_e[s], tw, axis=1)
            ow = tup._ref_istft(
                cfg, (obs_chunks[si][0].numpy() * scale).transpose(0, 2, 1)
            )
            if si == num - 1 and gap:
                ow = ow[:, : chunk - gap]
            t_obs = ow if si == 0 else np.append(t_obs, ow, axis=1)
        obs_u = tup._loader_stft(cfg, t_obs.T)
        obs_bf = obs_u.transpose(1, 0, 2)[None].astype(np.complex128)
        for s in range(s_num):
            src_u = tup._loader_stft(cfg, t_e[s].T)
            src_bf = src_u.transpose(1, 0, 2)[None].astype(np.complex128)
            bf = np.asarray(tb.Apply_Beamforming(src_bf, obs_bf))  # [1,T,F]
            bf_wave = tup._ref_istft(cfg, bf[0].T * scale)[: n_samp]
            bf_wave = np.pad(bf_wave, (0, num * chunk - len(bf_wave)))
            for si in range(num):
                seg = bf_wave[si * chunk : (si + 1) * chunk]
                bf_chunks[si][s] = torch.from_numpy(
                    tup._loader_stft(cfg, seg[:, None]).transpose(0, 2, 1)[0]
                ).to(torch.complex64).numpy()            # [T, F]

    # ---- MISO3 tail (tester.py:936-975) ------------------------------
    out = [None] * s_num
    for si in range(num):
        observe = obs_chunks[si]
        for s in range(s_num):
            m1 = torch.from_numpy(
                m1_chunks[si][s][ref_ch].numpy()
            )[None, None]                                # [1, 1, T, F]
            bf = torch.from_numpy(
                np.asarray(bf_chunks[si][s], np.complex64)
            )[None, None]
            with torch.no_grad():
                # canonical (mix, m1, bf) slot order — see module docstring
                enh = ref_m3(observe, m1, bf)[0, 0].numpy()
            tw = tup._ref_istft(cfg, (enh * scale).T)    # [chunk]
            assert tw.shape[0] == chunk
            if si == num - 1 and gap:
                tw = tw[: chunk - gap]
            out[s] = tw if si == 0 else np.append(out[s], tw)
    return np.stack(out)


@pytest.mark.parametrize("utterance_bf", [False, True])
def test_composed_enhance_parity(utterance_bf):
    """Full enhance cascade vs the reference chain at ported weights on a
    2.5-chunk utterance whose length is NOT a hop multiple (gap > 0 AND a
    ceil-frame tail), in both beamforming modes."""
    torch.manual_seed(0)
    en = [24, 32, 32, 32, 32, 64, 128]
    de = [128, 64, 32, 32, 32, 32, 24]
    ref_m1 = tpp.MISO_1(2, 6, 7, list(en), list(de), "IN").eval()
    torch.manual_seed(3)
    from model import MISO_3  # reference model.py

    ref_m3 = MISO_3(1, 6, 7, list(en), list(de), "IN").eval()
    p1 = tpp.port_miso_state_dict(
        {k: v.numpy() for k, v in ref_m1.state_dict().items()}
    )
    p3 = tpp.port_miso_state_dict(
        {k: v.numpy() for k, v in ref_m3.state_dict().items()}
    )
    mcfg = ModelConfig(compute_dtype="float32")
    ours1, ours3 = make_miso1(mcfg), make_miso3(mcfg)

    cfg = StftConfig()
    ds = DatasetConfig(chunk_time=0.256, least_time=0.256)
    chunk = ds.chunk_samples
    out_len = int(2.5 * chunk) - 63
    rng = np.random.default_rng(17)
    mix_wave = rng.standard_normal((out_len, 6)).astype(np.float32) * 0.1
    refs = rng.standard_normal((2, out_len)).astype(np.float32) * 0.1

    ref_enh = _ref_enhance_chain(
        ref_m1, ref_m3, cfg, mix_wave, refs, chunk, utterance_bf,
        ref_ch=ds.ref_ch,
    )

    ev = CascadeEvaluator(
        ours1, p1, cfg, ds,
        enhance_model=ours3, enhance_params=p3,
        beamform_utterance=utterance_bf,
        power_iters=2000,   # random-weight SCMs need many trips, see
                            # test_utterance_parity.py
    )
    res = ev.process(mix_wave, refs)

    assert res.enhanced is not None
    assert res.enhanced.shape == (2, out_len)
    assert ref_enh.shape[1] >= out_len
    scale = np.abs(ref_enh).max()
    np.testing.assert_allclose(
        res.enhanced / scale, ref_enh[:, :out_len] / scale, atol=5e-3
    )
