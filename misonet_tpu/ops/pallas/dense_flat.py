"""Fused DenseBlock layer kernel: conv3x3 + bias + ELU + InstanceNorm on a
lane-flattened (T, F) layout.

Ablation on TPU v5e (PERF.md round 1) showed the MISO forward is dominated
by the DenseBlocks: ~16.5 ms of convolutions that XLA runs at ~10% MXU
utilization (24-32 output channels pad the 128-lane output tile) plus
~9.6 ms of InstanceNorm traffic (reference model.py:437-482 runs
conv -> ELU -> IN five times per block).  This kernel removes both.

Layout and framing are shared with conv_flat.py (position columns on
lanes, channels on sublanes, one zero pad block of TM lanes each side).
On top of the transposed-matmul im2col formulation:

* **Chunked accumulation**: the layer input is the concatenation of all
  previously produced tensors (DenseNet); chunks of <=128 channels are
  patched and matmul'd with K = 9*chunk accumulated in VMEM — no
  intermediate preactivation ever reaches HBM.
* **InstanceNorm fused away**: tensors are stored *raw* (post-ELU) along
  with per-(batch, channel) sum/sumsq computed in this kernel's
  epilogue.  The consumer normalizes on load: the sigma^-1 scaling
  multiplies the window (zeros stay zero, so the SAME halo survives),
  and the mean term is reconstructed exactly — including all edge
  effects — by convolving the *static 0/1 validity field* with per-tap
  weight sums: ``correction = beta[N, 9] (x) mask-patches``, one tiny
  extra matmul.  The separate stats/normalize HBM passes of a standard
  IN disappear entirely.
* **Double-buffered windows**: the [C, TM+2*slack] input window for tile
  mm+1 is DMA'd while tile mm computes (two scratch slots selected by
  parity-guarded branches — Pallas only auto-double-buffers BlockSpec'd
  inputs, not manual HBM DMAs).
* **Minimal rotations**: taps whose window shift is 128-lane-aligned
  slice the window directly; with Fp a multiple of 128 one rotation per
  unaligned df serves all three dt taps (2 rotations instead of 9).
* **In-kernel validity mask**: Fp is a power of two for every DenseBlock
  geometry (F in {127, 63, 31, 15, 7} -> Fp in {128, 64, 32, 16, 8}),
  so the (T, F)-validity window is ``(col & (Fp-1)) < F`` — computed
  from an 8-row iota instead of DMA'ing a precomputed field.
* **Epilogue**: + bias, ELU, gap masking via the validity center tap
  (replicated to N rows with vreg copies — a broadcast select from a
  1-row mask lowers poorly), then per-channel sum/sumsq accumulated
  across the sequential grid and flushed on each batch element's last
  tile.

The reference semantics (conv SAME zero padding applied to the
*normalized* tensor, ELU, IN over (T, F) per channel with eps=1e-5,
torch InstanceNorm2d affine=False — model.py:408-416, :437-482) are
reproduced exactly; tests/test_dense_flat.py checks parity against the
plain DenseBlock module.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from misonet_tpu.ops.pallas.conv_flat import _flat_geometry, slack_for

MASK_ROWS = 8  # validity iota computed 8-row-replicated (sublane tile)


def _chunks(c_total: int, limit: int = 128) -> list[tuple[int, int]]:
    """Split channels into (offset, size) chunks, sizes multiples of 8."""
    out, off = [], 0
    while off < c_total:
        size = min(limit, c_total - off)
        assert size % 8 == 0, (c_total, size)
        out.append((off, size))
        off += size
    return out


def _round_up(v: int, q: int) -> int:
    return -(-v // q) * q


def tap_pieces(src, fp, tile_m, slack):
    """Yield (j, piece[rows, tile_m]) for the 9 stencil taps of window
    ``src`` [rows, TM+2*slack], minimizing lane rotations.  Window index
    of (tile position i, tap (dt, df)) is ``i + slack + (dt-1)*fp +
    (df-1)``; 128-aligned shifts slice directly, and for fp % 128 == 0
    one rotation per df serves all three dt."""
    w_win = src.shape[-1]
    if fp % 128 == 0:
        for df in range(3):
            s0 = slack - fp + (df - 1)
            aligned = s0 % 128 == 0
            base = src if aligned else pltpu.roll(src, w_win - s0, 1)
            off0 = s0 if aligned else 0
            for dt in range(3):
                yield 3 * dt + df, base[:, off0 + dt * fp :
                                        off0 + dt * fp + tile_m]
    else:
        for dt in range(3):
            for df in range(3):
                s = slack + (dt - 1) * fp + (df - 1)
                if s % 128 == 0:
                    yield 3 * dt + df, src[:, s : s + tile_m]
                else:
                    yield (3 * dt + df,
                           pltpu.roll(src, w_win - s, 1)[:, :tile_m])


def _kernel(widths, strides, n, n_m, tile_m, fp, f, m_out, slack,
            fuse_elu, want_stats, pdt, *refs):
    nt = len(widths)
    x_hbms, rest = refs[:nt], refs[nt:]
    (scale_ref, w_ref, bias_ref), rest = rest[:3], rest[3:]
    if want_stats:
        (y_ref, sum_ref, sq_ref), scr = rest[:3], rest[3:]
    else:
        (y_ref,), scr = rest[:1], rest[1:]
    wins, scr = scr[:nt], scr[nt:]
    p_ref = scr[0]
    if want_stats:
        s_sum, s_sq = scr[1:3]
        sems = scr[3]
    else:
        sems = scr[1]
    w_win = tile_m + 2 * slack

    bb = pl.program_id(0)
    m = pl.program_id(1)          # 0 and n_m+1 are pad blocks
    mm = m - 1

    def dma(ti, slot, tile):
        return pltpu.make_async_copy(
            x_hbms[ti].at[bb, :, pl.ds(tile * tile_m + tile_m - slack, w_win)],
            wins[ti].at[slot],
            sems.at[ti, slot],
        )

    # one-time: clear the patch buffer so its stride pad rows (zero
    # weights) can never contribute NaN * 0 from stale values
    @pl.when((bb == 0) & (m == 0))
    def _():
        p_ref[:, :] = jnp.zeros_like(p_ref)

    @pl.when((m == 0) | (m == n_m + 1))
    def _():
        y_ref[0] = jnp.zeros_like(y_ref[0])

    @pl.when((m > 0) & (m <= n_m))
    def _():
        # double-buffered window DMAs, slot = tile parity
        @pl.when(mm == 0)
        def _():
            for ti in range(nt):
                dma(ti, 0, 0).start()

        nxt = mm + 1

        @pl.when((nxt < n_m) & (nxt % 2 == 0))
        def _():
            for ti in range(nt):
                dma(ti, 0, nxt).start()

        @pl.when((nxt < n_m) & (nxt % 2 == 1))
        def _():
            for ti in range(nt):
                dma(ti, 1, nxt).start()

        # validity window from iota (fp is a power of two)
        cols = (
            jax.lax.broadcasted_iota(jnp.int32, (MASK_ROWS, w_win), 1)
            + (mm * tile_m - slack)
        )
        fmask = ((cols & (fp - 1)) < f) & (cols >= 0) & (cols < m_out)
        mwin = fmask.astype(jnp.float32)

        mcenter = None
        base = sum(9 * s for s in strides)
        # mask rows at stride 16 (bf16 sublane stores need 16-aligned
        # offsets); the pad rows carry zero weights and stay zero
        for j, piece in tap_pieces(mwin, fp, tile_m, slack):
            p_ref[base + 16 * j : base + 16 * j + MASK_ROWS, :] = (
                piece.astype(pdt)
            )
            if j == 4:
                mcenter = piece

        @pl.when(mm % 2 == 0)
        def _():
            for ti in range(nt):
                dma(ti, 0, mm).wait()

        @pl.when(mm % 2 == 1)
        def _():
            for ti in range(nt):
                dma(ti, 1, mm).wait()

        off = 0
        base = 0
        for ti, (width, stride) in enumerate(zip(widths, strides)):
            win = wins[ti][mm % 2]
            ch = win[:, :].astype(jnp.float32) * scale_ref[0, off : off + width, :]
            for j, piece in tap_pieces(ch, fp, tile_m, slack):
                p_ref[base + j * stride : base + j * stride + width, :] = (
                    piece.astype(pdt)
                )
            off += width
            base += 9 * stride
        acc = jax.lax.dot_general(
            w_ref[0], p_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        acc = acc + bias_ref[:, :]
        if fuse_elu:
            # expm1 has no Mosaic lowering; exp(x)-1 is exact for x <= 0
            acc = jnp.where(acc > 0, acc,
                            jnp.exp(jnp.minimum(acc, 0.0)) - 1.0)
        mfull = jnp.concatenate([mcenter] * (n // MASK_ROWS), axis=0)
        acc = acc * mfull
        y_ref[0] = acc.astype(y_ref.dtype)

        if want_stats:
            @pl.when(mm == 0)
            def _():
                s_sum[:, :] = jnp.zeros_like(s_sum)
                s_sq[:, :] = jnp.zeros_like(s_sq)

            s_sum[:, :] += jnp.sum(acc, axis=1, keepdims=True)
            s_sq[:, :] += jnp.sum(acc * acc, axis=1, keepdims=True)

            @pl.when(mm == n_m - 1)
            def _():
                sum_ref[0] = s_sum[:, :]
                sq_ref[0] = s_sq[:, :]


@functools.partial(
    jax.jit,
    static_argnames=("t", "f", "tile_m", "fuse_elu", "want_stats", "precise"),
)
def dense_layer_flat(
    xs: tuple,            # tensors [B, g_i, Wx] (bf16), flat layout, raw
    w: jnp.ndarray,       # f32 [3, 3, sum(g_i), N]
    bias: jnp.ndarray,    # f32 [N]
    scale: jnp.ndarray,   # f32 [B, sum(g_i)] per-channel 1/sigma
    mean: jnp.ndarray,    # f32 [B, sum(g_i)] per-channel mean
    *,
    t: int,
    f: int,
    tile_m: int = 2048,
    fuse_elu: bool = True,
    want_stats: bool = True,
    precise: bool = False,
):
    """One DenseBlock layer: y = ELU(conv3x3(IN-normalized inputs) + bias),
    plus (sum, sumsq) of y per (batch, channel) when ``want_stats``.

    The layer input is the *logical concatenation* of ``xs`` along the
    channel axis — never materialized: each tensor is DMA'd separately
    (DenseNet stacks would otherwise be recopied through HBM every
    layer).  Inputs are raw with their IN statistics supplied separately;
    the normalization is folded into the conv (see module docstring).
    Returns y [B, N, Wx] in the same framing (+ sums, sqs [B, N, 1])."""
    if not isinstance(xs, (tuple, list)):
        xs = (xs,)
    xs = tuple(xs)
    widths = [int(x.shape[1]) for x in xs]
    c_tot = sum(widths)
    b = xs[0].shape[0]
    x_width = xs[0].shape[2]
    n = w.shape[-1]
    fp, m_out, n_m, xw = _flat_geometry(t, f, tile_m)
    assert x_width == xw, (xs[0].shape, xw)
    assert all(x.shape[2] == xw and x.shape[0] == b for x in xs)
    assert n % MASK_ROWS == 0, n
    assert max(widths) <= 128, widths
    assert fp & (fp - 1) == 0, f"Fp={fp} must be a power of two (F={f})"
    slack = slack_for(fp)
    assert slack <= tile_m and slack % 128 == 0, (slack, tile_m)
    pdt = jnp.float32 if precise else jnp.bfloat16
    # per-tap sublane stride in the patch buffer: bf16 stores need
    # 16-aligned offsets (tile (16, 128)); pad rows carry zero weights
    q = 8 if precise else 16
    strides = [_round_up(width, q) for width in widths]
    k_mask = 16 * 9
    k_total = sum(9 * s for s in strides) + k_mask

    # one combined per-batch weight matrix [B, N, k_total]: the conv
    # weights (zero rows at the stride padding) followed by the
    # mean-correction beta columns over the mask patches
    w9 = w.reshape(9, c_tot, n)  # [(dt,df), c, n]
    blocks = []
    off = 0
    for width, stride in zip(widths, strides):
        for j in range(9):
            blk = w9[j, off : off + width, :]
            blocks.append(jnp.pad(blk, ((0, stride - width), (0, 0))))
        off += width
    w_main = jnp.concatenate(blocks, axis=0).T          # [n, sum(9*stride)]
    w_main = jnp.broadcast_to(w_main, (b,) + w_main.shape)
    # beta[b, n, 9]: each tap's value spread over the MASK_ROWS replicated
    # mask rows (hence /MASK_ROWS), laid out at stride 16
    mu_sc = (mean * scale).astype(jnp.float32)           # [B, C]
    beta = -jnp.einsum("jcn,bc->bnj", w9.astype(jnp.float32), mu_sc)
    beta = jnp.repeat(beta, MASK_ROWS, axis=2) / MASK_ROWS   # [B, n, 72]
    beta = beta.reshape(b, n, 9, MASK_ROWS)
    beta = jnp.pad(beta, ((0, 0), (0, 0), (0, 0), (0, 16 - MASK_ROWS)))
    beta = beta.reshape(b, n, k_mask)
    wb = jnp.concatenate([w_main, beta], axis=2).astype(pdt)

    scale3 = scale[:, :, None]                            # [B, C, 1]
    bias2 = bias.reshape(n, 1).astype(jnp.float32)

    kern = functools.partial(
        _kernel, widths, strides, n, n_m, tile_m, fp, f, m_out, slack,
        fuse_elu, want_stats, pdt
    )
    out_shape = [jax.ShapeDtypeStruct((b, n, x_width), pdt)]
    out_specs = [
        pl.BlockSpec((1, n, tile_m), lambda bb, m: (bb, 0, m),
                     memory_space=pltpu.VMEM)
    ]
    if want_stats:
        out_shape += [jax.ShapeDtypeStruct((b, n, 1), jnp.float32)] * 2
        out_specs += [
            pl.BlockSpec((1, n, 1), lambda bb, m: (bb, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * 2
    w_win = tile_m + 2 * slack
    scratch = [
        pltpu.VMEM((2, width, w_win), x.dtype)
        for width, x in zip(widths, xs)
    ] + [pltpu.VMEM((k_total, tile_m), pdt)]
    if want_stats:
        scratch += [pltpu.VMEM((n, 1), jnp.float32)] * 2
    scratch += [pltpu.SemaphoreType.DMA((len(xs), 2))]

    return pl.pallas_call(
        kern,
        grid=(b, n_m + 2),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(xs) + [
            pl.BlockSpec((1, c_tot, 1), lambda bb, m: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, k_total), lambda bb, m: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, 1), lambda bb, m: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(*xs, scale3, wb, bias2)


def mask_field(t: int, f: int, tile_m: int = 2048) -> np.ndarray:
    """Static 0/1 validity field [MASK_ROWS, Wx] in the flat framing
    (kept for tests and the XLA-side normalize)."""
    fp, _, _, x_width = _flat_geometry(t, f, tile_m)
    m = np.zeros(x_width, np.float32)
    for tt in range(t):
        base = tile_m + tt * fp
        m[base : base + f] = 1.0
    return np.broadcast_to(m, (MASK_ROWS, x_width)).copy()


def stats_to_scale_mean(
    sums: jnp.ndarray, sqs: jnp.ndarray, count: int, eps: float = 1e-5
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(sum, sumsq) [B, N, 1] from the kernel -> (1/sigma, mean) [B, N],
    matching torch InstanceNorm2d statistics (biased variance, eps inside
    the sqrt — reference model.py:413)."""
    mean = sums[..., 0] / count
    var = jnp.maximum(sqs[..., 0] / count - mean * mean, 0.0)
    return jax.lax.rsqrt(var + eps), mean
