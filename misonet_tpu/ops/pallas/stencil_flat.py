"""Generalized fused stencil kernel on the lane-flattened (T, F) layout:
the strided encoder trunk convs and the frequency-upsampling decoder
deconvs as flat Pallas kernels (conv + bias + ELU + InstanceNorm stats in
one pass), so the whole U-Net body stays in the flat layout.

Same framing, window DMA, validity and raw+stats contracts as
ops/pallas/dense_flat.py (see its module docstring); the generalization is
the *tap table*: instead of the fixed 3x3 SAME stencil, each input tensor
carries a static list of lane shifts, which lets two new ops reuse the
machinery:

* **conv_down_flat** — the encoder's 3x3 stride-(1,2) frequency-VALID
  trunk conv (reference Conv2d_ blocks, model.py:40-54).  A stride-2 conv
  is a stride-1 conv after frequency space-to-depth: the caller splits the
  input into even/odd frequency phases (``s2d_flat``), each framed at
  fp_out = fp_in/2 — the *output* framing, since the MISO frequency ladder
  129->127->63->31->15->7 halves fp exactly.  Taps: even phase reads
  kernel df=0 at lane shift 0 and df=2 at +1; odd phase reads df=1 at 0.
  Every tap of a freq-valid output reads a real input column, so the
  mean-correction mask only needs the 3 *time* shifts.

* **deconv_up_flat** — the decoder's 3x3 stride-(1,2) ConvTranspose
  (reference DeConv2d_, model.py:425-433; torch geometry out = 2*F_in+1).
  The transpose conv splits into two output phases computed in the input
  framing: even output columns fo=2m read x[m] (kernel d=0) and x[m-1]
  (d=2); odd fo=2m+1 read x[m] (d=1).  The kernel emits [2N, W] (phase-
  major rows); ``interleave_up`` merges the phases into the doubled
  framing fp_out = 2*fp_in, which is exactly the next decoder level's
  framing.  Phase validity differs (even: m <= F_in, odd: m < F_in), so
  output masking is per row block.

Both ops consume and produce the flat-bundle contract (raw bf16 tensor +
per-(batch, channel) InstanceNorm stats; ELU fused, normalization of the
*input* folded into the weights/bias) — chaining with DenseBlockFlat with
no NHWC materialization in between.  tests/test_stencil_flat.py checks
parity against the XLA ConvBlock/DeconvBlock modules in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from misonet_tpu.ops.pallas.conv_flat import _flat_geometry, slack_for
from misonet_tpu.ops.pallas.dense_flat import MASK_ROWS, _round_up


def _shift_piece(src, s, tile_m, slack):
    """Window piece [rows, tile_m] at lane shift ``s`` relative to the
    output column (window covers [tile - slack, tile + tile_m + slack))."""
    off = slack + s
    if off % 128 == 0 and off >= 0:
        return src[:, off : off + tile_m]
    w_win = src.shape[-1]
    return pltpu.roll(src, w_win - off, 1)[:, :tile_m]


def _kernel(widths, strides, taps, mask_shifts, out_blocks, n_m, tile_m,
            fp, m_out, mask_f, slack, fuse_elu, want_stats, pdt,
            tap_gates, omask_taps, *refs):
    nt = len(widths)
    n_out = sum(r for r, _ in out_blocks)
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
            x_hbms[ti].at[
                bb, :, pl.ds(tile * tile_m + tile_m - slack, w_win)
            ],
            wins[ti].at[slot],
            sems.at[ti, slot],
        )

    @pl.when((bb == 0) & (m == 0))
    def _():
        p_ref[:, :] = jnp.zeros_like(p_ref)

    @pl.when((m == 0) | (m == n_m + 1))
    def _():
        y_ref[0] = jnp.zeros_like(y_ref[0])

    @pl.when((m > 0) & (m <= n_m))
    def _():
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

        base = sum(len(tp) * s for tp, s in zip(taps, strides))
        if omask_taps:
            # output-relative validity: tap (row_shift, lo, hi) is valid
            # where lo <= f(col) < hi (frequency, in the OUTPUT row) and
            # the read row t + row_shift exists — used by stencils whose
            # taps cross the frequency gap (the final transpose conv)
            cols0m = (
                jax.lax.broadcasted_iota(jnp.int32, (MASK_ROWS, tile_m), 1)
                + mm * tile_m
            )
            fcol0 = cols0m & (fp - 1)
            for j, (rs, lo, hi) in enumerate(omask_taps):
                colr = cols0m + rs * fp
                piece = (
                    (fcol0 >= lo) & (fcol0 < hi)
                    & (colr >= 0) & (colr < m_out)
                ).astype(jnp.float32)
                p_ref[base + 16 * j : base + 16 * j + MASK_ROWS, :] = (
                    piece.astype(pdt)
                )
        else:
            # validity windows from iota (fp is a power of two)
            cols = (
                jax.lax.broadcasted_iota(jnp.int32, (MASK_ROWS, w_win), 1)
                + (mm * tile_m - slack)
            )
            in_bounds = (cols >= 0) & (cols < m_out)
            mwin = (
                ((cols & (fp - 1)) < mask_f) & in_bounds
            ).astype(jnp.float32)

            for j, s in enumerate(mask_shifts):
                piece = _shift_piece(mwin, s, tile_m, slack)
                p_ref[base + 16 * j : base + 16 * j + MASK_ROWS, :] = (
                    piece.astype(pdt)
                )

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
        for ti, (width, stride, tp) in enumerate(zip(widths, strides, taps)):
            win = wins[ti][mm % 2]
            sc = scale_ref[0, off : off + width, :]
            ch = win[:, :].astype(jnp.float32) * sc
            gates = tap_gates[ti] if tap_gates is not None else (None,) * len(tp)
            for j, s in enumerate(tp):
                piece = _shift_piece(ch, s, tile_m, slack)
                if gates[j] is not None:
                    # zero taps whose read crosses a row boundary into real
                    # data of the neighboring frequency row
                    lo, hi = gates[j]
                    fcg = (
                        jax.lax.broadcasted_iota(
                            jnp.int32, (width, tile_m), 1
                        ) + mm * tile_m
                    ) & (fp - 1)
                    piece = piece * ((fcg >= lo) & (fcg < hi)).astype(
                        jnp.float32
                    )
                p_ref[base + j * stride : base + j * stride + width, :] = (
                    piece.astype(pdt)
                )
            off += width
            base += len(tp) * stride
        acc = jax.lax.dot_general(
            w_ref[0], p_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        acc = acc + bias_ref[:, :]
        if fuse_elu:
            acc = jnp.where(acc > 0, acc,
                            jnp.exp(jnp.minimum(acc, 0.0)) - 1.0)
        # per-row-block output validity masks (center columns, no shift)
        cols0 = (
            jax.lax.broadcasted_iota(jnp.int32, (MASK_ROWS, tile_m), 1)
            + mm * tile_m
        )
        pieces = []
        for rows, f_valid in out_blocks:
            bm = (
                ((cols0 & (fp - 1)) < f_valid) & (cols0 < m_out)
            ).astype(jnp.float32)
            pieces.extend([bm] * (rows // MASK_ROWS))
        mfull = jnp.concatenate(pieces, axis=0)
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
    static_argnames=(
        "t", "f_out", "taps", "mask_shifts", "out_blocks", "mask_f",
        "tile_m", "fuse_elu", "want_stats", "precise",
        "tap_gates", "omask_taps",
    ),
)
def stencil_layer_flat(
    xs: tuple,            # raw tensors [B, c_i, Wx] in the OUTPUT framing
    wb: jnp.ndarray,      # [B, n_out, k_total] combined weights + beta cols
    bias: jnp.ndarray,    # f32 [n_out]
    scale: jnp.ndarray,   # f32 [B, sum(c_i)] per-channel 1/sigma of inputs
    *,
    t: int,
    f_out: int,
    taps: tuple[tuple, ...],
    mask_shifts: tuple[int, ...],
    out_blocks: tuple[tuple[int, int], ...],
    mask_f: int,
    tile_m: int,
    fuse_elu: bool = True,
    want_stats: bool = True,
    precise: bool = False,
    tap_gates: tuple | None = None,
    omask_taps: tuple | None = None,
):
    """One generalized stencil layer over flat tensors; returns
    (y [B, n_out, Wx], sums, sqs [B, n_out, 1]).

    ``tap_gates[ti][j]`` optionally restricts tap j of tensor ti to output
    frequencies in [lo, hi) — required when a tap's lane shift would cross
    the frequency gap into the neighboring row's real data.  ``omask_taps``
    replaces the window-shifted mean-correction masks with output-relative
    (row_shift, lo, hi) validity fields, for stencils whose tap validity
    is not expressible as a shifted copy of the input validity."""
    xs = tuple(xs)
    widths = [int(x.shape[1]) for x in xs]
    c_tot = sum(widths)
    b = xs[0].shape[0]
    n_out = sum(r for r, _ in out_blocks)
    fp, m_out, n_m, xw = _flat_geometry(t, f_out, tile_m)
    assert all(x.shape[0] == b for x in xs)
    assert n_out % MASK_ROWS == 0, n_out
    assert fp & (fp - 1) == 0, f"fp={fp} must be a power of two"
    slack = slack_for(fp)
    assert slack <= tile_m and slack % 128 == 0, (slack, tile_m)
    assert all(abs(s) <= slack for tp in taps for s in tp)
    for x in xs:
        # window DMA bounds: [mm*tile + TM - slack, (mm+1)*tile + TM + slack)
        assert n_m * tile_m + tile_m + slack <= x.shape[2], (
            x.shape, n_m, tile_m, slack)
    pdt = jnp.float32 if precise else jnp.bfloat16
    q = 8 if precise else 16
    strides = [_round_up(w, q) for w in widths]
    k_total = sum(len(tp) * s for tp, s in zip(taps, strides))
    k_total += 16 * (len(omask_taps) if omask_taps else len(mask_shifts))
    assert wb.shape == (b, n_out, k_total), (wb.shape, (b, n_out, k_total))
    if tap_gates is not None:
        assert len(tap_gates) == len(xs)
        assert all(len(g) == len(tp) for g, tp in zip(tap_gates, taps))

    scale3 = scale[:, :, None]
    bias2 = bias.reshape(n_out, 1).astype(jnp.float32)

    kern = functools.partial(
        _kernel, tuple(widths), tuple(strides), taps, mask_shifts,
        out_blocks, n_m, tile_m, fp, m_out, mask_f, slack,
        fuse_elu, want_stats, pdt, tap_gates, omask_taps,
    )
    out_shape = [jax.ShapeDtypeStruct((b, n_out, xw), pdt)]
    out_specs = [
        pl.BlockSpec((1, n_out, tile_m), lambda bb, m: (bb, 0, m),
                     memory_space=pltpu.VMEM)
    ]
    if want_stats:
        out_shape += [jax.ShapeDtypeStruct((b, n_out, 1), jnp.float32)] * 2
        out_specs += [
            pl.BlockSpec((1, n_out, 1), lambda bb, m: (bb, 0, 0),
                         memory_space=pltpu.VMEM)
        ] * 2
    w_win = tile_m + 2 * slack
    scratch = [
        pltpu.VMEM((2, width, w_win), x.dtype)
        for width, x in zip(widths, xs)
    ] + [pltpu.VMEM((k_total, tile_m), pdt)]
    if want_stats:
        scratch += [pltpu.VMEM((n_out, 1), jnp.float32)] * 2
    scratch += [pltpu.SemaphoreType.DMA((len(xs), 2))]

    return pl.pallas_call(
        kern,
        grid=(b, n_m + 2),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(xs) + [
            pl.BlockSpec((1, c_tot, 1), lambda bb, m: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_out, k_total), lambda bb, m: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_out, 1), lambda bb, m: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(*xs, scale3, wb, bias2)


# ---------------------------------------------------------------------------
# Front-end: strided trunk conv (encoder)
# ---------------------------------------------------------------------------


def s2d_flat(
    x_flat: jnp.ndarray, t: int, f_in: int, tile_in: int, tile_out: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Frequency space-to-depth: flat tensor at (f_in, fp) -> (even, odd)
    phase tensors framed at fp/2 = the stride-2 conv's output framing."""
    b, c, _ = x_flat.shape
    fp, m_out, _, _ = _flat_geometry(t, f_in, tile_in)
    assert fp % 2 == 0, fp
    fh = fp // 2
    v = x_flat[:, :, tile_in : tile_in + m_out].reshape(b, c, t, fh, 2)
    f_out = (f_in - 3) // 2 + 1
    _, m2, n2, xw2 = _flat_geometry(t, f_out, tile_out)
    assert m2 == t * fh, (m2, t, fh)

    def frame(y):
        y = y.reshape(b, c, m2)
        return jnp.pad(y, [(0, 0), (0, 0), (tile_out, xw2 - tile_out - m2)])

    return frame(v[..., 0]), frame(v[..., 1])


def conv_down_flat(
    x_even: jnp.ndarray,
    x_odd: jnp.ndarray,
    w: jnp.ndarray,        # [3, 3, C, N] HWIO (flax nn.Conv kernel)
    bias: jnp.ndarray,     # [N]
    scale: jnp.ndarray,    # [B, C] 1/sigma of the pre-s2d input
    mean: jnp.ndarray,     # [B, C]
    *,
    t: int,
    f_in: int,
    tile_m: int,
    fuse_elu: bool = True,
    precise: bool = False,
):
    """3x3 stride-(1,2) frequency-VALID conv + bias + ELU with fused input
    normalization, on the space-to-depth phases from :func:`s2d_flat`.
    Matches ConvBlock(strides=(1,2), padding=((1,1),(0,0))) on the
    normalized input (reference model.py:40-54).  Returns raw output +
    stats (the flat bundle contract)."""
    b, c, _ = x_even.shape
    n = w.shape[-1]
    f_out = (f_in - 3) // 2 + 1
    fp, _, _, _ = _flat_geometry(t, f_out, tile_m)
    q = 8 if precise else 16
    stride = _round_up(c, q)
    pdt = jnp.float32 if precise else jnp.bfloat16

    # output position (t', fo) reads x[t'+dt-1, 2*fo+df]; in phase coords:
    # even phase (f=2m): df=0 -> m=fo (shift 0), df=2 -> m=fo+1 (shift +1);
    # odd phase (f=2m+1): df=1 -> m=fo (shift 0).
    taps_even = tuple(
        (dt - 1) * fp + d for dt in range(3) for d in (0, 1)
    )
    taps_odd = tuple((dt - 1) * fp for dt in range(3))
    mask_shifts = tuple((dt - 1) * fp for dt in range(3))

    w32 = w.astype(jnp.float32)
    blocks = []
    for dt in range(3):
        for df in (0, 2):  # even-phase taps in (df=0, df=2) order
            blk = w32[dt, df].T  # [N, C]
            blocks.append(jnp.pad(blk, ((0, 0), (0, stride - c))))
    for dt in range(3):
        blk = w32[dt, 1].T
        blocks.append(jnp.pad(blk, ((0, 0), (0, stride - c))))
    w_main = jnp.concatenate(blocks, axis=1)            # [N, 9*stride]
    w_main = jnp.broadcast_to(w_main, (b,) + w_main.shape)

    mu_sc = (mean * scale).astype(jnp.float32)          # [B, C]
    # beta per time tap dt: all freq taps of a freq-valid output read real
    # input, so the correction only gates on time validity.
    beta = -jnp.einsum("dfcn,bc->bnd", w32, mu_sc)      # [B, N, 3]
    beta = jnp.repeat(beta, MASK_ROWS, axis=2) / MASK_ROWS
    beta = beta.reshape(b, n, 3, MASK_ROWS)
    beta = jnp.pad(beta, ((0, 0), (0, 0), (0, 0), (0, 16 - MASK_ROWS)))
    wb = jnp.concatenate([w_main, beta.reshape(b, n, 48)], axis=2).astype(pdt)

    scale2 = jnp.concatenate([scale, scale], axis=1)    # even + odd phases

    return stencil_layer_flat(
        (x_even, x_odd), wb, bias, scale2,
        t=t, f_out=f_out,
        taps=(taps_even, taps_odd),
        mask_shifts=mask_shifts,
        out_blocks=((n, f_out),),
        mask_f=f_out,
        tile_m=tile_m,
        fuse_elu=fuse_elu,
        precise=precise,
    )


# ---------------------------------------------------------------------------
# Front-end: frequency-upsampling transpose conv (decoder)
# ---------------------------------------------------------------------------


def deconv_up_flat(
    x: jnp.ndarray,        # [B, C, Wx] raw flat, input framing (fp = f_in+1)
    w: jnp.ndarray,        # [3, 3, C, N] (ConvTranspose2dTorch 'kernel')
    bias: jnp.ndarray,     # [N]
    scale: jnp.ndarray,    # [B, C]
    mean: jnp.ndarray,     # [B, C]
    *,
    t: int,
    f_in: int,
    tile_m: int,
    fuse_elu: bool = True,
    precise: bool = False,
):
    """3x3 stride-(1,2) ConvTranspose (torch geometry, out F = 2*F_in+1)
    + bias + ELU with fused input normalization.  Emits phase-major rows
    [B, 2N, Wx] in the INPUT framing plus per-row stats; combine with
    :func:`interleave_up`.  Matches DeconvBlock/ConvTranspose2dTorch
    (reference model.py:418-433) on the normalized input."""
    b, c, _ = x.shape
    n = w.shape[-1]
    fp, _, _, _ = _flat_geometry(t, f_in, tile_m)
    assert fp == f_in + 1, (
        f"deconv_up_flat assumes fp == f_in + 1 (got fp={fp}, f_in={f_in})"
    )
    q = 8 if precise else 16
    stride = _round_up(c, q)
    pdt = jnp.float32 if precise else jnp.bfloat16

    # transpose conv: out[to, fo] += k[dt, d] * x[ti, fi] at to = ti+dt-1,
    # fo = 2*fi + d.  Reading side (ti = to - dt + 1 = to + dt'-1 with
    # dt' = 2-dt): even fo=2m reads x[m] (d=0) and x[m-1] (d=2); odd
    # fo=2m+1 reads x[m] (d=1).
    taps = tuple((dtp - 1) * fp + d for dtp in range(3) for d in (-1, 0))
    mask_shifts = taps

    w32 = w.astype(jnp.float32)
    zeros = jnp.zeros((n, stride), jnp.float32)

    def blk(dtp, d):  # [N, stride] weight block, kernel time index flipped
        return jnp.pad(w32[2 - dtp, d].T, ((0, 0), (0, stride - c)))

    even_blocks, odd_blocks = [], []
    for dtp in range(3):
        even_blocks += [blk(dtp, 2), blk(dtp, 0)]     # (delta=-1, delta=0)
        odd_blocks += [zeros, blk(dtp, 1)]
    w_main = jnp.concatenate(
        [jnp.concatenate(even_blocks, axis=1),
         jnp.concatenate(odd_blocks, axis=1)], axis=0
    )  # [2N, 6*stride]
    w_main = jnp.broadcast_to(w_main, (b,) + w_main.shape)

    mu_sc = (mean * scale).astype(jnp.float32)
    # beta per tap (dt', delta), gated on *input* validity at the tap
    bet_e = jnp.stack(
        [-jnp.einsum("cn,bc->bn", w32[2 - dtp, {-1: 2, 0: 0}[d]], mu_sc)
         for dtp in range(3) for d in (-1, 0)], axis=2,
    )  # [B, N, 6]
    bet_o = jnp.stack(
        [(-jnp.einsum("cn,bc->bn", w32[2 - dtp, 1], mu_sc)
          if d == 0 else jnp.zeros((b, n)))
         for dtp in range(3) for d in (-1, 0)], axis=2,
    )
    beta = jnp.concatenate([bet_e, bet_o], axis=1)      # [B, 2N, 6]
    beta = jnp.repeat(beta, MASK_ROWS, axis=2) / MASK_ROWS
    beta = beta.reshape(b, 2 * n, 6, MASK_ROWS)
    beta = jnp.pad(beta, ((0, 0), (0, 0), (0, 0), (0, 16 - MASK_ROWS)))
    wb = jnp.concatenate(
        [w_main, beta.reshape(b, 2 * n, 96)], axis=2
    ).astype(pdt)

    bias2 = jnp.concatenate([bias, bias])

    return stencil_layer_flat(
        (x,), wb, bias2, scale,
        t=t, f_out=f_in,           # output lives in the input framing
        taps=(taps,),
        mask_shifts=mask_shifts,
        out_blocks=((n, f_in + 1), (n, f_in)),
        mask_f=f_in,
        tile_m=tile_m,
        fuse_elu=fuse_elu,
        precise=precise,
    )


def enc0_slices(x_cm: jnp.ndarray, t: int, f_out: int, tile_m: int, dtype):
    """Channel-major input [B, C, T, F = fp+1] -> the two flat slice
    tensors the enc0 kernel taps (no NHWC transpose, no gather):

      xa[t, m] = x[t, m]      (m in [0, fp); col fp-1 only feeds masked
                               outputs, so the non-zero gap is harmless)
      xb[t, m] = x[t, m + 1]  (a full fp-wide row with NO gap: the df=2
                               tap of output fo = f_out-1 reads
                               xb[fp-1] = x[fp])

    Channels are zero-padded to a multiple of 8 (the window-slice sublane
    tiling); both outputs are contiguous slices + reshape + pad — no lane
    shuffling."""
    b, c, t_in, f_in = x_cm.shape
    c_pad = _round_up(c, 8)
    fp, m_out, n_m, xw = _flat_geometry(t, f_out, tile_m)
    assert f_in == fp + 1 and t_in == t, (x_cm.shape, t, fp)

    def frame(v):
        v = v.reshape(b, c, t * fp).astype(dtype)
        return jnp.pad(
            v, ((0, 0), (0, c_pad - c), (tile_m, xw - tile_m - t * fp))
        )

    return frame(x_cm[:, :, :, 0:fp]), frame(x_cm[:, :, :, 1 : fp + 1])


def enc0_down_flat(
    x_cm: jnp.ndarray,     # [B, C, T, fp+1] real channel-major input
    w: jnp.ndarray,        # [3, 3, C, N] HWIO
    bias: jnp.ndarray,     # [N]
    *,
    t: int,
    tile_m: int,
    precise: bool = False,
):
    """The encoder's first conv (3x3, stride 1, frequency-VALID F -> F-2,
    time SAME, bias, NO activation/norm — reference init_Conv2d_,
    model.py:401-406) computed directly into the flat F-2 framing.

    Output position (t', fo) reads x[t'+dt-1, fo+df]: df=0 comes from the
    xa slice at lane shift 0, df in {1, 2} from the xb slice at shifts
    {0, +1} — all constant shifts, so the unpadded F-bin input needs no
    layout pass at all.  The input is raw (identity normalization), so
    there is no mean-correction block.  Returns y [B, N, Wx] raw with NO
    statistics (the consumer treats it as already normalized, like the
    reference feeds this conv's output straight into the DenseBlock)."""
    b, c, _, f_in_full = x_cm.shape
    n = w.shape[-1]
    f_out = f_in_full - 2
    pdt = jnp.float32 if precise else jnp.bfloat16
    xa, xb = enc0_slices(x_cm, t, f_out, tile_m, pdt)
    c = xa.shape[1]  # channels 8-padded by enc0_slices (zero weight rows)
    w = jnp.pad(w, ((0, 0), (0, 0), (0, c - w.shape[2]), (0, 0)))

    fp, _, _, _ = _flat_geometry(t, f_out, tile_m)
    q = 8 if precise else 16
    stride = _round_up(c, q)
    taps_a = tuple((dt - 1) * fp for dt in range(3))
    taps_b = tuple((dt - 1) * fp + d for dt in range(3) for d in (0, 1))

    w32 = w.astype(jnp.float32)
    blocks_a = [
        jnp.pad(w32[dt, 0].T, ((0, 0), (0, stride - c))) for dt in range(3)
    ]
    blocks_b = [
        jnp.pad(w32[dt, df].T, ((0, 0), (0, stride - c)))
        for dt in range(3)
        for df in (1, 2)
    ]
    w_main = jnp.concatenate(blocks_a + blocks_b, axis=1)   # [N, 9*stride]
    wb = jnp.broadcast_to(w_main, (b,) + w_main.shape).astype(pdt)

    ones = jnp.ones((b, 2 * c), jnp.float32)
    (y,) = stencil_layer_flat(
        (xa, xb), wb, bias, ones,
        t=t, f_out=f_out,
        taps=(taps_a, taps_b),
        mask_shifts=(),
        out_blocks=((n, f_out),),
        mask_f=f_out,
        tile_m=tile_m,
        fuse_elu=False,
        want_stats=False,
        precise=precise,
    )
    return y


def final_deconv_flat(
    x: jnp.ndarray,        # [B, C, Wx] raw flat, F=127 framing
    w: jnp.ndarray,        # [3, 3, C, N] (ConvTranspose2dTorch 'kernel')
    bias: jnp.ndarray,     # [N]
    scale: jnp.ndarray,    # f32 [B, C] 1/sigma of the input
    mean: jnp.ndarray,     # f32 [B, C]
    *,
    t: int,
    f: int,
    tile_m: int,
    precise: bool = False,
):
    """The decoder's final 3x3 stride-(1,1) ConvTranspose (torch geometry,
    F -> F+2 bins, bare — reference last_Deconv2d_, model.py:418-423),
    fused with the input normalization, on the flat layout.

    As a conv: out[t', fo] = sum wf[dt, df] xn[t'+dt-1, fo+df-2] with
    wf = flip(w) — taps at lane shifts (dt-1)*fp + (df-2).  The df=0 tap
    crosses the frequency gap into the previous row's real data at fo<2,
    so taps are gated to the valid output range [2-df, F+2-df) and the
    mean correction uses output-relative masks.  The kernel emits output
    bins 0..fp-1 (all fp columns of the F framing are VALID outputs here)
    as y [B, N, Wx]; bin fp depends on input bin F-1 only and is computed
    by :func:`final_bin128` as a tiny XLA einsum."""
    b, c, _ = x.shape
    n = w.shape[-1]
    fp, m_out, _, _ = _flat_geometry(t, f, tile_m)
    assert fp == f + 1, (fp, f)
    n_pad = _round_up(n, MASK_ROWS)
    q = 8 if precise else 16
    stride = _round_up(c, q)
    pdt = jnp.float32 if precise else jnp.bfloat16

    taps = tuple(
        (dt - 1) * fp + (df - 2) for dt in range(3) for df in range(3)
    )
    gates = tuple(
        (2 - df if df < 2 else 0, f if df == 2 else fp)
        for dt in range(3)
        for df in range(3)
    )
    omask = tuple(
        (dt - 1, lo, hi)
        for dt in range(3)
        for (lo, hi) in [gates[3 * dt], gates[3 * dt + 1], gates[3 * dt + 2]]
    )

    w32 = w.astype(jnp.float32)

    def wf(dt, df):  # flipped kernel, rows padded to n_pad
        blk = w32[2 - dt, 2 - df].T                     # [N, C]
        blk = jnp.pad(blk, ((0, n_pad - n), (0, stride - c)))
        return blk

    w_main = jnp.concatenate(
        [wf(dt, df) for dt in range(3) for df in range(3)], axis=1
    )
    w_main = jnp.broadcast_to(w_main, (b,) + w_main.shape)

    mu_sc = (mean * scale).astype(jnp.float32)
    beta = jnp.stack(
        [-jnp.einsum("cn,bc->bn", w32[2 - dt, 2 - df], mu_sc)
         for dt in range(3) for df in range(3)], axis=2,
    )  # [B, N, 9]
    beta = jnp.pad(beta, ((0, 0), (0, n_pad - n), (0, 0)))
    beta = jnp.repeat(beta, MASK_ROWS, axis=2) / MASK_ROWS
    beta = beta.reshape(b, n_pad, 9, MASK_ROWS)
    beta = jnp.pad(beta, ((0, 0), (0, 0), (0, 0), (0, 16 - MASK_ROWS)))
    wb = jnp.concatenate(
        [w_main, beta.reshape(b, n_pad, 144)], axis=2
    ).astype(pdt)

    bias_pad = jnp.pad(bias.astype(jnp.float32), (0, n_pad - n))
    (y,) = stencil_layer_flat(
        (x,), wb, bias_pad, scale,
        t=t, f_out=f,
        taps=(taps,),
        mask_shifts=(),
        out_blocks=((n_pad, fp),),
        mask_f=127,
        tile_m=tile_m,
        fuse_elu=False,
        want_stats=False,
        precise=precise,
        tap_gates=(gates,),
        omask_taps=omask,
    )
    return y[:, :n]


def final_bin128(x, w, bias, scale, mean, *, t, f, tile_m):
    """The final transpose conv's last output bin (index fp = F+1): it
    depends on input bin F-1 only — out[t', fp] = sum_dt
    wf[dt, 0] . xn[t'+dt-1, F-1] + bias.  Plain XLA (tiny strided gather
    + einsum), returns [B, N, T]."""
    fp, m_out, _, _ = _flat_geometry(t, f, tile_m)
    w32 = w.astype(jnp.float32)
    x126 = x[:, :, tile_m + f - 1 : tile_m + m_out : fp].astype(jnp.float32)
    xn126 = (x126 - mean[:, :, None]) * scale[:, :, None]     # [B, C, T]
    xp = jnp.pad(xn126, ((0, 0), (0, 0), (1, 1)))
    return sum(
        jnp.einsum("cn,bct->bnt", w32[2 - dt, 2], xp[:, :, dt : dt + t])
        for dt in range(3)
    ) + bias.astype(jnp.float32)[None, :, None]


def interleave_up(
    y: jnp.ndarray,        # [B, 2N, Wx] phase-major from deconv_up_flat
    sums: jnp.ndarray,
    sqs: jnp.ndarray,
    t: int,
    f_in: int,
    tile_in: int,
    tile_out: int,
):
    """Merge deconv phases into the doubled framing (fp_out = 2*fp_in,
    F_out = 2*F_in + 1) and combine the per-phase stats.  Returns
    (y_flat [B, N, Wx'], scale [B, N], mean [B, N])."""
    from misonet_tpu.ops.pallas.dense_flat import stats_to_scale_mean

    b, n2, _ = y.shape
    n = n2 // 2
    fp, m_out, _, _ = _flat_geometry(t, f_in, tile_in)
    f_out = 2 * f_in + 1
    fp2, m2, _, xw2 = _flat_geometry(t, f_out, tile_out)
    assert fp2 == 2 * fp, (fp2, fp)
    v = y[:, :, tile_in : tile_in + m_out].reshape(b, 2, n, t, fp)
    v = v.transpose(0, 2, 3, 4, 1).reshape(b, n, t * fp2)
    out = jnp.pad(v, [(0, 0), (0, 0), (tile_out, xw2 - tile_out - m2)])

    su = sums[:, :n, 0] + sums[:, n:, 0]
    sq = sqs[:, :n, 0] + sqs[:, n:, 0]
    sc, mn = stats_to_scale_mean(su[..., None], sq[..., None], t * f_out)
    return out, sc, mn
