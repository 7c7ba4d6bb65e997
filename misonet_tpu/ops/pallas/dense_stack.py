"""Input-grouped ("stacked") DenseBlock layer kernel: the wide-N
restructuring of ``dense_layer_flat`` that breaks the N/128 MXU cap.

The per-layer kernel (ops/pallas/dense_flat.py) computes one DenseBlock
layer per call with N = 24-32 output channels; on the 128-wide MXU the
transposed matmul ``w[N, K] @ p[K, M]`` caps utilization at N/128 ~ 19-25%,
and the measured forward sits exactly there (PERF.md r3: dense kernels are
15.0 of the 20.3 ms flat forward at ~23% MXU).

This kernel applies the same linearity restructuring the plain-XLA
DenseBlock uses (models/blocks.py, "input-grouped wide matmuls"): when a
source tensor becomes available, convolve it once with the *stacked*
kernels of every layer that consumes it.  Call s (s = 0..4) computes

    z_s = conv3x3(normalize(x_s), [W_s | W_{s+1} | ... | W_4][src slice])

with N_s = sum of the consuming layers' widths (120, 96, 72, 48, 24 for
the encoder blocks — average MXU occupancy ~69% instead of 19%), then

    * finalizes layer s:  y_s = mask * ELU(z_s[:w_s] + acc[:w_s] + b_s),
      plus fused per-(batch, channel) sum/sumsq (the IN statistics);
    * forwards the partial pre-activations of layers s+1..4:
      acc_out = z_s[w_s:] + acc[w_s:].

The accumulator rides HBM between calls in bf16 (f32 under ``precise``);
each partial suffers at most 4 roundings, the same accumulation precision
class as the bf16 XLA path.  Layout, framing, window DMA, and the raw+stats
bundle contract are identical to dense_flat.py.

Second change vs dense_flat: the mean-correction mask block shrinks from
9 taps x 16 rows (144 K-rows) to ONE 16-row block of 9 indicator fields.
For a 3x3 SAME stencil the per-tap validity decomposes as
``mask_j = 1 - invT_dt - invF_df + invT_dt*invF_df`` with only the edge
rows/columns active, so

    sum_j beta_j mask_j = (sum_j beta_j) * 1
                        - sum_dt (sum_df beta) * [t == edge_dt]
                        - sum_df (sum_dt beta) * [f == edge_df]
                        + sum_jj beta_j * [corner]

— nine fields (ones, 2 time edges, 2 freq edges, 4 corners) built from a
single iota, with the per-layer beta coefficients regrouped to match.

Reference semantics unchanged (model.py:437-482: five conv3x3+ELU+IN
layers over the DenseNet concatenation); tests/test_dense_stack.py checks
parity against the plain DenseBlock module and dense_layer_flat.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from misonet_tpu.ops.pallas.conv_flat import _flat_geometry, slack_for
from misonet_tpu.ops.pallas.dense_flat import MASK_ROWS, _round_up, tap_pieces

K_MASK = 16  # one 16-row block of indicator fields (9 used, 7 zero)

# int8 decode path (inference-only, PERF.md roadmap #2): activations are
# IN-normalized (unit variance) so a STATIC power-of-two scale suffices —
# q = round(x * 16) clips at +-7.94 sigma, and the indicator fields (0/1)
# quantize exactly to 16.  Weights take a per-output-row maxabs scale.
# Measured on v5e (scripts/probe_int8.py): int8 x int8 -> int32 beats
# bf16 by 1.39-1.73x at the stacked shapes (N=24..144, K=224..448).
QS = 16.0


def pack_plan(widths, q):
    """Patch-row layout: the (tensor, tap) pieces in order, greedily packed
    into store groups whose offsets and heights are q-aligned (q = 16 for
    bf16 stores, 8 for f32).  Pieces are concatenated in-register before
    the store, so 24-channel tensors no longer pay the 24 -> 32 per-tap
    stride padding (a 25% K overhead); q-aligned widths degenerate to one
    piece per group.  Returns (groups, k_data) with groups =
    ((offset, ((ti, j), ...), pad_rows), ...)."""
    groups = []
    cur, cur_rows, off = [], 0, 0
    for ti, w in enumerate(widths):
        for j in range(9):
            cur.append((ti, j))
            cur_rows += w
            if cur_rows % q == 0:
                groups.append((off, tuple(cur), 0))
                off += cur_rows
                cur, cur_rows = [], 0
    if cur:
        pad = -cur_rows % q
        groups.append((off, tuple(cur), pad))
        off += cur_rows + pad
    return tuple(groups), off


def _kernel(widths, plan, k_data, n_total, n_fin, n_m, tile_m, fp, f, m_out,
            t_frames, slack, have_acc, pdt, adt, qmode, *refs):
    nt = len(widths)
    n_rest = n_total - n_fin
    kmask = 32 if qmode else K_MASK
    x_hbms, rest = refs[:nt], refs[nt:]
    (scale_ref, w_ref, bias_ref), rest = rest[:3], rest[3:]
    if qmode:
        rs_ref, rest = rest[0], rest[1:]
    if have_acc:
        acc_in_ref, rest = rest[0], rest[1:]
    (y_ref, sum_ref, sq_ref), rest = rest[:3], rest[3:]
    if n_rest:
        acc_out_ref, rest = rest[0], rest[1:]
    scr = rest
    wins, scr = scr[:nt], scr[nt:]
    p_ref, s_sum, s_sq, sems = scr
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

    @pl.when((bb == 0) & (m == 0))
    def _():
        p_ref[:, :] = jnp.zeros_like(p_ref)

    @pl.when((m == 0) | (m == n_m + 1))
    def _():
        y_ref[0] = jnp.zeros_like(y_ref[0])
        if n_rest:
            acc_out_ref[0] = jnp.zeros_like(acc_out_ref[0])

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

        # --- mean-correction indicator fields, one 16-row K block --------
        # row r, output column c (fp is a power of two):
        #   r=0: 1   r=1: [t==0]   r=2: [t==T-1]   r=3: [f==0]  r=4: [f==F-1]
        #   r=5..8: the four corner products       r>=9: 0
        cols0 = (
            jax.lax.broadcasted_iota(jnp.int32, (kmask, tile_m), 1)
            + mm * tile_m
        )
        rows = jax.lax.broadcasted_iota(jnp.int32, (kmask, tile_m), 0)
        fcol = cols0 & (fp - 1)
        t0 = cols0 < fp
        tN = (cols0 >= (t_frames - 1) * fp) & (cols0 < m_out)
        f0 = fcol == 0
        fN = fcol == (f - 1)
        field = (
            (rows == 0)
            | ((rows == 1) & t0)
            | ((rows == 2) & tN)
            | ((rows == 3) & f0)
            | ((rows == 4) & fN)
            | ((rows == 5) & t0 & f0)
            | ((rows == 6) & t0 & fN)
            | ((rows == 7) & tN & f0)
            | ((rows == 8) & tN & fN)
        )
        if qmode:
            # 0/1 fields carry the patch scale QS=16 exactly in int8
            p_ref[k_data : k_data + kmask, :] = (
                field.astype(jnp.int32) * int(QS)
            ).astype(jnp.int8)
        else:
            p_ref[k_data : k_data + kmask, :] = field.astype(pdt)

        @pl.when(mm % 2 == 0)
        def _():
            for ti in range(nt):
                dma(ti, 0, mm).wait()

        @pl.when(mm % 2 == 1)
        def _():
            for ti in range(nt):
                dma(ti, 1, mm).wait()

        piece_cache = {}

        def pieces_of(ti):
            if ti not in piece_cache:
                off_c = sum(widths[:ti])
                win = wins[ti][mm % 2]
                ch = win[:, :].astype(jnp.float32) * scale_ref[
                    0, off_c : off_c + widths[ti], :
                ]
                if qmode:
                    # quantize ONCE per window (taps are lane shifts of
                    # the same window; integer-valued f32 rolls exactly,
                    # so per-tap stores reduce to a bare int8 convert)
                    ch = jnp.clip(jnp.round(ch * QS), -127.0, 127.0)
                piece_cache[ti] = dict(tap_pieces(ch, fp, tile_m, slack))
            return piece_cache[ti]

        for g_off, members, pad in plan:
            parts = [pieces_of(ti)[j] for ti, j in members]
            if pad:
                parts.append(jnp.zeros((pad, tile_m), jnp.float32))
            block = parts[0] if len(parts) == 1 else jnp.concatenate(
                parts, axis=0
            )
            p_ref[g_off : g_off + block.shape[0], :] = block.astype(
                jnp.int8 if qmode else pdt
            )
        if qmode:
            zi = jax.lax.dot_general(
                w_ref[0], p_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            # rs_ref carries (row_scale / QS): one multiply dequantizes
            z = zi.astype(jnp.float32) * rs_ref[0]
        else:
            z = jax.lax.dot_general(
                w_ref[0], p_ref[:, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        if have_acc:
            acc = acc_in_ref[0].astype(jnp.float32)
            z = z + acc
        zf = z[:n_fin, :] + bias_ref[:, :]
        # expm1 has no Mosaic lowering; exp(x)-1 is exact for x <= 0
        y = jnp.where(zf > 0, zf, jnp.exp(jnp.minimum(zf, 0.0)) - 1.0)
        # (T, F)-validity mask on the finalized rows
        vcols = (
            jax.lax.broadcasted_iota(jnp.int32, (MASK_ROWS, tile_m), 1)
            + mm * tile_m
        )
        vmask = (((vcols & (fp - 1)) < f) & (vcols < m_out)).astype(jnp.float32)
        mfull = jnp.concatenate([vmask] * (n_fin // MASK_ROWS), axis=0)
        y = y * mfull
        y_ref[0] = y.astype(y_ref.dtype)

        if n_rest:
            acc_out_ref[0] = z[n_fin:, :].astype(acc_out_ref.dtype)

        @pl.when(mm == 0)
        def _():
            s_sum[:, :] = jnp.zeros_like(s_sum)
            s_sq[:, :] = jnp.zeros_like(s_sq)

        s_sum[:, :] += jnp.sum(y, axis=1, keepdims=True)
        s_sq[:, :] += jnp.sum(y * y, axis=1, keepdims=True)

        @pl.when(mm == n_m - 1)
        def _():
            sum_ref[0] = s_sum[:, :]
            sq_ref[0] = s_sq[:, :]


def stack_wb(w_stack: jnp.ndarray, widths, plan,
             scale: jnp.ndarray, mean: jnp.ndarray, pdt) -> jnp.ndarray:
    """Combined per-batch weight matrix [B, N, K] for the stacked call:
    the (tensor, tap) conv weight blocks laid out per the patch pack_plan
    (zero rows at group padding) followed by the 16 mean-correction field
    columns."""
    c_tot, n = w_stack.shape[2], w_stack.shape[3]
    b = scale.shape[0]
    w9 = w_stack.reshape(9, c_tot, n)
    offs = [sum(widths[:ti]) for ti in range(len(widths))]
    blocks = []
    for _, members, pad in plan:
        for ti, j in members:
            blocks.append(w9[j, offs[ti] : offs[ti] + widths[ti], :])
        if pad:
            blocks.append(jnp.zeros((pad, n), w9.dtype))
    w_main = jnp.concatenate(blocks, axis=0).T          # [n, k_data]
    w_main = jnp.broadcast_to(w_main, (b,) + w_main.shape)

    mu_sc = (mean * scale).astype(jnp.float32)          # [B, C]
    beta = -jnp.einsum(
        "jcn,bc->bnj", w9.astype(jnp.float32), mu_sc
    ).reshape(b, n, 3, 3)
    cols = [
        beta.sum((2, 3)),
        -beta[:, :, 0, :].sum(-1),
        -beta[:, :, 2, :].sum(-1),
        -beta[:, :, :, 0].sum(-1),
        -beta[:, :, :, 2].sum(-1),
        beta[:, :, 0, 0],
        beta[:, :, 0, 2],
        beta[:, :, 2, 0],
        beta[:, :, 2, 2],
    ]
    k16 = jnp.stack(cols, axis=2)                       # [B, n, 9]
    k16 = jnp.pad(k16, ((0, 0), (0, 0), (0, K_MASK - 9)))
    return jnp.concatenate([w_main, k16], axis=2).astype(pdt)


@functools.partial(
    jax.jit,
    static_argnames=("t", "f", "n_fin", "tile_m", "precise", "quant"),
)
def dense_stack_flat(
    xs: tuple,            # source tensors [B, g_i, Wx], flat layout, raw
    acc_in,               # [B, N, Wx] partial pre-activations, or None
    w_stack: jnp.ndarray, # f32 [3, 3, sum(g_i), N] stacked consumer kernels
    bias: jnp.ndarray,    # f32 [n_fin] bias of the layer being finalized
    scale: jnp.ndarray,   # f32 [B, sum(g_i)] per-channel 1/sigma
    mean: jnp.ndarray,    # f32 [B, sum(g_i)] per-channel mean
    *,
    t: int,
    f: int,
    n_fin: int,
    tile_m: int = 2048,
    precise: bool = False,
    quant: bool = False,
):
    """One stacked DenseBlock call: convolve the newly available source
    tensor(s) with the stacked kernels of all consuming layers, finalize
    the first ``n_fin`` rows (+acc, +bias, ELU, mask, IN stats) and pass
    the rest through as updated partials.

    Returns (y [B, n_fin, Wx] pdt, sums, sqs [B, n_fin, 1] f32,
    acc_out [B, N - n_fin, Wx] or None)."""
    if not isinstance(xs, (tuple, list)):
        xs = (xs,)
    xs = tuple(xs)
    widths = [int(x.shape[1]) for x in xs]
    c_tot = sum(widths)
    b = xs[0].shape[0]
    n_total = w_stack.shape[-1]
    n_rest = n_total - n_fin
    fp, m_out, n_m, xw = _flat_geometry(t, f, tile_m)
    assert all(x.shape[2] == xw and x.shape[0] == b for x in xs)
    assert w_stack.shape[2] == c_tot, (w_stack.shape, c_tot)
    assert n_fin % MASK_ROWS == 0 and n_total % MASK_ROWS == 0, (n_fin, n_total)
    assert fp & (fp - 1) == 0, f"Fp={fp} must be a power of two (F={f})"
    assert acc_in is None or acc_in.shape == (b, n_total, xw), (
        None if acc_in is None else acc_in.shape, (b, n_total, xw))
    slack = slack_for(fp)
    assert slack <= tile_m and slack % 128 == 0, (slack, tile_m)
    pdt = jnp.float32 if precise else jnp.bfloat16
    adt = jnp.float32 if precise else jnp.bfloat16
    if quant:
        # int8 decode path: patch stores need (32, 128)-tile alignment,
        # and the 16 mean-correction rows pad to one 32-row block
        assert not precise, "quant=True is bf16-epilogue only"
        q, kmask, p_dt = 32, 32, jnp.int8
    else:
        q, kmask, p_dt = (8 if precise else 16), K_MASK, pdt
    plan, k_data = pack_plan(tuple(widths), q)
    k_total = k_data + kmask

    wb = stack_wb(w_stack, widths, plan, scale, mean,
                  jnp.float32 if quant else pdt)
    if quant:
        wb = jnp.pad(wb, ((0, 0), (0, 0), (0, kmask - K_MASK)))
        rs = jnp.maximum(
            jnp.max(jnp.abs(wb), axis=2, keepdims=True), 1e-20
        ) / 127.0
        wb = jnp.clip(jnp.round(wb / rs), -127.0, 127.0).astype(jnp.int8)
        rs_qs = (rs / QS).astype(jnp.float32)   # [B, N, 1] dequant factor
    scale3 = scale[:, :, None]
    bias2 = bias.reshape(n_fin, 1).astype(jnp.float32)

    have_acc = acc_in is not None
    kern = functools.partial(
        _kernel, tuple(widths), plan, k_data, n_total, n_fin, n_m,
        tile_m, fp, f, m_out, t, slack, have_acc, pdt, adt, quant,
    )
    out_shape = [
        jax.ShapeDtypeStruct((b, n_fin, xw), pdt),
        jax.ShapeDtypeStruct((b, n_fin, 1), jnp.float32),
        jax.ShapeDtypeStruct((b, n_fin, 1), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, n_fin, tile_m), lambda bb, m: (bb, 0, m),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_fin, 1), lambda bb, m: (bb, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_fin, 1), lambda bb, m: (bb, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if n_rest:
        out_shape.append(jax.ShapeDtypeStruct((b, n_rest, xw), adt))
        out_specs.append(
            pl.BlockSpec((1, n_rest, tile_m), lambda bb, m: (bb, 0, m),
                         memory_space=pltpu.VMEM)
        )
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * len(xs) + [
        pl.BlockSpec((1, c_tot, 1), lambda bb, m: (bb, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_total, k_total), lambda bb, m: (bb, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_fin, 1), lambda bb, m: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = list(xs) + [scale3, wb, bias2]
    if quant:
        in_specs.append(
            pl.BlockSpec((1, n_total, 1), lambda bb, m: (bb, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        operands.append(rs_qs)
    if have_acc:
        in_specs.append(
            pl.BlockSpec((1, n_total, tile_m), lambda bb, m: (bb, 0, m),
                         memory_space=pltpu.VMEM)
        )
        operands.append(acc_in)
    w_win = tile_m + 2 * slack
    scratch = [
        pltpu.VMEM((2, width, w_win), x.dtype)
        for width, x in zip(widths, xs)
    ] + [
        pltpu.VMEM((k_total, tile_m), p_dt),
        pltpu.VMEM((n_fin, 1), jnp.float32),
        pltpu.VMEM((n_fin, 1), jnp.float32),
        pltpu.SemaphoreType.DMA((len(xs), 2)),
    ]

    out = pl.pallas_call(
        kern,
        grid=(b, n_m + 2),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(*operands)
    if n_rest:
        return out[0], out[1], out[2], out[3]
    return out[0], out[1], out[2], None


# ---------------------------------------------------------------------------
# Autodiff: custom VJP over the fused Pallas backward (stencil_bwd.py):
# ELU/stats cotangents are folded algebraically from the saved raw output,
# then one fused kernel computes dgrad/wgrad/reductions entirely in the
# flat layout — no NHWC materialization anywhere in the backward.  The
# pure-JAX linear twin below is kept as the numerical oracle for tests.
# ---------------------------------------------------------------------------


def _stack_linear(t, f, tile_m, n_fin, precise, xs, acc_in, w_stack, bias,
                  scale, mean):
    """(z_fin [B, n_fin, Wx] f32, acc_out [B, N-n_fin, Wx]) of the stacked
    call as plain XLA ops in the flat framing."""
    from misonet_tpu.ops.pallas.flat_grad import _conv_dtype
    from misonet_tpu.ops.pallas.conv_flat import flatten_tf, unflatten_tf

    cdt = _conv_dtype(precise)
    adt = jnp.float32 if precise else jnp.bfloat16
    xcat = jnp.concatenate([x.astype(jnp.float32) for x in xs], axis=1)
    xn = (xcat - mean[:, :, None]) * scale[:, :, None]
    x_nhwc = unflatten_tf(xn, t, f, tile_m)
    z = jax.lax.conv_general_dilated(
        x_nhwc.astype(cdt),
        w_stack.astype(cdt),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # bias is added in NHWC, before flatten_tf: the flatten's VJP *slices*,
    # so gap/pad-column cotangents (which carry the spurious constant
    # stats term) are dropped before they can reach the bias gradient
    z32 = z.astype(jnp.float32)
    z_fin = flatten_tf(z32[..., :n_fin] + bias.astype(jnp.float32), tile_m)
    acc_out = flatten_tf(z32[..., n_fin:], tile_m)
    if acc_in is not None:
        acc32 = acc_in.astype(jnp.float32)
        z_fin = z_fin + acc32[:, :n_fin]
        acc_out = acc_out + acc32[:, n_fin:]
    return z_fin, acc_out.astype(adt)


def _stack_bwd(t, f, tile_m, n_fin, precise, have_acc, res, cts):
    """Fused backward of one stacked call via stencil_bwd_flat."""
    from misonet_tpu.ops.pallas.dense_flat import mask_field
    from misonet_tpu.ops.pallas.stencil_bwd import (
        pack_scale,
        pack_wt,
        stencil_bwd_flat,
        unpack_rows,
    )

    args, y = res
    if have_acc:
        xs, acc_in, w_stack, bias, scale, mean = args
    else:
        xs, w_stack, bias, scale, mean = args
    ybar, sbar, qbar = cts[:3]
    gacc = cts[3] if len(cts) == 4 else None

    pdt = jnp.float32 if precise else jnp.bfloat16
    q = 8 if precise else 16
    fp, _, _, _ = _flat_geometry(t, f, tile_m)
    widths = tuple(int(x.shape[1]) for x in xs)
    c_tot = sum(widths)
    n_total = w_stack.shape[-1]

    # fold ELU + fused-statistics cotangents from the saved raw output;
    # mask to valid positions (sbar is a constant over gap/pad columns)
    y32 = y.astype(jnp.float32)
    g_y = ybar.astype(jnp.float32) + sbar + 2.0 * y32 * qbar
    g_z = g_y * jnp.where(y32 > 0, 1.0, y32 + 1.0)
    mask_row = jnp.asarray(mask_field(t, f, tile_m)[0])
    g_fin = (g_z * mask_row).astype(pdt)
    gs = (g_fin, gacc) if gacc is not None else (g_fin,)
    g_blocks = (((n_fin, f),),) + (
        (((n_total - n_fin, f),),) if gacc is not None else ()
    )

    # static tap tables: 9 transposed taps on the cotangent, 9 source
    # taps + 9 shifted-validity fields (fwd taps s_j = (dt-1)*fp + (df-1))
    shifts = tuple(
        (dt - 1) * fp + (df - 1) for dt in range(3) for df in range(3)
    )
    dtaps = tuple((s, None) for s in shifts)
    wtaps = tuple((i, s, None) for s in shifts for i in range(len(xs)))
    fields = tuple(("shift", s, f) for s in shifts)

    c_pads = tuple(_round_up(c, 8) for c in widths)
    x_offs = tuple(sum(c_pads[:i]) for i in range(len(xs)))
    dr = sum(c_pads)
    dr_pad = _round_up(dr, q)
    w9 = w_stack.astype(jnp.float32).reshape(9, c_tot, n_total)
    coffs = tuple(sum(widths[:i]) for i in range(len(xs)))
    wt = pack_wt(
        [
            [
                (x_offs[i], w9[8 - k, coffs[i] : coffs[i] + widths[i], :])
                for i in range(len(xs))
            ]
            for k in range(9)
        ],
        dr, dr_pad, n_total, pdt,
    )
    scales = [scale[:, co : co + w] for co, w in zip(coffs, widths)]
    means = [mean[:, co : co + w] for co, w in zip(coffs, widths)]
    scale_pack = pack_scale(scales, c_pads)

    dxs, sdxn, sdxx, dw, fr, dacc = stencil_bwd_flat(
        gs, xs, wt, scale_pack,
        t=t, f_ref=f, tile_m=tile_m,
        g_blocks=g_blocks,
        x_mask_fs=(f,) * len(xs),
        dtaps=dtaps, wtaps=wtaps, fields=fields,
        precise=precise, want_dacc=have_acc,
    )

    # dW[j, c, n] = A_j[c, n] - sum_b (scale*mean)[b, c] * M_j[b, n]
    # (scale*x folded into A inside the kernel)
    musc = (mean * scale).astype(jnp.float32)            # [B, C_tot]
    a_rows = []
    row = 0
    for j in range(9):
        blocks = []
        for i in range(len(xs)):
            blocks.append(dw[row : row + widths[i], :])
            row += widths[i]
        a_rows.append(jnp.concatenate(blocks, axis=0))   # [C_tot, NT]
    a9 = jnp.stack(a_rows, axis=0)                       # [9, C_tot, NT]
    meanterm = jnp.einsum("bc,bjn->jcn", musc, fr[:, :9, :])
    dw_stack = (a9 - meanterm).reshape(3, 3, c_tot, n_total)
    dbias = fr[:, 4, :n_fin].sum(axis=0)                 # center field

    sdxn_u = unpack_rows(sdxn, widths, c_pads)
    sdxx_u = unpack_rows(sdxx, widths, c_pads)
    dscale = jnp.concatenate(
        [sx - mn * sn for sx, sn, mn in zip(sdxx_u, sdxn_u, means)], axis=1
    )
    dmean = -scale * jnp.concatenate(sdxn_u, axis=1)

    if have_acc:
        return tuple(dxs), dacc, dw_stack, dbias, dscale, dmean
    return tuple(dxs), dw_stack, dbias, dscale, dmean


@functools.lru_cache(maxsize=None)
def _stack_ad(t, f, tile_m, n_fin, precise, have_acc):
    def kernel_fn(*args):
        if have_acc:
            xs, acc_in, w_stack, bias, scale, mean = args
        else:
            xs, w_stack, bias, scale, mean = args
            acc_in = None
        y, s, q, acc_out = dense_stack_flat(
            xs, acc_in, w_stack, bias, scale, mean,
            t=t, f=f, n_fin=n_fin, tile_m=tile_m, precise=precise,
        )
        if acc_out is None:
            return y, s, q
        return y, s, q, acc_out

    @jax.custom_vjp
    def fn(*args):
        return kernel_fn(*args)

    def fwd(*args):
        out = kernel_fn(*args)
        return out, (args, out[0])

    bwd = functools.partial(_stack_bwd, t, f, tile_m, n_fin, precise,
                            have_acc)

    fn.defvjp(fwd, bwd)
    return fn


def dense_stack_flat_ad(xs, acc_in, w_stack, bias, scale, mean, *, t, f,
                        n_fin, tile_m=2048, precise=False, quant=False):
    """Differentiable dense_stack_flat.  Returns (y, sums, sqs, acc_out)
    with acc_out None on the last call.  ``quant=True`` takes the int8
    inference path (no VJP — decode only)."""
    if not isinstance(xs, (tuple, list)):
        xs = (xs,)
    if quant:
        return dense_stack_flat(
            tuple(xs), acc_in, w_stack, bias, scale, mean,
            t=t, f=f, n_fin=n_fin, tile_m=tile_m, precise=precise,
            quant=True,
        )
    have_acc = acc_in is not None
    fn = _stack_ad(t, f, tile_m, n_fin, precise, have_acc)
    args = (tuple(xs), acc_in, w_stack, bias, scale, mean) if have_acc else (
        tuple(xs), w_stack, bias, scale, mean)
    out = fn(*args)
    if len(out) == 3:
        return out[0], out[1], out[2], None
    return out


def dense_block_stacked(tensors, scales, means, kernels, biases, *, t, f,
                        tile_m, precise=False, quant=False):
    """Full 5-layer DenseBlock via stacked calls.

    tensors: tuple of raw flat source tensors (the block input bundle);
    kernels[i] [3, 3, init_ch + i*g1, w_i], biases[i] [w_i].  Returns the
    5th layer's (y_raw, sums, sqs) — the flat-bundle contract.
    """
    init_ch = sum(x.shape[1] for x in tensors)
    widths = [k.shape[-1] for k in kernels]
    acc = None
    src = tuple(tensors)
    src_scale, src_mean = scales, means
    off = 0  # channel offset of the current source inside layer inputs
    for s in range(5):
        cw = sum(x.shape[1] for x in src)
        w_stack = jnp.concatenate(
            [kernels[i][:, :, off : off + cw, :] for i in range(s, 5)],
            axis=-1,
        )
        y, su, sq, acc = dense_stack_flat_ad(
            src, acc, w_stack, biases[s], src_scale, src_mean,
            t=t, f=f, n_fin=widths[s], tile_m=tile_m, precise=precise,
            quant=quant,
        )
        if s == 4:
            return y, su, sq
        from misonet_tpu.ops.pallas.dense_flat import stats_to_scale_mean

        sc, mn = stats_to_scale_mean(su, sq, t * f)
        # source s+1 (= y_s) sits at channel offset init_ch + s*g1 inside
        # the consuming layers' concatenated inputs
        off = init_ch + s * widths[0]
        src = (y,)
        src_scale, src_mean = sc, mn
