"""Fused Pallas backward for the flat-layout stencil ops: dgrad + wgrad +
all per-channel reductions in ONE pass over the cotangents, entirely in the
lane-flattened layout.

Round-3 measurement (PERF.md): the custom-VJP backward built from pure-JAX
"linear twins" loses end-to-end — the twins re-materialize NHWC on every
call (~30 ms of layout glue per train step), so training fell back to the
plain XLA path at 1/5 of the fused forward's throughput.  This kernel is
the real backward: it differentiates the fused forward's linear map

    z[n, m] = sum_{c, j} W[j, c, n] * xn_eff[c, m + s_j]
    xn_eff[c, p] = valid(p) * (x[c, p] - mean[c]) * scale[c]

directly on the flat framing (position columns on lanes, channels on
sublanes — see ops/pallas/conv_flat.py), given the already-folded output
cotangent g (ELU/statistics cotangents are folded algebraically outside,
exactly as before).  Writing G[c, p] = sum_{n, j} W[j, c, n] g[n, p - s_j]
(the cotangent of xn_eff), everything the VJP needs is:

  * **dgrad**   dx[c, p]  = valid(p) * scale[c] * G[c, p]
                — a stencil over the cotangents with *transposed* taps:
                per tap one matmul Wt_k [C, NT] @ g_piece [NT, TM] with
                NT = the stacked cotangent rows (up to ~192), the same
                window-DMA/lane-rotation machinery as the forward;
  * **wgrad**   dW[j,c,n] = scale[c]*(A_j[c,n] - mean[c]*M_j[n]) with
                A_j = sum_m (scale*x)[c, m+s_j] * g[n, m]
                — the forward's im2col patch (all taps stacked on
                sublanes, K up to ~1200 rows) contracted against the
                centered cotangent in ONE tall matmul per tile,
                accumulated in VMEM across the whole grid;
  * **fields**  M_j[n] = sum_m field_j(m) * g[n, m] for the static
                validity fields (mean-correction term of dW, and the bias
                gradient = the center field rows) — one tiny matmul;
  * **dscale/dmean**  from sum_m G and sum_m G*x accumulated per
                (batch, channel) in the epilogue (VPU work while the MXU
                is busy): dmean = -scale * S_G, dscale = S_Gx - mean*S_G.

Cotangent validity: g is masked in-kernel to the op's valid output
positions (per-row-block (rows, f_valid) spec) — the downstream fold adds
the per-channel statistics cotangent everywhere including gap/pad columns,
which the linear twins dropped via slicing and we drop via the mask.

The op-specific wrappers (dense_stack.py, flat_grad.py) reduce each fused
forward — DenseBlock layers, strided trunk convs, frequency-up deconvs,
enc0, the final transpose conv — to this kernel via static tap tables, the
same generalization axis as the forward's stencil_layer_flat.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from misonet_tpu.ops.pallas.conv_flat import _flat_geometry, slack_for
from misonet_tpu.ops.pallas.dense_flat import _round_up


def _piece_getter(src, tile_m, slack):
    """Shared-rotation piece extractor for window ``src``: pieces at lane
    shifts with equal (slack + s) % 128 share ONE pltpu.roll (the
    forward's tap_pieces trick — at fp % 128 == 0 all 9 stencil taps need
    only 3 rotations).  get(s)[i] = src[i + slack + s]."""
    w_win = src.shape[-1]
    cache = {}

    def get(s):
        off = slack + s
        r = off % 128
        if r not in cache:
            cache[r] = src if r == 0 else pltpu.roll(src, w_win - r, 1)
        q = off - r
        return cache[r][:, q : q + tile_m]

    return get


def _kernel(g_rows, g_blocks, x_rows, x_offs, x_mask_fs, dtaps, wtaps,
            fields, dr, dr_pad, mf_pad, nt, n_m, tile_m, fp, m_out, slack,
            pdt, want_dacc, *refs):
    L, I = len(g_rows), len(x_rows)
    g_hbms, rest = refs[:L], refs[L:]
    x_hbms, rest = rest[:I], rest[I:]
    (wt_ref, scale_ref), rest = rest[:2], rest[2:]
    dx_refs, rest = rest[:I], rest[I:]
    (sdxn_ref, sdxx_ref, dw_ref, fr_ref), rest = rest[:4], rest[4:]
    if want_dacc:
        dacc_ref, rest = rest[0], rest[1:]
    g_wins, rest = rest[:L], rest[L:]
    x_wins, rest = rest[:I], rest[I:]
    sems = rest[0]
    w_win = tile_m + 2 * slack
    n_ten = L + I

    bb = pl.program_id(0)
    m = pl.program_id(1)          # 0 and n_m+1 are pad blocks
    mm = m - 1

    def dma(k, slot, tile):
        hbm = g_hbms[k] if k < L else x_hbms[k - L]
        win = g_wins[k] if k < L else x_wins[k - L]
        return pltpu.make_async_copy(
            hbm.at[bb, :, pl.ds(tile * tile_m + tile_m - slack, w_win)],
            win.at[slot],
            sems.at[k, slot],
        )

    @pl.when((m == 0) | (m == n_m + 1))
    def _():
        for r in dx_refs:
            r[0] = jnp.zeros_like(r[0])
        if want_dacc:
            dacc_ref[0] = jnp.zeros_like(dacc_ref[0])

    @pl.when((bb == 0) & (m == 0))
    def _():
        dw_ref[:, :] = jnp.zeros_like(dw_ref)

    @pl.when(m == 0)
    def _():
        sdxn_ref[0] = jnp.zeros_like(sdxn_ref[0])
        sdxx_ref[0] = jnp.zeros_like(sdxx_ref[0])
        fr_ref[0] = jnp.zeros_like(fr_ref[0])

    @pl.when((m > 0) & (m <= n_m))
    def _():
        # double-buffered window DMAs, slot = tile parity
        @pl.when(mm == 0)
        def _():
            for k in range(n_ten):
                dma(k, 0, 0).start()

        nxt = mm + 1

        @pl.when((nxt < n_m) & (nxt % 2 == 0))
        def _():
            for k in range(n_ten):
                dma(k, 0, nxt).start()

        @pl.when((nxt < n_m) & (nxt % 2 == 1))
        def _():
            for k in range(n_ten):
                dma(k, 1, nxt).start()

        @pl.when(mm % 2 == 0)
        def _():
            for k in range(n_ten):
                dma(k, 0, mm).wait()

        @pl.when(mm % 2 == 1)
        def _():
            for k in range(n_ten):
                dma(k, 1, mm).wait()

        slot = mm % 2

        # ---- masked cotangent window: g_full [NT, w_win] ----------------
        # per-row-block output validity (the downstream fold adds the
        # per-channel stats cotangent on gap/pad columns — drop it here,
        # like the linear twins dropped it via slicing).  Kept f32:
        # tpu.dynamic_rotate (the tap shifts) is 32-bit only; pieces are
        # cast to the matmul dtype after the roll.
        g_parts = []
        for l in range(L):
            win = g_wins[l][slot]
            r0 = 0
            for rows, f_valid in g_blocks[l]:
                cols = (
                    jax.lax.broadcasted_iota(jnp.int32, (rows, w_win), 1)
                    + (mm * tile_m - slack)
                )
                ok = (
                    ((cols & (fp - 1)) < f_valid)
                    & (cols >= 0) & (cols < m_out)
                )
                g_parts.append(
                    jnp.where(ok, win[r0 : r0 + rows, :].astype(jnp.float32),
                              0.0)
                )
                r0 += rows
        g_full = (
            g_parts[0] if len(g_parts) == 1
            else jnp.concatenate(g_parts, axis=0)
        )
        g_piece = _piece_getter(g_full, tile_m, slack)
        g_center = g_piece(0).astype(pdt)

        # ---- dgrad: G = sum_k Wt_k @ g_piece(shift_k) --------------------
        acc = None
        for k, (shift, gate) in enumerate(dtaps):
            piece = g_piece(shift)
            if gate is not None:
                lo, hi = gate
                fcg = (
                    jax.lax.broadcasted_iota(jnp.int32, (nt, tile_m), 1)
                    + (mm * tile_m + shift)
                ) & (fp - 1)
                piece = piece * ((fcg >= lo) & (fcg < hi)).astype(piece.dtype)
            d = jax.lax.dot_general(
                wt_ref[k * dr_pad : k * dr_pad + dr, :], piece.astype(pdt),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d

        # ---- epilogue per source tensor: dx + reduction rows -------------
        scaled_wins = {}
        for i in range(I):
            c = x_rows[i]
            off = x_offs[i]
            colsb = (
                jax.lax.broadcasted_iota(jnp.int32, (c, tile_m), 1)
                + mm * tile_m
            )
            mask_i = (
                ((colsb & (fp - 1)) < x_mask_fs[i]) & (colsb < m_out)
            ).astype(jnp.float32)
            dxn = acc[off : off + c, :] * mask_i
            sc = scale_ref[0, off : off + c, :]
            dx_refs[i][0] = (dxn * sc).astype(dx_refs[i].dtype)
            x_center = (
                x_wins[i][slot][:, slack : slack + tile_m]
            ).astype(jnp.float32)
            sdxn_ref[0, off : off + c, :] += jnp.sum(
                dxn, axis=1, keepdims=True
            )
            sdxx_ref[0, off : off + c, :] += jnp.sum(
                dxn * x_center, axis=1, keepdims=True
            )
            scaled_wins[i] = _piece_getter(
                x_wins[i][slot][:, :].astype(jnp.float32) * sc, tile_m, slack
            )

        # ---- wgrad: one tall patch matmul against the centered cotangent -
        parts = []
        for xi, shift, gate in wtaps:
            piece = scaled_wins[xi](shift)
            if gate is not None:
                lo, hi = gate
                fc0 = (
                    jax.lax.broadcasted_iota(
                        jnp.int32, (x_rows[xi], tile_m), 1
                    ) + mm * tile_m
                ) & (fp - 1)
                piece = piece * ((fc0 >= lo) & (fc0 < hi)).astype(piece.dtype)
            parts.append(piece.astype(pdt))
        patch = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
        dw_ref[:, :] += jax.lax.dot_general(
            patch, g_center, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        # ---- static validity fields (dW mean term + bias gradient) -------
        if fields:
            rows = jax.lax.broadcasted_iota(jnp.int32, (mf_pad, tile_m), 0)
            cols = (
                jax.lax.broadcasted_iota(jnp.int32, (mf_pad, tile_m), 1)
                + mm * tile_m
            )
            field = None
            for r, ent in enumerate(fields):
                if ent[0] == "shift":
                    _, s, mfv = ent
                    colr = cols + s
                    cond = (
                        (colr >= 0) & (colr < m_out)
                        & ((colr & (fp - 1)) < mfv)
                    )
                elif ent[0] == "omask":
                    _, rs, lo, hi = ent
                    colr = cols + rs * fp
                    fc0 = cols & (fp - 1)
                    cond = (
                        (fc0 >= lo) & (fc0 < hi)
                        & (colr >= 0) & (colr < m_out)
                    )
                else:  # "ones"
                    cond = cols < m_out
                term = (rows == r) & cond
                field = term if field is None else field | term
            fr_ref[0] += jax.lax.dot_general(
                field.astype(pdt), g_center, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        if want_dacc:
            dacc_ref[0] = g_center.astype(dacc_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "t", "f_ref", "tile_m", "g_blocks", "x_mask_fs", "dtaps", "wtaps",
        "fields", "precise", "want_dacc",
    ),
)
def stencil_bwd_flat(
    gs: tuple,            # cotangent tensors [B, n_l, Wx] (folded, any dtype)
    xs: tuple,            # raw source tensors [B, c_i, Wx]
    wt: jnp.ndarray,      # [len(dtaps) * DR_pad, NT] packed transposed taps
    scale: jnp.ndarray,   # f32 [B, DR] per-channel 1/sigma (padded layout)
    *,
    t: int,
    f_ref: int,           # framing reference F (fp = framing row width)
    tile_m: int,
    g_blocks: tuple,      # per g tensor: ((rows, f_valid), ...)
    x_mask_fs: tuple,     # per x tensor: valid F for dx masking
    dtaps: tuple,         # ((shift, gate|None), ...) on the cotangent
    wtaps: tuple,         # ((x_idx, shift, gate|None), ...) on the sources
    fields: tuple = (),   # ("shift", s, mask_f) | ("omask", rs, lo, hi) | ("ones",)
    precise: bool = False,
    want_dacc: bool = False,
):
    """One fused backward pass.  Returns

      (dxs, sdxn [B, DR, 1], sdxx [B, DR, 1], dw [KW, NT],
       fieldred [B, MF_pad, NT], dacc [B, NT, Wx] | None)

    with dxs the per-source ``scale * valid * G`` cotangents, ``dw`` the
    batch-summed raw patch products A (rows = wtaps order, ``scale*x``
    already folded in), ``fieldred`` the per-batch field reductions M, and
    ``dacc`` the row-concatenated masked cotangents (the pass-through
    accumulator gradient of the stacked DenseBlock calls)."""
    gs, xs = tuple(gs), tuple(xs)
    g_rows = tuple(int(g.shape[1]) for g in gs)
    x_rows = tuple(int(x.shape[1]) for x in xs)
    nt = sum(g_rows)
    b = gs[0].shape[0]
    fp, m_out, n_m, xw = _flat_geometry(t, f_ref, tile_m)
    assert fp & (fp - 1) == 0, fp
    slack = slack_for(fp)
    assert slack <= tile_m and slack % 128 == 0, (slack, tile_m)
    assert all(a.shape[0] == b and a.shape[2] == xw for a in gs + xs)
    assert all(abs(s) <= slack for s, _ in dtaps)
    assert all(abs(s) <= slack for _, s, _ in wtaps)
    assert tuple(sum(r for r, _ in blks) for blks in g_blocks) == g_rows

    pdt = jnp.float32 if precise else jnp.bfloat16
    q = 8 if precise else 16
    c_pads = tuple(_round_up(c, 8) for c in x_rows)
    x_offs = tuple(sum(c_pads[:i]) for i in range(len(xs)))
    dr = sum(c_pads)
    dr_pad = _round_up(dr, q)
    kw = sum(x_rows[xi] for xi, _, _ in wtaps)
    mf_pad = _round_up(max(len(fields), 1), 8)
    assert wt.shape == (len(dtaps) * dr_pad, nt), (
        wt.shape, (len(dtaps) * dr_pad, nt))
    assert scale.shape == (b, dr), (scale.shape, (b, dr))

    kern = functools.partial(
        _kernel, g_rows, g_blocks, x_rows, x_offs, x_mask_fs, dtaps,
        wtaps, fields, dr, dr_pad, mf_pad, nt, n_m, tile_m, fp, m_out,
        slack, pdt, want_dacc,
    )
    out_shape = [
        jax.ShapeDtypeStruct((b, c, xw), pdt) for c in x_rows
    ] + [
        jax.ShapeDtypeStruct((b, dr, 1), jnp.float32),
        jax.ShapeDtypeStruct((b, dr, 1), jnp.float32),
        jax.ShapeDtypeStruct((kw, nt), jnp.float32),
        jax.ShapeDtypeStruct((b, mf_pad, nt), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, c, tile_m), lambda bb, m: (bb, 0, m),
                     memory_space=pltpu.VMEM)
        for c in x_rows
    ] + [
        pl.BlockSpec((1, dr, 1), lambda bb, m: (bb, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dr, 1), lambda bb, m: (bb, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((kw, nt), lambda bb, m: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, mf_pad, nt), lambda bb, m: (bb, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if want_dacc:
        out_shape.append(jax.ShapeDtypeStruct((b, nt, xw), pdt))
        out_specs.append(
            pl.BlockSpec((1, nt, tile_m), lambda bb, m: (bb, 0, m),
                         memory_space=pltpu.VMEM)
        )
    w_win = tile_m + 2 * slack
    scratch = [
        pltpu.VMEM((2, g.shape[1], w_win), g.dtype) for g in gs
    ] + [
        pltpu.VMEM((2, x.shape[1], w_win), x.dtype) for x in xs
    ] + [pltpu.SemaphoreType.DMA((len(gs) + len(xs), 2))]

    scale3 = scale[:, :, None]
    out = pl.pallas_call(
        kern,
        grid=(b, n_m + 2),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (len(gs) + len(xs)) + [
            pl.BlockSpec((len(dtaps) * dr_pad, nt), lambda bb, m: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dr, 1), lambda bb, m: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
    )(*gs, *xs, wt, scale3)
    nx = len(xs)
    dxs = out[:nx]
    sdxn, sdxx, dw, fr = out[nx : nx + 4]
    dacc = out[nx + 4] if want_dacc else None
    return dxs, sdxn, sdxx, dw, fr, dacc


# ---------------------------------------------------------------------------
# Shared wrapper helpers
# ---------------------------------------------------------------------------


def pack_wt(blocks, dr, dr_pad, nt, pdt):
    """Pack per-dtap weight blocks into the [len(dtaps)*DR_pad, NT] operand.

    ``blocks[k]`` is a list of (row_off, w) pieces for dtap k, each w
    [c, NT] f32 placed at padded row offset row_off."""
    mats = []
    for pieces in blocks:
        m = jnp.zeros((dr_pad, nt), jnp.float32)
        for row_off, w in pieces:
            m = m.at[row_off : row_off + w.shape[0], :].set(w)
        mats.append(m)
    return jnp.concatenate(mats, axis=0).astype(pdt)


def pack_scale(scales, c_pads):
    """Per-tensor [B, c_i] scales -> padded [B, DR] layout."""
    parts = []
    for s, cp in zip(scales, c_pads):
        parts.append(jnp.pad(s, ((0, 0), (0, cp - s.shape[1]))))
    return jnp.concatenate(parts, axis=1).astype(jnp.float32)


def unpack_rows(arr, widths, c_pads):
    """[B, DR, 1] padded reduction rows -> per-tensor [B, c_i] slices."""
    out, off = [], 0
    for w, cp in zip(widths, c_pads):
        out.append(arr[:, off : off + w, 0])
        off += cp
    return out
