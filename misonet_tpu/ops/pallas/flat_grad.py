"""Autodiff for the fused flat-layout kernels (custom VJPs).

The Pallas kernels in ``dense_flat.py`` / ``stencil_flat.py`` fuse
conv + bias + ELU + InstanceNorm statistics into single passes on the
lane-flattened layout.  Pallas kernels have no automatic differentiation,
so each op gets a ``jax.custom_vjp``:

* **primal** — the Pallas kernel (unchanged, fast path);
* **backward** — exact, with *no forward recompute*: the kernel's raw
  output ``y`` is saved as a residual, the ELU derivative is recovered
  from it algebraically (``elu'(z) = 1`` where ``y > 0``, else
  ``y + 1 = e^z``), the fused-statistics cotangents fold in as
  ``dL/dy += s̄ + 2·y·q̄``, and what remains is the VJP of the *linear*
  map ``z = conv(normalize(x)) + bias`` — a pure-JAX twin whose forward
  XLA dead-code-eliminates under jit (only the normalized input survives,
  for the weight gradient).  Cost: one dgrad conv + one wgrad conv per
  layer, the same matmuls any conv backward needs.

This is what makes ``ModelConfig(flat_dense=...)`` trainable: the U-Net
body keeps the fused forward during training instead of being
inference-only.  Gradient parity vs the plain XLA modules and twin-vs-
kernel forward parity are covered by tests/test_flat_grad.py.

Gap/pad handling needs no explicit masks in the backward: the linear
twins emit the flat framing via pad/reshape, whose transpose *slices* —
cotangents on pad blocks and frequency-gap columns are dropped exactly
where the kernel writes constants.

Layout/semantics being differentiated (see the kernel docstrings):
  dense:   y = mask·ELU(conv3x3_SAME((x − mean)·scale) + bias)
  trunk:   y = mask·ELU(conv3x3 stride(1,2) freq-VALID(norm x) + bias)
  deconv:  y = mask·ELU(convT3x3 stride(1,2) torch-geom(norm x) + bias)
plus per-(batch, channel) sum / sumsq of y (the fused IN statistics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from misonet_tpu.ops.pallas.conv_flat import (
    _flat_geometry,
    flatten_tf,
    unflatten_tf,
)


def _elu(y):
    return jnp.where(y > 0, y, jnp.expm1(jnp.minimum(y, 0.0)))


def _stats(y_flat):
    """(sum, sumsq) [B, N, 1] over the flat width (gap columns are zero)."""
    s = y_flat.sum(-1)[..., None]
    q = (y_flat * y_flat).sum(-1)[..., None]
    return s, q


# ---------------------------------------------------------------------------
# Linear twins: z = conv(normalize(x)) + bias in the flat framing, pure JAX.
# Their VJP is the custom backward; their forward is DCE'd under jit.
# ---------------------------------------------------------------------------


def _conv_dtype(precise):
    """Conv-operand dtype of the linear twins.  The twins only exist for
    their VJP (dgrad/wgrad convs); matching the kernels' bf16 MXU compute
    keeps the custom backward at the same cost as the plain XLA path's
    backward instead of silently running 2x-slower fp32 matmuls."""
    return jnp.float32 if precise else jnp.bfloat16


def _dense_linear(t, f, tile_m, precise, xs, w, bias, scale, mean):
    """conv3x3 SAME over the normalized logical concat of xs -> z_flat."""
    cdt = _conv_dtype(precise)
    xcat = jnp.concatenate([x.astype(jnp.float32) for x in xs], axis=1)
    xn = (xcat - mean[:, :, None]) * scale[:, :, None]
    x_nhwc = unflatten_tf(xn, t, f, tile_m)  # drops gaps/pads -> [B,T,F,C]
    z = lax.conv_general_dilated(
        x_nhwc.astype(cdt),
        w.astype(cdt),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return flatten_tf(z.astype(jnp.float32) + bias.astype(jnp.float32),
                      tile_m)


def _conv_down_linear(t, f_in, tile_m, precise, x_even, x_odd, w, bias,
                      scale, mean):
    """Re-assemble the s2d frequency phases, normalize, stride-(1,2)
    freq-VALID trunk conv -> z_flat in the (t, f_out) framing."""
    cdt = _conv_dtype(precise)
    b, c, _ = x_even.shape
    f_out = (f_in - 3) // 2 + 1
    fph, m2, _, _ = _flat_geometry(t, f_out, tile_m)  # phase framing = fp/2
    ve = x_even[:, :, tile_m : tile_m + m2].reshape(b, c, t, fph)
    vo = x_odd[:, :, tile_m : tile_m + m2].reshape(b, c, t, fph)
    v = jnp.stack([ve, vo], axis=-1).reshape(b, c, t, 2 * fph)
    x_nhwc = v[:, :, :, :f_in].transpose(0, 2, 3, 1).astype(jnp.float32)
    xn = (x_nhwc - mean[:, None, None, :]) * scale[:, None, None, :]
    z = lax.conv_general_dilated(
        xn.astype(cdt),
        w.astype(cdt),
        window_strides=(1, 2),
        padding=((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return flatten_tf(z.astype(jnp.float32) + bias.astype(jnp.float32),
                      tile_m)


def _deconv_up_linear(t, f_in, tile_m, precise, x, w, bias, scale, mean):
    """Normalize, torch-geometry ConvTranspose (out F = 2·F_in + 1), emit
    phase-major rows [B, 2N, Wx] in the INPUT framing."""
    cdt = _conv_dtype(precise)
    b, c, _ = x.shape
    n = w.shape[-1]
    fp, m_out, _, xw = _flat_geometry(t, f_in, tile_m)
    assert fp == f_in + 1, (fp, f_in)
    v = x[:, :, tile_m : tile_m + m_out].reshape(b, c, t, fp)[:, :, :, :f_in]
    x_nhwc = v.transpose(0, 2, 3, 1).astype(jnp.float32)
    xn = (x_nhwc - mean[:, None, None, :]) * scale[:, None, None, :]
    # torch ConvTranspose2d(k=3, stride=(1,2), pad=(1,0)): lhs-dilated conv
    # with the spatially flipped kernel, pads (kh-1-pt, kw-1-pf) = (1, 2)
    z = lax.conv_general_dilated(
        xn.astype(cdt),
        jnp.flip(w.astype(cdt), (0, 1)),
        window_strides=(1, 1),
        padding=((1, 1), (2, 2)),
        lhs_dilation=(1, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    z = z.astype(jnp.float32) + bias.astype(jnp.float32)  # [B,T,2F+1,N]
    ze = z[:, :, 0::2, :]                  # even phase: F_in+1 == fp columns
    zo = z[:, :, 1::2, :]                  # odd phase: F_in columns

    def toflat(p):
        fcols = p.shape[2]
        p = jnp.pad(p, ((0, 0), (0, 0), (0, fp - fcols), (0, 0)))
        p = p.transpose(0, 3, 1, 2).reshape(b, n, t * fp)
        return jnp.pad(p, ((0, 0), (0, 0), (tile_m, xw - tile_m - t * fp)))

    return jnp.concatenate([toflat(ze), toflat(zo)], axis=1)  # [B, 2N, Wx]


# ---------------------------------------------------------------------------
# Full twins (forward-parity oracles for the kernels; used by tests and as
# the definition the backward differentiates)
# ---------------------------------------------------------------------------


def _twin(linear, fuse_elu, pdt, *args):
    z = linear(*args)
    y = _elu(z) if fuse_elu else z         # elu(0) = 0 keeps gaps zero
    s, q = _stats(y)
    return y.astype(pdt), s, q


def _dense_twin(t, f, tile_m, fuse_elu, pdt, xs, w, bias, scale, mean,
                precise=True):
    lin = functools.partial(_dense_linear, t, f, tile_m, precise)
    return _twin(lin, fuse_elu, pdt, xs, w, bias, scale, mean)


def _conv_down_twin(t, f_in, tile_m, fuse_elu, pdt,
                    x_even, x_odd, w, bias, scale, mean, precise=True):
    lin = functools.partial(_conv_down_linear, t, f_in, tile_m, precise)
    return _twin(lin, fuse_elu, pdt, x_even, x_odd, w, bias, scale, mean)


def _deconv_up_twin(t, f_in, tile_m, fuse_elu, pdt, x, w, bias, scale, mean,
                    precise=True):
    lin = functools.partial(_deconv_up_linear, t, f_in, tile_m, precise)
    return _twin(lin, fuse_elu, pdt, x, w, bias, scale, mean)


# ---------------------------------------------------------------------------
# custom_vjp assembly: fused Pallas backward (stencil_bwd.py) per op.
# (The per-layer dense kernel — dense_flat.dense_layer_flat — has no AD
# wrapper anymore: production dense blocks route through dense_stack.py,
# which carries its own fused backward.)
# ---------------------------------------------------------------------------


def _fold_cts(y, ybar, sbar, qbar, fuse_elu, pdt):
    """Fold ELU + fused-statistics cotangents from the saved raw output.
    The result is NOT masked — the fused backward kernel masks cotangents
    to the op's valid output positions in-kernel."""
    y32 = y.astype(jnp.float32)
    g_y = ybar.astype(jnp.float32) + sbar + 2.0 * y32 * qbar
    if fuse_elu:
        # elu'(z) = 1 for z > 0, e^z = y + 1 otherwise
        g_y = g_y * jnp.where(y32 > 0, 1.0, y32 + 1.0)
    return g_y.astype(pdt)


def _conv_down_bwd(t, f_in, tile_m, fuse_elu, precise, res, cts):
    """Fused backward of the strided trunk conv (stencil_bwd_flat).

    Forward taps on the s2d phases (stencil_flat.conv_down_flat): even
    phase at shifts (dt-1)*fp + {0, 1} with kernel df {0, 2}, odd at
    (dt-1)*fp with df=1; every freq tap of a freq-valid output reads real
    input, so the dW mean term gates on time validity only (3 fields)."""
    from misonet_tpu.ops.pallas.dense_flat import _round_up
    from misonet_tpu.ops.pallas.stencil_bwd import (
        pack_scale, pack_wt, stencil_bwd_flat, unpack_rows,
    )

    args, y = res
    x_even, x_odd, w, bias, scale, mean = args
    ybar, sbar, qbar = cts
    f_out = (f_in - 3) // 2 + 1
    fp, _, _, _ = _flat_geometry(t, f_out, tile_m)
    pdt = jnp.float32 if precise else jnp.bfloat16
    q = 8 if precise else 16
    c = x_even.shape[1]
    n = w.shape[-1]
    g = _fold_cts(y, ybar, sbar, qbar, fuse_elu, pdt)

    w32 = w.astype(jnp.float32)
    c_pad = _round_up(c, 8)
    dr_pad = _round_up(2 * c_pad, q)
    dtaps, blocks = [], []
    for dtp in range(3):
        dtaps.append(((dtp - 1) * fp, None))
        blocks.append([(0, w32[2 - dtp, 0]), (c_pad, w32[2 - dtp, 1])])
        dtaps.append(((dtp - 1) * fp - 1, None))
        blocks.append([(0, w32[2 - dtp, 2])])
    wt = pack_wt(blocks, 2 * c_pad, dr_pad, n, pdt)

    wtaps = []
    for dt in range(3):
        for df in range(3):
            if df == 1:
                wtaps.append((1, (dt - 1) * fp, None))
            else:
                wtaps.append((0, (dt - 1) * fp + (df // 2), None))
    fields = tuple(("shift", (dt - 1) * fp, f_out) for dt in range(3))

    dxs, sdxn, sdxx, dw, fr, _ = stencil_bwd_flat(
        (g,), (x_even, x_odd), wt,
        pack_scale([scale, scale], (c_pad, c_pad)),
        t=t, f_ref=f_out, tile_m=tile_m,
        g_blocks=(((n, f_out),),),
        x_mask_fs=((f_in + 1) // 2, f_in // 2),
        dtaps=tuple(dtaps), wtaps=tuple(wtaps), fields=fields,
        precise=precise,
    )
    musc = (mean * scale).astype(jnp.float32)
    rows, row = [], 0
    for dt in range(3):
        mterm = jnp.einsum("bc,bn->cn", musc, fr[:, dt, :])
        per_df = []
        for df in range(3):
            per_df.append(dw[row : row + c, :] - mterm)
            row += c
        rows.append(jnp.stack(per_df, axis=0))
    dw_full = jnp.stack(rows, axis=0)                     # [3, 3, C, N]
    dbias = fr[:, 1, :].sum(axis=0)                       # dt=1 field
    sdxn_u = unpack_rows(sdxn, (c, c), (c_pad, c_pad))
    sdxx_u = unpack_rows(sdxx, (c, c), (c_pad, c_pad))
    dscale = (sdxx_u[0] - mean * sdxn_u[0]) + (sdxx_u[1] - mean * sdxn_u[1])
    dmean = -scale * (sdxn_u[0] + sdxn_u[1])
    return dxs[0], dxs[1], dw_full, dbias, dscale, dmean


def _deconv_up_bwd(t, f_in, tile_m, fuse_elu, precise, res, cts):
    """Fused backward of the frequency-up transpose conv.

    Forward (stencil_flat.deconv_up_flat) emits phase-major rows [2N] in
    the input framing: even block reads x at (dtp-1)*fp + {-1, 0} with
    kernels w[2-dtp, {2, 0}], odd at (dtp-1)*fp with w[2-dtp, 1]."""
    from misonet_tpu.ops.pallas.dense_flat import _round_up
    from misonet_tpu.ops.pallas.stencil_bwd import (
        pack_scale, pack_wt, stencil_bwd_flat, unpack_rows,
    )

    args, y = res
    x, w, bias, scale, mean = args
    ybar, sbar, qbar = cts
    fp, _, _, _ = _flat_geometry(t, f_in, tile_m)
    assert fp == f_in + 1, (fp, f_in)
    pdt = jnp.float32 if precise else jnp.bfloat16
    q = 8 if precise else 16
    c = x.shape[1]
    n = w.shape[-1]
    g = _fold_cts(y, ybar, sbar, qbar, fuse_elu, pdt)   # [B, 2N, Wx]

    w32 = w.astype(jnp.float32)
    zeros = jnp.zeros((c, n), jnp.float32)
    c_pad = _round_up(c, 8)
    dr_pad = _round_up(c_pad, q)
    dtaps, blocks = [], []
    for dtp in range(3):
        dtaps.append(((dtp - 1) * fp, None))
        blocks.append(
            [(0, jnp.concatenate([w32[dtp, 0], w32[dtp, 1]], axis=1))]
        )
        dtaps.append(((dtp - 1) * fp + 1, None))
        blocks.append([(0, jnp.concatenate([w32[dtp, 2], zeros], axis=1))])
    wt = pack_wt(blocks, c_pad, dr_pad, 2 * n, pdt)

    wtaps, fields = [], []
    for dtp in range(3):
        for s in ((dtp - 1) * fp - 1, (dtp - 1) * fp):
            wtaps.append((0, s, None))
            fields.append(("shift", s, f_in))
    fields.append(("ones",))

    dxs, sdxn, sdxx, dw, fr, _ = stencil_bwd_flat(
        (g,), (x,), wt, pack_scale([scale], (c_pad,)),
        t=t, f_ref=f_in, tile_m=tile_m,
        g_blocks=(((n, fp), (n, f_in)),),
        x_mask_fs=(f_in,),
        dtaps=tuple(dtaps), wtaps=tuple(wtaps), fields=tuple(fields),
        precise=precise,
    )
    musc = (mean * scale).astype(jnp.float32)
    dw_full = [[None] * 3 for _ in range(3)]
    row = 0
    for dtp in range(3):
        a_m1 = dw[row : row + c, :]
        row += c
        a_0 = dw[row : row + c, :]
        row += c
        mt_m1 = jnp.einsum("bc,bn->cn", musc, fr[:, 2 * dtp, :])
        mt_0 = jnp.einsum("bc,bn->cn", musc, fr[:, 2 * dtp + 1, :])
        dw_full[2 - dtp][2] = (a_m1 - mt_m1)[:, :n]
        dw_full[2 - dtp][0] = (a_0 - mt_0)[:, :n]
        dw_full[2 - dtp][1] = (a_0 - mt_0)[:, n:]
    dw_full = jnp.stack([jnp.stack(r, axis=0) for r in dw_full], axis=0)
    dbias = (fr[:, 6, :n] + fr[:, 6, n:]).sum(axis=0)
    sdxn_u = unpack_rows(sdxn, (c,), (c_pad,))[0]
    sdxx_u = unpack_rows(sdxx, (c,), (c_pad,))[0]
    dscale = sdxx_u - mean * sdxn_u
    dmean = -scale * sdxn_u
    return dxs[0], dw_full, dbias, dscale, dmean


@functools.lru_cache(maxsize=None)
def _conv_down_ad(t, f_in, tile_m, fuse_elu, precise):
    from misonet_tpu.ops.pallas.stencil_flat import conv_down_flat

    def kernel(x_even, x_odd, w, bias, scale, mean):
        return conv_down_flat(
            x_even, x_odd, w, bias, scale, mean,
            t=t, f_in=f_in, tile_m=tile_m, fuse_elu=fuse_elu, precise=precise,
        )

    @jax.custom_vjp
    def fn(*args):
        return tuple(kernel(*args))

    def fwd(*args):
        out = tuple(kernel(*args))
        return out, (args, out[0])

    bwd = functools.partial(_conv_down_bwd, t, f_in, tile_m, fuse_elu,
                            precise)
    fn.defvjp(fwd, bwd)
    return fn


@functools.lru_cache(maxsize=None)
def _deconv_up_ad(t, f_in, tile_m, fuse_elu, precise):
    from misonet_tpu.ops.pallas.stencil_flat import deconv_up_flat

    def kernel(x, w, bias, scale, mean):
        return deconv_up_flat(
            x, w, bias, scale, mean,
            t=t, f_in=f_in, tile_m=tile_m, fuse_elu=fuse_elu, precise=precise,
        )

    @jax.custom_vjp
    def fn(*args):
        return tuple(kernel(*args))

    def fwd(*args):
        out = tuple(kernel(*args))
        return out, (args, out[0])

    bwd = functools.partial(_deconv_up_bwd, t, f_in, tile_m, fuse_elu,
                            precise)
    fn.defvjp(fwd, bwd)
    return fn


def _enc0_linear(t, tile_m, precise, x_cm, w, bias):
    """Twin of enc0_down_flat: NHWC freq-VALID stride-1 conv + bias from
    the channel-major [B, C, T, 129] input, emitted in the F=127 framing."""
    cdt = _conv_dtype(precise)
    x_nhwc = x_cm.transpose(0, 2, 3, 1).astype(jnp.float32)
    z = lax.conv_general_dilated(
        x_nhwc.astype(cdt),
        w.astype(cdt),
        window_strides=(1, 1),
        padding=((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return flatten_tf(z.astype(jnp.float32) + bias.astype(jnp.float32),
                      tile_m)


def _enc0_bwd(t, tile_m, precise, res, ybar):
    """Fused backward of the encoder's first conv (bare: no ELU/IN, raw
    input with identity statistics — no mean term, no dscale/dmean).

    Forward taps (stencil_flat.enc0_down_flat) on the xa/xb slices: xa at
    (dt-1)*fp (kernel df=0), xb at (dt-1)*fp + {0, 1} (df {1, 2}); the
    slices are dense real data (no zero gap), so dx is masked only to
    in-bounds columns and scattered back through the slice geometry."""
    from misonet_tpu.ops.pallas.dense_flat import _round_up
    from misonet_tpu.ops.pallas.stencil_bwd import (
        pack_scale, pack_wt, stencil_bwd_flat,
    )
    from misonet_tpu.ops.pallas.stencil_flat import enc0_slices

    x_cm, w, bias = res
    b, c_in, _, f_full = x_cm.shape
    f_out = f_full - 2
    fp, m_out, _, _ = _flat_geometry(t, f_out, tile_m)
    # the dx_cm re-assembly below rebuilds width fp + 1 from the two
    # slice gradients; like the forward's enc0_slices it requires the
    # unpadded framing (all production F ladders satisfy this)
    assert fp == f_out + 1, (
        f"enc0 backward needs fp == f_out + 1 (got fp={fp}, f_out={f_out})"
    )
    pdt = jnp.float32 if precise else jnp.bfloat16
    q = 8 if precise else 16
    n = w.shape[-1]
    xa, xb = enc0_slices(x_cm, t, f_out, tile_m, pdt)
    c_pad = xa.shape[1]
    w32 = jnp.pad(
        w.astype(jnp.float32), ((0, 0), (0, 0), (0, c_pad - c_in), (0, 0))
    )
    g = ybar.astype(pdt)

    dr_pad = _round_up(2 * c_pad, q)
    dtaps, blocks = [], []
    for dtp in range(3):
        dtaps.append(((dtp - 1) * fp, None))
        blocks.append([(0, w32[2 - dtp, 0]), (c_pad, w32[2 - dtp, 1])])
        dtaps.append(((dtp - 1) * fp - 1, None))
        blocks.append([(c_pad, w32[2 - dtp, 2])])
    wt = pack_wt(blocks, 2 * c_pad, dr_pad, n, pdt)

    wtaps = []
    for dt in range(3):
        wtaps.append((0, (dt - 1) * fp, None))
        wtaps.append((1, (dt - 1) * fp, None))
        wtaps.append((1, (dt - 1) * fp + 1, None))
    ones = jnp.ones((b, c_pad), jnp.float32)

    dxs, _, _, dw, fr, _ = stencil_bwd_flat(
        (g,), (xa, xb), wt, pack_scale([ones, ones], (c_pad, c_pad)),
        t=t, f_ref=f_out, tile_m=tile_m,
        g_blocks=(((n, f_out),),),
        x_mask_fs=(fp, fp),
        dtaps=tuple(dtaps), wtaps=tuple(wtaps), fields=(("ones",),),
        precise=precise,
    )
    rows, row = [], 0
    for dt in range(3):
        per_df = []
        for _ in range(3):
            per_df.append(dw[row : row + c_pad, :][:c_in])
            row += c_pad
        rows.append(jnp.stack(per_df, axis=0))
    dw_full = jnp.stack(rows, axis=0)                     # [3, 3, C, N]
    dbias = fr[:, 0, :].sum(axis=0)

    def unframe(v):
        v = v[:, :c_in, tile_m : tile_m + t * fp].astype(jnp.float32)
        return v.reshape(b, c_in, t, fp)

    dx_cm = (
        jnp.pad(unframe(dxs[0]), ((0, 0), (0, 0), (0, 0), (0, 1)))
        + jnp.pad(unframe(dxs[1]), ((0, 0), (0, 0), (0, 0), (1, 0)))
    ).astype(x_cm.dtype)
    return dx_cm, dw_full, dbias


@functools.lru_cache(maxsize=None)
def _enc0_ad(t, tile_m, precise):
    from misonet_tpu.ops.pallas.stencil_flat import enc0_down_flat

    def kernel(x_cm, w, bias):
        return enc0_down_flat(
            x_cm, w, bias, t=t, tile_m=tile_m, precise=precise
        )

    @jax.custom_vjp
    def fn(x_cm, w, bias):
        return kernel(x_cm, w, bias)

    def fwd(x_cm, w, bias):
        return kernel(x_cm, w, bias), (x_cm, w, bias)

    bwd = functools.partial(_enc0_bwd, t, tile_m, precise)
    fn.defvjp(fwd, bwd)
    return fn


def enc0_down_flat_ad(x_cm, w, bias, *, t, tile_m, precise=False):
    """Differentiable enc0_down_flat."""
    return _enc0_ad(t, tile_m, precise)(x_cm, w, bias)


def _final_linear(t, f, tile_m, precise, x, w, bias, scale, mean):
    """Twin of final_deconv_flat's kernel part: normalize, torch-geometry
    stride-(1,1) ConvTranspose (= conv with flipped kernel, freq pad 2),
    bins 0..fp-1 emitted across the full fp columns of the F framing
    (every column is a valid output for this layer)."""
    cdt = _conv_dtype(precise)
    b, c, _ = x.shape
    n = w.shape[-1]
    fp, m_out, _, xw = _flat_geometry(t, f, tile_m)
    x_nhwc = unflatten_tf(x.astype(jnp.float32), t, f, tile_m)
    xn = (x_nhwc - mean[:, None, None, :]) * scale[:, None, None, :]
    z = lax.conv_general_dilated(
        xn.astype(cdt),
        jnp.flip(w.astype(cdt), (0, 1)),
        window_strides=(1, 1),
        padding=((1, 1), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # [B, T, F+2, N]
    za = z[:, :, :fp, :].astype(jnp.float32) + bias.astype(jnp.float32)
    za = za.transpose(0, 3, 1, 2).reshape(b, n, t * fp)
    return jnp.pad(za, ((0, 0), (0, 0), (tile_m, xw - tile_m - t * fp)))


def _final_bwd(t, f, tile_m, precise, res, ybar):
    """Fused backward of the final bare transpose conv (127 -> 128 bins;
    the bin-128 branch is plain XLA and differentiates natively).

    Forward taps (stencil_flat.final_deconv_flat): shifts (dt-1)*fp +
    (df-2) with flipped kernel w[2-dt, 2-df], each gated to the output
    frequencies [lo, hi) where the read stays inside the valid input —
    the backward carries the same gates on the transposed taps and uses
    the forward's output-relative omask fields for the dW mean term."""
    from misonet_tpu.ops.pallas.dense_flat import _round_up
    from misonet_tpu.ops.pallas.stencil_bwd import (
        pack_scale, pack_wt, stencil_bwd_flat, unpack_rows,
    )

    x, w, bias, scale, mean = res
    fp, _, _, _ = _flat_geometry(t, f, tile_m)
    assert fp == f + 1, (fp, f)
    pdt = jnp.float32 if precise else jnp.bfloat16
    q = 8 if precise else 16
    c = x.shape[1]
    n = w.shape[-1]
    g = ybar.astype(pdt)
    w32 = w.astype(jnp.float32)

    def gate_of(df):
        return (2 - df if df < 2 else 0, f if df == 2 else fp)

    c_pad = _round_up(c, 8)
    dr_pad = _round_up(c_pad, q)
    dtaps, blocks = [], []
    for dtp in range(3):
        for dfp in range(3):
            dtaps.append(((dtp - 1) * fp + dfp, gate_of(2 - dfp)))
            blocks.append([(0, w32[dtp, dfp])])
    wt = pack_wt(blocks, c_pad, dr_pad, n, pdt)

    wtaps, fields = [], []
    for dt in range(3):
        for df in range(3):
            lo, hi = gate_of(df)
            wtaps.append((0, (dt - 1) * fp + (df - 2), (lo, hi)))
            fields.append(("omask", dt - 1, lo, hi))
    fields.append(("ones",))

    dxs, sdxn, sdxx, dw, fr, _ = stencil_bwd_flat(
        (g,), (x,), wt, pack_scale([scale], (c_pad,)),
        t=t, f_ref=f, tile_m=tile_m,
        g_blocks=(((n, fp),),),
        x_mask_fs=(f,),
        dtaps=tuple(dtaps), wtaps=tuple(wtaps), fields=tuple(fields),
        precise=precise,
    )
    musc = (mean * scale).astype(jnp.float32)
    dw_full = [[None] * 3 for _ in range(3)]
    row = 0
    for dt in range(3):
        for df in range(3):
            mterm = jnp.einsum("bc,bn->cn", musc, fr[:, 3 * dt + df, :])
            dw_full[2 - dt][2 - df] = dw[row : row + c, :] - mterm
            row += c
    dw_full = jnp.stack([jnp.stack(r, axis=0) for r in dw_full], axis=0)
    dbias = fr[:, 9, :].sum(axis=0)
    sdxn_u = unpack_rows(sdxn, (c,), (c_pad,))[0]
    sdxx_u = unpack_rows(sdxx, (c,), (c_pad,))[0]
    dscale = sdxx_u - mean * sdxn_u
    dmean = -scale * sdxn_u
    return dxs[0], dw_full, dbias, dscale, dmean


@functools.lru_cache(maxsize=None)
def _final_ad(t, f, tile_m, precise):
    from misonet_tpu.ops.pallas.stencil_flat import final_deconv_flat

    def kernel(x, w, bias, scale, mean):
        return final_deconv_flat(
            x, w, bias, scale, mean, t=t, f=f, tile_m=tile_m,
            precise=precise,
        )

    @jax.custom_vjp
    def fn(x, w, bias, scale, mean):
        return kernel(x, w, bias, scale, mean)

    def fwd(*args):
        return kernel(*args), args

    bwd = functools.partial(_final_bwd, t, f, tile_m, precise)
    fn.defvjp(fwd, bwd)
    return fn


def final_deconv_flat_ad(x, w, bias, scale, mean, *, t, f, tile_m,
                         precise=False):
    """Differentiable final transpose conv: (bins 0..fp-1 flat [B, N, Wx],
    bin fp [B, N, T]).  The last-bin branch is plain XLA and
    differentiates natively."""
    from misonet_tpu.ops.pallas.stencil_flat import final_bin128

    y = _final_ad(t, f, tile_m, precise)(x, w, bias, scale, mean)
    y128 = final_bin128(x, w, bias, scale, mean, t=t, f=f, tile_m=tile_m)
    return y, y128


def conv_down_flat_ad(x_even, x_odd, w, bias, scale, mean, *, t, f_in,
                      tile_m, fuse_elu=True, precise=False):
    """Differentiable conv_down_flat."""
    return _conv_down_ad(t, f_in, tile_m, fuse_elu, precise)(
        x_even, x_odd, w, bias, scale, mean
    )


def deconv_up_flat_ad(x, w, bias, scale, mean, *, t, f_in, tile_m,
                      fuse_elu=True, precise=False):
    """Differentiable deconv_up_flat."""
    return _deconv_up_ad(t, f_in, tile_m, fuse_elu, precise)(
        x, w, bias, scale, mean
    )
