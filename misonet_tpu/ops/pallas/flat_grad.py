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
# custom_vjp assembly
# ---------------------------------------------------------------------------


def _make_ad(kernel_fn, linear_fn, fuse_elu):
    """primal = Pallas kernel; backward = stats/ELU cotangent folding from
    the saved raw output + VJP of the linear twin (no forward recompute)."""

    @jax.custom_vjp
    def fn(*args):
        return tuple(kernel_fn(*args))

    def fwd(*args):
        out = tuple(kernel_fn(*args))
        return out, (args, out[0])

    def bwd(res, cts):
        args, y = res
        ybar, sbar, qbar = cts
        y32 = y.astype(jnp.float32)
        g_y = ybar.astype(jnp.float32) + sbar + 2.0 * y32 * qbar
        if fuse_elu:
            # elu'(z) = 1 for z > 0, e^z = y + 1 otherwise
            g_z = g_y * jnp.where(y32 > 0, 1.0, y32 + 1.0)
        else:
            g_z = g_y
        _, vjp = jax.vjp(linear_fn, *args)
        return vjp(g_z)

    fn.defvjp(fwd, bwd)
    return fn


@functools.lru_cache(maxsize=None)
def _dense_ad(t, f, tile_m, fuse_elu, precise):
    from misonet_tpu.ops.pallas.dense_flat import dense_layer_flat

    def kernel(xs, w, bias, scale, mean):
        return dense_layer_flat(
            xs, w, bias, scale, mean,
            t=t, f=f, tile_m=tile_m, fuse_elu=fuse_elu,
            want_stats=True, precise=precise,
        )

    lin = functools.partial(_dense_linear, t, f, tile_m, precise)
    return _make_ad(kernel, lin, fuse_elu)


@functools.lru_cache(maxsize=None)
def _conv_down_ad(t, f_in, tile_m, fuse_elu, precise):
    from misonet_tpu.ops.pallas.stencil_flat import conv_down_flat

    def kernel(x_even, x_odd, w, bias, scale, mean):
        return conv_down_flat(
            x_even, x_odd, w, bias, scale, mean,
            t=t, f_in=f_in, tile_m=tile_m, fuse_elu=fuse_elu, precise=precise,
        )

    lin = functools.partial(_conv_down_linear, t, f_in, tile_m, precise)
    return _make_ad(kernel, lin, fuse_elu)


@functools.lru_cache(maxsize=None)
def _deconv_up_ad(t, f_in, tile_m, fuse_elu, precise):
    from misonet_tpu.ops.pallas.stencil_flat import deconv_up_flat

    def kernel(x, w, bias, scale, mean):
        return deconv_up_flat(
            x, w, bias, scale, mean,
            t=t, f_in=f_in, tile_m=tile_m, fuse_elu=fuse_elu, precise=precise,
        )

    lin = functools.partial(_deconv_up_linear, t, f_in, tile_m, precise)
    return _make_ad(kernel, lin, fuse_elu)


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


@functools.lru_cache(maxsize=None)
def _enc0_ad(t, tile_m, precise):
    from misonet_tpu.ops.pallas.stencil_flat import enc0_down_flat

    def kernel(x_cm, w, bias):
        return enc0_down_flat(
            x_cm, w, bias, t=t, tile_m=tile_m, precise=precise
        )

    lin = functools.partial(_enc0_linear, t, tile_m, precise)

    @jax.custom_vjp
    def fn(x_cm, w, bias):
        return kernel(x_cm, w, bias)

    def fwd(x_cm, w, bias):
        return kernel(x_cm, w, bias), (x_cm, w, bias)

    def bwd(res, ybar):
        # bare conv: no ELU, no fused stats — the cotangent passes straight
        # into the linear twin's VJP (gap/pad columns drop at the flatten)
        _, vjp = jax.vjp(lin, *res)
        return vjp(ybar.astype(jnp.float32))

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


@functools.lru_cache(maxsize=None)
def _final_ad(t, f, tile_m, precise):
    from misonet_tpu.ops.pallas.stencil_flat import final_deconv_flat

    def kernel(x, w, bias, scale, mean):
        return final_deconv_flat(
            x, w, bias, scale, mean, t=t, f=f, tile_m=tile_m,
            precise=precise,
        )

    lin = functools.partial(_final_linear, t, f, tile_m, precise)

    @jax.custom_vjp
    def fn(x, w, bias, scale, mean):
        return kernel(x, w, bias, scale, mean)

    def fwd(*args):
        return kernel(*args), args

    def bwd(res, ybar):
        # bare transpose conv: no ELU, no fused stats
        _, vjp = jax.vjp(lin, *res)
        return vjp(ybar.astype(jnp.float32))

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


def dense_layer_flat_ad(xs, w, bias, scale, mean, *, t, f, tile_m=2048,
                        fuse_elu=True, precise=False):
    """Differentiable dense_layer_flat (want_stats always on)."""
    if not isinstance(xs, (tuple, list)):
        xs = (xs,)
    return _dense_ad(t, f, tile_m, fuse_elu, precise)(
        tuple(xs), w, bias, scale, mean
    )


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
