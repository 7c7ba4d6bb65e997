"""Direct parity of the fused Pallas backward (ops/pallas/stencil_bwd.py)
against the pure-JAX linear twins, per op, in interpret mode / fp32.

The module-level gradient tests (test_flat_grad.py, test_dense_stack.py,
test_train_step.py) cover the backward through full blocks and the whole
model; these pin each custom-VJP boundary in isolation — enc0 and the
final transpose conv in particular, whose only other coverage is the
full-model parity test — by differentiating the twin definitions the
backward kernels must reproduce."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from misonet_tpu.ops.pallas.conv_flat import flatten_tf
from misonet_tpu.ops.pallas.dense_stack import (
    _stack_linear,
    dense_stack_flat_ad,
)
from misonet_tpu.ops.pallas.flat_grad import (
    _elu,
    _enc0_linear,
    _final_linear,
    _stats,
    enc0_down_flat_ad,
    final_deconv_flat_ad,
)

TILE = 256


def _tree_close(a, b, atol):
    for ga, gb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        scale = np.abs(np.asarray(gb)).max() + 1e-9
        np.testing.assert_allclose(
            np.asarray(ga) / scale, np.asarray(gb) / scale, atol=atol
        )


def _cot_weights(shape, seed):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


def test_enc0_bwd_matches_twin():
    t, f_full, c, n = 6, 17, 12, 8
    rng = np.random.default_rng(0)
    x_cm = jnp.asarray(rng.standard_normal((2, c, t, f_full)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, c, n)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    def loss_kernel(x_cm, w, bias):
        y = enc0_down_flat_ad(x_cm, w, bias, t=t, tile_m=TILE, precise=True)
        return jnp.sum(y * _cot_weights(y.shape, 1))

    def loss_twin(x_cm, w, bias):
        y = _enc0_linear(t, TILE, True, x_cm, w, bias)
        return jnp.sum(y * _cot_weights(y.shape, 1))

    with pltpu.force_tpu_interpret_mode():
        gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(x_cm, w, bias)
    gt = jax.grad(loss_twin, argnums=(0, 1, 2))(x_cm, w, bias)
    _tree_close(gk, gt, 1e-4)


def test_final_bwd_matches_twin():
    t, f, c, n = 6, 15, 16, 8
    rng = np.random.default_rng(2)
    x_nhwc = rng.standard_normal((2, t, f, c)).astype(np.float32)
    x = flatten_tf(jnp.asarray(x_nhwc), TILE)
    w = jnp.asarray(rng.standard_normal((3, 3, c, n)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    scale = jnp.asarray(
        (1.0 + 0.3 * rng.standard_normal((2, c))).astype(np.float32)
    )
    mean = jnp.asarray(
        (0.2 * rng.standard_normal((2, c))).astype(np.float32)
    )

    def loss_kernel(x, w, bias, scale, mean):
        y, y128 = final_deconv_flat_ad(
            x, w, bias, scale, mean, t=t, f=f, tile_m=TILE, precise=True
        )
        return (
            jnp.sum(y * _cot_weights(y.shape, 3))
            + jnp.sum(y128 * _cot_weights(y128.shape, 4))
        )

    def loss_twin(x, w, bias, scale, mean):
        y = _final_linear(t, f, TILE, True, x, w, bias, scale, mean)
        from misonet_tpu.ops.pallas.stencil_flat import final_bin128

        y128 = final_bin128(x, w, bias, scale, mean, t=t, f=f, tile_m=TILE)
        return (
            jnp.sum(y * _cot_weights(y.shape, 3))
            + jnp.sum(y128 * _cot_weights(y128.shape, 4))
        )

    with pltpu.force_tpu_interpret_mode():
        gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4))(
            x, w, bias, scale, mean
        )
    gt = jax.grad(loss_twin, argnums=(0, 1, 2, 3, 4))(x, w, bias, scale, mean)
    _tree_close(gk, gt, 1e-4)


def test_stacked_call_bwd_matches_twin_with_acc():
    """One mid-block stacked call (acc in AND out, two source tensors)
    against the _stack_linear twin + algebraic ELU/stats folding."""
    t, f = 6, 15
    b, c1, c2, n_fin, n_total = 2, 8, 8, 8, 24
    rng = np.random.default_rng(5)

    def flat(c, seed):
        v = rng.standard_normal((b, t, f, c)).astype(np.float32)
        return flatten_tf(jnp.asarray(v), TILE)

    xs = (flat(c1, 0), flat(c2, 1))
    acc_in = flatten_tf(
        jnp.asarray(rng.standard_normal((b, t, f, n_total)).astype(np.float32)),
        TILE,
    )
    w_stack = jnp.asarray(
        rng.standard_normal((3, 3, c1 + c2, n_total)).astype(np.float32)
    )
    bias = jnp.asarray(rng.standard_normal(n_fin).astype(np.float32))
    scale = jnp.asarray(
        (1.0 + 0.2 * rng.standard_normal((b, c1 + c2))).astype(np.float32)
    )
    mean = jnp.asarray(
        (0.1 * rng.standard_normal((b, c1 + c2))).astype(np.float32)
    )

    # gap/pad columns are implementation detail (the kernel masks its
    # outputs there, the twin's post-flatten acc add does not), so the
    # loss reads both ops only at valid columns — the gradients of this
    # shared masked loss must then agree everywhere
    from misonet_tpu.ops.pallas.dense_flat import mask_field

    mask_row = jnp.asarray(mask_field(t, f, TILE)[0])

    def loss_kernel(xs, acc_in, w_stack, bias, scale, mean):
        y, s, q, acc_out = dense_stack_flat_ad(
            xs, acc_in, w_stack, bias, scale, mean,
            t=t, f=f, n_fin=n_fin, tile_m=TILE, precise=True,
        )
        y = y * mask_row
        acc_out = acc_out * mask_row
        return (
            jnp.sum(y * _cot_weights(y.shape, 6))
            + jnp.sum(s * _cot_weights(s.shape, 7))
            + jnp.sum(q * _cot_weights(q.shape, 8))
            + jnp.sum(acc_out * _cot_weights(acc_out.shape, 9))
        )

    def loss_twin(xs, acc_in, w_stack, bias, scale, mean):
        z_fin, acc_out = _stack_linear(
            t, f, TILE, n_fin, True, xs, acc_in, w_stack, bias, scale, mean
        )
        y = _elu(z_fin) * mask_row
        s, q = _stats(y)
        acc_out = acc_out * mask_row
        return (
            jnp.sum(y * _cot_weights(y.shape, 6))
            + jnp.sum(s * _cot_weights(s.shape, 7))
            + jnp.sum(q * _cot_weights(q.shape, 8))
            + jnp.sum(acc_out * _cot_weights(acc_out.shape, 9))
        )

    args = (xs, acc_in, w_stack, bias, scale, mean)
    with pltpu.force_tpu_interpret_mode():
        gk = jax.grad(loss_kernel, argnums=tuple(range(6)))(*args)
    gt = jax.grad(loss_twin, argnums=tuple(range(6)))(*args)
    _tree_close(gk, gt, 1e-4)
