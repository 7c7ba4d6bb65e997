"""Sequence-parallel TCN: time-axis sharding with halo exchange.

For long-form utterances whose frame count exceeds one chip's appetite, the
TCN bottleneck can run with its time axis sharded over a mesh axis
(SURVEY.md §5 long-context: receptive field ~2·sum(2^x)·2 frames, halo
exchange of the dilation depth per side).  This module reimplements the
TemporalConvNet forward (same parameters as models.blocks.TemporalConvNet —
the pytree produced by MISONet's init) as a shard_map-compatible function:

  * every dilated depthwise conv exchanges its `dilation` frames of halo
    with each neighbor via `jax.lax.ppermute` (edge shards zero-pad, which
    ppermute provides for free);
  * every normalization (outer IN / inner gLN) computes exact global
    statistics with `psum` of local (sum, sum-of-squares, count);
  * pointwise convs, PReLU and residuals are purely local.

Outputs match the unsharded TCN bit-for-tolerance (tests/test_tcn_sp.py).
"""

from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from misonet_tpu.config import ModelConfig
from misonet_tpu.models.blocks import EPS_GLN, EPS_IN


def _halo_exchange(x: jnp.ndarray, halo: int, axis: str) -> jnp.ndarray:
    """[B, T_loc, C] -> [B, T_loc + 2*halo, C]: receive `halo` trailing
    frames from the left neighbor and `halo` leading frames from the right
    neighbor; edges get zeros (the conv's zero padding)."""
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    left_edge = x[:, :halo]
    right_edge = x[:, -halo:]
    # send my right edge to my right neighbor (their left halo), and my
    # left edge to my left neighbor (their right halo)
    from_left = jax.lax.ppermute(
        right_edge, axis, [(i, i + 1) for i in range(n - 1)]
    )
    from_right = jax.lax.ppermute(
        left_edge, axis, [(i + 1, i) for i in range(n - 1)]
    )
    del idx
    return jnp.concatenate([from_left, x, from_right], axis=1)


def _instance_norm_global(x: jnp.ndarray, axis: str) -> jnp.ndarray:
    """IN over the full (sharded) time axis per (batch, channel)."""
    s = jax.lax.psum(jnp.sum(x, axis=1, keepdims=True), axis)
    ss = jax.lax.psum(jnp.sum(x * x, axis=1, keepdims=True), axis)
    cnt = jax.lax.psum(jnp.asarray(x.shape[1], jnp.float32), axis)
    mean = s / cnt
    var = ss / cnt - mean**2
    return (x - mean) * jax.lax.rsqrt(var + EPS_IN)


def _gln_global(x: jnp.ndarray, gamma, beta, axis: str) -> jnp.ndarray:
    """gLN over (time, channel) per batch element, sharded time."""
    s = jax.lax.psum(jnp.sum(x, axis=(1, 2), keepdims=True), axis)
    ss = jax.lax.psum(jnp.sum(x * x, axis=(1, 2), keepdims=True), axis)
    cnt = jax.lax.psum(
        jnp.asarray(x.shape[1] * x.shape[2], jnp.float32), axis
    )
    mean = s / cnt
    var = ss / cnt - mean**2
    return gamma * (x - mean) / jnp.sqrt(var + EPS_GLN) + beta


def _dsconv(x: jnp.ndarray, p: dict, dilation: int, axis: str) -> jnp.ndarray:
    """Depthwise (k=3, dilated, halo-exchanged) -> PReLU -> gLN(global) ->
    pointwise.  x [B, T_loc, C]."""
    c = x.shape[-1]
    xe = _halo_exchange(x, dilation, axis)
    y = jax.lax.conv_general_dilated(
        xe,
        p["depthwise"]["kernel"],
        window_strides=(1,),
        padding="VALID",
        rhs_dilation=(dilation,),
        feature_group_count=c,
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    alpha = p["PReLU_0"]["alpha"]
    y = jnp.where(y >= 0, y, alpha * y)
    y = _gln_global(
        y, p["GlobalLayerNorm_0"]["gamma"], p["GlobalLayerNorm_0"]["beta"], axis
    )
    return jax.lax.conv_general_dilated(
        y,
        p["pointwise"]["kernel"],
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
    )


def _tcn_local(params: dict, x: jnp.ndarray, cfg: ModelConfig, axis: str):
    """The shard-local TCN body (runs under shard_map)."""
    for r in range(cfg.tcn_repeats):
        for bix in range(cfg.tcn_blocks):
            p = params[f"repeat{r}_block{bix}"]
            residual = x
            y = _instance_norm_global(x, axis)
            y = jax.nn.elu(y)
            y = _dsconv(y, p["DepthwiseSeparableConv_0"], 2**bix, axis)
            y = _instance_norm_global(y, axis)
            y = jax.nn.elu(y)
            y = _dsconv(y, p["DepthwiseSeparableConv_1"], 2**bix, axis)
            x = y + residual
    return x


def tcn_time_sharded(
    tcn_params: dict,
    x: jnp.ndarray,
    cfg: ModelConfig,
    mesh: Mesh,
    axis: str | None = None,
):
    """Run the TCN with its time axis sharded over ``mesh``.

    tcn_params: the 'tcn' subtree of MISONet params
                (params['params']['tcn']);
    x: [B, T, C] with T divisible by the mesh axis size.
    Returns [B, T, C] equal to the unsharded TemporalConvNet output."""
    axis = axis or mesh.axis_names[0]
    assert x.shape[1] % mesh.shape[axis] == 0, (
        f"T={x.shape[1]} must divide by mesh axis {mesh.shape[axis]}"
    )
    from jax import shard_map

    fn = shard_map(
        partial(_tcn_local, tcn_params, cfg=cfg, axis=axis),
        mesh=mesh,
        in_specs=P(None, axis, None),
        out_specs=P(None, axis, None),
    )
    return fn(x)


# ---------------------------------------------------------------------------
# Flax front-end: checkpoint-interchangeable with models.blocks.
# TemporalConvNet (same param tree), computation routed through the
# shard_map body above.  Selected by ModelConfig.sequence_parallel.
# ---------------------------------------------------------------------------


class _Kernel(nn.Module):
    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape, jnp.float32
        )


class _PReLUParam(nn.Module):
    @nn.compact
    def __call__(self):
        return self.param("alpha", nn.initializers.constant(0.25), (),
                          jnp.float32)


class _GLNParams(nn.Module):
    c: int

    @nn.compact
    def __call__(self):
        gamma = self.param("gamma", nn.initializers.ones, (1, 1, self.c),
                           jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (1, 1, self.c),
                          jnp.float32)
        return gamma, beta


class _DSConvParams(nn.Module):
    """Parameter tree of blocks.DepthwiseSeparableConv
    (depthwise/kernel, PReLU_0/alpha, GlobalLayerNorm_0/{gamma,beta},
    pointwise/kernel)."""

    c: int

    @nn.compact
    def __call__(self):
        dw = _Kernel((3, 1, self.c), name="depthwise")()
        alpha = _PReLUParam(name="PReLU_0")()
        gamma, beta = _GLNParams(self.c, name="GlobalLayerNorm_0")()
        pw = _Kernel((1, self.c, self.c), name="pointwise")()
        return {
            "depthwise": {"kernel": dw},
            "PReLU_0": {"alpha": alpha},
            "GlobalLayerNorm_0": {"gamma": gamma, "beta": beta},
            "pointwise": {"kernel": pw},
        }


class _BlockParams(nn.Module):
    c: int

    @nn.compact
    def __call__(self):
        return {
            "DepthwiseSeparableConv_0": _DSConvParams(
                self.c, name="DepthwiseSeparableConv_0")(),
            "DepthwiseSeparableConv_1": _DSConvParams(
                self.c, name="DepthwiseSeparableConv_1")(),
        }


class TemporalConvNetSP(nn.Module):
    """Sequence-parallel TemporalConvNet: same parameters/numerics as the
    local module (blocks.TemporalConvNet), time axis sharded over
    ``mesh`` with halo exchange + collective norm statistics.  Stats run
    fp32 like the local path; convs too (the TCN is <5% of model FLOPs —
    long-form T is where this path matters, not MXU saturation)."""

    repeats: int
    blocks: int
    features: int
    norm_type: str
    mesh: Mesh
    axis: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.norm_type == "IN", (
            "sequence-parallel TCN implements the production IN outer norm"
        )
        params = {
            f"repeat{r}_block{b}": _BlockParams(
                self.features, name=f"repeat{r}_block{b}")()
            for r in range(self.repeats)
            for b in range(self.blocks)
        }
        cfg = ModelConfig(
            tcn_repeats=self.repeats, tcn_blocks=self.blocks,
            tcn_channels=self.features, norm_type=self.norm_type,
        )
        y = tcn_time_sharded(
            params, x.astype(jnp.float32), cfg, self.mesh, self.axis
        )
        return y.astype(x.dtype)
