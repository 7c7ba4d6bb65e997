"""Train-step tests: loss decreases, DP sharding over the 8-device CPU mesh
matches single-device results (SURVEY.md §2.10 items 1-2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from misonet_tpu.config import ModelConfig, OptimizerConfig
from misonet_tpu.models import make_miso1
from misonet_tpu.parallel import make_mesh, shard_batch, replicate
from misonet_tpu.train import (
    create_train_state,
    make_optimizer,
    make_separate_train_step,
    make_separate_eval_step,
)
from misonet_tpu.train.state import (
    PlateauScheduler,
    current_learning_rate,
    set_learning_rate,
)

# Small plan: frequency ladder 17 -> 15 -> 7 -> 3 -> 1 with 4 blocks.
SMALL = ModelConfig(
    num_bottleneck=4,
    en_channels=(8, 8, 8, 16),
    de_channels=(16, 8, 8, 8),
    tcn_repeats=1,
    tcn_blocks=2,
    tcn_channels=16,
    compute_dtype="float32",
)
B, C, T, F = 8, 3, 16, 17


def _batch(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    mix = jax.lax.complex(
        jax.random.normal(k1, (B, C, T, F)), jax.random.normal(k2, (B, C, T, F))
    )
    ref = jax.lax.complex(
        jax.random.normal(k3, (B, 2, T, F)) * 0.1,
        jax.random.normal(k4, (B, 2, T, F)) * 0.1,
    )
    return mix, ref


@pytest.fixture(scope="module")
def setup():
    model = make_miso1(SMALL)
    mix, ref = _batch(jax.random.key(0))
    params = model.init(jax.random.key(1), mix)
    opt = make_optimizer(OptimizerConfig(lr=1e-3))
    state = create_train_state(params, opt)
    return model, opt, state, mix, ref


def test_loss_decreases(setup):
    model, opt, state, mix, ref = setup
    state = jax.tree.map(jnp.copy, state)  # step donates its input state
    step = make_separate_train_step(model, opt)
    first = None
    for _ in range(5):
        state, metrics = step(state, mix, ref)
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < first
    assert np.isfinite(float(metrics["grad_norm"]))


def test_dp_matches_single_device(setup):
    """The same batch must produce the same loss whether the batch is
    sharded across the 8-device mesh or on a single device."""
    model, opt, _, mix, ref = setup
    params = model.init(jax.random.key(1), mix)
    mesh = make_mesh()
    assert mesh.size == 8

    single = make_separate_eval_step(model)
    loss_single, _ = single(params, mix, ref)

    sharded = make_separate_eval_step(model, mesh=mesh)
    p = replicate(params, mesh)
    smix, sref = shard_batch((mix, ref), mesh)
    loss_dp, est = sharded(p, smix, sref)
    np.testing.assert_allclose(float(loss_dp), float(loss_single), rtol=1e-4)
    assert est.shape == (B, 2, T, F)


def test_dp_train_step_runs_on_mesh(setup):
    model, opt, state, mix, ref = setup
    mesh = make_mesh()
    step = make_separate_train_step(model, opt, mesh=mesh)
    st = jax.tree.map(jnp.copy, state)
    st = replicate(st, mesh)
    smix, sref = shard_batch((mix, ref), mesh)
    st, metrics = step(st, smix, sref)
    assert np.isfinite(float(metrics["loss"]))


def test_plateau_scheduler():
    sch = PlateauScheduler(lr=1e-3, factor=0.5, patience=2, min_lr=1e-5)
    lrs = [sch.step(1.0) for _ in range(6)]  # no improvement after first
    # first epoch sets best; epochs 2-4 exceed patience -> halve at epoch 4
    assert lrs[0] == 1e-3 and min(lrs) < 1e-3
    for _ in range(20):
        sch.step(2.0)
    assert sch.lr >= 1e-5 and sch.should_stop


def test_learning_rate_injection(setup):
    model, opt, state, mix, ref = setup
    state = jax.tree.map(jnp.copy, state)  # step donates its input state
    assert current_learning_rate(state) == pytest.approx(1e-3)
    state = set_learning_rate(state, 5e-4)
    assert current_learning_rate(state) == pytest.approx(5e-4)
    step = make_separate_train_step(model, opt)
    state, _ = step(state, mix, ref)  # still runs after LR surgery


@pytest.mark.slow
def test_flat_gradients_match_xla_on_mesh():
    """Gradient-parity triangle (VERDICT r2 item 10): fused flat-path
    gradients (interpret mode, precise fp32, single device) must equal the
    plain-XLA path's gradients computed with the batch sharded over the
    8-device mesh (psum reduction).  Interpret-mode Pallas lowers to
    io_callback, which XLA's SPMD partitioner rejects under sharded inputs
    (side-effecting HLO cannot be replicated), so the flat side runs
    unsharded — the comparison still pins flat==XLA numerics AND
    sharded==unsharded gradient reduction in one assertion.  Uses a narrow
    F=129 plan so the flat geometry predicate holds while staying
    CPU-sized."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import NamedSharding, PartitionSpec as P

    # permutation-free loss: with random weights the two speaker slots are
    # near-tied under uPIT, and fp32-rounding differences between the two
    # paths can flip the argmin permutation — a gradient discontinuity that
    # would make this comparison meaningless.
    from misonet_tpu.losses import loss_enhance

    plan = dict(
        num_bottleneck=7,
        en_channels=(8, 8, 8, 8, 8, 16, 16),
        de_channels=(16, 16, 8, 8, 8, 8, 8),
        tcn_repeats=1,
        tcn_blocks=2,
        tcn_channels=16,
        compute_dtype="float32",
    )
    xla_model = make_miso1(ModelConfig(**plan, flat_dense=False))
    flat_model = make_miso1(ModelConfig(**plan, flat_dense=True))

    b, c, t, f = 8, 3, 8, 129
    k1, k2, k3, k4 = jax.random.split(jax.random.key(5), 4)
    mix = jax.lax.complex(
        jax.random.normal(k1, (b, c, t, f)), jax.random.normal(k2, (b, c, t, f))
    )
    ref = jax.lax.complex(
        jax.random.normal(k3, (b, 2, t, f)) * 0.1,
        jax.random.normal(k4, (b, 2, t, f)) * 0.1,
    )
    params = xla_model.init(jax.random.key(6), mix)  # trees interchangeable

    mesh = make_mesh()
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(mesh.axis_names[0]))

    def make_grads(model, sharded):
        def loss_fn(p, mix, ref):
            return loss_enhance(model.apply(p, mix), ref)

        shardings = (repl, data, data) if sharded else None
        return jax.jit(jax.grad(loss_fn), in_shardings=shardings)

    p = replicate(params, mesh)
    smix, sref = shard_batch((mix, ref), mesh)
    g_xla = make_grads(xla_model, sharded=True)(p, smix, sref)
    with pltpu.force_tpu_interpret_mode():
        g_flat = make_grads(flat_model, sharded=False)(params, mix, ref)

    flat_leaves = jax.tree_util.tree_leaves_with_path(g_flat)
    xla_map = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(g_xla)
    }
    assert len(flat_leaves) == len(xla_map)
    # tolerance scales with the gradient magnitude of the leaf, floored in
    # absolute terms — near-zero leaves (e.g. gLN beta sums that cancel)
    # carry pure rounding noise, not signal
    for key, v in flat_leaves:
        ref_v = xla_map[jax.tree_util.keystr(key)]
        scale = float(jnp.abs(ref_v).max())
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(ref_v),
            atol=2e-3 * scale + 1e-6, err_msg=jax.tree_util.keystr(key),
        )
