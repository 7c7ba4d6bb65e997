"""NaN-guard tests: non-finite batches must not poison parameters
(SURVEY.md §5 failure detection; replaces the reference's pdb traps,
model.py:109-110)."""

import jax
import jax.numpy as jnp
import numpy as np

from misonet_tpu.config import ModelConfig, OptimizerConfig
from misonet_tpu.models import make_miso1
from misonet_tpu.train import (
    create_train_state,
    make_optimizer,
    make_separate_train_step,
)

SMALL = ModelConfig(
    num_bottleneck=4,
    en_channels=(8, 8, 8, 16),
    de_channels=(16, 8, 8, 8),
    tcn_repeats=1,
    tcn_blocks=2,
    tcn_channels=16,
    compute_dtype="float32",
)


def test_nan_batch_skips_update():
    model = make_miso1(SMALL)
    mix = jax.lax.complex(
        jax.random.normal(jax.random.key(0), (1, 3, 16, 17)),
        jax.random.normal(jax.random.key(1), (1, 3, 16, 17)),
    )
    ref = jax.lax.complex(
        jax.random.normal(jax.random.key(2), (1, 2, 16, 17)),
        jax.random.normal(jax.random.key(3), (1, 2, 16, 17)),
    )
    params = model.init(jax.random.key(4), mix)
    opt = make_optimizer(OptimizerConfig(guard_nans=True))
    state = create_train_state(params, opt)
    step = make_separate_train_step(model, opt)

    bad_mix = mix.at[0, 0, 0, 0].set(jnp.nan + 0j)
    before = jax.tree.map(jnp.copy, state.params)
    state, metrics = step(state, bad_mix, ref)
    # loss is NaN but parameters must be untouched
    assert not np.isfinite(float(metrics["loss"]))
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and a following clean batch still updates normally
    state, metrics = step(state, mix, ref)
    assert np.isfinite(float(metrics["loss"]))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(state.params))
    )
    assert changed
