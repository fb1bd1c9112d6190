"""Checkpoint '.tar' contract: key set matches the reference
(main_bc_2.py:253-260), round-trips exactly, and restores optimizer
progress (the LR-decay count)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pvr_habitat_tpu.models import policy
from pvr_habitat_tpu.train import bc_step, optim
from pvr_habitat_tpu.utils import checkpoint as ckpt
from pvr_habitat_tpu.utils.flags import default_flags


def test_checkpoint_roundtrip(tmp_path):
    flags = default_flags(batch_norm=True, learning_rate=1e-3)
    state, opt = bc_step.create_train_state(
        np.random.RandomState(0), (16,), 3, flags, max_epochs=10)
    step = bc_step.make_train_step(opt, batch_norm=True, donate=False)
    rng = np.random.RandomState(1)
    batch = dict(obs=jnp.asarray(rng.randn(4, 2, 16), jnp.float32),
                 action=jnp.asarray(rng.randint(0, 3, (4, 2))),
                 done=jnp.asarray(rng.rand(4, 2) < 0.2))
    state, _ = step(state, batch)
    state, _ = step(state, batch)

    path = str(tmp_path / "run.tar")
    ckpt.save_checkpoint(
        path, actor_params=state.params, actor_batch_stats=state.batch_stats,
        opt_state=state.opt_state, flags=flags,
        embedding_state={"conv.weight": np.ones((3, 3), np.float32)})

    payload = ckpt.load_checkpoint(path)
    assert set(payload) >= {
        "actor_model_state_dict", "actor_model_optimizer_state_dict",
        "scheduler_state_dict", "flags", "embedding_model_state_dict"}
    assert payload["scheduler_state_dict"]["last_epoch"] == 2
    assert payload["flags"]["learning_rate"] == 1e-3

    params, stats = ckpt.split_actor_state(payload["actor_model_state_dict"])
    assert set(params) == set(state.params)
    assert set(stats) == set(state.batch_stats)
    for key in state.params:
        np.testing.assert_array_equal(np.asarray(params[key]),
                                      np.asarray(state.params[key]))
    opt_state = ckpt.restore_opt_state(payload)
    assert int(opt_state.count) == 2
    np.testing.assert_array_equal(
        np.asarray(opt_state.square_avg["policy.weight"]),
        np.asarray(state.opt_state.square_avg["policy.weight"]))


def test_lr_decay_continues_after_restore(tmp_path):
    """The linear-decay factor depends on the restored step count."""
    opt = optim.rmsprop_torch(1.0, max_epochs=10)
    params = {"w": jnp.ones(3)}
    state = opt.init(params)
    grads = {"w": jnp.ones(3)}
    for _ in range(3):
        updates, state = opt.update(grads, state)
    # step 4 (count=3): factor = 1 - 4/10 = 0.6; with constant unit
    # grads, square_avg after k steps is 1 - alpha^k.
    updates, _ = opt.update(grads, state)
    magnitude = float(-updates["w"][0])
    want = 0.6 / (np.sqrt(1 - 0.99 ** 4) + 1e-5)
    assert magnitude == pytest.approx(want, rel=1e-3)
