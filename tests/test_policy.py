"""PolicyNet / PolicyNetWithConv parity vs. the torch oracle, including
LSTM done-masking, BatchNorm1d train/eval, and checkpoint key layout."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from pvr_habitat_tpu.models import convert, policy
from tests.torch_ref.policy import TorchConvPolicy, TorchPolicy


def _episode_batch(t=7, b=3, obs_size=32, seed=0):
    rng = np.random.RandomState(seed)
    obs = rng.randn(t, b, obs_size).astype(np.float32)
    done = rng.rand(t, b) < 0.3
    return obs, done


def test_policy_parity_eval():
    obs, done = _episode_batch()
    model = TorchPolicy(32, 4)
    model.eval()
    params = convert.torch_state_dict_to_flat(model.state_dict())

    with torch.no_grad():
        want_logits, want_baseline, want_state = model(
            torch.from_numpy(obs), torch.from_numpy(done),
            model.initial_state(3))

    outputs, state, _ = policy.apply_policy(
        params, {}, dict(obs=jnp.asarray(obs), done=jnp.asarray(done)),
        policy.initial_state(3))

    np.testing.assert_allclose(np.asarray(outputs["policy_logits"]),
                               want_logits.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(outputs["baseline"]),
                               want_baseline.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(state[0]), want_state[0].numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(state[1]), want_state[1].numpy(),
                               atol=1e-4, rtol=1e-4)
    # eval action = argmax
    np.testing.assert_array_equal(
        np.asarray(outputs["action"]),
        want_logits.argmax(-1).numpy())


def test_policy_parity_batchnorm_train_and_eval():
    obs, done = _episode_batch(seed=1)
    model = TorchPolicy(32, 4, batch_norm=True)
    flat = convert.torch_state_dict_to_flat(model.state_dict())
    params = {k: v for k, v in flat.items() if "running_" not in k}
    stats = {k: v for k, v in flat.items() if "running_" in k}

    # Train mode: batch stats used, running stats updated.
    model.train()
    want_logits, _, _ = model(torch.from_numpy(obs), torch.from_numpy(done),
                              model.initial_state(3))
    outputs, _, new_stats = policy.apply_policy(
        params, stats, dict(obs=jnp.asarray(obs), done=jnp.asarray(done)),
        policy.initial_state(3), batch_norm=True, train=True,
        rng=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(outputs["policy_logits"]),
                               want_logits.detach().numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(new_stats["fc.0.running_mean"]),
        model.fc[0].running_mean.detach().numpy(), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_stats["fc.0.running_var"]),
        model.fc[0].running_var.detach().numpy(), atol=1e-5, rtol=1e-5)

    # Eval mode with the updated stats.
    model.eval()
    with torch.no_grad():
        want_logits, _, _ = model(torch.from_numpy(obs),
                                  torch.from_numpy(done),
                                  model.initial_state(3))
    outputs, _, _ = policy.apply_policy(
        params, new_stats, dict(obs=jnp.asarray(obs), done=jnp.asarray(done)),
        policy.initial_state(3), batch_norm=True, train=False)
    np.testing.assert_allclose(np.asarray(outputs["policy_logits"]),
                               want_logits.numpy(), atol=1e-4, rtol=1e-4)


def test_conv_policy_parity():
    t, b = 3, 2
    rng = np.random.RandomState(2)
    obs = rng.randint(0, 256, size=(t, b, 64, 64, 6), dtype=np.uint8)
    done = rng.rand(t, b) < 0.3

    model = TorchConvPolicy((64, 64, 6), 3)
    model.eval()
    params = convert.torch_state_dict_to_flat(model.state_dict())

    with torch.no_grad():
        want_logits, want_baseline, _ = model(
            torch.from_numpy(obs), torch.from_numpy(done),
            model.initial_state(b))

    outputs, _, _ = policy.apply_conv_policy(
        params, {}, dict(obs=jnp.asarray(obs), done=jnp.asarray(done)),
        policy.initial_state(b))
    np.testing.assert_allclose(np.asarray(outputs["policy_logits"]),
                               want_logits.numpy(), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(outputs["baseline"]),
                               want_baseline.numpy(), atol=1e-4, rtol=1e-4)


def test_init_param_names_match_torch():
    for batch_norm in (False, True):
        want_model = TorchPolicy(16, 4, batch_norm=batch_norm)
        want = {k for k in want_model.state_dict()
                if not k.endswith("num_batches_tracked")}
        params, stats = policy.init_policy_params(
            np.random.RandomState(0), 16, 4, batch_norm=batch_norm)
        assert set(params) | set(stats) == want

    want_model = TorchConvPolicy((64, 64, 3), 3, batch_norm=True)
    want = {k for k in want_model.state_dict()
            if not k.endswith("num_batches_tracked")}
    params, stats = policy.init_conv_policy_params(
        np.random.RandomState(0), (64, 64, 3), 3, batch_norm=True)
    assert set(params) | set(stats) == want
    # conv feature size must agree with torch's dummy-forward computation
    assert params["fc.1.weight"].shape == \
        want_model.state_dict()["fc.1.weight"].shape


def test_lstm_done_masking_resets_state():
    """A done at step t must make steps >= t independent of the past."""
    t, b, obs_size = 6, 1, 8
    rng = np.random.RandomState(3)
    params, _ = policy.init_policy_params(rng, obs_size, 4)
    obs = rng.randn(t, b, obs_size).astype(np.float32)

    done = np.zeros((t, b), bool)
    done[3] = True
    out_masked, _, _ = policy.apply_policy(
        params, {}, dict(obs=jnp.asarray(obs), done=jnp.asarray(done)),
        policy.initial_state(b))

    # Fresh run starting at step 3 with zero state must agree from step 3 on.
    out_fresh, _, _ = policy.apply_policy(
        params, {}, dict(obs=jnp.asarray(obs[3:]),
                         done=jnp.zeros((t - 3, b), bool)),
        policy.initial_state(b))
    np.testing.assert_allclose(
        np.asarray(out_masked["policy_logits"])[3:],
        np.asarray(out_fresh["policy_logits"]), atol=1e-5, rtol=1e-5)
