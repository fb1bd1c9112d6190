"""Train-step parity: N iterations of our jitted BC step must track a
torch loop implementing the reference semantics (NLL loss, LambdaLR
stepped before the optimizer, clip_grad_norm_(40), RMSprop) to high
precision — losses, grad norms, and final parameters."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from pvr_habitat_tpu.data import sampler
from pvr_habitat_tpu.models import convert
from pvr_habitat_tpu.train import bc_step, optim
from pvr_habitat_tpu.utils.flags import default_flags
from tests.torch_ref.policy import TorchPolicy

T, B, OBS, ACTIONS = 5, 4, 16, 3
MAX_EPOCHS = 50


def _batches(n_iters, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n_iters):
        out.append(dict(
            obs=rng.randn(T, B, OBS).astype(np.float32),
            action=rng.randint(0, ACTIONS, size=(T, B)).astype(np.int64),
            done=(rng.rand(T, B) < 0.2),
        ))
    return out


def _torch_loop(model, batches, lr=1e-3):
    opt = torch.optim.RMSprop(model.parameters(), lr=lr, momentum=0.0,
                              eps=1e-5, alpha=0.99)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lambda epoch: 1 - epoch / MAX_EPOCHS)
    losses, gnorms = [], []
    for batch in batches:
        logits, _, _ = model(torch.from_numpy(batch["obs"]),
                             torch.from_numpy(batch["done"]),
                             model.initial_state(B))
        loss = F.nll_loss(F.log_softmax(logits.flatten(0, 1), dim=-1),
                          torch.from_numpy(batch["action"]).flatten())
        sched.step()
        opt.zero_grad()
        loss.backward()
        gnorm = 0.0
        for p in model.parameters():
            if p.grad is not None:
                gnorm += float(p.grad.detach().norm(2)) ** 2
        gnorms.append(gnorm ** 0.5)
        torch.nn.utils.clip_grad_norm_(model.parameters(), 40.0)
        opt.step()
        losses.append(float(loss))
    return losses, gnorms


def test_train_step_parity_full_loop():
    batches = _batches(6)
    model = TorchPolicy(OBS, ACTIONS)
    model.train()
    params = convert.torch_state_dict_to_flat(model.state_dict())

    flags = default_flags(learning_rate=1e-3, batch_norm=False)
    opt = optim.rmsprop_torch(1e-3, alpha=0.99, eps=1e-5,
                              max_epochs=MAX_EPOCHS)
    state = bc_step.TrainState(
        params=params, batch_stats={}, opt_state=opt.init(params),
        rng=__import__("jax").random.PRNGKey(0))
    step = bc_step.make_train_step(opt, donate=False)

    our_losses, our_gnorms = [], []
    for batch in batches:
        state, metrics = step(state, {k: jnp.asarray(v)
                                      for k, v in batch.items()})
        our_losses.append(float(metrics["loss"]))
        our_gnorms.append(float(metrics["gradient_norm"]))

    want_losses, want_gnorms = _torch_loop(model, batches)
    np.testing.assert_allclose(our_losses, want_losses, atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(our_gnorms, want_gnorms, atol=5e-3, rtol=5e-3)

    # Final parameters agree across the 6 updates.  Early RMSprop steps
    # divide by sqrt(square_avg) ~ |g|, so float-eps gradient differences
    # get amplified on a few elements; 5e-3 is the realistic bound.
    want = convert.torch_state_dict_to_flat(model.state_dict())
    for key in want:
        np.testing.assert_allclose(
            np.asarray(state.params[key]), np.asarray(want[key]),
            atol=5e-3, rtol=1e-3, err_msg=key)


def test_sample_with_minimum_distance_properties():
    import random as pyrandom
    pyrandom.seed(7)
    for _ in range(20):
        starts = sampler.sample_with_minimum_distance(n=1000, k=8, d=100)
        assert len(starts) == 8
        assert all(0 <= s < 1000 for s in starts)
        s = sorted(starts)
        assert all(b - a >= 100 for a, b in zip(s, s[1:]))


def test_gather_unrolls_wraparound():
    data = dict(obs=np.arange(10, dtype=np.float32).reshape(10, 1))
    out = sampler.gather_unrolls(data, [7], 5)
    np.testing.assert_array_equal(
        np.asarray(out["obs"]).ravel(), [7, 8, 9, 0, 1])


@pytest.mark.slow
def test_fused_gather_on_mesh_matches_host_gather():
    """The mesh fused-gather step (dataset replicated, batch gathered
    in-step and constrained to DP lanes) must produce the same loss and
    update as host-gather + shard_batch."""
    from pvr_habitat_tpu.parallel import mesh as pmesh

    rng = np.random.RandomState(0)
    t, b, obs_size, num_actions, n = 6, 8, 16, 3, 64
    flags = default_flags(learning_rate=1e-3)
    data = dict(
        obs=rng.randn(n, obs_size).astype(np.float32),
        action=rng.randint(0, num_actions, size=n).astype(np.int32),
        done=(rng.rand(n) < 0.1),
    )
    starts = np.array([0, 7, 14, 21, 28, 35, 42, 49], np.int32)
    mesh = pmesh.make_mesh((4, 2))

    def fresh_state():
        state, opt = bc_step.create_train_state(
            np.random.RandomState(1), (obs_size,), num_actions, flags,
            max_epochs=10, seed=3)
        return state, opt

    # host gather + shard
    state_a, opt_a = fresh_state()
    batch = sampler.gather_unrolls_host(data, starts, t)
    batch = pmesh.shard_batch(mesh, batch)
    step_a = bc_step.make_train_step(opt_a, donate=False)
    state_a, metrics_a = step_a(state_a, batch)

    # replicated dataset + in-step gather
    state_b, opt_b = fresh_state()
    dev_data = pmesh.replicate(mesh, {k: jnp.asarray(v)
                                      for k, v in data.items()})
    step_b = bc_step.make_train_step_fused_gather(
        opt_b, t, donate=False, mesh=mesh)
    state_b, metrics_b = step_b(state_b, dev_data, jnp.asarray(starts))

    np.testing.assert_allclose(float(metrics_a["loss"]),
                               float(metrics_b["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state_a.params["policy.weight"]),
        np.asarray(state_b.params["policy.weight"]), atol=1e-6)


def test_chunked_step_matches_sequential_fused_gather():
    """One lax.scan chunk of K epochs must reproduce K sequential
    fused-gather steps exactly: same final params, same last-epoch
    metrics (the chunked trainer logs the block's last metrics,
    main_bc_2.py:230-233)."""
    rng = np.random.RandomState(0)
    t, obs_size, num_actions, n, k_epochs = 6, 16, 3, 64, 5
    flags = default_flags(learning_rate=1e-3)
    data = {
        "obs": jnp.asarray(rng.randn(n, obs_size).astype(np.float32)),
        "action": jnp.asarray(
            rng.randint(0, num_actions, size=n).astype(np.int32)),
        "done": jnp.asarray(rng.rand(n) < 0.1),
    }
    starts_block = rng.randint(0, n, size=(k_epochs, B)).astype(np.int32)

    def fresh_state():
        return bc_step.create_train_state(
            np.random.RandomState(1), (obs_size,), num_actions, flags,
            max_epochs=10, seed=3)

    state_a, opt_a = fresh_state()
    step = bc_step.make_train_step_fused_gather(opt_a, t, donate=False)
    for starts in starts_block:
        state_a, metrics_a = step(state_a, data, jnp.asarray(starts))

    state_b, opt_b = fresh_state()
    chunk = bc_step.make_train_step_chunked(opt_b, t, donate=False)
    state_b, metrics_b = chunk(state_b, data, jnp.asarray(starts_block))

    np.testing.assert_allclose(float(metrics_a["loss"]),
                               float(metrics_b["loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(metrics_a["gradient_norm"]),
                               float(metrics_b["gradient_norm"]), rtol=1e-6)
    for key in state_a.params:
        np.testing.assert_allclose(
            np.asarray(state_a.params[key]),
            np.asarray(state_b.params[key]), atol=1e-6, err_msg=key)
    np.testing.assert_array_equal(np.asarray(state_a.rng),
                                  np.asarray(state_b.rng))


def test_chunked_step_on_mesh_compiles_and_matches():
    """Chunked scan under the (4,2) mesh: same result as the unmeshed
    chunk (dataset replicated, per-step batch constrained to DP lanes)."""
    from pvr_habitat_tpu.parallel import mesh as pmesh

    rng = np.random.RandomState(0)
    t, obs_size, num_actions, n, k_epochs = 6, 16, 3, 64, 3
    flags = default_flags(learning_rate=1e-3)
    data_host = dict(
        obs=rng.randn(n, obs_size).astype(np.float32),
        action=rng.randint(0, num_actions, size=n).astype(np.int32),
        done=(rng.rand(n) < 0.1),
    )
    starts_block = rng.randint(0, n, size=(k_epochs, 8)).astype(np.int32)

    def fresh_state():
        return bc_step.create_train_state(
            np.random.RandomState(1), (obs_size,), num_actions, flags,
            max_epochs=10, seed=3)

    state_a, opt_a = fresh_state()
    chunk_a = bc_step.make_train_step_chunked(opt_a, t, donate=False)
    state_a, _ = chunk_a(state_a, {k: jnp.asarray(v)
                                   for k, v in data_host.items()},
                         jnp.asarray(starts_block))

    mesh = pmesh.make_mesh((4, 2))
    state_b, opt_b = fresh_state()
    dev_data = pmesh.replicate(mesh, {k: jnp.asarray(v)
                                      for k, v in data_host.items()})
    chunk_b = bc_step.make_train_step_chunked(opt_b, t, donate=False,
                                              mesh=mesh)
    state_b, _ = chunk_b(state_b, dev_data, jnp.asarray(starts_block))

    np.testing.assert_allclose(
        np.asarray(state_a.params["policy.weight"]),
        np.asarray(state_b.params["policy.weight"]), atol=1e-6)
