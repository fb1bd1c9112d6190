"""The jitted BC train step.

One compiled function does what the reference's per-epoch Python body
does (main_bc_2.py:186-227): forward (MLP -> scan-LSTM -> heads), NLL
loss against expert actions, grad, pre-clip global grad-norm metric,
clip(40), torch-RMSprop update with the linear-decay factor.  Under a
device mesh, the batch axis is sharded over 'data' and XLA inserts the
grad all-reduce (see pvr_habitat_tpu.parallel).
"""

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from pvr_habitat_tpu.models import policy as policy_mod
from pvr_habitat_tpu.train import optim


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: optim.RMSpropTorchState
    rng: jax.Array


def create_train_state(rng_np, obs_shape, num_actions, flags, *,
                       conv_policy=False, max_epochs=None, seed=0):
    """Fresh TrainState + the optimizer (kept for update fn closure)."""
    if conv_policy:
        params, stats = policy_mod.init_conv_policy_params(
            rng_np, obs_shape, num_actions, batch_norm=flags.batch_norm)
    else:
        params, stats = policy_mod.init_policy_params(
            rng_np, obs_shape[0], num_actions, batch_norm=flags.batch_norm)
    opt = optim.rmsprop_torch(
        flags.learning_rate, alpha=flags.alpha, eps=flags.epsilon,
        momentum=flags.momentum, max_epochs=max_epochs)
    state = TrainState(
        params=params,
        batch_stats=stats,
        opt_state=opt.init(params),
        rng=jax.random.PRNGKey(seed),
    )
    return state, opt


def nll_loss(logits, actions):
    """F.nll_loss(F.log_softmax(logits), target): mean cross entropy
    over the merged (T*B) axis (reference: main_bc_2.py:211-214)."""
    flat_logits = logits.reshape(-1, logits.shape[-1])
    flat_actions = actions.reshape(-1).astype(jnp.int32)
    return optax.softmax_cross_entropy_with_integer_labels(
        flat_logits, flat_actions).mean()


def make_train_step(opt, *, batch_norm=False, conv_policy=False,
                    max_grad_norm=40.0, donate=True):
    """Returns jitted step(state, batch) -> (state, metrics).

    batch: dict(obs=(T, B, ...), action=(T, B), done=(T, B)).
    metrics: dict(loss, gradient_norm) — pre-clip norm, as logged by the
    reference.
    """
    apply_fn = (policy_mod.apply_conv_policy if conv_policy
                else policy_mod.apply_policy)

    def step(state, batch):
        return _step_body(state, batch, opt, apply_fn, batch_norm,
                          max_grad_norm)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_train_step_fused_gather(opt, unroll_length, *, batch_norm=False,
                                 conv_policy=False, max_grad_norm=40.0,
                                 donate=True, mesh=None):
    """Single-dispatch variant: the unroll gather runs INSIDE the jitted
    step, so one device call per epoch covers gather+forward+backward+
    update (the per-dispatch tunnel latency would otherwise dominate the
    small BC step).  ``data`` is the device-resident dataset dict.

    With ``mesh``, the dataset is replicated across devices (BC datasets
    are small — embeddings, not frames) and the gathered batch is
    sharding-constrained to B-over-'data', so each device gathers only
    its own DP lanes locally — no host gather, no per-epoch h2d puts,
    still one dispatch per epoch on a multi-chip mesh.

    Returns jitted step(state, data, starts) -> (state, metrics)."""
    apply_fn = (policy_mod.apply_conv_policy if conv_policy
                else policy_mod.apply_policy)

    def step(state, data, starts):
        n = data["action"].shape[0]
        idx = (starts[None, :]
               + jnp.arange(unroll_length)[:, None]) % n
        batch = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}
        if mesh is not None:
            from jax.sharding import NamedSharding

            from pvr_habitat_tpu.parallel import mesh as pmesh

            batch = {
                k: jax.lax.with_sharding_constraint(
                    v, NamedSharding(mesh, pmesh.shard_batch_spec(v.ndim)))
                for k, v in batch.items()}
        return _step_body(state, batch, opt, apply_fn, batch_norm,
                          max_grad_norm)

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_train_step_chunked(opt, unroll_length, *, batch_norm=False,
                            conv_policy=False, max_grad_norm=40.0,
                            donate=True, mesh=None):
    """K train epochs in ONE device dispatch.

    ``lax.scan`` over a (K, B) block of pre-sampled unroll starts, each
    scan iteration being exactly the fused-gather step body — the host
    samples the same start indices from the same RNG stream, just K
    epochs at a time, so the math and batch order are identical to K
    sequential ``make_train_step_fused_gather`` calls (equivalence is
    unit-tested).  Purpose: per-dispatch latency through the TPU tunnel
    (~24 ms per blocking fetch, CLAUDE.md) dominates the small BC step;
    one dispatch per eval block instead of per epoch removes it.

    Returns jitted chunk(state, data, starts_block) -> (state, metrics)
    where starts_block is (K, B) int32 and metrics are from the LAST
    epoch in the block (matching what the per-epoch loop logs at eval
    points, main_bc_2.py:230-233).
    """
    apply_fn = (policy_mod.apply_conv_policy if conv_policy
                else policy_mod.apply_policy)

    def chunk(state, data, starts_block):
        n = data["action"].shape[0]

        def body(carry, starts):
            idx = (starts[None, :]
                   + jnp.arange(unroll_length)[:, None]) % n
            batch = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}
            if mesh is not None:
                from jax.sharding import NamedSharding

                from pvr_habitat_tpu.parallel import mesh as pmesh

                batch = {
                    k: jax.lax.with_sharding_constraint(
                        v,
                        NamedSharding(mesh, pmesh.shard_batch_spec(v.ndim)))
                    for k, v in batch.items()}
            return _step_body(carry, batch, opt, apply_fn, batch_norm,
                              max_grad_norm)

        state, metrics = jax.lax.scan(body, state, starts_block)
        return state, {k: v[-1] for k, v in metrics.items()}

    return jax.jit(chunk, donate_argnums=(0,) if donate else ())


def _step_body(state, batch, opt, apply_fn, batch_norm, max_grad_norm):
    rng, sample_rng = jax.random.split(state.rng)
    t, b = batch["action"].shape
    init_state = policy_mod.initial_state(b)

    def loss_fn(params):
        outputs, _, new_stats = apply_fn(
            params, state.batch_stats,
            dict(obs=batch["obs"], done=batch["done"]),
            init_state, batch_norm=batch_norm, train=True,
            rng=sample_rng)
        return nll_loss(outputs["policy_logits"], batch["action"]), \
            new_stats

    (loss, new_stats), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    grads, gnorm = optim.clip_by_global_norm_torch(grads, max_grad_norm)
    updates, new_opt_state = opt.update(grads, state.opt_state,
                                        state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = TrainState(params, new_stats, new_opt_state, rng)
    return new_state, dict(loss=loss, gradient_norm=gnorm)
