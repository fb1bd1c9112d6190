"""Online evaluation (reference: src/test_model.py:4-22).

The latency-sensitive path: per simulator step we run the encoder
(inside EmbeddingWrapper) and one policy step, batch 1.  ``PolicyRunner``
keeps a persistent jitted step for a fixed (1, 1, ...) shape — compiled
once, no per-step retrace — and carries the LSTM state across steps.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pvr_habitat_tpu.models import policy as policy_mod


class PolicyRunner:
    """Frozen eval-mode policy (the reference's ``test_model``)."""

    def __init__(self, params, batch_stats=None, *, batch_norm=False,
                 conv_policy=False):
        self.params = params
        self.batch_stats = batch_stats or {}
        apply_fn = (policy_mod.apply_conv_policy if conv_policy
                    else policy_mod.apply_policy)

        def step(params, batch_stats, obs, done, core_state):
            outputs, new_state, _ = apply_fn(
                params, batch_stats, dict(obs=obs, done=done), core_state,
                batch_norm=batch_norm, train=False)
            return outputs["action"], new_state

        self._step = jax.jit(step)

    def initial_state(self, batch_size=1):
        return policy_mod.initial_state(batch_size)

    def __call__(self, env_output, core_state):
        obs = jnp.asarray(env_output["obs"])
        done = jnp.asarray(env_output["done"])
        action, new_state = self._step(self.params, self.batch_stats,
                                       obs, done, core_state)
        return dict(action=np.asarray(action)), new_state


def test(model, env, stat_keys, n_episodes=100):
    """Greedy rollouts; returns {stat: [per-episode values]}
    (reference: src/test_model.py)."""
    env_output = env.initial()
    agent_state = model.initial_state(batch_size=1)
    stats = {k: [] for k in stat_keys}
    for _ in range(n_episodes):
        while True:
            agent_output, agent_state = model(env_output, agent_state)
            env_output = env.step(agent_output["action"])
            if env_output["done"]:
                break
        for k in stat_keys:
            stats[k].append(float(np.asarray(env_output[k])[0][0]))
    return stats
