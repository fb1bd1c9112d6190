"""Batched (lockstep) evaluation equivalence with the sequential
protocol on FakeNav."""

import numpy as np

from pvr_habitat_tpu.envs.environment import make_environment
from pvr_habitat_tpu.models import policy
from pvr_habitat_tpu.train.evaluate import PolicyRunner, batched_test
from pvr_habitat_tpu.train.evaluate import test as sequential_test
from pvr_habitat_tpu.utils.flags import default_flags


def _runner(obs_size, num_actions=3, seed=0):
    params, stats = policy.init_policy_params(
        np.random.RandomState(seed), obs_size, num_actions)
    return PolicyRunner(params, stats)


def test_batched_eval_runs_and_counts_episodes():
    flags = default_flags(env="FakePointNav-room_0",
                          embedding_name="true_state",
                          max_episode_steps=25)
    envs = [make_environment(flags, None, actor_id=i + 1) for i in range(3)]
    runner = _runner(12)
    stats = batched_test(runner, envs, ["episode_return", "episode_success"],
                         n_episodes=5)
    assert len(stats["episode_return"]) == 5
    assert len(stats["episode_success"]) == 5
    assert all(np.isfinite(stats["episode_return"]))
    for env in envs:
        env.close()


def test_batched_embedded_matches_wrapped():
    """Shared-encoder eval == per-env EmbeddingWrapper eval (K=1, same
    seeds)."""
    from pvr_habitat_tpu.models.embedding_net import EmbeddingNet
    from pvr_habitat_tpu.train.evaluate import batched_test_embedded

    embedding = EmbeddingNet("random", pretrained=False, run_id=1)
    runner = _runner(embedding.out_size, seed=2)

    flags = default_flags(env="FakePointNav-room_0",
                          embedding_name="random", max_episode_steps=20)
    env_wrapped = make_environment(flags, embedding)
    want = sequential_test(runner, env_wrapped, ["episode_return"],
                           n_episodes=2)
    env_wrapped.close()

    env_raw = make_environment(flags, None)
    got = batched_test_embedded(runner, [env_raw], embedding,
                                ["episode_return"], n_episodes=2)
    env_raw.close()
    np.testing.assert_allclose(got["episode_return"],
                               want["episode_return"], atol=1e-5)


def test_batched_eval_k1_matches_sequential():
    """With K=1 and the same seeds, batched == sequential exactly."""
    flags = default_flags(env="FakePointNav-room_0",
                          embedding_name="true_state",
                          max_episode_steps=25)
    runner = _runner(12, seed=1)
    env_a = make_environment(flags, None)
    seq = sequential_test(runner, env_a, ["episode_return"], n_episodes=3)
    env_a.close()

    env_b = make_environment(flags, None)
    bat = batched_test(runner, [env_b], ["episode_return"], n_episodes=3)
    env_b.close()
    np.testing.assert_allclose(seq["episode_return"], bat["episode_return"])
