"""Gym adapter wrappers against a stub ALE/gym surface (gym is not
installed here).  Covers the reference semantics of
src/gym_wrappers.py:98-138 (MiniGrid/Default dict unwrap) and :293-342
(Atari lives/FIRE/no-op), plus the documented soft-reset fix."""

import numpy as np
import pytest

from pvr_habitat_tpu.envs import api
from pvr_habitat_tpu.envs.gym_adapter import (
    AtariWrapper, DefaultWrapper, MiniGridWrapper)


class _FakeALE:
    def __init__(self, parent):
        self._parent = parent

    def lives(self):
        return self._parent._lives


class _FakeAtariEnv(api.Env):
    """Scripted ALE: loses a life every `life_every` steps, episode ends
    when lives hit zero.  Records every action it receives."""

    def __init__(self, lives=3, life_every=4, with_fire=True):
        self.observation_space = api.Box(0, 255, (8, 8, 3), np.uint8)
        self.action_space = api.Discrete(4)
        self._start_lives = lives
        self._lives = lives
        self._life_every = life_every
        self._meanings = (["NOOP", "FIRE", "LEFT", "RIGHT"] if with_fire
                          else ["NOOP", "LEFT", "RIGHT", "UP"])
        self.ale = _FakeALE(self)
        self.actions = []
        self._t = 0
        self.n_resets = 0

    @property
    def unwrapped(self):
        return self

    def get_action_meanings(self):
        return list(self._meanings)

    def _obs(self):
        return np.full((8, 8, 3), self._t % 256, np.uint8)

    def reset(self):
        self.n_resets += 1
        self._lives = self._start_lives
        self._t = 0
        self.actions = []
        return self._obs()

    def step(self, action):
        self.actions.append(int(action))
        self._t += 1
        if self._t % self._life_every == 0:
            self._lives -= 1
        done = self._lives <= 0
        info = {"ale.lives": self._lives}
        return self._obs(), 1.0, done, info


def test_atari_fire_and_noop_prefix():
    env = _FakeAtariEnv()
    wrapper = AtariWrapper(env)
    np.random.seed(0)
    obs = wrapper.reset()
    assert obs.shape == (8, 8, 3)
    n_noop = wrapper._current_no_op
    wrapper.step(3)
    # FIRE(1) first, then the no-ops, then the requested action.
    assert env.actions[0] == 1
    assert env.actions[1:1 + n_noop] == [0] * n_noop
    assert env.actions[-1] == 3


def test_atari_no_fire_env_skips_fire():
    env = _FakeAtariEnv(with_fire=False)
    wrapper = AtariWrapper(env)
    np.random.seed(0)
    wrapper.reset()
    wrapper._current_no_op = 0
    wrapper.step(2)
    assert env.actions == [2]   # no FIRE injected
    assert wrapper._force_fire is False


def test_atari_life_loss_refires_and_success_key():
    env = _FakeAtariEnv(lives=2, life_every=2)
    wrapper = AtariWrapper(env)
    np.random.seed(1)
    wrapper.reset()
    wrapper._current_no_op = 0
    wrapper._force_fire = False
    obs, reward, done, info = wrapper.step(2)
    assert info["success"] == 0.0 and not done
    # second step loses a life -> _force_fire re-arms
    obs, reward, done, info = wrapper.step(2)
    assert wrapper._lives == 1
    assert wrapper._force_fire is True


def test_atari_soft_reset_returns_last_obs_without_env_reset():
    """Documented divergence: the reference's reset() raises
    UnboundLocalError when _real_reset is false; here it returns the
    last step observation and does NOT reset the underlying env."""
    env = _FakeAtariEnv(lives=3, life_every=2)
    wrapper = AtariWrapper(env)
    np.random.seed(2)
    wrapper.reset()
    wrapper._current_no_op = 0
    wrapper._force_fire = False
    obs, _, done, _ = wrapper.step(2)
    assert not done
    n_resets = env.n_resets
    wrapper._real_reset = False
    soft_obs = wrapper.reset()
    assert env.n_resets == n_resets          # no real env reset
    np.testing.assert_array_equal(soft_obs, obs)


def test_atari_episode_end_triggers_real_reset():
    env = _FakeAtariEnv(lives=1, life_every=1)
    wrapper = AtariWrapper(env)
    np.random.seed(3)
    wrapper.reset()
    wrapper._current_no_op = 0
    wrapper._force_fire = False
    _, _, done, _ = wrapper.step(2)
    assert done and wrapper._real_reset
    n_resets = env.n_resets
    wrapper.reset()
    assert env.n_resets == n_resets + 1
    assert wrapper._lives == wrapper._max_lives


class _DictObsEnv(api.Env):
    def __init__(self, key):
        self._key = key
        inner = api.Box(0, 255, (5, 5, 3), np.uint8)
        self.observation_space = _Spaces({key: inner})
        self.action_space = api.Discrete(3)
        self._t = 0

    def _obs(self):
        return {self._key: np.full((5, 5, 3), self._t, np.uint8)}

    def reset(self):
        self._t = 0
        return self._obs()

    def step(self, action):
        self._t += 1
        return self._obs(), float(action), self._t >= 3, {}


class _Spaces:
    def __init__(self, spaces):
        self.spaces = spaces
        self.shape = None


def test_minigrid_unwraps_image_and_success():
    env = _DictObsEnv("image")
    wrapper = MiniGridWrapper(env)
    assert wrapper.observation_space.shape == (5, 5, 3)
    obs = wrapper.reset()
    assert obs.shape == (5, 5, 3)
    obs, rwd, done, info = wrapper.step(2)
    assert info["success"] == 1.0       # reward > 0 -> success
    obs, rwd, done, info = wrapper.step(0)
    assert info["success"] == 0.0


def test_default_wrapper_unwraps_pixels():
    env = _DictObsEnv("pixels")
    wrapper = DefaultWrapper(env)
    assert wrapper.observation_space.shape == (5, 5, 3)
    obs = wrapper.reset()
    assert obs.dtype == np.uint8
    obs, rwd, done, info = wrapper.step(1)
    assert info["success"] == 0.0
    assert obs[0, 0, 0] == 1


def test_atari_requires_noop_first_action():
    class _BadEnv(_FakeAtariEnv):
        def get_action_meanings(self):
            return ["FIRE", "NOOP"]

    with pytest.raises(AssertionError):
        AtariWrapper(_BadEnv())
