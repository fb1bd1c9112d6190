"""FakeNav simulator + wrapper-stack contract tests (the hermetic
substitute for habitat-sim; SURVEY.md §4 strategy item (b))."""

import numpy as np
import pytest

from pvr_habitat_tpu.envs.environment import make_environment
from pvr_habitat_tpu.envs.fake_nav import FakeNavSim
from pvr_habitat_tpu.envs.wrappers import NavigationWrapper
from pvr_habitat_tpu.utils.flags import default_flags


def test_sim_determinism_and_rendering():
    sim_a = FakeNavSim("apartment_0", seed=1)
    sim_b = FakeNavSim("apartment_0", seed=1)
    np.testing.assert_array_equal(sim_a.occ, sim_b.occ)
    obs_a = sim_a.reset()["rgb"]
    obs_b = sim_b.reset()["rgb"]
    assert obs_a.shape == (64, 64, 3) and obs_a.dtype == np.uint8
    np.testing.assert_array_equal(obs_a, obs_b)
    # different scenes are visibly different worlds
    sim_c = FakeNavSim("office_0", seed=1)
    assert not np.array_equal(sim_a.occ, sim_c.occ) or \
        not np.array_equal(sim_a.wall_colors, sim_c.wall_colors)


def test_expert_reaches_goal():
    sim = FakeNavSim("room_0", seed=3)
    wrapper = NavigationWrapper(sim, "room_0", seed=3)
    successes = 0
    for _ in range(5):
        wrapper.randomize()
        wrapper.reset()
        actions = sim.shortest_path_actions()
        if actions is None:
            continue
        assert 0 < len(actions) <= 500
        done = False
        for a in actions:
            obs, rwd, done, info = wrapper.step(a - 1)  # wrapper re-adds +1
            if done:
                break
        if done and info["success"]:
            successes += 1
    assert successes >= 3, f"expert solved only {successes}/5 episodes"


def test_navigation_wrapper_contract():
    sim = FakeNavSim("hotel_0", seed=2)
    env = NavigationWrapper(sim, "hotel_0", image_goal=True, seed=2)
    assert env.action_space.n == 3  # STOP removed
    obs = env.reset()
    assert obs.shape == (64, 64, 6)  # ImageNav concat
    ts = env.get_true_state()
    assert ts.shape == (12,)
    assert ts[10] == 4.0 and ts[11] == 0.0  # scene id/version
    obs, rwd, done, info = env.step(0)
    assert obs.shape == (64, 64, 6)
    assert "success" in info
    # normalized reward is bounded by shaping scale
    assert abs(rwd) < 2.0


def test_true_state_mode():
    sim = FakeNavSim("office_0", seed=2)
    env = NavigationWrapper(sim, "office_0", true_state=True, seed=2)
    obs = env.reset()
    assert obs.shape == (12,)


def test_environment_adapter_and_framestack():
    flags = default_flags(env="FakePointNav-apartment_0",
                          embedding_name=None, num_input_frames=2)
    env = make_environment(flags, None)
    out = env.initial()
    assert out["obs"].shape == (1, 1, 64, 64, 6)  # 2 stacked frames
    assert out["done"].shape == (1, 1)
    out = env.step(np.array([[0]]))
    assert out["episode_step"][0, 0] == 1
    assert out["obs"].dtype == np.uint8
    env.close()


def test_randomize_respects_compatibility():
    sim = FakeNavSim("frl_apartment_0", seed=5)
    env = NavigationWrapper(sim, "frl_apartment_0", seed=5)
    for _ in range(3):
        env.randomize()
        env.reset()
        geo = sim.geodesic_distance(sim.pos)
        euclid = float(np.linalg.norm(sim.pos - sim.goal_position))
        assert 1.0 <= geo <= 30.0
        assert geo / max(euclid, 1e-6) >= 1.1 - 1e-6


def test_scene_variety_and_connectivity():
    """Round-2 scene variety: scenes differ in structure (maze depth,
    pillars) and every scene's free space stays fully connected (the
    expert follower must never be walled off)."""
    from pvr_habitat_tpu.envs.fake_nav import FakeNavSim, _free_connected

    wall_counts = set()
    for scene in ("apartment_0", "room_0", "office_1", "hotel_3",
                  "frl_apartment_2"):
        sim = FakeNavSim(scene, seed=0)
        assert _free_connected(sim.occ), scene
        wall_counts.add(int(sim.occ.sum()))
        # determinism per scene name
        sim2 = FakeNavSim(scene, seed=5)
        np.testing.assert_array_equal(sim.occ, sim2.occ)
        np.testing.assert_array_equal(sim.wall_colors, sim2.wall_colors)
    assert len(wall_counts) >= 3, wall_counts  # structural variety
