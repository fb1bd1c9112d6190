"""ImageNav end-to-end: (H, W, 6) frame-goal concat observations flow
through data generation, embedding (frames and goal embedded
separately, dims doubled — src/embeddings.py:441-444), and BC."""

import os

import numpy as np
import pytest

from pvr_habitat_tpu.data import formats
from pvr_habitat_tpu.tools.save_embedded_obs import run as embed_run
from pvr_habitat_tpu.tools.save_opt_trajectories import gen_data_habitat
from pvr_habitat_tpu.train.bc import run as bc_run
from pvr_habitat_tpu.utils.flags import default_flags

ENV = "FakeImageNav-hotel_0"


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    path = tmp_path_factory.mktemp("imagenav")
    flags = default_flags(env=ENV, save_path=str(path),
                          max_episode_steps=40)
    flags.n_trajectories = 4
    gen_data_habitat(flags)
    return path


def test_imagenav_raw_obs_has_goal_channels(workdir):
    data = formats.load_pickle(formats.raw_path(str(workdir), ENV))
    obs = data["obs"][0]
    assert obs.shape[1:] == (64, 64, 6)
    # goal frame is constant within a trajectory
    np.testing.assert_array_equal(obs[0][..., 3:], obs[-1][..., 3:])


def test_imagenav_embedding_doubles_dims(workdir):
    flags = default_flags(env=ENV, data_path=str(workdir),
                          embedding_name="random", batch_size=32)
    flags.n_trajectories = -1
    flags.source = "pickle"
    path = embed_run(flags)
    data = formats.load_pickle(path)
    assert data["obs"].shape[1] == 2 * 1568  # frame ‖ goal embeddings


def test_imagenav_bc_runs(workdir):
    flags = default_flags(
        env=ENV, to_env=ENV, data_path=str(workdir),
        save_path=os.path.join(str(workdir), "bc"),
        embedding_name="random", batch_size=4, unroll_length=8,
        max_frames=4 * 8 * 2, eval_frequency=2, n_episodes_test=1,
        max_episode_steps=30, debug=True)
    stats = bc_run(flags, mode="precomputed")
    assert np.isfinite(stats[ENV]["training_loss"][-1])
