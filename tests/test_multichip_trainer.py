"""Trainer-level multi-chip run: --mesh_shape drives DP batch sharding +
TP param sharding through the full bc.run on the 8-device CPU mesh."""

import os
import pytest

pytestmark = pytest.mark.slow

import numpy as np

from pvr_habitat_tpu.data import formats
from pvr_habitat_tpu.tools.save_opt_trajectories import gen_data_habitat
from pvr_habitat_tpu.train.bc import run as bc_run
from pvr_habitat_tpu.utils.flags import default_flags

ENV = "FakePointNav-office_0"


def test_bc_run_on_mesh(tmp_path):
    flags = default_flags(env=ENV, save_path=str(tmp_path),
                          max_episode_steps=30)
    flags.n_trajectories = 4
    gen_data_habitat(flags)

    raw = formats.load_pickle(formats.raw_path(str(tmp_path), ENV))
    data = {k: np.concatenate(raw[k])
            for k in ("action", "reward", "done", "true_state")}
    formats.save_embedded(
        formats.embedded_path(str(tmp_path), ENV, "resnet50"),
        np.zeros((len(data["action"]), 4), np.float32),
        data["action"], data["reward"], data["done"], data["true_state"])

    bc = default_flags(
        env=ENV, to_env=ENV, data_path=str(tmp_path),
        save_path=os.path.join(str(tmp_path), "bc"),
        embedding_name="true_state", batch_size=8, unroll_length=10,
        max_frames=8 * 10 * 4, eval_frequency=2, n_episodes_test=1,
        max_episode_steps=30, debug=True, mesh_shape="4,2",
        batch_norm=True)
    stats = bc_run(bc, mode="precomputed")
    assert np.isfinite(stats[ENV]["training_loss"][-1])
    assert np.isfinite(stats[ENV]["gradient_norm"][-1])
