"""Multi-scene training: the reference's comma-separated env list
concatenates per-scene datasets (main_bc_2.py:114-143)."""

import os

import numpy as np

from pvr_habitat_tpu.data import formats
from pvr_habitat_tpu.tools.save_embedded_obs import run as embed_run
from pvr_habitat_tpu.tools.save_opt_trajectories import gen_data_habitat
from pvr_habitat_tpu.train.bc import run as bc_run
from pvr_habitat_tpu.utils.flags import default_flags

SCENES = ("FakePointNav-room_0", "FakePointNav-office_0")


def test_multiscene_concat_and_training(tmp_path):
    sizes = {}
    for scene in SCENES:
        gflags = default_flags(env=scene, save_path=str(tmp_path),
                               max_episode_steps=30)
        gflags.n_trajectories = 3
        gen_data_habitat(gflags)
        eflags = default_flags(env=scene, data_path=str(tmp_path),
                               embedding_name="random", batch_size=64)
        eflags.n_trajectories = -1
        eflags.source = "pickle"
        embed_run(eflags)
        sizes[scene] = len(formats.load_pickle(
            formats.embedded_path(str(tmp_path), scene, "random"))["action"])

    flags = default_flags(
        env=",".join(SCENES), to_env=SCENES[0], data_path=str(tmp_path),
        save_path=os.path.join(str(tmp_path), "bc"),
        embedding_name="random", batch_size=4, unroll_length=8,
        max_frames=4 * 8 * 2, eval_frequency=2, n_episodes_test=1,
        max_episode_steps=20, debug=False)
    stats = bc_run(flags, mode="precomputed")
    assert np.isfinite(stats[SCENES[0]]["training_loss"][-1])
    # run naming embeds the full comma list (reference contract)
    stem = os.path.join(str(tmp_path), "bc",
                        f"{','.join(SCENES)}_emrandom_s1_{SCENES[0]}")
    assert os.path.isfile(stem + ".pickle")
