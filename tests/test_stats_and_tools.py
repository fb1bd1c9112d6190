"""Stats-pickle golden layout, essential-save gating, and tool smoke
tests (gen_all / episode dataset / sweep executors)."""

import gzip
import json
import os
import sys

import numpy as np

from pvr_habitat_tpu.utils import stats as stats_util


def test_stats_layout_matches_reference_contract():
    stats = stats_util.new_stats("HabitatImageNav-apartment_0")
    expected = {"episode_return", "episode_success", "frames",
                "training_loss", "gradient_norm"}
    assert set(stats["HabitatImageNav-apartment_0"]) == expected
    stats_util.append_eval(stats, "HabitatImageNav-apartment_0",
                           {"episode_return": [1.0, 3.0],
                            "episode_success": [0.0, 1.0]})
    s = stats["HabitatImageNav-apartment_0"]
    assert s["episode_return"] == [2.0]
    assert s["episode_success"] == [0.5]
    stats_util.append_nan_eval(stats, "HabitatImageNav-apartment_0")
    assert np.isnan(s["episode_return"][1])


def test_stats_atomic_save_and_load(tmp_path):
    stats = stats_util.new_stats("env")
    stats["env"]["frames"].append(42)
    path = str(tmp_path / "run.pickle")
    stats_util.save_stats(path, stats)
    assert stats_util.load_stats(path)["env"]["frames"] == [42]
    assert not os.path.exists(path + ".tmp")


def test_is_essential_save_marks():
    """1/10/50/97 % marks with a +-5*eval_frequency window
    (reference: src/utils_bc.py:5-12)."""
    max_epochs, freq = 100000, 200
    window = 5 * freq
    for frac in (0.01, 0.1, 0.5, 0.97):
        center = int(frac * max_epochs)
        assert stats_util.is_essential_save(center, max_epochs, freq)
        assert stats_util.is_essential_save(center - window, max_epochs, freq)
        assert not stats_util.is_essential_save(center + window, max_epochs,
                                                freq)
    assert not stats_util.is_essential_save(30000, max_epochs, freq)


def test_run_save_path_naming():
    from pvr_habitat_tpu.utils.flags import default_flags

    flags = default_flags(env="A", to_env="B", embedding_name="resnet50",
                          run_id=7, save_path="out")
    assert stats_util.run_save_path(flags) == \
        os.path.join("out", "A_emresnet50_s7_B")
    assert stats_util.run_save_path(flags, "random_finetuned") == \
        os.path.join("out", "A_emrandom_finetuned_s7_B")


def test_make_episode_dataset(tmp_path):
    from pvr_habitat_tpu.tools import make_episode_dataset as med

    out = str(tmp_path / "replica_train.json.gz")
    sys.argv = ["make_episode_dataset", "--out", out,
                "--scene_path", "mesh.ply"]
    med.main()
    with gzip.open(out, "rt") as handle:
        payload = json.load(handle)
    ep = payload["episodes"][0]
    assert ep["scene_id"] == "mesh.ply"
    assert len(ep["goals"]) == 1


def test_gen_all_smoke(tmp_path, monkeypatch):
    from pvr_habitat_tpu.tools import gen_all

    monkeypatch.setattr(gen_all, "BC_SCENES", ["room_0"])
    sys.argv = ["gen_all", "--layout", "pickle", "--fake",
                "--n_trajectories", "2", "--save_path", str(tmp_path),
                "--max_episode_steps", "40"]
    gen_all.main()
    assert os.path.isfile(tmp_path / "FakePointNav-room_0.pickle")


def test_sweep_local_executor_end_to_end(tmp_path):
    """A tiny real sweep through the local executor: one true_state BC
    job runs to completion and writes its stats pickle."""
    import jax

    from pvr_habitat_tpu.data import formats
    from pvr_habitat_tpu.tools import sweep
    from pvr_habitat_tpu.tools.save_opt_trajectories import gen_data_habitat
    from pvr_habitat_tpu.utils.flags import default_flags

    env = "FakeImageNav-room_0"
    gflags = default_flags(env=env, save_path=str(tmp_path),
                           max_episode_steps=25)
    gflags.n_trajectories = 3
    gen_data_habitat(gflags)
    raw = formats.load_pickle(formats.raw_path(str(tmp_path), env))
    data = {k: np.concatenate(raw[k])
            for k in ("action", "reward", "done", "true_state")}
    formats.save_embedded(
        formats.embedded_path(str(tmp_path), env, "resnet50"),
        np.zeros((len(data["action"]), 4), np.float32),
        data["action"], data["reward"], data["done"], data["true_state"])

    grid = dict(
        env=[env], to_env=[env], embedding_name=["true_state"],
        run_id=[1], save_path=[os.path.join(str(tmp_path), "latest")],
        data_path=[str(tmp_path)], batch_size=[2], unroll_length=[5],
        n_episodes_test=[1], eval_frequency=[1], max_episode_steps=[15],
        debug=[True],
    )
    jobs = sweep.run_bc_sweep(
        grid, sweep.LocalExecutor(),
        max_frames_map={env: 2 * 5 * 2})
    assert jobs == ["local"]
    stem = os.path.join(str(tmp_path), "latest",
                        f"{env}_emtrue_state_s1_{env}")
    assert os.path.isfile(stem + ".pickle")
    # relaunch skips the completed run
    jobs2 = sweep.run_bc_sweep(grid, sweep.LocalExecutor(),
                               max_frames_map={env: 2 * 5 * 2})
    assert jobs2 == []


def test_sweep_subprocess_flag_serialization():
    from pvr_habitat_tpu.tools.sweep import _flags_to_cli
    from pvr_habitat_tpu.utils.flags import build_parser, default_flags

    flags = default_flags(batch_norm=True, run_id=3,
                          env="FakePointNav-room_0")
    cli = _flags_to_cli(flags)
    parsed = build_parser().parse_args(cli)
    assert parsed.batch_norm and parsed.run_id == 3
    assert parsed.env == "FakePointNav-room_0"
    assert parsed.pretrained_embedding  # store-false flag preserved
