"""Hermetic end-to-end slice (SURVEY.md §7 build step 2): FakeNav expert
data generation -> bulk embedding -> BC training -> online eval ->
stats/checkpoint -> resume -> completed-run early exit.  All formats are
the drop-in contracts of §2.2."""

import os

import numpy as np
import pytest

from pvr_habitat_tpu.data import formats
from pvr_habitat_tpu.tools.save_embedded_obs import run as embed_run
from pvr_habitat_tpu.tools.save_opt_trajectories import gen_data_habitat
from pvr_habitat_tpu.train.bc import run as bc_run
from pvr_habitat_tpu.utils.flags import default_flags

ENV = "FakePointNav-apartment_0"


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("e2e")


@pytest.fixture(scope="module")
def raw_data(workdir):
    flags = default_flags(env=ENV, save_path=str(workdir),
                          max_episode_steps=60)
    flags.n_trajectories = 6
    path = gen_data_habitat(flags)
    return path


def test_raw_trajectory_format(raw_data):
    data = formats.load_pickle(raw_data)
    assert set(data) == {"obs", "action", "reward", "done", "true_state"}
    assert len(data["obs"]) == 6  # list of per-trajectory arrays
    first = data["obs"][0]
    assert first.dtype == np.uint8 and first.shape[1:] == (64, 64, 3)
    assert len(data["action"][0]) == len(first)
    assert data["true_state"][0].shape[1] == 12
    # expert data: last step of each trajectory is done
    assert all(traj[-1] for traj in data["done"])


@pytest.fixture(scope="module")
def embedded_data(workdir, raw_data):
    flags = default_flags(env=ENV, data_path=str(workdir),
                          embedding_name="random", batch_size=64)
    flags.n_trajectories = -1
    flags.source = "pickle"
    return embed_run(flags)


def test_embedded_format_and_idempotency(workdir, embedded_data):
    data = formats.load_pickle(embedded_data)
    n = len(data["reward"])
    assert data["obs"].shape == (n, 1568)  # random encoder dim (SURVEY §2.4)
    assert data["true_state"].shape == (n, 12)
    # weights persisted with the run-id suffix for 'random'
    assert os.path.isfile(os.path.join(str(workdir), "random_1.tar"))
    # idempotent: second call returns immediately with the same file
    mtime = os.path.getmtime(embedded_data)
    flags = default_flags(env=ENV, data_path=str(workdir),
                          embedding_name="random")
    flags.n_trajectories = -1
    flags.source = "pickle"
    assert embed_run(flags) == embedded_data
    assert os.path.getmtime(embedded_data) == mtime


def _bc_flags(workdir, **kw):
    return default_flags(
        env=ENV, to_env=ENV, data_path=str(workdir),
        save_path=os.path.join(str(workdir), "bc"),
        embedding_name="random", batch_size=4, unroll_length=10,
        max_frames=4 * 10 * 6, eval_frequency=3, n_episodes_test=2,
        max_episode_steps=40, debug=True, **kw)


@pytest.mark.slow
def test_bc_precomputed_train_eval_checkpoint_resume(workdir, embedded_data):
    flags = _bc_flags(workdir)
    stats = bc_run(flags, mode="precomputed")
    save_stem = os.path.join(
        str(workdir), "bc", f"{ENV}_emrandom_s1_{ENV}")
    assert os.path.isfile(save_stem + ".pickle")
    assert os.path.isfile(save_stem + ".tar")

    s = stats[ENV]
    # initial eval + evals at epochs 3 and 6 (1-based eval_frequency=3)
    assert len(s["frames"]) == len(s["training_loss"]) == \
        len(s["episode_return"]) == len(s["gradient_norm"])
    assert s["frames"][0] == 0 and np.isnan(s["training_loss"][0])
    assert np.isfinite(s["training_loss"][1:]).all()
    assert np.isfinite(s["gradient_norm"][1:]).all()

    # Completed-run early exit (reference: main_bc_2.py:50-56): triggers
    # when the recorded frames reach the requested budget.
    flags_done = _bc_flags(workdir)
    flags_done.max_frames = s["frames"][-1]
    assert bc_run(flags_done, mode="precomputed") is None

    # Resume with a larger budget continues from the checkpoint.
    flags2 = _bc_flags(workdir)
    flags2.max_frames = 4 * 10 * 9
    stats2 = bc_run(flags2, mode="precomputed")
    assert stats2[ENV]["frames"][-1] > s["frames"][-1]


@pytest.mark.slow
def test_bc_embed_at_load_runs(workdir, raw_data):
    flags = _bc_flags(workdir)
    flags.max_frames = 4 * 10 * 3
    flags.save_path = os.path.join(str(workdir), "bc1")
    stats = bc_run(flags, mode="embed_at_load")
    assert np.isfinite(stats[ENV]["training_loss"][-1])


@pytest.mark.slow
def test_bc_finetune_runs(workdir, raw_data):
    flags = _bc_flags(workdir, batch_norm=True)
    flags.max_frames = 4 * 10 * 3
    flags.save_path = os.path.join(str(workdir), "bcft")
    stats = bc_run(flags, mode="finetune")
    assert np.isfinite(stats[ENV]["training_loss"][-1])
    stem = os.path.join(str(workdir), "bcft",
                        f"{ENV}_emrandom_finetuned_s1_{ENV}")
    assert os.path.isfile(stem + ".tar")


@pytest.mark.slow
def test_main_bc_2_cli_subprocess(workdir, embedded_data):
    """The drop-in CLI accepts the reference flag set end-to-end."""
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"  # overridden below
    env.pop("JAX_PLATFORMS", None)
    env["PVR_TEST_FORCE_CPU"] = "1"
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import main_bc_2, sys;"
        "sys.argv=['main_bc_2.py'] + sys.argv[1:];"
        "from pvr_habitat_tpu.utils.flags import parser;"
        "main_bc_2.run(parser.parse_args(sys.argv[1:]))"
    )
    out = subprocess.run(
        [sys.executable, "-c", code,
         "--env", ENV, "--to_env", ENV, "--embedding_name", "random",
         "--data_path", str(workdir),
         "--save_path", os.path.join(str(workdir), "bc_cli"),
         "--batch_size", "4", "--unroll_length", "10",
         "--max_frames", "80", "--eval_frequency", "2",
         "--n_episodes_test", "1", "--max_episode_steps", "20", "--debug"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=500)
    assert out.returncode == 0, out.stderr[-2000:]
    stem = os.path.join(str(workdir), "bc_cli", f"{ENV}_emrandom_s1_{ENV}")
    assert os.path.isfile(stem + ".pickle")


def test_main_test_cli(workdir, embedded_data):
    """Standalone eval CLI loads a run checkpoint and evaluates it."""
    stem = os.path.join(str(workdir), "bc", f"{ENV}_emrandom_s1_{ENV}")
    if not os.path.isfile(stem + ".tar"):  # produced by the bc test above
        pytest.skip("bc checkpoint not present")
    import main_test

    flags = main_test.parser.parse_args([])
    flags.checkpoint = stem + ".tar"
    flags.env = ENV
    flags.from_env = ENV
    flags.embedding_name = "random"
    flags.data_path = str(workdir)
    flags.n_episodes_test = 1
    flags.max_episode_steps = 30
    cwd = os.getcwd()
    os.chdir(str(workdir))
    try:
        stats = main_test.run(flags)
    finally:
        os.chdir(cwd)
    assert set(stats) == {"episode_return", "episode_step",
                          "episode_success"}
    assert len(stats["episode_return"]) == 1


@pytest.mark.slow
def test_bc_true_state_runs(workdir, embedded_data):
    """true_state reads the resnet50-named pickle's true_state field."""
    src = formats.load_pickle(embedded_data)
    formats.save_embedded(
        formats.embedded_path(str(workdir), ENV, "resnet50"),
        src["obs"], src["action"], src["reward"], src["done"],
        src["true_state"])
    flags = _bc_flags(workdir)
    flags.embedding_name = "true_state"
    flags.max_frames = 4 * 10 * 3
    flags.save_path = os.path.join(str(workdir), "bcts")
    stats = bc_run(flags, mode="precomputed")
    assert np.isfinite(stats[ENV]["training_loss"][-1])


@pytest.mark.slow
def test_bc_chunked_matches_per_epoch(workdir, embedded_data):
    """Full-run gold equivalence: the chunked trainer (lax.scan blocks,
    clamped at eval boundaries) must reproduce the per-epoch trainer's
    whole stats trajectory — losses, grad norms, eval returns — since
    the math and host RNG stream are identical."""
    flags_a = _bc_flags(workdir)
    flags_a.save_path = os.path.join(str(workdir), "bc_seq")
    flags_a.train_chunk = 1           # one dispatch per epoch
    stats_a = bc_run(flags_a, mode="precomputed")[ENV]

    flags_b = _bc_flags(workdir)
    flags_b.save_path = os.path.join(str(workdir), "bc_chunk")
    flags_b.train_chunk = 2           # blocks of 2 against eval_frequency 3
    stats_b = bc_run(flags_b, mode="precomputed")[ENV]

    assert stats_a["frames"] == stats_b["frames"]
    np.testing.assert_allclose(stats_a["training_loss"],
                               stats_b["training_loss"], rtol=1e-5)
    np.testing.assert_allclose(stats_a["gradient_norm"],
                               stats_b["gradient_norm"], rtol=1e-5)
    np.testing.assert_allclose(stats_a["episode_return"],
                               stats_b["episode_return"], rtol=1e-5)
