"""SubmititExecutor contract tests with a FAKE submitit module.

submitit is not installed here (SURVEY §2.1 sweep rows), so — like the
habitat stub tests — a fake module is injected into sys.modules and the
executor's per-job specs are asserted against the reference's rules:
the 16 GB * n_scenes * (2 if uber) memory heuristic and per-combo job
names from slurm_bc.py:191-205, the fixed 32 GB / 10 CPU embed specs
from slurm_eo.py:149-167, the devlab-on-debug partition swap, and the
random -> embed-at-load runner routing through a real sweep expansion.
"""

import sys
import types

import pytest

from pvr_habitat_tpu.utils.flags import default_flags


class FakeJob:
    def __init__(self, n):
        self.job_id = f"fake-{n}"


class FakeSlurmExecutor:
    def __init__(self, folder):
        self.folder = folder
        self.updates = []
        self.submitted = []

    def update_parameters(self, **kwargs):
        self.updates.append(kwargs)

    def submit(self, fn, *args):
        self.submitted.append((fn, args))
        return FakeJob(len(self.submitted))


class FakeLocalExecutor(FakeSlurmExecutor):
    """Mirrors real submitit: LocalExecutor rejects Slurm-only keys."""

    _VALID = {"timeout_min", "tasks_per_node", "gpus_per_node",
              "nodes", "stderr_to_stdout"}

    def update_parameters(self, **kwargs):
        unexpected = set(kwargs) - self._VALID
        if unexpected:
            raise NameError(f"unexpected parameters: {unexpected}")
        super().update_parameters(**kwargs)


@pytest.fixture()
def fake_submitit(monkeypatch):
    mod = types.ModuleType("submitit")
    mod.SlurmExecutor = FakeSlurmExecutor
    mod.LocalExecutor = FakeLocalExecutor
    monkeypatch.setitem(sys.modules, "submitit", mod)
    return mod


def _executor(**kwargs):
    from pvr_habitat_tpu.tools.sweep import SubmititExecutor

    return SubmititExecutor(**kwargs)


def test_bc_memory_heuristic_and_job_name(fake_submitit):
    ex = _executor(partition="learnfair")
    scenes = "HabitatImageNav-apartment_0,HabitatImageNav-office_0," \
             "HabitatImageNav-room_0"

    flags = default_flags(env=scenes, to_env="HabitatImageNav-office_0",
                          embedding_name="resnet50")
    spec = ex.job_spec(flags)
    assert spec["mem"] == "48GB"            # 16 * 3 scenes
    assert spec["cpus_per_task"] == 5
    assert spec["time"] == 4319
    assert spec["job_name"] == f"bc-resnet50-{scenes}-" \
                               "HabitatImageNav-office_0"
    assert spec["partition"] == "learnfair"
    assert "constraint" not in spec         # GPU-era knob defaults off

    flags = default_flags(env=scenes, to_env="HabitatImageNav-office_0",
                          embedding_name="moco_croponly_uber_345")
    assert ex.job_spec(flags)["mem"] == "96GB"   # x2 for uber fusions


def test_embed_spec_and_debug_partition(fake_submitit):
    ex = _executor(partition="learnfair", kind="embed", debug=True,
                   constraint="pascal", comment="icml_27_01")
    flags = default_flags(env="HabitatImageNav-room_0",
                          embedding_name="mae_base")
    spec = ex.job_spec(flags)
    assert spec["mem"] == "32GB"
    assert spec["cpus_per_task"] == 10
    assert spec["time"] == 1319
    assert spec["partition"] == "devlab"    # debug swap
    assert spec["job_name"] == "emb_obs-mae_base-HabitatImageNav-room_0"
    assert spec["constraint"] == "pascal"
    assert spec["comment"] == "icml_27_01"


def test_submit_updates_parameters_per_job(fake_submitit):
    ex = _executor(partition="p")
    f1 = default_flags(env="a,b", to_env="a", embedding_name="resnet50")
    f2 = default_flags(env="a", to_env="a",
                       embedding_name="moco_aug_uber")
    assert ex.submit(lambda fl: None, f1) == "fake-1"
    assert ex.submit(lambda fl: None, f2) == "fake-2"
    mems = [u["mem"] for u in ex._executor.updates]
    assert mems == ["32GB", "32GB"]   # 16*2 scenes; 16*1*2 uber


def test_local_executor_translates_spec(fake_submitit):
    """local=True must not feed Slurm-only parameters to
    submitit.LocalExecutor (real submitit raises NameError)."""
    ex = _executor(partition="p", local=True)
    flags = default_flags(env="a", to_env="a", embedding_name="resnet50")
    assert ex.submit(lambda fl: None, flags) == "fake-1"
    (update,) = ex._executor.updates
    assert update == {"timeout_min": 4319, "tasks_per_node": 1}


def test_sweep_routes_runners_through_submitit(fake_submitit, tmp_path):
    """A real grid expansion submits through the fake executor without
    executing any training, and routes random -> embed-at-load."""
    from pvr_habitat_tpu.tools.sweep import run_bc_sweep

    ex = _executor(partition="p")
    grid = dict(
        env=["FakeImageNav-hotel_0"],
        to_env=["FakeImageNav-hotel_0"],
        embedding_name=["random", "resnet50"],
        run_id=[1],
        save_path=[str(tmp_path)],
        batch_size=[4],
        unroll_length=[10],
    )
    jobs = run_bc_sweep(grid, executor=ex,
                        max_frames_map={"FakeImageNav-hotel_0": 100})
    assert jobs == ["fake-1", "fake-2"]
    names = [fn.__name__ for fn, _ in ex._executor.submitted]
    assert names == ["runner_random", "runner_pvr"]
    # essential_save_only + batch_norm forced on submitted flags
    # (reference slurm_bc.py:170-173).
    for _, (flags,) in ex._executor.submitted:
        assert flags.essential_save_only
        assert flags.batch_norm


def test_legacy_knobs_warn_deprecation(fake_submitit):
    """The round-2 shim must not silently discard an explicit
    timeout_min/mem_gb/cpus (ADVICE r3): callers get a
    DeprecationWarning naming the ignored knob."""
    import warnings as _warnings

    from pvr_habitat_tpu.tools.sweep import submitit_executor

    with pytest.warns(DeprecationWarning, match="timeout_min, mem_gb"):
        submitit_executor("learnfair", timeout_min=60, mem_gb=64)
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")       # no knobs -> no warning
        submitit_executor("learnfair")
