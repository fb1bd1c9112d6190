"""encoder_study driver contract tests (hermetic, no TPU, no JAX).

The study loop re-runs the idempotent driver through tunnel outages
(docs/ENCODER_STUDY.md).  A wedged tunnel fails every BC subprocess
the same way after ~25 min, so `--abort_on_fail N` must cut a wedged
pass short after N consecutive failures while a healthy run in
between resets the counter (one persistently-bad run can't starve the
rest of the grid).  These tests pin that control flow with a stubbed
subprocess layer.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                "scripts"))

import encoder_study


@pytest.fixture
def stub_stages(monkeypatch, tmp_path):
    """Stub every subprocess + filesystem stage; record BC invocations."""
    calls = []

    monkeypatch.setattr(encoder_study, "stage_datagen",
                        lambda *a, **k: True)
    monkeypatch.setattr(encoder_study, "stage_embed",
                        lambda *a, **k: True)
    monkeypatch.setattr(encoder_study, "run_completed",
                        lambda *a, **k: False)
    monkeypatch.setattr(encoder_study, "collate", lambda *a, **k: [])

    def fake_sh(cmd, timeout, log):
        calls.append(cmd)
        return fake_sh.returncodes[min(len(calls) - 1,
                                       len(fake_sh.returncodes) - 1)]

    fake_sh.returncodes = [1]
    monkeypatch.setattr(encoder_study, "sh", fake_sh)
    return calls, fake_sh


def run_main(monkeypatch, tmp_path, extra):
    argv = ["encoder_study.py", "--workdir", str(tmp_path),
            "--seeds", "3"] + extra
    monkeypatch.setattr(sys, "argv", argv)
    encoder_study.main()


def test_abort_after_n_consecutive_failures(monkeypatch, tmp_path,
                                            stub_stages):
    calls, fake_sh = stub_stages
    fake_sh.returncodes = [1]  # every BC run fails (wedged tunnel)
    with pytest.raises(SystemExit) as excinfo:
        run_main(monkeypatch, tmp_path, ["--abort_on_fail", "2"])
    assert excinfo.value.code == 3
    assert len(calls) == 2  # pass cost 2 runs, not the 15-run grid


def test_success_resets_consecutive_counter(monkeypatch, tmp_path,
                                            stub_stages):
    calls, fake_sh = stub_stages
    # fail, pass, fail, pass, ... — never two consecutive failures,
    # so abort_on_fail=2 must let the full 5x3 grid run.
    fake_sh.returncodes = [1, 0] * 8
    run_main(monkeypatch, tmp_path, ["--abort_on_fail", "2"])
    assert len(calls) == len(encoder_study.ENCODERS) * 3


def test_disabled_by_default(monkeypatch, tmp_path, stub_stages):
    calls, fake_sh = stub_stages
    fake_sh.returncodes = [1]  # every run fails, but no abort flag
    run_main(monkeypatch, tmp_path, [])
    assert len(calls) == len(encoder_study.ENCODERS) * 3
