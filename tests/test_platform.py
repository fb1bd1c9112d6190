"""utils/platform.configure_platform: env + --disable_cuda routing.

The jax backend is already initialized CPU-side by conftest, so the
config update either applies silently or raises RuntimeError (caught);
these tests pin the routing logic by stubbing jax.config.update.
"""

import types

from pvr_habitat_tpu.utils import platform as plat
from pvr_habitat_tpu.utils.flags import default_flags


class _Recorder:
    def __init__(self, raise_runtime=False):
        self.calls = []
        self.raise_runtime = raise_runtime

    def update(self, key, value):
        self.calls.append((key, value))
        if self.raise_runtime:
            raise RuntimeError("backend already initialized")


def _run(monkeypatch, env=None, flags=None, raise_runtime=False):
    rec = _Recorder(raise_runtime)
    fake_jax = types.SimpleNamespace(config=rec)
    monkeypatch.setitem(__import__("sys").modules, "jax", fake_jax)
    monkeypatch.delenv("PVR_TPU_PLATFORM", raising=False)
    if env is not None:
        monkeypatch.setenv("PVR_TPU_PLATFORM", env)
    plat.configure_platform(flags)
    return rec.calls


def test_noop_without_switches(monkeypatch):
    assert _run(monkeypatch, flags=default_flags()) == []
    assert _run(monkeypatch, flags=None) == []


def test_env_forces_platform(monkeypatch):
    assert _run(monkeypatch, env="cpu") == [("jax_platforms", "cpu")]


def test_disable_cuda_forces_cpu(monkeypatch):
    flags = default_flags(disable_cuda=True)
    assert _run(monkeypatch, flags=flags) == [("jax_platforms", "cpu")]


def test_env_wins_over_flag(monkeypatch):
    flags = default_flags(disable_cuda=True)
    assert _run(monkeypatch, env="tpu", flags=flags) == \
        [("jax_platforms", "tpu")]


def test_initialized_backend_is_tolerated(monkeypatch):
    # RuntimeError from jax.config.update must not propagate.
    calls = _run(monkeypatch, env="cpu", raise_runtime=True)
    assert calls == [("jax_platforms", "cpu")]
