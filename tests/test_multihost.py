"""Real 2-process jax.distributed run on localhost CPU (SURVEY §2.3
'Distributed comm backend' — the multi-host/DCN path).

Two subprocesses x 4 virtual CPU devices form one 8-device world; each
embeds only its process-local slice via
jax.make_array_from_process_local_data and fetches only its addressable
output shards. The parent validates both slices against a
single-process reference."""

import pytest

pytestmark = pytest.mark.slow

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_localhost_embedding(tmp_path):
    port = _free_port()
    coordinator = f"localhost:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_NUM_CPU_COLLECTIVES_THREADS"] = "1"
    worker = os.path.join(REPO, "tests", "multihost_worker.py")
    procs, outs = [], []
    for rank in range(2):
        out = str(tmp_path / f"rank{rank}.npz")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(rank), out],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    logs = []
    for proc in procs:
        stdout, _ = proc.communicate(timeout=540)
        logs.append(stdout)
        assert proc.returncode == 0, stdout[-2000:]

    # single-process reference over the same deterministic frames
    from pvr_habitat_tpu.models.embedding_net import EmbeddingNet

    frames = np.random.RandomState(0).randint(
        0, 256, size=(37, 64, 64, 3), dtype=np.uint8)
    net = EmbeddingNet("random", pretrained=False)
    want = np.asarray(net(frames), np.float32)

    covered = np.zeros(37, bool)
    for out in outs:
        payload = np.load(out)
        start, stop = int(payload["start"]), int(payload["stop"])
        local = payload["local"]
        assert local.shape == (stop - start, want.shape[1])
        np.testing.assert_allclose(local, want[start:stop],
                                   atol=1e-4, rtol=1e-4)
        covered[start:stop] = True
    assert covered.all()


def test_two_process_localhost_training(tmp_path):
    """bc.run under --coordinator flags: 2 processes x 4 virtual CPU
    devices, ('data','model') mesh over the 8-device world, grad
    all-reduce over the cross-process collectives (SURVEY §2.3 DCN
    training path). Both ranks must produce the identical, finite loss
    trajectory."""
    from pvr_habitat_tpu.data import formats

    env_name = "FakePointNav-hotel_0"
    rng = np.random.RandomState(3)
    n = 200
    formats.save_embedded(
        formats.embedded_path(str(tmp_path), env_name, "resnet50"),
        obs=rng.randn(n, 32).astype(np.float32),
        action=rng.randint(0, 3, size=n).astype(np.int64),
        reward=rng.rand(n).astype(np.float32),
        done=(rng.rand(n) < 0.1),
        true_state=rng.randn(n, 12).astype(np.float32))

    port = _free_port()
    coordinator = f"localhost:{port}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_NUM_CPU_COLLECTIVES_THREADS"] = "1"
    worker = os.path.join(REPO, "tests", "multihost_train_worker.py")
    procs, outs = [], []
    for rank in range(2):
        out = str(tmp_path / f"train_rank{rank}.npz")
        outs.append(out)
        save = tmp_path / f"save{rank}"
        save.mkdir()
        procs.append(subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(rank),
             str(tmp_path), str(save), out],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    for proc in procs:
        stdout, _ = proc.communicate(timeout=540)
        assert proc.returncode == 0, stdout[-3000:]

    r0, r1 = (np.load(out) for out in outs)
    # 2 epochs of loss (plus the initial-eval NaN pad)
    assert r0["loss"].shape == r1["loss"].shape
    assert np.isfinite(r0["loss"][1:]).all(), r0["loss"]
    np.testing.assert_array_equal(r0["loss"][1:], r1["loss"][1:])
    np.testing.assert_array_equal(r0["gnorm"][1:], r1["gnorm"][1:])
    np.testing.assert_array_equal(r0["ret"], r1["ret"])
