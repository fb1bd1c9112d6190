"""EmbeddingNet runtime: bucketing, chunking, persistence, and the
eval/train output contract."""

import numpy as np

import jax.numpy as jnp

from pvr_habitat_tpu.models.embedding_net import EmbeddingNet


def test_bucketing_and_large_batch_chunking():
    net = EmbeddingNet("random", pretrained=False, max_bucket=8)
    frames = np.random.RandomState(0).randint(
        0, 256, size=(21, 64, 64, 3), dtype=np.uint8)  # > max_bucket
    out = net(frames)
    assert out.shape == (21, 1568)
    # identical to one-by-one embedding (padding must not leak)
    row = net(frames[3:4])
    np.testing.assert_allclose(out[3], row, atol=1e-5, rtol=1e-5)


def test_eval_returns_numpy_train_returns_jax():
    net = EmbeddingNet("random", pretrained=False)
    frames = np.zeros((2, 64, 64, 3), np.uint8)
    assert isinstance(net(frames), np.ndarray)
    net_train = EmbeddingNet("random", pretrained=False, train=True)
    assert isinstance(net_train(frames), jnp.ndarray)


def test_true_state_passthrough():
    net = EmbeddingNet("true_state")
    obs = np.arange(12, dtype=np.float32).reshape(1, 12)
    np.testing.assert_array_equal(net(obs), obs.squeeze())
    assert net.out_size == 12


def test_save_load_roundtrip(tmp_path):
    net = EmbeddingNet("random", pretrained=False, run_id=3)
    path = str(tmp_path / "random_3.tar")
    net.save(path)
    net2 = EmbeddingNet("random", pretrained=False, run_id=9)
    net2.load(path)
    frames = np.random.RandomState(1).randint(
        0, 256, size=(2, 64, 64, 3), dtype=np.uint8)
    np.testing.assert_allclose(net(frames), net2(frames), atol=1e-5)


def test_random_encoder_is_run_id_dependent():
    a = EmbeddingNet("random", pretrained=False, run_id=1)
    b = EmbeddingNet("random", pretrained=False, run_id=2)
    frames = np.full((1, 64, 64, 3), 100, np.uint8)
    assert not np.allclose(a(frames), b(frames))
