"""Embedding server/client: the cross-process TPU serving boundary
(SURVEY §7 — rollout workers stream observations to an inference
server).  Hermetic: server runs in-process on the CPU backend."""

import threading

import numpy as np
import pytest

from pvr_habitat_tpu.models.embedding_net import EmbeddingNet
from pvr_habitat_tpu.tools.serve_embeddings import (EmbeddingClient,
                                                    EmbeddingServer)


@pytest.fixture(scope="module")
def server():
    net = EmbeddingNet("random", pretrained=False)
    srv = EmbeddingServer(net, port=0, max_batch=64, window_ms=5.0)
    srv.start()
    yield srv
    srv.close()


def test_client_matches_direct_embedding(server):
    net = EmbeddingNet("random", pretrained=False)   # same run_id seed
    client = EmbeddingClient(server.address)
    assert client.out_size == net.out_size
    frames = np.random.RandomState(0).randint(
        0, 256, size=(5, 64, 64, 3), dtype=np.uint8)
    got = client(frames)
    want = net(frames)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    client.close()


def test_batch_one_squeeze_contract(server):
    """N=1 responses squeeze like EmbeddingNet (reference
    src/embeddings.py:402) so EmbeddingWrapper sees the same shapes."""
    client = EmbeddingClient(server.address)
    frames = np.random.RandomState(1).randint(
        0, 256, size=(1, 64, 64, 3), dtype=np.uint8)
    out = client(frames)
    assert out.shape == (client.out_size,)
    client.close()


def test_concurrent_clients_microbatch(server):
    """Concurrent rollout workers get correct per-request rows back
    (micro-batching must split the shared dispatch correctly)."""
    net = EmbeddingNet("random", pretrained=False)
    results = {}

    def worker(seed):
        client = EmbeddingClient(server.address)
        rng = np.random.RandomState(seed)
        outs = []
        for _ in range(3):
            frames = rng.randint(0, 256, size=(4, 64, 64, 3),
                                 dtype=np.uint8)
            outs.append((frames, client(frames)))
        client.close()
        results[seed] = outs

    threads = [threading.Thread(target=worker, args=(s,))
               for s in (10, 11, 12)]
    before = server.requests_served
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert len(results) == 3
    for outs in results.values():
        for frames, got in outs:
            np.testing.assert_allclose(got, net(frames),
                                       atol=1e-4, rtol=1e-4)
    assert server.requests_served - before == 9


def test_wrapper_integration(server):
    """EmbeddingClient drops into EmbeddingWrapper in place of a local
    EmbeddingNet."""
    from pvr_habitat_tpu.envs.fake_nav import FakeNavSim
    from pvr_habitat_tpu.envs.wrappers import (EmbeddingWrapper,
                                               NavigationWrapper)

    sim = FakeNavSim("hotel_0", seed=3)
    env = NavigationWrapper(sim, "hotel_0", seed=3)
    client = EmbeddingClient(server.address)
    wrapped = EmbeddingWrapper(env, client)
    obs = wrapped.reset()
    assert obs.shape == (client.out_size,)
    obs, rwd, done, info = wrapped.step(0)
    assert obs.shape == (client.out_size,)
    client.close()


def test_pipelined_mixed_shapes_keep_request_order(server):
    """A connection that pipelines requests with DIFFERENT frame shapes
    must get responses back in request order — the wire protocol has no
    request ids, so shape-grouped dispatch must not reorder them."""
    import socket
    import struct

    from pvr_habitat_tpu.tools.serve_embeddings import _HDR, _RSP

    net = EmbeddingNet("random", pretrained=False)
    rng = np.random.RandomState(30)
    reqs = [rng.randint(0, 256, size=(2, hw, hw, 3), dtype=np.uint8)
            for hw in (32, 64, 32)]

    conn = socket.create_connection(server.address, timeout=60)
    try:
        struct.unpack("<I", _recv(conn, 4))  # handshake: out_size
        for frames in reqs:                  # pipeline all three
            conn.sendall(_HDR.pack(*frames.shape) + frames.tobytes())
        for frames in reqs:
            n, d = _RSP.unpack(_recv(conn, _RSP.size))
            assert n == frames.shape[0]
            out = np.frombuffer(_recv(conn, 4 * n * d),
                                np.float32).reshape(n, d)
            np.testing.assert_allclose(out, net(frames),
                                       atol=1e-4, rtol=1e-4)
        conn.sendall(_HDR.pack(0, 0, 0, 0))
    finally:
        conn.close()


def _recv(conn, n):
    buf = b""
    while len(buf) < n:
        r = conn.recv(n - len(buf))
        assert r, "server closed mid-response"
        buf += r
    return buf


def test_shape_mismatch_does_not_kill_dispatcher(server):
    """Requests with different frame shapes must not share a batch nor
    crash the dispatcher (they are grouped per shape)."""
    net = EmbeddingNet("random", pretrained=False)
    results = {}

    def worker(seed, hw):
        client = EmbeddingClient(server.address)
        rng = np.random.RandomState(seed)
        frames = rng.randint(0, 256, size=(2, hw, hw, 3), dtype=np.uint8)
        results[seed] = (frames, client(frames))
        client.close()

    threads = [threading.Thread(target=worker, args=(20, 64)),
               threading.Thread(target=worker, args=(21, 32))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert set(results) == {20, 21}
    for frames, got in results.values():
        np.testing.assert_allclose(got, net(frames), atol=1e-4, rtol=1e-4)
    # dispatcher must still serve after the mixed-shape window
    client = EmbeddingClient(server.address)
    frames = np.random.RandomState(22).randint(
        0, 256, size=(3, 64, 64, 3), dtype=np.uint8)
    np.testing.assert_allclose(client(frames), net(frames),
                               atol=1e-4, rtol=1e-4)
    client.close()


def test_failed_group_still_delivers_earlier_replies():
    """When one shape-group's forward fails inside a micro-batch
    window, a connection that pipelined requests across groups must
    still receive its replies UP TO the failure point, in order, and
    only then see EOF (ADVICE r3: closing first swallowed the already-
    computed replies)."""
    from pvr_habitat_tpu.tools.serve_embeddings import (EmbeddingServer,
                                                        _RSP)

    class FlakyNet:
        out_size = 8

        def __call__(self, frames):
            if frames.shape[1] == 48:            # the poisoned shape
                raise ValueError("boom")
            return np.zeros((frames.shape[0], 8), np.float32)

    class FakeConn:
        def __init__(self):
            self.sent = []
            self.closed = False

        def sendall(self, payload):
            if self.closed:
                raise ConnectionError("closed")
            self.sent.append(payload)

        def close(self):
            self.closed = True

    srv = EmbeddingServer.__new__(EmbeddingServer)  # no sockets needed
    srv.net = FlakyNet()
    srv.requests_served = 0
    srv.batches_served = 0

    good = np.zeros((2, 32, 32, 3), np.uint8)
    bad = np.zeros((2, 48, 48, 3), np.uint8)
    conn = FakeConn()          # pipelines good, bad, good
    other = FakeConn()         # an innocent bystander in the window
    srv._serve_window([(good, conn), (bad, conn), (good, conn),
                       (good, other)])

    # conn: reply #1 delivered, #2 failed -> close, #3 suppressed.
    assert len(conn.sent) == 1
    n, d = _RSP.unpack(conn.sent[0][:_RSP.size])
    assert (n, d) == (2, 8)
    assert conn.closed
    # the bystander is untouched.
    assert len(other.sent) == 1 and not other.closed
