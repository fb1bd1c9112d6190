"""utils/pipeline.pipelined_map: ordering, overlap, and the error
semantics that keep device failures from deadlocking bulk embedding."""

import time

import numpy as np
import pytest

from pvr_habitat_tpu.utils.pipeline import pipelined_map


def test_results_in_order():
    out = pipelined_map(range(10), stage=lambda i: i * 2,
                        dispatch=lambda x: x + 1,
                        fetch=lambda x: x * 10)
    assert out == [(i * 2 + 1) * 10 for i in range(10)]


def test_empty():
    assert pipelined_map([], stage=None, dispatch=None, fetch=None) == []


def test_fetch_error_raises_not_deadlocks():
    def fetch(x):
        if x == 3:
            raise RuntimeError("async device error")
        return x

    with pytest.raises(RuntimeError, match="async device error"):
        pipelined_map(range(32), stage=lambda i: i,
                      dispatch=lambda x: x, fetch=fetch, depth=2)


def test_stage_error_raises():
    def stage(i):
        if i == 5:
            raise ValueError("bad stage")
        return i

    with pytest.raises(ValueError, match="bad stage"):
        pipelined_map(range(10), stage=stage, dispatch=lambda x: x,
                      fetch=lambda x: x)


def test_stages_overlap():
    """The stager runs ahead of fetch: pipelined wall clock must beat a
    serial execution of the same legs measured in-process (an absolute
    bound is flaky under load on this 1-core CI host)."""
    def slow(x):
        time.sleep(0.01)
        return x

    n = 12
    t0 = time.perf_counter()
    for i in range(n):          # serial baseline: stage then fetch
        slow(slow(i))
    serial = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = pipelined_map(range(n), stage=slow, dispatch=lambda x: x,
                        fetch=slow)
    piped = time.perf_counter() - t0
    assert out == list(range(n))
    assert piped < serial * 0.85, (piped, serial)


def test_numpy_payloads():
    frames = np.arange(40).reshape(10, 4)
    out = pipelined_map(range(0, 10, 2),
                        stage=lambda i: frames[i:i + 2],
                        dispatch=lambda x: x.sum(axis=1),
                        fetch=np.asarray)
    got = np.concatenate(out)
    np.testing.assert_array_equal(got, frames.sum(axis=1))


def test_fetch_error_with_full_queue_no_deadlock():
    """The sentinel put at teardown must not block when the fetcher
    died while the bounded queue was full (the dead fetcher will never
    drain it)."""
    def fetch(x):
        if x == 0:
            raise RuntimeError("dies immediately")
        return x

    def dispatch(x):
        return x

    # depth=1: after fetch(0) dies, item 1 fills the queue and the put
    # of item 2 must time out and raise rather than hang.
    t0 = time.perf_counter()
    with pytest.raises(RuntimeError, match="dies immediately"):
        pipelined_map(range(8), stage=lambda i: i, dispatch=dispatch,
                      fetch=fetch, depth=1)
    assert time.perf_counter() - t0 < 30, "teardown hung"
