"""Batch-start sampling and unroll gathering.

The reference samples ``batch_size`` start indices with pairwise
minimum distance ``unroll_length`` (src/utils_bc.py:17-29) and gathers
``unroll_length`` consecutive steps per start with wraparound modulo the
dataset (main_bc_2.py:188-201).

Start sampling stays host-side on Python's ``random`` (cheap, and keeps
the reference's exact RNG stream given the same seed).  The gather is a
single jitted ``take`` so a device-resident dataset never bounces
through the host.
"""

import functools
import random

import numpy as np
import jax
import jax.numpy as jnp


def _ranks(sample):
    order = sorted(range(len(sample)), key=lambda i: sample[i])
    ranks = [0] * len(sample)
    for rank, idx in enumerate(order):
        ranks[idx] = rank
    return ranks


def sample_with_minimum_distance(n, k, d, rng=random):
    """k start indices in range(n) with pairwise distance >= d (rank
    trick; same algorithm and RNG stream as the reference)."""
    sample = rng.sample(range(n - (k - 1) * (d - 1)), k)
    return [s + (d - 1) * r for s, r in zip(sample, _ranks(sample))]


@functools.partial(jax.jit, static_argnums=(2,), donate_argnums=())
def _gather(arr, starts, unroll_length):
    n = arr.shape[0]
    # idx[t, b] = (starts[b] + t) % n  — matches np.mod wraparound.
    idx = (starts[None, :] + jnp.arange(unroll_length)[:, None]) % n
    return jnp.take(arr, idx, axis=0)


def gather_unrolls(data, starts, unroll_length):
    """data: dict of device (or host) arrays keyed obs/action/done;
    returns dict of (T, B, ...) arrays."""
    starts = jnp.asarray(np.asarray(starts, np.int32))
    return {k: _gather(v, starts, unroll_length) for k, v in data.items()}


def gather_unrolls_host(data, starts, unroll_length):
    """Host-side numpy gather (used when the dataset stays in host RAM,
    e.g. multi-chip runs where the batch is then put sharded)."""
    n = len(next(iter(data.values())))
    idx = (np.asarray(starts, np.int64)[None, :]
           + np.arange(unroll_length)[:, None]) % n
    return {k: v[idx] for k, v in data.items()}


def dataset_nbytes(data):
    return sum(np.asarray(v).nbytes if not hasattr(v, "nbytes") else v.nbytes
               for v in data.values())


def maybe_device_put(data, mode="auto", budget_bytes=None):
    """Place the BC dataset in HBM when it fits (mode='auto'), always,
    or never.  Returns (data, on_device)."""
    if mode == "never":
        return data, False
    if mode == "auto":
        if budget_bytes is None:
            try:
                stats = jax.local_devices()[0].memory_stats() or {}
                limit = stats.get("bytes_limit", 8 * 1024 ** 3)
                in_use = stats.get("bytes_in_use", 0)
                budget_bytes = int(0.6 * (limit - in_use))
            except Exception:
                budget_bytes = 4 * 1024 ** 3
        if dataset_nbytes(data) > budget_bytes:
            return data, False
    return {k: jnp.asarray(v) for k, v in data.items()}, True
