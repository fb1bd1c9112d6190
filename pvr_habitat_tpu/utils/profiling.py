"""Tracing/profiling (SURVEY §5: the reference has none — tqdm only).

- ``trace(dir)``: jax.profiler trace dump (view in TensorBoard/Perfetto).
- ``annotate(name)``: TraceAnnotation context for host-side phases.
- ``StepTimer``: cheap rolling step-time/throughput stats printed at an
  interval, usable inside the training loop without device syncs.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir):
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self, items_per_step=1, report_every=100, label="step"):
        self.items = items_per_step
        self.every = report_every
        self.label = label
        self.count = 0
        self._t0 = time.perf_counter()

    def tick(self, printer=print):
        self.count += 1
        if self.count % self.every == 0:
            now = time.perf_counter()
            dt = (now - self._t0) / self.every
            printer(f"   {self.label}: {dt * 1000:.2f} ms/iter, "
                    f"{self.items / dt:.0f} items/s")
            self._t0 = now


def device_memory_stats():
    """Per-device HBM usage, when the backend reports it."""
    out = {}
    for device in jax.local_devices():
        try:
            stats = device.memory_stats() or {}
            out[str(device)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
        except Exception:
            pass
    return out
