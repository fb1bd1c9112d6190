"""Backend platform selection for CLI entry points.

The axon TPU plugin ignores the ``JAX_PLATFORMS`` env var, so the only
reliable way to force a backend is ``jax.config.update`` BEFORE backend
initialization.  Two user-facing switches route through here:

- ``PVR_TPU_PLATFORM=cpu`` (env): force every CLI onto a given backend —
  the escape hatch when the TPU tunnel is wedged, and the way to run
  the whole pipeline hermetically on CPU.
- ``--disable_cuda`` (flag): the reference's GPU kill-switch
  (reference: src/arguments.py:41, gates ``torch.cuda.is_available``);
  here it forces the CPU backend.

Called at the top of every ``run(flags)`` entry point; a no-op when
neither switch is set or when the backend is already initialized.
"""

import os


def configure_platform(flags=None):
    platform = os.environ.get("PVR_TPU_PLATFORM", "")
    if not platform and flags is not None \
            and getattr(flags, "disable_cuda", False):
        platform = "cpu"
    if not platform:
        return
    import jax
    try:
        jax.config.update("jax_platforms", platform)
    except RuntimeError:
        # Backend already initialized (library use) — leave it alone.
        pass
