"""Test config: force an 8-virtual-device CPU backend so sharding and
multi-chip code paths run hermetically (and deterministically) without
TPU hardware.

The session environment pre-sets JAX_PLATFORMS=axon (the TPU tunnel)
and the axon plugin ignores a JAX_PLATFORMS env override, so we must
set the platform through jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
