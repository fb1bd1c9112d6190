"""Pallas fused multi-head attention for the ViT encoders.

The XLA attention core at ViT-B shapes (L=197, D=64, H=12, batch 256)
runs ~2.8 ms/block — the (N, H, L, L) logits tensor materializes in HBM
for the f32 softmax.  This kernel keeps per-image scores in VMEM:
one program per image computes all heads' QK^T -> softmax -> PV with a
~300 KB working set, so HBM traffic drops to reading q/k/v once and
writing the output once.

Status: OPT-IN (PVR_TPU_ENABLE_PALLAS_ATTENTION=1).  History: on the
Nov-2025 libtpu this won 1.3x vs the einsum attention core at ViT-B
shapes (8.4 vs 10.8 ms for the 4 cores incl. layout transposes,
mae_base 1965 -> 2429 f/s) and was the default bf16 path; after the
Jan-2026 libtpu upgrade XLA's own codegen overtook it (mae_base einsum
2.60k vs Pallas 2.47k f/s, chained in-jit timing) so the default
reverted to the einsum core.  Kept as infrastructure — re-A/B on each
libtpu rev.  Interpret-mode parity is CI-tested
(tests/test_fused_attention.py).
"""

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pallas_attention_enabled():
    """Routing flag for the fused-attention serving path.

    Default OFF since the Jan-2026 libtpu upgrade: XLA's einsum
    attention core now beats this kernel at ViT-B shapes (measured
    mae_base 2.60k vs 2.47k f/s, chained in-jit timing).  Set
    PVR_TPU_ENABLE_PALLAS_ATTENTION=1 to opt back in (worth re-checking
    on future libtpu versions); the legacy
    PVR_TPU_DISABLE_PALLAS_ATTENTION=1 kill switch still forces it off.
    """
    if os.environ.get("PVR_TPU_DISABLE_PALLAS_ATTENTION", "0") in \
            ("1", "true", "True"):
        return False
    return os.environ.get("PVR_TPU_ENABLE_PALLAS_ATTENTION", "0") in \
        ("1", "true", "True")


def _kernel(q_ref, k_ref, v_ref, out_ref, *, num_heads, scale):
    for head in range(num_heads):
        q = q_ref[0, head]                      # (L, D)
        k = k_ref[0, head]
        v = v_ref[0, head]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (L, L) f32
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
        out_ref[0, head] = jnp.dot(
            p, v, preferred_element_type=jnp.float32).astype(q.dtype)


def fused_attention(q, k, v, interpret=False):
    """q, k, v: (N, H, L, D) -> (N, H, L, D); non-causal softmax(QK^T/√D)V
    with all intermediates in VMEM (grid over the batch)."""
    n, h, l, d = q.shape
    kernel = functools.partial(_kernel, num_heads=h,
                               scale=1.0 / np.sqrt(d))
    spec = pl.BlockSpec((1, h, l, d), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, h, l, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n * h * l * l * d,
            bytes_accessed=4 * n * h * l * d * q.dtype.itemsize,
            transcendentals=n * h * l * l),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(q, k, v)
