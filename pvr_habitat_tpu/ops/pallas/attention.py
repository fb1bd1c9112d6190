"""Pallas fused multi-head attention for the ViT encoders.

The XLA attention core at ViT-B shapes (L=197, D=64, H=12, batch 256)
runs ~2.8 ms/block — the (N, H, L, L) logits tensor materializes in HBM
for the f32 softmax.  This kernel keeps per-image scores in VMEM:
one program per image computes all heads' QK^T -> softmax -> PV with a
~300 KB working set, so HBM traffic drops to reading q/k/v once and
writing the output once.

Status: OPT-IN (PVR_TPU_ATTENTION_CORE=pallas, or the legacy
PVR_TPU_ENABLE_PALLAS_ATTENTION=1).  History: on the Nov-2025 libtpu
this won 1.3x vs the einsum attention core at ViT-B shapes (8.4 vs
10.8 ms for the 4 cores incl. layout transposes, mae_base 1965 ->
2429 f/s) and was the default bf16 path; after the Jan-2026 libtpu
upgrade XLA's own codegen overtook it (mae_base einsum 2.60k vs
Pallas 2.47k f/s, chained in-jit timing) so the default reverted to
the einsum core.  jax's stock flash-attention kernel
(PVR_TPU_ATTENTION_CORE=flash, ``stock_flash_attention`` below) loses
harder at these shapes: mae_base 1890 f/s tuned vs einsum 2716 on
Jan-2026 (pad-to-128 waste + grid overhead at L=197; docs/DESIGN.md).
Both kept as infrastructure — re-A/B on each libtpu rev.
Interpret-mode parity is CI-tested (tests/test_fused_attention.py).
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


def attention_core():
    """Which attention core the ViT bf16 TPU path uses:
    'einsum' (default), 'pallas' (the in-repo kernel above), or 'flash'
    (jax's stock Pallas TPU flash kernel via ``stock_flash_attention``).
    PVR_TPU_ATTENTION_CORE overrides; the legacy enable/disable vars
    keep working for the 'pallas' core."""
    core = os.environ.get("PVR_TPU_ATTENTION_CORE", "").strip().lower()
    if core and core not in ("einsum", "pallas", "flash"):
        # A typo'd core name must not silently A/B the wrong kernel —
        # the libtpu re-A/B policy depends on knowing what actually ran.
        import warnings

        warnings.warn(
            f"PVR_TPU_ATTENTION_CORE={core!r} is not one of "
            "einsum/pallas/flash; ignoring it (legacy enable/disable "
            "vars route below)")
    if core in ("einsum", "pallas", "flash"):
        # The kill switch must neutralize EVERY Pallas kernel core
        # ('flash' is jax's stock Pallas kernel) — it is the documented
        # escape hatch for wedged-TPU Pallas incidents.
        if core != "einsum" and os.environ.get(
                "PVR_TPU_DISABLE_PALLAS_ATTENTION", "0") in \
                ("1", "true", "True"):
            return "einsum"
        return core
    return "pallas" if pallas_attention_enabled() else "einsum"


def stock_flash_attention(q, k, v, impl=None):
    """Non-causal softmax(QK^T/sqrt(D))V via jax's stock Pallas TPU
    flash-attention kernel (online softmax — the (L, L) scores never
    round-trip HBM).

    q, k, v: (N, H, L, D).  L is padded up to a multiple of 128 and the
    pad tokens are masked out with segment ids (pad queries land in a
    different segment, so real rows never attend to pad keys; pad rows
    compute garbage that the caller slices off).

    ``impl`` injects the attention implementation — the CPU CI parity
    test passes the kernel module's ``mha_reference`` (same signature,
    plain jnp) since the kernel itself is TPU-only.
    """
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    if impl is None:
        impl = fa.flash_attention
    n, h, l, d = q.shape
    lp = -(-l // 128) * 128
    pad = lp - l
    sm_scale = float(1.0 / np.sqrt(d))
    if pad:
        cfg = ((0, 0), (0, 0), (0, pad), (0, 0))
        q, k, v = (jnp.pad(t, cfg) for t in (q, k, v))
        seg = jnp.broadcast_to(
            (jnp.arange(lp) >= l).astype(jnp.int32), (n, lp))
        segment_ids = fa.SegmentIds(q=seg, kv=seg)
    else:
        segment_ids = None
    kwargs = {}
    if impl is fa.flash_attention:
        # One program per (batch-block, head, q-block); at ViT scale
        # (L<=256 after padding) the whole sequence fits one q/k block,
        # so block the batch instead to amortize the grid.
        kwargs["block_sizes"] = fa.BlockSizes(
            block_q=lp, block_k_major=lp, block_k=lp,
            block_b=_batch_block(n))
    # ab (attention bias) is positional-required in mha_reference and
    # keyword-optional in flash_attention; pass it positionally.
    out = impl(q, k, v, None, segment_ids, sm_scale=sm_scale, **kwargs)
    return out[:, :, :l, :]


def _batch_block(n):
    """Largest power-of-two divisor of n up to PVR_TPU_FLASH_BLOCK_B
    (clamped to >= 1: 0/negative env values must not ZeroDivisionError
    or loop forever)."""
    bb = max(int(os.environ.get("PVR_TPU_FLASH_BLOCK_B", "8")), 1)
    while n % bb:
        bb //= 2
    return max(bb, 1)


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
