"""Pallas TPU kernels: fully-fused ResNet bottleneck blocks.

The whole block —
  relu(x @ W1 + b1)  ->  3x3 conv (as 9 shifted matmuls)  ->
  @ W3 + b3  ->  (+ shortcut | x @ Wd + bd)  ->  relu
— runs per image entirely in VMEM, so HBM traffic drops to one input
read and one output write per block (vs one round-trip per conv).

MEASURED VERDICT (v5e, bf16, batch 256, chained in-context timing):
XLA's conv path is already at the bandwidth/MXU roofline at every
stage — marginal per-block cost 1.78 ms (layer1, bandwidth-bound) and
0.65 ms (layer3, ~87% MFU) — and both kernel variants lose in context
(v1 2.33 ms at layer1; v2 ~parity at layer3) because the narrow mid
channels (P=64..256 lanes) and sublane-shifted taps waste MXU rows that
XLA's implicit-GEMM avoids.  The kernels are kept as tested,
documented infrastructure (bench --fused {v1,v2,hybrid}); the default
serving path is XLA.  Single-call microbenchmarks through the axon
tunnel overstate kernel wins — always chain K blocks inside one jit and
difference the timings.

Assumes inference with BN already folded (weights scaled, biases in
hand).  Grid is over the batch; each program owns one image's full
spatial extent, so the 3x3 conv needs no halo exchange.  Strided (s=2)
blocks realize the stride with a pad + reshape-parity trick on VMEM
values (no strided memory ops).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _matmul(a, w):
    return jnp.dot(a, w, preferred_element_type=jnp.float32)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
            wd_ref, bd_ref, out_ref, *, h, w, stride, has_downsample,
            out_dtype):
    ho, wo = h // stride, w // stride
    cin = x_ref.shape[-1]
    p = w1_ref.shape[-1]

    x = x_ref[0]                                  # (H, W, Cin)
    x2d = x.reshape(h * w, cin)

    # conv1 1x1 + bias + relu
    y1 = jnp.maximum(_matmul(x2d, w1_ref[:]) + b1_ref[:], 0.0)
    y1 = y1.astype(x.dtype)

    # conv2 3x3 stride s: pad to (H+2, W+2, P), nine shifted matmuls.
    y1 = y1.reshape(h, w, p)
    y1p = jnp.pad(y1, ((1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((ho * wo, p), jnp.float32)
    for dh in range(3):
        for dw in range(3):
            if stride == 1:
                tap = jax.lax.slice(y1p, (dh, dw, 0), (dh + h, dw + w, p))
            else:
                tap = jax.lax.slice(
                    y1p, (dh, dw, 0),
                    (dh + stride * ho, dw + stride * wo, p))
                tap = tap.reshape(ho, stride, wo, stride, p)[:, 0, :, 0, :]
            acc += _matmul(tap.reshape(ho * wo, p),
                           w2_ref[dh * 3 + dw])
    y2 = jnp.maximum(acc + b2_ref[:], 0.0).astype(x.dtype)

    # conv3 1x1 (to 4P) + shortcut + relu, in output-channel chunks so
    # the f32 temporaries stay small (VMEM budget).
    cout = out_ref.shape[-1]
    if has_downsample and stride != 1:
        xs = x.reshape(ho, stride, wo, stride, cin)[:, 0, :, 0, :]
        xs = xs.reshape(ho * wo, cin)
    else:
        xs = x2d
    chunk = min(cout, 128)
    for c0 in range(0, cout, chunk):
        y3 = _matmul(y2, w3_ref[:, c0:c0 + chunk]) + b3_ref[c0:c0 + chunk]
        if has_downsample:
            y3 += _matmul(xs, wd_ref[:, c0:c0 + chunk]) \
                + bd_ref[c0:c0 + chunk]
        else:
            # identity shortcut requires cin == cout
            y3 += x2d[:, c0:c0 + chunk].astype(jnp.float32)
        out_ref[0, :, :, c0:c0 + chunk] = jnp.maximum(y3, 0.0).astype(
            out_dtype).reshape(ho, wo, chunk)


def fused_bottleneck(x, w1, b1, w2, b2, w3, b3, wd=None, bd=None, stride=1,
                     interpret=False):
    """x: (N, H, W, Cin).  w1 (Cin, P), w2 (9, P, P), w3 (P, Cout),
    wd (Cin, Cout) or None.  All biases fp32.  Returns (N, H/s, W/s, Cout).
    """
    n, h, w_, cin = x.shape
    p = w1.shape[-1]
    cout = w3.shape[-1]
    has_downsample = wd is not None
    if wd is None:
        wd = jnp.zeros((1, cout), x.dtype)
        bd = jnp.zeros((cout,), jnp.float32)
    ho, wo = h // stride, w_ // stride

    kernel = functools.partial(
        _kernel, h=h, w=w_, stride=stride, has_downsample=has_downsample,
        out_dtype=x.dtype)

    flops = 2 * n * (h * w_ * cin * p + 9 * ho * wo * p * p
                     + ho * wo * p * cout
                     + (ho * wo * cin * cout if has_downsample else 0))
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w_, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w3
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b3
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wd
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bd
        ],
        out_specs=pl.BlockSpec((1, ho, wo, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, cout), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize
            + n * ho * wo * cout * x.dtype.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            # The 56x56 identity-shortcut blocks peak at ~18 MB of
            # scoped VMEM (double-buffered 1.6 MB in/out blocks + f32
            # accumulators); raise the default 16 MB compiler cap.
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w1, b1, w2, b2, w3, b3, wd, bd)


# -----------------------------------------------------------------------------
# v2: padded-flat layout (stride-1 blocks)
# -----------------------------------------------------------------------------
#
# v1 slices the 3x3 taps out of a 3-D (H+2, W+2, P) buffer, which forces
# sublane relayouts per tap.  v2 keeps activations in a "padded-flat"
# layout (N, (H+2)*(W+2), C) with zeroed border positions, so every tap
# is a plain dim-0 slice y1[dh*PW+dw : dh*PW+dw+H*PW] and the whole
# block is matmuls + row slices.  Garbage columns (the horizontal pads
# inside the slab) are re-zeroed by a precomputed mask, which also
# restores the output's border invariant for the next fused block.


def _flat_kernel(x_ref, mask_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                 b3_ref, wd_ref, bd_ref, out_ref, *, h, pw,
                 has_downsample, out_dtype):
    cin = x_ref.shape[-1]
    p = w1_ref.shape[-1]
    cout = out_ref.shape[-1]
    slab = h * pw
    off = pw + 1

    x = x_ref[0]                                    # (PHW, Cin)
    mask = mask_ref[:]                              # (PHW, 1) f32

    y1 = jnp.maximum(_matmul(x, w1_ref[:]) + b1_ref[:], 0.0)
    y1 = (y1 * mask).astype(x.dtype)                # zero pad rows
    # the (2,2) tap's slice overruns PHW by 2; one extra zero row covers it
    y1 = jnp.pad(y1, ((0, pw), (0, 0)))

    acc = jnp.zeros((slab, p), jnp.float32)
    for dh in range(3):
        for dw in range(3):
            start = dh * pw + dw
            acc += _matmul(
                jax.lax.slice_in_dim(y1, start, start + slab, axis=0),
                w2_ref[dh * 3 + dw])
    y2 = jnp.maximum(acc + b2_ref[:], 0.0).astype(x.dtype)

    out_mask = jax.lax.slice_in_dim(mask, off, off + slab, axis=0)
    xs = jax.lax.slice_in_dim(x, off, off + slab, axis=0)
    chunk = min(cout, 128)
    for c0 in range(0, cout, chunk):
        y3 = _matmul(y2, w3_ref[:, c0:c0 + chunk]) + b3_ref[c0:c0 + chunk]
        if has_downsample:
            y3 += _matmul(xs, wd_ref[:, c0:c0 + chunk]) \
                + bd_ref[c0:c0 + chunk]
        else:
            y3 += xs[:, c0:c0 + chunk].astype(jnp.float32)
        out_ref[0, off:off + slab, c0:c0 + chunk] = (
            jnp.maximum(y3, 0.0) * out_mask).astype(out_dtype)
    # border rows of the padded-flat output must be zero
    out_ref[0, :off, :] = jnp.zeros((off, cout), out_dtype)
    out_ref[0, off + slab:, :] = jnp.zeros(
        (out_ref.shape[1] - off - slab, cout), out_dtype)


def flat_mask(h, w):
    """(PHW, 1) f32 mask: 1 at interior positions, 0 at pads."""
    m = np.zeros((h + 2, w + 2), np.float32)
    m[1:-1, 1:-1] = 1.0
    return m.reshape(-1, 1)


def to_padded_flat(x):
    """(N, H, W, C) -> (N, (H+2)(W+2), C) with zero borders."""
    n, h, w, c = x.shape
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))).reshape(
        n, (h + 2) * (w + 2), c)


def from_padded_flat(x, h, w):
    n, phw, c = x.shape
    return x.reshape(n, h + 2, w + 2, c)[:, 1:-1, 1:-1, :]


def fused_bottleneck_flat(x_flat, mask, w1, b1, w2, b2, w3, b3, wd=None,
                          bd=None, *, h, w, interpret=False):
    """Stride-1 fused bottleneck over padded-flat activations.

    x_flat: (N, (H+2)(W+2), Cin) with zeroed borders; returns the same
    layout with Cout channels."""
    n, phw, cin = x_flat.shape
    pw = w + 2
    p = w1.shape[-1]
    cout = w3.shape[-1]
    has_downsample = wd is not None
    if wd is None:
        wd = jnp.zeros((1, cout), x_flat.dtype)
        bd = jnp.zeros((cout,), jnp.float32)

    kernel = functools.partial(_flat_kernel, h=h, pw=pw,
                               has_downsample=has_downsample,
                               out_dtype=x_flat.dtype)
    flops = 2 * n * (phw * cin * p + 9 * h * pw * p * p
                     + h * pw * p * cout
                     + (h * pw * cin * cout if has_downsample else 0))
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, phw, cin), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mask
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w3
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b3
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wd
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bd
        ],
        out_specs=pl.BlockSpec((1, phw, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, phw, cout), x_flat.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x_flat.size * x_flat.dtype.itemsize
            + n * phw * cout * x_flat.dtype.itemsize,
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x_flat, mask, w1, b1, w2, b2, w3, b3, wd, bd)


# -----------------------------------------------------------------------------
# Param extraction from a BN-folded flat ResNet dict
# -----------------------------------------------------------------------------


def block_weights(params, prefix, dtype=jnp.bfloat16):
    """Extract fused-kernel weights for one bottleneck block from a
    BN-FOLDED flat param dict (fold_resnet_bn applied: conv weights
    scaled, biases live in '<bn>.bias')."""

    def conv(name):
        return params[f"{prefix}.{name}.weight"]

    w1 = conv("conv1")[0, 0].astype(dtype)                  # (Cin, P)
    w2 = conv("conv2").transpose(0, 1, 2, 3)                # (3,3,P,P) HWIO
    p = w2.shape[-1]
    w2 = w2.reshape(9, p, p).astype(dtype)
    w3 = conv("conv3")[0, 0].astype(dtype)                  # (P, Cout)
    b1 = params[f"{prefix}.bn1.bias"].astype(jnp.float32)
    b2 = params[f"{prefix}.bn2.bias"].astype(jnp.float32)
    b3 = params[f"{prefix}.bn3.bias"].astype(jnp.float32)
    if f"{prefix}.downsample.0.weight" in params:
        wd = params[f"{prefix}.downsample.0.weight"][0, 0].astype(dtype)
        bd = params[f"{prefix}.downsample.1.bias"].astype(jnp.float32)
    else:
        wd, bd = None, None
    return w1, b1, w2, b2, w3, b3, wd, bd
