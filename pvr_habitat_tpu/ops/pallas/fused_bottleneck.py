"""Pallas TPU kernel: a fully-fused ResNet bottleneck block.

Why: in the XLA path every conv of a bottleneck round-trips its
activations through HBM, so the early stages (56x56/28x28) run ~3x off
the bandwidth roofline.  This kernel runs the whole block —
  relu(x @ W1 + b1)  ->  3x3 conv (as 9 shifted matmuls)  ->
  @ W3 + b3  ->  (+ shortcut | x @ Wd + bd)  ->  relu
— per image, entirely in VMEM: HBM traffic drops to one input read and
one output write per block.

Assumes inference with BN already folded (weights scaled, biases in
hand).  Grid is over the batch; each program owns one image's full
spatial extent, so the 3x3 conv needs no halo exchange.  Strided (s=2)
blocks realize the stride with a pad + reshape-parity trick on VMEM
values (no strided memory ops).
"""

import functools

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
