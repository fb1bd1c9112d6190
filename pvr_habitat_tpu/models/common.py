"""Shared functional NN primitives.

Conventions (TPU-first):
- Activations are NHWC, conv weights HWIO — the layouts XLA:TPU prefers.
- Parameters live in a FLAT dict keyed by the PyTorch module path of the
  corresponding reference model (e.g. ``layer1.0.conv1.weight``).  This
  makes the torch-checkpoint converters pure key-renames and keeps the
  parity story auditable; the dict is a perfectly good jax pytree.
- Apply functions are pure; jit/grad/shard at the call boundary.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp


DEFAULT_PRECISION = jax.lax.Precision.HIGHEST


def _precision_for(x, precision):
    """fp32 runs at HIGHEST (parity grade); bf16 runs the native MXU path
    (HIGHEST on bf16 operands would force multi-pass emulation)."""
    if precision is not None:
        return precision
    if x.dtype == jnp.bfloat16:
        return jax.lax.Precision.DEFAULT
    return DEFAULT_PRECISION


def sub(params, prefix):
    """View of a flat param dict under a key prefix."""
    pre = prefix + "."
    return {k[len(pre):]: v for k, v in params.items() if k.startswith(pre)}


def add_prefix(params, prefix):
    return {f"{prefix}.{k}": v for k, v in params.items()}


def conv2d(x, w, stride=1, padding=0, precision=None, bias=None):
    """NHWC conv with HWIO weights and symmetric integer padding."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=_precision_for(x, precision),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def batch_norm(x, p, prefix, eps=1e-5, train=False):
    """BatchNorm with torch semantics.

    Eval mode normalizes by running stats (this is also detectron2's
    FrozenBN).  Train mode normalizes by biased batch stats; running-stat
    updates are handled by the caller when an encoder is trainable.
    """
    gamma = p[f"{prefix}.weight"].astype(x.dtype)
    beta = p[f"{prefix}.bias"].astype(x.dtype)
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
    else:
        mean = p[f"{prefix}.running_mean"].astype(x.dtype)
        var = p[f"{prefix}.running_var"].astype(x.dtype)
    inv = jax.lax.rsqrt(var + jnp.asarray(eps, x.dtype))
    return (x - mean) * (inv * gamma) + beta


def linear(x, p, prefix, precision=None):
    """torch nn.Linear: weight (out, in), y = x @ w.T + b."""
    w = p[f"{prefix}.weight"].astype(x.dtype)
    y = jnp.matmul(x, w.T, precision=_precision_for(x, precision))
    b = p.get(f"{prefix}.bias")
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def max_pool(x, window=3, stride=2, padding=1):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def layer_norm(x, p, prefix, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + jnp.asarray(eps, x.dtype))
    return y * p[f"{prefix}.weight"].astype(x.dtype) + \
        p[f"{prefix}.bias"].astype(x.dtype)


def gelu(x):
    """torch.nn.GELU default (exact erf) in the f32 parity path; the
    bf16 fast path uses the tanh approximation (measured: erf costs 34%
    of the ViT MLP on the VPU, tanh is free; max diff ~3e-4 — under
    bf16 resolution)."""
    return jax.nn.gelu(x, approximate=x.dtype == jnp.bfloat16)


# -----------------------------------------------------------------------------
# Initializers replicating torch distributions (numpy, host-side).
# -----------------------------------------------------------------------------


def kaiming_normal_conv(rng, shape_oihw):
    """torch kaiming_normal_(mode='fan_out', nonlinearity='relu') on an
    OIHW conv weight; returned in HWIO."""
    o, i, kh, kw = shape_oihw
    fan_out = o * kh * kw
    std = math.sqrt(2.0 / fan_out)
    w = rng.normal(0.0, std, size=shape_oihw).astype(np.float32)
    return np.transpose(w, (2, 3, 1, 0))


def orthogonal(rng, shape_out_in, gain=1.0):
    """torch nn.init.orthogonal_ on a (out, in) matrix."""
    rows, cols = shape_out_in
    flat = rng.normal(0.0, 1.0, size=(max(rows, cols), min(rows, cols)))
    q, r = np.linalg.qr(flat)
    q = q * np.sign(np.diag(r))
    if rows < cols:
        q = q.T
    return (gain * q[:rows, :cols]).astype(np.float32)


def orthogonal_conv(rng, shape_oihw, gain=math.sqrt(2.0)):
    """torch orthogonal_ flattens trailing dims: (O, I*kh*kw); HWIO out."""
    o, i, kh, kw = shape_oihw
    w = orthogonal(rng, (o, i * kh * kw), gain).reshape(o, i, kh, kw)
    return np.transpose(w, (2, 3, 1, 0))


def uniform_fan_in(rng, shape, fan_in):
    bound = 1.0 / math.sqrt(fan_in)
    return rng.uniform(-bound, bound, size=shape).astype(np.float32)
