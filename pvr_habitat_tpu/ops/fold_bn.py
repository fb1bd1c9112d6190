"""BatchNorm folding for frozen-encoder inference.

Eval-mode BN is an affine map per channel; folding it into the
preceding conv removes the elementwise pass entirely (HBM-bandwidth
win) and lets the MXU see one fused conv+bias.  We fold IN PLACE of the
BN params so the unmodified apply() code keeps working:

    w'   = w * gamma * rsqrt(var + eps)        (per output channel)
    bn'  = identity-shaped params with weight=1, bias = beta - mean * s,
           mean=0, var = 1 - eps  (so rsqrt(var+eps) == 1 exactly)

Only valid for frozen encoders (train_embedding=False, the reference's
default for every BC path)."""

import re

import jax.numpy as jnp

BN_EPS = 1e-5


def _bn_keys(prefix):
    return [f"{prefix}.weight", f"{prefix}.bias",
            f"{prefix}.running_mean", f"{prefix}.running_var"]


_CONV_FOR_BN = [
    # (bn key regex, conv key builder)
    (re.compile(r"^(?P<base>.*\.)?bn(?P<i>\d)$"),
     lambda m: f"{m.group('base') or ''}conv{m.group('i')}"),
    (re.compile(r"^(?P<base>.*\.)?downsample\.1$"),
     lambda m: f"{m.group('base') or ''}downsample.0"),
    (re.compile(r"^bn1$"), lambda m: "conv1"),
    # detectron2 naming (maskrcnn C4 backbone): '<conv>.norm.*' FrozenBN
    # attached to '<conv>.weight' (reference maskrcnn.py via detectron2
    # Conv2d(norm=FrozenBatchNorm2d)).
    (re.compile(r"^(?P<conv>.*)\.norm$"), lambda m: m.group("conv")),
]


def fold_resnet_bn(params):
    """Fold every (convN, bnN) / (downsample.0, downsample.1) pair of a
    flat ResNet param dict.  Returns a new flat dict."""
    out = dict(params)
    bn_prefixes = sorted({
        key[: -len(".running_mean")]
        for key in params if key.endswith(".running_mean")
    })
    for bn in bn_prefixes:
        conv = None
        for pattern, builder in _CONV_FOR_BN:
            match = pattern.match(bn)
            if match and f"{builder(match)}.weight" in params:
                conv = builder(match)
                break
        if conv is None:
            continue
        gamma = params[f"{bn}.weight"]
        beta = params[f"{bn}.bias"]
        mean = params[f"{bn}.running_mean"]
        var = params[f"{bn}.running_var"]
        scale = gamma / jnp.sqrt(var + BN_EPS)
        out[f"{conv}.weight"] = params[f"{conv}.weight"] * scale  # HWIO: O last
        conv_bias = params.get(f"{conv}.bias")
        shift = beta - mean * scale
        if conv_bias is not None:
            shift = shift + conv_bias * scale
            out[f"{conv}.bias"] = jnp.zeros_like(conv_bias)
        out[f"{bn}.weight"] = jnp.ones_like(gamma)
        out[f"{bn}.bias"] = shift
        out[f"{bn}.running_mean"] = jnp.zeros_like(mean)
        out[f"{bn}.running_var"] = jnp.full_like(var, 1.0 - BN_EPS)
    return out
