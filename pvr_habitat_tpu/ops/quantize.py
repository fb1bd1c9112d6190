"""int8 post-training quantization for frozen encoders (opt-in fast
path; the parity contract stays on the f32/bf16 paths).

Scheme: W8A8 symmetric — per-output-channel weight scales, per-tensor
activation scales from a one-shot calibration pass (no runtime reduces).
int8 x int8 -> int32 convs run the MXU at 2x bf16 rate and halve
activation HBM traffic; dequant + bias + relu fuse into the conv output.

Measured on v5e: int8 matmul 241 TOP/s vs bf16 138 TF/s (1.75x);
bandwidth-bound stages gain ~1.15-1.3x.
"""

import jax
import jax.numpy as jnp



def quantize_weight(w, axis=-1):
    """HWIO (or (out,in)) weight -> (int8 weight, f32 per-out-channel
    scale)."""
    axis = w.ndim + axis if axis < 0 else axis
    reduce_axes = tuple(i for i in range(w.ndim) if i != axis)
    amax = jnp.max(jnp.abs(w), axis=reduce_axes)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    shape = [1] * w.ndim
    shape[axis] = -1
    w_q = jnp.clip(jnp.round(w / scale.reshape(shape)),
                   -127, 127).astype(jnp.int8)
    return w_q, scale.astype(jnp.float32)


def quantize_resnet_params(params_folded):
    """BN-folded flat ResNet params -> quantized dict: every conv weight
    becomes '<name>.weight' int8 + '<name>.wscale' f32; BN shift vectors
    (the folded biases) and everything else stay f32."""
    out = {}
    for key, value in params_folded.items():
        if key.endswith(".weight") and value.ndim == 4:
            w_q, scale = quantize_weight(value)
            out[key] = w_q
            out[key[:-len(".weight")] + ".wscale"] = scale
        else:
            out[key] = value
    return out


class QuantState:
    """Carries activation scales.  calibrating=True computes scales from
    the batch (traced values, returned to the caller); otherwise uses
    the provided static dict."""

    def __init__(self, scales=None):
        self.calibrating = scales is None
        self.scales = dict(scales or {})

    def activation_scale(self, name, x):
        if self.calibrating:
            scale = jnp.maximum(jnp.max(jnp.abs(x)), 1e-8) / 127.0
            self.scales[name] = scale.astype(jnp.float32)
            return scale
        return jnp.asarray(self.scales[name], jnp.float32)


def conv_q(qs, name, x, params, stride=1, padding=0, bias=None,
           out_dtype=jnp.bfloat16):
    """Quantized conv: x (float NHWC) -> out_dtype NHWC.

    x is quantized with the (calibrated) per-tensor scale, the conv runs
    int8->int32, and dequant (+ optional bias) fuses into the output.
    Activations stay bf16 between layers (f32 intermediates would double
    the HBM traffic and erase the int8 win)."""
    s_x = qs.activation_scale(name, x)
    inv = (1.0 / s_x).astype(x.dtype)
    x_q = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
    w_q = params[f"{name}.weight"]
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = jax.lax.conv_general_dilated(
        x_q, w_q, window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    scale = s_x * params[f"{name}.wscale"]
    y = y.astype(jnp.float32) * scale
    if bias is not None:
        y = y + bias
    return y.astype(out_dtype)


def quantize_vit_params(params):
    """ViT params -> int8 dict: the patch-embed conv (4D) and every
    block linear (2D .weight of qkv/proj/mlp) quantize per-out-channel;
    LayerNorm weights (1D), biases, cls/pos embeddings stay float."""
    out = {}
    for key, value in params.items():
        quantizable = key.endswith(".weight") and (
            value.ndim == 4
            or (value.ndim == 2 and (".attn." in key or ".mlp." in key)))
        if quantizable:
            axis = -1 if value.ndim == 4 else 0   # HWIO out-last; (out,in)
            w_q, scale = quantize_weight(value, axis=axis)
            out[key] = w_q
            out[key[:-len(".weight")] + ".wscale"] = scale
        else:
            out[key] = value
    return out


def linear_q(qs, name, x, params, out_dtype=jnp.bfloat16):
    """Quantized torch-style linear: x (M, in) float -> (M, out)."""
    s_x = qs.activation_scale(name, x)
    inv = (1.0 / s_x).astype(x.dtype)
    x_q = jnp.clip(jnp.round(x * inv), -127, 127).astype(jnp.int8)
    w_q = params[f"{name}.weight"]                 # (out, in) int8
    y = jnp.matmul(x_q, w_q.T, preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (s_x * params[f"{name}.wscale"])
    bias = params.get(f"{name}.bias")
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def affine_from_folded_bn(params, prefix):
    """After fold_resnet_bn, BN is (x * 1 + shift) with mean 0 /
    var 1-eps; extract the shift as a plain bias."""
    return params[f"{prefix}.bias"].astype(jnp.float32)
