"""torchvision-style ResNets and the reference's truncated/compressed
variants, NHWC-functional for TPU.

Reference behavior replicated:
- resnet18/34/50 with the classifier removed — output is the pooled
  2048-d (or 512-d) feature (src/embeddings.py:112-120).
- ``l3``/``l4`` compressed variants: ResNet-50 cut at layer3/layer4 with
  an appended BasicBlock compressing 1024->11 / 2048->42 channels, and a
  3x3-conv+BN projection shortcut; later stages, avgpool and fc removed
  (src/vision_models/resnet.py:6-104, moco.py:29-113).  Output is the
  flattened feature map: 11*14*14 = 2156 / 42*7*7 = 2058.

Parameter keys mirror the grafted torch modules, e.g. the original
layer3 blocks live under ``layer3.0.<i>...`` and the compress block
under ``layer3.1...`` exactly as torch renames them after
``model.layer3 = nn.Sequential(model.layer3, BasicBlock(...))``.
"""

import numpy as np
import jax.numpy as jnp

from pvr_habitat_tpu.models import common as cm


BLOCK_COUNTS = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3)}
BLOCK_TYPE = {18: "basic", 34: "basic", 50: "bottleneck"}
EXPANSION = {"basic": 1, "bottleneck": 4}


class ResNetSpec:
    def __init__(self, depth=50, cut=None):
        """cut: None (full, pooled output) | 'l3' | 'l4' (compressed)."""
        self.depth = depth
        self.block = BLOCK_TYPE[depth]
        self.layers = BLOCK_COUNTS[depth]
        self.cut = cut
        if cut == "l3":
            self.compress_in, self.compress_out = 1024, 11
        elif cut == "l4":
            self.compress_in, self.compress_out = 2048, 42
        elif cut is not None:
            raise ValueError(f"unknown cut: {cut}")

    def out_size(self, input_hw=224):
        if self.cut == "l3":
            s = input_hw // 16
            return 11 * s * s
        if self.cut == "l4":
            s = input_hw // 32
            return 42 * s * s
        return 512 * EXPANSION[self.block]

    def param_names(self):
        return sorted(init_params(self, np.random.RandomState(0)).keys())


def _basic_block(x, p, prefix, stride, has_downsample, train):
    identity = x
    y = cm.conv2d(x, p[f"{prefix}.conv1.weight"], stride=stride, padding=1)
    y = cm.batch_norm(y, p, f"{prefix}.bn1", train=train)
    y = jnp.maximum(y, 0)
    y = cm.conv2d(y, p[f"{prefix}.conv2.weight"], stride=1, padding=1)
    y = cm.batch_norm(y, p, f"{prefix}.bn2", train=train)
    if has_downsample:
        dw = p[f"{prefix}.downsample.0.weight"]
        pad = (dw.shape[0] - 1) // 2  # 1x1 in stages, 3x3 in compress blocks
        # The compress graft's shortcut conv keeps torch's default bias=True
        # (reference: src/vision_models/resnet.py:12-19).
        identity = cm.conv2d(x, dw, stride=stride, padding=pad,
                             bias=p.get(f"{prefix}.downsample.0.bias"))
        identity = cm.batch_norm(identity, p, f"{prefix}.downsample.1",
                                 train=train)
    return jnp.maximum(y + identity, 0)


def _bottleneck_block(x, p, prefix, stride, has_downsample, train):
    identity = x
    y = cm.conv2d(x, p[f"{prefix}.conv1.weight"], stride=1, padding=0)
    y = cm.batch_norm(y, p, f"{prefix}.bn1", train=train)
    y = jnp.maximum(y, 0)
    y = cm.conv2d(y, p[f"{prefix}.conv2.weight"], stride=stride, padding=1)
    y = cm.batch_norm(y, p, f"{prefix}.bn2", train=train)
    y = jnp.maximum(y, 0)
    y = cm.conv2d(y, p[f"{prefix}.conv3.weight"], stride=1, padding=0)
    y = cm.batch_norm(y, p, f"{prefix}.bn3", train=train)
    if has_downsample:
        identity = cm.conv2d(x, p[f"{prefix}.downsample.0.weight"],
                             stride=stride, padding=0)
        identity = cm.batch_norm(identity, p, f"{prefix}.downsample.1",
                                 train=train)
    return jnp.maximum(y + identity, 0)


def _stage(x, p, name, spec, stage_idx, train):
    """One of layer1..layer4.  When the stage carries a compress graft the
    original blocks are nested under '<name>.0' and the BasicBlock
    compressor under '<name>.1'."""
    block_fn = _basic_block if spec.block == "basic" else _bottleneck_block
    n_blocks = spec.layers[stage_idx]
    grafted = (spec.cut == "l3" and stage_idx == 2) or \
              (spec.cut == "l4" and stage_idx == 3)
    base = f"{name}.0" if grafted else name
    for i in range(n_blocks):
        stride = 2 if (i == 0 and stage_idx > 0) else 1
        has_ds = f"{base}.{i}.downsample.0.weight" in p
        x = block_fn(x, p, f"{base}.{i}", stride, has_ds, train)
    if grafted:
        x = _basic_block(x, p, f"{name}.1", 1, True, train)
    return x


def apply(params, x, spec, train=False):
    """x: (N, H, W, 3) normalized float NHWC -> (N, out_size)."""
    y = cm.conv2d(x, params["conv1.weight"], stride=2, padding=3)
    y = cm.batch_norm(y, params, "bn1", train=train)
    y = jnp.maximum(y, 0)
    y = cm.max_pool(y, window=3, stride=2, padding=1)

    y = _stage(y, params, "layer1", spec, 0, train)
    y = _stage(y, params, "layer2", spec, 1, train)
    y = _stage(y, params, "layer3", spec, 2, train)
    if spec.cut == "l3":
        # NHWC -> flatten in torch's NCHW order for bit-compatible layout.
        return jnp.transpose(y, (0, 3, 1, 2)).reshape(y.shape[0], -1)
    y = _stage(y, params, "layer4", spec, 3, train)
    if spec.cut == "l4":
        return jnp.transpose(y, (0, 3, 1, 2)).reshape(y.shape[0], -1)
    y = jnp.mean(y, axis=(1, 2))  # adaptive avgpool (1,1) + flatten
    return y


def apply_fused(params, x, spec, interpret=False):
    """Inference fast path: bottleneck stages run as Pallas fused-block
    kernels (one HBM read + one write per block instead of per conv).
    ``params`` must be BN-FOLDED (ops.fold_bn.fold_resnet_bn); basic
    blocks and compressed grafts fall back to the XLA path."""
    from pvr_habitat_tpu.ops.pallas.fused_bottleneck import (block_weights,
                                                             fused_bottleneck)

    assert spec.block == "bottleneck", "fused path is for bottleneck nets"
    y = cm.conv2d(x, params["conv1.weight"], stride=2, padding=3)
    y = cm.batch_norm(y, params, "bn1")
    y = jnp.maximum(y, 0)
    y = cm.max_pool(y, window=3, stride=2, padding=1)

    for stage_idx in range(4 if spec.cut != "l3" else 3):
        name = f"layer{stage_idx + 1}"
        grafted = (spec.cut == "l3" and stage_idx == 2) or \
                  (spec.cut == "l4" and stage_idx == 3)
        base = f"{name}.0" if grafted else name
        for i in range(spec.layers[stage_idx]):
            stride = 2 if (i == 0 and stage_idx > 0) else 1
            w1, b1, w2, b2, w3, b3, wd, bd = block_weights(
                params, f"{base}.{i}", dtype=x.dtype)
            y = fused_bottleneck(y, w1, b1, w2, b2, w3, b3, wd, bd,
                                 stride=stride, interpret=interpret)
        if grafted:
            y = _basic_block(y, params, f"{name}.1", 1, True, False)
    if spec.cut in ("l3", "l4"):
        return jnp.transpose(y, (0, 3, 1, 2)).reshape(y.shape[0], -1)
    return jnp.mean(y, axis=(1, 2))


def apply_fused_v2(params, x, spec, interpret=False):
    """Padded-flat fused path: stride-1 bottlenecks run as dim-0-slice
    Pallas kernels (no per-tap relayout); stride-2 stage heads stay on
    XLA.  ``params`` must be BN-folded."""
    from pvr_habitat_tpu.ops.pallas import fused_bottleneck as fb

    assert spec.block == "bottleneck" and spec.cut is None, \
        "v2 fused path covers the full bottleneck nets"
    y = cm.conv2d(x, params["conv1.weight"], stride=2, padding=3)
    y = jnp.maximum(cm.batch_norm(y, params, "bn1"), 0)
    y = cm.max_pool(y, window=3, stride=2, padding=1)

    for stage_idx in range(4):
        name = f"layer{stage_idx + 1}"
        h = y.shape[1] // (2 if stage_idx > 0 else 1)
        first = 0
        if stage_idx > 0:
            # stride-2 stage head on XLA
            y = _bottleneck_block(y, params, f"{name}.0", 2, True, False)
            first = 1
        mask = jnp.asarray(fb.flat_mask(h, h))
        yf = fb.to_padded_flat(y)
        for i in range(first, spec.layers[stage_idx]):
            w1, b1, w2, b2, w3, b3, wd, bd = fb.block_weights(
                params, f"{name}.{i}", dtype=x.dtype)
            yf = fb.fused_bottleneck_flat(
                yf, mask, w1, b1, w2, b2, w3, b3, wd, bd,
                h=h, w=h, interpret=interpret)
        y = fb.from_padded_flat(yf, h, h)
    return jnp.mean(y, axis=(1, 2))


def apply_fused_hybrid(params, x, spec, interpret=False):
    """Per-stage best-of kernel selection, from on-device A/B at
    batch 256 bf16 (times net of the ~1.2ms dispatch floor):

      layer1 identity blocks:  v1 fused (2.2ms) < XLA (2.9) < v2 (5.2)
      layer2:                  XLA (1.2) wins over both kernels
      layer3 identity blocks:  v2 fused (0.9) << XLA (2.0)
      layer4 identity blocks:  v2 fused (measured similar regime to l3)
      stage heads (stride 2):  XLA

    ``params`` must be BN-folded."""
    from pvr_habitat_tpu.ops.pallas import fused_bottleneck as fb

    assert spec.block == "bottleneck" and spec.cut is None
    y = cm.conv2d(x, params["conv1.weight"], stride=2, padding=3)
    y = jnp.maximum(cm.batch_norm(y, params, "bn1"), 0)
    y = cm.max_pool(y, window=3, stride=2, padding=1)

    # layer1: v1 fused for all three blocks (stride 1 throughout)
    for i in range(spec.layers[0]):
        w = fb.block_weights(params, f"layer1.{i}", dtype=x.dtype)
        y = fb.fused_bottleneck(y, *w, stride=1, interpret=interpret)

    # layer2: XLA
    y = _stage(y, params, "layer2", spec, 1, False)

    # layer3/layer4: XLA stride-2 head + v2 fused identity blocks
    for stage_idx in (2, 3):
        name = f"layer{stage_idx + 1}"
        y = _bottleneck_block(y, params, f"{name}.0", 2, True, False)
        h = y.shape[1]
        mask = jnp.asarray(fb.flat_mask(h, h))
        yf = fb.to_padded_flat(y)
        for i in range(1, spec.layers[stage_idx]):
            w = fb.block_weights(params, f"{name}.{i}", dtype=x.dtype)
            yf = fb.fused_bottleneck_flat(yf, mask, *w, h=h, w=h,
                                          interpret=interpret)
        y = fb.from_padded_flat(yf, h, h)
    return jnp.mean(y, axis=(1, 2))


def _bottleneck_block_q(qs, x, p, prefix, stride):
    from pvr_habitat_tpu.ops import quantize as q

    has_downsample = f"{prefix}.downsample.0.weight" in p
    identity = x
    y = q.conv_q(qs, f"{prefix}.conv1", x, p, 1, 0,
                 bias=q.affine_from_folded_bn(p, f"{prefix}.bn1"))
    y = jnp.maximum(y, 0)
    y = q.conv_q(qs, f"{prefix}.conv2", y, p, stride, 1,
                 bias=q.affine_from_folded_bn(p, f"{prefix}.bn2"))
    y = jnp.maximum(y, 0)
    y = q.conv_q(qs, f"{prefix}.conv3", y, p, 1, 0,
                 bias=q.affine_from_folded_bn(p, f"{prefix}.bn3"))
    if has_downsample:
        identity = q.conv_q(
            qs, f"{prefix}.downsample.0", x, p, stride, 0,
            bias=q.affine_from_folded_bn(p, f"{prefix}.downsample.1"))
    return jnp.maximum(y + identity, 0)


def _basic_block_q(qs, x, p, prefix, stride):
    from pvr_habitat_tpu.ops import quantize as q

    identity = x
    y = q.conv_q(qs, f"{prefix}.conv1", x, p, stride, 1,
                 bias=q.affine_from_folded_bn(p, f"{prefix}.bn1"))
    y = jnp.maximum(y, 0)
    y = q.conv_q(qs, f"{prefix}.conv2", y, p, 1, 1,
                 bias=q.affine_from_folded_bn(p, f"{prefix}.bn2"))
    if f"{prefix}.downsample.0.weight" in p:
        dw = p[f"{prefix}.downsample.0.weight"]
        pad = (dw.shape[0] - 1) // 2
        identity = q.conv_q(
            qs, f"{prefix}.downsample.0", x, p, stride, pad,
            bias=q.affine_from_folded_bn(p, f"{prefix}.downsample.1"))
    return jnp.maximum(y + identity, 0)


def apply_int8(params_q, x, spec, scales=None):
    """W8A8 inference fast path (opt-in; not the parity path).

    params_q: quantize_resnet_params(fold_resnet_bn(params)).
    scales: calibrated activation scales; None = calibration mode —
    scales are computed from this batch and returned.

    Returns (out (N, out_size) f32/bf16, scales dict)."""
    from pvr_habitat_tpu.ops import quantize as q

    qs = q.QuantState(scales)
    y = q.conv_q(qs, "conv1", x, params_q, 2, 3,
                 bias=q.affine_from_folded_bn(params_q, "bn1"))
    y = jnp.maximum(y, 0)
    y = cm.max_pool(y, window=3, stride=2, padding=1)
    for stage_idx in range(4 if spec.cut != "l3" else 3):
        name = f"layer{stage_idx + 1}"
        grafted = (spec.cut == "l3" and stage_idx == 2) or \
                  (spec.cut == "l4" and stage_idx == 3)
        base = f"{name}.0" if grafted else name
        block_q = (_bottleneck_block_q if spec.block == "bottleneck"
                   else _basic_block_q)
        for i in range(spec.layers[stage_idx]):
            stride = 2 if (i == 0 and stage_idx > 0) else 1
            y = block_q(qs, y, params_q, f"{base}.{i}", stride)
        if grafted:
            y = _basic_block_q(qs, y, params_q, f"{name}.1", 1)
    if spec.cut in ("l3", "l4"):
        return jnp.transpose(y, (0, 3, 1, 2)).reshape(y.shape[0], -1), \
            qs.scales
    return jnp.mean(y, axis=(1, 2)), qs.scales


# -----------------------------------------------------------------------------
# Initialization (torchvision distributions) — used when no checkpoint.
# -----------------------------------------------------------------------------


def _init_bn(out, prefix, ch):
    out[f"{prefix}.weight"] = np.ones(ch, np.float32)
    out[f"{prefix}.bias"] = np.zeros(ch, np.float32)
    out[f"{prefix}.running_mean"] = np.zeros(ch, np.float32)
    out[f"{prefix}.running_var"] = np.ones(ch, np.float32)


def _init_basic(out, rng, prefix, cin, cout, stride, downsample_kernel=None):
    out[f"{prefix}.conv1.weight"] = cm.kaiming_normal_conv(
        rng, (cout, cin, 3, 3))
    _init_bn(out, f"{prefix}.bn1", cout)
    out[f"{prefix}.conv2.weight"] = cm.kaiming_normal_conv(
        rng, (cout, cout, 3, 3))
    _init_bn(out, f"{prefix}.bn2", cout)
    if downsample_kernel is not None:
        k = downsample_kernel
        out[f"{prefix}.downsample.0.weight"] = cm.kaiming_normal_conv(
            rng, (cout, cin, k, k))
        if k == 3:  # compress-graft shortcut conv carries a bias
            out[f"{prefix}.downsample.0.bias"] = cm.uniform_fan_in(
                rng, (cout,), cin * k * k)
        _init_bn(out, f"{prefix}.downsample.1", cout)


def _init_bottleneck(out, rng, prefix, cin, planes, stride):
    cout = planes * 4
    out[f"{prefix}.conv1.weight"] = cm.kaiming_normal_conv(
        rng, (planes, cin, 1, 1))
    _init_bn(out, f"{prefix}.bn1", planes)
    out[f"{prefix}.conv2.weight"] = cm.kaiming_normal_conv(
        rng, (planes, planes, 3, 3))
    _init_bn(out, f"{prefix}.bn2", planes)
    out[f"{prefix}.conv3.weight"] = cm.kaiming_normal_conv(
        rng, (cout, planes, 1, 1))
    _init_bn(out, f"{prefix}.bn3", cout)
    if stride != 1 or cin != cout:
        out[f"{prefix}.downsample.0.weight"] = cm.kaiming_normal_conv(
            rng, (cout, cin, 1, 1))
        _init_bn(out, f"{prefix}.downsample.1", cout)


def init_params(spec, rng):
    """Freshly initialized flat params (numpy) for ``spec``."""
    out = {}
    out["conv1.weight"] = cm.kaiming_normal_conv(rng, (64, 3, 7, 7))
    _init_bn(out, "bn1", 64)

    cin = 64
    exp = EXPANSION[spec.block]
    for stage_idx, planes in enumerate((64, 128, 256, 512)):
        if spec.cut == "l3" and stage_idx == 3:
            break
        name = f"layer{stage_idx + 1}"
        grafted = (spec.cut == "l3" and stage_idx == 2) or \
                  (spec.cut == "l4" and stage_idx == 3)
        base = f"{name}.0" if grafted else name
        for i in range(spec.layers[stage_idx]):
            stride = 2 if (i == 0 and stage_idx > 0) else 1
            if spec.block == "basic":
                ds = 1 if (stride != 1 or cin != planes) else None
                _init_basic(out, rng, f"{base}.{i}", cin, planes, stride, ds)
                cin = planes
            else:
                _init_bottleneck(out, rng, f"{base}.{i}", cin, planes, stride)
                cin = planes * exp
        if grafted:
            _init_basic(out, rng, f"{name}.1", spec.compress_in,
                        spec.compress_out, 1, downsample_kernel=3)
    return {k: jnp.asarray(v) for k, v in out.items()}
