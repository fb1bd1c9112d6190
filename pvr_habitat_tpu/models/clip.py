"""CLIP visual towers (reference: src/embeddings.py:298-314 loads
openai/CLIP 'ViT-B/32' and 'RN50' and embeds via encode_image).

Implemented from the published architecture with OpenAI checkpoint key
names under the ``visual.`` prefix:

- ViT-B/32: patch conv (no bias) -> class embedding + learned
  positional embedding -> ln_pre -> 12 pre-LN resblocks with QuickGELU
  -> ln_post on CLS -> linear projection to 512.
- RN50 (ModifiedResNet): 3-conv stem with avgpool, bottlenecks whose
  stride is an avgpool (conv strides are all 1), and an
  AttentionPool2d head (mean token as query) to 1024.
"""

import warnings

import numpy as np
import jax
import jax.numpy as jnp

from pvr_habitat_tpu.models import common as cm
from pvr_habitat_tpu.models import convert
from pvr_habitat_tpu.models.vit import multihead_attention
from pvr_habitat_tpu.ops import image as im


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


# -----------------------------------------------------------------------------
# ViT-B/32 tower
# -----------------------------------------------------------------------------

VIT_B32 = dict(width=768, layers=12, heads=12, patch=32,
               input_resolution=224, output_dim=512)


def _clip_resblock(x, p, prefix, num_heads):
    y = cm.layer_norm(x, p, f"{prefix}.ln_1", eps=1e-5)
    y = multihead_attention(
        y, p[f"{prefix}.attn.in_proj_weight"],
        p[f"{prefix}.attn.in_proj_bias"],
        p[f"{prefix}.attn.out_proj.weight"],
        p[f"{prefix}.attn.out_proj.bias"], num_heads)
    x = x + y
    y = cm.layer_norm(x, p, f"{prefix}.ln_2", eps=1e-5)
    n, l, _ = y.shape
    y = y.reshape(n * l, -1)
    y = quick_gelu(cm.linear(y, p, f"{prefix}.mlp.c_fc"))
    y = cm.linear(y, p, f"{prefix}.mlp.c_proj")
    return x + y.reshape(n, l, -1)


def clip_vit_apply(params, x, train=False, cfg=VIT_B32):
    del train
    n = x.shape[0]
    y = cm.conv2d(x, params["visual.conv1.weight"], stride=cfg["patch"],
                  padding=0)
    gh, gw, d = y.shape[1], y.shape[2], y.shape[3]
    y = y.reshape(n, gh * gw, d)
    cls = params["visual.class_embedding"].astype(y.dtype)
    cls = jnp.broadcast_to(cls.reshape(1, 1, d), (n, 1, d))
    y = jnp.concatenate([cls, y], axis=1)
    y = y + params["visual.positional_embedding"].astype(y.dtype)
    y = cm.layer_norm(y, params, "visual.ln_pre", eps=1e-5)
    for i in range(cfg["layers"]):
        y = _clip_resblock(y, params, f"visual.transformer.resblocks.{i}",
                           cfg["heads"])
    y = cm.layer_norm(y[:, 0, :], params, "visual.ln_post", eps=1e-5)
    proj = params["visual.proj"].astype(y.dtype)  # (width, output_dim)
    return jnp.matmul(y, proj, precision=cm._precision_for(y, None))


def init_clip_vit_params(rng, cfg=VIT_B32):
    width, layers, patch = cfg["width"], cfg["layers"], cfg["patch"]
    grid = cfg["input_resolution"] // patch
    scale = width ** -0.5
    out = {}
    w = rng.normal(0, scale, (width, 3, patch, patch)).astype(np.float32)
    out["visual.conv1.weight"] = np.transpose(w, (2, 3, 1, 0))
    out["visual.class_embedding"] = (
        scale * rng.normal(0, 1, (width,))).astype(np.float32)
    out["visual.positional_embedding"] = (
        scale * rng.normal(0, 1, (grid * grid + 1, width))).astype(np.float32)
    for ln in ("ln_pre", "ln_post"):
        out[f"visual.{ln}.weight"] = np.ones(width, np.float32)
        out[f"visual.{ln}.bias"] = np.zeros(width, np.float32)
    for i in range(layers):
        pre = f"visual.transformer.resblocks.{i}"
        out[f"{pre}.ln_1.weight"] = np.ones(width, np.float32)
        out[f"{pre}.ln_1.bias"] = np.zeros(width, np.float32)
        out[f"{pre}.ln_2.weight"] = np.ones(width, np.float32)
        out[f"{pre}.ln_2.bias"] = np.zeros(width, np.float32)
        out[f"{pre}.attn.in_proj_weight"] = (
            rng.normal(0, scale, (3 * width, width))).astype(np.float32)
        out[f"{pre}.attn.in_proj_bias"] = np.zeros(3 * width, np.float32)
        out[f"{pre}.attn.out_proj.weight"] = (
            rng.normal(0, scale, (width, width))).astype(np.float32)
        out[f"{pre}.attn.out_proj.bias"] = np.zeros(width, np.float32)
        out[f"{pre}.mlp.c_fc.weight"] = (
            rng.normal(0, scale, (4 * width, width))).astype(np.float32)
        out[f"{pre}.mlp.c_fc.bias"] = np.zeros(4 * width, np.float32)
        out[f"{pre}.mlp.c_proj.weight"] = (
            rng.normal(0, scale, (width, 4 * width))).astype(np.float32)
        out[f"{pre}.mlp.c_proj.bias"] = np.zeros(width, np.float32)
    out["visual.proj"] = (
        scale * rng.normal(0, 1, (width, cfg["output_dim"]))
    ).astype(np.float32)
    return {k: jnp.asarray(v) for k, v in out.items()}


# -----------------------------------------------------------------------------
# ModifiedResNet (RN50) tower
# -----------------------------------------------------------------------------

RN50 = dict(layers=(3, 4, 6, 3), width=64, output_dim=1024, heads=32,
            input_resolution=224)


def _avg_pool(x, k):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / (k * k)


def _modified_bottleneck(x, p, prefix, stride, train):
    identity = x
    y = cm.conv2d(x, p[f"{prefix}.conv1.weight"], 1, 0)
    y = jnp.maximum(cm.batch_norm(y, p, f"{prefix}.bn1", train=train), 0)
    y = cm.conv2d(y, p[f"{prefix}.conv2.weight"], 1, 1)
    y = jnp.maximum(cm.batch_norm(y, p, f"{prefix}.bn2", train=train), 0)
    if stride > 1:
        y = _avg_pool(y, stride)
    y = cm.conv2d(y, p[f"{prefix}.conv3.weight"], 1, 0)
    y = cm.batch_norm(y, p, f"{prefix}.bn3", train=train)
    if f"{prefix}.downsample.1.weight" in p:
        # OpenAI downsample: ('-1' avgpool, '0' 1x1 conv, '1' bn)
        identity = _avg_pool(identity, stride) if stride > 1 else identity
        identity = cm.conv2d(identity, p[f"{prefix}.downsample.0.weight"],
                             1, 0)
        identity = cm.batch_norm(identity, p, f"{prefix}.downsample.1",
                                 train=train)
    return jnp.maximum(y + identity, 0)


def _attention_pool(x, p, num_heads):
    """AttentionPool2d: (N, H, W, C) -> (N, output_dim)."""
    n, h, w, c = x.shape
    tokens = x.reshape(n, h * w, c)
    mean = jnp.mean(tokens, axis=1, keepdims=True)
    tokens = jnp.concatenate([mean, tokens], axis=1)      # (N, HW+1, C)
    pos = p["visual.attnpool.positional_embedding"].astype(tokens.dtype)
    tokens = tokens + pos[None]
    prec = cm._precision_for(tokens, None)

    def proj(name, t):
        w_ = p[f"visual.attnpool.{name}.weight"].astype(t.dtype)
        b_ = p[f"visual.attnpool.{name}.bias"].astype(t.dtype)
        return jnp.einsum("nld,ed->nle", t, w_, precision=prec) + b_

    q = proj("q_proj", tokens[:, :1])                     # query = mean token
    k = proj("k_proj", tokens)
    v = proj("v_proj", tokens)
    head = q.shape[-1] // num_heads
    q = q.reshape(n, 1, num_heads, head)
    k = k.reshape(n, -1, num_heads, head)
    v = v.reshape(n, -1, num_heads, head)
    scale = jnp.asarray(1.0 / np.sqrt(head), q.dtype)
    logits = jnp.einsum("nqhd,nkhd->nhqk", q * scale, k, precision=prec)
    probs = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(q.dtype)
    out = jnp.einsum("nhqk,nkhd->nqhd", probs, v, precision=prec)
    out = out.reshape(n, 1, num_heads * head)
    return proj("c_proj", out)[:, 0]


def clip_rn50_apply(params, x, train=False, cfg=RN50):
    p = {k: v for k, v in params.items()}

    def stem_conv(i, y, stride):
        y = cm.conv2d(y, p[f"visual.conv{i}.weight"], stride, 1)
        return jnp.maximum(
            cm.batch_norm(y, p, f"visual.bn{i}", train=train), 0)

    y = stem_conv(1, x, 2)
    y = stem_conv(2, y, 1)
    y = stem_conv(3, y, 1)
    y = _avg_pool(y, 2)
    for stage_idx, blocks in enumerate(cfg["layers"]):
        stride = 1 if stage_idx == 0 else 2
        for i in range(blocks):
            y = _modified_bottleneck(
                y, p, f"visual.layer{stage_idx + 1}.{i}",
                stride if i == 0 else 1, train)
    return _attention_pool(y, p, cfg["heads"])


def init_clip_rn50_params(rng, cfg=RN50):
    out = {}
    width = cfg["width"]

    def conv(name, o, i, k):
        out[f"{name}.weight"] = cm.kaiming_normal_conv(rng, (o, i, k, k))

    def bn(name, ch):
        out[f"{name}.weight"] = np.ones(ch, np.float32)
        out[f"{name}.bias"] = np.zeros(ch, np.float32)
        out[f"{name}.running_mean"] = np.zeros(ch, np.float32)
        out[f"{name}.running_var"] = np.ones(ch, np.float32)

    conv("visual.conv1", width // 2, 3, 3)
    bn("visual.bn1", width // 2)
    conv("visual.conv2", width // 2, width // 2, 3)
    bn("visual.bn2", width // 2)
    conv("visual.conv3", width, width // 2, 3)
    bn("visual.bn3", width)

    cin = width
    for stage_idx, blocks in enumerate(cfg["layers"]):
        planes = width * (2 ** stage_idx)
        for i in range(blocks):
            pre = f"visual.layer{stage_idx + 1}.{i}"
            conv(f"{pre}.conv1", planes, cin, 1)
            bn(f"{pre}.bn1", planes)
            conv(f"{pre}.conv2", planes, planes, 3)
            bn(f"{pre}.bn2", planes)
            conv(f"{pre}.conv3", planes * 4, planes, 1)
            bn(f"{pre}.bn3", planes * 4)
            if i == 0 and (stage_idx > 0 or cin != planes * 4):
                conv(f"{pre}.downsample.0", planes * 4, cin, 1)
                bn(f"{pre}.downsample.1", planes * 4)
            cin = planes * 4
    embed_dim = width * 32  # 2048
    spacial = (cfg["input_resolution"] // 32) ** 2
    out["visual.attnpool.positional_embedding"] = (
        rng.normal(0, embed_dim ** -0.5, (spacial + 1, embed_dim))
    ).astype(np.float32)
    for name, o in (("q_proj", embed_dim), ("k_proj", embed_dim),
                    ("v_proj", embed_dim), ("c_proj", cfg["output_dim"])):
        out[f"visual.attnpool.{name}.weight"] = (
            rng.normal(0, embed_dim ** -0.5, (o, embed_dim))
        ).astype(np.float32)
        out[f"visual.attnpool.{name}.bias"] = np.zeros(o, np.float32)
    return {k: jnp.asarray(v) for k, v in out.items()}


# -----------------------------------------------------------------------------
# int8 fast path for the RN50 tower (opt-in; attnpool stays bf16)
# -----------------------------------------------------------------------------


def _modified_bottleneck_q(qs, x, p, prefix, stride):
    from pvr_habitat_tpu.ops import quantize as q

    identity = x
    y = q.conv_q(qs, f"{prefix}.conv1", x, p, 1, 0,
                 bias=q.affine_from_folded_bn(p, f"{prefix}.bn1"))
    y = jnp.maximum(y, 0)
    y = q.conv_q(qs, f"{prefix}.conv2", y, p, 1, 1,
                 bias=q.affine_from_folded_bn(p, f"{prefix}.bn2"))
    y = jnp.maximum(y, 0)
    if stride > 1:
        y = _avg_pool(y, stride)
    y = q.conv_q(qs, f"{prefix}.conv3", y, p, 1, 0,
                 bias=q.affine_from_folded_bn(p, f"{prefix}.bn3"))
    if f"{prefix}.downsample.1.weight" in p:
        identity = _avg_pool(identity, stride) if stride > 1 else identity
        identity = q.conv_q(
            qs, f"{prefix}.downsample.0", identity, p, 1, 0,
            bias=q.affine_from_folded_bn(p, f"{prefix}.downsample.1"))
    return jnp.maximum(y + identity, 0)


def clip_rn50_apply_int8(params_q, x, scales=None, cfg=RN50):
    """W8A8 ModifiedResNet (convs int8; attention pool in the input
    dtype).  Returns (out, scales) like resnet.apply_int8."""
    from pvr_habitat_tpu.ops import quantize as q

    qs = q.QuantState(scales)
    y = x
    for i, stride in ((1, 2), (2, 1), (3, 1)):
        y = q.conv_q(qs, f"visual.conv{i}", y, params_q, stride, 1,
                     bias=q.affine_from_folded_bn(params_q,
                                                  f"visual.bn{i}"))
        y = jnp.maximum(y, 0)
    y = _avg_pool(y, 2)
    for stage_idx, blocks in enumerate(cfg["layers"]):
        stride = 1 if stage_idx == 0 else 2
        for i in range(blocks):
            y = _modified_bottleneck_q(
                qs, y, params_q, f"visual.layer{stage_idx + 1}.{i}",
                stride if i == 0 else 1)
    return _attention_pool(y, params_q, cfg["heads"]), qs.scales


# -----------------------------------------------------------------------------
# Builders
# -----------------------------------------------------------------------------


def build_clip_encoder(name, pretrained=True, checkpoint_dir=None):
    from pvr_habitat_tpu.models.registry import (CHECKPOINT_FILES,
                                                 EncoderHandle,
                                                 _find_checkpoint,
                                                 _name_seed)

    if name == "clip_vit":
        cfg, init_fn, apply_fn, out_size = \
            VIT_B32, init_clip_vit_params, clip_vit_apply, 512
    elif name == "clip_rn50":
        cfg, init_fn, apply_fn, out_size = \
            RN50, init_clip_rn50_params, clip_rn50_apply, 1024
    else:
        raise NotImplementedError(f"Requested model not available: {name}")

    path = _find_checkpoint(name, checkpoint_dir) if pretrained else None
    if path is not None:
        ckpt = convert.load_torch_checkpoint(path)
        state_dict = ckpt.get("state_dict", ckpt)
        expected = set(init_fn(np.random.RandomState(0)))
        flat = convert.torch_state_dict_to_flat(state_dict)
        params = {k: v for k, v in flat.items() if k in expected}
        convert.check_expected(params, expected, context=name)
    else:
        if pretrained:
            warnings.warn(f"encoder '{name}': checkpoint "
                          f"{CHECKPOINT_FILES[name]} not found; random init")
        params = init_fn(np.random.RandomState(_name_seed(name)))

    return EncoderHandle(
        name, im.clip_preprocess(cfg["input_resolution"]),
        lambda p, x, train=False: apply_fn(p, x, train=train),
        params, out_size)
