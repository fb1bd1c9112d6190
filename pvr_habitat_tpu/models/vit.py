"""Vision Transformers: the MAE encoder family (reference:
src/vision_models/mae.py:74-302, used at mask_ratio=0.0 with the CLS
token as the embedding — src/embeddings.py:377-378) and the shared
transformer primitives reused by the CLIP towers.

TPU notes: token counts are tiny (197-257), so attention is expressed
as plain batched einsums — XLA fuses QK^T/softmax/PV into MXU-friendly
fusions at this size; a Pallas flash kernel would only add launch
overhead.  All weights stay in the torch layout ((out,in) linears) so
checkpoint conversion is key-for-key.
"""

import warnings

import numpy as np
import jax
import jax.numpy as jnp

from pvr_habitat_tpu.models import common as cm
from pvr_habitat_tpu.models import convert
from pvr_habitat_tpu.ops import image as im


MAE_CONFIGS = {
    # embed_dim, depth, num_heads, patch
    "mae_base": (768, 12, 12, 16),
    "mae_large": (1024, 24, 16, 16),
    "mae_huge": (1280, 32, 16, 14),
}


# -----------------------------------------------------------------------------
# 2-D sin-cos positional embeddings (reference: mae.py:23-70)
# -----------------------------------------------------------------------------


def sincos_pos_embed_1d(embed_dim, pos):
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega = 1.0 / 10000 ** (omega / (embed_dim / 2.0))
    out = np.einsum("m,d->md", pos.reshape(-1), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def sincos_pos_embed_2d(embed_dim, grid_size, cls_token=False):
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.stack(np.meshgrid(grid_w, grid_h), axis=0)  # w first
    emb_h = sincos_pos_embed_1d(embed_dim // 2, grid[0])
    emb_w = sincos_pos_embed_1d(embed_dim // 2, grid[1])
    pos = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        pos = np.concatenate([np.zeros((1, embed_dim)), pos], axis=0)
    return pos.astype(np.float32)


# -----------------------------------------------------------------------------
# Transformer primitives
# -----------------------------------------------------------------------------


def multihead_attention(x, wqkv, bqkv, wo, bo, num_heads,
                        precision=None):
    """x: (N, L, D).  Weights in torch (out, in) layout; ``wqkv``/
    ``bqkv`` are the fused (3D, D)/(3D,) projection as timm
    ``attn.qkv`` / torch MHA ``in_proj_weight`` store them.

    The projection deliberately runs as THREE einsums over weight
    slices, not one (N*L, D) x (D, 3D) GEMM: XLA fuses the three
    same-LHS einsums into one activation read already, and the fused
    GEMM variant forces a materialized (N, L, 3, H, hd) layout that
    costs 24% end-to-end (measured mae_base 2.60k -> 1.96k f/s — a
    documented negative result, docs/DESIGN.md)."""
    n, l, d = x.shape
    head = d // num_heads
    prec = cm._precision_for(x, precision)
    wqkv = wqkv.astype(x.dtype)
    bqkv = bqkv.astype(x.dtype)
    from pvr_habitat_tpu.ops.pallas.attention import (
        attention_core, fused_attention, stock_flash_attention)
    core = attention_core()
    use_kernel = (core != "einsum" and x.dtype == jnp.bfloat16
                  and l >= 128 and jax.default_backend() == "tpu")

    def proj(w, b):
        return jnp.einsum("nld,ed->nle", x, w, precision=prec) + b

    # On the einsum path, 1/sqrt(head) folds into the q weight/bias at
    # trace time — saves an elementwise pass over the (N, L, D) q
    # tensor.  The kernels scale internally, so q stays raw there.
    scale = jnp.asarray(1.0 / np.sqrt(head), x.dtype)
    wq, bq = ((wqkv[:d], bqkv[:d]) if use_kernel
              else (wqkv[:d] * scale, bqkv[:d] * scale))
    q = proj(wq, bq).reshape(n, l, num_heads, head)
    k = proj(wqkv[d:2 * d], bqkv[d:2 * d]).reshape(n, l, num_heads, head)
    v = proj(wqkv[2 * d:], bqkv[2 * d:]).reshape(n, l, num_heads, head)
    if use_kernel:
        # Opt-in kernel paths (PVR_TPU_ATTENTION_CORE=pallas|flash):
        # the in-repo VMEM kernel won 1.3x on the Nov-2025 libtpu but
        # XLA's einsum core overtook it on Jan-2026 (2.60k vs 2.47k f/s
        # mae_base), so einsum is the default — see docs/DESIGN.md.
        kern = (stock_flash_attention if core == "flash"
                else fused_attention)
        out = kern(jnp.transpose(q, (0, 2, 1, 3)),
                   jnp.transpose(k, (0, 2, 1, 3)),
                   jnp.transpose(v, (0, 2, 1, 3)))
        out = jnp.transpose(out, (0, 2, 1, 3))
    else:
        logits = jnp.einsum("nqhd,nkhd->nhqk", q, k, precision=prec)
        if x.dtype == jnp.bfloat16:
            # bf16 fast path: keep the (L, L) scores in bf16 — the f32
            # softmax round-trips ~0.5 GB/block through HBM at ViT-B
            # shapes.  Max and the normalizer accumulate in f32 for
            # stability; probs themselves are <= 1 so bf16 resolution
            # is the path's native accuracy.
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp(logits - m)
            denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
            probs = (e * (1.0 / denom).astype(x.dtype))
        else:
            probs = jax.nn.softmax(logits.astype(jnp.float32),
                                   axis=-1).astype(x.dtype)
        out = jnp.einsum("nhqk,nkhd->nqhd", probs, v, precision=prec)
    out = out.reshape(n, l, d)
    out = jnp.einsum("nld,ed->nle", out, wo.astype(x.dtype), precision=prec)
    return out + bo.astype(x.dtype)


def timm_block(x, p, prefix, num_heads, eps=1e-6, gelu=cm.gelu):
    """timm ViT Block: pre-LN attention + MLP with residuals."""
    y = cm.layer_norm(x, p, f"{prefix}.norm1", eps=eps)
    y = multihead_attention(
        y, p[f"{prefix}.attn.qkv.weight"], p[f"{prefix}.attn.qkv.bias"],
        p[f"{prefix}.attn.proj.weight"], p[f"{prefix}.attn.proj.bias"],
        num_heads)
    x = x + y
    y = cm.layer_norm(x, p, f"{prefix}.norm2", eps=eps)
    n, l, _ = y.shape
    y = y.reshape(n * l, -1)
    y = gelu(cm.linear(y, p, f"{prefix}.mlp.fc1"))
    y = cm.linear(y, p, f"{prefix}.mlp.fc2")
    return x + y.reshape(n, l, -1)


# -----------------------------------------------------------------------------
# MAE encoder
# -----------------------------------------------------------------------------


def mae_apply(params, x, *, depth, num_heads, patch, train=False):
    """x: (N, 224, 224, 3) normalized NHWC -> (N, D) CLS embedding.
    forward_encoder at mask_ratio=0.0 (reference: mae.py:190-224)."""
    del train
    n = x.shape[0]
    # PatchEmbed: conv patch x patch stride patch == unfold + linear.
    y = cm.conv2d(x, params["patch_embed.proj.weight"], stride=patch,
                  padding=0, bias=params["patch_embed.proj.bias"])
    gh, gw, d = y.shape[1], y.shape[2], y.shape[3]
    y = y.reshape(n, gh * gw, d)
    pos = params["pos_embed"].astype(y.dtype)
    y = y + pos[:, 1:, :]
    cls = params["cls_token"].astype(y.dtype) + pos[:, :1, :]
    y = jnp.concatenate([jnp.broadcast_to(cls, (n, 1, d)), y], axis=1)
    for i in range(depth):
        y = timm_block(y, params, f"blocks.{i}", num_heads)
    y = cm.layer_norm(y, params, "norm", eps=1e-6)
    return y[:, 0, :]


def _timm_block_q(qs, x, p, prefix, num_heads):
    """int8 ViT block: linears run W8A8; LN/attention-core stay bf16."""
    from pvr_habitat_tpu.ops import quantize as qz

    n, l, d = x.shape
    y = cm.layer_norm(x, p, f"{prefix}.norm1", eps=1e-6)
    qkv = qz.linear_q(qs, f"{prefix}.attn.qkv", y.reshape(n * l, d), p)
    qkv = qkv.reshape(n, l, 3, num_heads, d // num_heads)
    q_, k_, v_ = (qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
    from pvr_habitat_tpu.ops.pallas.attention import (
        attention_core, fused_attention, stock_flash_attention)
    core = attention_core()
    if jax.default_backend() == "tpu" and l >= 128 and core != "einsum":
        kern = (stock_flash_attention if core == "flash"
                else fused_attention)
        out = kern(jnp.transpose(q_, (0, 2, 1, 3)),
                   jnp.transpose(k_, (0, 2, 1, 3)),
                   jnp.transpose(v_, (0, 2, 1, 3)))
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(n, l, d)
    else:
        scale = jnp.asarray(1.0 / np.sqrt(d // num_heads), q_.dtype)
        logits = jnp.einsum("nqhd,nkhd->nhqk", q_ * scale, k_)
        probs = jax.nn.softmax(logits.astype(jnp.float32),
                               -1).astype(q_.dtype)
        out = jnp.einsum("nhqk,nkhd->nqhd", probs, v_).reshape(n, l, d)
    out = qz.linear_q(qs, f"{prefix}.attn.proj", out.reshape(n * l, d), p)
    x = x + out.reshape(n, l, d)

    y = cm.layer_norm(x, p, f"{prefix}.norm2", eps=1e-6)
    y = cm.gelu(qz.linear_q(qs, f"{prefix}.mlp.fc1",
                            y.reshape(n * l, d), p))
    y = qz.linear_q(qs, f"{prefix}.mlp.fc2", y, p)
    return x + y.reshape(n, l, d)


def mae_apply_int8(params_q, x, *, depth, num_heads, patch, scales=None):
    """W8A8 MAE encoder (opt-in fast path).  Returns (cls, scales)."""
    from pvr_habitat_tpu.ops import quantize as qz

    qs = qz.QuantState(scales)
    n = x.shape[0]
    y = qz.conv_q(qs, "patch_embed.proj", x, params_q, patch, 0,
                  bias=params_q["patch_embed.proj.bias"]
                  .astype(jnp.float32))
    gh, gw, d = y.shape[1], y.shape[2], y.shape[3]
    y = y.reshape(n, gh * gw, d)
    pos = params_q["pos_embed"].astype(y.dtype)
    y = y + pos[:, 1:, :]
    cls = params_q["cls_token"].astype(y.dtype) + pos[:, :1, :]
    y = jnp.concatenate([jnp.broadcast_to(cls, (n, 1, d)), y], axis=1)
    for i in range(depth):
        y = _timm_block_q(qs, y, params_q, f"blocks.{i}", num_heads)
    y = cm.layer_norm(y, params_q, "norm", eps=1e-6)
    return y[:, 0, :], qs.scales


def init_mae_params(name, rng):
    """Xavier-uniform torch-equivalent init, fixed sin-cos pos embed."""
    embed_dim, depth, num_heads, patch = MAE_CONFIGS[name]
    grid = 224 // patch
    out = {}

    def xavier(shape_out_in):
        fan_out, fan_in = shape_out_in
        a = np.sqrt(6.0 / (fan_in + fan_out))
        return rng.uniform(-a, a, size=shape_out_in).astype(np.float32)

    w = xavier((embed_dim, 3 * patch * patch)).reshape(
        embed_dim, 3, patch, patch)
    out["patch_embed.proj.weight"] = np.transpose(w, (2, 3, 1, 0))
    out["patch_embed.proj.bias"] = np.zeros(embed_dim, np.float32)
    out["cls_token"] = (rng.normal(0, 0.02, (1, 1, embed_dim))
                        .astype(np.float32))
    out["pos_embed"] = sincos_pos_embed_2d(
        embed_dim, grid, cls_token=True)[None]
    for i in range(depth):
        pre = f"blocks.{i}"
        out[f"{pre}.norm1.weight"] = np.ones(embed_dim, np.float32)
        out[f"{pre}.norm1.bias"] = np.zeros(embed_dim, np.float32)
        out[f"{pre}.attn.qkv.weight"] = xavier((3 * embed_dim, embed_dim))
        out[f"{pre}.attn.qkv.bias"] = np.zeros(3 * embed_dim, np.float32)
        out[f"{pre}.attn.proj.weight"] = xavier((embed_dim, embed_dim))
        out[f"{pre}.attn.proj.bias"] = np.zeros(embed_dim, np.float32)
        out[f"{pre}.norm2.weight"] = np.ones(embed_dim, np.float32)
        out[f"{pre}.norm2.bias"] = np.zeros(embed_dim, np.float32)
        out[f"{pre}.mlp.fc1.weight"] = xavier((4 * embed_dim, embed_dim))
        out[f"{pre}.mlp.fc1.bias"] = np.zeros(4 * embed_dim, np.float32)
        out[f"{pre}.mlp.fc2.weight"] = xavier((embed_dim, 4 * embed_dim))
        out[f"{pre}.mlp.fc2.bias"] = np.zeros(embed_dim, np.float32)
    out["norm.weight"] = np.ones(embed_dim, np.float32)
    out["norm.bias"] = np.zeros(embed_dim, np.float32)
    return {k: jnp.asarray(v) for k, v in out.items()}


def build_mae_encoder(name, pretrained=True, checkpoint_dir=None):
    from pvr_habitat_tpu.models.registry import (CHECKPOINT_FILES,
                                                 EncoderHandle,
                                                 _find_checkpoint,
                                                 _name_seed)

    embed_dim, depth, num_heads, patch = MAE_CONFIGS[name]
    path = _find_checkpoint(name, checkpoint_dir) if pretrained else None
    if path is not None:
        ckpt = convert.load_torch_checkpoint(path)
        state_dict = ckpt.get("model", ckpt)
        # strict=False load: the checkpoint's decoder_* keys are unused.
        expected = set(init_mae_params(name, np.random.RandomState(0)))
        flat = convert.torch_state_dict_to_flat(state_dict)
        params = {k: v for k, v in flat.items() if k in expected}
        missing = expected - set(params)
        # pos_embed is fixed sin-cos; regenerate if the checkpoint
        # omitted it.
        if "pos_embed" in missing:
            params["pos_embed"] = jnp.asarray(
                sincos_pos_embed_2d(embed_dim, 224 // patch, True)[None])
            missing.discard("pos_embed")
        convert.check_expected(params, expected, context=name)
    else:
        if pretrained:
            warnings.warn(f"encoder '{name}': checkpoint "
                          f"{CHECKPOINT_FILES[name]} not found; random init")
        params = init_mae_params(name,
                                 np.random.RandomState(_name_seed(name)))

    def apply_fn(p, x, train=False):
        return mae_apply(p, x, depth=depth, num_heads=num_heads,
                         patch=patch, train=train)

    return EncoderHandle(name, im.mae_preprocess(), apply_fn, params,
                         embed_dim)
