"""Parity for the transformer/maskrcnn encoder families vs. torch
oracles, plus full-zoo constructibility with the SURVEY §2.4 dims."""

import numpy as np
import torch

import jax.numpy as jnp

from pvr_habitat_tpu.models import clip as clip_mod
from pvr_habitat_tpu.models import convert, maskrcnn, vit
from tests.torch_ref import clip_rn50 as oracle_rn50
from tests.torch_ref import maskrcnn as oracle_mask
from tests.torch_ref import vit as oracle_vit


def _x(n=2, hw=224, seed=0, scale=1.0):
    rng = np.random.RandomState(seed)
    return (rng.randn(n, hw, hw, 3) * scale).astype(np.float32)


def test_mae_encoder_parity():
    # Small config for test speed; same code path as base/large/huge.
    model = oracle_vit.MAEEncoder(img_size=224, patch=16, dim=96, depth=2,
                                  heads=4)
    model.eval()
    params = convert.torch_state_dict_to_flat(model.state_dict())
    x = _x(2)
    with torch.no_grad():
        want = model(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(vit.mae_apply(params, jnp.asarray(x), depth=2,
                                   num_heads=4, patch=16))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_mae_param_names_cover_init():
    model = oracle_vit.MAEEncoder(dim=768, depth=12, heads=12, patch=16)
    want = set(model.state_dict().keys())
    ours = set(vit.init_mae_params("mae_base", np.random.RandomState(0)))
    assert ours == want, ours ^ want


def test_clip_vit_parity():
    model = oracle_vit.CLIPVisionTransformer(width=96, layers=2, heads=4,
                                             patch=32, output_dim=64)
    model.eval()
    flat = convert.torch_state_dict_to_flat(
        {f"visual.{k}": v for k, v in model.state_dict().items()})
    x = _x(2, seed=1)
    with torch.no_grad():
        want = model(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    cfg = dict(width=96, layers=2, heads=4, patch=32, input_resolution=224,
               output_dim=64)
    got = np.asarray(clip_mod.clip_vit_apply(flat, jnp.asarray(x), cfg=cfg))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_clip_vit_param_names_cover_init():
    model = oracle_vit.CLIPVisionTransformer()
    want = {f"visual.{k}" for k in model.state_dict()}
    ours = set(clip_mod.init_clip_vit_params(np.random.RandomState(0)))
    assert ours == want, ours ^ want


def test_clip_rn50_parity():
    model = oracle_rn50.ModifiedResNet()
    model.eval()
    # randomize BN stats so eval normalization is non-trivial
    gen = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for name, buf in model.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn(buf.shape, generator=gen) * 0.05)
            elif name.endswith("running_var"):
                buf.copy_(torch.rand(buf.shape, generator=gen) * 0.5 + 0.75)
    flat = convert.torch_state_dict_to_flat(
        {f"visual.{k}": v for k, v in model.state_dict().items()})
    x = _x(1, seed=2, scale=0.5)
    with torch.no_grad():
        want = model(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(clip_mod.clip_rn50_apply(flat, jnp.asarray(x)))
    assert got.shape == want.shape == (1, 1024)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_clip_rn50_param_names_cover_init():
    model = oracle_rn50.ModifiedResNet()
    want = {f"visual.{k}" for k in model.state_dict()
            if not k.endswith("num_batches_tracked")}
    ours = set(clip_mod.init_clip_rn50_params(np.random.RandomState(0)))
    assert ours == want, ours ^ want


def test_maskrcnn_parity_and_dim():
    model = oracle_mask.C4Backbone()
    model.eval()
    gen = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for name, buf in model.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn(buf.shape, generator=gen) * 0.05)
            elif name.endswith("running_var"):
                buf.copy_(torch.rand(buf.shape, generator=gen) * 0.5 + 0.75)
    params = convert.torch_state_dict_to_flat(model.state_dict())
    x = _x(1, seed=3, scale=0.2)
    with torch.no_grad():
        want = model(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(maskrcnn.apply(params, jnp.asarray(x)))
    assert got.shape == want.shape == (1, 2156)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_maskrcnn_param_names_cover_init():
    model = oracle_mask.C4Backbone()
    want = {k for k in model.state_dict()
            if not k.endswith("num_batches_tracked")}
    ours = set(maskrcnn.init_params(np.random.RandomState(0)))
    assert ours == want, ours ^ want


def test_mae_bf16_softmax_accuracy():
    """The bf16 fast path's attention softmax runs in bf16 (f32 max/
    normalizer) — embeddings must stay cosine > 0.995 to the f32 parity
    path (see multihead_attention)."""
    model = oracle_vit.MAEEncoder(img_size=224, patch=16, dim=96, depth=2,
                                  heads=4)
    model.eval()
    params = convert.torch_state_dict_to_flat(model.state_dict())
    x = _x(4)
    want = np.asarray(vit.mae_apply(params, jnp.asarray(x), depth=2,
                                    num_heads=4, patch=16))
    params16 = {k: v.astype(jnp.bfloat16) for k, v in params.items()}
    got = np.asarray(vit.mae_apply(params16, jnp.asarray(x, jnp.bfloat16),
                                   depth=2, num_heads=4, patch=16)
                     ).astype(np.float32)
    cos = (got * want).sum(-1) / (np.linalg.norm(got, axis=-1)
                                  * np.linalg.norm(want, axis=-1))
    assert cos.min() > 0.995, cos
