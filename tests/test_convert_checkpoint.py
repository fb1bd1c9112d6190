"""convert_checkpoint CLI: torch file -> validated flat weights."""

import sys

import numpy as np
import torch

from pvr_habitat_tpu.models import convert
from tests.torch_ref import resnet as tref


def test_convert_moco_checkpoint(tmp_path):
    from pvr_habitat_tpu.tools import convert_checkpoint as cc

    # Build a MoCo-style checkpoint: module.encoder_q.* + extras.
    model = tref.resnet50()
    state = {f"module.encoder_q.{k}": v for k, v in model.state_dict().items()}
    state["module.encoder_q.fc.0.weight"] = torch.zeros(2, 2)
    state["module.encoder_k.conv1.weight"] = torch.zeros(64, 3, 7, 7)
    src = str(tmp_path / "moco_aug_custom.pth")
    torch.save({"state_dict": state}, src)

    out = str(tmp_path / "converted.tar")
    sys.argv = ["convert_checkpoint", "--embedding_name", "moco_aug",
                "--checkpoint", src, "--out", out]
    cc.main()

    params = convert.load_flat(out)
    want = convert.torch_state_dict_to_flat(model.state_dict())
    assert set(params) == set(want)
    np.testing.assert_array_equal(np.asarray(params["conv1.weight"]),
                                  np.asarray(want["conv1.weight"]))


# -----------------------------------------------------------------------------
# Every checkpoint-surgery scheme, validated against a REAL torch.save
# file in the reference's exact on-disk format (round-1 VERDICT item 4):
# module.* (places), module.encoder_q.* + fc drop (moco, incl. the
# compressed l3 graft), detectron2 {"model": backbone.* + RPN/ROI junk},
# CLIP full state dict with text-tower keys, MAE {"model": ...} with
# decoder_* keys.  Each round-trips through registry.build_encoder and
# must match the torch oracle's forward exactly.
# -----------------------------------------------------------------------------

import jax.numpy as jnp

from pvr_habitat_tpu.models.registry import CHECKPOINT_FILES, build_encoder


def _randomize_bn(model, seed):
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, buf in model.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn(buf.shape, generator=gen) * 0.05)
            elif name.endswith("running_var"):
                buf.copy_(torch.rand(buf.shape, generator=gen) * 0.5 + 0.75)


def _stage(tmp_path, name, payload):
    torch.save(payload, str(tmp_path / CHECKPOINT_FILES[name]))


def _forward_parity(handle, torch_forward, hw=64, seed=0, scale=0.3,
                    atol=1e-3):
    x = (np.random.RandomState(seed).randn(1, hw, hw, 3) * scale
         ).astype(np.float32)
    with torch.no_grad():
        want = torch_forward(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(handle.apply_fn(handle.params, jnp.asarray(x),
                                     train=False))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-3)


def test_scheme_places_module_prefix(tmp_path):
    """resnet50_places: {'state_dict': module.*} with strip_module_prefix
    (reference: src/vision_models/resnet.py:35-42)."""
    model = tref.resnet50()
    model.eval()
    _randomize_bn(model, 0)
    state = {f"module.{k}": v for k, v in model.state_dict().items()}
    state["module.fc.weight"] = torch.zeros(365, 2048)  # places head: unused
    state["module.fc.bias"] = torch.zeros(365)
    _stage(tmp_path, "resnet50_places", {"state_dict": state})

    handle = build_encoder("resnet50_places", pretrained=True,
                           checkpoint_dir=str(tmp_path))
    want = convert.torch_state_dict_to_flat(model.state_dict())
    assert set(handle.params) == set(want)
    _forward_parity(handle, model)


def test_scheme_moco_l3_compressed(tmp_path):
    """moco_aug_l3: module.encoder_q.* strip + fc drop on the l3 grafted
    model — the compress-block keys (layer3.1.*) ride the checkpoint
    (reference: src/vision_models/moco.py:29-71 asserts missing==0)."""
    wrapper = tref.resnet50_compressed("l3")
    wrapper.eval()
    inner = wrapper.model
    _randomize_bn(inner, 1)
    state = {f"module.encoder_q.{k}": v for k, v in
             inner.state_dict().items()}
    state["module.encoder_q.fc.0.weight"] = torch.zeros(2048, 2048)
    state["module.encoder_q.fc.2.weight"] = torch.zeros(128, 2048)
    state.update({f"module.encoder_k.{k}": torch.zeros_like(v)
                  for k, v in list(inner.state_dict().items())[:3]})
    state["queue"] = torch.zeros(128, 65536)
    _stage(tmp_path, "moco_aug_l3", {"state_dict": state,
                                     "epoch": 200, "arch": "resnet50"})

    handle = build_encoder("moco_aug_l3", pretrained=True,
                           checkpoint_dir=str(tmp_path))
    want = convert.torch_state_dict_to_flat(inner.state_dict())
    assert set(handle.params) == set(want)
    _forward_parity(handle, wrapper)


def test_scheme_maskrcnn_backbone(tmp_path):
    """maskrcnn_l3: detectron2 {'model': ...} payload — keep backbone.*,
    discard proposal generator / ROI heads
    (reference: src/vision_models/maskrcnn.py:132-136)."""
    from tests.torch_ref import maskrcnn as oracle_mask

    model = oracle_mask.C4Backbone()
    model.eval()
    _randomize_bn(model, 2)
    state = {f"backbone.{k}": v for k, v in model.state_dict().items()}
    # detectron2 junk the surgery must drop
    state["proposal_generator.rpn_head.conv.weight"] = \
        torch.zeros(1024, 1024, 3, 3)
    state["roi_heads.box_predictor.cls_score.weight"] = \
        torch.zeros(81, 2048)
    state["pixel_mean"] = torch.zeros(3)
    _stage(tmp_path, "maskrcnn_l3", {"model": state, "iteration": 9999})

    handle = build_encoder("maskrcnn_l3", pretrained=True,
                           checkpoint_dir=str(tmp_path))
    want = convert.torch_state_dict_to_flat(model.state_dict())
    assert set(handle.params) == set(want)
    _forward_parity(handle, model, hw=224, seed=2, scale=0.2, atol=2e-3)


def test_scheme_clip_full_state_dict(tmp_path):
    """clip_vit: the full CLIP state dict — visual.* tower kept, text
    tower (top-level transformer.*, token_embedding, text_projection,
    logit_scale, positional_embedding) dropped
    (reference: src/embeddings.py:298-314 via clip.load)."""
    from tests.torch_ref import vit as oracle_vit

    model = oracle_vit.CLIPVisionTransformer()
    model.eval()
    state = {f"visual.{k}": v for k, v in model.state_dict().items()}
    # text tower keys present in every OpenAI CLIP checkpoint
    state["positional_embedding"] = torch.zeros(77, 512)
    state["text_projection"] = torch.zeros(512, 512)
    state["logit_scale"] = torch.zeros(())
    state["token_embedding.weight"] = torch.zeros(49408, 512)
    state["ln_final.weight"] = torch.zeros(512)
    state["transformer.resblocks.0.attn.in_proj_weight"] = \
        torch.zeros(1536, 512)
    _stage(tmp_path, "clip_vit", state)

    handle = build_encoder("clip_vit", pretrained=True,
                           checkpoint_dir=str(tmp_path))
    want = convert.torch_state_dict_to_flat(
        {f"visual.{k}": v for k, v in model.state_dict().items()})
    assert set(handle.params) == set(want)
    _forward_parity(handle, model, hw=224, seed=3, atol=2e-3)


def test_scheme_mae_model_key_with_decoder(tmp_path):
    """mae_base: {'model': ...} payload with decoder_* keys to ignore
    (reference: src/embeddings.py:139-148, strict=False load)."""
    from tests.torch_ref import vit as oracle_vit

    model = oracle_vit.MAEEncoder(dim=768, depth=12, heads=12, patch=16)
    model.eval()
    state = dict(model.state_dict())
    state["mask_token"] = torch.zeros(1, 1, 512)
    state["decoder_pos_embed"] = torch.zeros(1, 197, 512)
    state["decoder_embed.weight"] = torch.zeros(512, 768)
    state["decoder_blocks.0.norm1.weight"] = torch.zeros(512)
    state["decoder_pred.weight"] = torch.zeros(768, 512)
    state["decoder_norm.weight"] = torch.zeros(512)
    _stage(tmp_path, "mae_base", {"model": state})

    handle = build_encoder("mae_base", pretrained=True,
                           checkpoint_dir=str(tmp_path))
    want = convert.torch_state_dict_to_flat(model.state_dict())
    assert set(handle.params) == set(want)
    _forward_parity(handle, model, hw=224, seed=4, atol=1e-3)


# -----------------------------------------------------------------------------
# VERDICT r3 #7: the FULL conversion sweep — every CHECKPOINT_FILES name
# round-trips a full-shape torch state_dict in the reference's exact
# on-disk layout (wrapper payload + key prefixes + training junk) through
# surgery -> convert -> registry.build_encoder.  A future real-weight
# drop then needs zero code: staging the file under CHECKPOINT_FILES[name]
# is sufficient.  References: src/vision_models/moco.py:6-113 (encoder_q
# surgery), resnet.py:6-104 (module strip + l3/l4 grafts),
# src/embeddings.py:121-195 (checkpoint paths per name).
# -----------------------------------------------------------------------------

import pytest

from tests.test_registry import _expected as _expected_dim
from tests.torch_ref import maskrcnn as oracle_mask
from tests.torch_ref import vit as oracle_vit
from tests.torch_ref.clip_rn50 import ModifiedResNet

_MAE_CFG = {"mae_base": (768, 12, 12, 16), "mae_large": (1024, 24, 16, 16),
            "mae_huge": (1280, 32, 16, 14)}


def _moco_payload(inner):
    """MoCo-v2 on-disk layout: module.encoder_q.* + MLP-head fc junk +
    momentum encoder + queue (src/vision_models/moco.py:14-24)."""
    state = {f"module.encoder_q.{k}": v
             for k, v in inner.state_dict().items()}
    state["module.encoder_q.fc.0.weight"] = torch.zeros(2048, 2048)
    state["module.encoder_q.fc.0.bias"] = torch.zeros(2048)
    state["module.encoder_q.fc.2.weight"] = torch.zeros(128, 2048)
    state.update({f"module.encoder_k.{k}": torch.zeros_like(v)
                  for k, v in list(inner.state_dict().items())[:3]})
    state["queue"] = torch.zeros(128, 65536)
    state["queue_ptr"] = torch.zeros(1, dtype=torch.long)
    return {"state_dict": state, "epoch": 200, "arch": "resnet50"}


def _full_shape_payload(name, seed):
    """(payload in the reference's on-disk layout, core torch state_dict
    whose flat conversion must equal the built encoder's params)."""
    if name in ("resnet18", "resnet34", "resnet50"):
        model = getattr(tref, name)()
        _randomize_bn(model, seed)
        return dict(model.state_dict()), model.state_dict()
    if name == "resnet50_places":
        model = tref.resnet50()
        _randomize_bn(model, seed)
        state = {f"module.{k}": v for k, v in model.state_dict().items()}
        state["module.fc.weight"] = torch.zeros(365, 2048)
        state["module.fc.bias"] = torch.zeros(365)
        return {"state_dict": state}, model.state_dict()
    if name == "demy":
        model = tref.resnet50()
        _randomize_bn(model, seed)
        return _moco_payload(model), model.state_dict()
    if name.startswith("resnet50") and name.endswith(("_l3", "_l4")):
        inner = tref.resnet50_compressed(name[-2:]).model
        _randomize_bn(inner, seed)
        state = {f"module.{k}": v for k, v in inner.state_dict().items()}
        return {"state_dict": state}, inner.state_dict()
    if name.startswith("moco_") and name.endswith(("_l3", "_l4")):
        inner = tref.resnet50_compressed(name[-2:]).model
        _randomize_bn(inner, seed)
        return _moco_payload(inner), inner.state_dict()
    if name.startswith("moco_"):
        model = tref.resnet50()
        _randomize_bn(model, seed)
        return _moco_payload(model), model.state_dict()
    if name == "maskrcnn_l3":
        model = oracle_mask.C4Backbone()
        _randomize_bn(model, seed)
        state = {f"backbone.{k}": v for k, v in model.state_dict().items()}
        state["proposal_generator.rpn_head.conv.weight"] = \
            torch.zeros(1024, 1024, 3, 3)
        state["roi_heads.box_predictor.cls_score.weight"] = \
            torch.zeros(81, 2048)
        state["pixel_mean"] = torch.zeros(3)
        return {"model": state, "iteration": 9999}, model.state_dict()
    if name in _MAE_CFG:
        dim, depth, heads, patch = _MAE_CFG[name]
        model = oracle_vit.MAEEncoder(dim=dim, depth=depth, heads=heads,
                                      patch=patch)
        state = dict(model.state_dict())
        state["mask_token"] = torch.zeros(1, 1, 512)
        state["decoder_pos_embed"] = torch.zeros(1, 197, 512)
        state["decoder_embed.weight"] = torch.zeros(512, dim)
        state["decoder_blocks.0.norm1.weight"] = torch.zeros(512)
        state["decoder_pred.weight"] = torch.zeros(patch * patch * 3, 512)
        state["decoder_norm.weight"] = torch.zeros(512)
        return {"model": state}, model.state_dict()
    if name == "clip_vit":
        model = oracle_vit.CLIPVisionTransformer()
        state = {f"visual.{k}": v for k, v in model.state_dict().items()}
        core = dict(state)
        state["positional_embedding"] = torch.zeros(77, 512)
        state["text_projection"] = torch.zeros(512, 512)
        state["logit_scale"] = torch.zeros(())
        state["token_embedding.weight"] = torch.zeros(49408, 512)
        state["ln_final.weight"] = torch.zeros(512)
        state["transformer.resblocks.0.attn.in_proj_weight"] = \
            torch.zeros(1536, 512)
        return state, core
    if name == "clip_rn50":
        model = ModifiedResNet()
        _randomize_bn(model, seed)
        state = {f"visual.{k}": v for k, v in model.state_dict().items()}
        core = dict(state)
        state["positional_embedding"] = torch.zeros(77, 512)
        state["text_projection"] = torch.zeros(512, 1024)
        state["logit_scale"] = torch.zeros(())
        state["token_embedding.weight"] = torch.zeros(49408, 512)
        return state, core
    raise AssertionError(f"no payload builder for {name}")


_SWEEP_NAMES = [
    pytest.param(n, marks=pytest.mark.slow)
    if n in ("mae_large", "mae_huge") else n
    for n in sorted(CHECKPOINT_FILES)
]


@pytest.mark.parametrize("name", _SWEEP_NAMES)
def test_full_shape_checkpoint_conversion_sweep(name, tmp_path):
    """Stage a full-shape reference-layout checkpoint under the name's
    CHECKPOINT_FILES path and build the encoder from it: the converted
    params must match the torch state dict exactly (values AND key set —
    check_expected inside the loaders guarantees nothing is silently
    missing) and the handle must report the SURVEY §2.4 output dim."""
    seed = abs(hash(name)) % 1000
    payload, core_state = _full_shape_payload(name, seed)
    _stage(tmp_path, name, payload)

    handle = build_encoder(name, pretrained=True,
                           checkpoint_dir=str(tmp_path))
    want = convert.torch_state_dict_to_flat(core_state)
    assert set(handle.params) == set(want), name
    for k in sorted(want):
        got = np.asarray(handle.params[k])
        assert got.shape == np.asarray(want[k]).shape, (name, k)
        np.testing.assert_array_equal(got, np.asarray(want[k]),
                                      err_msg=f"{name}:{k}")
    assert handle.out_size == _expected_dim(name), name
