"""Encoder zoo: every embedding name in the reference factory
(src/embeddings.py:60-332), mapped to a (preprocess, apply_fn, params,
out_size) handle.

Pretrained checkpoints: the reference loads ~20 files by hard-coded
filename.  We keep the same filenames (searched under
``checkpoint_dir``), apply the same key surgery, and convert to our
layout.  When a file is absent the encoder falls back to a
deterministic, name-seeded random init so the full zoo is always
constructible (tests, dry-runs); a warning notes the fallback.
"""

import hashlib
import os
import pickle
import warnings
import zipfile
from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp

from pvr_habitat_tpu.models import common as cm
from pvr_habitat_tpu.models import convert, random_conv, resnet
from pvr_habitat_tpu.ops import image as im


@dataclass
class EncoderHandle:
    name: str
    preprocess: Optional[im.Preprocess]
    apply_fn: Callable            # (params, x_normalized, train) -> (N, O)
    params: dict
    out_size: int
    sub_names: tuple = ()         # uber constituents


# ---------------------------------------------------------------------------
# Checkpoint filename map (reference: src/embeddings.py:121-195)
# ---------------------------------------------------------------------------

CHECKPOINT_FILES = {
    "resnet50_places": "resnet50_places.pth.tar",
    "resnet50_l4": "resnet50_l4.pth.tar",
    "resnet50_l3": "resnet50_l3.tar",
    "resnet50_places_l4": "resnet50_places_l4.tar",
    "resnet50_places_l3": "resnet50_places_l3.tar",
    "demy": "demy.pth",
    "moco_aug": "moco_aug.pth.tar",
    "moco_aug_habitat": "moco_aug_habitat_64.pth",
    "moco_aug_mujoco": "moco_aug_mujoco.pth",
    "moco_aug_uber": "moco_aug_uber.pth",
    "moco_aug_places": "moco_aug_places.pth.tar",
    "moco_aug_l4": "moco_aug_l4.pth",
    "moco_aug_places_l4": "moco_aug_places_l4.pth",
    "moco_aug_l3": "moco_aug_l3.pth",
    "moco_aug_places_l3": "moco_aug_places_l3.pth",
    "moco_croponly": "moco_croponly.pth",
    "moco_croponly_places": "moco_croponly_places.pth",
    "moco_croponly_habitat": "moco_croponly_habitat_64.pth",
    "moco_croponly_mujoco": "moco_croponly_mujoco.pth",
    "moco_croponly_uber": "moco_croponly_uber.pth",
    "moco_croponly_l4": "moco_croponly_l4.pth",
    "moco_croponly_l3": "moco_croponly_l3.pth",
    "moco_croponly_places_l4": "moco_croponly_places_l4.pth",
    "moco_croponly_places_l3": "moco_croponly_places_l3.pth",
    "moco_coloronly": "moco_coloronly.pth",
    "maskrcnn_l3": "maskrcnn_l3.pth",
    "mae_base": "mae_pretrain_vit_base.pth",
    "mae_large": "mae_pretrain_vit_large.pth",
    "mae_huge": "mae_pretrain_vit_huge.pth",
    # torchvision/CLIP downloads in the reference; local files here.
    "resnet18": "resnet18_imagenet.pth",
    "resnet34": "resnet34_imagenet.pth",
    "resnet50": "resnet50_imagenet.pth",
    "clip_vit": "clip_vit_b32.pth",
    "clip_rn50": "clip_rn50.pth",
}

# Uber fusions: concatenated constituents (src/embeddings.py:195-280).
_UBER_SUFFIX = {"345": ("_l3", "_l4", ""), "35": ("_l3", ""),
                "34": ("_l3", "_l4"), "45": ("_l4", "")}


def uber_constituents(name):
    """'moco_aug_places_uber_345' -> ('moco_aug_places_l3', ...)."""
    base, code = name.rsplit("_uber_", 1)
    return tuple(base + suffix for suffix in _UBER_SUFFIX[code])


def all_uber_names():
    names = []
    for base in ("moco_aug", "moco_aug_places", "moco_croponly",
                 "moco_croponly_places"):
        for code in _UBER_SUFFIX:
            names.append(f"{base}_uber_{code}")
    return names


def _name_seed(name, run_id=0):
    digest = hashlib.sha256(f"{name}:{run_id}".encode()).digest()
    return int.from_bytes(digest[:4], "little")


def _is_flat_artifact(path):
    """True for our own ``convert.save_flat`` payloads.

    ``EmbeddingNet.save`` persists '{data_path}/{name}.tar' after bulk
    embedding (the reference contract, save_embedded_obs.py:126-131).
    For names whose pretrained CHECKPOINT_FILES entry is also
    '{name}.tar' (resnet50_l3, resnet50_places_l3/_l4) that artifact
    shadows the expected torch checkpoint; it holds folded serving
    params under our naming, so it must not be loaded as one.  Skipping
    it falls back to the seeded random init, which is run_id-independent
    (``_name_seed(name)``) and therefore bit-identical to the weights
    the embed stage used."""
    try:
        with open(path, "rb") as handle:
            head = handle.read(256)
    except OSError:
        return False
    return b"pvr_habitat_tpu/flat-v1" in head


def _find_checkpoint(name, checkpoint_dir):
    filename = CHECKPOINT_FILES.get(name)
    if filename is None:
        return None
    for base in ([checkpoint_dir] if checkpoint_dir else []) + ["."]:
        path = os.path.join(base, filename)
        if os.path.isfile(path) and not _is_flat_artifact(path):
            return path
    return None


# Errors the load -> surgery -> flatten -> key-check chain is EXPECTED
# to raise on a corrupt or foreign checkpoint file: unpickling/zip
# failures from torch.load, KeyError from surgery on missing prefixes,
# ValueError from check_expected, OSError/EOFError on truncated files.
# Anything else (MemoryError, bugs) must propagate.
_EXPECTED_LOAD_ERRORS = (OSError, EOFError, KeyError, ValueError,
                         RuntimeError, pickle.UnpicklingError,
                         zipfile.BadZipFile)


def _load_or_init_resnet(name, spec, surgery, pretrained, checkpoint_dir,
                         seed):
    path = _find_checkpoint(name, checkpoint_dir) if pretrained else None
    if path is not None:
        # A torch-loadable file with FOREIGN keys (e.g. a moco file
        # copied to a resnet name) fails in surgery/check_expected, not
        # in torch.load.  Default: fail FAST — pretrained=True silently
        # yielding random features would invalidate results (the
        # reference errors here too, ADVICE r3).  Study/sweep drivers
        # that prefer warn-and-continue semantics opt in with
        # PVR_TPU_CKPT_FALLBACK=1.
        try:
            ckpt = convert.load_torch_checkpoint(path)
            state_dict = ckpt.get("state_dict", ckpt)
            state_dict = surgery(state_dict)
            flat = convert.torch_state_dict_to_flat(state_dict)
            expected = set(resnet.init_params(
                spec, np.random.RandomState(0)).keys())
            params = {k: v for k, v in flat.items() if k in expected}
            convert.check_expected(params, expected, context=name)
            return params
        except _EXPECTED_LOAD_ERRORS as exc:
            if os.environ.get("PVR_TPU_CKPT_FALLBACK") != "1":
                raise RuntimeError(
                    f"encoder '{name}': failed to load checkpoint "
                    f"{path} ({exc}); set PVR_TPU_CKPT_FALLBACK=1 to "
                    f"warn and fall back to the seeded random init "
                    f"instead") from exc
            warnings.warn(
                f"encoder '{name}': failed to load checkpoint {path} "
                f"({exc}); using the seeded random init instead")
    if pretrained and name != "random":
        warnings.warn(
            f"encoder '{name}': checkpoint "
            f"{CHECKPOINT_FILES.get(name)} not found; using random init")
    return resnet.init_params(spec, np.random.RandomState(seed))


# ---------------------------------------------------------------------------
# Builders per family
# ---------------------------------------------------------------------------


def _resnet_family(name):
    """Returns (spec, surgery) or None."""
    plain = {"resnet18": 18, "resnet34": 34, "resnet50": 50}
    if name in plain:
        return resnet.ResNetSpec(plain[name]), convert.strip_module_prefix
    if name in ("resnet50_places", "demy"):
        surgery = (convert.strip_module_prefix if name == "resnet50_places"
                   else convert.moco_encoder_q)
        return resnet.ResNetSpec(50), surgery
    if name.startswith("resnet50") and name.endswith(("_l3", "_l4")):
        return (resnet.ResNetSpec(50, cut=name[-2:]),
                convert.strip_module_prefix)
    if name.startswith("moco_") and name.endswith(("_l3", "_l4")):
        return (resnet.ResNetSpec(50, cut=name[-2:]), convert.moco_encoder_q)
    if name.startswith("moco_"):
        return resnet.ResNetSpec(50), convert.moco_encoder_q
    return None


def int8_serving_fns(name):
    """name -> (quantize_params, apply_int8) for the W8A8 serving zoo:
    every ResNet family (bottleneck AND basic-block), clip_rn50,
    maskrcnn_l3 (detectron2 C4 backbone — same conv profile), and
    the MAE ViTs (the ViT int8 path is a measured NEGATIVE result kept
    drivable for re-A/B; docs/DESIGN.md hypothesis 4).

    ``apply_int8(params_q, x, scales) -> (out, scales)``; pass
    ``scales=None`` to calibrate on that batch.  Single source of truth
    for the int8 family dispatch (ShardedEmbedder, bench.py,
    scripts/bench_zoo.py all route here)."""
    from pvr_habitat_tpu.ops import quantize as q

    family = _resnet_family(name)
    if family is not None:
        spec = family[0]
        return (q.quantize_resnet_params,
                lambda p, x, scales: resnet.apply_int8(
                    p, x, spec, scales=scales))
    if name == "clip_rn50":
        from pvr_habitat_tpu.models import clip as clip_mod

        return (q.quantize_resnet_params,
                lambda p, x, scales: clip_mod.clip_rn50_apply_int8(
                    p, x, scales=scales))
    if name == "maskrcnn_l3":
        from pvr_habitat_tpu.models import maskrcnn as mask_mod

        return (q.quantize_resnet_params,
                lambda p, x, scales: mask_mod.apply_int8(
                    p, x, scales=scales))
    if name in ("mae_base", "mae_large", "mae_huge"):
        from pvr_habitat_tpu.models import vit as vit_mod

        _, depth, num_heads, patch = vit_mod.MAE_CONFIGS[name]
        return (q.quantize_vit_params,
                lambda p, x, scales: vit_mod.mae_apply_int8(
                    p, x, depth=depth, num_heads=num_heads, patch=patch,
                    scales=scales))
    raise NotImplementedError(f"no int8 serving path for '{name}'")


def build_encoder(name, *, pretrained=True, train=False, checkpoint_dir=None,
                  run_id=0, input_hw=64):
    """Construct an EncoderHandle for any zoo name."""
    del train  # trainability decided by the caller (grads through apply_fn)

    if name == "true_state":
        return EncoderHandle(name, None, lambda p, x, train=False: x, {}, 12)

    if name == "random":
        params = random_conv.init_params(
            np.random.RandomState(_name_seed(name, run_id)))
        pre = im.default_preprocess()
        return EncoderHandle(
            name, pre, random_conv.apply, params,
            random_conv.out_size(pre.crop_size))

    if "_uber_" in name:
        subs = [build_encoder(s, pretrained=pretrained,
                              checkpoint_dir=checkpoint_dir, run_id=run_id,
                              input_hw=input_hw)
                for s in uber_constituents(name)]
        params = {}
        for i, handle in enumerate(subs):
            params.update(cm.add_prefix(handle.params, f"models.{i}"))
        apply_fns = [h.apply_fn for h in subs]

        def uber_apply(p, x, train=False, _fns=tuple(apply_fns),
                       _n=len(subs)):
            outs = [
                _fns[i](cm.sub(p, f"models.{i}"), x, train=train)
                for i in range(_n)
            ]
            return jnp.concatenate(outs, axis=-1)

        return EncoderHandle(
            name, im.default_preprocess(), uber_apply, params,
            sum(h.out_size for h in subs),
            sub_names=uber_constituents(name))

    fam = _resnet_family(name)
    if fam is not None:
        spec, surgery = fam
        pre = im.default_preprocess()
        params = _load_or_init_resnet(name, spec, surgery, pretrained,
                                      checkpoint_dir, _name_seed(name))

        def rn_apply(p, x, train=False, _spec=spec):
            return resnet.apply(p, x, _spec, train=train)

        return EncoderHandle(name, pre, rn_apply, params,
                             spec.out_size(pre.crop_size))

    if name.startswith("mae_"):
        from pvr_habitat_tpu.models import vit
        return vit.build_mae_encoder(name, pretrained=pretrained,
                                     checkpoint_dir=checkpoint_dir)

    if name.startswith("clip_"):
        from pvr_habitat_tpu.models import clip as clip_mod
        return clip_mod.build_clip_encoder(name, pretrained=pretrained,
                                           checkpoint_dir=checkpoint_dir)

    if name == "maskrcnn_l3":
        from pvr_habitat_tpu.models import maskrcnn
        return maskrcnn.build_maskrcnn_encoder(
            pretrained=pretrained, checkpoint_dir=checkpoint_dir)

    raise NotImplementedError(f"Requested model not available: {name}")


def all_encoder_names():
    """The full zoo (reference registry, src/embeddings.py:90-321)."""
    moco_bases = [
        "moco_aug", "moco_aug_habitat", "moco_aug_mujoco", "moco_aug_uber",
        "moco_aug_places", "moco_croponly", "moco_croponly_places",
        "moco_croponly_habitat", "moco_croponly_mujoco",
        "moco_croponly_uber", "moco_coloronly",
    ]
    moco_cuts = [
        "moco_aug_l4", "moco_aug_l3", "moco_aug_places_l4",
        "moco_aug_places_l3", "moco_croponly_l4", "moco_croponly_l3",
        "moco_croponly_places_l4", "moco_croponly_places_l3",
    ]
    return (
        ["random", "resnet18", "resnet34", "resnet50", "resnet50_places",
         "resnet50_l4", "resnet50_l3", "resnet50_places_l4",
         "resnet50_places_l3", "demy"]
        + moco_bases + moco_cuts + all_uber_names()
        + ["maskrcnn_l3", "clip_vit", "clip_rn50",
           "mae_base", "mae_large", "mae_huge", "true_state"]
    )
