"""Full encoder-zoo inventory: every reference embedding name is
constructible and reports the SURVEY §2.4 output dimension."""

import warnings

import numpy as np
import pytest

from pvr_habitat_tpu.models import registry


EXPECTED_DIMS = {
    "random": 1568,
    "resnet18": 512, "resnet34": 512, "resnet50": 2048,
    "resnet50_places": 2048, "demy": 2048,
    "clip_vit": 512, "clip_rn50": 1024,
    "mae_base": 768, "mae_large": 1024, "mae_huge": 1280,
    # The reference's maskrcnn_l3 keeps only the 11-ch compress output
    # (res4[7] emptied), so it matches the other l3 dims, 11*14*14.
    "maskrcnn_l3": 2156,
    "true_state": 12,
}


def _expected(name):
    if name in EXPECTED_DIMS:
        return EXPECTED_DIMS[name]
    if name.endswith("_l3"):
        return 2156
    if name.endswith("_l4"):
        return 2058
    if "_uber_" in name:
        return sum(_expected(s) for s in registry.uber_constituents(name))
    return 2048  # moco conv5 family


def test_zoo_is_complete():
    names = registry.all_encoder_names()
    # 52 = the reference's elif-chain (src/embeddings.py:90-321): random,
    # 3 torchvision resnets, 5 resnet50 places/l3/l4 variants, demy,
    # 3 MAE, 11 moco conv5 + coloronly, 8 moco l3/l4 cuts, 16 ubers,
    # maskrcnn_l3, 2 CLIP, true_state.
    assert len(names) == 52
    # spot-check the reference registry entries
    for required in ("moco_croponly_places_uber_345", "moco_coloronly",
                     "moco_aug_habitat", "resnet50_places_l3", "demy",
                     "maskrcnn_l3", "true_state"):
        assert required in names


@pytest.mark.parametrize("name", [
    n for n in registry.all_encoder_names()
    if n not in ("mae_large", "mae_huge")   # big inits covered by mae_base
])
def test_encoder_constructible_with_expected_dim(name):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # missing-checkpoint fallbacks
        handle = registry.build_encoder(name, pretrained=True)
    assert handle.out_size == _expected(name), name
    if name != "true_state":
        assert handle.preprocess is not None
        assert all(hasattr(v, "shape") for v in handle.params.values())


def test_uber_dims_match_survey():
    assert _expected("moco_aug_uber_345") == 6262
    assert _expected("moco_aug_uber_34") == 4214
    assert _expected("moco_aug_uber_35") == 4204
    assert _expected("moco_aug_uber_45") == 4106


def test_uber_forward_concatenates():
    """uber = concat of constituents on the feature dim
    (reference: src/embeddings.py:44-57)."""
    import jax.numpy as jnp

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        handle = registry.build_encoder("moco_aug_uber_34", pretrained=False)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 224, 224, 3)
                    .astype(np.float32))
    out = handle.apply_fn(handle.params, x)
    assert out.shape == (1, 2156 + 2058)


def test_flat_artifact_does_not_shadow_pretrained_checkpoint(tmp_path):
    """The bulk embedder persists '{data_path}/{name}.tar' in our flat
    format (EmbeddingNet.save; reference save_embedded_obs.py:126-131).
    For resnet50_l3 that filename equals its CHECKPOINT_FILES entry —
    building the encoder with checkpoint_dir=data_path must skip the
    artifact and reproduce the embed-time seeded init, not crash in
    torch.load (study regression: corrupt-magic-number failure)."""
    from pvr_habitat_tpu.models import convert

    name = "resnet50_l3"
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = registry.build_encoder(name, pretrained=False)
    convert.save_flat(str(tmp_path / "resnet50_l3.tar"),
                      {"conv1.weight": np.zeros((1,), np.float32)},
                      extra={"embedding_name": name})
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        handle = registry.build_encoder(name, pretrained=True,
                                        checkpoint_dir=str(tmp_path))
    np.testing.assert_array_equal(
        np.asarray(handle.params["conv1.weight"]),
        np.asarray(ref.params["conv1.weight"]))


def test_corrupt_torch_checkpoint_raises_by_default(tmp_path):
    """pretrained=True with a FOUND-but-corrupt checkpoint must fail
    fast by default — silently serving random features would invalidate
    results (ADVICE r3; the reference also fails fast here)."""
    (tmp_path / "resnet50_l3.tar").write_bytes(b"not a torch checkpoint")
    with pytest.raises(RuntimeError, match="failed to load checkpoint"):
        registry.build_encoder("resnet50_l3", pretrained=True,
                               checkpoint_dir=str(tmp_path))


def test_corrupt_torch_checkpoint_falls_back_when_opted_in(
        tmp_path, monkeypatch):
    """With PVR_TPU_CKPT_FALLBACK=1 (study/sweep drivers), a non-torch
    file at a CHECKPOINT_FILES path warns and falls back to the
    deterministic seeded init instead of raising."""
    monkeypatch.setenv("PVR_TPU_CKPT_FALLBACK", "1")
    (tmp_path / "resnet50_l3.tar").write_bytes(b"not a torch checkpoint")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = registry.build_encoder("resnet50_l3", pretrained=False)
    with pytest.warns(UserWarning, match="failed to load checkpoint"):
        handle = registry.build_encoder("resnet50_l3", pretrained=True,
                                        checkpoint_dir=str(tmp_path))
    np.testing.assert_array_equal(
        np.asarray(handle.params["conv1.weight"]),
        np.asarray(ref.params["conv1.weight"]))


def test_foreign_keys_checkpoint_falls_back_when_opted_in(
        tmp_path, monkeypatch):
    """A torch-LOADABLE checkpoint whose keys do not match the encoder
    (e.g. a file copied to the wrong name) fails in surgery/key-check,
    not in torch.load — opted-in fallback must catch that too."""
    import torch

    monkeypatch.setenv("PVR_TPU_CKPT_FALLBACK", "1")
    torch.save({"state_dict": {"some.other.model.weight":
                               torch.zeros(1)}},
               str(tmp_path / "resnet50_l3.tar"))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ref = registry.build_encoder("resnet50_l3", pretrained=False)
    with pytest.warns(UserWarning, match="failed to load checkpoint"):
        handle = registry.build_encoder("resnet50_l3", pretrained=True,
                                        checkpoint_dir=str(tmp_path))
    np.testing.assert_array_equal(
        np.asarray(handle.params["conv1.weight"]),
        np.asarray(ref.params["conv1.weight"]))


def test_int8_serving_dispatch_covers_the_quantizable_zoo():
    """registry.int8_serving_fns is the single source of truth for the
    W8A8 family dispatch (ShardedEmbedder, bench_zoo route here)."""
    for name in ("resnet18", "resnet50", "resnet50_l3", "moco_aug",
                 "clip_rn50", "mae_base"):
        quantize_params, apply_q = registry.int8_serving_fns(name)
        assert callable(quantize_params) and callable(apply_q), name
    with pytest.raises(NotImplementedError):
        registry.int8_serving_fns("true_state")
