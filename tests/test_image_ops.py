"""Parity of the matmul-based preprocess vs. torch/torchvision semantics.

The reference transform stacks live at src/embeddings.py:80-85 (default),
:81 (MAE bicubic), :309-314 (CLIP bicubic antialias), :289-294 (maskrcnn).
torchvision is not installed here, so we compare against
``torch.nn.functional.interpolate`` directly, which is what torchvision's
tensor path calls.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from pvr_habitat_tpu.ops import image as im


def _rand_u8(n=2, h=64, w=64, c=3, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(n, h, w, c), dtype=np.uint8)


def assert_close_quantized(got, want, std, atol=1e-3, flip_frac=1e-3):
    """Allow a tiny fraction of one-quantum (1/255/std) mismatches caused by
    round-half-to-even flips when torch computes exactly x.5 and the JAX
    result lands at x.5 +/- float eps (different summation order)."""
    diff = np.abs(np.asarray(got) - np.asarray(want))
    quantum = (1.0 / 255.0) / np.min(std)
    assert diff.max() <= quantum + atol, diff.max()
    assert np.mean(diff > atol) <= flip_frac, np.mean(diff > atol)


def _torch_resize(x_u8_nhwc, size_hw, mode, antialias):
    x = torch.from_numpy(x_u8_nhwc.astype(np.float32)).permute(0, 3, 1, 2)
    y = F.interpolate(x, size=size_hw, mode=mode, antialias=antialias)
    return y.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("mode,antialias,in_hw,out_hw", [
    ("bilinear", False, (64, 64), (256, 256)),    # default upsample path
    ("bicubic", False, (64, 64), (256, 256)),     # MAE path
    ("bicubic", True, (64, 64), (224, 224)),      # CLIP path
    ("bilinear", False, (256, 256), (64, 64)),    # downsample, clamp border
    ("bilinear", True, (256, 256), (100, 100)),   # antialias downsample
    ("bicubic", True, (300, 200), (128, 96)),     # non-square AA downsample
])
def test_resize_matches_torch(mode, antialias, in_hw, out_hw):
    x = _rand_u8(2, *in_hw, 3)
    want = _torch_resize(x, out_hw, mode, antialias)
    got = np.asarray(im.resize(jnp.asarray(x, jnp.float32), out_hw,
                               method=mode, antialias=antialias))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-5)


def test_uint8_quantize_roundtrip():
    # torchvision rounds a resized uint8 tensor back to uint8.
    x = _rand_u8(1, 64, 64, 3, seed=3)
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    y = F.interpolate(t.float(), size=(256, 256), mode="bilinear")
    want = y.round().clamp(0, 255).to(torch.uint8).permute(0, 2, 3, 1).numpy()
    got = im.quantize_uint8(
        im.resize(jnp.asarray(x, jnp.float32), (256, 256))
    ).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_default_preprocess_pipeline():
    """uint8 -> resize 256 -> round-to-uint8 -> crop 224 -> /255 -> norm."""
    x = _rand_u8(2, 64, 64, 3, seed=1)
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    y = F.interpolate(t.float(), size=(256, 256), mode="bilinear")
    y = y.round().clamp(0, 255)
    y = y[:, :, 16:240, 16:240] / 255.0
    mean = torch.tensor(im.IMAGENET_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(im.IMAGENET_STD).view(1, 3, 1, 1)
    want = ((y - mean) / std).permute(0, 2, 3, 1).numpy()

    got = np.asarray(im.default_preprocess()(jnp.asarray(x)))
    assert_close_quantized(got, want, im.IMAGENET_STD)


def test_clip_preprocess_pipeline():
    x = _rand_u8(2, 64, 64, 3, seed=2)
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    y = F.interpolate(t.float(), size=(224, 224), mode="bicubic",
                      antialias=True)
    y = y.round().clamp(0, 255) / 255.0
    mean = torch.tensor(im.CLIP_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(im.CLIP_STD).view(1, 3, 1, 1)
    want = ((y - mean) / std).permute(0, 2, 3, 1).numpy()

    got = np.asarray(im.clip_preprocess(224)(jnp.asarray(x)))
    assert_close_quantized(got, want, im.CLIP_STD)


def test_maskrcnn_preprocess_pipeline():
    """BGR swap (intended semantics), no /255, mean subtract only."""
    x = _rand_u8(1, 64, 64, 3, seed=4)
    bgr = x[..., ::-1].astype(np.float32)
    t = torch.from_numpy(bgr.copy()).permute(0, 3, 1, 2)
    y = F.interpolate(t, size=(256, 256), mode="bilinear")
    y = y[:, :, 16:240, 16:240]
    mean = torch.tensor(im.CAFFE_BGR_MEAN).view(1, 3, 1, 1)
    want = (y - mean).permute(0, 2, 3, 1).numpy()

    got = np.asarray(im.maskrcnn_preprocess()(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-5)


def test_resize_output_size_shorter_side():
    assert im.resize_output_size((64, 64), 256) == (256, 256)
    assert im.resize_output_size((480, 640), 256) == (256, 341)
    assert im.resize_output_size((640, 480), 256) == (341, 256)
    assert im.resize_output_size((64, 64), (100, 50)) == (100, 50)


def test_crop_folded_resize_is_exact():
    """Folding the center crop into the resize matrices applies the
    same interpolation weights; only GEMM accumulation order may differ
    (observed ~1e-5 on f32)."""
    from pvr_habitat_tpu.ops.image import center_crop, resize

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 256, (3, 64, 64, 3)).astype(np.float32))
    for method in ("bilinear", "bicubic"):
        want = center_crop(resize(x, (256, 256), method), 224)
        got = resize(x, (256, 256), method, crop=224)
        np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                                   rtol=1e-5, atol=1e-3)
