"""Pallas fused-bottleneck kernel correctness (interpret mode on CPU)
vs. the XLA block, and the full fused ResNet-50 vs. the reference
apply."""

import numpy as np
import pytest

import jax.numpy as jnp

from pvr_habitat_tpu.models import resnet
from pvr_habitat_tpu.ops.fold_bn import fold_resnet_bn
from pvr_habitat_tpu.ops.pallas.fused_bottleneck import (block_weights,
                                                         fused_bottleneck)


@pytest.mark.parametrize("stride,cin,planes,h", [
    (1, 64, 32, 16),     # layer1-style with downsample (cin != 4*planes)
    (1, 128, 32, 16),    # identity shortcut
    (2, 128, 64, 16),    # strided with downsample
])
def test_fused_block_matches_xla(stride, cin, planes, h):
    rng = np.random.RandomState(0)
    cout = planes * 4
    prefix = "layer.0"
    params = {}
    resnet._init_bottleneck(params, rng, prefix, cin, planes, stride)
    # force non-trivial folded biases
    for key in list(params):
        if key.endswith(".bias") and "downsample" not in key:
            params[key] = rng.randn(*np.shape(params[key])).astype(np.float32)
    params = {k: jnp.asarray(v) for k, v in params.items()}
    params = fold_resnet_bn(params)

    x = jnp.asarray(rng.randn(2, h, h, cin).astype(np.float32))
    want = resnet._bottleneck_block(
        x, params, prefix, stride,
        f"{prefix}.downsample.0.weight" in params, False)

    w1, b1, w2, b2, w3, b3, wd, bd = block_weights(params, prefix,
                                                   dtype=jnp.float32)
    got = fused_bottleneck(x, w1, b1, w2, b2, w3, b3, wd, bd,
                           stride=stride, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_flat_fused_block_matches_xla():
    from pvr_habitat_tpu.ops.pallas import fused_bottleneck as fb

    rng = np.random.RandomState(5)
    h = w = 12
    for cin, planes in ((64, 32), (128, 32)):   # with/without downsample
        prefix = "layer.0"
        params = {}
        resnet._init_bottleneck(params, rng, prefix, cin, planes, 1)
        for key in list(params):
            if key.endswith(".bias") and "downsample" not in key:
                params[key] = rng.randn(
                    *np.shape(params[key])).astype(np.float32)
        params = {k: jnp.asarray(v) for k, v in params.items()}
        params = fold_resnet_bn(params)

        x = jnp.asarray(rng.randn(2, h, w, cin).astype(np.float32))
        want = resnet._bottleneck_block(
            x, params, prefix, 1,
            f"{prefix}.downsample.0.weight" in params, False)

        weights = block_weights(params, prefix, dtype=jnp.float32)
        yf = fb.fused_bottleneck_flat(
            fb.to_padded_flat(x), jnp.asarray(fb.flat_mask(h, w)),
            *weights, h=h, w=w, interpret=True)
        got = fb.from_padded_flat(yf, h, w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)
        # border invariant preserved for chaining
        border = np.asarray(yf).reshape(2, h + 2, w + 2, -1)
        assert np.all(border[:, 0] == 0) and np.all(border[:, -1] == 0)
        assert np.all(border[:, :, 0] == 0) and np.all(border[:, :, -1] == 0)


def test_fused_v2_resnet50_matches_apply():
    spec = resnet.ResNetSpec(50)
    params = fold_resnet_bn(
        resnet.init_params(spec, np.random.RandomState(3)))
    x = jnp.asarray(np.random.RandomState(4)
                    .randn(1, 64, 64, 3).astype(np.float32))
    want = np.asarray(resnet.apply(params, x, spec))
    got = np.asarray(resnet.apply_fused_v2(params, x, spec, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_fused_hybrid_resnet50_matches_apply():
    spec = resnet.ResNetSpec(50)
    params = fold_resnet_bn(
        resnet.init_params(spec, np.random.RandomState(7)))
    x = jnp.asarray(np.random.RandomState(8)
                    .randn(1, 64, 64, 3).astype(np.float32))
    want = np.asarray(resnet.apply(params, x, spec))
    got = np.asarray(resnet.apply_fused_hybrid(params, x, spec,
                                               interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_fused_resnet50_matches_apply():
    spec = resnet.ResNetSpec(50)
    params = fold_resnet_bn(
        resnet.init_params(spec, np.random.RandomState(1)))
    x = jnp.asarray(np.random.RandomState(2)
                    .randn(1, 64, 64, 3).astype(np.float32))
    want = np.asarray(resnet.apply(params, x, spec))
    got = np.asarray(resnet.apply_fused(params, x, spec, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
