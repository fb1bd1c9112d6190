"""Pallas fused attention vs the einsum reference (interpret mode)."""

import numpy as np

import jax
import jax.numpy as jnp

from pvr_habitat_tpu.ops.pallas.attention import fused_attention


def test_fused_attention_matches_einsum():
    rng = np.random.RandomState(0)
    n, h, l, d = 2, 4, 17, 16
    q = jnp.asarray(rng.randn(n, h, l, d).astype(np.float32))
    k = jnp.asarray(rng.randn(n, h, l, d).astype(np.float32))
    v = jnp.asarray(rng.randn(n, h, l, d).astype(np.float32))

    scale = 1.0 / np.sqrt(d)
    logits = jnp.einsum("nhqd,nhkd->nhqk", q * scale, k)
    probs = jax.nn.softmax(logits, axis=-1)
    want = jnp.einsum("nhqk,nhkd->nhqd", probs, v)

    got = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pallas_attention_routing_flags(monkeypatch):
    from pvr_habitat_tpu.ops.pallas.attention import \
        pallas_attention_enabled

    monkeypatch.delenv("PVR_TPU_DISABLE_PALLAS_ATTENTION", raising=False)
    monkeypatch.delenv("PVR_TPU_ENABLE_PALLAS_ATTENTION", raising=False)
    assert not pallas_attention_enabled()   # default: einsum core
    monkeypatch.setenv("PVR_TPU_ENABLE_PALLAS_ATTENTION", "1")
    assert pallas_attention_enabled()       # opt-in
    monkeypatch.setenv("PVR_TPU_DISABLE_PALLAS_ATTENTION", "1")
    assert not pallas_attention_enabled()   # kill switch wins


def test_vit_forward_unaffected_by_kill_switch(monkeypatch):
    """The routing flag must not change results on the einsum path (CPU
    CI never takes the Pallas branch, so outputs are identical)."""
    from pvr_habitat_tpu.models.registry import build_encoder

    handle = build_encoder("mae_base", pretrained=False)
    frames = np.random.RandomState(0).randint(
        0, 256, size=(2, 64, 64, 3), dtype=np.uint8)
    x = handle.preprocess(jnp.asarray(frames))
    a = handle.apply_fn(handle.params, x, train=False)
    monkeypatch.setenv("PVR_TPU_DISABLE_PALLAS_ATTENTION", "1")
    b = handle.apply_fn(handle.params, x, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_attention_core_routing(monkeypatch):
    from pvr_habitat_tpu.ops.pallas.attention import attention_core

    monkeypatch.delenv("PVR_TPU_DISABLE_PALLAS_ATTENTION", raising=False)
    monkeypatch.delenv("PVR_TPU_ENABLE_PALLAS_ATTENTION", raising=False)
    monkeypatch.delenv("PVR_TPU_ATTENTION_CORE", raising=False)
    assert attention_core() == "einsum"            # default
    monkeypatch.setenv("PVR_TPU_ATTENTION_CORE", "flash")
    assert attention_core() == "flash"
    monkeypatch.setenv("PVR_TPU_ATTENTION_CORE", "pallas")
    assert attention_core() == "pallas"
    monkeypatch.setenv("PVR_TPU_DISABLE_PALLAS_ATTENTION", "1")
    assert attention_core() == "einsum"            # kill switch wins
    monkeypatch.setenv("PVR_TPU_ATTENTION_CORE", "flash")
    assert attention_core() == "einsum"            # ... for BOTH kernels
    monkeypatch.delenv("PVR_TPU_DISABLE_PALLAS_ATTENTION")
    monkeypatch.delenv("PVR_TPU_ATTENTION_CORE")
    monkeypatch.setenv("PVR_TPU_ENABLE_PALLAS_ATTENTION", "1")
    assert attention_core() == "pallas"            # legacy opt-in


def test_stock_flash_wrapper_pad_and_mask():
    """stock_flash_attention pads L 197->256 and segment-masks the pad;
    validated on CPU against the plain softmax core by injecting the
    kernel module's own mha_reference implementation."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    from pvr_habitat_tpu.ops.pallas.attention import stock_flash_attention

    rng = np.random.RandomState(1)
    n, h, l, d = 2, 3, 197, 32
    q = jnp.asarray(rng.randn(n, h, l, d).astype(np.float32))
    k = jnp.asarray(rng.randn(n, h, l, d).astype(np.float32))
    v = jnp.asarray(rng.randn(n, h, l, d).astype(np.float32))

    scale = 1.0 / np.sqrt(d)
    logits = jnp.einsum("nhqd,nhkd->nhqk", q * scale, k)
    probs = jax.nn.softmax(logits, axis=-1)
    want = jnp.einsum("nhqk,nhkd->nhqd", probs, v)

    got = stock_flash_attention(q, k, v, impl=fa.mha_reference)
    assert got.shape == (n, h, l, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_stock_flash_block_b_env_clamped(monkeypatch):
    """PVR_TPU_FLASH_BLOCK_B=0 (or negative) must not raise
    ZeroDivisionError or loop forever in the batch-block computation."""
    from pvr_habitat_tpu.ops.pallas.attention import _batch_block

    for bad in ("0", "-4"):
        monkeypatch.setenv("PVR_TPU_FLASH_BLOCK_B", bad)
        assert _batch_block(6) == 1
    monkeypatch.setenv("PVR_TPU_FLASH_BLOCK_B", "8")
    assert _batch_block(256) == 8      # divides: use as-is
    assert _batch_block(6) == 2        # halve until it divides
    assert _batch_block(7) == 1        # odd batch -> 1
