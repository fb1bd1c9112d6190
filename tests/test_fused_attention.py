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
