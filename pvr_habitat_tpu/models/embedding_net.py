"""EmbeddingNet — the encoder runtime (reference: src/embeddings.py:339-402).

Input: (N, H, W, 3) uint8 NHWC frames.  Output: (N, out_size).
Preprocessing is fused into the jitted forward.  Two serving paths from
the same definition:
  * batch path — large-N bulk embedding (dataset embedding, bench);
  * online path — batch-1..k per-simulator-step inference, with batch
    bucketing so each shape compiles once and stays cached.

Eval mode returns numpy (matching the reference contract), train mode
returns a jax array differentiable w.r.t. ``.params``.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pvr_habitat_tpu.models import convert
from pvr_habitat_tpu.models.registry import build_encoder


def _bucket(n):
    """Next power of two >= n (bounds the jit cache)."""
    b = 1
    while b < n:
        b *= 2
    return b


class EmbeddingNet:
    def __init__(self, embedding_name, in_channels=3, pretrained=True,
                 train=False, checkpoint_dir=None, run_id=0,
                 compute_dtype=jnp.float32, max_bucket=1024):
        assert in_channels == 3, "Current models accept 3-channel inputs only."
        self.embedding_name = embedding_name
        self.training = train
        self.compute_dtype = compute_dtype
        self.max_bucket = max_bucket

        self.handle = build_encoder(
            embedding_name, pretrained=pretrained, train=train,
            checkpoint_dir=checkpoint_dir, run_id=run_id)
        self.params = self.handle.params
        if not train and any(k.endswith(".running_mean")
                             for k in self.params):
            # Frozen encoder: fold BN into the convs (idempotent; the
            # apply fns run unchanged on folded params).
            from pvr_habitat_tpu.ops.fold_bn import fold_resnet_bn

            self.params = fold_resnet_bn(self.params)
        self.out_size = self.handle.out_size
        if self.handle.preprocess is not None:
            self.in_shape = self.handle.preprocess.out_shape()
        else:
            self.in_shape = None

        precision = (jax.lax.Precision.HIGHEST
                     if compute_dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)

        def forward(params, frames):
            x = self.handle.preprocess(
                frames, precision=precision, out_dtype=compute_dtype)
            out = self.handle.apply_fn(params, x, train=train)
            return out.reshape(out.shape[0], -1).astype(jnp.float32)

        self._forward = forward
        self._jitted = jax.jit(forward) if embedding_name != "true_state" \
            else None

    # -- functional path (differentiable, for train_embedding) -------------

    def apply(self, params, frames):
        return self._forward(params, jnp.asarray(frames))

    # -- serving path -------------------------------------------------------

    def __call__(self, observation):
        """observation: (N, H, W, 3) uint8 (numpy or jax).

        Eval: numpy (N, out_size), squeezed like the reference
        (src/embeddings.py:402).  Train: jax array, grads flow to
        ``self.params``.
        """
        if self.embedding_name == "true_state":
            return np.squeeze(np.asarray(observation))

        frames = np.asarray(observation)
        n = frames.shape[0]
        if n > self.max_bucket:
            # chunk large batches at the fixed bucket size (one compile)
            chunks = [
                np.asarray(self._jitted(
                    self.params,
                    jnp.asarray(self._pad(frames[i:i + self.max_bucket],
                                          self.max_bucket))
                ))[:min(self.max_bucket, n - i)]
                for i in range(0, n, self.max_bucket)
            ]
            out = jnp.asarray(np.concatenate(chunks))
        else:
            bucket = min(_bucket(n), max(self.max_bucket, 1))
            out = self._jitted(
                self.params, jnp.asarray(self._pad(frames, bucket)))[:n]
        if self.training:
            return out.squeeze()
        return np.asarray(out).squeeze()

    def embed_batches(self, frames, batch_size):
        """Bulk path (the main_bc_1 embed-at-load hot loop, reference
        main_bc_1.py:127-138): upload, compute, and download overlap
        via the three-stage pipeline in utils/pipeline.py."""
        from pvr_habitat_tpu.utils.pipeline import pipelined_map

        if self.embedding_name == "true_state":
            return np.squeeze(np.asarray(frames))
        n = frames.shape[0]
        results = pipelined_map(
            range(0, n, batch_size),
            stage=lambda i: jnp.asarray(self._pad(
                np.asarray(frames[i:i + batch_size]), batch_size)),
            dispatch=lambda chunk: self._jitted(self.params, chunk),
            fetch=np.asarray)
        if not results:
            return np.zeros((0, self.out_size), np.float32)
        return np.concatenate(results, axis=0)[:n]

    @staticmethod
    def _pad(frames, bucket):
        if bucket > frames.shape[0]:
            pad = np.zeros((bucket - frames.shape[0],) + frames.shape[1:],
                           frames.dtype)
            frames = np.concatenate([frames, pad], axis=0)
        return frames

    # -- persistence (keeps the '{embedding}.tar' contract) ------------------

    def state_dict(self):
        return {k: np.asarray(v) for k, v in self.params.items()}

    def load_state_dict(self, flat):
        self.params = {k: jnp.asarray(v) for k, v in flat.items()}

    def save(self, path):
        convert.save_flat(path, self.params,
                          extra={"embedding_name": self.embedding_name})

    def load(self, path):
        self.params = convert.load_flat(path)
