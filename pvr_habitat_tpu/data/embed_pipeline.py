"""Sharded bulk embedding: the high-throughput replacement for the
reference's minibatch embed loop (save_embedded_obs.py:151-157).

Frames shard over the mesh's 'data' axis (encoder params replicated),
fixed-size device batches keep one compiled executable, and dispatch is
asynchronous — the host stages batch i+1 while the devices chew on
batch i.  Throughput scales linearly over ICI with chips since there is
no cross-chip communication in inference.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pvr_habitat_tpu.models.registry import build_encoder
from pvr_habitat_tpu.ops.fold_bn import fold_resnet_bn
from pvr_habitat_tpu.parallel import mesh as pmesh


class ShardedEmbedder:
    def __init__(self, embedding_name, mesh=None, batch_size=256,
                 compute_dtype=jnp.bfloat16, pretrained=True,
                 checkpoint_dir=None, fold_bn=True, run_id=0):
        self.mesh = mesh if mesh is not None else pmesh.make_mesh()
        data_size = self.mesh.shape["data"]
        self.batch_size = max(batch_size // data_size, 1) * data_size
        self.handle = build_encoder(
            embedding_name, pretrained=pretrained,
            checkpoint_dir=checkpoint_dir, run_id=run_id)
        params = self.handle.params
        if fold_bn and any(k.endswith(".running_mean") for k in params):
            params = fold_resnet_bn(params)
        if compute_dtype == jnp.bfloat16:
            params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                                  if x.dtype == jnp.float32 else x, params)
        self.params = pmesh.replicate(self.mesh, params)
        self.out_size = self.handle.out_size

        precision = (jax.lax.Precision.DEFAULT
                     if compute_dtype == jnp.bfloat16
                     else jax.lax.Precision.HIGHEST)
        frames_sharding = NamedSharding(self.mesh, P("data"))

        def forward(params, frames):
            x = self.handle.preprocess(frames, precision=precision,
                                       out_dtype=compute_dtype)
            out = self.handle.apply_fn(params, x, train=False)
            return out.reshape(out.shape[0], -1).astype(jnp.float32)

        self._forward = jax.jit(
            forward, in_shardings=(None, frames_sharding))
        self._frames_sharding = frames_sharding

    def embed_all(self, frames):
        """frames: (N, H, W, 3) uint8 host array -> (N, out_size) f32."""
        n = frames.shape[0]
        bs = self.batch_size
        outputs = []
        for i in range(0, n, bs):
            chunk = frames[i:i + bs]
            if chunk.shape[0] < bs:          # pad the ragged tail
                pad = np.zeros((bs - chunk.shape[0],) + chunk.shape[1:],
                               chunk.dtype)
                chunk = np.concatenate([chunk, pad], axis=0)
            device_chunk = jax.device_put(chunk, self._frames_sharding)
            outputs.append(self._forward(self.params, device_chunk))
        # fetch at the end: dispatch stays ahead of the device
        return np.concatenate([np.asarray(o) for o in outputs])[:n]
