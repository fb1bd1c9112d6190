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
                 checkpoint_dir=None, fold_bn=True, run_id=0,
                 quantize=False):
        """quantize=True: W8A8 int8 serving for the ResNet families
        (1.5x throughput, cosine > 0.99 vs f32 — opt-in fast mode;
        activation scales calibrate on the first batch)."""
        self.mesh = mesh if mesh is not None else pmesh.make_mesh()
        data_size = self.mesh.shape["data"]
        self.batch_size = max(batch_size // data_size, 1) * data_size
        self.handle = build_encoder(
            embedding_name, pretrained=pretrained,
            checkpoint_dir=checkpoint_dir, run_id=run_id)
        params = self.handle.params
        if fold_bn and any(k.endswith(".running_mean") for k in params):
            params = fold_resnet_bn(params)

        self._int8_spec = None
        self._int8_apply = None
        if quantize:
            from pvr_habitat_tpu.models.registry import int8_serving_fns

            quantize_params, self._int8_apply = int8_serving_fns(
                embedding_name)
            self._int8_spec = True
            params = quantize_params(params)
        elif compute_dtype == jnp.bfloat16:
            params = jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                                  if x.dtype == jnp.float32 else x, params)
        self.params = pmesh.replicate(self.mesh, params)
        self.out_size = self.handle.out_size
        self._scales = None

        precision = (jax.lax.Precision.DEFAULT
                     if compute_dtype == jnp.bfloat16
                     else jax.lax.Precision.HIGHEST)
        frames_sharding = NamedSharding(self.mesh, P("data"))

        if self._int8_spec is not None:
            # int8 serving is explicitly approximate (cosine-gated vs
            # f32), so embeddings travel device->host as bf16 — half
            # the fetch bytes; the host casts to f32.  bf16 rounding
            # (2^-8 relative) is far below the int8 path's error floor.
            def forward(params, frames, scales):
                x = self.handle.preprocess(frames, precision=precision,
                                           out_dtype=jnp.bfloat16)
                out, _ = self._int8_apply(params, x, scales)
                return out.reshape(out.shape[0], -1).astype(jnp.bfloat16)

            def calibrate(params, frames):
                x = self.handle.preprocess(frames, precision=precision,
                                           out_dtype=jnp.bfloat16)
                _, scales = self._int8_apply(params, x, None)
                return scales

            self._calibrate = jax.jit(calibrate)
            self._forward_q = jax.jit(
                forward, in_shardings=(None, frames_sharding, None),
                static_argnums=())
        else:
            def forward(params, frames):
                x = self.handle.preprocess(frames, precision=precision,
                                           out_dtype=compute_dtype)
                out = self.handle.apply_fn(params, x, train=False)
                return out.reshape(out.shape[0], -1).astype(jnp.float32)

            self._forward = jax.jit(
                forward, in_shardings=(None, frames_sharding))
        self._frames_sharding = frames_sharding

    def _run_forward(self, device_chunk):
        if self._int8_spec is None:
            return self._forward(self.params, device_chunk)
        if self._scales is None:
            scales = self._calibrate(self.params, device_chunk)
            self._scales = {k: float(v) for k, v in scales.items()}
        return self._forward_q(self.params, device_chunk, self._scales)

    def _stage(self, chunk):
        if chunk.shape[0] < self.batch_size:     # pad the ragged tail
            pad = np.zeros(
                (self.batch_size - chunk.shape[0],) + chunk.shape[1:],
                chunk.dtype)
            chunk = np.concatenate([chunk, pad], axis=0)
        return jax.device_put(chunk, self._frames_sharding)

    def embed_all(self, frames):
        """frames: (N, H, W, 3) uint8 host array -> (N, out_size) f32.

        Upload, compute, and download overlap via the three-stage
        pipeline in utils/pipeline.py — on links where host<->device
        transfers rival compute (PCIe at high batch rates; the axon
        tunnel always) the legs would otherwise serialize."""
        from pvr_habitat_tpu.utils.pipeline import pipelined_map

        n = frames.shape[0]
        bs = self.batch_size
        results = pipelined_map(
            range(0, n, bs),
            stage=lambda i: self._stage(frames[i:i + bs]),
            dispatch=self._run_forward,
            fetch=lambda dev: np.asarray(dev).astype(np.float32))
        if not results:
            return np.zeros((0, self.out_size), np.float32)
        return np.concatenate(results)[:n]

    def embed_local(self, frames):
        """Multi-host bulk embedding: ``frames`` is THIS process's slice
        of the dataset (see multihost.process_slice); returns the
        embeddings for exactly those rows.

        Each host stages only its local rows
        (jax.make_array_from_process_local_data), the jitted forward
        runs SPMD over the global mesh with zero cross-host collectives
        (inference is embarrassingly data-parallel), and each host
        fetches only its addressable output shards.  Single-process
        fallback: plain embed_all."""
        if jax.process_count() == 1:
            return self.embed_all(frames)
        from jax.experimental import multihost_utils

        from pvr_habitat_tpu.parallel import multihost

        local_bs = self.batch_size // jax.process_count()
        assert local_bs >= 1, (self.batch_size, jax.process_count())
        n = frames.shape[0]
        # EVERY process must run the same number of global SPMD steps
        # or the stragglers' dispatches deadlock waiting for the ranks
        # whose (ragged) slice ran out one batch early — so agree on
        # the worst-case step count up front and let short ranks feed
        # zero batches whose rows are trimmed below.
        counts = multihost_utils.process_allgather(
            np.asarray([n], np.int64)).reshape(-1)
        steps = max(-(-int(c) // local_bs) for c in counts)
        chunk_shape = (local_bs,) + frames.shape[1:]
        outputs = []
        for step in range(steps):
            i = step * local_bs
            chunk = frames[i:i + local_bs]
            if chunk.shape[0] < local_bs:
                pad = np.zeros(
                    (local_bs - chunk.shape[0],) + chunk_shape[1:],
                    frames.dtype)
                chunk = np.concatenate([chunk, pad], axis=0) \
                    if chunk.shape[0] else pad
            global_chunk = multihost.global_array_from_local(
                self.mesh, chunk)
            out = self._run_forward(global_chunk)
            # The int8 path computes (and fetches) bf16 to halve tunnel
            # bytes; the documented contract is f32 rows (embed_all
            # casts in its fetch leg — mirror it here).
            outputs.append(
                multihost.local_rows_from_global(out).astype(np.float32))
        if not outputs:
            return np.zeros((0, self.out_size), np.float32)
        return np.concatenate(outputs)[:n]
