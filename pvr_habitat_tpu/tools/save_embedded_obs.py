"""Bulk embedder: pass recorded frames through a frozen encoder and cache
the embeddings (reference: behavioral_cloning/save_embedded_obs.py:96-177).

Idempotent: returns immediately when the output pickle exists.  Also
persists the encoder weights as '{data_path}/{embedding}[_runid].tar'
(the reference's contract, save_embedded_obs.py:126-131).

The embedding loop itself is the TPU throughput path — frames stream
through the jitted preprocess+encoder in fixed-size device batches; see
pvr_habitat_tpu.data.embed_pipeline for the sharded multi-chip variant.
"""

import os
import random

import numpy as np

from pvr_habitat_tpu.data import formats
from pvr_habitat_tpu.models.embedding_net import EmbeddingNet
from pvr_habitat_tpu.train.bc import _embed_in_minibatches
from pvr_habitat_tpu.utils.flags import build_parser


def run(flags):
    from pvr_habitat_tpu.utils.platform import configure_platform

    configure_platform(flags)
    save_name = formats.embedded_path(flags.data_path, flags.env,
                                      flags.embedding_name)
    if os.path.isfile(save_name):
        return save_name

    from pvr_habitat_tpu.parallel import multihost

    multihost.maybe_initialize(flags)

    np.random.seed(flags.run_id)
    random.seed(flags.run_id)

    import jax

    embedding_model = EmbeddingNet(
        flags.embedding_name, in_channels=3,
        pretrained=flags.pretrained_embedding,
        train=flags.train_embedding,
        checkpoint_dir=flags.data_path, run_id=flags.run_id)

    # Save the encoder weights used (random gets a per-run suffix).
    # Multi-host: all ranks compute, only rank 0 writes (concurrent
    # writers on the shared data_path would corrupt the files).
    is_writer = jax.process_index() == 0
    emb_path = os.path.join(flags.data_path, flags.embedding_name)
    if flags.embedding_name == "random":
        emb_path += "_" + str(flags.run_id)
    if is_writer:
        embedding_model.save(emb_path + ".tar")

    print("=== Loading trajectories ===")
    if flags.source == "png":
        data = formats.read_png_trajectories(
            os.path.join(flags.data_path, flags.env),
            embed_fn=embedding_model,
            n_trajectories=flags.n_trajectories)
    elif flags.source == "pickle":
        data = formats.read_habitat_data(
            formats.raw_path(flags.data_path, flags.env),
            n_trajectories=flags.n_trajectories)
        print("   passing observations through embedding model")
        batch = flags.embed_batch_size or flags.batch_size
        if getattr(flags, "sharded_embed", False) or \
                getattr(flags, "quantize_embed", False):
            obs = _embed_sharded(flags, data["obs"], batch)
        else:
            obs = _embed_in_minibatches(embedding_model, data["obs"], batch)
        n = obs.shape[0]
        data = dict(obs=obs, action=data["action"][:n],
                    reward=data["reward"][:n], done=data["done"][:n],
                    true_state=data["true_state"][:n])
    else:
        raise ValueError(flags.source)

    n_samples = len(data["reward"])
    assert n_samples > 0, "no data found"
    print("   total number of samples", n_samples)

    if is_writer:
        formats.save_embedded(save_name, data["obs"], data["action"],
                              data["reward"], data["done"],
                              data["true_state"])
    if jax.process_count() > 1:
        # Barrier: non-writer ranks must not return (and possibly read
        # save_name, or exit and tear down the coordinator) while rank 0
        # is still writing.
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("save_embedded_obs_written")
    return save_name


def _embed_sharded(flags, frames, batch_size):
    """ShardedEmbedder path (--sharded_embed): frames shard over the
    mesh 'data' axis; under --coordinator each host embeds only its
    process_slice and the slices are allgathered for the single output
    pickle (data/embed_pipeline.py, parallel/multihost.py)."""
    import jax
    import jax.numpy as jnp

    from pvr_habitat_tpu.data.embed_pipeline import ShardedEmbedder
    from pvr_habitat_tpu.parallel import mesh as pmesh
    from pvr_habitat_tpu.parallel import multihost

    shape = pmesh.parse_mesh_shape(flags.mesh_shape)
    devices = None
    if shape is not None:
        # Embedding is embarrassingly parallel: a mesh smaller than the
        # host's device count is fine (uses the first shape[0]*shape[1]
        # devices); the trainer keeps its strict all-devices assert.
        want = shape[0] * shape[1]
        assert want <= len(jax.devices()), \
            f"mesh {shape} needs {want} devices, have {len(jax.devices())}"
        devices = jax.devices()[:want]
    mesh = pmesh.make_mesh(shape, devices=devices)
    dtype = jnp.bfloat16 if flags.compute_dtype == "bfloat16" \
        else jnp.float32
    embedder = ShardedEmbedder(
        flags.embedding_name, mesh=mesh, batch_size=batch_size,
        compute_dtype=dtype, pretrained=flags.pretrained_embedding,
        checkpoint_dir=flags.data_path, run_id=flags.run_id,
        quantize=getattr(flags, "quantize_embed", False))
    frames = np.asarray(frames)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        start, stop = multihost.process_slice(frames.shape[0])
        local = embedder.embed_local(frames[start:stop])
        # ragged per-host slices -> pad to the max, allgather, trim
        counts = multihost_utils.process_allgather(
            np.asarray([local.shape[0]], np.int32)).reshape(-1)
        pad_to = int(counts.max())
        padded = np.zeros((pad_to, local.shape[1]), np.float32)
        padded[:local.shape[0]] = local
        gathered = multihost_utils.process_allgather(padded)
        parts = [gathered[i][:counts[i]] for i in range(len(counts))]
        return np.concatenate(parts, axis=0)
    return embedder.embed_all(frames)


def build_tool_parser():
    parser = build_parser()
    parser.add_argument("--n_trajectories", type=int, default=-1)
    parser.add_argument("--source", type=str, default="png",
                        choices=["png", "pickle"])
    parser.add_argument("--sharded_embed", action="store_true",
                        help="Embed via the mesh-sharded pipeline "
                             "(multi-chip; with --coordinator, each "
                             "host embeds its slice of the dataset).")
    parser.add_argument("--quantize_embed", action="store_true",
                        help="W8A8 int8 serving for the ResNet families "
                             "and clip_rn50 (~1.5x throughput, cosine "
                             "> 0.99 vs f32; accuracy-gated in "
                             "tests/test_quantize.py). Implies the "
                             "sharded pipeline.")
    return parser


if __name__ == "__main__":
    flags = build_tool_parser().parse_args()
    run(flags)
