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
    save_name = formats.embedded_path(flags.data_path, flags.env,
                                      flags.embedding_name)
    if os.path.isfile(save_name):
        return save_name

    from pvr_habitat_tpu.parallel import multihost

    multihost.maybe_initialize(flags)

    np.random.seed(flags.run_id)
    random.seed(flags.run_id)

    embedding_model = EmbeddingNet(
        flags.embedding_name, in_channels=3,
        pretrained=flags.pretrained_embedding,
        train=flags.train_embedding,
        checkpoint_dir=flags.data_path, run_id=flags.run_id)

    # Save the encoder weights used (random gets a per-run suffix).
    emb_path = os.path.join(flags.data_path, flags.embedding_name)
    if flags.embedding_name == "random":
        emb_path += "_" + str(flags.run_id)
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

    formats.save_embedded(save_name, data["obs"], data["action"],
                          data["reward"], data["done"], data["true_state"])
    return save_name


def build_tool_parser():
    parser = build_parser()
    parser.add_argument("--n_trajectories", type=int, default=-1)
    parser.add_argument("--source", type=str, default="png",
                        choices=["png", "pickle"])
    return parser


if __name__ == "__main__":
    flags = build_tool_parser().parse_args()
    run(flags)
