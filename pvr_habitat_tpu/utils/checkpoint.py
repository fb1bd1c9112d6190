"""Checkpoint save/restore keeping the reference's '.tar' file contract
(reference: main_bc_2.py:252-260): one file per run holding
embedding/actor/optimizer/scheduler state plus the flags dict.  Payload
tensors are numpy pytrees (we are torch-free at runtime)."""

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp

from pvr_habitat_tpu.train import optim


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _to_jax_tree(tree):
    return jax.tree.map(jnp.asarray, tree)


def save_checkpoint(path, *, actor_params, actor_batch_stats, opt_state,
                    flags, embedding_state=None):
    payload = {
        "format": "pvr_habitat_tpu/ckpt-v1",
        "actor_model_state_dict": _to_numpy_tree(
            {**actor_params, **actor_batch_stats}),
        "actor_model_optimizer_state_dict": {
            "count": int(opt_state.count),
            "square_avg": _to_numpy_tree(opt_state.square_avg),
            "momentum_buf": _to_numpy_tree(opt_state.momentum_buf),
        },
        # torch LambdaLR state analogue: number of scheduler steps taken.
        "scheduler_state_dict": {"last_epoch": int(opt_state.count)},
        "flags": {k: v for k, v in vars(flags).items()
                  if not k.startswith("_")},
    }
    if embedding_state is not None:
        payload["embedding_model_state_dict"] = _to_numpy_tree(embedding_state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as handle:
        pickle.dump(payload, handle, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path):
    with open(path, "rb") as handle:
        payload = pickle.load(handle)
    return payload


def split_actor_state(state_dict):
    """torch-style merged state dict -> (params, batch_stats)."""
    params = {k: jnp.asarray(v) for k, v in state_dict.items()
              if "running_" not in k}
    stats = {k: jnp.asarray(v) for k, v in state_dict.items()
             if "running_" in k}
    return params, stats


def restore_opt_state(payload):
    opt = payload["actor_model_optimizer_state_dict"]
    return optim.RMSpropTorchState(
        count=jnp.asarray(opt["count"], jnp.int32),
        square_avg=_to_jax_tree(opt["square_avg"]),
        momentum_buf=_to_jax_tree(opt["momentum_buf"]),
    )
