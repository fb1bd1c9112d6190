"""PyTorch checkpoint -> flat JAX param dict converters.

The reference loads ~20 distinct checkpoints with three key-surgery
schemes (reference: src/vision_models/resnet.py:35-42, moco.py:14-24,
maskrcnn.py:132-136).  Because our param dicts are keyed by the torch
module path, conversion is: key surgery -> drop bookkeeping entries ->
layout transform (OIHW conv weights to HWIO).

torch is an optional dependency here — only needed to deserialize
actual ``.pth``/``.tar`` checkpoints.
"""

import pickle

import numpy as np
import jax.numpy as jnp


def _to_numpy(v):
    if isinstance(v, np.ndarray):
        return v
    # torch tensor (incl. bf16/half) without importing torch at module scope.
    return v.detach().to("cpu").float().numpy()


def torch_state_dict_to_flat(state_dict, transpose_conv=True):
    """Flat jax param dict from a torch-style state dict."""
    out = {}
    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        arr = _to_numpy(value)
        if transpose_conv and arr.ndim == 4:
            arr = np.transpose(arr, (2, 3, 1, 0))  # OIHW -> HWIO
        # jnp.array (copy) rather than asarray: on the CPU backend,
        # asarray can zero-copy alias the torch tensor's buffer, and
        # later in-place torch mutations (e.g. BN running stats) would
        # silently corrupt the converted params.
        out[key] = jnp.array(arr)
    return out


def strip_module_prefix(state_dict):
    """'module.' DataParallel prefix removal
    (reference: src/vision_models/resnet.py:35-39)."""
    out = {}
    for key, value in state_dict.items():
        out[key[len("module."):] if key.startswith("module.") else key] = value
    return out


def moco_encoder_q(state_dict):
    """Keep only 'module.encoder_q.*' sans the projection fc
    (reference: src/vision_models/moco.py:14-21)."""
    prefix = "module.encoder_q."
    out = {}
    for key, value in state_dict.items():
        if key.startswith(prefix) and not key.startswith(prefix + "fc"):
            out[key[len(prefix):]] = value
    return out


def drop_keys(state_dict, substrings):
    return {k: v for k, v in state_dict.items()
            if not any(s in k for s in substrings)}


def load_torch_checkpoint(path):
    """Deserialize a torch checkpoint file to a dict of tensors/arrays."""
    import torch  # local import: torch optional at runtime

    return torch.load(path, map_location="cpu", weights_only=False)


def check_expected(flat_params, expected_names, context=""):
    """Mirror the reference's missing-key asserts after surgery
    (src/vision_models/moco.py:24,68,111)."""
    missing = sorted(set(expected_names) - set(flat_params))
    if missing:
        raise ValueError(
            f"{context}: missing {len(missing)} params, e.g. {missing[:5]}")


# Our own serialization for converted/initialized weights (the reference
# persists encoder weights as '{embedding}.tar'; we keep the filename
# contract with a numpy-pytree payload — see save_embedded_obs.py:126-131).


def save_flat(path, flat_params, extra=None):
    payload = {
        "format": "pvr_habitat_tpu/flat-v1",
        "params": {k: np.asarray(v) for k, v in flat_params.items()},
    }
    if extra:
        payload.update(extra)
    with open(path, "wb") as handle:
        pickle.dump(payload, handle, protocol=pickle.HIGHEST_PROTOCOL)


def load_flat(path):
    with open(path, "rb") as handle:
        payload = pickle.load(handle)
    return {k: jnp.asarray(v) for k, v in payload["params"].items()}
