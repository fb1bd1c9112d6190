"""BC policy networks.

``PolicyNet``  — MLP(obs->1024->1024) -> 2-layer LSTM(1024) -> policy +
baseline heads, optional input BatchNorm1d, orthogonal init
(reference: src/models.py:13-89).

``PolicyNetWithConv`` — same head over raw pixels: per-frame 5x(conv3x3
s2, ELU) feature stack, frames concatenated, inputs scaled by 1/255
(reference: src/models.py:96-197; finetune path only).

Parameter keys mirror the torch module paths so checkpoints and
converters line up:
  without batch_norm: fc.0 / fc.2 are the Linears;
  with batch_norm:    fc.0 is BatchNorm1d, fc.1 / fc.3 the Linears.
LSTM params: core.weight_ih_l{0,1} etc.  Heads: policy.*, baseline.*.

Model state is split into ``params`` (trained) and ``batch_stats``
(BatchNorm running mean/var, updated as a side output in train mode),
keeping the train step functionally pure.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp

from pvr_habitat_tpu.models import common as cm
from pvr_habitat_tpu.ops.lstm import lstm_scan, stack_lstm_params

HIDDEN = 1024
LSTM_LAYERS = 2
BN_MOMENTUM = 0.1
BN_EPS = 1e-5


# -----------------------------------------------------------------------------
# Init
# -----------------------------------------------------------------------------


def _init_lstm(out, rng, input_size):
    k = 1.0 / math.sqrt(HIDDEN)
    for layer in range(LSTM_LAYERS):
        in_size = input_size if layer == 0 else HIDDEN
        out[f"core.weight_ih_l{layer}"] = rng.uniform(
            -k, k, size=(4 * HIDDEN, in_size)).astype(np.float32)
        out[f"core.weight_hh_l{layer}"] = rng.uniform(
            -k, k, size=(4 * HIDDEN, HIDDEN)).astype(np.float32)
        out[f"core.bias_ih_l{layer}"] = rng.uniform(
            -k, k, size=(4 * HIDDEN,)).astype(np.float32)
        out[f"core.bias_hh_l{layer}"] = rng.uniform(
            -k, k, size=(4 * HIDDEN,)).astype(np.float32)


def _init_heads(out, rng, num_actions):
    out["policy.weight"] = cm.orthogonal(rng, (num_actions, HIDDEN), gain=1.0)
    out["policy.bias"] = np.zeros(num_actions, np.float32)
    out["baseline.weight"] = cm.orthogonal(rng, (1, HIDDEN), gain=1.0)
    out["baseline.bias"] = np.zeros(1, np.float32)


def init_policy_params(rng, obs_size, num_actions, batch_norm=False):
    """Returns (params, batch_stats)."""
    gain = math.sqrt(2.0)  # calculate_gain('relu')
    params, stats = {}, {}
    fc0 = 1 if batch_norm else 0
    if batch_norm:
        params["fc.0.weight"] = np.ones(obs_size, np.float32)
        params["fc.0.bias"] = np.zeros(obs_size, np.float32)
        stats["fc.0.running_mean"] = np.zeros(obs_size, np.float32)
        stats["fc.0.running_var"] = np.ones(obs_size, np.float32)
    params[f"fc.{fc0}.weight"] = cm.orthogonal(rng, (HIDDEN, obs_size), gain)
    params[f"fc.{fc0}.bias"] = np.zeros(HIDDEN, np.float32)
    params[f"fc.{fc0 + 2}.weight"] = cm.orthogonal(rng, (HIDDEN, HIDDEN), gain)
    params[f"fc.{fc0 + 2}.bias"] = np.zeros(HIDDEN, np.float32)
    _init_lstm(params, rng, HIDDEN)
    _init_heads(params, rng, num_actions)
    params = {k: jnp.asarray(v) for k, v in params.items()}
    stats = {k: jnp.asarray(v) for k, v in stats.items()}
    return params, stats


def init_conv_policy_params(rng, obs_shape, num_actions, batch_norm=False):
    """obs_shape = (H, W, C*n_frames) raw pixels. Returns (params, stats)."""
    h, w, cn = obs_shape
    n_frames = cn // 3
    gain = math.sqrt(2.0)
    params, stats = {}, {}
    ch_in = 3
    for i in range(5):
        params[f"feat_extract.{2 * i}.weight"] = cm.orthogonal_conv(
            rng, (32, ch_in, 3, 3), gain)
        params[f"feat_extract.{2 * i}.bias"] = np.zeros(32, np.float32)
        ch_in = 32
    side_h, side_w = h, w
    for _ in range(5):
        side_h = (side_h + 1) // 2
        side_w = (side_w + 1) // 2
    conv_out = 32 * side_h * side_w * n_frames

    fc0 = 1 if batch_norm else 0
    if batch_norm:
        params["fc.0.weight"] = np.ones(conv_out, np.float32)
        params["fc.0.bias"] = np.zeros(conv_out, np.float32)
        stats["fc.0.running_mean"] = np.zeros(conv_out, np.float32)
        stats["fc.0.running_var"] = np.ones(conv_out, np.float32)
    params[f"fc.{fc0}.weight"] = cm.orthogonal(rng, (HIDDEN, conv_out), gain)
    params[f"fc.{fc0}.bias"] = np.zeros(HIDDEN, np.float32)
    params[f"fc.{fc0 + 2}.weight"] = cm.orthogonal(rng, (HIDDEN, HIDDEN), gain)
    params[f"fc.{fc0 + 2}.bias"] = np.zeros(HIDDEN, np.float32)
    _init_lstm(params, rng, HIDDEN)
    _init_heads(params, rng, num_actions)
    params = {k: jnp.asarray(v) for k, v in params.items()}
    stats = {k: jnp.asarray(v) for k, v in stats.items()}
    return params, stats


def initial_state(batch_size):
    """Zero (h, c), each (L, B, H) (reference: src/models.py:52-54)."""
    shape = (LSTM_LAYERS, batch_size, HIDDEN)
    return jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32)


# -----------------------------------------------------------------------------
# Forward
# -----------------------------------------------------------------------------


def _batch_norm_1d(x, params, batch_stats, train):
    gamma = params["fc.0.weight"]
    beta = params["fc.0.bias"]
    if train:
        mean = jnp.mean(x, axis=0)
        var = jnp.var(x, axis=0)
        n = x.shape[0]
        unbiased = var * (n / max(n - 1, 1))
        new_stats = {
            "fc.0.running_mean": (1 - BN_MOMENTUM)
            * batch_stats["fc.0.running_mean"] + BN_MOMENTUM * mean,
            "fc.0.running_var": (1 - BN_MOMENTUM)
            * batch_stats["fc.0.running_var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean = batch_stats["fc.0.running_mean"]
        var = batch_stats["fc.0.running_var"]
        new_stats = batch_stats
    x = (x - mean) * jax.lax.rsqrt(var + BN_EPS) * gamma + beta
    return x, new_stats


def _trunk_to_outputs(core_input, params, done, core_state, train, rng,
                      precision):
    """Shared tail: LSTM unroll + heads + action selection."""
    t, b, _ = core_input.shape
    notdone = 1.0 - done.astype(jnp.float32)
    layers = stack_lstm_params(params, "core", LSTM_LAYERS)
    core_out, new_state = lstm_scan(layers, core_input, core_state[0],
                                    core_state[1], notdone,
                                    precision=precision)
    flat = core_out.reshape(t * b, HIDDEN)
    logits = cm.linear(flat, params, "policy", precision=precision)
    baseline = cm.linear(flat, params, "baseline", precision=precision)
    if train:
        if rng is None:
            raise ValueError("train-mode action sampling needs an rng")
        action = jax.random.categorical(rng, logits, axis=-1)
    else:
        action = jnp.argmax(logits, axis=-1)
    return (
        dict(
            policy_logits=logits.reshape(t, b, -1),
            baseline=baseline.reshape(t, b),
            action=action.reshape(t, b),
        ),
        new_state,
    )


def apply_policy(params, batch_stats, inputs, core_state, *, batch_norm=False,
                 train=False, rng=None,
                 precision=jax.lax.Precision.HIGHEST):
    """PolicyNet forward.

    inputs: dict(obs=(T, B, O) float, done=(T, B) bool-ish).
    Returns (outputs, new_core_state, new_batch_stats).
    """
    obs, done = inputs["obs"], inputs["done"]
    t, b = obs.shape[0], obs.shape[1]
    x = obs.reshape(t * b, -1).astype(jnp.float32)

    new_stats = batch_stats
    fc0 = 0
    if batch_norm:
        x, new_stats = _batch_norm_1d(x, params, batch_stats, train)
        fc0 = 1
    x = jnp.maximum(cm.linear(x, params, f"fc.{fc0}", precision), 0)
    x = jnp.maximum(cm.linear(x, params, f"fc.{fc0 + 2}", precision), 0)
    outputs, new_state = _trunk_to_outputs(
        x.reshape(t, b, HIDDEN), params, done, core_state, train, rng,
        precision)
    return outputs, new_state, new_stats


def apply_conv_policy(params, batch_stats, inputs, core_state, *,
                      batch_norm=False, train=False, rng=None,
                      precision=jax.lax.Precision.HIGHEST):
    """PolicyNetWithConv forward over raw pixels.

    inputs: dict(obs=(T, B, H, W, C*n) uint8/float, done=(T, B)).
    """
    obs, done = inputs["obs"], inputs["done"]
    t, b, h, w, cn = obs.shape
    n_frames = cn // 3
    x = obs.reshape(t * b, h, w, cn).astype(jnp.float32) / 255.0

    feats = []
    for f in range(n_frames):
        # torch does x.transpose(1, 3): (N,H,W,C) -> (N,C,W,H), i.e. the
        # conv runs over swapped spatial axes (src/models.py:169). NHWC
        # equivalent: swap H and W.
        y = jnp.swapaxes(x[..., 3 * f: 3 * (f + 1)], 1, 2)
        for i in range(5):
            y = cm.conv2d(y, params[f"feat_extract.{2 * i}.weight"],
                          stride=2, padding=1,
                          bias=params[f"feat_extract.{2 * i}.bias"],
                          precision=precision)
            y = jax.nn.elu(y)
        feats.append(y)
    # torch concatenates the (N,32,W',H') maps along the last (H') axis
    # then flattens in NCHW order; replicate that element order exactly.
    y = jnp.concatenate(feats, axis=2)  # our H' axis == torch dim 3
    x = jnp.transpose(y, (0, 3, 1, 2)).reshape(t * b, -1)

    new_stats = batch_stats
    fc0 = 0
    if batch_norm:
        x, new_stats = _batch_norm_1d(x, params, batch_stats, train)
        fc0 = 1
    x = jnp.maximum(cm.linear(x, params, f"fc.{fc0}", precision), 0)
    x = jnp.maximum(cm.linear(x, params, f"fc.{fc0 + 2}", precision), 0)
    outputs, new_state = _trunk_to_outputs(
        x.reshape(t, b, HIDDEN), params, done, core_state, train, rng,
        precision)
    return outputs, new_state, new_stats
