"""Multi-layer LSTM with done-masked state resets as a ``lax.scan``.

The reference runs a 2-layer torch LSTM one timestep at a time in a
Python loop, multiplying the carried (h, c) by ``notdone`` before every
step (reference: src/models.py:66-73).  Here the unroll is a single
``lax.scan`` — one compiled loop, no per-step dispatch — with the exact
same masking semantics and torch's gate order/equations:

    i, f, g, o = split4(x @ Wih^T + h @ Whh^T + bih + bhh)
    c' = sigmoid(f) * c + sigmoid(i) * tanh(g)
    h' = sigmoid(o) * tanh(c')
"""

import jax
import jax.numpy as jnp


def stack_lstm_params(flat, prefix, num_layers):
    """Collect torch-named LSTM params ('{prefix}.weight_ih_l{k}', ...)
    into per-layer tuples for the scan body."""
    layers = []
    for layer in range(num_layers):
        layers.append((
            flat[f"{prefix}.weight_ih_l{layer}"],
            flat[f"{prefix}.weight_hh_l{layer}"],
            flat[f"{prefix}.bias_ih_l{layer}"],
            flat[f"{prefix}.bias_hh_l{layer}"],
        ))
    return layers


def _cell(x, h, c, wih, whh, bih, bhh, precision):
    gates = (
        jnp.matmul(x, wih.T, precision=precision)
        + jnp.matmul(h, whh.T, precision=precision)
        + bih + bhh
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def lstm_scan(layers, x, h0, c0, notdone,
              precision=jax.lax.Precision.HIGHEST):
    """Run the unroll.

    Args:
      layers: list of (wih, whh, bih, bhh) per layer.
      x: (T, B, In) inputs.
      h0, c0: (L, B, H) initial states.
      notdone: (T, B) float mask; the carried state is multiplied by
        ``notdone[t]`` BEFORE step t (episode boundaries reset state).

    Returns: (ys (T, B, H) top-layer outputs, (hT, cT)).
    """
    num_layers = len(layers)

    def step(carry, inputs):
        h, c = carry
        x_t, nd = inputs
        nd = nd[None, :, None]
        h = h * nd
        c = c * nd
        inp = x_t
        new_h, new_c = [], []
        for l in range(num_layers):
            h_l, c_l = _cell(inp, h[l], c[l], *layers[l],
                             precision=precision)
            new_h.append(h_l)
            new_c.append(c_l)
            inp = h_l
        return (jnp.stack(new_h), jnp.stack(new_c)), inp

    (h_t, c_t), ys = jax.lax.scan(step, (h0, c0), (x, notdone))
    return ys, (h_t, c_t)
