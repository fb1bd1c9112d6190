"""Optimizer with the reference's exact torch semantics.

- torch.optim.RMSprop: square_avg starts at ZERO, eps is added OUTSIDE
  the sqrt, optional momentum buffer (reference: main_bc_2.py:80-85).
- LambdaLR linear decay with the scheduler stepped BEFORE the optimizer
  each iteration (reference quirk, main_bc_2.py:216-227): the lr applied
  at global epoch k (0-based) is  base_lr * (1 - (k+1) / max_epochs).
- clip_grad_norm_(40): global L2 norm across all grads; the logged
  gradient-norm metric is the PRE-clip norm (main_bc_2.py:220-226).

Implemented as a single optax-style GradientTransformation so the whole
update stays inside the jitted train step.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class RMSpropTorchState(NamedTuple):
    count: jnp.ndarray     # number of optimizer steps taken so far
    square_avg: optax.Updates
    momentum_buf: optax.Updates


def rmsprop_torch(base_lr, alpha=0.99, eps=1e-5, momentum=0.0,
                  max_epochs=None):
    """GradientTransformation: grads -> parameter updates (to be added)."""

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return RMSpropTorchState(
            count=jnp.zeros([], jnp.int32),
            square_avg=zeros,
            momentum_buf=jax.tree.map(jnp.zeros_like, params)
            if momentum else (),
        )

    def update(grads, state, params=None):
        del params
        sq = jax.tree.map(
            lambda s, g: alpha * s + (1.0 - alpha) * g * g,
            state.square_avg, grads)
        step_dir = jax.tree.map(
            lambda g, s: g / (jnp.sqrt(s) + eps), grads, sq)
        if momentum:
            buf = jax.tree.map(
                lambda b, d: momentum * b + d, state.momentum_buf, step_dir)
            step_dir = buf
        else:
            buf = ()
        if max_epochs is not None:
            # scheduler.step() precedes optimizer.step(), so step k uses
            # the factor for epoch k+1.
            factor = 1.0 - (state.count.astype(jnp.float32) + 1.0) / max_epochs
        else:
            factor = 1.0
        lr = base_lr * factor
        updates = jax.tree.map(lambda d: -lr * d, step_dir)
        return updates, RMSpropTorchState(state.count + 1, sq, buf)

    return optax.GradientTransformation(init, update)


def clip_by_global_norm_torch(grads, max_norm):
    """torch clip_grad_norm_: returns (clipped_grads, pre_clip_norm)."""
    gnorm = optax.global_norm(grads)
    coef = max_norm / (gnorm + 1e-6)
    coef = jnp.minimum(coef, 1.0)
    return jax.tree.map(lambda g: g * coef, grads), gnorm
