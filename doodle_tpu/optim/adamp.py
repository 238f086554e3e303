"""AdamP as an optax GradientTransformation.

The reference's production optimizer is the third-party ``adamp`` package
(``train_with_env.py:19,293``, ``requirements.txt:8``). This is a
from-scratch JAX implementation of the published AdamP algorithm (Heo et
al., "AdamP: Slowing Down the Slowdown for Momentum Optimizers on
Scale-invariant Weights", ICLR 2021):

Adam moments + bias correction, then — for parameters that look
scale-invariant (gradient ⟂ parameter under a channel- or layer-wise view) —
the update is projected onto the tangent space of the weight-norm sphere,
and weight decay is damped by ``wd_ratio``. All branching is ``where``-based
(data-independent control flow), so the transform jits cleanly.
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax

__all__ = ["adamp"]


class AdamPState(NamedTuple):
    count: chex.Array
    mu: optax.Updates
    nu: optax.Updates


def _view_cosine(x: jax.Array, y: jax.Array, eps: float) -> jax.Array:
    """|cos| between flattened views of x and y, per leading row."""
    x = x.reshape(x.shape[0], -1)
    y = y.reshape(y.shape[0], -1)
    dot = jnp.abs(jnp.sum(x * y, axis=1))
    return dot / (jnp.linalg.norm(x, axis=1) * jnp.linalg.norm(y, axis=1) + eps)


def _project(
    p: jax.Array,
    grad: jax.Array,
    perturb: jax.Array,
    delta: float,
    wd_ratio: float,
    eps: float,
) -> tuple[jax.Array, jax.Array]:
    """Channel-wise (first-axis) then layer-wise scale-invariance test; if one
    fires, remove the radial component of the update under that view."""

    def proj_with(view_shape):
        pv = p.reshape(view_shape)
        expand = pv / (jnp.linalg.norm(pv, axis=1, keepdims=True) + eps)
        pert = perturb.reshape(view_shape)
        pert = pert - expand * jnp.sum(expand * pert, axis=1, keepdims=True)
        return pert.reshape(p.shape)

    ch_shape = (p.shape[0], -1)
    ly_shape = (1, -1)

    cos_ch = jnp.max(_view_cosine(grad.reshape(ch_shape), p.reshape(ch_shape), eps))
    cos_ly = jnp.max(_view_cosine(grad.reshape(ly_shape), p.reshape(ly_shape), eps))
    ch_dim = p.reshape(ch_shape).shape[1]
    ly_dim = p.size

    use_ch = cos_ch < delta / jnp.sqrt(jnp.asarray(ch_dim, p.dtype))
    use_ly = jnp.logical_and(
        jnp.logical_not(use_ch),
        cos_ly < delta / jnp.sqrt(jnp.asarray(ly_dim, p.dtype)),
    )

    out = jnp.where(use_ch, proj_with(ch_shape),
                    jnp.where(use_ly, proj_with(ly_shape), perturb))
    ratio = jnp.where(jnp.logical_or(use_ch, use_ly),
                      jnp.asarray(wd_ratio, p.dtype),
                      jnp.asarray(1.0, p.dtype))
    return out, ratio


def adamp(
    learning_rate: optax.ScalarOrSchedule = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    delta: float = 0.1,
    wd_ratio: float = 0.1,
    nesterov: bool = False,
) -> optax.GradientTransformation:
    """AdamP. Requires params at ``update`` (decay and projection read them)."""

    def init_fn(params):
        return AdamPState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("adamp requires params")
        count = state.count + 1
        b1c = 1.0 - b1 ** count.astype(jnp.float32)
        b2c = 1.0 - b2 ** count.astype(jnp.float32)

        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)

        lr = learning_rate(count) if callable(learning_rate) else learning_rate

        def leaf_update(p, g, m, v):
            denom = jnp.sqrt(v / b2c) + eps
            if nesterov:
                pert = (b1 * m + (1 - b1) * g) / b1c / denom
            else:
                pert = (m / b1c) / denom
            if p.ndim > 1:
                pert, ratio = _project(p, g, pert, delta, wd_ratio, eps)
            else:
                ratio = jnp.asarray(1.0, p.dtype)
            new_p = p
            if weight_decay > 0:
                new_p = new_p * (1.0 - lr * weight_decay * ratio)
            new_p = new_p - lr * pert
            return new_p - p

        deltas = jax.tree.map(leaf_update, params, updates, mu, nu)
        return deltas, AdamPState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)
