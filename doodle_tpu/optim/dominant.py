"""Dominant-gradient multi-objective optimization (DomAdam / ADom).

The reference ``DominantAdam`` (``newenv/dom_adam_optimizer.py:6-130``)
backprops each of n losses, keeps only the largest-ℓ2-norm gradient, clips
it, and Adam-steps. JAX split: :func:`dominant_grad` selects the gradient
(returns the chosen index, all under jit — the selection is a gather over a
stacked axis, no host branch), and :func:`dominant_adam` is the matching
clip → L2-decay → Adam update chain.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import optax

__all__ = ["dominant_grad", "dominant_value_and_grads", "dominant_adam"]


def dominant_grad(grads: Sequence[optax.Updates]) -> tuple[optax.Updates, jax.Array]:
    """Pick the gradient pytree with the largest global ℓ2 norm.

    Returns ``(chosen_grad, index)`` — index is 0-based (the reference
    returns 1-based, ``newenv/dom_adam_optimizer.py:130``; we keep the
    array-friendly convention and document the delta).
    """
    if len(grads) < 2:
        raise ValueError("need at least two gradient pytrees")
    norms = jnp.stack([optax.global_norm(g) for g in grads])
    idx = jnp.argmax(norms)
    chosen = jax.tree.map(lambda *gs: jnp.stack(gs)[idx], *grads)
    return chosen, idx


def dominant_value_and_grads(
    loss_fns: Sequence[Callable],
) -> Callable:
    """``f(params, *args) -> (losses [n], chosen_grad, index)`` computing each
    loss's gradient and selecting the dominant one."""

    def estimator(params, *args):
        pairs = [jax.value_and_grad(fn)(params, *args) for fn in loss_fns]
        losses = jnp.stack([p[0] for p in pairs])
        chosen, idx = dominant_grad([p[1] for p in pairs])
        return losses, chosen, idx

    return estimator


def dominant_adam(
    learning_rate: optax.ScalarOrSchedule = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    max_grad_norm: float | None = 1.0,
) -> optax.GradientTransformation:
    """Update chain of the reference DominantAdam: global-norm clip of the
    selected gradient, L2 weight decay added into the gradient
    (ref ``:109-110`` — despite its docstring, the reference adds decay into
    the grad, not decoupled), Adam step."""
    chain = []
    if max_grad_norm is not None and max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    if weight_decay > 0:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    chain.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*chain)
