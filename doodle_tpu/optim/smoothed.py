"""Monte-Carlo smoothed-surrogate gradient estimation (SmoothedAdam).

The reference ``SmoothedAdam`` (``newenv/smooth_adam_opt.py:5-108``) descends
``s(θ) = E_{δ~U([-m/2, m/2]^d)}[L(θ+δ)]`` via an n-sample closure loop fused
into a custom Adam. The JAX decomposition is cleaner: a *gradient estimator*
(:func:`smoothed_value_and_grad`, a ``lax.scan`` over perturbation draws that
works under jit and composes with ANY optax optimizer) plus a convenience
bundle (:func:`smoothed_adam`) reproducing the reference's
L2-into-grad weight decay → global-norm clip → Adam pipeline.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

__all__ = ["smoothed_value_and_grad", "smoothed_adam"]


def smoothed_value_and_grad(
    loss_fn: Callable,
    width: float = 0.01,
    n_samples: int = 5,
    has_aux: bool = False,
) -> Callable:
    """Estimator ``f(params, key, *args) -> (mean_loss, mean_grad)``.

    Each sample evaluates ``jax.value_and_grad(loss_fn)`` at
    ``params + U(-width/2, width/2)`` (fresh draw per parameter element, as
    in ref ``newenv/smooth_adam_opt.py:59-66``); losses and gradients are
    averaged over ``n_samples`` with a ``lax.scan`` so the loop stays
    on-device under jit.

    With ``has_aux``, ``loss_fn`` returns ``(loss, aux)`` and the estimator
    returns ``((mean_loss, last_aux), mean_grad)`` — the aux of the LAST
    perturbation sample, mirroring the reference closure loop whose final
    evaluation is the one that leaves its side effects behind
    (``newenv/smooth_adam_opt.py:53-66``).
    """
    vg = jax.value_and_grad(loss_fn, has_aux=has_aux)

    def estimator(params, key, *args):
        leaves, treedef = jax.tree.flatten(params)

        def one_sample(carry, key_s):
            keys = jax.random.split(key_s, len(leaves))
            perturbed = [
                p + (jax.random.uniform(k, p.shape, p.dtype) - 0.5) * width
                for p, k in zip(leaves, keys)
            ]
            out, grad = vg(jax.tree.unflatten(treedef, perturbed), *args)
            return carry, (out, grad)

        sample_keys = jax.random.split(key, n_samples)
        _, (outs, grads) = jax.lax.scan(one_sample, None, sample_keys)
        mean_grad = jax.tree.map(lambda g: jnp.mean(g, axis=0), grads)
        if has_aux:
            losses, auxs = outs
            last_aux = jax.tree.map(lambda x: x[-1], auxs)
            return (jnp.mean(losses), last_aux), mean_grad
        return jnp.mean(outs), mean_grad

    return estimator


def smoothed_adam(
    learning_rate: optax.ScalarOrSchedule = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    max_grad_norm: float = 1.0,
) -> optax.GradientTransformation:
    """The update side of the reference SmoothedAdam: add L2 weight decay into
    the (already-smoothed) gradient, clip by global norm, Adam step
    (ref ``newenv/smooth_adam_opt.py:68-107``). Feed it gradients from
    :func:`smoothed_value_and_grad`."""
    chain = [optax.clip_by_global_norm(max_grad_norm)]
    if weight_decay > 0:
        chain.insert(0, optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    chain.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*chain)
