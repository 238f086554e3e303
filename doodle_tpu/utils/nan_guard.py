"""NaN/Inf detection for pytrees — the JAX counterpart of the reference's
hook mesh (``log_if_nan`` grad/forward hooks, ``train_with_env.py:27-36,
284-291``) and the env's hard asserts (``test_environment.py:495-501``).

In JAX there are no module hooks; the idiomatic equivalents are:
  * host-side pytree scans between steps (:func:`find_nonfinite`) — cheap,
    run on already-materialized outputs;
  * traced checks inside jit via ``checkify`` (:func:`check_finite`);
  * the global ``jax.config.update("jax_debug_nans", True)`` switch for
    interactive debugging (documented here, not forced).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["find_nonfinite", "check_finite"]


def find_nonfinite(tree: Any, name: str = "tree") -> list[str]:
    """Return the paths of all leaves containing NaN/Inf (host-side).

    Use between training steps on losses/grads/params — the replacement for
    the reference's per-parameter hooks. Empty list = all finite.
    """
    bad = []
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    for path, leaf in leaves:
        arr = np.asarray(leaf)
        if not np.isfinite(arr).all():
            n_bad = int((~np.isfinite(arr)).sum())
            bad.append(f"{name}{jax.tree_util.keystr(path)} ({n_bad} bad)")
    return bad


def check_finite(x: jax.Array, name: str = "value") -> jax.Array:
    """Traced finiteness check usable inside jit via ``checkify``.

    Wrap the caller with ``jax.experimental.checkify.checkify`` to surface
    the error; without checkify this compiles to a no-op pass-through.
    """
    from jax.experimental import checkify

    checkify.check(
        jnp.isfinite(x).all(), f"{name} contains NaN/Inf"
    )
    return x
