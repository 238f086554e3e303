"""Torch-default parameter-init distributions as a shipped option.

The reference policy inherits torch's module defaults for every layer
(``train_with_env.py:39-55,58-166`` — implicit in ``nn.Linear``,
``nn.Conv2d``, ``nn.LSTM``):

* Linear / Conv: kernel AND bias ~ U(±1/√fan_in), fan_in = the kernel's
  input element count (Cin·kh·kw for convs);
* LSTM: every weight and bias ~ U(±1/√hidden_size);
* LayerNorm: scale=1, bias=0 (same as flax — untouched).

flax's defaults (lecun-normal kernels, ZERO biases) start the policy
"colder": the 5-seed learning-curve parity run measured the difference as
an ~15-step early transient that put the standard arm at 83% not-worse vs
the required 90%, and re-running with these distributions moved it to 99%
(results/RESULTS.md, "5-seed learning-curve parity"). This module ships
that transform as ``TrainConfig.param_init="torch"`` so the parity rule
can be passed with a named package setting instead of a script-local
attribution hack (VERDICT r3 item 3).

Implementation notes:
* Applied as a post-``policy.init`` tree transform (not per-module
  ``kernel_init``): the bias bound needs the *sibling kernel's* fan_in,
  which a flax initializer callback cannot see, and one transform covers
  every head architecture without threading initializers through six
  module classes.
* ``exclude``: module-path substrings to leave untouched — the trainer
  passes ``("Dense_1",)`` under ``residual_head``/``zero_init_head``,
  whose start-exactly-aligned contract requires that layer to stay zero.
* Deterministic in the JAX PRNG key (one ``fold_in`` per flattened path).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["torch_default_init"]


def _path_names(path) -> list[str]:
    return [str(getattr(p, "key", getattr(p, "name", p))) for p in path]


def torch_default_init(params, key: jax.Array, exclude: tuple[str, ...] = ()):
    """Resample ``params`` (a flax param tree) with torch's default init
    distributions. See the module docstring for the distribution table."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    # Sibling lookup: kernel shapes by parent path, so bias bounds can use
    # the true fan_in (torch's rule) rather than the bias's own width.
    kernel_fan_in: dict[tuple[str, ...], int] = {}
    for path, leaf in flat:
        names = _path_names(path)
        if names and names[-1] == "kernel":
            kernel_fan_in[tuple(names[:-1])] = int(np.prod(leaf.shape[:-1]))

    def resample(path, leaf):
        names = _path_names(path)
        joined = "/".join(names)
        if any(x in joined for x in exclude):
            return leaf
        name = names[-1] if names else ""
        if any("LayerNorm" in n for n in names):
            return leaf                       # scale=1 / bias=0 in both
        if any("OptimizedLSTMCell" in n for n in names):
            # torch nn.LSTM: every tensor U(±1/√hidden). flax splits the
            # cell into i/f/g/o Dense blocks; hidden = each block's width.
            bound = 1.0 / np.sqrt(leaf.shape[-1])
        elif name == "kernel":
            bound = 1.0 / np.sqrt(int(np.prod(leaf.shape[:-1])))
        elif name == "bias":
            fan_in = kernel_fan_in.get(tuple(names[:-1]))
            if fan_in is None:                # bias with no sibling kernel
                return leaf
            bound = 1.0 / np.sqrt(fan_in)
        else:
            return leaf                       # unknown leaf: leave as-is
        leaf_key = jax.random.fold_in(
            key, zlib_crc32(joined.encode())
        )
        return jax.random.uniform(
            leaf_key, leaf.shape, jnp.float32, -bound, bound
        ).astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(resample, params)


def zlib_crc32(data: bytes) -> int:
    import zlib

    return zlib.crc32(data) & 0x7FFFFFFF
