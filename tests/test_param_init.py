"""TrainConfig.param_init="torch" — the reference's implicit init
distributions as a shipped option (VERDICT r3 item 3; ref
train_with_env.py:39-55,58-166 via the torch module defaults)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from doodle_tpu.models import PolicyNet, torch_default_init
from doodle_tpu.train.trainer import TrainConfig, _apply_param_init


def _init_params(residual_head=False):
    policy = PolicyNet(
        num_heliostats=8, architecture="lstm", dropout=0.0,
        residual_head=residual_head,
    )
    img = jnp.zeros((1, 2, 16, 16))
    aux = jnp.zeros((1, 3 + 8 * 3))
    return policy.init(
        jax.random.PRNGKey(0), img, aux, policy.init_carry(1)
    )


def _leaves_by_path(params):
    return {
        "/".join(str(getattr(p, "key", p)) for p in path): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    }


def test_torch_init_distributions():
    params = _init_params()
    out = torch_default_init(params, jax.random.PRNGKey(7))
    leaves = _leaves_by_path(out)
    for path, leaf in leaves.items():
        if "LayerNorm" in path:
            ref = _leaves_by_path(params)[path]
            np.testing.assert_array_equal(leaf, ref)  # untouched
            continue
        if "OptimizedLSTMCell" in path:
            bound = 1.0 / np.sqrt(leaf.shape[-1])
        elif path.endswith("kernel"):
            bound = 1.0 / np.sqrt(np.prod(leaf.shape[:-1]))
        elif path.endswith("bias"):
            # torch bias bound = sibling kernel's fan_in
            kern = _leaves_by_path(out)[path[: -len("bias")] + "kernel"]
            bound = 1.0 / np.sqrt(np.prod(kern.shape[:-1]))
        else:
            continue
        assert np.max(np.abs(leaf)) <= bound + 1e-7, path
        # Uniform over ±bound: nonzero and actually spread (flax biases are
        # exactly zero — the whole point of the option).
        assert np.count_nonzero(leaf) == leaf.size, path
        if leaf.size >= 32:
            assert np.max(np.abs(leaf)) > 0.5 * bound, path


def test_torch_init_deterministic_in_key():
    params = _init_params()
    a = torch_default_init(params, jax.random.PRNGKey(1))
    b = torch_default_init(params, jax.random.PRNGKey(1))
    c = torch_default_init(params, jax.random.PRNGKey(2))
    ja, jb, jc = (jax.tree.leaves(t) for t in (a, b, c))
    assert all(np.array_equal(x, y) for x, y in zip(ja, jb))
    assert any(not np.array_equal(x, y) for x, y in zip(ja, jc))


def test_param_init_config_wiring_and_zero_head():
    params = _init_params(residual_head=True)
    cfg = TrainConfig(param_init="torch", residual_head=True)
    out = _apply_param_init(cfg, params, jax.random.PRNGKey(3))
    leaves = _leaves_by_path(out)
    # The residual head's start-exactly-aligned contract: Dense_1 untouched.
    d1 = [v for k, v in leaves.items() if "Dense_1" in k and k.endswith("kernel")]
    assert d1 and np.all(d1[0] == 0.0)
    # ...while everything else was resampled (biases nonzero).
    d0_bias = [v for k, v in leaves.items()
               if "Dense_0" in k and k.endswith("bias")]
    assert d0_bias and np.count_nonzero(d0_bias[0]) == d0_bias[0].size

    assert _apply_param_init(
        TrainConfig(param_init="flax"), params, jax.random.PRNGKey(3)
    ) is params
    with pytest.raises(ValueError):
        _apply_param_init(
            TrainConfig(param_init="bogus"), params, jax.random.PRNGKey(3)
        )
