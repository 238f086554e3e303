"""doodle_tpu — a TPU-native differentiable heliostat-field optics + RL framework.

A from-scratch JAX/XLA re-design of the capabilities of l3th4l/DOODLE
(differentiable ray-tracing simulator for concentrated-solar-power heliostat
fields, Gym-style environment, policy training loops, HPO/sweep orchestration).

Design stance (vs. the PyTorch reference):
  * the optics core is a set of pure, jit/vmap-able functions over pytrees —
    no hidden RNG state; every stochastic quantity is keyed by an explicit
    ``jax.random.PRNGKey``;
  * the hot kernel (Gaussian flux splatting, reference
    ``newenv_rl_test_multi_error.py:107-149``) is reformulated as a separable
    outer-product: two O(B*N*res) exp tables contracted by a batched
    [res, N] @ [N, res] matmul on the MXU, instead of the reference's
    O(B*N*res^2) elementwise exp with a [B*N, res, res] intermediate;
  * rollouts are ``lax.scan`` loops, training steps are single jitted
    functions, and scaling is expressed as a ``jax.sharding.Mesh`` over the
    env batch axis with XLA collectives — not host-side process parallelism.

Subpackages:
  ops       low-level optics kernels (reflect/intersect/rotate/splat/EDT)
  core      scene description + field renderer
  env       HelioEnv (losses, sun sampling, reset/step as pure functions)
  models    policy networks (CNN/CoM encoders; MLP/LSTM/Transformer heads)
  train     rollout + trainers (standard and TTT/fine-adjustment variants)
  optim     optimizers (AdamP, SmoothedAdam, DominantAdam) and LR schedules
  parallel  device-mesh utilities and sharded train steps
  utils     logging/plotting/profiling/NaN-guard helpers
  hpo       sweep runner + hyper-parameter search drivers
"""

__version__ = "0.1.0"

# Persistent compilation cache: the big jitted programs (train steps with
# vmap+scan+remat) take minutes to compile on the remote TPU compile path;
# caching makes every repeat run (benchmarks, resumed experiments, sweeps)
# start in seconds. Opt out by setting JAX_COMPILATION_CACHE_DIR="".
import os as _os

if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    import jax as _jax

    # Only for accelerator backends: CPU AOT cache entries encode host CPU
    # features and can SIGILL when replayed on a host with different
    # features (observed with this image's XLA:CPU), and CPU compiles are
    # fast anyway.
    _plat = (
        _jax.config.jax_platforms or _os.environ.get("JAX_PLATFORMS") or ""
    )
    if "cpu" not in _plat.lower():
        try:
            _jax.config.update(
                "jax_compilation_cache_dir",
                _os.path.expanduser("~/.cache/doodle_tpu_xla"),
            )
            _jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 5.0
            )
        except Exception:  # pragma: no cover - older jax without the flags
            pass

from . import core, env, hpo, models, ops, optim, parallel, train, utils  # noqa: F401
