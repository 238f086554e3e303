"""Device-mesh scaling: sharded env batches, sharded renders, sharded train steps.

The reference has no distributed backend at all — its only multi-device
mechanism is process-per-GPU HPO (``newenv/run_optuna_experiments.py:88-90``).
The TPU build adds the scaling layer natively (SURVEY §2.10): the env batch
(suns × error-samples) is the data axis, sharded over a ``jax.sharding.Mesh``
with XLA collectives over ICI; the policy is replicated; for very large
fields the heliostat axis can additionally be sharded, turning the splat
reduction into a ``psum``.

Everything here works identically on a real pod slice and on a virtual
``xla_force_host_platform_device_count`` CPU mesh (how CI exercises it).
"""

from .launch import (
    broadcast_from_primary,
    initialize_distributed,
    is_multiprocess,
    is_primary_host,
    sync_hosts,
)
from .audit import (
    annotate_loop_placement,
    collective_summary,
    modeled_efficiency,
    parse_collectives,
)
from .mesh import (
    BATCH_AXIS,
    HELIO_AXIS,
    make_mesh,
    make_multislice_mesh,
    shard_batch,
    shard_env_state,
)
from .render import render_helio_sharded
from .train import make_sharded_train_step, make_sharded_ttt_step

__all__ = [
    "make_mesh",
    "make_multislice_mesh",
    "shard_batch",
    "shard_env_state",
    "BATCH_AXIS",
    "HELIO_AXIS",
    "render_helio_sharded",
    "make_sharded_train_step",
    "make_sharded_ttt_step",
    "parse_collectives",
    "annotate_loop_placement",
    "collective_summary",
    "modeled_efficiency",
    "initialize_distributed",
    "is_multiprocess",
    "is_primary_host",
    "sync_hosts",
    "broadcast_from_primary",
]
