"""Support layer: logging writers, 3-D diagnostics, NaN guards, profiling,
checkpointing.

Parity targets: ``mlflow_logger.py`` (MLflow SummaryWriter shim),
``plotting_utils.py`` (Plotly 3-D scatter HTML dumps), the NaN hook mesh of
``train_with_env.py:27-36,284-291``, and — new capabilities per SURVEY §5 —
``jax.profiler`` tracing and orbax checkpoint/resume.
"""

from .checkpoint import restore_checkpoint, save_checkpoint
from .logging import (
    JsonlWriter,
    MLflowFileStoreWriter,
    MLflowWriter,
    MultiWriter,
    TensorBoardWriter,
)
from .nan_guard import check_finite, find_nonfinite
from .plotting import field_scene_html, scatter3d_vectors
from .profiling import StepTimer, trace

__all__ = [
    "JsonlWriter",
    "TensorBoardWriter",
    "MLflowWriter",
    "MLflowFileStoreWriter",
    "MultiWriter",
    "field_scene_html",
    "scatter3d_vectors",
    "check_finite",
    "find_nonfinite",
    "StepTimer",
    "trace",
    "save_checkpoint",
    "restore_checkpoint",
]
