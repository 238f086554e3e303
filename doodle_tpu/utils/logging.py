"""Metric writers with a common SummaryWriter-flavored surface.

The reference's ``MLflowWriter`` (``mlflow_logger.py:7-93``) presents
TensorBoard's ``add_scalar``/``add_images``/``log_artifact`` API over MLflow.
Here the same protocol has three interchangeable backends:

* :class:`JsonlWriter`       — dependency-free, one JSON line per event
  (the always-available default; trivially greppable/plottable);
* :class:`TensorBoardWriter` — ``torch.utils.tensorboard`` when available;
* :class:`MLflowWriter`      — the reference's backend, import-gated;
* :class:`MLflowFileStoreWriter` — dependency-free writer emitting the
  MLflow *file-store* on-disk layout (``mlruns/<exp>/<run>/metrics/…``),
  so runs are browsable with ``mlflow ui`` on any machine that has mlflow
  — without requiring the package here.

:class:`MultiWriter` fans out to several.
"""

from __future__ import annotations

import json
import pathlib
import time
import uuid
from typing import Any

import numpy as np

__all__ = [
    "JsonlWriter",
    "TensorBoardWriter",
    "MLflowWriter",
    "MLflowFileStoreWriter",
    "MultiWriter",
]


class JsonlWriter:
    """Append metric events to ``<logdir>/metrics.jsonl``; images go to
    ``<logdir>/images/`` as .npy."""

    def __init__(self, logdir: str, params: dict[str, Any] | None = None) -> None:
        self.dir = pathlib.Path(logdir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._f = open(self.dir / "metrics.jsonl", "a")
        if params:
            json.dump({"event": "params", "params": params}, self._f)
            self._f.write("\n")

    def log_params(self, params: dict[str, Any]) -> None:
        json.dump(
            {"event": "params", "params": params}, self._f, default=str
        )
        self._f.write("\n")

    def add_scalar(self, tag: str, value, step: int) -> None:
        json.dump(
            {"event": "scalar", "tag": tag, "value": float(value),
             "step": int(step), "ts": time.time()},
            self._f,
        )
        self._f.write("\n")

    def add_images(self, tag: str, img_tensor, global_step: int,
                   dataformats: str = "NCHW") -> None:
        imgs = np.asarray(img_tensor)
        out = self.dir / "images"
        out.mkdir(exist_ok=True)
        safe = tag.replace("/", "_")
        np.save(out / f"{safe}_{global_step}.npy", imgs)

    def log_artifact(self, path: str) -> None:
        json.dump({"event": "artifact", "path": str(path)}, self._f)
        self._f.write("\n")

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        self._f.close()


class TensorBoardWriter:
    """Thin pass-through to ``torch.utils.tensorboard.SummaryWriter`` (the
    backend of the reference's older generations,
    ``newenv/train_agent_multi_error_seq.py:253``)."""

    def __init__(self, logdir: str, params: dict[str, Any] | None = None) -> None:
        from torch.utils.tensorboard import SummaryWriter

        self._w = SummaryWriter(logdir)
        if params:
            self._w.add_text("params", json.dumps(params, default=str))

    def log_params(self, params):
        self._w.add_text("params", json.dumps(params, default=str))

    def add_scalar(self, tag, value, step):
        self._w.add_scalar(tag, float(value), step)

    def add_images(self, tag, img_tensor, global_step, dataformats="NCHW"):
        import torch

        self._w.add_images(
            tag, torch.as_tensor(np.asarray(img_tensor)), global_step,
            dataformats=dataformats,
        )

    def log_artifact(self, path):
        pass

    def flush(self):
        self._w.flush()

    def close(self):
        self._w.close()


class MLflowWriter:
    """SummaryWriter-shaped MLflow logger (parity: ``mlflow_logger.py:7-93``):
    scalars → ``log_metric``, image batches (≤16, clipped to [0,1]) →
    ``log_image`` artifacts. Requires the ``mlflow`` package."""

    def __init__(
        self,
        experiment_id: str | None = None,
        run_name: str | None = None,
        params: dict[str, Any] | None = None,
        tracking_uri: str | None = None,
    ) -> None:
        import mlflow  # gated: not part of the base image

        self._mlflow = mlflow
        if tracking_uri:
            mlflow.set_tracking_uri(tracking_uri)
        self._run = mlflow.start_run(
            experiment_id=experiment_id, run_name=run_name
        )
        if params:
            self.log_params(params)

    def log_params(self, params):
        self._mlflow.log_params(
            {k: str(v)[:500] for k, v in params.items()}
        )

    def add_scalar(self, tag, value, step):
        self._mlflow.log_metric(tag.replace("/", "."), float(value), step=step)

    def add_images(self, tag, img_tensor, global_step, dataformats="NCHW"):
        imgs = np.asarray(img_tensor)
        if dataformats == "NCHW":
            imgs = imgs.transpose(0, 2, 3, 1)
        imgs = np.clip(imgs, 0.0, 1.0)[:16]
        for i, im in enumerate(imgs):
            self._mlflow.log_image(
                im.squeeze(), f"{tag.replace('/', '_')}/{global_step}_{i}.png"
            )

    def log_artifact(self, path):
        self._mlflow.log_artifact(path)

    def flush(self):
        pass

    def close(self):
        self._mlflow.end_run()


class MLflowFileStoreWriter:
    """MLflow logging without the mlflow package: writes the FileStore
    on-disk contract directly.

    Layout (what ``mlflow.set_tracking_uri("file:<root>")`` produces):

    * ``<root>/<experiment_id>/meta.yaml`` — experiment metadata
    * ``<root>/<experiment_id>/<run_id>/meta.yaml`` — run metadata
    * ``.../params/<name>`` — one file per param, the value as text
    * ``.../metrics/<name>`` — one line per point: ``<ts_ms> <value> <step>``
    * ``.../artifacts/`` — artifact files (images go here as .npy)
    * ``.../tags/mlflow.runName`` — run name

    The reference logs to a live MLflow server (``mlflow_logger.py:17``,
    tracking URI "databricks"); this backend keeps the same writer surface
    and produces a store ``mlflow ui`` can open, with zero dependencies —
    the right trade for an air-gapped TPU pod. Metric tags are namespaced
    with "." like the reference's shim ("/" is illegal in file names).
    """

    def __init__(
        self,
        root: str = "mlruns",
        experiment_name: str = "doodle_tpu",
        run_name: str | None = None,
        params: dict[str, Any] | None = None,
    ) -> None:
        self.root = pathlib.Path(root)
        self.experiment_id = "0"
        exp_dir = self.root / self.experiment_id
        exp_dir.mkdir(parents=True, exist_ok=True)
        if not (exp_dir / "meta.yaml").exists():
            (exp_dir / "meta.yaml").write_text(
                f"artifact_location: {exp_dir.resolve()}\n"
                f"experiment_id: '{self.experiment_id}'\n"
                f"lifecycle_stage: active\n"
                f"name: {experiment_name}\n"
            )
        self.run_id = uuid.uuid4().hex
        self.run_dir = exp_dir / self.run_id
        for sub in ("params", "metrics", "artifacts", "tags"):
            (self.run_dir / sub).mkdir(parents=True, exist_ok=True)
        start_ms = int(time.time() * 1000)
        (self.run_dir / "meta.yaml").write_text(
            f"artifact_uri: {(self.run_dir / 'artifacts').resolve()}\n"
            f"end_time: null\n"
            f"experiment_id: '{self.experiment_id}'\n"
            f"lifecycle_stage: active\n"
            f"run_id: {self.run_id}\n"
            f"run_name: {run_name or self.run_id[:8]}\n"
            f"run_uuid: {self.run_id}\n"
            f"start_time: {start_ms}\n"
            f"status: 1\n"
            f"user_id: doodle_tpu\n"
        )
        (self.run_dir / "tags" / "mlflow.runName").write_text(
            run_name or self.run_id[:8]
        )
        if params:
            self.log_params(params)

    @staticmethod
    def _safe(tag: str) -> str:
        return tag.replace("/", ".")

    def log_params(self, params: dict[str, Any]) -> None:
        for k, v in params.items():
            (self.run_dir / "params" / self._safe(str(k))).write_text(
                str(v)[:500]
            )

    def add_scalar(self, tag: str, value, step: int) -> None:
        with open(self.run_dir / "metrics" / self._safe(tag), "a") as f:
            f.write(f"{int(time.time() * 1000)} {float(value)} {int(step)}\n")

    def add_images(self, tag, img_tensor, global_step, dataformats="NCHW"):
        imgs = np.asarray(img_tensor)
        if dataformats == "NCHW":
            imgs = imgs.transpose(0, 2, 3, 1)
        imgs = np.clip(imgs, 0.0, 1.0)[:16]  # ref shim contract (:51-78)
        out = self.run_dir / "artifacts" / self._safe(tag)
        out.mkdir(parents=True, exist_ok=True)
        np.save(out / f"{global_step}.npy", imgs)

    def log_artifact(self, path: str) -> None:
        import shutil

        src = pathlib.Path(path)
        dst = self.run_dir / "artifacts" / src.name
        if src.is_dir():
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copy2(src, dst)

    def flush(self) -> None:
        pass

    def close(self) -> None:
        meta = self.run_dir / "meta.yaml"
        text = meta.read_text().replace(
            "end_time: null", f"end_time: {int(time.time() * 1000)}"
        ).replace("status: 1", "status: 3")  # FINISHED
        meta.write_text(text)

    # ------------------------------------------------------- read-back
    def read_metric(self, tag: str) -> list[tuple[int, float, int]]:
        """Parse a metric file back to [(ts_ms, value, step), ...] — used
        by the round-trip tests and handy for quick host-side analysis."""
        p = self.run_dir / "metrics" / self._safe(tag)
        out = []
        for line in p.read_text().splitlines():
            ts, v, s = line.split()
            out.append((int(ts), float(v), int(s)))
        return out


class MultiWriter:
    """Fan out every call to several writers."""

    def __init__(self, *writers) -> None:
        self.writers = [w for w in writers if w is not None]

    def log_params(self, *a, **kw):
        for w in self.writers:
            if hasattr(w, "log_params"):
                w.log_params(*a, **kw)

    def add_scalar(self, *a, **kw):
        for w in self.writers:
            w.add_scalar(*a, **kw)

    def add_images(self, *a, **kw):
        for w in self.writers:
            if hasattr(w, "add_images"):
                w.add_images(*a, **kw)

    def log_artifact(self, *a, **kw):
        for w in self.writers:
            if hasattr(w, "log_artifact"):
                w.log_artifact(*a, **kw)

    def flush(self):
        for w in self.writers:
            w.flush()

    def close(self):
        for w in self.writers:
            w.close()
