"""CLI + checkpoint tests: arg parsing, metrics_out contract, tiny in-process
train run via the CLI, trainer checkpoint/resume."""

import dataclasses
import json

import numpy as np
import pytest

from doodle_tpu.cli import train as cli_train
from doodle_tpu.cli._common import add_dataclass_args, config_from_args
from doodle_tpu.train import TrainConfig, train_and_eval


def test_parser_covers_reference_flags():
    p = cli_train.build_parser()
    args = p.parse_args([
        "--num_heliostats", "5", "--steps", "2", "--T", "2", "--k", "2",
        "--architecture", "mlp", "--scheduler", "cyclic",
        "--use_error_mask", "true", "--error_mask_ratio", "0.3",
        "--grad_clip", "1e-7", "--azimuth", "none",
        "--optimizer", "dominant_adam", "--smooth_samples", "3",
    ])
    cfg = config_from_args(args, TrainConfig)
    assert cfg.num_heliostats == 5
    assert cfg.architecture == "mlp"
    assert cfg.use_error_mask is True
    assert cfg.error_mask_ratio == 0.3
    assert cfg.azimuth is None
    assert cfg.optimizer == "dominant_adam"
    assert cfg.smooth_samples == 3


def test_bool_flag_false_strings():
    p = cli_train.build_parser()
    args = p.parse_args(["--use_error_mask", "false"])
    assert args.use_error_mask is False


def test_string_field_with_none_default_survives_parsing():
    """argparse re-parses STRING defaults through `type`; a plain string
    field whose default is the literal "none" (TTTConfig.remat_save) must
    NOT silently become None (r5 regression, caught by a TPU CLI drive).
    Optional fields keep the none→None mapping."""
    from doodle_tpu.cli.train_ttt import build_parser
    from doodle_tpu.train import TTTConfig

    args = build_parser().parse_args([])
    assert args.remat_save == "none"
    cfg = config_from_args(args, TTTConfig)
    assert cfg.remat_save == "none"            # string, not None
    a2 = build_parser().parse_args(
        ["--remat_save", "convs", "--checkpoint_dir", "none"])
    assert a2.remat_save == "convs" and a2.checkpoint_dir is None


def test_cli_train_tiny_and_metrics_out(tmp_path):
    out = tmp_path / "m.json"
    best = cli_train.main([
        "--num_heliostats", "4", "--batch_size", "3", "--steps", "2",
        "--T", "2", "--k", "2", "--resolution", "16",
        "--sigma_scale", "0.1", "--error_scale_mrad", "30",
        "--alignment_pretrain_steps", "1", "--warmup_steps", "0",
        "--grad_clip", "1.0", "--scheduler", "none",
        "--eval_every", "2", "--log_every", "100", "--test_size", "3",
        "--dropout", "0.0",
        "--metrics_out", str(out),
        "--logdir", str(tmp_path / "logs"),
    ])
    assert np.isfinite(best)
    assert json.loads(out.read_text())["objective"] == pytest.approx(best)
    assert (tmp_path / "logs" / "metrics.jsonl").exists()


def test_checkpoint_resume(tmp_path):
    base = dict(
        num_heliostats=4, batch_size=3, steps=2, T=2, k=2, resolution=16,
        sigma_scale=0.1, error_scale_mrad=30.0,
        alignment_pretrain_steps=0, warmup_steps=0,
        lr=1e-3, grad_clip=1.0, scheduler="none", eval_every=2,
        log_every=100, test_size=3, dropout=0.0,
        checkpoint_dir=str(tmp_path / "ck"), checkpoint_every=2,
    )
    steps_seen = []
    train_and_eval(TrainConfig(**base),
                   progress_cb=lambda i, m: steps_seen.append(i))
    assert steps_seen == [0, 1]
    assert (tmp_path / "ck" / "latest").exists()

    # Extend the run: resume restarts after the last checkpointed step.
    steps_resumed = []
    train_and_eval(TrainConfig(**{**base, "steps": 4}),
                   progress_cb=lambda i, m: steps_resumed.append(i))
    assert steps_resumed[0] == 2
    assert steps_resumed[-1] == 3


def test_multihost_requested_but_absent_raises():
    """--multihost true with no detectable cluster must fail loudly, not
    silently run single-process (ADVICE r2)."""
    import argparse

    from doodle_tpu.cli._common import apply_multihost

    args = argparse.Namespace(
        multihost=True, coordinator_address=None,
        num_processes=None, process_id=None,
    )
    with pytest.raises(RuntimeError, match="no cluster"):
        apply_multihost(args)


def test_ensure_pod_data_parallel(monkeypatch):
    """Single process: cfg unchanged. Multi-process: data_parallel forced
    on (ADVICE r2 medium — redundant unsharded pods)."""
    import jax

    from doodle_tpu.cli._common import ensure_pod_data_parallel

    cfg = TrainConfig(data_parallel=False)
    assert ensure_pod_data_parallel(cfg) is cfg  # 1 process: untouched

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    forced = ensure_pod_data_parallel(cfg)
    assert forced.data_parallel is True
    # already-on config passes through
    cfg_on = TrainConfig(data_parallel=True)
    assert ensure_pod_data_parallel(cfg_on) is cfg_on


def test_make_writer_non_primary_returns_none(monkeypatch, tmp_path):
    """Non-primary hosts must not open shared log files (ADVICE r2)."""
    import argparse

    from doodle_tpu.cli import _common
    from doodle_tpu.parallel import launch

    args = argparse.Namespace(logdir=str(tmp_path / "logs"), tensorboard=False)
    assert _common.make_writer(args) is not None  # primary: real writer

    monkeypatch.setattr(launch, "is_primary_host", lambda: False)
    assert _common.make_writer(args) is None
