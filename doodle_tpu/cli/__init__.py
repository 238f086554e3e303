"""Command-line entry points.

``python -m doodle_tpu.cli.train``      — standard trainer (parity:
``train_with_env.py`` CLI, ``:504-567``).
``python -m doodle_tpu.cli.train_ttt``  — TTT trainer (parity:
``train_with_env_com_trunc_advantage_ttt.py:787-862``).
``python -m doodle_tpu.cli.sweep``      — property sweeps with lock-file
resume (parity: ``run_experiments.py``).
``python -m doodle_tpu.cli.search``     — hyper-parameter search (random /
grid / optuna when installed; parity: ``newenv/optuna_run.py`` family).

All trainers accept ``--metrics_out <path>`` and write
``{"objective": <best test mse>}`` — the subprocess-HPO contract
(``newenv/run_optuna_experiments.py:43-73``).
"""
