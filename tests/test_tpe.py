"""Built-in TPE engine (hpo/tpe.py) + optuna_minimize fallback wiring.

The reference's TPE studies (newenv/optuna_run.py, optuna_env.py,
bayesian_optimization.py) run on optuna; this image has no optuna, so the
capability lives in the vendored engine. These tests pin: optimization
quality (beats random, converges on a quadratic), journal-storage resume,
MedianPruner semantics, CSV export, and the optuna_minimize semantics
(constraint/crash/NaN → pruned trials, not study failures).
"""

import math

import pytest

from doodle_tpu.hpo import tpe
from doodle_tpu.hpo.optuna_search import (
    make_optuna_pruning_callback,
    optuna_minimize,
)

SPACE = {
    "x": {"low": -2.0, "high": 2.0},
    "y": {"low": -2.0, "high": 2.0},
    "lr": {"low": 1e-5, "high": 1e-1, "log": True},
    "arch": {"choices": ["mlp", "lstm", "transformer"]},
}


def _obj(p):
    return (
        (p["x"] - 0.3) ** 2
        + (p["x"] - p["y"]) ** 2
        + 0.1 * (math.log10(p["lr"]) + 3) ** 2
        + (0.0 if p["arch"] == "lstm" else 0.25)
    )


def test_tpe_converges_quadratic_1d():
    st = tpe.create_study(sampler=tpe.TPESampler(seed=4))
    st.optimize(
        lambda t: (t.suggest_float("x", -2, 2) - 0.3) ** 2,
        n_trials=40,
        space={"x": {"low": -2.0, "high": 2.0}},
    )
    assert st.best_value < 0.05
    assert abs(st.best_params["x"] - 0.3) < 0.25


def test_tpe_beats_random_on_average():
    tpe_best, rnd_best = [], []
    for seed in range(6):
        _, bv, _ = optuna_minimize(_obj, SPACE, n_trials=50, seed=seed)
        tpe_best.append(bv)
        # n_startup_trials=inf → the sampler never leaves random search
        rnd = tpe.Study(
            sampler=tpe.TPESampler(seed=seed + 100, n_startup_trials=10**9)
        )
        rnd.optimize(
            lambda t: _obj({
                "x": t.suggest_float("x", -2, 2),
                "y": t.suggest_float("y", -2, 2),
                "lr": t.suggest_float("lr", 1e-5, 1e-1, log=True),
                "arch": t.suggest_categorical(
                    "arch", ["mlp", "lstm", "transformer"]
                ),
            }),
            n_trials=50,
            space=SPACE,
        )
        rnd_best.append(rnd.best_value)
    assert sum(tpe_best) / len(tpe_best) < sum(rnd_best) / len(rnd_best)


def test_int_and_log_params_respect_bounds():
    st = tpe.create_study(sampler=tpe.TPESampler(seed=0, n_startup_trials=3))

    def obj(t):
        n = t.suggest_int("n", 2, 64, log=True)
        lr = t.suggest_float("lr", 1e-6, 1e-2, log=True)
        assert 2 <= n <= 64 and isinstance(n, int)
        assert 1e-6 <= lr <= 1e-2
        return abs(n - 16) + abs(math.log10(lr) + 4)

    st.optimize(obj, n_trials=30, space={
        "n": {"low": 2, "high": 64, "int": True, "log": True},
        "lr": {"low": 1e-6, "high": 1e-2, "log": True},
    })
    assert st.best_value < 20


def test_storage_resume(tmp_path):
    j = tmp_path / "study.jsonl"
    _, bv1, s1 = optuna_minimize(
        _obj, SPACE, n_trials=15, storage=str(j), seed=0
    )
    assert len(s1.trials) == 15
    _, bv2, s2 = optuna_minimize(
        _obj, SPACE, n_trials=15, storage=str(j), seed=0
    )
    assert len(s2.trials) == 30          # journal replayed + extended
    assert bv2 <= bv1                    # monotone best over the union


def test_sqlite_url_mapped_to_journal(tmp_path):
    url = f"sqlite:///{tmp_path}/opt.db"
    optuna_minimize(_obj, SPACE, n_trials=5, storage=url, seed=0)
    assert (tmp_path / "opt.db.journal.jsonl").exists()


def test_fresh_storage_requires_load_if_exists(tmp_path):
    j = tmp_path / "s.jsonl"
    j.write_text("")
    # create_study mirrors optuna: existing storage without load_if_exists
    # is an error, not silent reuse. (write_text makes the file exist but
    # empty — still an existing journal.)
    with pytest.raises(FileExistsError):
        tpe.create_study(storage=str(j), load_if_exists=False)


def test_median_pruner_prunes_bad_trials():
    st = tpe.create_study(
        sampler=tpe.TPESampler(seed=0),
        pruner=tpe.MedianPruner(n_startup_trials=2),
    )

    def obj(t):
        x = t.suggest_float("x", 0.0, 1.0)
        for step in range(5):
            t.report(x * (step + 1), step)
            if t.should_prune():
                raise tpe.TrialPruned()
        return x

    st.optimize(obj, n_trials=25, space={"x": {"low": 0.0, "high": 1.0}})
    states = [t.state for t in st.trials]
    assert states.count("PRUNED") > 0
    assert states.count("COMPLETE") >= 2
    # pruned trials carry their intermediate history
    pruned = [t for t in st.trials if t.state == "PRUNED"]
    assert all(t.intermediate for t in pruned)


def test_pruning_callback_adapter():
    """make_optuna_pruning_callback works against the built-in Trial."""
    st = tpe.create_study(
        sampler=tpe.TPESampler(seed=0),
        pruner=tpe.MedianPruner(n_startup_trials=0),
    )
    # Seed two completed trials with good (low) intermediate values.
    for v in (0.1, 0.2):
        t = st.ask()
        t.params["x"] = v
        t.report(v, 0)
        st.tell(t, v, "COMPLETE")
    t = st.ask()
    cb = make_optuna_pruning_callback(t)
    assert cb(0, 5.0) is True            # far above the median → prune
    t2 = st.ask()
    assert make_optuna_pruning_callback(t2)(0, 0.01) is False


def test_optuna_minimize_semantics():
    calls = {"n": 0}

    def obj(p):
        calls["n"] += 1
        if p["x"] < -1.5:
            raise RuntimeError("boom")       # crash → PRUNED, study continues
        if p["x"] > 1.5:
            return float("nan")              # NaN → PRUNED
        return p["x"] ** 2

    bp, bv, study = optuna_minimize(
        obj, {"x": {"low": -2.0, "high": 2.0}}, n_trials=40, seed=1,
        constraint=lambda p: p["x"] != 0.12345,
    )
    states = {t.state for t in study.trials}
    assert "COMPLETE" in states
    assert bv >= 0 and abs(bp["x"]) < 1.0
    assert len(study.trials) == 40


def test_trials_csv(tmp_path):
    _, _, study = optuna_minimize(_obj, SPACE, n_trials=8, seed=0,
                                  csv_out=str(tmp_path / "hist.csv"))
    lines = (tmp_path / "hist.csv").read_text().splitlines()
    assert lines[0].startswith("number,state,value")
    assert len(lines) == 9
