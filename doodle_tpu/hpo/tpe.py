"""Built-in TPE (Tree-structured Parzen Estimator) study engine.

The reference's primary HPO entry is an Optuna TPE study with storage-based
resume and median pruning (``newenv/optuna_run.py:8-102``,
``newenv/optuna_env.py:33-152``, ``newenv/bayesian_optimization.py:48-153``).
Optuna is not installed in this image, so the capability is provided by
this self-contained engine implementing the published TPE algorithm
(Bergstra, Bardenet, Bengio & Kégl, "Algorithms for Hyper-Parameter
Optimization", NeurIPS 2011) with an optuna-shaped API surface:
``create_study`` / ``Trial.suggest_*`` / ``trial.report`` +
``should_prune`` / ``TrialPruned`` / journal-file storage with
``load_if_exists`` resume / CSV trial-history export. When optuna *is*
available, :mod:`doodle_tpu.hpo.optuna_search` uses it and this module is
dormant — the two are drop-in interchangeable for the schema used there.

Algorithm sketch (minimize):
  * first ``n_startup_trials`` trials sample the space uniformly;
  * afterwards, completed trials are split by objective into the best
    ``γ(n) = ceil(0.25·√n)`` ("good") and the rest ("bad");
  * each numeric parameter gets two Parzen mixtures — Gaussians centered
    at the good/bad observations (in log space for log params) plus one
    wide prior component for exploration; categoricals get smoothed
    category frequencies;
  * ``n_ei_candidates`` candidates are drawn from the good mixture
    *jointly* (one mixture component — i.e. one good trial — per
    candidate, preserving cross-parameter correlation, the effect of
    optuna's multivariate/group TPE) and the candidate maximizing
    ``Σ log l(x)/g(x)`` is proposed.

Pruning: :class:`MedianPruner` — a running trial is stopped at step ``s``
when its intermediate value is worse than the median of completed trials'
values at their last step ≤ ``s`` (optuna's MedianPruner contract), after
``n_startup_trials`` completions and ``n_warmup_steps`` steps.
"""

from __future__ import annotations

import csv
import dataclasses
import json
import math
import pathlib
import random
from typing import Any, Callable, Mapping, Sequence

__all__ = [
    "TrialPruned",
    "FrozenTrial",
    "Trial",
    "TPESampler",
    "MedianPruner",
    "Study",
    "create_study",
]


class TrialPruned(Exception):
    """Raise inside an objective to mark the trial pruned (optuna parity)."""


@dataclasses.dataclass
class FrozenTrial:
    number: int
    state: str                      # COMPLETE | PRUNED | FAIL
    params: dict[str, Any]
    value: float | None
    intermediate: dict[int, float]  # step -> reported value

    @property
    def last_intermediate_at(self) -> Callable[[int], float | None]:
        def f(step: int) -> float | None:
            steps = sorted(s for s in self.intermediate if s <= step)
            return self.intermediate[steps[-1]] if steps else None
        return f


@dataclasses.dataclass(frozen=True)
class _NumSpec:
    low: float
    high: float
    log: bool
    is_int: bool

    def to_u(self, x: float) -> float:
        return math.log(x) if self.log else x

    def from_u(self, u: float) -> float:
        x = math.exp(u) if self.log else u
        lo, hi = self.low, self.high
        x = min(max(x, lo), hi)
        if self.is_int:
            x = int(round(x))
            x = int(min(max(x, lo), hi))
        return x


class MedianPruner:
    """Prune when the intermediate value is worse than the median of
    completed trials at the same point (minimize)."""

    def __init__(self, n_startup_trials: int = 5, n_warmup_steps: int = 0):
        self.n_startup_trials = n_startup_trials
        self.n_warmup_steps = n_warmup_steps

    def should_prune(self, study: "Study", trial: "Trial") -> bool:
        if not trial._intermediate:
            return False
        step = max(trial._intermediate)
        if step < self.n_warmup_steps:
            return False
        done = [t for t in study.trials if t.state == "COMPLETE"]
        if len(done) < self.n_startup_trials:
            return False
        peers = [
            v for v in (t.last_intermediate_at(step) for t in done)
            if v is not None
        ]
        if not peers:
            return False
        peers.sort()
        m = len(peers)
        median = (
            peers[m // 2]
            if m % 2
            else 0.5 * (peers[m // 2 - 1] + peers[m // 2])
        )
        return trial._intermediate[step] > median


class TPESampler:
    def __init__(
        self,
        seed: int = 0,
        n_startup_trials: int = 10,
        n_ei_candidates: int = 24,
        prior_weight: float = 1.0,
    ):
        self.rng = random.Random(seed)
        self.n_startup_trials = n_startup_trials
        self.n_ei_candidates = n_ei_candidates
        self.prior_weight = prior_weight

    # -------------------------------------------------------- internals
    @staticmethod
    def _gamma(n: int) -> int:
        # optuna's default splitting rule: best 10% (capped at 25), ≥1.
        return max(1, min(math.ceil(0.1 * n), 25))

    def _split(self, trials: Sequence[FrozenTrial]):
        done = sorted(
            (t for t in trials if t.state == "COMPLETE" and t.value is not None),
            key=lambda t: t.value,
        )
        g = self._gamma(len(done))
        return done[:g], done[g:]

    @staticmethod
    def _mixture_logpdf(u: float, centers: list[float], bw: float,
                        prior_mu: float, prior_bw: float,
                        prior_weight: float) -> float:
        """log of a Parzen mixture (equal-weight Gaussians + wide prior)."""
        comps = [(c, bw) for c in centers] + [(prior_mu, prior_bw)] * (
            1 if prior_weight > 0 else 0
        )
        w = 1.0 / (len(centers) + prior_weight) if comps else 1.0
        acc = 0.0
        for i, (mu, s) in enumerate(comps):
            wi = w * (prior_weight if i == len(centers) else 1.0)
            z = (u - mu) / s
            acc += wi * math.exp(-0.5 * z * z) / (s * math.sqrt(2 * math.pi))
        return math.log(max(acc, 1e-300))

    def _num_models(self, spec: _NumSpec, good, bad, name):
        ulo, uhi = spec.to_u(spec.low), spec.to_u(spec.high)
        width = max(uhi - ulo, 1e-12)
        prior_mu, prior_bw = 0.5 * (ulo + uhi), width

        def centers(ts):
            return [spec.to_u(t.params[name]) for t in ts if name in t.params]

        cg, cb = centers(good), centers(bad)

        def bandwidth(cs: list[float]) -> float:
            # Scott's rule on the observed spread, floored at
            # width/(1+n) (optuna's magic-clip idea): a tight cluster of
            # few points must not collapse into a density spike that
            # permanently wins the l/g argmax against the (wider) bad
            # mixture at the same location.
            n = len(cs)
            if n < 2:
                return width
            mu = sum(cs) / n
            sd = math.sqrt(sum((c - mu) ** 2 for c in cs) / (n - 1))
            bw = 1.06 * max(sd, 1e-12) * n ** (-0.2)
            return min(max(bw, width / (1 + n)), width)

        return (cg, bandwidth(cg), cb, bandwidth(cb),
                prior_mu, prior_bw, ulo, uhi)

    # ------------------------------------------------------------ public
    def sample(
        self,
        space: Mapping[str, dict],
        trials: Sequence[FrozenTrial],
    ) -> dict[str, Any]:
        """Propose a joint parameter dict for the next trial."""
        done = [t for t in trials if t.state == "COMPLETE"]
        if len(done) < self.n_startup_trials:
            return self._random(space)

        good, bad = self._split(done)
        if not good or not bad:
            return self._random(space)

        best_cand, best_score = None, -math.inf
        for _ in range(self.n_ei_candidates):
            # One good trial = one mixture component per candidate —
            # joint sampling preserves cross-parameter correlation.
            anchor = self.rng.choice(good)
            cand: dict[str, Any] = {}
            score = 0.0
            for name, s in space.items():
                if "choices" in s:
                    choices = list(s["choices"])
                    cg = [t.params[name] for t in good if name in t.params]
                    cb = [t.params[name] for t in bad if name in t.params]

                    def probs(obs):
                        w = {c: 1.0 for c in choices}  # +1 smoothing
                        for o in obs:
                            w[o] = w.get(o, 1.0) + 1.0
                        z = sum(w.values())
                        return {c: w[c] / z for c in choices}

                    pg, pb = probs(cg), probs(cb)
                    if name in anchor.params and self.rng.random() < 0.75:
                        v = anchor.params[name]
                        if v not in choices:
                            v = self.rng.choice(choices)
                    else:
                        r, acc = self.rng.random(), 0.0
                        v = choices[-1]
                        for c in choices:
                            acc += pg[c]
                            if r <= acc:
                                v = c
                                break
                    cand[name] = v
                    score += math.log(pg[v] / max(pb[v], 1e-12))
                else:
                    spec = _NumSpec(
                        float(s["low"]), float(s["high"]),
                        bool(s.get("log", False)), bool(s.get("int", False)),
                    )
                    cg, bw_g, cb, bw_b, pmu, pbw, ulo, uhi = (
                        self._num_models(spec, good, bad, name)
                    )
                    # Sample from the FULL good mixture, prior component
                    # included — without the uniform prior in the sampler
                    # (not just the score) TPE mode-collapses onto its
                    # first decent cluster and never escapes.
                    p_prior = self.prior_weight / (
                        len(cg) + self.prior_weight
                    )
                    if name not in anchor.params or (
                        self.rng.random() < p_prior
                    ):
                        u = self.rng.uniform(ulo, uhi)
                    else:
                        mu = spec.to_u(anchor.params[name])
                        u = self.rng.gauss(mu, bw_g)
                    u = min(max(u, ulo), uhi)
                    x = spec.from_u(u)
                    u = spec.to_u(x)  # score at the clipped/rounded point
                    lg = self._mixture_logpdf(
                        u, cg, bw_g, pmu, pbw, self.prior_weight
                    )
                    lb = self._mixture_logpdf(
                        u, cb, bw_b, pmu, pbw, self.prior_weight
                    )
                    cand[name] = x
                    score += lg - lb
            if score > best_score:
                best_cand, best_score = cand, score
        return best_cand if best_cand is not None else self._random(space)

    def _random(self, space: Mapping[str, dict]) -> dict[str, Any]:
        out: dict[str, Any] = {}
        for name, s in space.items():
            if "choices" in s:
                out[name] = self.rng.choice(list(s["choices"]))
                continue
            spec = _NumSpec(
                float(s["low"]), float(s["high"]),
                bool(s.get("log", False)), bool(s.get("int", False)),
            )
            u = self.rng.uniform(spec.to_u(spec.low), spec.to_u(spec.high))
            out[name] = spec.from_u(u)
        return out


class Trial:
    """Ask-side handle: records suggested params + intermediate reports.

    Under :meth:`Study.optimize` the parameters are pre-sampled jointly by
    the TPE sampler; ``suggest_*`` returns the pre-sampled value and
    records the (name → spec) so resumed studies rebuild the space.
    """

    def __init__(self, study: "Study", number: int,
                 presampled: dict[str, Any]):
        self.study = study
        self.number = number
        self._presampled = presampled
        self.params: dict[str, Any] = {}
        self._intermediate: dict[int, float] = {}

    # ------------------------------------------------------ suggest API
    def _take(self, name: str, fallback: Callable[[], Any]) -> Any:
        v = self._presampled.get(name, None)
        if v is None:
            v = fallback()
        self.params[name] = v
        return v

    def suggest_float(self, name: str, low: float, high: float,
                      log: bool = False) -> float:
        spec = _NumSpec(low, high, log, False)
        rng = self.study.sampler.rng
        return float(self._take(
            name,
            lambda: spec.from_u(rng.uniform(spec.to_u(low), spec.to_u(high))),
        ))

    def suggest_int(self, name: str, low: int, high: int,
                    log: bool = False) -> int:
        spec = _NumSpec(low, high, log, True)
        rng = self.study.sampler.rng
        return int(self._take(
            name,
            lambda: spec.from_u(rng.uniform(spec.to_u(low), spec.to_u(high))),
        ))

    def suggest_categorical(self, name: str, choices: Sequence[Any]) -> Any:
        rng = self.study.sampler.rng
        return self._take(name, lambda: rng.choice(list(choices)))

    # ------------------------------------------------------ pruning API
    def report(self, value: float, step: int) -> None:
        self._intermediate[int(step)] = float(value)

    def should_prune(self) -> bool:
        return self.study.pruner.should_prune(self.study, self)


class Study:
    """Minimization study with journal-file storage.

    ``storage`` is a JSON-lines journal (one FrozenTrial per line); with
    ``load_if_exists`` an existing journal is replayed so the sampler
    resumes from all previously completed trials — the TPU-native
    equivalent of the reference's SQLite ``load_if_exists``
    (``newenv/optuna_run.py:86-93``).
    """

    def __init__(
        self,
        study_name: str = "doodle_tpu",
        storage: str | pathlib.Path | None = None,
        sampler: TPESampler | None = None,
        pruner: MedianPruner | None = None,
    ):
        self.study_name = study_name
        self.sampler = sampler or TPESampler()
        self.pruner = pruner or MedianPruner()
        self.trials: list[FrozenTrial] = []
        self._storage = pathlib.Path(storage) if storage else None

    # ------------------------------------------------------- storage
    def _load(self) -> None:
        if self._storage is None or not self._storage.exists():
            return
        for line in self._storage.read_text().splitlines():
            if not line.strip():
                continue
            d = json.loads(line)
            self.trials.append(FrozenTrial(
                number=d["number"], state=d["state"], params=d["params"],
                value=d["value"],
                intermediate={int(k): v for k, v in d["intermediate"].items()},
            ))

    def _append(self, t: FrozenTrial) -> None:
        if self._storage is None:
            return
        self._storage.parent.mkdir(parents=True, exist_ok=True)
        with open(self._storage, "a") as f:
            f.write(json.dumps({
                "number": t.number, "state": t.state, "params": t.params,
                "value": t.value, "intermediate": t.intermediate,
            }) + "\n")

    # ------------------------------------------------------- ask/tell
    def ask(self, space: Mapping[str, dict] | None = None) -> Trial:
        presampled = (
            self.sampler.sample(space, self.trials) if space else {}
        )
        return Trial(self, len(self.trials), presampled)

    def tell(self, trial: Trial, value: float | None, state: str) -> None:
        ft = FrozenTrial(
            number=trial.number, state=state, params=dict(trial.params),
            value=None if value is None else float(value),
            intermediate=dict(trial._intermediate),
        )
        self.trials.append(ft)
        self._append(ft)

    # ------------------------------------------------------- optimize
    def optimize(
        self,
        objective: Callable[[Trial], float],
        n_trials: int,
        space: Mapping[str, dict] | None = None,
    ) -> None:
        """Run ``n_trials`` objective evaluations.

        ``space`` (the declarative schema of :func:`optuna_minimize`)
        enables joint TPE pre-sampling; without it, ``suggest_*`` falls
        back to independent random draws for unseen names (still valid,
        just not model-guided).
        """
        for _ in range(n_trials):
            t = self.ask(space)
            try:
                v = objective(t)
            except TrialPruned:
                self.tell(t, None, "PRUNED")
                continue
            except Exception:
                self.tell(t, None, "FAIL")
                continue
            if v is None or not math.isfinite(float(v)):
                self.tell(t, None, "PRUNED")
                continue
            self.tell(t, float(v), "COMPLETE")

    # ------------------------------------------------------- results
    @property
    def best_trial(self) -> FrozenTrial:
        done = [t for t in self.trials
                if t.state == "COMPLETE" and t.value is not None]
        if not done:
            raise ValueError("no completed trials")
        return min(done, key=lambda t: t.value)

    @property
    def best_params(self) -> dict[str, Any]:
        return self.best_trial.params

    @property
    def best_value(self) -> float:
        return self.best_trial.value  # type: ignore[return-value]

    def trials_to_csv(self, path: str | pathlib.Path) -> None:
        """Trial-history CSV (the reference exports the same via
        ``study.trials_dataframe().to_csv``, ``newenv/optuna_env.py:146-149``)."""
        names: list[str] = []
        for t in self.trials:
            for k in t.params:
                if k not in names:
                    names.append(k)
        path = pathlib.Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["number", "state", "value", *names, "n_reports"])
            for t in self.trials:
                w.writerow([
                    t.number, t.state,
                    "" if t.value is None else t.value,
                    *[t.params.get(n, "") for n in names],
                    len(t.intermediate),
                ])


def create_study(
    study_name: str = "doodle_tpu",
    storage: str | pathlib.Path | None = None,
    load_if_exists: bool = False,
    direction: str = "minimize",
    sampler: TPESampler | None = None,
    pruner: MedianPruner | None = None,
) -> Study:
    if direction != "minimize":
        raise ValueError("only direction='minimize' is supported")
    study = Study(study_name, storage, sampler, pruner)
    if load_if_exists:
        study._load()
    elif storage is not None and pathlib.Path(storage).exists():
        raise FileExistsError(
            f"study journal {storage} exists; pass load_if_exists=True"
        )
    return study
