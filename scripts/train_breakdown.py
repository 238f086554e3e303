"""Where does the config-4 TRAIN step's 0.71 s go? Slope-timed nested
slices on TPU: policy fwd, policy fwd+bwd, rollout fwd, rollout fwd+bwd,
full train step (grad+AdamP). Mirrors train.trainer's jitted step at
N=500 / 256² / B=64 / k=2 / T=4 / LSTM / bf16 encoder / worst-k% mask."""
import sys, time
sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np
import optax

from bench import _setup
from doodle_tpu.models.policy import PolicyNet
from doodle_tpu.optim import adamp
from doodle_tpu.train.rollout import rollout

N, RES, B, K, T = 500, 256, 64, 2, 4
scene, cfg, state = _setup(N, RES, B, True)
policy = PolicyNet(num_heliostats=N, architecture="lstm", dropout=0.1,
                   encoder_dtype="bfloat16")
key = jax.random.PRNGKey(0)
img = jnp.zeros((B, K, RES, RES))
aux = jnp.zeros((B, 3 + N * 3))
params = policy.init(key, img[:1], aux[:1], policy.init_carry(1))
opt = optax.chain(optax.clip_by_global_norm(1e-7),
                  adamp(5e-4, weight_decay=1e-5))
opt_state = opt.init(params)
weights = jnp.array([100.0, 0.0, 1.0, 1e4])


def timed(fn, *xs, tries=4):
    np.asarray(jax.tree.leaves(fn(*xs))[0])
    best = float("inf")
    for _ in range(tries):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(fn(*xs))[0])
        best = min(best, time.perf_counter() - t0)
    return best


def slope(make_loop, r1, r2):
    k1 = jax.random.split(jax.random.PRNGKey(1), r1)
    k2 = jax.random.split(jax.random.PRNGKey(1), r2)
    t1, t2 = timed(make_loop(), k1), timed(make_loop(), k2)
    return (t2 - t1) / (r2 - r1) * 1e3, t1, t2


def report(name, make_loop, r1, r2):
    ms, t1, t2 = slope(make_loop, r1, r2)
    print(f"{name:24s}: {ms:8.3f} ms/rep  raw=({t1:.2f}s, {t2:.2f}s)",
          flush=True)


# 1. policy forward (B*K frames through CNN + LSTM + head), dropout on
def mk_pf():
    @jax.jit
    def loop(keys):
        def body(acc, kk):
            a, _ = policy.apply(params, img, aux, policy.init_carry(B),
                                deterministic=False, rngs={"dropout": kk})
            return acc + a.sum(), None
        return jax.lax.scan(body, 0.0, keys)[0]
    return loop


# 2. policy fwd+bwd
def mk_pg():
    @jax.jit
    def loop(keys):
        def body(acc, kk):
            def f(p):
                a, _ = policy.apply(p, img, aux, policy.init_carry(B),
                                    deterministic=False, rngs={"dropout": kk})
                return a.sum()
            g = jax.grad(f)(params)
            return acc + jax.tree.leaves(g)[0].sum(), None
        return jax.lax.scan(body, 0.0, keys)[0]
    return loop


# 3. rollout forward only (T env steps + T policy applies, remat'd scan);
#    once=True caches per-frame encodings (k× fewer CNN FLOPs), once=False
#    is the reference re-encoding schedule.
def mk_rf(once):
    @jax.jit
    def loop(keys):
        def body(acc, kk):
            r = rollout(policy, params, scene, cfg, state, kk, k=K, T=T,
                        deterministic=False, encode_once=once)
            return acc + r.losses["mse"], None
        return jax.lax.scan(body, 0.0, keys)[0]
    return loop


# 4. rollout fwd+bwd (the trainer's loss_fn gradient)
def loss_fn(p, kk, once):
    r = rollout(policy, p, scene, cfg, state, kk, k=K, T=T,
                deterministic=False, encode_once=once)
    terms = jnp.stack([r.losses["alignment_loss"], r.losses["bound"],
                       r.losses["mse"], r.losses["dist"]])
    return jnp.sum(jnp.where(weights != 0, weights * terms, 0.0))


def mk_rg(once):
    @jax.jit
    def loop(keys):
        def body(acc, kk):
            g = jax.grad(loss_fn)(params, kk, once)
            return acc + jax.tree.leaves(g)[0].sum(), None
        return jax.lax.scan(body, 0.0, keys)[0]
    return loop


# 5. full train step (grad + clip + AdamP), params threaded through reps
def mk_ts(once):
    @jax.jit
    def loop(keys):
        def body(carry, kk):
            p, os_ = carry
            loss, g = jax.value_and_grad(loss_fn)(p, kk, once)
            up, os_ = opt.update(g, os_, p)
            return (optax.apply_updates(p, up), os_), loss
        (p, _), losses = jax.lax.scan(body, (params, opt_state), keys)
        return losses.sum() + jax.tree.leaves(p)[0].sum()
    return loop


import functools

report("policy fwd", mk_pf, 10, 60)
report("policy fwd+bwd", mk_pg, 10, 60)
report("rollout fwd reencode", functools.partial(mk_rf, False), 5, 30)
report("rollout fwd enc-once", functools.partial(mk_rf, True), 5, 30)
report("rollout bwd reencode", functools.partial(mk_rg, False), 3, 15)
report("rollout bwd enc-once", functools.partial(mk_rg, True), 3, 15)
report("train step reencode", functools.partial(mk_ts, False), 3, 15)
report("train step enc-once", functools.partial(mk_ts, True), 3, 15)
