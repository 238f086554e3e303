"""Isolate the config-4 render's cost stages: geometry, splat_params,
pallas splat, xla splat.

Checksums are full-image weighted sums: a sliced checksum (img[0,0,0])
lets XLA slice the *separable* splat down to one factor column before the
contraction — it measured 0.06 ms/rep where the honest full env step via
the XLA splat is 0.37 ms — while the opaque Pallas kernel can't be
sliced, making the XLA path look 4x faster than it is (2026-08-17 run,
see results/RESULTS.md). Geometry-only stages are still
DCE-prone (their checksum can't keep every intermediate live); treat their
numbers as lower bounds and rely on the nested differences instead."""
import sys, functools
sys.path.insert(0, ".")
import numpy as np
import jax, jax.numpy as jnp

from bench import _setup, _make_actions, _timed_fetch
from doodle_tpu.core.field import apply_orientation_errors
from doodle_tpu.ops.optics import normalize, ray_plane_intersect, reflect
from doodle_tpu.ops import splat_pallas as sp
from doodle_tpu.ops.splat import splat_factors, splat_image

N, RES, B = 500, 256, 128
R1, R2 = 50, 400
scene, cfg, state = _setup(N, RES, B, True)
fcfg = cfg.field_config(cfg.error_scale_mrad)
helio = scene.heliostat_pos

def geometry(a):
    actual = apply_orientation_errors(a, state.errors)
    inc = normalize(state.sun_pos[:, None, :] - helio[None])
    refl = normalize(reflect(inc, actual))
    origins = jnp.broadcast_to(helio[None], (B, N, 3))
    inter, valid = ray_plane_intersect(
        origins, refl, scene.target_pos, scene.target_normal
    )
    return inter, origins, valid

def slope(body):
    @jax.jit
    def loop(actions):
        def f(acc, a):
            return acc + body(a), None
        return jax.lax.scan(f, 0.0, actions)[0]
    t = {}
    for reps in (R1, R2):
        actions = jax.jit(_make_actions, static_argnums=1)(
            state, reps, jax.random.PRNGKey(1)
        )
        t[reps] = _timed_fetch(loop, actions)
    return (t[R2] - t[R1]) / (R2 - R1) * 1e3, t

_wmap = jax.random.uniform(jax.random.PRNGKey(7), (128, 500, 3))
_imap = jax.random.uniform(jax.random.PRNGKey(8), (B, RES, RES))

def b_geom(a):
    inter, origins, valid = geometry(a)
    return jnp.vdot(inter, _wmap) + valid.sum()

def b_params(a):
    inter, origins, valid = geometry(a)
    pa, pb, s, c, v = sp.splat_params(
        inter, origins, scene.target_pos, scene.plane_u, scene.plane_v,
        fcfg.sigma_scale, valid,
    )
    return pa.sum() + pb.sum() + s.sum() + c.sum()

def b_pallas(a):
    inter, origins, valid = geometry(a)
    img = sp.splat_summed_pallas(
        inter, origins, scene.target_pos, scene.plane_u, scene.plane_v,
        fcfg.target_width, fcfg.target_height, fcfg.resolution,
        fcfg.sigma_scale, valid, precision=fcfg.precision,
    )
    return jnp.vdot(img, _imap)

def b_xla(a):
    inter, origins, valid = geometry(a)
    fx, fy = splat_factors(
        inter, origins, scene.target_pos, scene.plane_u, scene.plane_v,
        fcfg.target_width, fcfg.target_height, fcfg.resolution,
        fcfg.sigma_scale, valid,
    )
    img = splat_image(fx, fy, precision=fcfg.precision)
    return jnp.vdot(img, _imap)

for name, body in [("geometry only", b_geom), ("geom+splat_params", b_params),
                   ("geom+pallas splat", b_pallas), ("geom+xla splat", b_xla)]:
    ms, raw = slope(body)
    print(f"{name:20s}: {ms:.4f} ms/rep  raw={ {k: round(v*1e3,1) for k,v in raw.items()} }", flush=True)
