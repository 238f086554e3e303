#!/usr/bin/env python3
"""Capture golden outputs from the PyTorch reference (l3th4l/DOODLE).

Runs the reference implementation at /root/reference on tiny deterministic
scenes with *injected* error tensors (the reference's own cross-implementation
sanity-check idiom, ``newenv/sanity_check.py``) and stores inputs + outputs as
``tests/goldens/*.npz``. The parity tests in ``tests/`` then compare the JAX
implementation against these files without importing torch or the reference.

Run once (requires /root/reference + torch):  python scripts/capture_goldens.py
"""

import sys
import pathlib

import numpy as np

REF = "/root/reference"
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens"
OUT.mkdir(parents=True, exist_ok=True)

sys.path.insert(0, REF)

import torch  # noqa: E402

torch.manual_seed(0)

import newenv_rl_test_multi_error as ref_field_mod  # noqa: E402
import test_environment as ref_env_mod  # noqa: E402


def t(x):
    return torch.tensor(np.asarray(x), dtype=torch.float32)


def capture_optics():
    rng = np.random.default_rng(42)
    M = 64
    incidents = rng.normal(size=(M, 3)).astype(np.float32)
    incidents /= np.linalg.norm(incidents, axis=1, keepdims=True)
    normals = rng.normal(size=(M, 3)).astype(np.float32)
    origins = rng.normal(size=(M, 3)).astype(np.float32) * 50
    dirs = rng.normal(size=(M, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    # make a few rays exactly parallel to the plane to exercise the mask
    plane_point = np.array([0.0, -5.0, 0.0], np.float32)
    plane_normal = np.array([0.0, 1.0, 0.0], np.float32)
    dirs[:4, 1] = 0.0
    errors = rng.normal(size=(M, 2)).astype(np.float32) * 180.0
    cone_a = rng.normal(size=(M, 3)).astype(np.float32)
    cone_b = rng.normal(size=(M, 3)).astype(np.float32)

    refl = ref_field_mod.reflect_vectors(t(incidents), t(normals))
    inter, valid = ref_field_mod.ray_plane_intersection_batch(
        t(origins), t(dirs), t(plane_point), t(plane_normal)
    )
    rot = ref_field_mod.rotate_normals_batch(t(normals), t(errors))
    cone = ref_field_mod.project_onto_circular_cone(t(cone_a), t(cone_b), 0.1)

    np.savez(
        OUT / "optics_kernels.npz",
        incidents=incidents,
        normals=normals,
        origins=origins,
        dirs=dirs,
        plane_point=plane_point,
        plane_normal=plane_normal,
        errors=errors,
        cone_a=cone_a,
        cone_b=cone_b,
        cone_theta=np.float32(0.1),
        refl=refl.numpy(),
        inter=inter.numpy(),
        valid=valid.numpy(),
        rot=rot.numpy(),
        cone=cone.numpy(),
    )
    print("optics_kernels.npz", "ok")


def make_ref_field(helio_pos, targ_pos, targ_area, targ_norm, **kw):
    return ref_field_mod.HelioField(
        heliostat_positions=t(helio_pos),
        target_position=t(targ_pos),
        target_area=targ_area,
        target_normal=t(targ_norm),
        device="cpu",
        **kw,
    )


def capture_render():
    rng = np.random.default_rng(7)
    N, B, res = 7, 3, 32
    helio = (rng.random((N, 3)) * 10 + 80).astype(np.float32)
    helio[:, 2] = 0
    targ_pos = np.array([0.0, -5.0, 0.0], np.float32)
    targ_norm = np.array([0.0, 1.0, 0.0], np.float32)
    targ_area = (15.0, 15.0)

    field = make_ref_field(
        helio, targ_pos, targ_area, targ_norm,
        error_scale_mrad=180.0, sigma_scale=0.1, resolution=res,
        max_batch_size=B,
    )

    sun = rng.normal(size=(B, 3)).astype(np.float32)
    sun[:, 2] = np.abs(sun[:, 2])
    sun = sun / np.linalg.norm(sun, axis=1, keepdims=True) * 14142.135
    ideal = field.calculate_ideal_normals(t(sun))

    # inject deterministic errors (bypasses torch RNG-stream differences)
    errors_b = (rng.normal(size=(B, N, 2)) * 120.0).astype(np.float32)
    errors_1 = (rng.normal(size=(N, 2)) * 120.0).astype(np.float32)
    field.batch_error_angles_mrad = t(errors_b)
    field.error_angles_mrad = t(errors_1)

    action = ideal.numpy() + rng.normal(size=(B, N, 3)).astype(np.float32) * 0.05
    action_flat = action.reshape(B, -1)

    img, actual, refl = field.render(t(sun), t(action_flat), ideal, monitor=True)

    sun1 = sun[0]
    act1 = action[0].reshape(-1)
    img1, actual1 = field.render(t(sun1), t(act1), ideal[0])

    # tilted-target variant exercises the general plane-basis branch
    targ_norm2 = np.array([0.3, 0.9, 0.1], np.float32)
    field2 = make_ref_field(
        helio, targ_pos, targ_area, targ_norm2,
        error_scale_mrad=180.0, sigma_scale=0.1, resolution=res,
        max_batch_size=B,
    )
    field2.batch_error_angles_mrad = t(errors_b)
    img2, actual2 = field2.render(t(sun), t(action_flat), ideal)

    np.savez(
        OUT / "field_render.npz",
        helio=helio, targ_pos=targ_pos, targ_norm=targ_norm,
        targ_norm2=targ_norm2,
        targ_area=np.array(targ_area, np.float32),
        sun=sun, errors_b=errors_b, errors_1=errors_1,
        action=action,
        sigma_scale=np.float32(0.1), resolution=np.int64(res),
        ideal=ideal.numpy(),
        img=img.numpy(), actual=actual.numpy(), refl=refl.numpy(),
        img1=img1.numpy(), actual1=actual1.numpy(),
        img2=img2.numpy(), actual2=actual2.numpy(),
    )
    print("field_render.npz", "ok")


def capture_env():
    rng = np.random.default_rng(3)
    N, B, res = 7, 4, 32
    helio = (rng.random((N, 3)) * 10 + 80).astype(np.float32)
    helio[:, 2] = 0
    targ_pos = np.array([0.0, -5.0, 0.0], np.float32)
    targ_norm = np.array([0.0, 1.0, 0.0], np.float32)
    targ_area = (15.0, 15.0)

    env = ref_env_mod.HelioEnv(
        heliostat_pos=t(helio), targ_pos=t(targ_pos), targ_area=targ_area,
        targ_norm=t(targ_norm), sigma_scale=0.1, error_scale_mrad=150.0,
        resolution=res, batch_size=B, device="cpu",
        use_error_mask=False, exponential_risk=False,
    )

    sun = rng.normal(size=(B, 3)).astype(np.float32)
    sun[:, 2] = np.abs(sun[:, 2])
    sun = sun / np.linalg.norm(sun, axis=1, keepdims=True) * 14142.135
    env.set_sun_pos(t(sun))

    errors_b = (rng.normal(size=(B, N, 2)) * 150.0).astype(np.float32)
    env.noisy_field.batch_error_angles_mrad = t(errors_b)

    ideal = env.ref_field.calculate_ideal_normals(t(sun))
    action = ideal.numpy() + rng.normal(size=(B, N, 3)).astype(np.float32) * 0.03
    action_flat = action.reshape(B, -1)

    obs, metrics, monitor = env.step(t(action_flat))

    # masked + exponential-risk variant on the same state
    env.use_error_mask = True
    env.exponential_risk = True
    obs_m, metrics_m, _ = env.step(t(action_flat))

    # standalone loss helpers
    vects = t(action)
    u = torch.tensor([1.0, 0.0, 0.0])
    v = torch.tensor([0.0, 0.0, 1.0])
    bound_mean = ref_env_mod.boundary(
        vects, t(helio), t(targ_pos), t(targ_norm), targ_area, u, v
    )
    bound_all = ref_env_mod.boundary(
        vects, t(helio), t(targ_pos), t(targ_norm), targ_area, u, v, return_all=True
    )
    angles = ref_env_mod.calculate_angles_mrad(ideal, t(action))

    imgs_for_maps = obs["img"].detach()
    dmaps = ref_env_mod.make_distance_maps(imgs_for_maps)

    np.savez(
        OUT / "env_step.npz",
        helio=helio, targ_pos=targ_pos, targ_norm=targ_norm,
        targ_area=np.array(targ_area, np.float32),
        sun=sun, errors_b=errors_b, action=action,
        sigma_scale=np.float32(0.1), error_scale=np.float32(150.0),
        resolution=np.int64(res),
        distance_maps=env.distance_maps.numpy(),
        ref_min=env.ref_min.numpy(), ref_max=env.ref_max.numpy(),
        obs_img=obs["img"].detach().numpy(),
        obs_aux=obs["aux"].detach().numpy(),
        mse=metrics["mse"].detach().numpy(),
        dist=metrics["dist"].detach().numpy(),
        bound=metrics["bound"].detach().numpy(),
        alignment=metrics["alignment_loss"].detach().numpy(),
        mse_masked=metrics_m["mse"].detach().numpy(),
        dist_masked=metrics_m["dist"].detach().numpy(),
        bound_exp=metrics_m["bound"].detach().numpy(),
        bound_mean=bound_mean.detach().numpy(),
        bound_all=bound_all.detach().numpy(),
        angles=angles.detach().numpy(),
        step_dmaps_in=imgs_for_maps.numpy(),
        step_dmaps_out=dmaps.numpy(),
        monitor_mae=monitor["mae_image"].detach().numpy(),
        monitor_bounds=monitor["all_bounds"].detach().numpy(),
    )
    print("env_step.npz", "ok")


if __name__ == "__main__":
    capture_optics()
    capture_render()
    capture_env()
