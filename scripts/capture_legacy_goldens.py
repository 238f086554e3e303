#!/usr/bin/env python3
"""Capture goldens from the LEGACY reference generations (SURVEY §2.9).

The evolution-strata capabilities are flag-selectable in doodle_tpu
(``error_model="additive"``, ``normalize_energy``, ``normalize_kernels``);
until now they were pinned by property tests against the builder's reading
of the old code. This captures the actual legacy implementations:

  * gen 1 (``newenv/newenv.py``) — per-heliostat loop, ADDITIVE 3-vector
    errors, per-kernel unit-mass normalization, unit-total-energy image,
    no up-clamp, no valid-mask;
  * gen 4 (``newenv/newenv_rl_test_vec.py``) — vectorized single-error-set
    field, rotation-mrad errors, energy-normalized image (kernels NOT
    normalized — commented out at ``:100-101``), old reflect sign
    convention (``i − 2(i·n)n``, the negation of the current one — the
    ray-plane intersection is sign/scale-invariant so images agree).

Run: python scripts/capture_legacy_goldens.py
"""

import pathlib
import sys

import numpy as np

REF = "/root/reference"
OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "goldens"
OUT.mkdir(parents=True, exist_ok=True)
sys.path.insert(0, REF)
sys.path.insert(0, REF + "/newenv")

import torch  # noqa: E402

import newenv as gen1  # noqa: E402
import newenv_rl_test_vec as gen4  # noqa: E402


def t(x):
    return torch.tensor(np.asarray(x), dtype=torch.float32)


def main():
    rng = np.random.default_rng(31)
    N, RES = 6, 32
    helio = (rng.random((N, 3)) * 10 + 80).astype(np.float32)
    helio[:, 2] = 0
    targ_pos = np.array([0.0, -5.0, 0.0], np.float32)
    targ_norm = np.array([0.0, 1.0, 0.0], np.float32)
    sun = np.array([3000.0, 9000.0, 10000.0], np.float32)

    # ---- gen 1: additive errors + per-kernel + total normalization ----
    f1 = gen1.HelioField(
        heliostat_positions=t(helio), target_position=t(targ_pos),
        target_area=(15.0, 15.0), target_normal=t(targ_norm),
        error_scale=0.0, sigma_scale=0.05, resolution=RES,
    )
    err_vec = (rng.normal(size=(N, 3)) * 0.03).astype(np.float32)
    f1.error_vectors = t(err_vec)
    img1 = f1.render(t(sun))
    ideal1 = gen1.calculate_heliostat_normals_from_sun_position(
        t(sun), t(helio), t(targ_pos)
    )

    # ---- gen 4: rotation errors + energy-normalized image ----
    f4 = gen4.HelioField(
        heliostat_positions=t(helio), target_position=t(targ_pos),
        target_area=(15.0, 15.0), target_normal=t(targ_norm),
        error_scale_mrad=0.0, sigma_scale=0.05, resolution=RES,
        device="cpu",
    )
    err_mrad = (rng.normal(size=(N, 2)) * 40.0).astype(np.float32)
    f4.error_angles_mrad = t(err_mrad)
    ideal4 = f4.calculate_ideal_normals(t(sun))
    action = ideal4.numpy() + rng.normal(size=(N, 3)).astype(np.float32) * 0.02
    img4 = f4.render(t(sun), t(action.reshape(-1)))

    np.savez(
        OUT / "legacy_fields.npz",
        helio=helio, targ_pos=targ_pos, targ_norm=targ_norm, sun=sun,
        sigma_scale=np.float32(0.05), resolution=np.int64(RES),
        gen1_err_vec=err_vec, gen1_ideal=ideal1.numpy(),
        gen1_img=img1.numpy(),
        gen4_err_mrad=err_mrad, gen4_ideal=ideal4.numpy(),
        gen4_action=action, gen4_img=img4.numpy(),
    )
    print("legacy_fields.npz ok",
          f"(gen1 img sum {float(img1.sum()):.6f}, "
          f"gen4 img sum {float(img4.sum()):.6f})")


if __name__ == "__main__":
    main()
