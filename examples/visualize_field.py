"""Plant visualization demo: render the field in 3-D and dump flux maps.

The working counterpart of the reference's pygame/OpenGL demo
(``newenv/heliostat_renderer.py``, decorative and broken as shipped):
builds a small heliostat field, renders the flux image, and writes

  * ``out/field_scene.html``  — interactive 3-D plant view (mirror facets
    oriented by their actual post-error normals, colored by per-heliostat
    alignment error in mrad; receiver plane, tower, sun direction);
  * ``out/normals.html``      — the classic scatter3d normals diagnostic;
  * ``out/flux.npy``          — the [B, res, res] flux images.

Runs on CPU or TPU.  Usage:  python examples/visualize_field.py [--out out]
"""

from __future__ import annotations

import pathlib
import sys

# Runnable from anywhere: `python examples/visualize_field.py` puts examples/ on
# sys.path, not the repo root where doodle_tpu lives.
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse
import pathlib

import jax
import numpy as np

from doodle_tpu.core.field import HelioField
from doodle_tpu.core.scene import FieldConfig, make_scene
from doodle_tpu.env.losses import angles_mrad
from doodle_tpu.env.sun import SUN_RADIUS, azel_to_direction
from doodle_tpu.utils import field_scene_html, scatter3d_vectors


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="out")
    ap.add_argument("--num_heliostats", type=int, default=50)
    ap.add_argument("--resolution", type=int, default=128)
    ap.add_argument("--error_scale_mrad", type=float, default=90.0)
    args = ap.parse_args()
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    key = jax.random.PRNGKey(0)
    k_geo, k_field = jax.random.split(key)
    pos = jax.random.uniform(k_geo, (args.num_heliostats, 3)) * 10.0 + 80.0
    pos = pos.at[:, 2].set(0.0)
    scene = make_scene(pos, [0.0, -5.0, 0.0], [0.0, 1.0, 0.0])

    cfg = FieldConfig(
        resolution=args.resolution,
        sigma_scale=0.01,
        error_scale_mrad=args.error_scale_mrad,
        max_batch_size=1,
    )
    field = HelioField(scene, cfg, key=k_field)

    sun = azel_to_direction(45.0, 45.0) * SUN_RADIUS
    ideal = field.calculate_ideal_normals(sun)
    img, actual = field.render(sun, ideal)

    align = np.asarray(angles_mrad(ideal, actual))  # per-heliostat, mrad
    scene_path = field_scene_html(
        np.asarray(scene.heliostat_pos), np.asarray(actual),
        target_pos=np.asarray(scene.target_pos),
        plane_u=np.asarray(scene.plane_u), plane_v=np.asarray(scene.plane_v),
        target_width=cfg.target_width, target_height=cfg.target_height,
        sun_dir=np.asarray(sun), values=align,
        mirror_size=2.0,
        html_file=str(out / "field_scene.html"),
        title=f"{args.num_heliostats} heliostats, alignment error (mrad)",
    )
    normals_path = scatter3d_vectors(
        np.asarray(actual), align, html_file=str(out / "normals.html"),
        title="actual normals vs alignment error (mrad)",
    )
    np.save(out / "flux.npy", np.asarray(img)[None])

    print(f"flux total={float(np.asarray(img).sum()):.2f}  "
          f"mean alignment error={align.mean():.1f} mrad")
    print(f"wrote {scene_path}, {normals_path}, {out / 'flux.npy'}")


if __name__ == "__main__":
    main()
