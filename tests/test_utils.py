"""Utils-layer tests: writers, plotting HTML, NaN guards, profiling timer,
orbax checkpoint round-trip."""

import json
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from doodle_tpu.utils import (
    JsonlWriter,
    MultiWriter,
    StepTimer,
    check_finite,
    find_nonfinite,
    restore_checkpoint,
    save_checkpoint,
    scatter3d_vectors,
)


def test_jsonl_writer_roundtrip(tmp_path):
    w = JsonlWriter(str(tmp_path / "run"), params={"lr": 1e-3})
    w.add_scalar("loss/mse", 0.5, 1)
    w.add_scalar("loss/mse", 0.25, 2)
    w.add_images("pred", np.zeros((2, 1, 4, 4)), 2)
    w.close()
    lines = [json.loads(l) for l in
             (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()]
    assert lines[0]["event"] == "params"
    scalars = [l for l in lines if l["event"] == "scalar"]
    assert scalars[0]["value"] == 0.5 and scalars[1]["step"] == 2
    assert (tmp_path / "run" / "images" / "pred_2.npy").exists()


def test_multi_writer_fanout(tmp_path):
    w1 = JsonlWriter(str(tmp_path / "a"))
    w2 = JsonlWriter(str(tmp_path / "b"))
    mw = MultiWriter(w1, w2, None)
    mw.add_scalar("x", 1.0, 0)
    mw.log_params({"sun": (45.0, 45.0)})
    mw.close()
    for d in ("a", "b"):
        text = (tmp_path / d / "metrics.jsonl").read_text()
        assert "scalar" in text and "params" in text and "sun" in text


def test_tensorboard_writer_event_file_roundtrip(tmp_path):
    """Live-backend smoke (VERDICT r1 #8): write scalars + images through
    TensorBoardWriter, then read the event file back with the tensorboard
    EventAccumulator and check the values survived."""
    tb = pytest.importorskip("tensorboard")  # noqa: F841
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    from doodle_tpu.utils import TensorBoardWriter

    w = TensorBoardWriter(str(tmp_path), params={"lr": 1e-3})
    for step, v in enumerate([3.5, 2.25, 1.125]):
        w.add_scalar("loss/total", v, step)
    w.add_images("flux", np.random.rand(2, 1, 8, 8).astype(np.float32), 0)
    w.flush()
    w.close()

    acc = EventAccumulator(str(tmp_path))
    acc.Reload()
    got = [(e.step, e.value) for e in acc.Scalars("loss/total")]
    assert got == [(0, 3.5), (1, 2.25), (2, 1.125)]
    assert acc.Images("flux") or acc.Tags().get("images")


def test_mlflow_filestore_writer_roundtrip(tmp_path):
    """The dependency-free mlruns/ file-store backend: metrics, params,
    images and artifacts land in the documented MLflow FileStore layout
    and read back with the exact values."""
    from doodle_tpu.utils.logging import MLflowFileStoreWriter

    w = MLflowFileStoreWriter(
        root=str(tmp_path / "mlruns"), experiment_name="exp",
        run_name="r1", params={"lr": 0.001, "arch": "lstm"},
    )
    for step, v in enumerate([10.0, 5.0, 2.5]):
        w.add_scalar("mse/test", v, step)
    w.add_images("flux", np.random.rand(3, 1, 4, 4), 7)
    art = tmp_path / "note.txt"
    art.write_text("hello")
    w.log_artifact(str(art))
    w.close()

    # read-back: metric points in order with values and steps intact
    pts = w.read_metric("mse/test")
    assert [(v, s) for _, v, s in pts] == [(10.0, 0), (5.0, 1), (2.5, 2)]
    run = w.run_dir
    assert (run / "params" / "lr").read_text() == "0.001"
    assert (run / "params" / "arch").read_text() == "lstm"
    imgs = np.load(run / "artifacts" / "flux" / "7.npy")
    assert imgs.shape == (3, 4, 4, 1)         # NCHW → NHWC per the ref shim
    assert (run / "artifacts" / "note.txt").read_text() == "hello"
    # run meta closed out as FINISHED with an end_time
    meta = (run / "meta.yaml").read_text()
    assert "status: 3" in meta and "end_time: null" not in meta
    # experiment meta exists (what `mlflow ui` needs to list the run)
    assert (tmp_path / "mlruns" / "0" / "meta.yaml").exists()


def test_scatter3d_writes_selfcontained_html(tmp_path):
    v = np.random.randn(10, 3)
    c = np.random.rand(10)
    out = scatter3d_vectors(v, c, html_file=str(tmp_path / "sub" / "p.html"),
                            title="t")
    text = (tmp_path / "sub" / "p.html").read_text()
    assert "scatter3d" in text and "plotly" in text
    assert "aspectmode" in text
    # the data survived the JSON round trip
    assert f"{v[0, 0]:.6f}"[:6] in text or str(round(v[0, 0], 4))[:5] in text


def test_scatter3d_length_mismatch(tmp_path):
    with pytest.raises(ValueError):
        scatter3d_vectors(np.zeros((3, 3)), np.zeros(2),
                          html_file=str(tmp_path / "x.html"))


def test_find_nonfinite():
    tree = {"a": jnp.ones(3), "b": {"c": jnp.array([1.0, jnp.nan])}}
    bad = find_nonfinite(tree, "g")
    assert len(bad) == 1 and "'b'" in bad[0] and "'c'" in bad[0]
    assert find_nonfinite({"x": jnp.zeros(2)}) == []


def test_check_finite_checkify():
    from jax.experimental import checkify

    def f(x):
        return check_finite(x, "x") * 2

    checked = checkify.checkify(f)
    err, out = checked(jnp.ones(3))
    err.throw()  # no error
    err, _ = checked(jnp.array([1.0, jnp.inf]))
    with pytest.raises(Exception, match="NaN/Inf"):
        err.throw()


def test_step_timer():
    t = StepTimer(skip=1)
    t.tick()
    assert t.steps_per_s == 0.0
    for _ in range(3):
        t.tick()
    assert t.measured_steps == 3
    assert t.steps_per_s > 0


def test_checkpoint_roundtrip(tmp_path):
    tree = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "step": jnp.asarray(7),
    }
    path = save_checkpoint(str(tmp_path / "ckpt"), tree)
    restored = restore_checkpoint(path, target=tree)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(tree["params"]["w"])
    )
    assert int(restored["step"]) == 7


def test_field_scene_html(tmp_path):
    from doodle_tpu.utils import field_scene_html

    rng = np.random.default_rng(0)
    pos = np.c_[rng.uniform(50, 100, (8, 2)), np.zeros(8)]
    normals = rng.normal(size=(8, 3))
    path = field_scene_html(
        pos, normals,
        target_pos=[0.0, -5.0, 40.0],
        plane_u=[1.0, 0.0, 0.0], plane_v=[0.0, 0.0, 1.0],
        target_width=15.0, target_height=15.0,
        sun_dir=[0.3, 0.3, 0.9],
        values=np.arange(8.0),
        html_file=str(tmp_path / "sub" / "scene.html"),
    )
    text = (tmp_path / "sub" / "scene.html").read_text()
    assert path.endswith("scene.html")
    # Parse the embedded figure JSON and count actual mesh3d traces
    # (mirrors + receiver) — substring counting would break on any trace
    # whose name merely contains "mesh3d".
    m = re.search(r"Plotly\.newPlot\(\"plot\", (\[.*\]), \{", text)
    data = json.loads(m.group(1))
    assert sum(t.get("type") == "mesh3d" for t in data) == 2
    assert "tower" in text and "sun" in text
    assert "Plotly.newPlot" in text


def test_field_scene_html_values_mismatch(tmp_path):
    from doodle_tpu.utils import field_scene_html

    with pytest.raises(ValueError):
        field_scene_html(
            np.zeros((4, 3)), np.ones((4, 3)),
            target_pos=[0, 0, 10], plane_u=[1, 0, 0], plane_v=[0, 0, 1],
            target_width=10, target_height=10,
            values=np.zeros(3),
            html_file=str(tmp_path / "x.html"),
        )
