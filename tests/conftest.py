"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax is imported anywhere in the test process —
this file is imported by pytest before any test module.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin in this image ignores the JAX_PLATFORMS env var, so
# force the platform through the config API as well (must happen before any
# backend is touched).
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens"


@pytest.fixture(scope="session")
def goldens():
    """Load all golden .npz files captured from the PyTorch reference."""
    out = {}
    for f in GOLDEN_DIR.glob("*.npz"):
        out[f.stem] = dict(np.load(f))
    return out
