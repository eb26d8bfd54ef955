"""Test configuration: force an 8-virtual-device CPU JAX platform.

Mirrors SURVEY.md §4 "Distributed without a cluster": sharding/collective
tests run on `--xla_force_host_platform_device_count=8` CPU meshes; the
numerical invariant is identity with the single-device run.
"""

import os

_ON_TPU = os.environ.get("SDR_TEST_TPU") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The hosting image's axon TPU plugin force-registers itself from
# sitecustomize and sets jax_platforms programmatically, overriding the env
# var — undo that: unit tests must run on the 8-virtual-device CPU backend
# (SURVEY.md §4), never through the TPU tunnel. SDR_TEST_TPU=1 opts into
# the real backend for the compiled-kernel parity tests
# (tests/test_tpu_compiled.py), run as the only JAX process.
if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from stereo_depth_ruler_tpu.calib.config import StereoRig  # noqa: E402
from stereo_depth_ruler_tpu.io.synthetic import (  # noqa: E402
    make_scene, render_stereo_pair)


@pytest.fixture(scope="session")
def small_rig():
    """A small rectified rig for cheap CPU tests."""
    return StereoRig.synthetic(width=128, height=96, focal=120.0,
                               baseline_mm=60.0)


@pytest.fixture(scope="session")
def small_pair(small_rig):
    """(left, right, gt_disp) on the small rig; disparities ~5-25 px."""
    scene = make_scene(small_rig, n_boxes=3, z_range_mm=(300.0, 900.0),
                       background_z_mm=1500.0, seed=3)
    return render_stereo_pair(scene, seed=3)


@pytest.fixture(scope="session")
def tiny_pair():
    """Very small random-texture pair for exact oracle-vs-jax tests."""
    rng = np.random.default_rng(0)
    rig = StereoRig.synthetic(width=48, height=32, focal=50.0,
                              baseline_mm=30.0)
    scene = make_scene(rig, n_boxes=2, z_range_mm=(200.0, 400.0),
                       background_z_mm=700.0, seed=1)
    left, right, gt = render_stereo_pair(scene, seed=1)
    return left, right, gt
