"""Calibration config: parse the reference stereo.yaml schema, round-trip,
derived quantities (SURVEY.md §2.1)."""

import shutil
from pathlib import Path

import numpy as np
import pytest

from stereo_depth_ruler_tpu.calib.config import (
    StereoRig, load_opencv_yaml, save_opencv_yaml)

REF_YAML = Path("/root/reference/config/stereo.yaml")


@pytest.fixture(scope="module")
def ref_rig():
    if not REF_YAML.exists():
        pytest.skip("reference yaml not available")
    return StereoRig.from_yaml(REF_YAML)


def test_load_reference_yaml(ref_rig):
    assert ref_rig.image_size == (1280, 720)
    # stereo.yaml:9-10
    assert ref_rig.camera_matrix_left[0, 0] == pytest.approx(699.40268130899824)
    # baseline Tx = -120.114 mm (stereo.yaml:43)
    assert ref_rig.T[0, 0] == pytest.approx(-120.11405885233479)
    assert ref_rig.baseline == pytest.approx(120.114, abs=1e-2)
    # rectified focal (stereo.yaml:82-83)
    assert ref_rig.focal_rectified == pytest.approx(669.90015369541641)
    # Q[3][2] == 1/|Tx| (stereo.yaml:91-97)
    assert ref_rig.Q[3, 2] == pytest.approx(1.0 / 120.11405885233479, rel=1e-6)
    assert ref_rig.is_valid()


def test_roundtrip(tmp_path, ref_rig):
    out = tmp_path / "rt.yaml"
    ref_rig.to_yaml(out)
    rig2 = StereoRig.from_yaml(out)
    for f in ("camera_matrix_left", "dist_coeffs_left", "camera_matrix_right",
              "dist_coeffs_right", "R", "T", "R1", "R2", "P1", "P2", "Q",
              "E", "F"):
        a, b = getattr(ref_rig, f), getattr(rig2, f)
        np.testing.assert_allclose(a, b, rtol=0, atol=0,
                                   err_msg=f"field {f} not preserved")
    assert rig2.image_size == ref_rig.image_size


def test_opencv_can_read_our_yaml(tmp_path, ref_rig):
    """cv2.FileStorage (the reference's reader) must parse what we write."""
    cv2 = pytest.importorskip("cv2")
    out = str(tmp_path / "ours.yaml")
    ref_rig.to_yaml(out)
    fs = cv2.FileStorage(out, cv2.FILE_STORAGE_READ)
    q = fs.getNode("Q").mat()
    assert q is not None
    np.testing.assert_allclose(q, ref_rig.Q, rtol=1e-12)
    assert int(fs.getNode("imageWidth").real()) == 1280
    fs.release()


def test_synthetic_rig_geometry():
    rig = StereoRig.synthetic(width=640, height=480, focal=500.0,
                              baseline_mm=100.0)
    assert rig.focal_rectified == 500.0
    assert rig.baseline == pytest.approx(100.0)
    # Q reprojection: disparity d -> Z = f*B/d
    d = 25.0
    w = rig.Q[3, 2] * d
    z = rig.Q[2, 3] / w
    assert z == pytest.approx(500.0 * 100.0 / 25.0)


def test_scalar_yaml_roundtrip(tmp_path):
    p = tmp_path / "s.yaml"
    save_opencv_yaml(p, {"a": 3, "b": 2.5, "m": np.eye(2)})
    d = load_opencv_yaml(p)
    assert d["a"] == 3 and d["b"] == 2.5
    np.testing.assert_allclose(d["m"], np.eye(2))
