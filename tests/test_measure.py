"""Measurement engine + CSV schema + WLS/reproject unit tests."""

import numpy as np
import pytest

from stereo_depth_ruler_tpu.calib.config import StereoRig
from stereo_depth_ruler_tpu.measure import (MeasurementSession,
                                            depth_coverage, measure_distance)
from stereo_depth_ruler_tpu.metrics import FrameMetrics, MetricsLog, frame_metrics
from stereo_depth_ruler_tpu.ops.reproject import reproject_to_3d


def _flat_xyz(h=40, w=60, z=1000.0, f=100.0):
    """XYZ for a flat plane at depth z with pinhole (f, cx=w/2, cy=h/2)."""
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    X = (xs - w / 2) * z / f
    Y = (ys - h / 2) * z / f
    Z = np.full_like(X, z)
    return np.stack([X, Y, Z], axis=-1).astype(np.float32)


def test_measure_distance_euclidean():
    xyz = _flat_xyz()
    # two points on the plane: 3D distance = z/f * pixel distance
    d = measure_distance(xyz, (10, 10), (40, 10))
    assert d == pytest.approx(1000.0 / 100.0 * 30.0)


def test_reference_measurement_semantics():
    """The reference records dist = ||xyz1-xyz2|| printed /10 as cm
    (stereo_displayer.cpp:47-57). Feed XYZ values and check the cm math."""
    xyz = np.zeros((4, 4, 3), np.float32)
    xyz[1, 1] = [0.0, 0.0, 2400.0]
    xyz[2, 2] = [10.0, 10.0, 2400.29]
    s = MeasurementSession()
    rec = s.measure((1, 1), (2, 2), xyz)
    expect_mm = np.linalg.norm([10.0, 10.0, 0.29])
    assert rec.distance_mm == pytest.approx(expect_mm, rel=1e-6)
    assert rec.distance_cm == pytest.approx(expect_mm / 10.0, rel=1e-6)


def test_session_click_pairs_and_csv(tmp_path):
    xyz = _flat_xyz()
    csv = tmp_path / "m.csv"
    s = MeasurementSession(csv)
    assert s.click(5, 5, xyz) is None
    rec = s.click(25, 5, xyz)
    assert rec is not None
    s.new_session()
    s.measure((1, 1), (2, 2), xyz)
    s.save_csv()
    text = csv.read_text()
    assert text.startswith("Image, First_point,   Second_point, Distance")
    # reference-style row: `0, [5, 5],    [25, 5], 20.00000 cm`
    assert "[5, 5]" in text and "cm" in text
    recs = MeasurementSession.load_csv(csv)
    assert len(recs) == 2
    assert recs[0].image_index == 0 and recs[1].image_index == 1
    assert recs[0].distance_cm == pytest.approx(rec.distance_cm, abs=1e-4)


def test_session_reset_truncates(tmp_path):
    xyz = _flat_xyz()
    csv = tmp_path / "m.csv"
    s = MeasurementSession(csv)
    s.measure((1, 1), (2, 2), xyz)
    s.save_csv()
    assert csv.stat().st_size > 0
    s.reset()
    assert csv.stat().st_size == 0
    assert not s.records


def test_invalid_point_nan():
    xyz = _flat_xyz()
    xyz[3, 3] = np.inf
    assert np.isnan(measure_distance(xyz, (3, 3), (10, 10)))


def test_depth_coverage_quirk():
    """Numerator counts only cols >= skip, denominator counts ALL pixels
    (stereo_displayer.cpp:105-118)."""
    z = np.full((10, 100), 500.0)
    assert depth_coverage(z, skip_cols=20) == pytest.approx(0.8)
    z[:, 50:] = np.inf
    assert depth_coverage(z, skip_cols=20) == pytest.approx(0.3)


def test_frame_metrics_and_log(tmp_path):
    disp = np.array([[1.0, -1.0], [2.0, 3.0]], np.float32)
    z = np.array([[100.0, np.inf], [200.0, 300.0]])
    m = frame_metrics(0, disp, z, ref_disp=disp + 0.5)
    assert m.valid_disparity_frac == pytest.approx(0.75)
    assert m.disparity_mae_vs_ref == pytest.approx(0.5)
    log = MetricsLog(tmp_path / "m.jsonl")
    log.append(m)
    s = log.summary()
    assert s["frames"] == 1
    assert (tmp_path / "m.jsonl").read_text().count("\n") == 1


def test_measurement_on_synthetic_scene_ground_truth():
    """Full-stack measurement fidelity (BASELINE.json: 'pairwise distances
    within the tool's measurement tolerance'): measure two points with
    known GT 3D positions through the real pipeline."""
    from stereo_depth_ruler_tpu.io.synthetic import make_scene, render_stereo_pair
    from stereo_depth_ruler_tpu.ops.sgbm import SGBMParams, sgbm

    rig = StereoRig.synthetic(width=256, height=160, focal=240.0,
                              baseline_mm=80.0)
    scene = make_scene(rig, n_boxes=3, z_range_mm=(600.0, 1600.0),
                       background_z_mm=3000.0, seed=5)
    left, right, gt = render_stereo_pair(scene, seed=5)
    disp = sgbm(np.float32(left), np.float32(right),
                SGBMParams(num_disparities=48, speckle_window_size=50))
    xyz = np.asarray(reproject_to_3d(disp, rig.Q))
    s = MeasurementSession()
    p1, p2 = (200, 10), (240, 20)

    def gt_xyz(p):
        z = 240.0 * 80.0 / gt[p[1], p[0]]
        return np.array([(p[0] - (-rig.Q[0, 3])) * z / 240.0,
                         (p[1] - (-rig.Q[1, 3])) * z / 240.0, z])

    truth = np.linalg.norm(gt_xyz(p1) - gt_xyz(p2))
    rec = s.measure(p1, p2, xyz)
    assert rec.distance_mm == pytest.approx(truth, rel=0.02)
