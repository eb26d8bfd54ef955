"""End-to-end pipeline tests: synthetic scene accuracy, cv2.StereoSGBM MAE
bound (SURVEY.md §4 integration tests), WLS behavior, reproject quirks."""

import numpy as np
import pytest

from stereo_depth_ruler_tpu.calib.config import StereoRig
from stereo_depth_ruler_tpu.io.synthetic import make_scene, render_stereo_pair
from stereo_depth_ruler_tpu.ops.reproject import reproject_to_3d, scale_q
from stereo_depth_ruler_tpu.ops.sgbm import SGBMParams
from stereo_depth_ruler_tpu.pipeline import (PipelineConfig, StereoPipeline,
                                             downscale2x)


@pytest.fixture(scope="module")
def rig():
    return StereoRig.synthetic(width=256, height=160, focal=240.0,
                               baseline_mm=80.0)


@pytest.fixture(scope="module")
def pair(rig):
    scene = make_scene(rig, n_boxes=3, z_range_mm=(600.0, 1600.0),
                       background_z_mm=3000.0, seed=5)
    return render_stereo_pair(scene, seed=5)


PARAMS = SGBMParams(num_disparities=48, block_size=5, speckle_window_size=50)


def test_pipeline_accuracy_vs_gt(rig, pair):
    left, right, gt = pair
    pipe = StereoPipeline(rig, PipelineConfig(
        sgbm=PARAMS, downscale=1, use_wls=False, lr_mode="fast"))
    out = pipe.process_pair(left, right)
    disp = np.asarray(out["disparity"])
    D = PARAMS.num_disparities
    sel = (disp >= 0)[:, D:]
    err = np.abs(disp[:, D:][sel] - gt[:, D:][sel])
    assert sel.mean() > 0.85
    assert err.mean() < 0.5
    # depth: Z = f*B/d
    z = np.asarray(out["xyz"])[..., 2, :, :]
    zt = rig.focal_rectified * rig.baseline / np.maximum(gt, 1e-3)
    zsel = sel & np.isfinite(z[:, D:])
    zerr = np.abs(z[:, D:][zsel] - zt[:, D:][zsel]) / zt[:, D:][zsel]
    # relative depth error scales as disp_err/disp: background here is only
    # ~6.4 px so a few % is physics, not implementation error
    assert np.median(zerr) < 0.06
    near = zsel & (gt[:, D:] > 15.0)           # near surfaces: tight bound
    zerr_near = (np.abs(z[:, D:] - zt[:, D:]) / zt[:, D:])[near]
    assert np.median(zerr_near) < 0.02


def test_pipeline_wls_full(rig, pair):
    left, right, gt = pair
    pipe = StereoPipeline(rig, PipelineConfig(
        sgbm=PARAMS, downscale=1, use_wls=True, lr_mode="right_matcher"))
    out = pipe.process_pair(left, right)
    disp = np.asarray(out["disparity"])
    D = PARAMS.num_disparities
    sel = (disp >= 0)[:, D:]
    err = np.abs(disp[:, D:][sel] - gt[:, D:][sel])
    assert sel.mean() > 0.95          # WLS inpaints
    assert err.mean() < 0.7


def test_pipeline_downscale_matches_reference_flow(rig, pair):
    """downscale=2 == reference computeDisparity flow: matcher runs at half
    res (stereo_disparity.cpp:22-24); geometric Q-scaling keeps metric
    depth unchanged."""
    left, right, gt = pair
    half_params = SGBMParams(num_disparities=32, block_size=5,
                             speckle_window_size=50)
    pipe = StereoPipeline(rig, PipelineConfig(
        sgbm=half_params, downscale=2, use_wls=False, lr_mode="fast"))
    out = pipe.process_pair(left, right)
    disp = np.asarray(out["disparity"])
    assert disp.shape == (80, 128)
    gt_half = np.asarray(downscale2x(gt)) / 2.0
    sel = (disp >= 0)[:, 32:]
    err = np.abs(disp[:, 32:][sel] - gt_half[:, 32:][sel])
    assert err.mean() < 0.6
    # metric depth must agree with full-res geometry
    z = np.asarray(out["xyz"])[..., 2, :, :]
    zt = rig.focal_rectified * rig.baseline / np.maximum(gt_half * 2, 1e-3)
    zsel = sel & np.isfinite(z[:, 32:])
    zerr = np.abs(z[:, 32:][zsel] - zt[:, 32:][zsel]) / zt[:, 32:][zsel]
    # half-res matching doubles the relative quantization (bg d_half ≈ 3.2)
    assert np.median(zerr) < 0.08


def test_quirk_compat_mode(rig):
    """quirk_compat reproduces the reference's half-res-Q behavior
    (SURVEY.md §2.4): Z comes out 2x smaller than geometric truth."""
    disp = np.full((80, 128), 16.0, np.float32)
    z_correct = np.asarray(reproject_to_3d(disp, rig.Q, scale=0.5))[..., 2]
    z_quirk = np.asarray(reproject_to_3d(disp, rig.Q, scale=0.5,
                                         quirk_compat=True))[..., 2]
    # geometric: d_full = 32 -> Z = f*B/32; quirk: Z = f*B/16
    np.testing.assert_allclose(z_correct, 240.0 * 80.0 / 32.0, rtol=1e-5)
    np.testing.assert_allclose(z_quirk, 240.0 * 80.0 / 16.0, rtol=1e-5)


def test_scale_q_identity():
    rig = StereoRig.synthetic(width=64, height=48, focal=100.0)
    np.testing.assert_allclose(scale_q(rig.Q, 1.0), rig.Q)


def test_mae_vs_opencv_sgbm(rig, pair):
    """Disparity MAE vs cv2.StereoSGBM under a fixed bound — the
    BASELINE.json acceptance criterion."""
    cv2 = pytest.importorskip("cv2")
    left, right, gt = pair
    matcher = cv2.StereoSGBM_create(
        minDisparity=0, numDisparities=48, blockSize=5,
        P1=8 * 3 * 25, P2=32 * 3 * 25, disp12MaxDiff=1, preFilterCap=63,
        uniquenessRatio=12, speckleWindowSize=50, speckleRange=2,
        mode=cv2.STEREO_SGBM_MODE_HH)
    ref = matcher.compute(left, right).astype(np.float32) / 16.0

    pipe = StereoPipeline(rig, PipelineConfig(
        sgbm=PARAMS, downscale=1, use_wls=False, lr_mode="fast"))
    ours = np.asarray(pipe.process_pair(left, right)["disparity"])

    D = PARAMS.num_disparities
    both = (ref > 0) & (ours >= 0)
    both[:, :D] = False
    assert both.mean() > 0.5
    mae = np.abs(ref[both] - ours[both]).mean()
    # fixed bound: sub-pixel-level agreement with OpenCV's own SGBM
    assert mae < 0.5, f"MAE vs cv2 = {mae}"
    # and both should be close to GT
    cv_err = np.abs(ref[both] - gt[both]).mean()
    our_err = np.abs(ours[both] - gt[both]).mean()
    assert our_err < cv_err + 0.25


def test_batched_pipeline(rig, pair):
    left, right, _ = pair
    pipe = StereoPipeline(rig, PipelineConfig(
        sgbm=SGBMParams(num_disparities=32, speckle_window_size=0),
        downscale=2, use_wls=False, lr_mode="none"))
    lb = np.stack([left, left])
    rb = np.stack([right, right])
    out = pipe.process_batch(lb, rb)
    d = np.asarray(out["disparity"])
    assert d.shape[0] == 2
    np.testing.assert_array_equal(d[0], d[1])
    one = np.asarray(pipe.process_pair(left, right)["disparity"])
    np.testing.assert_allclose(d[0], one, atol=1e-5)


def test_capture_utils(tmp_path, small_rig, small_pair):
    """utils/capture: split, change_filename, image_disparity (helper.cpp
    equivalents)."""
    import numpy as np
    from stereo_depth_ruler_tpu.utils import capture
    from stereo_depth_ruler_tpu.ops.sgbm import SGBMParams

    left, right, gt = small_pair
    sbs = np.concatenate([left, right], axis=1)
    l2, r2 = capture.split_sbs(sbs)
    np.testing.assert_array_equal(l2, left)

    src = tmp_path / "flat"
    src.mkdir()
    for i in range(4):
        (src / f"img_{i:02d}.txt").write_text(str(i))
    nl, nr = capture.change_filename(str(src), str(tmp_path / "L"),
                                    str(tmp_path / "R"), n_left=2)
    assert (nl, nr) == (2, 2)

    disp = capture.image_disparity(
        sbs, rig=small_rig, rectify=False,
        params=SGBMParams(num_disparities=32, speckle_window_size=0))
    v = disp[:, 32:] >= 0
    assert v.mean() > 0.5


def test_epipolar_overlay():
    import numpy as np
    from stereo_depth_ruler_tpu.viz import draw_epipolar_lines
    img = np.zeros((64, 32), np.uint8)
    out = draw_epipolar_lines(img, spacing=16)
    assert out.shape == (64, 32, 3)
    assert (out[0] == [0, 255, 0]).all() and (out[16] == [0, 255, 0]).all()
    assert (out[1] == 0).all()
