"""Voxel grid vs brute force, PCD round-trip, cloud pipeline
(SURVEY.md §4: 'voxel-grid vs brute-force; CSV schema golden test')."""

import numpy as np
import pytest

from stereo_depth_ruler_tpu.calib.config import StereoRig
from stereo_depth_ruler_tpu.cloud import CloudConfig, PointCloudGenerator
from stereo_depth_ruler_tpu.io.pcd import (pack_rgb, read_pcd, unpack_rgb,
                                           write_pcd)
from stereo_depth_ruler_tpu.io.synthetic import make_scene, render_stereo_pair
from stereo_depth_ruler_tpu.ops.sgbm import SGBMParams
from stereo_depth_ruler_tpu.ops.voxel import voxel_downsample


def brute_voxel(xyz, rgb, leaf):
    vox = {}
    for p, c in zip(xyz, rgb):
        if not np.isfinite(p).all():
            continue
        key = tuple(np.floor(p / leaf).astype(int))
        vox.setdefault(key, []).append((p, c))
    pts = np.array([np.mean([p for p, _ in v], axis=0)
                    for v in vox.values()])
    cols = np.array([np.mean([c for _, c in v], axis=0)
                     for v in vox.values()])
    return pts, cols


def test_voxel_vs_brute_force():
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-100, 100, (500, 3)).astype(np.float32)
    xyz[::50] = np.inf          # some invalid points
    rgb = rng.uniform(0, 255, (500, 3)).astype(np.float32)
    pts, cols, count = voxel_downsample(xyz, rgb, leaf=25.0)
    count = int(count)
    bp, bc = brute_voxel(xyz, rgb, 25.0)
    assert count == len(bp)
    # order-independent comparison: sort both by coordinates
    ours = np.asarray(pts)[:count]
    ours_c = np.asarray(cols)[:count]
    oi = np.lexsort(ours.T)
    bi = np.lexsort(bp.T)
    np.testing.assert_allclose(ours[oi], bp[bi], atol=1e-3)
    np.testing.assert_allclose(ours_c[oi], bc[bi], atol=1e-2)


def test_voxel_leaf_quirk_is_identity():
    """leaf=0.005 on mm-unit data: every point its own voxel (the
    reference quirk, SURVEY.md §2.7)."""
    rng = np.random.default_rng(1)
    xyz = rng.uniform(0, 500, (200, 3)).astype(np.float32)
    _, _, count = voxel_downsample(xyz, None, leaf=0.005)
    assert int(count) == 200


def test_rgb_packing_roundtrip():
    rgb = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [12, 34, 56]],
                   np.uint8)
    np.testing.assert_array_equal(unpack_rgb(pack_rgb(rgb)), rgb)


@pytest.mark.parametrize("binary", [True, False])
def test_pcd_roundtrip(tmp_path, binary):
    rng = np.random.default_rng(2)
    xyz = rng.uniform(-10, 10, (64, 3)).astype(np.float32)
    rgb = rng.integers(0, 256, (64, 3)).astype(np.uint8)
    p = write_pcd(tmp_path / "t.pcd", xyz, rgb, binary=binary,
                  organized_shape=(8, 8))
    x2, c2, shape = read_pcd(p)
    assert shape == (8, 8)
    np.testing.assert_allclose(x2, xyz, atol=1e-4)
    np.testing.assert_array_equal(c2, rgb)


def test_pcd_readable_header(tmp_path):
    p = write_pcd(tmp_path / "h.pcd", np.zeros((3, 3), np.float32))
    head = p.read_bytes()[:200].decode(errors="replace")
    assert "VERSION 0.7" in head and "FIELDS x y z" in head
    assert "POINTS 3" in head and "DATA binary" in head


def test_cloud_pipeline_geometry(tmp_path):
    """Points from a synthetic scene land at the right metric depths."""
    rig = StereoRig.synthetic(width=128, height=96, focal=120.0,
                              baseline_mm=60.0)
    scene = make_scene(rig, n_boxes=2, z_range_mm=(300.0, 600.0),
                       background_z_mm=1000.0, seed=4)
    left, right, gt = render_stereo_pair(scene, seed=4)
    gen = PointCloudGenerator(rig, CloudConfig(
        sgbm=SGBMParams(num_disparities=32, speckle_window_size=30),
        leaf=5.0))
    out = gen.cloud_from_pair(left, right)
    assert out["count"] > 500
    z = out["points"][:, 2]
    # bg disparity is only 7.2 px; sub-pixel matching error legitimately
    # spreads Z around the 1000 mm plane
    assert (z > 200).all() and (z < 1500).all()
    # most points near one of the scene depths
    depths = [b.z_mm for b in scene.boxes] + [1000.0]
    close = np.min(np.abs(z[:, None] - np.array(depths)[None, :]), axis=1)
    assert np.median(close) < 40.0
    # file write
    path = gen.write_frame(tmp_path, 100, left, right)
    assert path.name == "frame_00100.pcd"
    xyz2, rgb2, _ = read_pcd(path)
    assert len(xyz2) == out["count"]


def test_process_sbs_video_uses_bgr_gray_weights(tmp_path, monkeypatch):
    """r4 weak 6: the cloud path's grayscale must use the OpenCV BGR
    weights (pcd_write.cpp:87-89 calls cvtColor), not a channel mean."""
    from stereo_depth_ruler_tpu.pipeline import bgr_to_gray

    rig = StereoRig.synthetic(width=64, height=32)
    gen = PointCloudGenerator(rig, CloudConfig(
        sgbm=SGBMParams(num_disparities=16, block_size=3), leaf=0.0))
    rng = np.random.default_rng(0)
    frames = rng.uniform(0, 255, (1, 32, 128, 3)).astype(np.uint8)

    captured = {}

    def spy_write_frame(out_dir, idx, gray, gray_r, color_l=None):
        captured["gray"] = np.asarray(gray)
        return tmp_path / "f.pcd"

    monkeypatch.setattr(gen, "write_frame", spy_write_frame)
    gen.process_sbs_video(frames, tmp_path, target_frames=[0])
    expect = np.asarray(bgr_to_gray(frames[0].astype(np.float32)))[:, :64]
    np.testing.assert_allclose(captured["gray"], expect, atol=1e-4)
    assert not np.allclose(captured["gray"],
                           frames[0, :, :64].mean(axis=2), atol=0.5)
