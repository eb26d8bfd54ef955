"""NumPy SGBM oracle sanity + parity of the JAX implementation vs oracle
(SURVEY.md §4: "SGBM cost/aggregation kernels vs a small pure-NumPy SGBM
oracle on tiny images")."""

import numpy as np
import pytest

from stereo_depth_ruler_tpu.ops import sgbm as jsgbm
from stereo_depth_ruler_tpu.ops import sgbm_ref as nref
from stereo_depth_ruler_tpu.ops.sgbm_ref import SGBMParams

PARAMS = SGBMParams(num_disparities=16, block_size=3, p1=72, p2=288,
                    speckle_window_size=20, speckle_range=1)


@pytest.fixture(scope="module")
def tiny(tiny_pair):
    left, right, gt = tiny_pair
    return left, right, gt


def test_oracle_recovers_gt(tiny):
    left, right, gt = tiny
    disp = nref.sgbm_numpy(left, right, PARAMS)
    valid = disp >= 0
    # exclude the unreliable left band (reference does too,
    # stereo_displayer.cpp:107)
    sel = valid[:, PARAMS.num_disparities:]
    err = np.abs(disp[:, PARAMS.num_disparities:][sel]
                 - gt[:, PARAMS.num_disparities:][sel])
    assert sel.mean() > 0.5
    assert np.median(err) < 1.0


def test_sobel_parity(tiny):
    left, _, _ = tiny
    a = nref.sobel_clip_np(left, 63)
    b = np.asarray(jsgbm.sobel_clip(left, 63))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_cost_volume_parity(tiny):
    left, right, _ = tiny
    lt = nref.sobel_clip_np(left, 63)
    rt = nref.sobel_clip_np(right, 63)
    a = nref.bt_cost_volume_np(lt, rt, 16)
    b = np.asarray(jsgbm.bt_cost_volume(
        np.float32(lt), np.float32(rt), 16))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_box_filter_parity(tiny):
    left, right, _ = tiny
    lt = nref.sobel_clip_np(left, 63)
    rt = nref.sobel_clip_np(right, 63)
    C = nref.bt_cost_volume_np(lt, rt, 16)
    a = nref.box_filter_volume_np(C, 5)
    b = np.asarray(jsgbm.box_filter_volume(np.float32(C), 5))
    np.testing.assert_allclose(a, b, atol=1e-2)


@pytest.mark.parametrize("num_paths", [2, 4, 8])
def test_aggregation_parity(tiny, num_paths):
    left, right, _ = tiny
    lt = nref.sobel_clip_np(left, 63)
    rt = nref.sobel_clip_np(right, 63)
    C = nref.box_filter_volume_np(
        nref.bt_cost_volume_np(lt, rt, 16), 3)
    dirs = {8: nref.PATH_DIRS_8, 4: nref.PATH_DIRS_4,
            2: nref.PATH_DIRS_2}[num_paths]
    a = nref.aggregate_np(C, 72, 288, dirs)
    b = np.asarray(jsgbm.aggregate_paths(np.float32(C), 72, 288, num_paths))
    np.testing.assert_allclose(a, b, atol=0.5, rtol=1e-6)


def test_full_pipeline_parity(tiny):
    """End-to-end oracle vs JAX: same winners, same validity, same
    subpixel values (up to f32/f64 rounding at the 1/16 quantization)."""
    left, right, _ = tiny
    a = nref.sgbm_numpy(left, right, PARAMS)
    b = np.asarray(jsgbm.sgbm(np.float32(left), np.float32(right), PARAMS))
    same_validity = (a >= 0) == (b >= 0)
    assert same_validity.mean() > 0.99
    both = (a >= 0) & (b >= 0)
    np.testing.assert_allclose(a[both], b[both], atol=1 / 16 + 1e-4)


def test_speckle_filter_parity():
    """jnp CCL speckle filter == flood-fill oracle on random label maps."""
    rng = np.random.default_rng(7)
    for trial in range(4):
        disp = rng.integers(0, 6, size=(24, 32)).astype(np.float32)
        valid = rng.random((24, 32)) > 0.3
        a = nref.speckle_filter_np(disp, valid, max_size=8, max_diff=1.0)
        b = np.asarray(jsgbm.speckle_filter(disp, valid, 8, 1.0))
        np.testing.assert_array_equal(a, b, err_msg=f"trial {trial}")


def test_lr_check_parity(tiny):
    left, right, _ = tiny
    lt = nref.sobel_clip_np(left, 63)
    rt = nref.sobel_clip_np(right, 63)
    C = nref.box_filter_volume_np(
        nref.bt_cost_volume_np(lt, rt, 16), 3)
    S = nref.aggregate_np(C, 72, 288, nref.PATH_DIRS_4)
    disp, valid = nref.wta_np(S, PARAMS)
    a = nref.lr_check_np(S, disp, valid, PARAMS)
    b = np.asarray(jsgbm.lr_check(
        np.float32(S), np.float32(disp), valid, PARAMS))
    assert (a == b).mean() > 0.995
