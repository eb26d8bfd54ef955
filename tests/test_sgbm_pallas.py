"""Pallas SGBM kernels vs the jnp reference implementation — exact
equality in interpret mode on CPU (the kernels are integer-exact f32, so
compiled TPU results match too; bench.py exercises the compiled path)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from stereo_depth_ruler_tpu.ops import sgbm as js  # noqa: E402
from stereo_depth_ruler_tpu.ops import sgbm_pallas as sp  # noqa: E402
from stereo_depth_ruler_tpu.ops.sgbm import SGBMParams  # noqa: E402

PARAMS = SGBMParams(num_disparities=16, block_size=5, p1=72, p2=288,
                    speckle_window_size=0)


@pytest.fixture(scope="module")
def imgs(tiny_pair):
    left, right, _ = tiny_pair
    return np.float32(left), np.float32(right)


@pytest.fixture(scope="module")
def cost(imgs):
    left, right = imgs
    lt = js.sobel_clip(jnp.asarray(left), 63)
    rt = js.sobel_clip(jnp.asarray(right), 63)
    C_ref = js.box_filter_volume(
        js.bt_cost_volume(lt, rt, PARAMS.num_disparities), PARAMS.block_size)
    return lt, rt, np.asarray(C_ref)


def test_cost_volume_kernel(cost):
    lt, rt, C_ref = cost
    with pltpu.force_tpu_interpret_mode():
        C_p = np.asarray(sp.build_cost_volume_pallas(lt, rt, PARAMS, blk=8))
    # pallas layout is (H, D, W)
    np.testing.assert_array_equal(np.transpose(C_p, (0, 2, 1)), C_ref)


@pytest.mark.parametrize("num_paths", [2, 8])
def test_aggregation_kernels(cost, num_paths):
    _, _, C_ref = cost
    S_ref = np.asarray(js.aggregate_paths(jnp.asarray(C_ref), PARAMS.P1,
                                          PARAMS.P2, num_paths))
    with pltpu.force_tpu_interpret_mode():
        S_p = np.asarray(sp.aggregate_paths_pallas(
            jnp.asarray(C_ref), PARAMS.P1, PARAMS.P2, num_paths))
    np.testing.assert_array_equal(S_p, S_ref)


def test_full_matcher_parity(imgs):
    left, right = imgs
    d_ref = np.asarray(js.sgbm(jnp.asarray(left), jnp.asarray(right),
                               PARAMS))
    with pltpu.force_tpu_interpret_mode():
        d_p = np.asarray(sp.sgbm_pallas(jnp.asarray(left),
                                        jnp.asarray(right), PARAMS))
    np.testing.assert_array_equal(d_ref, d_p)


def test_dmajor_chain_parity(cost):
    """r4 relayout: d-major cost streaming (c_dmajor) + the dedicated
    (D,H,W)->(W,D,H) permute kernel are bit-identical to the H-major
    chain."""
    lt, rt, _ = cost
    with pltpu.force_tpu_interpret_mode():
        C_d = sp.build_cost_volume_pallas(lt, rt, PARAMS, blk=8,
                                          layout="dhw")
        C_h = sp.build_cost_volume_pallas(lt, rt, PARAMS, blk=8)
        np.testing.assert_array_equal(
            np.asarray(C_h), np.transpose(np.asarray(C_d), (1, 0, 2)))
        Ct = np.asarray(sp.transpose_dhw_to_wdh_pallas(C_d))
        np.testing.assert_array_equal(
            Ct, np.transpose(np.asarray(C_d), (2, 0, 1)))
        S_ref = sp.directional_pass_pallas(C_h, PARAMS.P1, PARAMS.P2,
                                           False, True,
                                           out_dtype=jnp.float32)
        S_dm = sp.directional_pass_pallas(C_d, PARAMS.P1, PARAMS.P2,
                                          False, True,
                                          out_dtype=jnp.float32,
                                          c_dmajor=True)
        np.testing.assert_array_equal(np.asarray(S_ref), np.asarray(S_dm))
        u_ref = sp.up_wta_pallas(C_h, S_ref, None, PARAMS, apply_lr=True)
        u_dm = sp.up_wta_pallas(C_d, S_ref, None, PARAMS, apply_lr=True,
                                c_dmajor=True)
        np.testing.assert_array_equal(np.asarray(u_ref), np.asarray(u_dm))


@pytest.mark.parametrize("shape", [(64, 256, 32), (48, 160, 16)])
def test_pair_shared_cost_parity(shape):
    """sgbm_pair_pallas (shared sheared cost volume + mirror_lr WTA) is
    bit-identical to compute_disparity_pair with independent matchers
    (the r4 right-matcher reuse, VERDICT item 5)."""
    from stereo_depth_ruler_tpu.ops.sgbm import compute_disparity_pair
    H, W, D = shape
    params = SGBMParams(num_disparities=D, block_size=5,
                        speckle_window_size=50, speckle_range=2)
    rng = np.random.default_rng(hash(shape) % 1000)
    left = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
    right = jnp.asarray(np.roll(np.asarray(left), -5, axis=1)
                        + rng.normal(0, 2, (H, W)).astype(np.float32))
    dl_ref, dr_ref = compute_disparity_pair(left, right, params)
    with pltpu.force_tpu_interpret_mode():
        dl, dr = sp.sgbm_pair_pallas(left, right, params)
    np.testing.assert_array_equal(np.asarray(dl), np.asarray(dl_ref))
    np.testing.assert_array_equal(np.asarray(dr), np.asarray(dr_ref))


def test_directional_pass_reverse(cost):
    """up pass == flipud(down pass on flipped volume)."""
    _, _, C_ref = cost
    C = jnp.transpose(jnp.asarray(C_ref), (0, 2, 1))  # (H, D, W)
    with pltpu.force_tpu_interpret_mode():
        up = np.asarray(sp.directional_pass_pallas(
            C, PARAMS.P1, PARAMS.P2, reverse=True, with_diag=False))
        down_flipped = np.asarray(sp.directional_pass_pallas(
            C[::-1], PARAMS.P1, PARAMS.P2, reverse=False, with_diag=False))
    np.testing.assert_array_equal(up, down_flipped[::-1])


def test_speckle_pallas_parity():
    """pallas CCL + sort-based sizes == jnp speckle filter (exact)."""
    rng = np.random.default_rng(7)
    for _ in range(3):
        disp = rng.integers(0, 5, (32, 128)).astype(np.float32)
        disp[rng.uniform(size=disp.shape) < 0.25] = -1.0
        d = jnp.asarray(disp)
        ref = np.asarray(js.speckle_filter(d, d >= 0, 8, 1.0))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(sp.speckle_filter_pallas(d, 8, 1.0))
        np.testing.assert_array_equal(got, ref)


def test_component_sizes_sorted():
    rng = np.random.default_rng(3)
    lab = rng.integers(0, 17, (23, 41)).astype(np.int32)
    sizes = np.asarray(sp.component_sizes_sorted(jnp.asarray(lab)))
    counts = np.bincount(lab.reshape(-1), minlength=lab.max() + 1)
    np.testing.assert_array_equal(sizes, counts[lab])


@pytest.mark.parametrize("min_disp", [0, 3])
def test_in_kernel_lr_parity(imgs, min_disp):
    """The in-kernel winner-scatter LR check (log-roll shear) matches the
    jnp _winner_scatter_disp2 path bit-for-bit, including min_disp != 0."""
    left, right = imgs
    p = SGBMParams(num_disparities=16, block_size=5, p1=72, p2=288,
                   speckle_window_size=0, min_disparity=min_disp)
    d_ref = np.asarray(js.sgbm(jnp.asarray(left), jnp.asarray(right), p,
                               apply_lr=True))
    with pltpu.force_tpu_interpret_mode():
        d_p = np.asarray(sp.sgbm_pallas(jnp.asarray(left),
                                        jnp.asarray(right), p,
                                        apply_lr=True))
    np.testing.assert_array_equal(d_ref, d_p)


def test_up_wta_fused_parity(cost):
    """Fused up-pass+WTA == separate up pass + wta_lr_pallas."""
    _, _, C_ref = cost
    C = jnp.transpose(jnp.asarray(C_ref), (0, 2, 1))  # (H, D, W)
    P1, P2 = PARAMS.P1, PARAMS.P2
    with pltpu.force_tpu_interpret_mode():
        Ct = jnp.transpose(C, (2, 1, 0))
        S_h = jnp.transpose(
            sp.directional_pass_pallas(Ct, P1, P2, False, False)
            + sp.directional_pass_pallas(Ct, P1, P2, True, False),
            (2, 1, 0))
        S_down = sp.directional_pass_pallas(C, P1, P2, False, True)
        S_up = sp.directional_pass_pallas(C, P1, P2, True, True)
        ref = np.asarray(sp.wta_lr_pallas(S_down, S_up, S_h, PARAMS))
        got = np.asarray(sp.up_wta_pallas(C, S_down, S_h, PARAMS))
    np.testing.assert_array_equal(got, ref)


def test_cost_down_fused_parity(cost):
    """Fused cost+down kernel == separate cost kernel + down pass."""
    lt, rt, C_ref = cost
    with pltpu.force_tpu_interpret_mode():
        C, S3 = sp.build_cost_down_pallas(lt, rt, PARAMS, blk=8)
        S3_ref = sp.directional_pass_pallas(
            jnp.transpose(jnp.asarray(C_ref), (0, 2, 1)),
            PARAMS.P1, PARAMS.P2, False, True)
    np.testing.assert_array_equal(
        np.transpose(np.asarray(C), (0, 2, 1)), C_ref)
    np.testing.assert_array_equal(np.asarray(S3).astype(np.float32),
                                  np.asarray(S3_ref))


def test_transpose_kernels_roundtrip_bfloat16():
    """r4 advisor: the widening workaround for Mosaic's 16-bit shape-cast
    limit must not VALUE-convert 16-bit floats (bitcast, not astype)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(16, 8, 24)), jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        y = sp.transpose_vol_pallas(x)
        back = sp.transpose_vol_pallas(y)
    assert y.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(back, np.float32),
                                  np.asarray(x, np.float32))

    xd = jnp.asarray(rng.normal(size=(8, 16, 128)), jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        yd = sp.transpose_dhw_to_wdh_pallas(xd)
    np.testing.assert_array_equal(
        np.asarray(yd, np.float32),
        np.transpose(np.asarray(xd, np.float32), (2, 0, 1)))


def test_pair_matcher_block_size_one(imgs):
    """r4 advisor: block_size=1 (r=0) used to build a wrong-width band2
    slice ([:, :, -0:] selects everything). Parity vs the generic
    matcher on both eyes."""
    left, right = imgs
    params = SGBMParams(num_disparities=16, block_size=1, p1=8, p2=32,
                        speckle_window_size=0)
    with pltpu.force_tpu_interpret_mode():
        dl, dr = sp.sgbm_pair_pallas(jnp.asarray(left), jnp.asarray(right),
                                     params)
        dl_ref = sp.sgbm_pallas(jnp.asarray(left), jnp.asarray(right),
                                params)
    np.testing.assert_array_equal(np.asarray(dl), np.asarray(dl_ref))
    assert np.asarray(dr).shape == dl_ref.shape
