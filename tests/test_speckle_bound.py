"""Speckle CCL convergence bound (VERDICT r2 weak #4): measure sweep
rounds on natural vs adversarial inputs, and pin the max_iters cap
semantics (capped labels only over-split — the filter can only become
more aggressive, never keep a speckle it would otherwise drop)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from stereo_depth_ruler_tpu.ops import sgbm as js  # noqa: E402
from stereo_depth_ruler_tpu.ops.sgbm import (  # noqa: E402
    _segmented_min_scan, speckle_filter)


def _count_rounds(disp, valid, max_diff):
    """Python-level replica of speckle_filter's convergence loop."""
    H, W = disp.shape
    n = H * W
    labels = np.where(valid, np.arange(n).reshape(H, W), n).astype(np.float32)
    conn_h = np.concatenate(
        [np.zeros((H, 1), bool),
         valid[:, 1:] & valid[:, :-1]
         & (np.abs(disp[:, 1:] - disp[:, :-1]) <= max_diff)], axis=1)
    conn_v = np.concatenate(
        [np.zeros((1, W), bool),
         valid[1:] & valid[:-1]
         & (np.abs(disp[1:] - disp[:-1]) <= max_diff)], axis=0)
    lab = jnp.asarray(labels)
    ch, cvT = jnp.asarray(conn_h), jnp.asarray(conn_v.T)
    rounds = 0
    while True:
        new = _segmented_min_scan(lab, ch)
        new = _segmented_min_scan(new.T, cvT).T
        rounds += 1
        if bool(jnp.all(new == lab)):
            return rounds - 1   # last round made no change
        lab = new


def _serpentine(H, W, pitch=2):
    """Boustrophedon snake: one connected 1-px-wide path covering the
    image with H//(2*pitch) direction double-turns — the adversarial
    case for directional sweeps."""
    disp = -np.ones((H, W), np.float32)
    for r in range(0, H, 2 * pitch):
        disp[r, :] = 5.0                       # horizontal run
        if r + 2 * pitch < H:
            disp[r:r + 2 * pitch + 1, W - 1 if (r // (2 * pitch)) % 2 == 0
                 else 0] = 5.0                 # vertical connector
    return disp


def test_natural_scene_converges_fast():
    from stereo_depth_ruler_tpu.calib.config import StereoRig
    from stereo_depth_ruler_tpu.io.synthetic import (make_scene,
                                                     render_stereo_pair)
    rig = StereoRig.synthetic(width=160, height=96, focal=140.0,
                              baseline_mm=80.0)
    scene = make_scene(rig, n_boxes=4, z_range_mm=(600., 1600.),
                       background_z_mm=3000., seed=2)
    _, _, gt = render_stereo_pair(scene, seed=2)
    disp = gt.astype(np.float32)
    rounds = _count_rounds(disp, disp > 0, 2.0)
    # docstring claim: natural scenes converge in <= 3 rounds
    assert rounds <= 3, rounds


def test_serpentine_worst_case_documented():
    H, W = 64, 96
    disp = _serpentine(H, W, pitch=2)
    rounds = _count_rounds(disp, disp >= 0, 1.0)
    # one round fuses one down-up double-turn of the snake: ~H/(2*pitch)
    assert H // 8 <= rounds <= H // 2, rounds


def test_max_iters_cap_only_oversplits():
    H, W = 64, 96
    disp = jnp.asarray(_serpentine(H, W, pitch=2))
    valid = disp >= 0
    exact = np.asarray(speckle_filter(disp, valid, 40, 1.0))
    capped = np.asarray(speckle_filter(disp, valid, 40, 1.0, max_iters=2))
    # capped result may invalidate more (components split into smaller
    # pieces) but never keeps what exact filtering drops
    assert not np.any(capped & ~exact)
    # and with a cap >= the measured worst case it is identical
    full = np.asarray(speckle_filter(disp, valid, 40, 1.0, max_iters=64))
    np.testing.assert_array_equal(full, exact)
