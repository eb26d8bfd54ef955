"""Compiled-Mosaic parity gate (VERDICT r1 item 8): the Pallas kernels
compiled for a real TPU must match the jnp scan matcher bit-exactly.

Interpret-mode tests (test_sgbm_pallas.py) validate kernel *logic* on the
CPU mesh; this file validates the *compiled* Mosaic path — layout rules,
int16 bias packing, fused-WTA branches — on hardware. Run it in the bench
environment as the ONLY JAX process:

    SDR_TEST_TPU=1 python -m pytest tests/test_tpu_compiled.py -v

It skips automatically on CPU backends (the default test configuration).
"""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="compiled-Mosaic parity needs a TPU (SDR_TEST_TPU=1)")


def _pair(H, W, seed=0):
    from stereo_depth_ruler_tpu.calib.config import StereoRig
    from stereo_depth_ruler_tpu.io.synthetic import (make_scene,
                                                     render_stereo_pair)
    rig = StereoRig.synthetic(width=W, height=H)
    scene = make_scene(rig, n_boxes=5, z_range_mm=(900.0, 4000.0),
                       background_z_mm=6000.0, seed=seed)
    left, right, _ = render_stereo_pair(scene, seed=seed)
    return np.float32(left), np.float32(right)


@pytest.mark.parametrize("D,fused", [(128, True), (128, False), (256, True)])
def test_compiled_pallas_matches_jnp(D, fused):
    """Bit parity of the compiled fused path (int16 bias shift, packed
    argmin, winner-scatter LR) vs the jnp scan matcher at the headline
    and sweep disparity counts."""
    from stereo_depth_ruler_tpu.ops.sgbm import SGBMParams, sgbm
    from stereo_depth_ruler_tpu.ops.sgbm_pallas import sgbm_pallas

    H, W = (720, 1280) if D == 128 else (240, 1280)
    params = SGBMParams(num_disparities=D, block_size=5,
                        speckle_window_size=200, speckle_range=2)
    left, right = _pair(H, W)
    dp = np.asarray(jax.jit(
        lambda a, b: sgbm_pallas(a, b, params, fused_wta=fused))(left, right))
    dj = np.asarray(jax.jit(lambda a, b: sgbm(a, b, params))(left, right))
    assert np.array_equal(dp, dj), f"diff frac {(dp != dj).mean():.4f}"


def test_compiled_sharded_single_device_mesh():
    """kernel='pallas' sharded path on a 1-device mesh matches the
    unsharded compiled matcher (halo plumbing is the identity here)."""
    from stereo_depth_ruler_tpu.ops.sgbm import SGBMParams
    from stereo_depth_ruler_tpu.ops.sgbm_pallas import sgbm_pallas
    from stereo_depth_ruler_tpu.parallel.mesh import make_mesh
    from stereo_depth_ruler_tpu.parallel.sharded import sgbm_sharded

    params = SGBMParams(num_disparities=128, block_size=5,
                        speckle_window_size=200, speckle_range=2)
    left, right = _pair(720, 1280)
    mesh = make_mesh(tile=1, devices=jax.devices()[:1])
    ds = np.asarray(sgbm_sharded(left, right, params, mesh,
                                 kernel="pallas"))
    du = np.asarray(jax.jit(
        lambda a, b: sgbm_pallas(a, b, params))(left, right))
    assert np.array_equal(ds, du)
