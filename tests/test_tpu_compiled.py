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


def test_compiled_pair_shared_cost():
    """Compiled sgbm_pair_pallas (shared sheared cost volume, mirror_lr
    WTA) matches the stacked two-matcher construction bit-exactly."""
    import jax.numpy as jnp
    from stereo_depth_ruler_tpu.ops.sgbm import SGBMParams
    from stereo_depth_ruler_tpu.ops.sgbm_pallas import (sgbm_pair_pallas,
                                                        sgbm_pallas)

    params = SGBMParams(num_disparities=128, block_size=5,
                        speckle_window_size=200, speckle_range=2)
    left, right = _pair(720, 1280, seed=7)

    def stacked(l, r):
        pair_l = jnp.stack([l, r[:, ::-1]])
        pair_r = jnp.stack([r, l[:, ::-1]])
        dd = jax.vmap(lambda a, b: sgbm_pallas(a, b, params))(pair_l,
                                                              pair_r)
        return dd[0], dd[1][:, ::-1]

    o1 = jax.jit(stacked)(left, right)
    o2 = jax.jit(lambda l, r: sgbm_pair_pallas(l, r, params))(left, right)
    np.testing.assert_array_equal(np.asarray(o1[0]), np.asarray(o2[0]))
    np.testing.assert_array_equal(np.asarray(o1[1]), np.asarray(o2[1]))


def test_compiled_wls_pallas_matches_jnp():
    """Compiled Pallas FGS/WLS (r4: wired into the pipeline) vs the jnp
    FGS at matcher resolution. The kernels mirror ops/wls op-for-op but
    Mosaic schedules fmas differently, so parity is bounded by the f32
    conditioning envelope (same bound as the interpret-mode test)."""
    from stereo_depth_ruler_tpu.ops.wls import wls_disparity_filter
    from stereo_depth_ruler_tpu.ops.wls_pallas import \
        wls_disparity_filter_pallas

    rng = np.random.default_rng(11)
    H, W = 360, 640
    guide = rng.uniform(0, 255, (H, W)).astype(np.float32)
    dl = rng.uniform(0, 80, (H, W)).astype(np.float32)
    dl[rng.uniform(size=dl.shape) < 0.2] = -1.0
    dr = (dl + rng.normal(0, 0.3, dl.shape)).astype(np.float32)
    ref_f, ref_c = jax.jit(wls_disparity_filter)(dl, dr, guide)
    got_f, got_c = jax.jit(wls_disparity_filter_pallas)(dl, dr, guide)
    np.testing.assert_array_equal(np.asarray(got_c), np.asarray(ref_c))
    gf, rf = np.asarray(got_f), np.asarray(ref_f)
    np.testing.assert_array_equal(gf < 0, rf < 0)
    m = rf >= 0
    np.testing.assert_allclose(gf[m], rf[m], rtol=2e-3, atol=2e-2)


def test_compiled_pipeline_wls_kernel_parity():
    """Full StereoPipeline forward with wls_kernel='pallas' (the TPU
    default) vs 'jnp': disparities agree within the FGS envelope and the
    valid masks match."""
    from stereo_depth_ruler_tpu.pipeline import (PipelineConfig,
                                                 StereoPipeline)
    from stereo_depth_ruler_tpu.calib.config import StereoRig

    left, right = _pair(720, 1280, seed=3)
    rig = StereoRig.synthetic(width=1280, height=720)
    outs = {}
    for wk in ("pallas", "jnp"):
        cfg = PipelineConfig(wls_kernel=wk)
        pipe = StereoPipeline(rig, cfg, rectify=False)
        outs[wk] = np.asarray(pipe.process_pair(left, right)["disparity"])
    gp, gj = outs["pallas"], outs["jnp"]
    np.testing.assert_array_equal(gp < 0, gj < 0)
    m = gj >= 0
    np.testing.assert_allclose(gp[m], gj[m], rtol=2e-3, atol=2e-2)


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
