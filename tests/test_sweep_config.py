"""The 2560x1440x256 sweep configuration (SURVEY §5 long-context analog):
kernel correctness at full sweep W and D with reduced H (interpret mode —
the full volume is 1.9 GB; the driver bench covers the full-size TPU run
via `bench.py --sweep`)."""

import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from stereo_depth_ruler_tpu.ops.sgbm import SGBMParams, sgbm
from stereo_depth_ruler_tpu.ops.sgbm_pallas import sgbm_pallas

SWEEP_W, SWEEP_D = 2560, 256


def test_sweep_width_and_disp_interpret():
    """W=2560 (20 lane tiles) x D=256 (int32 argmin packing, int16 bias
    branch) at reduced H: the Pallas path must match jnp bit-exactly."""
    rng = np.random.default_rng(0)
    H = 16
    left = rng.uniform(0, 255, (H, SWEEP_W)).astype(np.float32)
    right = np.roll(left, -9, axis=1).astype(np.float32)
    params = SGBMParams(num_disparities=SWEEP_D, block_size=5,
                        speckle_window_size=0)
    with pltpu.force_tpu_interpret_mode():
        dp = np.asarray(sgbm_pallas(left, right, params))
    dj = np.asarray(sgbm(left, right, params))
    np.testing.assert_array_equal(dp, dj)


def test_sweep_vmem_block_autotune():
    """The VMEM-aware block chooser must shrink the cost block so the
    (blk, D, W) output block stays within the 32 MB budget at sweep size
    (blk=48 would be 63 MB — uncompilable double-buffered)."""
    import jax.numpy as jnp
    itemsize = 2
    blk = 48
    while (blk > 8
           and blk * SWEEP_D * SWEEP_W * itemsize > 32 * 1024 * 1024):
        blk //= 2
    assert blk * SWEEP_D * SWEEP_W * itemsize <= 32 * 1024 * 1024
    assert blk >= 8
