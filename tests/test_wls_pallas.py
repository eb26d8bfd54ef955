"""Pallas FGS/WLS kernels vs the jnp implementation (interpret mode).

The kernels mirror ops/wls op-for-op, so parity should be essentially
exact; a tiny tolerance covers compiler-scheduled fma differences."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from stereo_depth_ruler_tpu.ops.wls import fgs_filter, wls_disparity_filter
from stereo_depth_ruler_tpu.ops.wls_pallas import (  # noqa: E402
    fgs_filter_pallas, wls_disparity_filter_pallas)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(4)
    guide = rng.uniform(0, 255, (48, 96)).astype(np.float32)
    src = rng.uniform(0, 64, (2, 48, 96)).astype(np.float32)
    return src, guide


def test_fgs_pallas_parity(data):
    """vs the jnp FGS within the f32 conditioning envelope (kappa ~ 2*lam
    amplifies fma-ordering differences; the jnp path itself is only
    bounded to 5e-3 rel vs the float64 exact solver at lam=8000 —
    tests/test_wls.py), AND vs the float64 Thomas anchor with the same
    bound the jnp path must meet."""
    from test_wls import _fgs_np
    src, guide = data
    ref = np.asarray(fgs_filter(jnp.asarray(src), jnp.asarray(guide)))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fgs_filter_pallas(jnp.asarray(src),
                                           jnp.asarray(guide)))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-2)
    exact = _fgs_np(src, guide, 8000.0, 1.1, 3)
    rel = np.abs(got - exact).max() / max(1.0, np.abs(exact).max())
    assert rel < 5e-3, rel


def test_shift_gather_kernel():
    """shift_gather_pallas == take-along-axis with the same clamp/fill
    semantics, including negative and over-range shifts."""
    from stereo_depth_ruler_tpu.ops.wls_pallas import shift_gather_pallas
    rng = np.random.default_rng(9)
    H, W, D = 16, 256, 32
    v = rng.uniform(-5, 90, (H, W)).astype(np.float32)
    s = rng.integers(-3, D + 4, (H, W)).astype(np.int32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(shift_gather_pallas(jnp.asarray(v),
                                             jnp.asarray(s), D, -7.0))
    xs = np.arange(W)[None, :]
    src = xs - s
    # contract (r5): s in [0, max_shift] gathered, anything else filled
    ok = (s >= 0) & (s <= D) & (src >= 0)
    ref = np.where(ok, v[np.arange(H)[:, None], np.clip(src, 0, W - 1)],
                   -7.0)
    np.testing.assert_array_equal(got, ref.astype(np.float32))


def test_wls_pallas_parity(data):
    _, guide = data
    rng = np.random.default_rng(5)
    dl = rng.uniform(0, 32, guide.shape).astype(np.float32)
    dl[rng.uniform(size=dl.shape) < 0.2] = -1.0
    dr = (dl + rng.normal(0, 0.3, dl.shape)).astype(np.float32)
    ref_f, ref_c = wls_disparity_filter(jnp.asarray(dl), jnp.asarray(dr),
                                        jnp.asarray(guide))
    with pltpu.force_tpu_interpret_mode():
        got_f, got_c = wls_disparity_filter_pallas(
            jnp.asarray(dl), jnp.asarray(dr), jnp.asarray(guide))
    np.testing.assert_array_equal(np.asarray(got_c), np.asarray(ref_c))
    gf, rf = np.asarray(got_f), np.asarray(ref_f)
    # invalid markers must agree; filtered values within the FGS envelope
    np.testing.assert_array_equal(gf < 0, rf < 0)
    m = rf >= 0
    np.testing.assert_allclose(gf[m], rf[m], rtol=2e-3, atol=2e-2)
