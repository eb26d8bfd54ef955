"""WLS / Fast Global Smoother: exact tridiagonal solve vs scipy, smoothing
behavior, confidence-weighted filtering."""

import numpy as np
import pytest

from stereo_depth_ruler_tpu.ops.wls import (fgs_filter, tridiag_solve,
                                            wls_disparity_filter)


def _random_fgs_system(rng, B, N, lam):
    w = rng.random((B, N - 1)).astype(np.float64)
    a = np.zeros((B, N))
    a[:, 1:] = -lam * w
    c = np.zeros((B, N))
    c[:, :-1] = -lam * w
    b = np.ones((B, N))
    b[:, 1:] += lam * w
    b[:, :-1] += lam * w
    d = (rng.random((B, N)) * 100).astype(np.float64)
    return a, b, c, d


# accuracy is f32-conditioning-limited: κ(T) ≈ 2λ, so expected rel err
# ≈ κ·ε_f32; tolerances scale accordingly (λ=8000 → ~1e-3).
@pytest.mark.parametrize("lam,tol", [(10.0, 1e-5), (500.0, 3e-4),
                                     (8000.0, 5e-3)])
def test_tridiag_vs_scipy(lam, tol):
    from scipy.linalg import solve_banded
    rng = np.random.default_rng(0)
    B, N = 4, 257
    a, b, c, d = _random_fgs_system(rng, B, N, lam)
    ours = np.asarray(tridiag_solve(np.float32(a), np.float32(b),
                                    np.float32(c), np.float32(d)))
    for i in range(B):
        ab = np.zeros((3, N))
        ab[0, 1:] = c[i, :-1]
        ab[1] = b[i]
        ab[2, :-1] = a[i, 1:]
        ref = solve_banded((1, 1), ab, d[i])
        rel = np.abs(ours[i] - ref).max() / max(1.0, np.abs(ref).max())
        assert rel < tol, f"lam={lam} row={i} rel={rel}"


def test_fgs_smooths_but_preserves_edges():
    rng = np.random.default_rng(1)
    H, W = 64, 96
    guide = np.zeros((H, W), np.float32)
    guide[:, W // 2:] = 200.0              # strong edge in the guide
    signal = np.where(guide > 0, 30.0, 10.0).astype(np.float32)
    noisy = signal + rng.normal(0, 2.0, (H, W)).astype(np.float32)
    out = np.asarray(fgs_filter(noisy, guide, lam=800.0, sigma_color=1.1))
    # noise suppressed within regions
    assert out[:, :W // 2 - 2].std() < noisy[:, :W // 2 - 2].std() * 0.5
    # edge preserved: region means stay distinct
    assert abs(out[:, :W // 2 - 2].mean() - 10.0) < 1.0
    assert abs(out[:, W // 2 + 2:].mean() - 30.0) < 1.0


def test_wls_inpaints_invalid_regions():
    rng = np.random.default_rng(2)
    H, W = 48, 64
    disp = np.full((H, W), 20.0, np.float32)
    disp += rng.normal(0, 0.3, (H, W)).astype(np.float32)
    holes = rng.random((H, W)) < 0.3
    disp_l = np.where(holes, -1.0, disp).astype(np.float32)
    disp_r = disp.astype(np.float32)      # consistent where valid
    guide = np.full((H, W), 128.0, np.float32)
    filt, conf = wls_disparity_filter(disp_l, disp_r, guide)
    filt = np.asarray(filt)
    assert (filt >= 0).mean() > 0.99
    assert np.abs(filt - 20.0).mean() < 0.5
