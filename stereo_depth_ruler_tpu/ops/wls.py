"""Edge-preserving WLS disparity post-filter (Fast Global Smoother).

TPU-native counterpart of the reference's
``cv::ximgproc::createDisparityWLSFilter`` stage (λ=8000, σ_color=1.1,
stereo_disparity.cpp:11-13, applied at :30-31): a weighted-least-squares
smoothing of the left disparity guided by the left image, with confidence
from left-right consistency.

Algorithm: the Fast Global Smoother (Min et al., 2014 — what OpenCV's WLS
filter uses internally). Each iteration solves 1D spatially-varying
tridiagonal systems along rows then columns:

    (I + λ_t A_w) u = f ,   λ_t = 1.5 λ 4^{T-t-1} / (4^T − 1)

with Laplacian weights w(p,q) = exp(−|I_p − I_q| / σ). The tridiagonal
solve is *exact* and O(log N) depth on TPU: the Thomas forward elimination
is a linear-fractional recurrence lifted to homogeneous 3-vectors
(u, v, w) — so cumulative 3x3 matrix products under
`lax.associative_scan` (normalized each combine; the final u/w, v/w
division cancels the scale) — and the back substitution is an affine
recurrence scanned in reverse. All rows/columns solve in parallel: the TPU
sees (H, W)-shaped elementwise ops and log₂N scan levels instead of W
sequential steps.

Confidence-weighted filtering uses the homogeneous trick:
u = FGS(c·f) / FGS(c) with c = 1 on LR-consistent pixels, 0 elsewhere —
so invalid regions are inpainted from confident neighbors, matching the
qualitative behavior of the reference's filtered maps.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["tridiag_solve", "fgs_filter", "wls_disparity_filter"]


def _mobius_combine(ea, eb):
    """Compose homogeneous Thomas-elimination steps (3x3 matmul, normalized).

    With associative_scan convention combine(prefix, next) — eb is applied
    after ea: P = M_b @ M_a.
    """
    out = jnp.einsum("...ij,...jk->...ik", eb, ea)
    norm = jnp.max(jnp.abs(out), axis=(-2, -1), keepdims=True)
    return out / jnp.maximum(norm, 1e-30)


def _affine_combine_rev(ea, eb):
    """Compose affine back-substitution elements for a reverse scan.

    Element i encodes u_i = α_i·u_{i+1} + β_i. In a reversed
    associative_scan, combine(a, b) receives a = element closer to the end
    of the array having already absorbed its suffix; result encodes
    u_i(before b) in terms of the suffix: u_b = α_b·(suffix a) + β_b.
    """
    aa, ba = ea
    ab, bb = eb
    return aa * ab, ab * ba + bb


def tridiag_solve(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray,
                  d: jnp.ndarray, refine: int = 1) -> jnp.ndarray:
    """Solve tridiagonal systems along the last axis, batched.

    a: sub-diagonal (a[..., 0] ignored/0), b: diagonal, c: super-diagonal
    (c[..., -1] ignored/0), d: RHS. Exact Thomas algorithm evaluated with
    O(log N) associative scans (see module docstring). Requires diagonally
    dominant systems (true for the FGS matrices by construction).

    The systems are Jacobi-preconditioned (rows scaled by 1/diag) so the
    scan matrices stay O(1), and ``refine`` steps of iterative refinement
    recover the f32 bits the log-depth product loses at large λ.
    """
    inv_b = 1.0 / b
    a_s, c_s, d_s = a * inv_b, c * inv_b, d * inv_b
    u = _tridiag_solve_scan(a_s, jnp.ones_like(b), c_s, d_s)
    for _ in range(refine):
        # residual of the original system: r = d - (a·u₋ + b·u + c·u₊)
        u_m = jnp.concatenate([jnp.zeros_like(u[..., :1]), u[..., :-1]],
                              axis=-1)
        u_p = jnp.concatenate([u[..., 1:], jnp.zeros_like(u[..., :1])],
                              axis=-1)
        r = d - (a * u_m + b * u + c * u_p)
        e = _tridiag_solve_scan(a_s, jnp.ones_like(b), c_s, r * inv_b)
        u = u + e
    return u


def _tridiag_solve_scan(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray,
                        d: jnp.ndarray) -> jnp.ndarray:
    shape = a.shape
    N = shape[-1]
    z = jnp.zeros_like(a)
    # M_i = [[0,0,c_i],[0,-a_i,d_i],[-a_i,0,b_i]]
    M = jnp.stack([
        jnp.stack([z, z, c], axis=-1),
        jnp.stack([z, -a, d], axis=-1),
        jnp.stack([-a, z, b], axis=-1),
    ], axis=-2)                                    # (..., N, 3, 3)
    P = jax.lax.associative_scan(_mobius_combine, M, axis=M.ndim - 3)
    # apply to initial state (0, 0, 1): picks column 2
    u = P[..., 0, 2]
    v = P[..., 1, 2]
    w = P[..., 2, 2]
    wsafe = jnp.where(jnp.abs(w) < 1e-30, 1e-30, w)
    cp = u / wsafe                                 # c'_i
    dp = v / wsafe                                 # d'_i
    # back substitution: u_i = d'_i - c'_i u_{i+1}; last: u = d'
    alpha = -cp
    beta = dp
    alpha = alpha.at[..., -1].set(0.0)
    A, B = jax.lax.associative_scan(
        _affine_combine_rev, (alpha, beta), axis=alpha.ndim - 1,
        reverse=True)
    return B


def _fgs_pass_lastaxis(u: jnp.ndarray, guide: jnp.ndarray,
                       lam: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """One horizontal FGS sweep (systems along the last axis)."""
    diff = jnp.abs(guide[..., 1:] - guide[..., :-1])
    w = jnp.exp(-diff / sigma)                     # weight between i,i+1
    zero = jnp.zeros_like(u[..., :1])
    w_r = jnp.concatenate([w, zero], axis=-1)      # weight to right nbr
    w_l = jnp.concatenate([zero, w], axis=-1)      # weight to left nbr
    a = -lam * w_l
    c = -lam * w_r
    b = 1.0 + lam * (w_l + w_r)
    return tridiag_solve(a, b, c, u)


def fgs_filter(src: jnp.ndarray, guide: jnp.ndarray,
               lam: float = 8000.0, sigma_color: float = 1.1,
               num_iters: int = 3) -> jnp.ndarray:
    """Fast Global Smoother: edge-aware smoothing of ``src`` (H, W) guided
    by ``guide`` (H, W); λ/σ defaults are the reference's WLS settings
    (stereo_disparity.cpp:11-13)."""
    u = src.astype(jnp.float32)
    g = guide.astype(jnp.float32)
    gT = jnp.swapaxes(g, -1, -2)
    denom = 4.0 ** num_iters - 1.0
    for t in range(num_iters):
        lam_t = jnp.float32(1.5 * lam * (4.0 ** (num_iters - t - 1)) / denom)
        u = _fgs_pass_lastaxis(u, g, lam_t, sigma_color)
        u = jnp.swapaxes(
            _fgs_pass_lastaxis(jnp.swapaxes(u, -1, -2), gT, lam_t,
                               sigma_color), -1, -2)
    return u


def wls_disparity_filter(disp_left: jnp.ndarray, disp_right: jnp.ndarray,
                         guide: jnp.ndarray,
                         lam: float = 8000.0, sigma_color: float = 1.1,
                         lrc_thresh: float = 24.0 / 16.0,
                         num_iters: int = 3
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Confidence-weighted WLS filtering of a left/right disparity pair.

    The reference's wls_filter->filter(displ, left, filtered, dispr)
    (stereo_disparity.cpp:30-31). Confidence = 1 on pixels that are valid
    and LR-consistent within ``lrc_thresh`` px, else 0; output is
    FGS(conf·disp)/FGS(conf) — low-confidence regions are inpainted.

    Returns (filtered_disparity, confidence). Pixels with near-zero
    smoothed confidence are marked -1.0 (invalid).
    """
    H, W = disp_left.shape
    xs = jnp.arange(W)[None, :].astype(jnp.float32)
    xr = jnp.round(xs - disp_left).astype(jnp.int32)
    xr_ok = (xr >= 0) & (xr < W)
    dr = jnp.take_along_axis(disp_right, jnp.clip(xr, 0, W - 1), axis=1)
    consistent = (jnp.abs(dr - disp_left) <= lrc_thresh) & (dr >= 0)
    conf = ((disp_left >= 0) & jnp.where(xr_ok, consistent, False)
            ).astype(jnp.float32)

    num = fgs_filter(conf * jnp.maximum(disp_left, 0.0), guide, lam,
                     sigma_color, num_iters)
    den = fgs_filter(conf, guide, lam, sigma_color, num_iters)
    filtered = jnp.where(den > 1e-3, num / jnp.maximum(den, 1e-6), -1.0)
    return filtered, conf
