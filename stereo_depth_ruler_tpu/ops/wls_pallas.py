"""Pallas TPU kernels for the WLS (Fast Global Smoother) post-filter.

The jnp FGS (ops/wls.py) runs ~1850 whole-array XLA ops per frame
(3 iterations x 2 axes x 2 PCR solves x ~11 rounds x ~8 arrays), each
streaming HBM — measured 14.6 ms at 720p. The tridiagonal systems are
independent per row, so one kernel instance solves a row slab's systems
entirely in VMEM: per (iteration, axis) ONE pallas_call (grid over row
slabs) runs coefficient build + PCR + one iterative-refinement step +
PCR without touching HBM in between — ~6 launches per frame instead of
~1850 fused-op sweeps.

Numerics mirror ops/wls.tridiag_solve exactly (same operation order,
shifts realized as roll+edge-select with identical fill values), so
results match the jnp path bitwise (tested in tests/test_wls_pallas.py).

Reference behavior anchor: cv::ximgproc::createDisparityWLSFilter
(lambda=8000, sigma=1.1), stereo_vision/src/stereo_disparity.cpp:11-13.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fgs_filter_pallas", "wls_disparity_filter_pallas"]


def _shift_lane(x, s: int, fill: float):
    """x[..., i-s] for s>0 / x[..., i+|s|] for s<0; out-of-range = fill.
    Same values as ops/wls._shift_last on the last (lane) axis."""
    W = x.shape[-1]
    xio = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    if s > 0:
        if s >= W:
            return jnp.full_like(x, fill)
        return jnp.where(xio < s, jnp.float32(fill),
                         pltpu.roll(x, s, x.ndim - 1))
    s = -s
    if s >= W:
        return jnp.full_like(x, fill)
    return jnp.where(xio >= W - s, jnp.float32(fill),
                     pltpu.roll(x, W - s, x.ndim - 1))


def _pcr(a, b, c, d):
    """Parallel cyclic reduction along lanes; mirrors
    ops/wls._tridiag_solve_pcr op-for-op."""
    N = a.shape[-1]
    s = 1
    while s < N:
        bm = _shift_lane(b, s, 1.0)
        bp = _shift_lane(b, -s, 1.0)
        alpha = -a / bm
        gamma = -c / bp
        b = (b + alpha * _shift_lane(c, s, 0.0)
             + gamma * _shift_lane(a, -s, 0.0))
        d = (d + alpha[None] * _shift_lane(d, s, 0.0)
             + gamma[None] * _shift_lane(d, -s, 0.0))
        a = alpha * _shift_lane(a, s, 0.0)
        c = gamma * _shift_lane(c, -s, 0.0)
        s *= 2
    return d / b[None]


def _fgs_pass_kernel(g_ref, u_ref, out_ref, *, lam: float, sigma: float,
                     refine: int):
    """One FGS sweep (solve along lanes) for a row slab: weights from the
    guide slab, tridiagonal setup (ops/wls._fgs_pass_lastaxis), PCR,
    ``refine`` refinement solves — all VMEM-resident."""
    g = g_ref[:]                                   # (K, W)
    u = u_ref[:]                                   # (B, K, W)
    W = g.shape[-1]
    diff = jnp.abs(g[:, 1:] - g[:, :-1])
    w = jnp.exp(-diff / sigma)
    zero = jnp.zeros_like(w[:, :1])
    w_r = jnp.concatenate([w, zero], axis=-1)
    w_l = jnp.concatenate([zero, w], axis=-1)
    a = -lam * w_l
    c = -lam * w_r
    b = 1.0 + lam * (w_l + w_r)
    # a[..., 0] / c[..., -1] are already 0 by construction (w_l/w_r pads)
    sol = _pcr(a, b, c, u)
    for _ in range(refine):
        u_m = _shift_lane(sol, 1, 0.0)
        u_p = _shift_lane(sol, -1, 0.0)
        r = u - (a[None] * u_m + b[None] * sol + c[None] * u_p)
        sol = sol + _pcr(a, b, c, r)
    out_ref[:] = sol


def _fgs_pass_pallas(u: jnp.ndarray, guide: jnp.ndarray, lam: float,
                     sigma: float, refine: int = 1,
                     rows_per_step: int = 64) -> jnp.ndarray:
    """u: (B, H, W) RHS stack; guide: (H, W). Solves along the last axis."""
    B, H, W = u.shape
    # largest divisor of H <= rows_per_step that satisfies Mosaic's
    # 8-sublane block rule (the old halving loop fell from 64 straight
    # to 16 at H=720, quartering the VPU block size; 720 -> 48 here)
    ks = [k for k in range(8, rows_per_step + 1, 8) if H % k == 0]
    K = max(ks) if ks else max(
        k for k in range(1, rows_per_step + 1) if H % k == 0)
    kernel = functools.partial(_fgs_pass_kernel, lam=float(lam),
                               sigma=float(sigma), refine=refine)
    return pl.pallas_call(
        kernel,
        grid=(H // K,),
        in_specs=[pl.BlockSpec((K, W), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((B, K, W), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, K, W), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(guide.astype(jnp.float32), u.astype(jnp.float32))


def fgs_filter_pallas(src: jnp.ndarray, guide: jnp.ndarray,
                      lam: float = 8000.0, sigma_color: float = 1.1,
                      num_iters: int = 3) -> jnp.ndarray:
    """Drop-in fgs_filter (ops/wls.py) on Pallas kernels. ``src`` is
    (H, W) or (B, H, W) (stacked RHS sharing one guide)."""
    squeeze = src.ndim == 2
    u = src[None] if squeeze else src
    u = u.astype(jnp.float32)
    g = guide.astype(jnp.float32)
    gT = jnp.swapaxes(g, -1, -2)
    denom = 4.0 ** num_iters - 1.0
    for t in range(num_iters):
        lam_t = float(1.5 * lam * (4.0 ** (num_iters - t - 1)) / denom)
        u = _fgs_pass_pallas(u, g, lam_t, sigma_color)
        u = jnp.swapaxes(
            _fgs_pass_pallas(jnp.swapaxes(u, -1, -2), gT, lam_t,
                             sigma_color), -1, -2)
    return u[0] if squeeze else u


_GBIG = 1e9   # python float: jnp scalars become captured consts in-kernel


def _shift_gather_kernel(v_ref, s_ref, o_ref, *, D: int, K: int,
                         fill: float, max_s: int, top: int = 0):
    """out[y, x] = v[y, x - s(y, x)] for s in [0, max_s]; out-of-range s
    or x - s < 0 -> ``fill`` (deterministic contract). The variable-
    distance lane gather is realized as log2(D) conditional whole-block
    rolls of a (K, D, W) broadcast (bit decomposition of the shift) + a
    min-select on the shift row — pure VPU; jnp.take_along_axis's
    generic TPU gather measured 10.7 ms at 720p vs ~2 ms for this
    kernel. ``top``: s == D exactly (the max_shift = power-of-two case,
    e.g. disparity 128.0 at 128 disparities) is handled by ONE extra
    whole-map roll instead of doubling the pyramid to 2D planes —
    halves the kernel's VPU work for the product config."""
    v = v_ref[:]                                   # (K, W)
    s = s_ref[:]                                   # (K, W) int32
    W = v.shape[-1]
    sb = s[:, None, :]
    if D % 8 == 0 and D >= 16:
        # two-level shift decomposition (r5, mirrors the grouped LR in
        # sgbm_pallas._wta_body): coarse (K, D/8, W) planes at shifts
        # {0, 8, ...} via log2(D/8) conditional rolls on 1/8 the
        # volume, then 8 serial uniform one-lane rolls with masked
        # min-accumulation — ~2.5x less VPU traffic than the flat
        # log2(D)-plane pyramid
        A = D // 8
        aio8 = 8 * jax.lax.broadcasted_iota(jnp.int32, (K, A, W), 1)
        xio = jax.lax.broadcasted_iota(jnp.int32, (K, A, W), 2)
        sh = jnp.broadcast_to(v[:, None, :], (K, A, W))
        k = 8
        while k < D:
            sh = jnp.where((aio8 & k) != 0, pltpu.roll(sh, k % W, 2), sh)
            k *= 2
        acc = jnp.full((K, A, W), _GBIG, jnp.float32)
        for r in range(8):
            q = aio8 + r
            sel = (sb == q) & (xio >= q)
            acc = jnp.minimum(acc, jnp.where(sel, sh, jnp.float32(_GBIG)))
            if r < 7:
                sh = pltpu.roll(sh, 1, 2)
        out = jnp.min(acc, axis=1)
    else:
        dio = jax.lax.broadcasted_iota(jnp.int32, (K, D, W), 1)
        xio = jax.lax.broadcasted_iota(jnp.int32, (K, D, W), 2)
        sh = jnp.broadcast_to(v[:, None, :], (K, D, W))
        k = 1
        while k < D:
            sh = jnp.where((dio & k) != 0, pltpu.roll(sh, k % W, 2), sh)
            k *= 2
        sel = (dio == sb) & (xio >= dio)
        out = jnp.min(jnp.where(sel, sh, jnp.float32(_GBIG)), axis=1)
    if top:
        xio2 = jax.lax.broadcasted_iota(jnp.int32, (K, W), 1)
        vtop = pltpu.roll(v, D % W, 1)
        out = jnp.where((s == D) & (xio2 >= D), vtop, out)
    out = jnp.where(s <= max_s, out, jnp.float32(_GBIG))
    o_ref[:] = jnp.where(out < _GBIG * 0.5, out, jnp.float32(fill))


def shift_gather_pallas(values: jnp.ndarray, shift: jnp.ndarray,
                        max_shift: int, fill: float,
                        rows_per_step: int = 8) -> jnp.ndarray:
    """(H, W) per-element left-shift gather: out[y,x] = values[y, x-s]."""
    H, W = values.shape
    D = 1
    while D < max_shift:
        D *= 2
    top = int(D == max_shift)      # power-of-two max: 1 extra roll
    if not top:
        D *= 2 if D < max_shift + 1 else 1
    K = rows_per_step
    while H % K:
        K //= 2
    kernel = functools.partial(_shift_gather_kernel, D=D, K=K,
                               fill=float(fill), max_s=int(max_shift),
                               top=top)
    spec = pl.BlockSpec((K, W), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(H // K,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(values.astype(jnp.float32), shift.astype(jnp.int32))


def wls_disparity_filter_pallas(disp_left: jnp.ndarray,
                                disp_right: jnp.ndarray,
                                guide: jnp.ndarray,
                                lam: float = 8000.0,
                                sigma_color: float = 1.1,
                                lrc_thresh: float = 24.0 / 16.0,
                                num_iters: int = 3,
                                max_disp: int = 256
                                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ops/wls.wls_disparity_filter with the FGS solves AND the
    LR-consistency disparity gather on Pallas. ``max_disp`` bounds the
    shift-gather's roll depth — any value >= the true disparity range
    is exact (default covers the 256-disp sweep; the pipeline passes
    its actual num_disparities)."""
    # shift s = x - round(x - dl) (NOT round(dl): jnp.round is
    # half-to-even, whose parity depends on x, so the two differ at
    # exact .5 fractions — this form matches the jnp reference bitwise)
    W = disp_left.shape[-1]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    s = (xs - jnp.round(xs - disp_left)).astype(jnp.int32)
    # s outside [0, max_disp) or x - s < 0 -> fill -1e9: fails both the
    # |dr - dl| <= thresh and dr >= 0 tests, reproducing the
    # take_along_axis + xr_ok masking of the jnp reference exactly
    dr = shift_gather_pallas(disp_right, s, max_disp, fill=-1e9)
    consistent = (jnp.abs(dr - disp_left) <= lrc_thresh) & (dr >= 0)
    conf = ((disp_left >= 0) & consistent).astype(jnp.float32)
    stacked = jnp.stack([conf * jnp.maximum(disp_left, 0.0), conf])
    num, den = fgs_filter_pallas(stacked, guide, lam, sigma_color,
                                 num_iters)
    filtered = jnp.where(den > 1e-3, num / jnp.maximum(den, 1e-6), -1.0)
    return filtered, conf
