"""Pallas TPU kernels for SGBM — the performance core of the framework.

Replaces the `lax.scan` aggregation of ops/sgbm.py (bit-compatible — all
cost math is exact small-integer arithmetic in f32) with hand-written
Mosaic kernels designed around the TPU memory system:

Layout: the cost volume is stored **(H, D, W)** — W on lanes (1280 = 10
full 128-lane tiles at the headline config), D on the leading axis so every
DP step is a dense (D, W) VPU block and WTA reduces over the leading axis.

Kernels:
- ``_cost_box_kernel`` — fused Birchfield–Tomasi + 5x5 box aggregation.
  Grid over row blocks; left/right Sobel-clipped images (pre-padded on the
  host: ±2 edge rows, and the right family left-padded D columns with
  column-0 replication so the d-shift is a static-width dynamic slice)
  stream HBM→VMEM; the d loop writes one (BLK, W) plane of the output
  block per disparity.
- ``_dir_pass_kernel`` — one directional DP pass. Grid is the sequential
  scan axis (rows for vertical, columns of the transposed volume for
  horizontal); per step the carries L_r live in VMEM as (D, W) blocks, the
  SGM update runs as ~10 VPU ops, and Pallas's grid pipeline double-buffers
  the (D, 1, W) cost slabs from HBM. Vertical passes fuse the 3 paths
  (vertical + both diagonals, realized as ±1 lane shifts of the carry);
  horizontal passes run on the XLA-transposed volume with diagonals off.

8-path fused total: cost kernel + 2 horizontal passes (fwd, bwd with
fused accumulate) on the transposed volume + down pass (accumulating
S_h, bias-shifted into int16) + the fused up+WTA kernel, which also
runs the winner-scatter LR-consistency check in-kernel (log2(D)
whole-block rolls of the packed-winner map — the r2 XLA 128-shift
variant measured 11 ms/frame slower); speckle runs as the Pallas CCL
kernel + sort-based component sizes. Exact numeric parity
with the oracle-pinned spec (interpret-mode tests in
tests/test_sgbm_pallas.py; compiled-Mosaic parity on hardware in
tests/test_tpu_compiled.py).

Reference for what this implements: the OpenCV SGBM stage the reference
constructs at stereo_vision/src/stereo_disparity.cpp:4-14.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sgbm import SGBMParams, _bt_minmax, lr_check, sobel_clip, speckle_filter, wta

__all__ = ["build_cost_volume_pallas", "build_cost_down_pallas",
           "directional_pass_pallas", "transpose_dhw_to_wdh_pallas",
           "transpose_vol_pallas", "transpose_leading_pallas",
           "aggregate_paths_pallas", "aggregate_paths_pallas_hdw",
           "wta_lr_pallas", "up_wta_pallas", "sgbm_pallas",
           "sgbm_pair_pallas",
           "sgbm_tile_pallas"]

_BIG = 1e9
_BIGI = 2 ** 28   # "infinity" for int32 DP (headroom: + P2 stays < 2^31)


def _sgm_update(c, Lprev, P1, P2, dio=None):
    """One SGM DP step: c + min(Lprev, minL+P2, min(lm1, lp1)+P1) - minL.

    ``dio``: pre-built (D, W) iota over d. When provided, the d±1
    neighbor shifts run as cyclic sublane rolls + boundary masks —
    bit-identical to the unaligned concatenate-slice form but lowered by
    Mosaic to whole-vreg rotates instead of sublane-misaligned copies
    (r5 A/B: see tools/ab_r5.py). None keeps the concat form."""
    D, W = Lprev.shape
    minL = jnp.min(Lprev, axis=0, keepdims=True)
    if dio is None:
        big = jnp.full((1, W), _BIG, jnp.float32)
        lm1 = jnp.concatenate([big, Lprev[:D - 1]], axis=0)
        lp1 = jnp.concatenate([Lprev[1:], big], axis=0)
    else:
        lm1 = jnp.where(dio == 0, _BIG, pltpu.roll(Lprev, 1, 0))
        lp1 = jnp.where(dio == D - 1, _BIG, pltpu.roll(Lprev, D - 1, 0))
    best = jnp.minimum(jnp.minimum(Lprev, minL + P2),
                       jnp.minimum(lm1, lp1) + P1)
    return c + best - minL


# ---------------------------------------------------------------------------
# cost volume build (fused BT + box filter), output (D, H, W)
# ---------------------------------------------------------------------------


def _cost_box_kernel(lt_ref, lmin_ref, lmax_ref,
                     rt_ref, rmin_ref, rmax_ref,
                     out_ref, out2_ref=None, *, D: int, blk: int,
                     block_size: int, out_dtype, group: int = 8):
    """One program computes out rows [i*blk, (i+1)*blk) for all D.

    Row inputs are pre-padded by ``r`` rows top+bottom on the host, so the
    (blk + 2r) window starting at i*blk is always in-bounds. All values
    are exact small integers carried in f32 (int32 compute measured
    slightly slower on v5e; int16 vector min is unsupported by Mosaic).

    The shift-by-one carry over d — rt_d[x] = rt[x-d] (column-0 clamped) —
    is a static 1-lane right-shift with edge replication per iteration (no
    dynamic lane slicing: Mosaic requires 128-aligned dynamic lane
    offsets). The d loop runs as fori over D/group with the body unrolled
    ``group`` times (pure fori was ~15% slower; full unroll blows up
    Mosaic compile time).

    Measured r3 (720p/128, v5e, ~3.5-4 ms): this structure is at its
    practical floor — variants tried and rejected: group-stacked stores
    (no change), independent per-d rolls replacing the serial sh1 chain
    (no change), full-height d-grid kernel amortizing row blocks
    (4.6 ms, worse), fused cost+down (build_cost_down_pallas, 5.6 ms
    vs 3.5 + 1.4 separate). Runtime is strongly sub-linear in W
    (W=256 -> 2.0 ms), i.e. bound by per-(d, block) VMEM-resident
    intermediate traffic, not lane math.
    """
    r = block_size // 2
    W = lt_ref.shape[1]
    lt = lt_ref[:]
    lmin = lmin_ref[:]
    lmax = lmax_ref[:]
    zero = jnp.float32(0)
    xio = jax.lax.broadcasted_iota(jnp.int32, (blk, W), 1)

    def one_d(rt, rmin, rmax):
        # inputs arrive pre-doubled (2*img, minmax of 2*img), so
        # min(c_lr, c_rl) here equals the spec's 2*min on original values
        c_lr = jnp.maximum(zero, jnp.maximum(lt - rmax, rmin - lt))
        c_rl = jnp.maximum(zero, jnp.maximum(rt - lmax, lmin - rt))
        c = jnp.minimum(c_lr, c_rl)                # (rows, W)
        # vertical box sum: out row j <- sum of padded rows j..j+2r
        cv = c[0:blk, :]
        for dy in range(1, block_size):
            cv = cv + c[dy:dy + blk, :]
        # horizontal box sum with edge replication (cyclic rolls + edge
        # selects; rolled-in wrap lanes are overridden by the selects)
        left_edge = jnp.broadcast_to(cv[:, 0:1], (blk, W))
        right_edge = jnp.broadcast_to(
            pltpu.roll(cv, 1, 1)[:, 0:1], (blk, W))
        acc = cv
        for dx in range(1, r + 1):
            sh_l = jnp.where(xio < dx, left_edge, pltpu.roll(cv, dx, 1))
            sh_r = jnp.where(xio >= W - dx, right_edge,
                             pltpu.roll(cv, W - dx, 1))
            acc = acc + sh_l + sh_r
        return acc

    def sh1(a):   # x-d-1 sampling: shift right, replicate left edge
        return jnp.concatenate([a[:, :1], a[:, :W - 1]], axis=1)

    def body_group(g, carry):
        rt, rmin, rmax = carry
        for j in range(group):
            gd = g * group + j
            acc = one_d(rt, rmin, rmax)
            out_ref[pl.ds(gd, 1)] = acc[None].astype(out_dtype)
            if out2_ref is not None:
                # right-matcher shear: C_R(y, x, d) = C_L(y, x+d, d)
                # (BT cost is symmetric in its two pixels, so the right
                # view's cost plane is the left's shifted by d). One
                # dynamic lane-roll per plane; wrap columns x > W-1-d
                # are garbage, overwritten by the band fix-up
                # (sgbm_pair_pallas).
                out2_ref[pl.ds(gd, 1)] = pltpu.roll(
                    acc, (W - gd) % W, 1)[None].astype(out_dtype)
            rt, rmin, rmax = sh1(rt), sh1(rmin), sh1(rmax)
        return rt, rmin, rmax

    jax.lax.fori_loop(0, D // group, body_group,
                      (rt_ref[:], rmin_ref[:], rmax_ref[:]))


def build_cost_volume_pallas(lt: jnp.ndarray, rt: jnp.ndarray,
                             params: SGBMParams, blk: int = 16,
                             out_dtype=jnp.float32,
                             layout: str = "hdw",
                             emit_sheared: bool = False):
    """(H, W) Sobel-clipped eyes -> box-aggregated BT cost volume.

    Matches box_filter_volume(bt_cost_volume(...)) bit-for-bit.
    ``layout='hdw'`` returns (H, D, W) (scan layout, costs one XLA
    leading transpose); ``layout='dhw'`` returns the kernel's native
    (D, H, W) d-major output with NO transpose — the r4 fused chain
    consumes it directly (the vertical passes leading-transpose each
    slab in VMEM, which is cheaper than a full HBM round-trip)."""
    H, W = lt.shape
    D = params.num_disparities
    r = params.block_size // 2
    while H % blk:
        blk //= 2
    group = 16
    while D % group:
        group //= 2

    lt = lt.astype(jnp.float32)
    rt = rt.astype(jnp.float32)
    # BT half-sample min/max: values are half-integers; double everything
    # so all kernel values are exact (small) integers in f32 — the cost
    # doubling 2*min is folded as c = min(2*c_lr', 2*c_rl') with the
    # doubled-minmax terms
    lmin2, lmax2 = _bt_minmax(2 * lt)
    rmin2, rmax2 = _bt_minmax(2 * rt)
    md = params.min_disparity
    assert md >= 0, "pallas cost kernel supports min_disparity >= 0 only"
    if md:
        # kernel iterates relative d = 0..D-1; pre-shift the right family
        # by min_disparity (x -> clip(x - md, 0), replicating column 0 —
        # same clamp as bt_cost_volume) so relative d=0 is disparity md
        xr0 = jnp.maximum(jnp.arange(W) - md, 0)
        rt, rmin2, rmax2 = (jnp.take(a, xr0, axis=1)
                            for a in (rt, rmin2, rmax2))

    def pad_rows(a):
        return jnp.pad(a, ((r, r), (0, 0)), mode="edge")

    # Mosaic requires sublane block extents to be multiples of 8
    rows = ((blk + 2 * r + 7) // 8) * 8
    grid = (H // blk,)

    # NOTE: BlockSpec index units are block-sized, so overlapping row
    # windows aren't expressible directly; gather the overlapping windows
    # on the host into a (H//blk, rows, w) array instead (a cheap device
    # gather — ~1.5x the image bytes). Rows beyond blk+2r are clamped
    # padding the kernel never reads.
    def windows(a):
        idx = (jnp.arange(H // blk)[:, None] * blk
               + jnp.arange(rows)[None, :])
        idx = jnp.minimum(idx, a.shape[0] - 1)
        return a[idx]                       # (nblk, rows, w)

    ins = [windows(pad_rows(x)) for x in
           (2 * lt, lmin2, lmax2, 2 * rt, rmin2, rmax2)]

    def spec3(w):
        return pl.BlockSpec((1, rows, w), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def kernel3(lt_r, lmin_r, lmax_r, rt_r, rmin_r, rmax_r, out_ref,
                *out2):
        _cost_box_kernel(lt_r.at[0], lmin_r.at[0], lmax_r.at[0],
                         rt_r.at[0], rmin_r.at[0], rmax_r.at[0],
                         out_ref, *out2, D=D, blk=blk,
                         block_size=params.block_size, out_dtype=out_dtype,
                         group=group)

    # (D, blk, W) output blocks (leading-dim d stores — Mosaic rejects
    # strided int16 stores on the sublane-adjacent dim, so the d-major
    # layout is written here and permuted to (H, D, W) by XLA's
    # leading-dims transpose copy)
    dspec = pl.BlockSpec((D, blk, W), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    dshape = jax.ShapeDtypeStruct((D, H, W), out_dtype)
    out = pl.pallas_call(
        kernel3,
        grid=grid,
        in_specs=[spec3(W)] * 6,
        out_specs=(dspec, dspec) if emit_sheared else dspec,
        out_shape=(dshape, dshape) if emit_sheared else dshape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*ins)
    if emit_sheared:
        C_dhw, R_dhw = out
        if layout == "dhw":
            return C_dhw, R_dhw
        return (jnp.transpose(C_dhw, (1, 0, 2)),
                jnp.transpose(R_dhw, (1, 0, 2)))
    C_dhw = out
    if layout == "dhw":
        return C_dhw
    return jnp.transpose(C_dhw, (1, 0, 2))


def _cost_down_kernel(lt_ref, lmin_ref, lmax_ref,
                      rt_ref, rmin_ref, rmax_ref,
                      c_ref, s3_ref, cost_scr, lv_ref, ldr_ref, ldl_ref,
                      *, D: int, blk: int, block_size: int, out_dtype,
                      group: int, P1: float, P2: float, with_diag: bool):
    """Fused cost build + top-down DP (vertical + both diagonals).

    Per grid step (top-to-bottom row slabs): the d loop fills a
    (D, blk, W) f32 cost scratch (same math as _cost_box_kernel), then a
    row loop runs the 3-path down DP with carries persisting across grid
    steps in scratch, emitting the cost block AND the S_down3 partial
    path-sum block in (blk, D, W) H-major layout — no (D,H,W)->(H,D,W)
    transpose pass, no separate down-pass kernel (together ~2.9 ms of
    the r2 chain at 720p/128)."""
    r = block_size // 2
    W = lt_ref.shape[1]
    lt = lt_ref[:]
    lmin = lmin_ref[:]
    lmax = lmax_ref[:]
    zero = jnp.float32(0)
    xio = jax.lax.broadcasted_iota(jnp.int32, (blk, W), 1)

    def one_d(rt, rmin, rmax):
        c_lr = jnp.maximum(zero, jnp.maximum(lt - rmax, rmin - lt))
        c_rl = jnp.maximum(zero, jnp.maximum(rt - lmax, lmin - rt))
        c = jnp.minimum(c_lr, c_rl)
        cv = c[0:blk, :]
        for dy in range(1, block_size):
            cv = cv + c[dy:dy + blk, :]
        left_edge = jnp.broadcast_to(cv[:, 0:1], (blk, W))
        right_edge = jnp.broadcast_to(
            pltpu.roll(cv, 1, 1)[:, 0:1], (blk, W))
        acc = cv
        for dx in range(1, r + 1):
            sh_l = jnp.where(xio < dx, left_edge, pltpu.roll(cv, dx, 1))
            sh_r = jnp.where(xio >= W - dx, right_edge,
                             pltpu.roll(cv, W - dx, 1))
            acc = acc + sh_l + sh_r
        return acc

    def sh1(a):
        return jnp.concatenate([a[:, :1], a[:, :W - 1]], axis=1)

    def body_group(g, carry):
        rt, rmin, rmax = carry
        for j in range(group):
            cost_scr[pl.ds(g * group + j, 1)] = one_d(rt, rmin, rmax)[None]
            rt, rmin, rmax = sh1(rt), sh1(rmin), sh1(rmax)
        return rt, rmin, rmax

    jax.lax.fori_loop(0, D // group, body_group,
                      (rt_ref[:], rmin_ref[:], rmax_ref[:]))

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        lv_ref[:] = jnp.zeros_like(lv_ref)
        if with_diag:
            ldr_ref[:] = jnp.zeros_like(ldr_ref)
            ldl_ref[:] = jnp.zeros_like(ldl_ref)

    # leading-two-dims transpose = tile-address permutation (cheap);
    # per-row strided reads of the (D, blk, W) scratch measured ~2x the
    # whole kernel's runtime (1/8 sublane efficiency per (D, 1, W) slice)
    cost_hdw = jnp.transpose(cost_scr[:], (1, 0, 2))   # (blk, D, W)

    for y in range(blk):
        c = cost_hdw[y]                            # (D, W) contiguous

        def update(Lprev):
            return _sgm_update(c, Lprev, P1, P2)

        Lv = update(lv_ref[:])
        lv_ref[:] = Lv
        s3 = Lv
        if with_diag:
            zcol = jnp.zeros((D, 1), jnp.float32)
            pdr = jnp.concatenate([zcol, ldr_ref[:, :W - 1]], axis=1)
            pdl = jnp.concatenate([ldl_ref[:, 1:], zcol], axis=1)
            Ldr = update(pdr)
            Ldl = update(pdl)
            ldr_ref[:] = Ldr
            ldl_ref[:] = Ldl
            s3 = s3 + Ldr + Ldl
        c_ref[y] = c.astype(out_dtype)
        s3_ref[y] = s3.astype(out_dtype)


def build_cost_down_pallas(lt: jnp.ndarray, rt: jnp.ndarray,
                           params: SGBMParams, blk: int = 16,
                           out_dtype=jnp.int16
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(H, W) Sobel-clipped eyes -> (C, S_down3), both (H, D, W).

    C matches box_filter_volume(bt_cost_volume(...)); S_down3 is the sum
    of the down + two down-diagonal path volumes (bit-equal to
    directional_pass_pallas(C, ..., with_diag) — tested). One kernel
    replaces cost + leading transpose + down pass."""
    H, W = lt.shape
    D = params.num_disparities
    r = params.block_size // 2
    while H % blk:
        blk //= 2
    group = 16
    while D % group:
        group //= 2
    with_diag = params.num_paths == 8

    lt = lt.astype(jnp.float32)
    rt = rt.astype(jnp.float32)
    lmin2, lmax2 = _bt_minmax(2 * lt)
    rmin2, rmax2 = _bt_minmax(2 * rt)
    md = params.min_disparity
    assert md >= 0, "pallas cost kernel supports min_disparity >= 0 only"
    if md:
        xr0 = jnp.maximum(jnp.arange(W) - md, 0)
        rt, rmin2, rmax2 = (jnp.take(a, xr0, axis=1)
                            for a in (rt, rmin2, rmax2))

    def pad_rows(a):
        return jnp.pad(a, ((r, r), (0, 0)), mode="edge")

    rows = ((blk + 2 * r + 7) // 8) * 8

    def windows(a):
        idx = (jnp.arange(H // blk)[:, None] * blk
               + jnp.arange(rows)[None, :])
        idx = jnp.minimum(idx, a.shape[0] - 1)
        return a[idx]

    ins = [windows(pad_rows(x)) for x in
           (2 * lt, lmin2, lmax2, 2 * rt, rmin2, rmax2)]

    def spec3(w):
        return pl.BlockSpec((1, rows, w), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _cost_down_kernel, D=D, blk=blk, block_size=params.block_size,
        out_dtype=out_dtype, group=group, P1=float(params.P1),
        P2=float(params.P2), with_diag=with_diag)

    def kernel3(lt_r, lmin_r, lmax_r, rt_r, rmin_r, rmax_r, c_r, s3_r,
                *scratch):
        kernel(lt_r.at[0], lmin_r.at[0], lmax_r.at[0],
               rt_r.at[0], rmin_r.at[0], rmax_r.at[0], c_r, s3_r,
               *scratch)

    vspec = pl.BlockSpec((blk, D, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    scratch = [pltpu.VMEM((D, blk, W), jnp.float32),
               pltpu.VMEM((D, W), jnp.float32)]
    if with_diag:
        scratch += [pltpu.VMEM((D, W), jnp.float32),
                    pltpu.VMEM((D, W), jnp.float32)]
    else:
        scratch += [pltpu.VMEM((8, 128), jnp.float32),
                    pltpu.VMEM((8, 128), jnp.float32)]
    C, S3 = pl.pallas_call(
        kernel3,
        grid=(H // blk,),
        in_specs=[spec3(W)] * 6,
        out_specs=(vspec, vspec),
        out_shape=(jax.ShapeDtypeStruct((H, D, W), out_dtype),) * 2,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*ins)
    return C, S3


# ---------------------------------------------------------------------------
# volume transpose (A, D, B) -> (B, D, A) — XLU-based, beats XLA's copy
# ---------------------------------------------------------------------------


def _bitcast16(x):
    """View a 2-byte array as int16 so the widening `astype(int32)` the
    transpose kernels use for Mosaic's 16-bit shape-cast limit is a pure
    reinterpretation — astype on bfloat16/float16 VALUES would truncate
    fractional data routed through the transposes."""
    if x.dtype.itemsize == 2 and x.dtype != jnp.int16:
        return jax.lax.bitcast_convert_type(x, jnp.int16)
    return x


def _bitcast_back16(x, dtype):
    if jnp.dtype(dtype).itemsize == 2 and dtype != jnp.int16:
        return jax.lax.bitcast_convert_type(x, dtype)
    return x


def _transpose_kernel(x_ref, o_ref, *, db: int):
    x = x_ref[:]                                   # (A, db, b_blk)
    if x.dtype.itemsize == 2:
        # Mosaic can't shape-cast 16-bit vectors through the unit middle
        # dim jnp.stack introduces — widen for the in-VMEM shuffle (DMA
        # in/out stays 16-bit). Inputs are pre-bitcast to int16 by the
        # wrappers, so this widening is value-exact for any 16-bit dtype.
        x = x.astype(jnp.int32)
    o_ref[:] = jnp.stack([jnp.transpose(x[:, d, :], (1, 0))
                          for d in range(db)], axis=1).astype(o_ref.dtype)


def _transpose_leading_kernel(x_ref, o_ref):
    o_ref[:] = jnp.transpose(x_ref[:], (1, 0, 2))


def transpose_leading_pallas(x: jnp.ndarray, a_blk: int = 8,
                             b_blk: int = 8) -> jnp.ndarray:
    """(A, B, W) -> (B, A, W): permute the two leading (non-lane) dims.

    Pure tile-address permutation — both sides DMA full-W contiguous
    runs, so this runs near HBM speed (XLA's equivalent transpose copy
    measured ~22% of bandwidth). Used to bring the cost kernel's d-major
    output into the (H, D, W) scan layout."""
    A, B, W = x.shape
    while A % a_blk:
        a_blk //= 2
    while B % b_blk:
        b_blk //= 2
    return pl.pallas_call(
        _transpose_leading_kernel,
        grid=(A // a_blk, B // b_blk),
        in_specs=[pl.BlockSpec((a_blk, b_blk, W), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((b_blk, a_blk, W), lambda i, j: (j, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, A, W), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x)


def _transpose_dhw_kernel(x_ref, o_ref, *, db: int):
    x = x_ref[:]                                   # (db, A, b_blk)
    if x.dtype.itemsize == 2:
        x = x.astype(jnp.int32)   # see _transpose_kernel
    o_ref[:] = jnp.stack([jnp.transpose(x[i], (1, 0))
                          for i in range(db)], axis=1).astype(o_ref.dtype)


def transpose_dhw_to_wdh_pallas(x: jnp.ndarray, b_blk: int = 128,
                                d_blk: int = 8) -> jnp.ndarray:
    """(D, H, W) d-major cost volume -> (W, D, H) horizontal-scan layout.

    Feeds the W-scan DP passes straight from the cost kernel's native
    output, replacing the T1+T2 pair (d-major -> H-major -> W-major, two
    full HBM round-trips at ~22% bandwidth each) with ONE permute pass:
    reads (d_blk, H, b_blk) blocks (256 B contiguous runs), XLU-
    transposes each d-plane, writes (b_blk, d_blk, H) blocks
    (d_blk*H contiguous runs per lane-tile of W)."""
    D, H, W = x.shape
    if W % 128:
        b_blk = W
    else:
        while W % b_blk:
            b_blk //= 2
    while D % d_blk:
        d_blk //= 2
    dtype = x.dtype
    x = _bitcast16(x)
    kernel = functools.partial(_transpose_dhw_kernel, db=d_blk)
    return _bitcast_back16(pl.pallas_call(
        kernel,
        grid=(W // b_blk, D // d_blk),
        in_specs=[pl.BlockSpec((d_blk, H, b_blk), lambda i, j: (j, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((b_blk, d_blk, H), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, D, H), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x), dtype)


def transpose_vol_pallas(x: jnp.ndarray, a_blk: int = 128,
                         d_blk: int = 8) -> jnp.ndarray:
    """(A, D, B) -> (B, D, A) for the 0.24 GB cost/path volumes.

    XLA's transpose of the int16 volume runs at ~22% of HBM bandwidth;
    this kernel reads (a_blk, d_blk, B) blocks, transposes each d-plane
    on the XLU (widened to i32 in VMEM — Mosaic rejects 16-bit unit-dim
    shape casts), and writes (B, d_blk, a_blk) blocks. The A axis is
    blocked (the B lane axis often has no 128-divisor, e.g. H=720, and
    must stay whole); blocks stay ~1.4 MB int16. Used to bring the
    horizontal passes' (W, D, H) sum back to the (H, D, W) scan layout."""
    A, D, B = x.shape
    while A % a_blk:
        a_blk //= 2
    while D % d_blk:
        d_blk //= 2
    dtype = x.dtype
    x = _bitcast16(x)
    kernel = functools.partial(_transpose_kernel, db=d_blk)
    return _bitcast_back16(pl.pallas_call(
        kernel,
        grid=(A // a_blk, D // d_blk),
        in_specs=[pl.BlockSpec((a_blk, d_blk, B), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, d_blk, a_blk), lambda i, j: (0, j, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, D, A), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x), dtype)


# ---------------------------------------------------------------------------
# directional DP pass over (D, N, W) — grid scans axis 1
# ---------------------------------------------------------------------------


def _diag_shifts(ldr, ldl, W: int, xio=None):
    """The two diagonal-carry lane shifts (x-1 for down-right, x+1 for
    down-left), zero-filled at the image border. ``xio``: pre-built
    (D, W) lane iota selects the roll+mask form (whole-vreg lane rotates)
    instead of the unaligned concatenate-slice copies."""
    if xio is None:
        D = ldr.shape[0]
        zcol = jnp.zeros((D, 1), jnp.float32)
        pdr = jnp.concatenate([zcol, ldr[:, :W - 1]], axis=1)
        pdl = jnp.concatenate([ldl[:, 1:], zcol], axis=1)
    else:
        pdr = jnp.where(xio == 0, 0.0, pltpu.roll(ldr, 1, 1))
        pdl = jnp.where(xio == W - 1, 0.0, pltpu.roll(ldl, W - 1, 1))
    return pdr, pdl


def _dir_pass_kernel(c_ref, *refs, P1: float, P2: float, with_diag: bool,
                     accumulate: bool, D: int, K: int, reverse: bool,
                     out_offset: float = 0.0, c_dmajor: bool = False,
                     emit_c: bool = False, roll_shift: bool = False,
                     diag_roll: bool = False):
    """Volume layout (N, D, W): one (K, D, W) slab per sequential grid
    step, rows iterated in scan order inside the kernel (K-row slabs cut
    the sequential grid from N steps to N/K — per-step pipeline overhead
    across the 4 passes is several ms at N=720/1280).

    With ``accumulate`` an extra input (aliased to the output) carries the
    running path sum; the kernel adds into it, so down+up (and fwd+bwd)
    pairs produce one summed volume with no separate XLA add pass.

    With ``c_dmajor`` the cost input streams in the cost kernel's native
    (D, N, W) layout as (D, K, W) slabs; one leading-dims transpose per
    slab (sublane-copy in VMEM) replaces the full-volume HBM transpose.
    With ``emit_c`` the kernel additionally writes the transposed
    (K, D, W) cost slab to a second output — the H-major volume the
    fused up+WTA kernel consumes — for one aligned HBM write (~0.3 ms)
    instead of a separate transpose pass or a per-slab transpose in the
    up kernel (measured +0.69 ms there at K=8).
    """
    if accumulate and emit_c:
        a_ref, out_ref, co_ref, lv_ref, ldr_ref, ldl_ref = refs
    elif accumulate:
        a_ref, out_ref, lv_ref, ldr_ref, ldl_ref = refs
    elif emit_c:
        out_ref, co_ref, lv_ref, ldr_ref, ldl_ref = refs
    else:
        out_ref, lv_ref, ldr_ref, ldl_ref = refs
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        lv_ref[:] = jnp.zeros_like(lv_ref)
        if with_diag:
            ldr_ref[:] = jnp.zeros_like(ldr_ref)
            ldl_ref[:] = jnp.zeros_like(ldl_ref)

    c_slab = (jnp.transpose(c_ref[:], (1, 0, 2)) if c_dmajor else None)
    if emit_c:
        co_ref[:] = c_slab

    Wd = lv_ref.shape[1]
    dio = (jax.lax.broadcasted_iota(jnp.int32, (D, Wd), 0)
           if roll_shift else None)
    xio = (jax.lax.broadcasted_iota(jnp.int32, (D, Wd), 1)
           if diag_roll else None)
    for j in range(K):
        jj = K - 1 - j if reverse else j
        c = (c_slab[jj] if c_dmajor else c_ref[jj]).astype(jnp.float32)
        W = c.shape[1]

        def update(Lprev):
            return _sgm_update(c, Lprev, P1, P2, dio)

        Lv = update(lv_ref[:])
        lv_ref[:] = Lv
        out = Lv
        if with_diag:
            pdr, pdl = _diag_shifts(ldr_ref[:], ldl_ref[:], W, xio)
            Ldr = update(pdr)
            Ldl = update(pdl)
            ldr_ref[:] = Ldr
            ldl_ref[:] = Ldl
            out = out + Ldr + Ldl
        if accumulate:
            out = out + a_ref[jj].astype(jnp.float32)
        if out_offset:
            out = out + out_offset
        out_ref[jj] = out.astype(out_ref.dtype)


def directional_pass_pallas(C: jnp.ndarray, P1: float, P2: float,
                            reverse: bool, with_diag: bool,
                            out_dtype=None, acc: jnp.ndarray = None,
                            rows_per_step: int = 0,
                            out_offset: float = 0.0,
                            c_dmajor: bool = False,
                            emit_c: bool = False,
                            roll_shift: bool = False,
                            diag_roll: bool = True):
    """One scan pass over axis 0 of an (N, D, W) volume.

    reverse=False scans 0→N-1 (down / left→right on the transposed
    volume); reverse=True scans N-1→0. with_diag fuses the two diagonal
    paths (carry lane-shifts) with the axial path. ``acc`` (same shape)
    is added into the output in-kernel (donated/aliased), fusing the
    down+up path-sum accumulation into the pass itself.

    ``c_dmajor``: C arrives as (D, N, W) (the cost kernel's native
    layout); the output/acc stay (N, D, W). Saves the full-volume
    leading transpose between cost build and the vertical passes.

    rows_per_step (K) defaults to the largest divisor of N whose
    (K, D, W) slab stays <= ~6 MB: per-grid-step fixed overhead (~2-3 us
    x N/K sequential steps) dominated the r2 passes at K=4 (N=720/1280
    meant 180-320 steps; ~1 ms/pass of bubbles at 720p/128).
    """
    if c_dmajor:
        D, N, W = C.shape
    else:
        N, D, W = C.shape
    out_dtype = out_dtype or C.dtype
    K = rows_per_step
    if not K:
        row_bytes = D * W * jnp.dtype(C.dtype).itemsize
        K = 16
        while K > 1 and K * row_bytes > 6 * 1024 * 1024:
            K //= 2
    while N % K:
        K //= 2

    if reverse:
        idx = lambda i: (N // K - 1 - i, 0, 0)
    else:
        idx = lambda i: (i, 0, 0)

    assert not emit_c or c_dmajor, "emit_c requires the d-major C input"
    kernel = functools.partial(_dir_pass_kernel, P1=float(P1), P2=float(P2),
                               with_diag=with_diag, accumulate=acc is not None,
                               D=D, K=K, reverse=reverse,
                               out_offset=out_offset, c_dmajor=c_dmajor,
                               emit_c=emit_c, roll_shift=roll_shift,
                               diag_roll=diag_roll)
    scratch = [pltpu.VMEM((D, W), jnp.float32)]
    if with_diag:
        scratch += [pltpu.VMEM((D, W), jnp.float32),
                    pltpu.VMEM((D, W), jnp.float32)]
    else:
        # unused refs still must exist; tiny placeholders
        scratch += [pltpu.VMEM((8, 128), jnp.float32),
                    pltpu.VMEM((8, 128), jnp.float32)]

    spec = pl.BlockSpec((K, D, W), idx, memory_space=pltpu.VMEM)
    if c_dmajor:
        c_spec = pl.BlockSpec((D, K, W), lambda i: (0, idx(i)[0], 0),
                              memory_space=pltpu.VMEM)
    else:
        c_spec = spec
    ins = [C] if acc is None else [C, acc]
    aliases = {} if acc is None else {1: 0}
    out_specs = spec
    out_shape = jax.ShapeDtypeStruct((N, D, W), out_dtype)
    if emit_c:
        out_specs = (spec, spec)
        out_shape = (out_shape, jax.ShapeDtypeStruct((N, D, W), C.dtype))
    return pl.pallas_call(
        kernel,
        grid=(N // K,),
        in_specs=[c_spec] + [spec] * (len(ins) - 1),
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(*ins)


# ---------------------------------------------------------------------------
# full aggregation + full matcher
# ---------------------------------------------------------------------------


def aggregate_paths_pallas_hdw(C: jnp.ndarray, P1: float, P2: float,
                               num_paths: int = 8) -> jnp.ndarray:
    """(H, D, W) cost -> (H, D, W) 8/4/2-path aggregated sum (float32).

    Pass outputs and sums are forced to f32: the full 8-path sum reaches
    ~69600 (> int16 max) — with an int16 C the accumulated volume
    silently wrapped, producing an all-invalid map on hardware (caught
    by the compiled parity gate, r3; interpret tests used f32 cost)."""
    assert num_paths in (2, 4, 8)
    with_diag = num_paths == 8
    f32 = jnp.float32
    Ct = jnp.transpose(C, (2, 1, 0))              # (W, D, H)
    S_h = (directional_pass_pallas(Ct, P1, P2, False, False, out_dtype=f32)
           + directional_pass_pallas(Ct, P1, P2, True, False, out_dtype=f32))
    S = jnp.transpose(S_h, (2, 1, 0))
    if num_paths == 2:
        return S
    S = S + directional_pass_pallas(C, P1, P2, False, with_diag,
                                    out_dtype=f32)
    S = S + directional_pass_pallas(C, P1, P2, True, with_diag,
                                    out_dtype=f32)
    return S


def aggregate_paths_pallas(cost_hwd: jnp.ndarray, P1: float, P2: float,
                           num_paths: int = 8) -> jnp.ndarray:
    """Drop-in replacement for ops.sgbm.aggregate_paths ((H, W, D) in/out)."""
    C = jnp.transpose(cost_hwd, (0, 2, 1))
    S = aggregate_paths_pallas_hdw(C, P1, P2, num_paths)
    return jnp.transpose(S, (0, 2, 1))


def sgbm_pallas(left: jnp.ndarray, right: jnp.ndarray,
                params: SGBMParams = SGBMParams(),
                apply_lr: bool = True, apply_speckle: bool = True,
                cost_blk: int = 0, fused_wta: bool = True,
                volume_dtype=jnp.int16) -> jnp.ndarray:
    """Full SGBM with Pallas cost-build + aggregation + WTA kernels.

    Drop-in equivalent of ops.sgbm.sgbm (same float32 disparity output,
    invalid = -1.0). With ``fused_wta`` (8/4-path), the up pass and the
    WTA/uniqueness/subpixel/LR stage run as one fused kernel (the up-path
    volume never touches HBM); otherwise the jnp postprocessing runs on
    the summed volume.
    """
    cap = params.pre_filter_cap
    lt = sobel_clip(left.astype(jnp.float32), cap)
    rt = sobel_clip(right.astype(jnp.float32), cap)
    if not cost_blk:
        # VMEM-aware row-block size. Fused cost+down kernel: f32 cost
        # scratch (4 B) + two double-buffered int16 output blocks (8 B)
        # = 12 B per (blk, D, W) element; keep under ~40 MB (the
        # 2560x1440x256 sweep then picks blk=4). Unfused path: only the
        # (blk, D, W) output block is double-buffered.
        itemsize = jnp.dtype(volume_dtype).itemsize
        cost_blk = 48
        while (cost_blk > 8 and cost_blk * params.num_disparities
               * left.shape[1] * itemsize > 32 * 1024 * 1024):
            cost_blk //= 2
    # all cost/path values are small exact integers (C <= 6300,
    # L_r <= 8700, fused 3-path sums <= 26100), so int16 volumes halve
    # HBM traffic with zero numeric change (compute stays f32 in-kernel)
    P1, P2 = params.P1, params.P2
    if fused_wta and params.num_paths >= 4:
        # NOTE: build_cost_down_pallas (fused cost+down) measured 5.6 ms
        # vs 3.5 + 1.4 for the separate kernels at 720p/128 (the
        # in-kernel (D, blk, W)->(blk, D, W) relayout costs more than
        # the XLA transpose + extra volume pass it saves) — kept for the
        # tile path experiments but not used here.
        #
        # r5 device-trace accounting (PROFILE_r05.log, batch 8,
        # jax.profiler — the chained harness overestimates stages
        # ~40%): cost 2.09, copies 2.28 (3x XLA at ~76% HBM SoL),
        # hf/hb/down 0.84/1.15/1.11, up+WTA 3.09, speckle 2.93,
        # total 13.73 ms/frame. r5 experiments measured and REJECTED:
        #   - d-on-lanes (H,W,D) layout: isolated min-reduce over d is
        #     2.9x faster on lanes, but a realistic 3-path down-like
        #     kernel measured 4.57 ms vs 3.05 for the current
        #     d-on-sublanes form (the x-axis sublane rolls and lane
        #     broadcasts eat the reduce win);
        #   - stacked (3, D, W) carries (one fused update for all 3
        #     paths): 3.04 vs 3.05 — op-issue overhead is not the
        #     bottleneck;
        #   - 2 disparities per cost iteration: 3.11 vs 3.07;
        #   - cost kernel emitting (H, D, W) via group-aligned stores:
        #     +0.64 ms in-kernel vs the 0.75 ms XLA copy it saves;
        #   - one-sided BT (drop the c_rl branch): -0.25 ms device but
        #     diverges from cv2's min(c_lr, c_rl) formula for ~2% MAE
        #     change — parity kept instead;
        #   - larger K slabs (down K=24/48, up K=16): flat or OOM.
        #
        # r4 relayout experiments (all bit-parity-tested, measured on
        # v5e at 720p/128, same session A/B):
        #   - d-major cost + per-slab VMEM leading transpose in the
        #     vertical passes (c_dmajor) + emit_c H-major re-emission:
        #     14.55 ms matcher vs 12.61 ms for this chain — the XLA
        #     compiler already composes the cost kernel's (D,H,W) output
        #     transpose with the (H,D,W)->(W,D,H) hop into ONE copy for
        #     the horizontal branch, so the "saved" transpose was
        #     already elided, and the in-kernel slab transposes +
        #     emit_c write cost more than the remaining T1.
        #   - transpose_vol_pallas for the S_h back-transpose: 2.17 ms
        #     vs 1.40 XLA (H=720 lane axis has no 128-divisor).
        # The H-major chain below therefore remains the product path;
        # the d-major kernels stay available for tile/sweep shapes where
        # the tradeoff may differ.
        C = build_cost_volume_pallas(lt, rt, params, blk=cost_blk,
                                     out_dtype=volume_dtype)
        disp = _fused_aggregate_wta(C, params, apply_lr, volume_dtype)
        valid = disp >= 0
    else:
        C = build_cost_volume_pallas(lt, rt, params, blk=cost_blk,
                                     out_dtype=volume_dtype)
        S = aggregate_paths_pallas_hdw(C, P1, P2, params.num_paths)
        S_hwd = jnp.transpose(S, (0, 2, 1))
        disp, valid = wta(S_hwd, params)
        if apply_lr:
            valid = lr_check(S_hwd, disp, valid, params)
    if apply_speckle and params.speckle_window_size > 0:
        dm = jnp.where(valid, disp, -1.0)
        if dm.size <= 2 ** 21:
            valid = valid & speckle_filter_pallas(
                dm, params.speckle_window_size, params.speckle_range)
        else:
            # sweep-scale maps (2560x1440 = 3.7M px): the VMEM-resident
            # CCL kernel spills ~162 MB of registers (measured r3) and
            # the bitonic sort exceeds VMEM — use the jnp associative-
            # scan path, which streams through HBM
            valid = speckle_filter(dm, valid,
                                   params.speckle_window_size,
                                   params.speckle_range)
    return jnp.where(valid, disp, -1.0)




def _fused_aggregate_wta(C: jnp.ndarray, params: SGBMParams,
                         apply_lr: bool, volume_dtype,
                         mirror_lr: bool = False) -> jnp.ndarray:
    """Fused 8/4-path aggregation + WTA chain on an (H, D, W) cost
    volume: 2 horizontal passes on the W-major transpose, down pass
    accumulating S_h (bias-shifted into int16 range), fused up+WTA(+LR).
    ``mirror_lr`` flips the LR-consistency directions for a right-view
    cost volume in un-mirrored orientation (sgbm_pair_pallas) — the DP
    path SUM itself is mirror-equivariant (fwd/bwd and the two diagonals
    pair up under x-mirror), so only the LR stage needs the flag."""
    with_diag = params.num_paths == 8
    P1, P2 = params.P1, params.P2
    Ct = jnp.transpose(C, (2, 1, 0))
    hf = directional_pass_pallas(Ct, P1, P2, False, False)
    S_h = jnp.transpose(
        directional_pass_pallas(Ct, P1, P2, True, False, acc=hf),
        (2, 1, 0))
    # max possible down(+diag)+horizontal sum: (n_down + 2 horizontal)
    # paths, each bounded by boxed-BT max (25 * 4 * cap) + P2
    bias = _wta_bias(params, with_diag, volume_dtype)
    if bias is not None:
        S_dh = directional_pass_pallas(C, P1, P2, False, with_diag,
                                       acc=S_h, out_offset=-bias)
        return up_wta_pallas(C, S_dh, None, params, apply_lr=apply_lr,
                             with_diag=with_diag, sd_offset=bias,
                             mirror_lr=mirror_lr)
    S_down = directional_pass_pallas(C, P1, P2, False, with_diag)
    return up_wta_pallas(C, S_down, S_h, params,
                         apply_lr=apply_lr, with_diag=with_diag,
                         mirror_lr=mirror_lr)




def _fused_aggregate_wta_pair(C_L: jnp.ndarray, C_R: jnp.ndarray,
                              params: SGBMParams, apply_lr: bool,
                              volume_dtype):
    """Aggregation for the shared-cost matcher pair: the four DP passes
    and transposes run BATCHED over the two volumes (vmap folds the pair
    into each kernel's grid — measured ~1.8 ms/frame cheaper than two
    sequential chains), and only the fused up+WTA splits per volume
    (its LR directions differ: mirror_lr on the right)."""
    with_diag = params.num_paths == 8
    P1, P2 = params.P1, params.P2
    Cs = jnp.stack([C_L, C_R])                       # (2, H, D, W)
    Cts = jnp.transpose(Cs, (0, 3, 2, 1))            # (2, W, D, H)
    hf = jax.vmap(lambda ct: directional_pass_pallas(
        ct, P1, P2, False, False))(Cts)
    S_h = jnp.transpose(jax.vmap(
        lambda ct, a: directional_pass_pallas(ct, P1, P2, True, False,
                                              acc=a))(Cts, hf),
        (0, 3, 2, 1))
    bias = _wta_bias(params, with_diag, volume_dtype)
    if bias is not None:
        S_dh = jax.vmap(lambda c, a: directional_pass_pallas(
            c, P1, P2, False, with_diag, acc=a,
            out_offset=-bias))(Cs, S_h)
        disp_l = up_wta_pallas(C_L, S_dh[0], None, params,
                               apply_lr=apply_lr, with_diag=with_diag,
                               sd_offset=bias)
        disp_r = up_wta_pallas(C_R, S_dh[1], None, params,
                               apply_lr=apply_lr, with_diag=with_diag,
                               sd_offset=bias, mirror_lr=True)
    else:
        S_down = jax.vmap(lambda c: directional_pass_pallas(
            c, P1, P2, False, with_diag))(Cs)
        disp_l = up_wta_pallas(C_L, S_down[0], S_h[0], params,
                               apply_lr=apply_lr, with_diag=with_diag)
        disp_r = up_wta_pallas(C_R, S_down[1], S_h[1], params,
                               apply_lr=apply_lr, with_diag=with_diag,
                               mirror_lr=True)
    return disp_l, disp_r


def _apply_speckle_pallas(disp: jnp.ndarray, valid, params: SGBMParams):
    """Shared speckle stage: VMEM CCL + sort sizes up to 2^21 px, jnp
    associative-scan fallback at sweep scale."""
    dm = jnp.where(valid, disp, -1.0)
    if dm.size <= 2 ** 21:
        return valid & speckle_filter_pallas(
            dm, params.speckle_window_size, params.speckle_range)
    return speckle_filter(dm, valid, params.speckle_window_size,
                          params.speckle_range)


def sgbm_pair_pallas(left: jnp.ndarray, right: jnp.ndarray,
                     params: SGBMParams = SGBMParams(),
                     apply_lr: bool = True, apply_speckle: bool = True,
                     cost_blk: int = 0,
                     volume_dtype=jnp.int16):
    """Left AND right disparity maps from ONE shared cost volume.

    Bit-identical to ops.sgbm.compute_disparity_pair with the pallas
    matcher (tested), but ~a full cost-build cheaper: since the BT cost
    is symmetric in its two pixels, the right matcher's volume is the
    left's sheared by d — C_R(y, x, d) = C_L(y, x+d, d) — so the cost
    kernel emits both volumes in one pass (emit_sheared: one dynamic
    lane-roll per d-plane). Columns where the shear identity breaks
    (box-filter edge replication differs: x+d near W-1, plus the r
    left-edge columns) are recomputed exactly with the jnp reference
    cost ops on the mirrored sobel images (kernel==jnp parity is
    tested), and the right volume stays in UN-mirrored orientation:
    the 8-path DP sum is mirror-equivariant, so only the in-kernel
    LR check needs flipped directions (mirror_lr).

    Right-matcher construction anchor: cv::ximgproc::createRightMatcher
    (stereo_vision/src/stereo_disparity.cpp:10, SURVEY.md §2.4).
    """
    assert params.min_disparity == 0, "pair path requires min_disparity=0"
    assert params.num_paths >= 4
    cap = params.pre_filter_cap
    lt = sobel_clip(left.astype(jnp.float32), cap)
    rt = sobel_clip(right.astype(jnp.float32), cap)
    H, W = lt.shape
    D = params.num_disparities
    r = params.block_size // 2
    if not cost_blk:
        itemsize = jnp.dtype(volume_dtype).itemsize
        cost_blk = 48
        while (cost_blk > 8 and cost_blk * D * W * itemsize
               > 32 * 1024 * 1024):
            cost_blk //= 2
    C_L, C_Rs = build_cost_volume_pallas(lt, rt, params, blk=cost_blk,
                                         out_dtype=volume_dtype,
                                         emit_sheared=True)

    # band fix-up: mirrored-build values where shear != mirrored build.
    # Bands are built with the SAME pallas cost kernel on narrow slices
    # of the mirrored sobel images (the jnp reference build's XLA
    # gathers measured ~6 ms at 720p vs ~1 ms for the kernel), and the
    # volume is assembled with ONE lane-axis concatenate instead of two
    # full-volume .at[].set copies (~3 ms).
    lt_m = (2.0 * cap - rt)[:, ::-1]
    rt_m = (2.0 * cap - lt)[:, ::-1]

    def _lane_ok(n):
        """Mosaic lane-dim constraint: multiple of 128, or the full W."""
        return min(-(-n // 128) * 128, W)

    B1 = min(D + 2 * r + 4, W)           # right-edge region incl. wrap
    B1c = _lane_ok(B1 + r + 2)           # + sobel/BT/box context margin
    band1 = build_cost_volume_pallas(lt_m[:, :B1c], rt_m[:, :B1c],
                                     params, blk=cost_blk,
                                     out_dtype=volume_dtype)[:, :, :B1]
    band1 = band1[:, :, ::-1]            # un-mirror -> x in [W-B1, W)
    if B1 >= W:
        C_R = band1
    elif r == 0:
        # block_size 1: no box-filter edge columns on the left — the
        # [:, :, -0:] slice below would select the whole band instead of
        # zero columns (wrong-width concatenate)
        C_R = jnp.concatenate([C_Rs[:, :, :W - B1], band1], axis=2)
    else:
        s0 = W - _lane_ok(D + r + 8)     # left-edge r columns
        band2 = build_cost_volume_pallas(lt_m[:, s0:], rt_m[:, s0:],
                                         params, blk=cost_blk,
                                         out_dtype=volume_dtype)[:, :, -r:]
        band2 = band2[:, :, ::-1]        # un-mirror -> x in [0, r)
        C_R = jnp.concatenate(
            [band2, C_Rs[:, :, r:W - B1], band1], axis=2)

    # sequential chains measured faster than vmapped-batched ones here
    # (32.2 vs 37.1 ms/pair on v5e: the jnp.stack + batched transposes
    # cost more than vmap's grid-fold amortization returns)
    disp_l = _fused_aggregate_wta(C_L, params, apply_lr, volume_dtype)
    disp_r = _fused_aggregate_wta(C_R, params, apply_lr, volume_dtype,
                                  mirror_lr=True)
    if apply_speckle and params.speckle_window_size > 0:
        vl = _apply_speckle_pallas(disp_l, disp_l >= 0, params)
        vr = _apply_speckle_pallas(disp_r, disp_r >= 0, params)
        disp_l = jnp.where(vl, disp_l, -1.0)
        disp_r = jnp.where(vr, disp_r, -1.0)
    return disp_l, disp_r


def _wta_bias(params: SGBMParams, with_diag: bool, volume_dtype):
    """Bias shift for storing the accumulated down+horizontal sum in
    int16 (None -> must keep the 3-volume form)."""
    cmax = (params.block_size ** 2) * 4 * params.pre_filter_cap
    max_sum = ((3 if with_diag else 1) + 2) * (cmax + float(params.P2))
    if jnp.dtype(volume_dtype).itemsize >= 4 or max_sum < 32000:
        return 0.0
    if max_sum < 65000:
        return float(int(max_sum) // 2)
    return None


def sgbm_tile_pallas(C: jnp.ndarray, params: SGBMParams,
                     top_halo: int = 0, bottom_halo: int = 0,
                     apply_lr: bool = True) -> jnp.ndarray:
    """Pallas aggregation + fused WTA on a row slab of the cost volume —
    the per-tile matcher for the shard_map scale-out path
    (parallel/sharded.py): ``C`` is (top_halo + local + bottom_halo, D, W)
    with halo rows already exchanged (or zero-masked at image borders —
    zero cost rows are a fixed point of the DP update, so they reproduce
    the fresh path-start state of the unsharded scan exactly).

    Scan warm-starts: the down pass runs over all rows (top halo first);
    the fused up+WTA pass runs bottom-up from the bottom halo. Horizontal
    paths are row-local. Returns (local, W) float32 disparity (invalid
    -1) for the tile's own rows. Same kernels/bit-behavior as
    sgbm_pallas's fused path (tested in tests/test_parallel.py)."""
    M, D, W = C.shape
    assert params.num_paths in (4, 8), "pallas tile path needs >=4 paths"
    with_diag = params.num_paths == 8
    P1, P2 = params.P1, params.P2
    local = M - top_halo - bottom_halo

    # horizontal paths on the rows the outputs need (local + bottom halo;
    # the top-halo rows' S_h is never read — their down-pass output is
    # warmup only)
    C_body = C[top_halo:]
    Ct = jnp.transpose(C_body, (2, 1, 0))
    hf = directional_pass_pallas(Ct, P1, P2, False, False)
    S_h = jnp.transpose(
        directional_pass_pallas(Ct, P1, P2, True, False, acc=hf),
        (2, 1, 0))

    bias = _wta_bias(params, with_diag, C.dtype)
    if bias is None:
        S_down = directional_pass_pallas(C, P1, P2, False, with_diag)
        disp_ext = up_wta_pallas(C_body, S_down[top_halo:], S_h, params,
                                 apply_lr=apply_lr, with_diag=with_diag)
    else:
        acc = S_h if top_halo == 0 else jnp.concatenate(
            [jnp.zeros((top_halo, D, W), S_h.dtype), S_h], axis=0)
        S_dh = directional_pass_pallas(C, P1, P2, False, with_diag,
                                       acc=acc, out_offset=-bias)
        disp_ext = up_wta_pallas(C_body, S_dh[top_halo:], None, params,
                                 apply_lr=apply_lr, with_diag=with_diag,
                                 sd_offset=bias)
    return disp_ext[:local]


# ---------------------------------------------------------------------------
# fused WTA + uniqueness + subpixel + LR-consistency kernel
# ---------------------------------------------------------------------------


def _wta_body(S, *, D: int, R: int, min_disp: int, uniq: int,
              quantize_16: bool, disp12: int = -1, mirror_lr: bool = False,
              lr_impl: str = "grouped"):
    """(R, D, W) summed path volume -> (disp, valid, packed) maps.

    WTA + uniqueness + subpixel in one vectorized body; shared by the
    standalone WTA kernel and the fused up-pass+WTA kernel. ``packed``
    carries the per-column winner (s0*PK + d* + md, int32).

    With ``disp12 >= 0`` (and min_disp >= 0) the winner-scatter
    LR-consistency stage (spec: ops/sgbm_ref.lr_check_np) also runs
    in-kernel: the D candidate shifts are realized as log2(D)
    whole-block rolls of the packed-winner map over a (R, D, W)
    broadcast (bit-decomposition of the per-plane shift), and the
    disp2[x - round(disp)] gather as the mirrored shear + row select —
    pure VPU, no volume re-reads. Folding this into ``valid`` here
    replaces the r2 XLA `_winner_scatter_disp2` stage (a 128-step
    masked shift/min pipeline over HBM-resident maps) that cost the
    46.3->30.3 fps bench regression.
    """
    W = S.shape[2]
    dio = jax.lax.broadcasted_iota(jnp.int32, (R, D, W), 1)
    PK = 1 << int(D + min_disp).bit_length()
    # all path sums are exact small non-negative ints (<= ~44400 for 8
    # paths), so one packed int32 min-reduce of S*PK + d yields BOTH the
    # winning cost and the smallest winning d (OpenCV tie-break) — one
    # volume reduce instead of the min + masked-equality second reduce
    key = jnp.min(S.astype(jnp.int32) * PK + dio, axis=1)    # (R, W)
    d_star_i = key & (PK - 1)                                # (R, W) i32
    s0i = key >> PK.bit_length() - 1
    s0 = s0i.astype(jnp.float32)                             # (R, W)
    # validity as a float mask (Mosaic's bool-vector support is limited)
    valid = jnp.ones((R, W), jnp.float32)
    if uniq > 0:
        # exists far d with 100*S_d < (100+u)*s0  <=>  the min of S over
        # far d crosses the threshold — one masked min-reduce instead of
        # a full-volume scaled compare + max-reduce
        far = jnp.abs(dio - d_star_i[:, None, :]) > 1
        minT = jnp.min(jnp.where(far, S, _BIG), axis=1)          # (R, W)
        bad = minT * 100.0 < s0 * (100.0 + uniq)
        valid = valid * jnp.where(bad, 0.0, 1.0)
    dsb = d_star_i[:, None, :]
    sm = jnp.min(jnp.where(dio == dsb - 1, S, _BIG), axis=1)
    sp = jnp.min(jnp.where(dio == dsb + 1, S, _BIG), axis=1)
    denom = jnp.maximum(sm + sp - 2.0 * s0, 1e-6)
    offset = jnp.clip((sm - sp) / (2.0 * denom), -0.5, 0.5)
    offset = jnp.where((d_star_i == 0) | (d_star_i == D - 1), 0.0, offset)
    disp = d_star_i.astype(jnp.float32) + offset + min_disp
    if quantize_16:
        disp = jnp.round(disp * 16.0) / 16.0
    xio = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
    # no-partner columns: the secondary view lies at x-d (left matcher)
    # or x+d (mirror_lr: right matcher in un-mirrored orientation)
    if mirror_lr:
        valid = valid * jnp.where(xio + d_star_i + min_disp <= W - 1,
                                  1.0, 0.0)
    else:
        valid = valid * jnp.where((d_star_i + min_disp) <= xio, 1.0, 0.0)

    packed = key + min_disp        # == s0i * PK + d_star_i + min_disp

    if (disp12 >= 0 and min_disp >= 0 and lr_impl == "grouped"
            and D % 8 == 0):
        # Two-level winner-scatter LR (r5): decompose the shift
        # q = 8a + r. COARSE: (R, D/8, W) planes hold packed(x + 8a)
        # via log2(D/8) conditional rolls on 1/8 the volume. RESIDUAL:
        # 8 serial uniform one-lane rolls advance all planes together;
        # each step masks/min-accumulates the planes whose q = 8a + r
        # matches. Total VPU traffic ~7.6 (R, D/8, W)-vol-equivalents
        # vs ~19 full-volume ops for the flat log2(D) pyramid — and
        # only 8 serial steps on big blocks, avoiding the 2*D-step
        # latency chain that sank the map-level rolling register
        # (same-session A/B: up+WTA 5.62 pyramid / 6.43 rolling).
        # Exact: integer min-accumulation is order-independent.
        md = min_disp
        W = S.shape[2]
        A = D // 8
        BIGP = jnp.int32(2 ** 30)
        aio8 = 8 * jax.lax.broadcasted_iota(jnp.int32, (R, A, W), 1)
        xioA = jax.lax.broadcasted_iota(jnp.int32, (R, A, W), 2)

        def lroll(a, k):
            return pltpu.roll(a, (k % W) if mirror_lr
                              else (W - k % W) % W, 2)

        def rroll(a, k):
            return pltpu.roll(a, (W - k % W) % W if mirror_lr
                              else (k % W), 2)

        # --- phase 1: disp2p(x) = min over q of packed(x+q+md)
        # restricted to source columns whose winner is exactly q+md
        C1 = jnp.broadcast_to(packed[:, None, :], (R, A, W))
        if md % W:
            C1 = lroll(C1, md)
        k = 8
        while k < D:
            C1 = jnp.where((aio8 & k) != 0, lroll(C1, k), C1)
            k *= 2
        acc = jnp.full((R, A, W), BIGP, jnp.int32)
        for r in range(8):
            q = aio8 + r + md              # (R, A, W) shift per plane
            src_ok = (xioA >= q) if mirror_lr else (xioA + q < W)
            ok = ((C1 & (PK - 1)) == q) & src_ok
            acc = jnp.minimum(acc, jnp.where(ok, C1, BIGP))
            if r < 7:
                C1 = lroll(C1, 1)
        disp2p = jnp.min(acc, axis=1)                            # (R, W)
        disp2 = jnp.where(disp2p < BIGP,
                          (disp2p & (PK - 1)).astype(jnp.float32), -1.0)

        # --- phase 2: cand(x) = disp2[x_r], x_r = x -/+ round(disp);
        # out-of-image x_r -> sentinel -2 (consistent by convention)
        rd = jnp.round(disp)                                     # (R, W)
        rdb = rd[:, None, :]
        C2 = jnp.broadcast_to(disp2[:, None, :], (R, A, W))
        if md % W:
            C2 = rroll(C2, md)
        k = 8
        while k < D:
            C2 = jnp.where((aio8 & k) != 0, rroll(C2, k), C2)
            k *= 2
        cand = jnp.full((R, A, W), _BIG, jnp.float32)
        for r in range(8):
            q = aio8 + r + md
            oob = (xioA > W - 1 - q) if mirror_lr else (xioA < q)
            v = jnp.where(oob, jnp.float32(-2.0), C2)
            cand = jnp.minimum(cand,
                               jnp.where(rdb == q.astype(jnp.float32),
                                         v, _BIG))
            if r < 7:
                C2 = rroll(C2, 1)
        cand = jnp.min(cand, axis=1)                             # (R, W)
        ok = (((cand >= 0.0) & (jnp.abs(cand - disp) <= disp12))
              | (cand <= -1.5) | (cand >= _BIG * 0.5))
        valid = valid * jnp.where(ok, 1.0, 0.0)

    elif disp12 >= 0 and min_disp >= 0 and lr_impl in ("pyramid",
                                                       "grouped"):
        # Winner-scatter LR consistency as log2(D) whole-(R, D, W) roll
        # pyramids (the r4 product path). The "rolling" map-level
        # register below moves ~14x fewer elements but is a chain of
        # 2*D dependent one-lane rolls — measured SLOWER on v5e
        # (67.8 -> 61.9 fps batch-4 bench regression, r5 session);
        # the pyramid's log2(D) big independent ops pipeline better.
        md = min_disp
        W = S.shape[2]
        xio3 = jax.lax.broadcasted_iota(jnp.int32, (R, D, W), 2)
        BIGP = jnp.int32(2 ** 30)

        def lroll(a, k):
            return pltpu.roll(a, (k % W) if mirror_lr
                              else (W - k % W) % W, 2)

        def rroll(a, k):
            return pltpu.roll(a, (W - k % W) % W if mirror_lr
                              else (k % W), 2)

        sh = jnp.broadcast_to(packed[:, None, :], (R, D, W))
        if md % W:
            sh = lroll(sh, md)
        k = 1
        while k < D:
            sh = jnp.where((dio & k) != 0, lroll(sh, k), sh)
            k *= 2
        src_ok = (xio3 >= dio + md) if mirror_lr \
            else (xio3 + dio + md < W)
        okm = ((sh & (PK - 1)) == dio + md) & src_ok
        disp2p = jnp.min(jnp.where(okm, sh, BIGP), axis=1)        # (R, W)
        disp2 = jnp.where(disp2p < BIGP,
                          (disp2p & (PK - 1)).astype(jnp.float32), -1.0)
        # consistency at x_r = x -/+ round(disp): shr[r, q, x] =
        # disp2[r, x-q-md] (right-roll by q+md), select row rd-md.
        rd = jnp.round(disp)                                     # (R, W)
        shr = jnp.broadcast_to(disp2[:, None, :], (R, D, W))
        if md % W:
            shr = rroll(shr, md)
        k = 1
        while k < D:
            shr = jnp.where((dio & k) != 0, rroll(shr, k), shr)
            k *= 2
        # out-of-image x_r -> consistent by convention (sentinel -2)
        oob = (xio3 + dio + md > W - 1) if mirror_lr \
            else (xio3 < dio + md)
        shr = jnp.where(oob, jnp.float32(-2.0), shr)
        rsel = (rd - md)[:, None, :]
        cand = jnp.min(jnp.where(dio.astype(jnp.float32) == rsel,
                                 shr, _BIG), axis=1)             # (R, W)
        ok = (((cand >= 0.0) & (jnp.abs(cand - disp) <= disp12))
              | (cand <= -1.5) | (cand >= _BIG * 0.5))
        valid = valid * jnp.where(ok, 1.0, 0.0)

    elif disp12 >= 0 and min_disp >= 0:
        md = min_disp
        W = S.shape[2]
        BIGP = jnp.int32(2 ** 30)
        # Winner-scatter LR consistency on the (R, W) MAPS with an
        # incremental one-lane roll per disparity step (a rolling
        # register: pr_{q+1} = roll(pr_q, 1)), instead of the r2-r4
        # log2(D) whole-(R, D, W)-block roll pyramids — the map-sized
        # loop moves ~D*(R*W) elements per phase vs ~log2(D)*(R*D*W)
        # for the pyramid (14x less VPU traffic at 720p/128; r5 A/B in
        # tools/ab_r5.py). Static roll-by-one keeps Mosaic on fast
        # whole-vreg rotates (traced-shift rolls measured far slower in
        # the r4 fused-sort experiment, ops/sort_tpu.py).
        #
        # ``mirror_lr`` runs the whole check in mirrored-x semantics
        # (for sgbm_pair_pallas's un-mirrored right-matcher volume,
        # where the secondary view lies at x+d instead of x-d): every
        # roll direction and boundary convention flips; the per-pixel
        # mins and selects are mirror-invariant.
        xio2 = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
        group = 8
        while D % group:
            group //= 2

        def lroll1(a):   # a[x + 1] (normal) / a[x - 1] (mirrored)
            return pltpu.roll(a, 1 if mirror_lr else W - 1, 1)

        def rroll1(a):   # a[x - 1] (normal) / a[x + 1] (mirrored)
            return pltpu.roll(a, W - 1 if mirror_lr else 1, 1)

        # --- phase 1: disp2p(x) = min over q of packed(x+q+md)
        # restricted to source columns whose winner is exactly q+md
        def scatter_group(g, carry):
            pr, acc = carry
            for j in range(group):
                shift = g * group + j + md
                src_ok = (xio2 >= shift if mirror_lr
                          else xio2 < W - shift)
                ok = ((pr & (PK - 1)) == shift) & src_ok
                acc = jnp.minimum(acc, jnp.where(ok, pr, BIGP))
                pr = lroll1(pr)
            return pr, acc

        pr0 = packed
        for _ in range(md % W):
            pr0 = lroll1(pr0)
        _, disp2p = jax.lax.fori_loop(
            0, D // group, scatter_group,
            (pr0, jnp.full((R, W), BIGP, jnp.int32)))
        disp2 = jnp.where(disp2p < BIGP,
                          (disp2p & (PK - 1)).astype(jnp.float32), -1.0)

        # --- phase 2: consistency at x_r = x -/+ round(disp):
        # cand(x) = disp2[x - rd] selected from the rolling register at
        # q + md == rd; out-of-image x_r -> sentinel -2 (= consistent
        # by convention)
        rd = jnp.round(disp)                                     # (R, W)

        def gather_group(g, carry):
            dr, cand = carry
            for j in range(group):
                shift = g * group + j + md
                oob = (xio2 > W - 1 - shift if mirror_lr
                       else xio2 < shift)
                v = jnp.where(oob, jnp.float32(-2.0), dr)
                cand = jnp.where(rd == shift, v, cand)
                dr = rroll1(dr)
            return dr, cand

        dr0 = disp2
        for _ in range(md % W):
            dr0 = rroll1(dr0)
        _, cand = jax.lax.fori_loop(
            0, D // group, gather_group,
            (dr0, jnp.full((R, W), _BIG, jnp.float32)))
        ok = (((cand >= 0.0) & (jnp.abs(cand - disp) <= disp12))
              | (cand <= -1.5) | (cand >= _BIG * 0.5))
        valid = valid * jnp.where(ok, 1.0, 0.0)

    return disp, valid, packed


def _lr_finalize(disp: jnp.ndarray, valid: jnp.ndarray,
                 packed: jnp.ndarray, params: SGBMParams,
                 apply_lr: bool) -> jnp.ndarray:
    """Winner-scatter LR consistency (spec: ops/sgbm_ref.lr_check_np) on
    the WTA kernels' (disp, valid, packed) maps, then final masking.
    Pure (H, W)-map XLA ops; reuses ops.sgbm._winner_scatter_disp2."""
    from .sgbm import _winner_scatter_disp2
    ok = valid > 0.0
    if apply_lr and params.disp12_max_diff >= 0:
        D, md = params.num_disparities, params.min_disparity
        PK = 1 << int(D + md).bit_length()
        s0i = packed >> PK.bit_length() - 1
        d_star = (packed & (PK - 1)) - md
        disp2 = _winner_scatter_disp2(s0i, d_star, D, md)
        W = disp.shape[-1]
        xr = (jnp.arange(W)[None, :]
              - jnp.round(disp).astype(jnp.int32)).astype(jnp.int32)
        xr_ok = (xr >= 0) & (xr <= W - 1)
        d2 = jnp.take_along_axis(disp2, jnp.clip(xr, 0, W - 1), axis=1)
        consistent = ((d2 >= 0)
                      & (jnp.abs(d2 - disp) <= params.disp12_max_diff))
        ok &= jnp.where(xr_ok, consistent, True)
    return jnp.where(ok, disp, -1.0)


def _wta_lr_kernel(sd_ref, su_ref, sh_ref, disp_ref, val_ref, pk_ref, *,
                   D: int, R: int, min_disp: int, uniq: int,
                   quantize_16: bool, disp12: int = -1):
    """Per grid step: R rows. Reads the 3 partial path-sum volumes and
    emits (disp, valid, packed-winner) maps in one pass — replaces the
    jnp wta stage (which cost ~35 ms at 720p128 as a separate XLA pass;
    fused here the volumes are read exactly once).
    """
    S = (sd_ref[:].astype(jnp.float32) + su_ref[:].astype(jnp.float32)
         + sh_ref[:].astype(jnp.float32))                    # (R, D, W)
    disp, valid, packed = _wta_body(S, D=D, R=R, min_disp=min_disp,
                                    uniq=uniq, quantize_16=quantize_16,
                                    disp12=disp12)
    disp_ref[:] = disp
    val_ref[:] = valid
    pk_ref[:] = packed


def _up_wta_kernel(c_ref, sd_ref, *refs, P1: float, P2: float,
                   with_diag: bool, D: int, K: int, min_disp: int,
                   uniq: int, quantize_16: bool, disp12: int = -1,
                   sd_offset: float = 0.0, c_dmajor: bool = False,
                   mirror_lr: bool = False, lr_impl: str = "grouped",
                   diag_roll: bool = False):
    """Fused bottom-up DP pass + WTA: one slab of K rows per grid step
    (grid scans H bottom-up). The up-path contributions never touch HBM —
    each row's L_up (+diagonals) is summed with the S_down and S_h slabs
    in VMEM and the slab goes straight into the WTA body, saving one
    full volume write + read (~0.6 ms at 720p/128). ``sd_ref`` may carry
    the down+horizontal sum (3-input form passes S_h separately)."""
    if len(refs) == 7:
        sh_ref, disp_ref, val_ref, pk_ref, lv_ref, ldr_ref, ldl_ref = refs
    else:
        sh_ref = None
        disp_ref, val_ref, pk_ref, lv_ref, ldr_ref, ldl_ref = refs
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        lv_ref[:] = jnp.zeros_like(lv_ref)
        if with_diag:
            ldr_ref[:] = jnp.zeros_like(ldr_ref)
            ldl_ref[:] = jnp.zeros_like(ldl_ref)

    c_slab = (jnp.transpose(c_ref[:], (1, 0, 2)) if c_dmajor else None)
    Wd = lv_ref.shape[1]
    xio_d = (jax.lax.broadcasted_iota(jnp.int32, (D, Wd), 1)
             if diag_roll else None)
    rows = []
    for j in range(K):
        jj = K - 1 - j                             # bottom-up inside slab
        c = (c_slab[jj] if c_dmajor else c_ref[jj]).astype(jnp.float32)
        W = c.shape[1]

        def update(Lprev):
            return _sgm_update(c, Lprev, P1, P2)

        Lv = update(lv_ref[:])
        lv_ref[:] = Lv
        up = Lv
        if with_diag:
            pdr, pdl = _diag_shifts(ldr_ref[:], ldl_ref[:], W, xio_d)
            Ldr = update(pdr)
            Ldl = update(pdl)
            ldr_ref[:] = Ldr
            ldl_ref[:] = Ldl
            up = up + Ldr + Ldl
        S_row = up + (sd_ref[jj].astype(jnp.float32) + sd_offset)
        if sh_ref is not None:
            S_row = S_row + sh_ref[jj].astype(jnp.float32)
        rows.append((jj, S_row))

    S = jnp.stack([r for _, r in sorted(rows)], axis=0)      # (K, D, W)
    disp, valid, packed = _wta_body(S, D=D, R=K, min_disp=min_disp,
                                    uniq=uniq, quantize_16=quantize_16,
                                    disp12=disp12, mirror_lr=mirror_lr,
                                    lr_impl=lr_impl)
    disp_ref[:] = disp
    val_ref[:] = valid
    pk_ref[:] = packed


def up_wta_pallas(C: jnp.ndarray, S_down: jnp.ndarray,
                  S_h: jnp.ndarray = None,
                  params: SGBMParams = SGBMParams(), rows_per_step: int = 8,
                  apply_lr: bool = True, with_diag: bool = True,
                  sd_offset: float = 0.0,
                  c_dmajor: bool = False,
                  mirror_lr: bool = False,
                  lr_impl: str = "grouped",
                  diag_roll: bool = True) -> jnp.ndarray:
    """Fused up-pass (+diagonals) + WTA: (H, D, W) cost + the partial
    path sums -> (H, W) float32 disparity, -1 invalid. Bit-compatible
    with directional_pass_pallas(reverse=True) + wta_lr_pallas. ``S_h``
    may be None when S_down already accumulates the horizontal sum;
    ``sd_offset`` undoes the bias shift applied when storing the
    accumulated down+horizontal volume in int16 (its range ~[0, 43500]
    exceeds int16 max; a -range/2 shift recenters it exactly).
    ``c_dmajor``: C arrives (D, H, W) (cost-kernel native layout),
    leading-transposed per slab in VMEM — saves the full-volume HBM
    transpose."""
    if c_dmajor:
        D, H, W = C.shape
    else:
        H, D, W = C.shape
    K = rows_per_step
    while H % K:
        K //= 2
    # the (K, W) disparity output block needs K % 8 == 0 in compiled mode
    assert K % 8 == 0, (H, rows_per_step)
    idx = lambda i: (H // K - 1 - i, 0, 0)

    # the grouped two-level LR builds (K, D/8, W) temporaries (1/8 the
    # old full-pyramid shears), so slabs up to ~8M elements fit VMEM —
    # this brings the 2560x1440x256 sweep's LR in-kernel (it used to
    # fall back to the XLA winner-scatter finalize above 2M). The flat
    # pyramid keeps the old 2M gate.
    lr_cap = (8 * 1024 * 1024 if (lr_impl == "grouped" and D % 8 == 0)
              else 2 * 1024 * 1024)
    lr_in_kernel = (apply_lr and params.disp12_max_diff >= 0
                    and params.min_disparity >= 0
                    and K * D * W <= lr_cap)
    kernel = functools.partial(
        _up_wta_kernel, P1=float(params.P1), P2=float(params.P2),
        with_diag=with_diag, D=D, K=K, min_disp=params.min_disparity,
        uniq=params.uniqueness_ratio, quantize_16=params.quantize_16,
        disp12=params.disp12_max_diff if lr_in_kernel else -1,
        sd_offset=sd_offset, c_dmajor=c_dmajor, mirror_lr=mirror_lr,
        lr_impl=lr_impl, diag_roll=diag_roll)

    scratch = [pltpu.VMEM((D, W), jnp.float32)]
    if with_diag:
        scratch += [pltpu.VMEM((D, W), jnp.float32),
                    pltpu.VMEM((D, W), jnp.float32)]
    else:
        scratch += [pltpu.VMEM((8, 128), jnp.float32),
                    pltpu.VMEM((8, 128), jnp.float32)]

    ins = [C, S_down] if S_h is None else [C, S_down, S_h]
    spec = pl.BlockSpec((K, D, W), idx, memory_space=pltpu.VMEM)
    if c_dmajor:
        c_spec = pl.BlockSpec((D, K, W), lambda i: (0, H // K - 1 - i, 0),
                              memory_space=pltpu.VMEM)
    else:
        c_spec = spec
    mspec = pl.BlockSpec((K, W), lambda i: (H // K - 1 - i, 0),
                         memory_space=pltpu.VMEM)
    disp, valid, packed = pl.pallas_call(
        kernel,
        grid=(H // K,),
        in_specs=[c_spec] + [spec] * (len(ins) - 1),
        out_specs=(mspec, mspec, mspec),
        out_shape=(jax.ShapeDtypeStruct((H, W), jnp.float32),
                   jax.ShapeDtypeStruct((H, W), jnp.float32),
                   jax.ShapeDtypeStruct((H, W), jnp.int32)),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(*ins)
    assert not (mirror_lr and apply_lr and not lr_in_kernel), \
        "mirror_lr requires the in-kernel LR path (slab <= 2^21 elems)"
    return _lr_finalize(disp, valid, packed, params,
                        apply_lr and not lr_in_kernel)


def wta_lr_pallas(S_down: jnp.ndarray, S_up: jnp.ndarray, S_h: jnp.ndarray,
                  params: SGBMParams, rows_per_step: int = 8,
                  apply_lr: bool = True) -> jnp.ndarray:
    """(H, D, W) partial path sums -> (H, W) float32 disparity, -1 invalid.

    Bit-compatible with wta()+lr_check() from ops/sgbm.py on the summed
    volume (tested)."""
    H, D, W = S_down.shape
    R = rows_per_step
    assert H % R == 0

    # in-kernel LR builds several (R, D, W) shear temporaries; at sweep
    # scale (R=8, D=256, W=2560 -> ~21 MB each) they overflow the VMEM
    # limit — same guard as up_wta_pallas, fall back to _lr_finalize
    lr_in_kernel = (apply_lr and params.disp12_max_diff >= 0
                    and params.min_disparity >= 0
                    and R * D * W <= 2 * 1024 * 1024)
    kernel = functools.partial(
        _wta_lr_kernel, D=D, R=R, min_disp=params.min_disparity,
        uniq=params.uniqueness_ratio, quantize_16=params.quantize_16,
        disp12=params.disp12_max_diff if lr_in_kernel else -1)

    spec = pl.BlockSpec((R, D, W), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((R, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    disp, valid, packed = pl.pallas_call(
        kernel,
        grid=(H // R,),
        in_specs=[spec, spec, spec],
        out_specs=(mspec, mspec, mspec),
        out_shape=(jax.ShapeDtypeStruct((H, W), jnp.float32),
                   jax.ShapeDtypeStruct((H, W), jnp.float32),
                   jax.ShapeDtypeStruct((H, W), jnp.int32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(S_down, S_up, S_h)
    return _lr_finalize(disp, valid, packed, params,
                        apply_lr and not lr_in_kernel)


# ---------------------------------------------------------------------------
# speckle label-propagation kernel (connected components via log-doubling)
# ---------------------------------------------------------------------------


def _speckle_labels_kernel(disp_ref, lab_ref, *, H: int, W: int,
                           max_diff: float, max_iters: int = 0):
    """Min-label CCL, fully VMEM-resident.

    Labels (min flat-index per 4-connected component of similar disparity)
    converge via row+column segmented-min sweeps iterated **to
    convergence** (while_loop on "any label changed" — exact flood-fill
    CCL for arbitrarily snaky components); each sweep is a log2-depth
    doubling of (value, run-link) pairs using whole-array rolls — pure
    VPU, no gathers. Invalid pixels carry label H*W (sentinel). Semantics
    identical to the jnp segmented-scan CCL in ops/sgbm.py
    (speckle_filter), which costs ~58 ms at 720p as XLA associative scans
    vs ~3 ms here.
    """
    d = disp_ref[:]
    valid = d >= 0.0
    yio = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xio = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    flat = yio * W + xio
    sent = jnp.int32(H * W)
    one = jnp.int32(1)
    zero = jnp.int32(0)
    lab0 = jnp.where(valid, flat, sent)

    def link(a, b, ok_mask):
        return jnp.where(ok_mask & (d >= 0) & (b >= 0)
                         & (jnp.abs(d - b) <= max_diff), one, zero)

    # connectivity to the left/up neighbor (disparity math stays f32;
    # labels and links are int32 — i32 min/add is faster on the VPU)
    d_l = pltpu.roll(d, 1, 1)
    d_u = pltpu.roll(d, 1, 0)
    c_h = link(d, d_l, xio >= 1)          # (H, W): linked to x-1
    c_v = link(d, d_u, yio >= 1)          # linked to y-1

    def sweep(lab, conn, axis, size, reverse):
        """Segmented min along `axis`; conn marks link to index-1 along
        axis. reverse sweeps from high to low indices."""
        io = xio if axis == 1 else yio
        # link to the next element when reversed: conn shifted by -1
        if reverse:
            c = jnp.where(io < size - 1, pltpu.roll(conn, size - 1, axis),
                          zero)
        else:
            c = conn
        val = lab
        k = 1
        while k < size:
            if reverse:
                v_n = jnp.where(io >= size - k, _BIGI,
                                pltpu.roll(val, size - k, axis))
                c_n = jnp.where(io >= size - k, zero,
                                pltpu.roll(c, size - k, axis))
            else:
                v_n = jnp.where(io < k, _BIGI, pltpu.roll(val, k, axis))
                c_n = jnp.where(io < k, zero, pltpu.roll(c, k, axis))
            val = jnp.where(c > 0, jnp.minimum(val, v_n), val)
            c = c * c_n
            k *= 2
        return val

    def body(state):
        lab, _, it = state
        new = sweep(lab, c_h, 1, W, False)
        new = sweep(new, c_h, 1, W, True)
        new = sweep(new, c_v, 0, H, False)
        new = sweep(new, c_v, 0, H, True)
        return new, jnp.any(new != lab), it + 1

    def cond(state):
        if max_iters > 0:
            return state[1] & (state[2] < max_iters)
        return state[1]

    lab, _, _ = jax.lax.while_loop(cond, body,
                                   (lab0, jnp.bool_(True), jnp.int32(0)))
    lab_ref[:] = jnp.where(valid, lab, sent)


def _speckle_labels_batched(disp: jnp.ndarray, max_diff: float,
                            max_iters: int = 0) -> jnp.ndarray:
    """(B, H, W) batched CCL: one grid step per frame (each runs its own
    convergence while_loop in VMEM)."""
    B, H, W = disp.shape
    kernel = functools.partial(_speckle_labels_kernel, H=H, W=W,
                               max_diff=float(max_diff),
                               max_iters=max_iters)
    spec = pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        lambda d_ref, l_ref: kernel(d_ref.at[0], l_ref.at[0]),
        grid=(B,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(disp.astype(jnp.float32))


@functools.lru_cache(maxsize=None)
def _labels_fn(max_diff: float, max_iters: int):
    @jax.custom_batching.custom_vmap
    def f(disp):
        return _speckle_labels_batched(disp[None], max_diff, max_iters)[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, disp):
        del axis_size, in_batched
        return _speckle_labels_batched(disp, max_diff, max_iters), True

    return f


def speckle_labels_pallas(disp: jnp.ndarray, max_diff: float,
                          max_iters: int = 0) -> jnp.ndarray:
    """(H, W) disparity -> (H, W) int32 component labels (min flat
    index; invalid pixels get H*W). ``max_iters`` > 0 caps the
    convergence rounds (see ops/sgbm.speckle_filter docstring for the
    measured bounds); 0 = exact flood-fill. Under vmap the batch is
    routed into the kernel's grid (one frame per step) instead of
    folding into the block (VMEM-bounded) or a sequential lax.map."""
    return _labels_fn(float(max_diff), int(max_iters))(disp)


def _propagate_keep_kernel(lab_ref, seed_ref, out_ref, *, H: int, W: int,
                           max_iters: int = 0):
    """Converged OR-propagation of per-pixel seed bits over CCL
    components (4-connectivity = label equality of neighbors).

    Same segmented doubling sweeps + convergence while_loop as
    _speckle_labels_kernel, with (min, BIGI) replaced by (max, 0): a
    component's OR is reached exactly when its min label would be. Used
    by the seeded speckle keep path: seeds sit at the roots of LARGE
    components only, so the converged bit field is precisely
    ``component size > max_size`` for every valid pixel."""
    lab = lab_ref[:]
    sent = jnp.int32(H * W)
    yio = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xio = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    one = jnp.int32(1)
    zero = jnp.int32(0)
    ok = lab != sent
    c_h = jnp.where((xio >= 1) & ok & (pltpu.roll(lab, 1, 1) == lab),
                    one, zero)
    c_v = jnp.where((yio >= 1) & ok & (pltpu.roll(lab, 1, 0) == lab),
                    one, zero)

    def sweep(bit, conn, axis, size, reverse):
        io = xio if axis == 1 else yio
        if reverse:
            c = jnp.where(io < size - 1, pltpu.roll(conn, size - 1, axis),
                          zero)
        else:
            c = conn
        val = bit
        k = 1
        while k < size:
            if reverse:
                v_n = jnp.where(io >= size - k, zero,
                                pltpu.roll(val, size - k, axis))
                c_n = jnp.where(io >= size - k, zero,
                                pltpu.roll(c, size - k, axis))
            else:
                v_n = jnp.where(io < k, zero, pltpu.roll(val, k, axis))
                c_n = jnp.where(io < k, zero, pltpu.roll(c, k, axis))
            val = jnp.where(c > 0, jnp.maximum(val, v_n), val)
            c = c * c_n
            k *= 2
        return val

    def body(state):
        bit, _, it = state
        new = sweep(bit, c_h, 1, W, False)
        new = sweep(new, c_h, 1, W, True)
        new = sweep(new, c_v, 0, H, False)
        new = sweep(new, c_v, 0, H, True)
        return new, jnp.any(new != bit), it + 1

    def cond(state):
        if max_iters > 0:
            return state[1] & (state[2] < max_iters)
        return state[1]

    bit, _, _ = jax.lax.while_loop(cond, body,
                                   (seed_ref[:], jnp.bool_(True),
                                    jnp.int32(0)))
    out_ref[:] = bit


def _propagate_keep_batched(labels: jnp.ndarray, seed: jnp.ndarray,
                            max_iters: int = 0) -> jnp.ndarray:
    B, H, W = labels.shape
    kernel = functools.partial(_propagate_keep_kernel, H=H, W=W,
                               max_iters=max_iters)
    spec = pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        lambda l_ref, s_ref, o_ref: kernel(l_ref.at[0], s_ref.at[0],
                                           o_ref.at[0]),
        grid=(B,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(labels, seed)


def _speckle_keep_seeded_batched(labels: jnp.ndarray, max_size: int,
                                 max_iters: int = 0) -> jnp.ndarray:
    """(B, H, W) labels -> keep mask via the seeded path: key-only sort,
    large-run root extraction, an 8K-index XLA scatter (measured
    ~7 us/frame), and converged OR-propagation. Replaces the (key, pos)
    pair sort + packed unpermute sort of speckle_keep_pallas — ~1.2 ms
    cheaper per 720p frame on v5e (the unpermute sort is gone entirely
    and the remaining sort carries no payload)."""
    from .sort_tpu import large_run_roots, sorted_labels
    B, H, W = labels.shape
    skey, n, n2, L, R = sorted_labels(labels)
    slots = -(-L // (max_size + 1))
    # the kernel's slot axis is lane-padded to 128; scatter only the
    # real slots (128-wide scatters measured 0.64 ms/frame of fusion)
    roots = large_run_roots(skey, n2, L, max_size)[:, :, :slots]
    roots = roots.reshape(B, -1)
    safe = jnp.where((roots >= 0) & (roots < n), roots, n2)
    seed = jnp.zeros((B, n2), jnp.int32).at[
        jnp.arange(B)[:, None], safe].set(1, mode="drop")
    seed = seed[:, :n].reshape(B, H, W)
    return _propagate_keep_batched(labels, seed, max_iters) != 0


@functools.lru_cache(maxsize=None)
def _keep_seeded_fn(max_size: int, max_iters: int):
    @jax.custom_batching.custom_vmap
    def f(labels):
        return _speckle_keep_seeded_batched(labels[None], max_size,
                                            max_iters)[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, labels):
        del axis_size, in_batched
        return _speckle_keep_seeded_batched(labels, max_size,
                                            max_iters), True

    return f


def speckle_keep_seeded(labels: jnp.ndarray, max_size: int,
                        max_iters: int = 0) -> jnp.ndarray:
    """Per-pixel bool: component size > max_size, for VALID pixels (the
    sentinel component always reads False here, unlike
    speckle_keep_pallas, whose callers mask it with `valid` anyway)."""
    return _keep_seeded_fn(int(max_size), int(max_iters))(labels)


def component_sizes_sorted(labels: jnp.ndarray) -> jnp.ndarray:
    """Per-element count of equal values in ``labels`` (any shape, int32).

    Sort-based: a pair sort groups equal labels into runs, run lengths come
    from two associative scans, and a second pair sort unpermutes. ~6 ms at
    720p on v5e vs ~16 ms for XLA scatter-add histogram + gather (both are
    effectively serialized per element on TPU)."""
    n = labels.size
    flat = labels.reshape(-1)
    pos = jnp.arange(n, dtype=jnp.int32)
    skey, sidx = jax.lax.sort_key_val(flat, pos)
    newrun = skey[1:] != skey[:-1]
    start = jnp.concatenate([jnp.array([True]), newrun])
    end = jnp.concatenate([newrun, jnp.array([True])])
    run_start = jax.lax.associative_scan(jnp.maximum,
                                         jnp.where(start, pos, 0))
    run_end = jax.lax.associative_scan(jnp.minimum,
                                       jnp.where(end, pos, n - 1),
                                       reverse=True)
    size_sorted = run_end - run_start + 1
    _, sizes = jax.lax.sort_key_val(sidx, size_sorted)
    return sizes.reshape(labels.shape)


def speckle_filter_pallas(disp: jnp.ndarray, max_size: int,
                          max_diff: float,
                          max_iters: int = 0) -> jnp.ndarray:
    """Full speckle filter: pallas CCL labels + component sizes.

    Equivalent to ops.sgbm.speckle_filter on (disp, disp>=0). Every member
    of a component is valid (invalid pixels carry the sentinel label), so
    counting all label occurrences equals the valid-only histogram for
    valid pixels; invalid pixels are masked below.

    The keep mask comes from the seeded path (key-only VMEM bitonic
    sort + large-root seeds + OR-propagation, speckle_keep_seeded —
    ~2x cheaper than the pair-sort + unpermute-sort path at 720p on
    v5e) when the map fits in VMEM; tiny max_size values where the
    per-row slot bound blows up fall back to the sort-based keep, and
    larger maps (e.g. the 2560x1440 sweep) use the XLA-sort fallback."""
    labels = speckle_labels_pallas(disp, max_diff, max_iters)
    valid = disp >= 0
    if labels.size <= 2 ** 21:
        L = min(1 << max(labels.size - 1, 1).bit_length(), 1024)
        # seeded path requires CONVERGED labels: under a max_iters cap a
        # label value need not equal its own root pixel's label, so the
        # scatter could seed a pixel outside the counted run
        if max_iters == 0 and -(-L // (max_size + 1)) <= 256:
            keep = speckle_keep_seeded(labels, max_size)
        else:
            from .sort_tpu import speckle_keep_pallas
            keep = speckle_keep_pallas(labels, max_size)
    else:
        keep = component_sizes_sorted(labels) > max_size
    return valid & keep
