"""Sharded SGBM execution over a (frame, tile, disp) device mesh.

The reference has no distributed execution at all (SURVEY.md §2.10); this
module is the TPU-native scale-out design:

- **frame** axis: data parallelism — frames are independent, zero comms.
- **tile** axis: the H dimension of the (H, W, D) cost volume is sharded.
  Horizontal DP paths are row-local (free). Vertical/diagonal paths carry
  state across tile boundaries; two modes:
    * ``halo`` (default): each tile receives a `halo`-row slab of its
      neighbor's cost volume via `ppermute` and warm-starts the scan from
      the zero state `halo` rows early. SGM's P2 cap + min-normalization
      attenuate the influence of the start state, so a modest halo (32-64
      rows) reproduces the exact result almost everywhere (tested); tile 0
      (down pass) / last tile (up pass) receive `ppermute`'s zero fill —
      which IS the exact path-start state, so edge tiles are exact.
    * ``exact``: sequential wavefront — tile k runs its scan only after
      receiving tile k-1's final carry (ppermute chain). Bitwise equal to
      single-device, at pipeline-serial latency; used as the correctness
      anchor and for deterministic multi-chip == single-chip tests.
- **disp** axis: scan passes (down / up / left / right groups) are
  round-robined over disp-axis members via `lax.switch` (each member
  computes a subset of the 8 paths), and the per-path sums combine with
  `psum`. Halo exchanges run unconditionally outside the switch so
  collectives never sit in divergent control flow.

All collectives are XLA named-axis ops inside `jax.shard_map`; on a real
pod slice they ride ICI.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.reproject import reproject_to_3d
from ..ops.sgbm import (SGBMParams, _dp_update, _shift_w, bt_cost_volume,
                        box_filter_volume, lr_check, sobel_clip,
                        speckle_filter, wta)
from .mesh import DISP_AXIS, FRAME_AXIS, TILE_AXIS

__all__ = ["sgbm_sharded", "pipeline_step_sharded"]


# ---------------------------------------------------------------------------
# local building blocks (operate on a tile's row slab)
# ---------------------------------------------------------------------------


def _local_cost_slab(left: jnp.ndarray, right: jnp.ndarray,
                     params: SGBMParams, tile_idx, h_local: int
                     ) -> jnp.ndarray:
    """Cost volume rows [tile_idx*h_local, (tile_idx+1)*h_local) computed
    from the replicated full images. The Sobel prefilter (±1 row) and box
    window (±block//2 rows) need context rows, so an extended slab is
    computed and cropped — cheap since images are replicated."""
    pad = params.block_size // 2 + 1
    H = left.shape[0]
    start = tile_idx * h_local
    # clamp the extended window to the image; track the crop offset
    ext_start = jnp.maximum(start - pad, 0)
    ext_start = jnp.minimum(ext_start, H - (h_local + 2 * pad))
    ext_rows = h_local + 2 * pad
    lext = jax.lax.dynamic_slice_in_dim(left, ext_start, ext_rows, axis=0)
    rext = jax.lax.dynamic_slice_in_dim(right, ext_start, ext_rows, axis=0)
    lt = sobel_clip(lext, params.pre_filter_cap)
    rt = sobel_clip(rext, params.pre_filter_cap)
    C = bt_cost_volume(lt, rt, params.num_disparities, params.min_disparity)
    C = box_filter_volume(C, params.block_size)
    off = start - ext_start
    return jax.lax.dynamic_slice_in_dim(C, off, h_local, axis=0)


def _scan_h(cost: jnp.ndarray, P1, P2, reverse: bool) -> jnp.ndarray:
    """Horizontal path (row-local): scan over W with (H_local, D) carry."""
    cw = jnp.swapaxes(cost, 0, 1)

    def step(carry, c):
        L = _dp_update(carry, c, P1, P2)
        return L, L

    z = jnp.zeros((cost.shape[0], cost.shape[2]), jnp.float32)
    _, L = jax.lax.scan(step, z, cw, reverse=reverse)
    return jnp.swapaxes(L, 0, 1)


def _scan_v(cost_ext: jnp.ndarray, P1, P2, reverse: bool,
            keep: int, with_diag: bool) -> jnp.ndarray:
    """Vertical (+diagonal) pass over an extended slab; returns the last
    (`reverse=False`) or first (`reverse=True`) `keep` rows of the summed
    path volumes."""
    W, D = cost_ext.shape[1], cost_ext.shape[2]

    def step(carry, c):
        if with_diag:
            pv, pdr, pdl = carry
            Lv = _dp_update(pv, c, P1, P2)
            # for the up pass the diagonals run (-1,+1)/(-1,-1): the shift
            # direction relative to scan order is the same
            Ldr = _dp_update(_shift_w(pdr, +1), c, P1, P2)
            Ldl = _dp_update(_shift_w(pdl, -1), c, P1, P2)
            return (Lv, Ldr, Ldl), Lv + Ldr + Ldl
        Lv = _dp_update(carry, c, P1, P2)
        return Lv, Lv

    z = jnp.zeros((W, D), jnp.float32)
    init = (z, z, z) if with_diag else z
    _, S = jax.lax.scan(step, init, cost_ext, reverse=reverse)
    if reverse:
        return S[:keep]
    return S[S.shape[0] - keep:]


def _aggregate_tile_halo(cost: jnp.ndarray, params: SGBMParams,
                         halo: int, num_paths: int,
                         n_tile: int, n_disp: int, disp_idx
                         ) -> jnp.ndarray:
    """Tile-sharded aggregation, halo mode. `cost` is the local slab.

    Returns this device's partial path-sum (psum over DISP_AXIS pending).
    """
    P1, P2 = jnp.float32(params.P1), jnp.float32(params.P2)
    h_local = cost.shape[0]
    halo = min(halo, h_local)
    with_diag = num_paths == 8

    # --- unconditional halo exchanges (outside any switch) --------------
    if n_tile > 1 and num_paths >= 4:
        fwd = [(i, i + 1) for i in range(n_tile - 1)]
        bwd = [(i + 1, i) for i in range(n_tile - 1)]
        prev_slab = jax.lax.ppermute(cost[h_local - halo:], TILE_AXIS, fwd)
        next_slab = jax.lax.ppermute(cost[:halo], TILE_AXIS, bwd)
        down_ext = jnp.concatenate([prev_slab, cost], axis=0)
        up_ext = jnp.concatenate([cost, next_slab], axis=0)
    else:
        down_ext = cost
        up_ext = cost

    # --- path-group branches (round-robined over the disp axis) ---------
    def g_lr(_):
        return _scan_h(cost, P1, P2, reverse=False)

    def g_rl(_):
        return _scan_h(cost, P1, P2, reverse=True)

    def g_down(_):
        return _scan_v(down_ext, P1, P2, reverse=False, keep=h_local,
                       with_diag=with_diag)

    def g_up(_):
        return _scan_v(up_ext, P1, P2, reverse=True, keep=h_local,
                       with_diag=with_diag)

    groups = [g_down, g_up, g_lr, g_rl] if num_paths >= 4 else [g_lr, g_rl]

    if n_disp == 1:
        S = jnp.zeros_like(cost)
        for g in groups:
            S = S + g(None)
        return S

    # member k computes groups k, k+n_disp, ...
    S = jnp.zeros_like(cost)
    for base in range(0, len(groups), n_disp):
        chunk = groups[base:base + n_disp]
        while len(chunk) < n_disp:
            chunk.append(lambda _: jnp.zeros_like(cost))
        S = S + jax.lax.switch(disp_idx, chunk, None)
    return S


def _aggregate_tile_exact(cost: jnp.ndarray, params: SGBMParams,
                          num_paths: int, n_tile: int) -> jnp.ndarray:
    """Exact sequential-wavefront aggregation (disp axis must be 1).

    Tile k's vertical scan starts from tile k-1's final carries, chained
    with ppermute; bitwise-identical to the single-device scan.
    """
    P1, P2 = jnp.float32(params.P1), jnp.float32(params.P2)
    h_local, W, D = cost.shape
    with_diag = num_paths == 8

    S = _scan_h(cost, P1, P2, reverse=False) + \
        _scan_h(cost, P1, P2, reverse=True)
    if num_paths == 2:
        return S

    def step(carry, c):
        if with_diag:
            pv, pdr, pdl = carry
            Lv = _dp_update(pv, c, P1, P2)
            Ldr = _dp_update(_shift_w(pdr, +1), c, P1, P2)
            Ldl = _dp_update(_shift_w(pdl, -1), c, P1, P2)
            return (Lv, Ldr, Ldl), Lv + Ldr + Ldl
        Lv = _dp_update(carry, c, P1, P2)
        return Lv, Lv

    z = jnp.zeros((W, D), jnp.float32)
    zc = (z, z, z) if with_diag else z
    my = jax.lax.axis_index(TILE_AXIS)
    fwd = [(i, i + 1) for i in range(n_tile - 1)]
    bwd = [(i + 1, i) for i in range(n_tile - 1)]

    def wavefront(scan_rev, perm):
        carry_in = zc
        out = jnp.zeros_like(cost)
        for k in range(n_tile):
            turn = (n_tile - 1 - k) if scan_rev else k
            fin, Sv = jax.lax.scan(step, carry_in, cost, reverse=scan_rev)
            active = my == turn
            out = jnp.where(active, Sv, out)
            keep = jax.tree.map(
                lambda f, c: jnp.where(active, f, c), fin, carry_in)
            carry_in = jax.tree.map(
                lambda x: jax.lax.ppermute(x, TILE_AXIS, perm), keep)
        return out

    S = S + wavefront(False, fwd) + wavefront(True, bwd)
    return S


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------


def sgbm_sharded(left, right, params: SGBMParams, mesh: Mesh,
                 halo: int = 32, exact: bool = False,
                 apply_speckle: bool = True):
    """Single-pair SGBM sharded over the mesh's (tile, disp) axes.

    Images are replicated; the cost volume and all DP state are sharded.
    Returns a fully-replicated (H, W) float32 disparity map (invalid -1).
    """
    n_tile = mesh.shape[TILE_AXIS]
    n_disp = mesh.shape[DISP_AXIS]
    if exact and n_disp != 1:
        raise ValueError("exact wavefront mode requires disp axis == 1")
    H, W = left.shape
    assert H % n_tile == 0, f"H={H} must divide tile axis {n_tile}"
    h_local = H // n_tile

    def impl(l, r):
        tile_idx = jax.lax.axis_index(TILE_AXIS)
        disp_idx = jax.lax.axis_index(DISP_AXIS)
        C = _local_cost_slab(l, r, params, tile_idx, h_local)
        if exact:
            S = _aggregate_tile_exact(C, params, params.num_paths, n_tile)
        else:
            S = _aggregate_tile_halo(C, params, halo, params.num_paths,
                                     n_tile, n_disp, disp_idx)
            if n_disp > 1:
                S = jax.lax.psum(S, DISP_AXIS)
        disp, valid = wta(S, params)
        if params.disp12_max_diff >= 0:
            valid = lr_check(S, disp, valid, params)
        disp = jnp.where(valid, disp, -1.0)
        # assemble the full map (all_gather over tile; replicate over disp)
        full = jax.lax.all_gather(disp, TILE_AXIS, axis=0, tiled=True)
        return full

    fn = jax.shard_map(impl, mesh=mesh, check_vma=False,
                       in_specs=(P(), P()),
                       out_specs=P())
    disp = fn(jnp.asarray(left, jnp.float32), jnp.asarray(right, jnp.float32))
    if apply_speckle and params.speckle_window_size > 0:
        valid = speckle_filter(disp, disp >= 0, params.speckle_window_size,
                               params.speckle_range)
        disp = jnp.where(valid, disp, -1.0)
    return disp


def pipeline_step_sharded(lefts, rights, rig_Q, params: SGBMParams,
                          mesh: Mesh, halo: int = 32,
                          scale: float = 1.0):
    """Batched frames over the full (frame, tile, disp) mesh: frames are
    data-parallel, each frame's SGBM is tile/disp-sharded, depth is
    reprojected on the tile-local rows (global row offsets), and full maps
    are assembled with all_gather — the multi-chip video step
    (SURVEY.md §2.10 table).

    lefts/rights: (N, H, W) float32. Returns dict with (N, H, W) disparity
    and (N, H, W, 3) xyz, sharded over the frame axis.
    """
    n_frame = mesh.shape[FRAME_AXIS]
    n_tile = mesh.shape[TILE_AXIS]
    n_disp = mesh.shape[DISP_AXIS]
    N, H, W = lefts.shape
    assert N % n_frame == 0 and H % n_tile == 0
    h_local = H // n_tile
    import numpy as np
    Qj = np.asarray(rig_Q, np.float64)

    def one_pair(l, r):
        tile_idx = jax.lax.axis_index(TILE_AXIS)
        disp_idx = jax.lax.axis_index(DISP_AXIS)
        C = _local_cost_slab(l, r, params, tile_idx, h_local)
        S = _aggregate_tile_halo(C, params, halo, params.num_paths,
                                 n_tile, n_disp, disp_idx)
        if n_disp > 1:
            S = jax.lax.psum(S, DISP_AXIS)
        disp, valid = wta(S, params)
        valid = lr_check(S, disp, valid, params)
        disp = jnp.where(valid, disp, -1.0)
        xyz = reproject_to_3d(disp, Qj, scale=scale,
                              row_offset=tile_idx * h_local)
        disp_full = jax.lax.all_gather(disp, TILE_AXIS, axis=0, tiled=True)
        xyz_full = jax.lax.all_gather(xyz, TILE_AXIS, axis=0, tiled=True)
        return disp_full, xyz_full

    def impl(ls, rs):
        return jax.lax.map(lambda lr: one_pair(*lr), (ls, rs))

    fn = jax.shard_map(impl, mesh=mesh, check_vma=False,
                       in_specs=(P(FRAME_AXIS), P(FRAME_AXIS)),
                       out_specs=(P(FRAME_AXIS), P(FRAME_AXIS)))
    disp, xyz = fn(jnp.asarray(lefts, jnp.float32),
                   jnp.asarray(rights, jnp.float32))
    return {"disparity": disp, "xyz": xyz}
