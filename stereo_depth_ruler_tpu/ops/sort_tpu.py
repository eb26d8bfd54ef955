"""VMEM-resident bitonic sort + per-element equal-value counts for TPU.

Replaces `jax.lax.sort_key_val` in the speckle component-size stage
(ops/sgbm_pallas.component_sizes_sorted): XLA's generic TPU sort of the
~1M-label map measured 6.4 ms at 720p (two sorts — rank and unpermute);
this kernel runs the whole pipeline (bitonic sort by label, segmented
run-length scan, bitonic unpermute) on int32 arrays that never leave
VMEM, using only whole-array lane/sublane rolls and selects — no
gathers, no scatters.

Layout: the flat array is viewed as (R, L) with L = 128*2**ceil..., in
row-major flat order. A bitonic exchange at XOR-distance k is realized
as two circular rolls + a parity select (partner(f) = f ^ k), on lanes
for k < L and on sublanes for k >= L. The segmented scans use flat
shifts (lane roll + sublane carry select).

Semantics match cv::filterSpeckles' component counting via
ops/sgbm_pallas.component_sizes_sorted (exact; tested in
tests/test_sort_tpu.py). Reference behavior anchor:
/root/reference/stereo_vision/src/stereo_disparity.cpp:8
(speckleWindowSize=200).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["equal_value_counts_pallas", "speckle_keep_pallas"]

_INF = 2 ** 30  # python int: jnp scalars would be captured consts in-kernel


def _flat_roll(a, k: int, R: int, L: int, fill):
    """val[f - k] over the row-major flat order of an (R, L) block
    (k > 0, k < R*L); out-of-range positions (f < k) get ``fill``."""
    yio = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    xio = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    kr, kl = divmod(k, L)
    R_ = a.shape[0]
    if kl == 0:
        out = pltpu.roll(a, kr % R_, 0)
    else:
        lr = pltpu.roll(a, kl, 1)          # val[y, x - kl (mod L)]
        # x < kl wraps: needs previous row's tail -> one extra sublane roll
        out = jnp.where(xio >= kl, pltpu.roll(lr, kr % R_, 0),
                        pltpu.roll(lr, (kr + 1) % R_, 0))
    f = yio * L + xio
    return jnp.where(f >= k, out, fill)


def _xor_partner(a, k: int, L: int):
    """val[f ^ k] for power-of-two k over flat (R, L) row-major order."""
    if k < L:
        io = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
        fwd = pltpu.roll(a, L - k, 1)      # val[x + k]
        bwd = pltpu.roll(a, k, 1)          # val[x - k]
    else:
        kr = k // L
        R = a.shape[0]
        io = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
        io = io * L  # scale so (io & k) tests the right bit
        fwd = pltpu.roll(a, R - kr, 0)
        bwd = pltpu.roll(a, kr, 0)
    return jnp.where((io & k) == 0, fwd, bwd)


def _flat_roll_fwd(a, k: int, R: int, L: int, fill):
    """val[f + k] over flat (R, L) row-major order; f + k >= n2 -> fill."""
    yio = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    xio = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    kr, kl = divmod(k, L)
    if kl == 0:
        out = pltpu.roll(a, R - kr, 0) if kr else a
    else:
        lr = pltpu.roll(a, L - kl, 1)      # val[y, x + kl (mod L)]
        nr = (R - kr - 1) % R
        out = jnp.where(xio < L - kl, pltpu.roll(lr, (R - kr) % R, 0),
                        pltpu.roll(lr, nr, 0))
    f = yio * L + xio
    return jnp.where(f + k < R * L, out, fill)


def _sort_chunk_kernel(k_ref, v_ref, ko_ref, vo_ref, *, exchanges,
                       n2: int, L: int, group_rows: int = 0):
    """A chunk of bitonic compare-exchanges ((stage, k) pairs, in order).

    Chunked because Mosaic's scoped-VMEM stack grows with each unrolled
    exchange: one kernel per outer stage (up to 20 exchanges at
    (1024, 1024)) overflowed the 100 MB limit. Block is (1, R, L): the
    grid iterates a BATCH of independent sorts per launch (r5: the
    ~43-launch chain per frame was paying ~0.5 ms/frame of launch
    overhead under vmap's sequential lax.map). With ``group_rows`` the
    block is a (1, group_rows, L) slice of each sort (grid axis 1 walks
    the groups) and the flat order offsets by the group base — valid
    for exchanges whose XOR distance k stays below group_rows * L."""
    key, val = k_ref.at[0][:], v_ref.at[0][:]
    R = key.shape[0]
    yio = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    xio = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    f = yio * L + xio
    if group_rows:
        f = f + pl.program_id(1) * (group_rows * L)
    for stage, k in exchanges:
        pk = _xor_partner(key, k, L)
        pv = _xor_partner(val, k, L)
        up = (f & stage) == 0 if stage < n2 else jnp.bool_(True)
        lower = (f & k) == 0
        take_min = jnp.logical_not(jnp.logical_xor(lower, up))
        keep = ((take_min & (key <= pk))
                | (jnp.logical_not(take_min) & (key >= pk)))
        key = jnp.where(keep, key, pk)
        val = jnp.where(keep, val, pv)
    ko_ref.at[0][:] = key
    vo_ref.at[0][:] = val


_SORT_GROUPS = 4        # sub-blocks per sort for group-local exchanges
_SORT_CHUNK_LOCAL = 24  # unrolled exchanges per local kernel
_SORT_CHUNK_GLOBAL = 8  # unrolled exchanges per full-array kernel
# r5 on-chip sweep (720p keep path, same-session A/B): runtime is flat
# across (groups, chunk) in [3.6, 4.0] ms — the sort is VPU-bound by
# total exchanges, not launches or HBM round-trips — but COMPILE time
# varies 4x: small group blocks compile far faster (Mosaic cost grows
# superlinearly with block size). g=4/cl=24/cg=8: ~45 s vs ~196 s for
# the flat chain with 16-exchange chunks.


def _exchange_buckets(n2: int, L: int, R: int, chunk_local: int,
                      chunk_global: int):
    """The bitonic schedule, bucketed into maximal in-order runs of
    group-LOCAL exchanges (XOR distance < the group span, so a
    (group_rows, L) block pairs only within itself) and GLOBAL ones.
    Groups split R into 4 when the array is big enough: at n2 = 2^20
    only 3 of 210 exchanges are global, so almost the whole sort runs
    from 1 MB blocks with ~4x larger unrolled chunks (fewer launches
    AND fewer HBM round-trips than the flat chunk-8 chain)."""
    groups = _SORT_GROUPS if R >= 8 * _SORT_GROUPS else 1
    span = (R // groups) * L
    exchanges = []
    stage = 2
    while stage <= n2:
        k = stage // 2
        while k >= 1:
            exchanges.append((stage, k))
            k //= 2
        stage *= 2
    buckets = []          # (is_local, [(stage, k), ...])
    for ex in exchanges:
        local = ex[1] < span
        cap = chunk_local if local else chunk_global
        if buckets and buckets[-1][0] == local and len(
                buckets[-1][1]) < cap:
            buckets[-1][1].append(ex)
        else:
            buckets.append((local, [ex]))
    return groups, buckets


def _bitonic_sort_staged(key: jnp.ndarray, val: jnp.ndarray, n2: int,
                         L: int, chunk: int = 8):
    """Ascending (key, val) bitonic sort as a chain of pallas_calls,
    batched over the leading axis of (B, R, L) arrays (one grid step per
    independent sort). A single fully-unrolled kernel (210 exchanges at
    n2 = 2^20) took Mosaic >25 min to compile and one kernel per outer
    stage overflowed scoped VMEM. Group-local exchanges (see
    _exchange_buckets) run on a (B, groups) grid of small blocks with
    ~32-exchange chunks; only the few global exchanges stream the full
    sort per step."""
    B, R, _ = key.shape
    groups, buckets = _exchange_buckets(
        n2, L, R, chunk_local=_SORT_CHUNK_LOCAL,
        chunk_global=_SORT_CHUNK_GLOBAL)
    gr = R // groups
    spec_g = pl.BlockSpec((1, gr, L), lambda b, g: (b, g, 0),
                          memory_space=pltpu.VMEM)
    spec_f = pl.BlockSpec((1, R, L), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    for local, exs in buckets:
        grid = (B, groups) if local else (B,)
        spec = spec_g if local else spec_f
        kernel = functools.partial(
            _sort_chunk_kernel, exchanges=tuple(exs), n2=n2, L=L,
            group_rows=gr if local else 0)
        key, val = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec] * 2,
            out_specs=(spec,) * 2,
            out_shape=(jax.ShapeDtypeStruct((B, R, L), jnp.int32),) * 2,
            input_output_aliases={0: 0, 1: 1},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=116 * 1024 * 1024),
        )(key, val)
    return key, val




# ---------------------------------------------------------------------------
# fused single-launch bitonic sorts (dynamic-shift rolls, SMEM schedule)
# ---------------------------------------------------------------------------


def _exchange_table(n2: int):
    ex = []
    stage = 2
    while stage <= n2:
        k = stage // 2
        while k >= 1:
            ex.append((stage, k))
            k //= 2
        stage *= 2
    return ex


def _partner_dyn(a, k, L: int):
    """val[f ^ k] for a TRACED power-of-two k (lane rolls for k < L,
    sublane rolls above) — the dynamic-shift form of _xor_partner."""
    R = a.shape[0]
    lio = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1)
    rio = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0) * L

    def lane(_):
        fwd = pltpu.roll(a, (L - k) % L, 1)
        bwd = pltpu.roll(a, k % L, 1)
        return jnp.where((lio & k) == 0, fwd, bwd)

    def subl(_):
        kr = k // L
        fwd = pltpu.roll(a, (R - kr) % R, 0)
        bwd = pltpu.roll(a, kr % R, 0)
        return jnp.where((rio & k) == 0, fwd, bwd)

    return jax.lax.cond(k < L, lane, subl, 0)


def _fused_sort_kernel(st_ref, kk_ref, k_ref, v_ref, ko_ref, vo_ref, *,
                       n2: int, L: int, with_val: bool):
    """One bitonic compare-exchange per grid step; the (R, L) arrays stay
    VMEM-resident across the whole grid (same-block accumulation), and
    the (stage, k) schedule streams from SMEM — ONE launch instead of
    ~21 chunked calls (the staged form re-streams 8-16 MB of HBM per
    chunk and pays ~60 launch overheads per frame)."""
    i = pl.program_id(0)
    stage = st_ref[i]
    k = kk_ref[i]

    @pl.when(i == 0)
    def _init():
        ko_ref[:] = k_ref[:]
        if with_val:
            vo_ref[:] = v_ref[:]

    key = ko_ref[:]
    R = key.shape[0]
    yio = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    xio = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    f = yio * L + xio
    pk = _partner_dyn(key, k, L)
    up = ((f & stage) == 0) | (stage >= n2)
    lower = (f & k) == 0
    take_min = jnp.logical_not(jnp.logical_xor(lower, up))
    if with_val:
        val = vo_ref[:]
        pv = _partner_dyn(val, k, L)
        keep = ((take_min & (key <= pk))
                | (jnp.logical_not(take_min) & (key >= pk)))
        ko_ref[:] = jnp.where(keep, key, pk)
        vo_ref[:] = jnp.where(keep, val, pv)
    else:
        ko_ref[:] = jnp.where(take_min, jnp.minimum(key, pk),
                              jnp.maximum(key, pk))


def _bitonic_sort_fused(key: jnp.ndarray, val, n2: int, L: int):
    """Single-launch bitonic sort; ``val`` None -> key-only variant.
    Returns key or (key, val).

    MEASURED SLOWER than the staged form on v5e (keep path 14.9 ms vs
    3.9 ms at 2^20): tpu.dynamic_rotate + the per-step lax.cond lower
    far worse than unrolled static-shift rolls, dwarfing the saved
    launch overhead and chunk re-streaming. Kept (with interpret-mode
    parity tests vs the staged sort) as the documented negative result;
    the product path uses _bitonic_sort_staged."""
    R = key.shape[0]
    ex = _exchange_table(n2)
    stages = jnp.asarray([e[0] for e in ex], jnp.int32)
    ks = jnp.asarray([e[1] for e in ex], jnp.int32)
    with_val = val is not None
    kernel = functools.partial(_fused_sort_kernel, n2=n2, L=L,
                               with_val=with_val)
    full = pl.BlockSpec((R, L), lambda i, *_: (0, 0),
                        memory_space=pltpu.VMEM)
    dummy = val if with_val else key
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(len(ex),),
        in_specs=[full, full],
        out_specs=(full, full),
    )
    ko, vo = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((R, L), jnp.int32),) * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=116 * 1024 * 1024),
    )(stages, ks, key, dummy)
    return (ko, vo) if with_val else ko


def _sizes_scan_kernel(sk_ref, si_ref, so_ref, io_ref, *, n2: int, L: int):
    """Sorted keys -> per-position run length (sizes_sorted), passing
    sidx through for the unpermute sorts. (1, R, L) blocks, batch grid."""
    skey = sk_ref.at[0][:]
    R = skey.shape[0]
    yio = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    xio = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    f = yio * L + xio
    prev = _flat_roll(skey, 1, R, L, _INF - 1)
    start = skey != prev
    rs = jnp.where(start, f, 0)
    k = 1
    while k < n2:
        rs = jnp.maximum(rs, _flat_roll(rs, k, R, L, 0))
        k *= 2
    ne = jnp.where(start, f, n2)
    k = 1
    while k < n2:
        ne = jnp.minimum(ne, _flat_roll_fwd(ne, k, R, L, n2))
        k *= 2
    nxt = _flat_roll_fwd(ne, 1, R, L, n2)
    so_ref.at[0][:] = nxt - rs
    io_ref.at[0][:] = si_ref.at[0][:]


def _pack_batched(labels: jnp.ndarray):
    """(B, ...) int labels -> (B, R, L) padded flat blocks + geometry."""
    B = labels.shape[0]
    n = int(np.prod(labels.shape[1:]))
    n2 = 1
    while n2 < n:
        n2 *= 2
    L = min(n2, 1024)
    R = n2 // L
    flat = jnp.full((B, n2), _INF, jnp.int32).at[:, :n].set(
        labels.reshape(B, -1).astype(jnp.int32))
    return flat.reshape(B, R, L), n, n2, L, R


def _counts_batched(labels: jnp.ndarray) -> jnp.ndarray:
    """(B, ...) -> per-element equal-value counts, all B sorts sharing
    each pallas launch (grid over the batch)."""
    B = labels.shape[0]
    key, n, n2, L, R = _pack_batched(labels)
    pos = jnp.broadcast_to(jnp.arange(n2, dtype=jnp.int32).reshape(R, L),
                           (B, R, L))
    skey, sidx = _bitonic_sort_staged(key, pos, n2, L)
    kernel = functools.partial(_sizes_scan_kernel, n2=n2, L=L)
    spec = pl.BlockSpec((1, R, L), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    sizes_sorted, sidx = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[spec] * 2,
        out_specs=(spec,) * 2,
        out_shape=(jax.ShapeDtypeStruct((B, R, L), jnp.int32),) * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(skey, sidx)
    _, out = _bitonic_sort_staged(sidx, sizes_sorted, n2, L)
    return out.reshape(B, -1)[:, :n].reshape(labels.shape)


@jax.custom_batching.custom_vmap
def equal_value_counts_pallas(labels: jnp.ndarray) -> jnp.ndarray:
    """Per-element count of equal int32 values. Drop-in replacement for
    ops/sgbm_pallas.component_sizes_sorted for arrays up to 2^21 elements
    (VMEM-resident); larger inputs should use the XLA-sort fallback.

    Batching: jax.vmap's default pallas rule folds the batch axis into
    each kernel's block (VMEM OOM at 720p batch 4); the custom rule
    routes the batch into the kernels' GRID instead, so the ~43-launch
    sort chain runs once per batch rather than once per frame."""
    return _counts_batched(labels[None])[0]


@equal_value_counts_pallas.def_vmap
def _counts_vmap_rule(axis_size, in_batched, labels):
    del axis_size, in_batched
    return _counts_batched(labels), True


# ---------------------------------------------------------------------------
# specialized keep-mask path: single-array unpermute (min/max exchanges)
# ---------------------------------------------------------------------------


def _sort_chunk_single_kernel(k_ref, ko_ref, *, exchanges, n2: int, L: int,
                              group_rows: int = 0):
    """Chunk of compare-exchanges on ONE int32 array (no payload):
    new = take_min ? min(a, pk) : max(a, pk) — about half the VPU work
    and half the VMEM traffic of the pair version. Blocks/grids as in
    _sort_chunk_kernel (group-local with ``group_rows``)."""
    key = k_ref.at[0][:]
    R = key.shape[0]
    yio = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    xio = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    f = yio * L + xio
    if group_rows:
        f = f + pl.program_id(1) * (group_rows * L)
    for stage, k in exchanges:
        pk = _xor_partner(key, k, L)
        up = (f & stage) == 0 if stage < n2 else jnp.bool_(True)
        lower = (f & k) == 0
        take_min = jnp.logical_not(jnp.logical_xor(lower, up))
        key = jnp.where(take_min, jnp.minimum(key, pk),
                        jnp.maximum(key, pk))
    ko_ref.at[0][:] = key


def _bitonic_sort_single(key: jnp.ndarray, n2: int, L: int,
                         chunk: int = 10) -> jnp.ndarray:
    B, R, _ = key.shape
    groups, buckets = _exchange_buckets(
        n2, L, R, chunk_local=_SORT_CHUNK_LOCAL,
        chunk_global=_SORT_CHUNK_GLOBAL)
    gr = R // groups
    spec_g = pl.BlockSpec((1, gr, L), lambda b, g: (b, g, 0),
                          memory_space=pltpu.VMEM)
    spec_f = pl.BlockSpec((1, R, L), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    for local, exs in buckets:
        kernel = functools.partial(
            _sort_chunk_single_kernel, exchanges=tuple(exs), n2=n2, L=L,
            group_rows=gr if local else 0)
        key = pl.pallas_call(
            kernel,
            grid=(B, groups) if local else (B,),
            in_specs=[spec_g if local else spec_f],
            out_specs=spec_g if local else spec_f,
            out_shape=jax.ShapeDtypeStruct((B, R, L), jnp.int32),
            input_output_aliases={0: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=116 * 1024 * 1024),
        )(key)
    return key


def _keep_scan_kernel(sk_ref, si_ref, pk_ref, *, n2: int, L: int,
                      max_size: int):
    """Sorted keys + sidx -> packed (sidx*2 + keep_bit) where keep =
    run length > max_size. (1, R, L) blocks, batch grid."""
    skey = sk_ref.at[0][:]
    R = skey.shape[0]
    yio = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)
    xio = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
    f = yio * L + xio
    prev = _flat_roll(skey, 1, R, L, _INF - 1)
    start = skey != prev
    rs = jnp.where(start, f, 0)
    k = 1
    while k < n2:
        rs = jnp.maximum(rs, _flat_roll(rs, k, R, L, 0))
        k *= 2
    ne = jnp.where(start, f, n2)
    k = 1
    while k < n2:
        ne = jnp.minimum(ne, _flat_roll_fwd(ne, k, R, L, n2))
        k *= 2
    nxt = _flat_roll_fwd(ne, 1, R, L, n2)
    keep = ((nxt - rs) > max_size).astype(jnp.int32)
    pk_ref.at[0][:] = si_ref.at[0][:] * 2 + keep


def _speckle_keep_batched(labels: jnp.ndarray, max_size: int):
    B = labels.shape[0]
    key, n, n2, L, R = _pack_batched(labels)
    pos = jnp.broadcast_to(jnp.arange(n2, dtype=jnp.int32).reshape(R, L),
                           (B, R, L))
    skey, sidx = _bitonic_sort_staged(key, pos, n2, L)
    kernel = functools.partial(_keep_scan_kernel, n2=n2, L=L,
                               max_size=int(max_size))
    spec = pl.BlockSpec((1, R, L), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    packed = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[spec] * 2,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, R, L), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(skey, sidx)
    out = _bitonic_sort_single(packed, n2, L)
    return (out.reshape(B, -1)[:, :n] & 1).astype(
        jnp.bool_).reshape(labels.shape)


# ---------------------------------------------------------------------------
# seeded keep path: key-only sort + large-root extraction (no unpermute)
# ---------------------------------------------------------------------------


def _large_roots_kernel(sk_ref, o_ref, *, n2: int, L: int, max_size: int,
                        slots: int):
    """Sorted labels -> per-sublane-row root indices of LARGE runs.

    A sorted run is large (length > max_size) iff the element max_size
    positions ahead still holds the same value — one flat roll replaces
    the full run-length doubling scan. Starts of distinct large runs are
    > max_size apart in flat order, so a row of L flat positions holds at
    most ceil(L / (max_size + 1)) of them: `slots` iterations of a
    lane max-reduce + eliminate extract every one, emitting (R, slots)
    root indices (-1 = empty slot). The run's VALUE is the component
    label = the root pixel's flat index (CCL labels are min flat index
    per component), which is what the seeded propagation needs."""
    skey = sk_ref.at[0][:]
    R = skey.shape[0]
    prev = _flat_roll(skey, 1, R, L, _INF - 1)
    start = skey != prev
    ahead = _flat_roll_fwd(skey, max_size, R, L, -1)
    large = start & (ahead == skey)
    v = jnp.where(large, skey + 1, 0)
    cols = []
    for _ in range(slots):
        m = jnp.max(v, axis=1, keepdims=True)
        cols.append(m)
        v = jnp.where(v == m, 0, v)
    out = jnp.concatenate(cols, axis=1) - 1
    pad = o_ref.shape[-1] - slots           # lane-dim alignment padding
    if pad:
        out = jnp.concatenate(
            [out, jnp.full((R, pad), -1, jnp.int32)], axis=1)
    o_ref.at[0][:, :] = out


def large_run_roots(skey: jnp.ndarray, n2: int, L: int,
                    max_size: int) -> jnp.ndarray:
    """(B, R, L) SORTED label blocks -> (B, R, slots) large-run values
    (component roots), -1-padded. See _large_roots_kernel."""
    B, R, _ = skey.shape
    slots = -(-L // (max_size + 1))
    slots_pad = -(-slots // 128) * 128      # Mosaic lane-dim tiling
    kernel = functools.partial(_large_roots_kernel, n2=n2, L=L,
                               max_size=int(max_size), slots=slots)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, R, L), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R, slots_pad), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, slots_pad), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(skey)


def sorted_labels(labels: jnp.ndarray):
    """(B, ...) labels -> key-only-sorted (B, R, L) blocks + geometry.
    Half the VPU work and VMEM traffic of the (key, pos) pair sort: the
    seeded keep path never needs the positions."""
    key, n, n2, L, R = _pack_batched(labels)
    return _bitonic_sort_single(key, n2, L), n, n2, L, R


@functools.lru_cache(maxsize=None)
def _keep_fn(max_size: int):
    @jax.custom_batching.custom_vmap
    def f(labels):
        return _speckle_keep_batched(labels[None], max_size)[0]

    @f.def_vmap
    def _rule(axis_size, in_batched, labels):
        del axis_size, in_batched
        return _speckle_keep_batched(labels, max_size), True

    return f


def speckle_keep_pallas(labels: jnp.ndarray, max_size: int) -> jnp.ndarray:
    """Per-pixel bool: component size (count of equal labels) > max_size.

    Same first sort as equal_value_counts_pallas, but the unpermute
    carries a single packed int32 (sidx*2 + keep-bit) through min/max
    exchanges — about 35% faster than the generic counts path at 720p.
    vmap batches via sequential lax.map (see equal_value_counts_pallas)."""
    return _keep_fn(int(max_size))(labels)
