"""Round-5 kernel A/B harness: times individual SGBM stages and the full
matcher on the real chip with chained in-program iteration (the same
honest-timing trick bench.py uses), so variants can be compared in one
session without harness-overhead ambiguity.

Usage: python tools/ab_r5.py [--stages down,up,matcher,...] [--iters N]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

H, W, D = 720, 1280, 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(fn, args, iters=30, name=""):
    """Per-call ms via a chained fori_loop fetching one scalar."""
    import jax
    import jax.numpy as jnp

    def probe(out):
        leaves = jax.tree_util.tree_leaves(out)
        s = jnp.float32(0)
        for leaf in leaves:
            s += jnp.sum(leaf[(0,) * (leaf.ndim - 1)][:1].astype(jnp.float32))
        return s * 1e-30

    @jax.jit
    def chained(*xs):
        def body(i, acc):
            out = fn(*jax.tree_util.tree_map(
                lambda x: x + (acc * 1e-20).astype(x.dtype), xs))
            return probe(out) + acc
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    float(chained(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(chained(*args))
    ms = (time.perf_counter() - t0) * 1000 / iters
    log(f"{name:42s} {ms:8.3f} ms   (compile+1st {compile_s:.1f}s)")
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="down,matcher")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    stages = set(args.stages.split(","))

    import jax
    import jax.numpy as jnp

    from stereo_depth_ruler_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from stereo_depth_ruler_tpu.calib.config import StereoRig
    from stereo_depth_ruler_tpu.io.synthetic import (make_scene,
                                                     render_stereo_pair)
    from stereo_depth_ruler_tpu.ops import sgbm_pallas as sp
    from stereo_depth_ruler_tpu.ops.sgbm import SGBMParams, sobel_clip

    params = SGBMParams(num_disparities=D, block_size=5,
                        speckle_window_size=200, speckle_range=2)
    rig = StereoRig.synthetic(width=W, height=H)
    scene = make_scene(rig, n_boxes=5, z_range_mm=(900.0, 4000.0),
                       background_z_mm=6000.0, seed=0)
    left, right, _ = render_stereo_pair(scene, seed=0)
    lt = sobel_clip(jnp.asarray(left, jnp.float32), params.pre_filter_cap)
    rt = sobel_clip(jnp.asarray(right, jnp.float32), params.pre_filter_cap)

    log(f"building cost volume inputs ({H}x{W}x{D})...")
    C = jax.jit(lambda a, b: sp.build_cost_volume_pallas(
        a, b, params, out_dtype=jnp.int16))(lt, rt)
    C = jax.block_until_ready(C)
    bias = sp._wta_bias(params, True, jnp.int16)
    Ct = jax.block_until_ready(jnp.transpose(C, (2, 1, 0)))
    hf = jax.jit(lambda c: sp.directional_pass_pallas(
        c, params.P1, params.P2, False, False))(Ct)
    S_h = jax.block_until_ready(jnp.transpose(
        jax.jit(lambda c, a: sp.directional_pass_pallas(
            c, params.P1, params.P2, True, False, acc=a))(Ct, hf),
        (2, 1, 0)))
    S_dh = jax.block_until_ready(jax.jit(
        lambda c, a: sp.directional_pass_pallas(
            c, params.P1, params.P2, False, True, acc=a,
            out_offset=-bias))(C, S_h))

    P1, P2 = params.P1, params.P2
    if "t1" in stages:
        C_d = jax.block_until_ready(jax.jit(
            lambda a, b: sp.build_cost_volume_pallas(
                a, b, params, out_dtype=jnp.int16, layout="dhw"))(lt, rt))
        timed(lambda c: jnp.transpose(c, (1, 0, 2)) + jnp.int16(0),
              (C_d,), args.iters, "T1 (D,H,W)->(H,D,W) XLA")
        timed(lambda c: sp.transpose_leading_pallas(c),
              (C_d,), args.iters, "T1 (D,H,W)->(H,D,W) pallas leading")
        timed(lambda c: jnp.transpose(c, (2, 0, 1)) + jnp.int16(0),
              (C_d,), args.iters, "T2 (D,H,W)->(W,D,H) XLA")
        timed(lambda c: sp.transpose_dhw_to_wdh_pallas(c),
              (C_d,), args.iters, "T2 (D,H,W)->(W,D,H) pallas")
        timed(lambda c: jnp.transpose(c, (2, 1, 0)) + jnp.int16(0),
              (C,), args.iters, "T2' (H,D,W)->(W,D,H) XLA")
        timed(lambda s: jnp.transpose(s, (2, 1, 0)) + jnp.int16(0),
              (jax.block_until_ready(jnp.transpose(C, (2, 1, 0))),),
              args.iters, "T3 (W,D,H)->(H,D,W) XLA")
    if "down" in stages:
        for mode in (False, True):
            timed(lambda c, a, m=mode: sp.directional_pass_pallas(
                c, P1, P2, False, True, acc=a, out_offset=-bias,
                diag_roll=m),
                (C, S_h), args.iters, f"down 3-path +acc diag_roll={mode}")
    if "hor" in stages:
        for mode in (False, True):
            timed(lambda c, m=mode: sp.directional_pass_pallas(
                c, P1, P2, False, False, roll_shift=m),
                (Ct,), args.iters, f"horizontal fwd roll_shift={mode}")
            timed(lambda c, a, m=mode: sp.directional_pass_pallas(
                c, P1, P2, True, False, acc=a, roll_shift=m),
                (Ct, hf), args.iters, f"horizontal bwd +acc roll_shift={mode}")
    if "up" in stages:
        for impl in ("pyramid", "rolling"):
            timed(lambda c, s, m=impl: sp.up_wta_pallas(
                c, s, None, params, apply_lr=True, with_diag=True,
                sd_offset=bias, lr_impl=m),
                (C, S_dh), args.iters, f"fused up+WTA+LR lr_impl={impl}")
        timed(lambda c, s: sp.up_wta_pallas(
            c, s, None, params, apply_lr=True, with_diag=True,
            sd_offset=bias, diag_roll=True),
            (C, S_dh), args.iters, "fused up+WTA+LR diag_roll=True")
    if "speckle" in stages:
        disp = jax.block_until_ready(jax.jit(
            lambda c, s: sp.up_wta_pallas(c, s, None, params, apply_lr=True,
                                          with_diag=True, sd_offset=bias))(
                                              C, S_dh))
        timed(lambda d: sp.speckle_labels_pallas(d, params.speckle_range),
              (disp,), args.iters, "speckle CCL labels")
        from stereo_depth_ruler_tpu.ops.sort_tpu import speckle_keep_pallas
        labels = jax.block_until_ready(jax.jit(
            lambda d: sp.speckle_labels_pallas(
                d, params.speckle_range))(disp))
        timed(lambda la: speckle_keep_pallas(la, params.speckle_window_size),
              (labels,), args.iters, "speckle keep (sorts)")
    if "matcher" in stages:
        timed(lambda a, b: sp.sgbm_pallas(a, b, params),
              (jnp.asarray(left, jnp.float32),
               jnp.asarray(right, jnp.float32)),
              args.iters, "full matcher (single frame)")
    if "matcher4" in stages:
        lb = jnp.stack([jnp.asarray(left, jnp.float32)] * 4)
        rb = jnp.stack([jnp.asarray(right, jnp.float32)] * 4)
        ms = timed(lambda a, b: jax.vmap(
            lambda x, y: sp.sgbm_pallas(x, y, params))(a, b),
            (lb, rb), max(4, args.iters // 4), "full matcher (batch 4)")
        log(f"  -> {4000.0 / ms:.2f} fps")


if __name__ == "__main__":
    main()
