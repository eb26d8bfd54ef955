"""Per-kernel roofline report for the product SGBM chain (VERDICT r3
item 2: commit a machine-checkable per-kernel roofline artifact).

Writes ROOFLINE_r05.json at the repo root: each stage's measured ms vs
its speed-of-light bound (HBM bandwidth or VPU compute, whichever is
larger) at the headline 1280x720x128 config. bytes_accessed are the
algorithmic HBM bytes (volumes at int16); flops are approximate VPU
elementwise-op counts (exact op counting is not attempted — the point
is the bound class and the achieved fraction).

Run as the ONLY JAX process:  python tools/roofline_r4.py
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from stereo_depth_ruler_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
import numpy as np

from stereo_depth_ruler_tpu.ops.sgbm import SGBMParams, sobel_clip
from stereo_depth_ruler_tpu.ops import sgbm_pallas as sp
from stereo_depth_ruler_tpu.ops.wls_pallas import (
    shift_gather_pallas, wls_disparity_filter_pallas)
from stereo_depth_ruler_tpu.ops.reproject import reproject_to_3d
from stereo_depth_ruler_tpu.utils.profiling import StageSpec, roofline_report

H, W, D = 720, 1280, 128
V = H * W * D                       # cost-volume elements
VB = 2 * V                          # int16 volume bytes
MAP = H * W * 4                     # one f32 map

params = SGBMParams(num_disparities=D, block_size=5,
                    speckle_window_size=200, speckle_range=2)
P1, P2 = params.P1, params.P2
bias = sp._wta_bias(params, True, jnp.int16)

rng = np.random.default_rng(0)
left = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
right = jnp.asarray(np.roll(np.asarray(left), -5, axis=1))
lt = jax.jit(lambda a: sobel_clip(a, 63))(left)
rt = jax.jit(lambda a: sobel_clip(a, 63))(right)
C = jax.jit(lambda a, b: sp.build_cost_volume_pallas(
    a, b, params, blk=48, out_dtype=jnp.int16))(lt, rt)
Ct = jnp.transpose(C, (2, 1, 0)).block_until_ready()
hf = jax.jit(lambda c: sp.directional_pass_pallas(
    c, P1, P2, False, False))(Ct)
S_h = jnp.transpose(jax.jit(lambda c, a: sp.directional_pass_pallas(
    c, P1, P2, True, False, acc=a))(Ct, hf), (2, 1, 0)).block_until_ready()
S_dh = jax.jit(lambda c, a: sp.directional_pass_pallas(
    c, P1, P2, False, True, acc=a, out_offset=-bias))(C, S_h)
disp = jax.jit(lambda c, s: sp.up_wta_pallas(
    c, s, None, params, sd_offset=bias))(C, S_dh)
lab = jax.jit(lambda d: sp.speckle_labels_pallas(d, 2.0))(disp)
dl = jnp.asarray(rng.uniform(0, 80, (H, W)), jnp.float32)
dr = jnp.asarray(rng.uniform(0, 80, (H, W)), jnp.float32)
guide = left

stages = [
    StageSpec("cost_build (BT+box, int16 out)",
              lambda a: sp.build_cost_volume_pallas(
                  a, rt, params, blk=48, out_dtype=jnp.int16),
              lt, bytes_accessed=VB + 40e6, flops=V * 20),
    StageSpec("transpose (H,D,W)->(W,D,H) [XLA]",
              lambda c: jnp.transpose(c, (2, 1, 0)), C,
              bytes_accessed=2 * VB, flops=0),
    StageSpec("horizontal fwd pass",
              lambda c: sp.directional_pass_pallas(c, P1, P2, False, False),
              Ct, bytes_accessed=2 * VB, flops=V * 10),
    StageSpec("horizontal bwd pass (+acc)",
              lambda c: sp.directional_pass_pallas(c, P1, P2, True, False,
                                                   acc=hf),
              Ct, bytes_accessed=3 * VB, flops=V * 11),
    StageSpec("transpose back [XLA]",
              lambda c: jnp.transpose(c, (2, 1, 0)), hf,
              bytes_accessed=2 * VB, flops=0),
    StageSpec("down pass (3 paths, +acc, bias)",
              lambda c: sp.directional_pass_pallas(c, P1, P2, False, True,
                                                   acc=S_h,
                                                   out_offset=-bias),
              C, bytes_accessed=3 * VB, flops=V * 31),
    StageSpec("fused up+WTA+LR",
              lambda c: sp.up_wta_pallas(c, S_dh, None, params,
                                         sd_offset=bias),
              C, bytes_accessed=2 * VB + 3 * MAP, flops=V * 95),
    StageSpec("speckle labels (CCL)",
              lambda d: sp.speckle_labels_pallas(d, 2.0), disp,
              bytes_accessed=2 * MAP, flops=H * W * 22 * 30),
    StageSpec("speckle keep (3 bitonic sorts)",
              lambda l: __import__(
                  "stereo_depth_ruler_tpu.ops.sort_tpu",
                  fromlist=["x"]).speckle_keep_pallas(
                      l, 200).astype(jnp.float32),
              lab, bytes_accessed=44 * 8e6,
              flops=3 * 210 * 7 * 2 ** 20),
    StageSpec("WLS shift-gather (LR sample)",
              lambda d: shift_gather_pallas(dr, d, 128, -1e9), dl,
              bytes_accessed=3 * MAP, flops=H * W * 128 * 16),
    StageSpec("WLS full (conf + 6 FGS kernel passes)",
              lambda d: wls_disparity_filter_pallas(d, dr, guide,
                                                    max_disp=128)[0],
              dl, bytes_accessed=30 * MAP,
              flops=H * W * 6 * (11 * 2 * 14)),
    StageSpec("reproject_to_3d (chw)",
              lambda d: reproject_to_3d(d, np.eye(4), layout="chw"), disp,
              bytes_accessed=4 * MAP + 3 * MAP, flops=H * W * 20),
]

report = roofline_report(stages, reps=10,
                         out_path=str(Path(__file__).resolve().parent.parent
                                      / "ROOFLINE_r05.json"))
for r in report["stages"]:
    print(f'{r["stage"]:42s} {r["ms"]:7.3f} ms  bound {r["bound_ms"]:7.3f} '
          f'({r["bound"]:9s})  SoL {r["sol_frac"]}', file=sys.stderr)
print(json.dumps({"total_ms": report["total_ms"]}))
