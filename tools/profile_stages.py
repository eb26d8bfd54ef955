"""Stage-by-stage TPU timing of the Pallas SGBM pipeline (dev tool).

Times each compiled stage with the chained-fori trick so async dispatch
can't hide the work. Run as the only JAX process.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from stereo_depth_ruler_tpu.ops.sgbm import SGBMParams, sobel_clip
from stereo_depth_ruler_tpu.ops import sgbm_pallas as sp

H, W, D = 720, 1280, 128
params = SGBMParams(num_disparities=D, block_size=5,
                    speckle_window_size=200, speckle_range=2)


def timeit(name, fn, *args, iters=20):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))

    @jax.jit
    def chained(*a):
        def body(i, acc):
            o = fn(*jax.tree.map(
                lambda x: (x + acc * 1e-20).astype(x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, a))
            leaves = jax.tree.leaves(o)
            return acc + jnp.sum(leaves[0][:1, :1].astype(jnp.float32)) * 1e-30
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(chained(*args))
    t0 = time.perf_counter()
    float(chained(*args))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:36s} {dt:8.3f} ms", file=sys.stderr, flush=True)
    return out, dt


rng = np.random.default_rng(0)
left = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)
right = jnp.asarray(rng.uniform(0, 255, (H, W)), jnp.float32)

lt = jax.jit(lambda a: sobel_clip(a, params.pre_filter_cap))(left)
rt = jax.jit(lambda a: sobel_clip(a, params.pre_filter_cap))(right)

Cd, t_cost = timeit("cost_build (D,H,W) int16 [no T]",
                    lambda a, b: sp.build_cost_volume_pallas(
                        a, b, params, out_dtype=jnp.int16, layout="dhw"),
                    lt, rt)
C, t_costT = timeit("cost_build (H,D,W) int16 [+XLA T]",
                    lambda a, b: sp.build_cost_volume_pallas(
                        a, b, params, out_dtype=jnp.int16),
                    lt, rt)
Ct, t_tr1 = timeit("transpose (D,H,W)->(W,D,H) [pallas]",
                   sp.transpose_dhw_to_wdh_pallas, Cd)
_, t_tr1x = timeit("transpose (H,D,W)->(W,D,H) [XLA]",
                   lambda c: jnp.transpose(c, (2, 1, 0)), C)
_, t_tr1y = timeit("transpose (D,H,W)->(W,D,H) [XLA]",
                   lambda c: jnp.transpose(c, (2, 0, 1)), Cd)
P1, P2 = params.P1, params.P2
hf, t_h1 = timeit("dir pass fwd (W grid, no diag)",
                  lambda c: sp.directional_pass_pallas(c, P1, P2, False, False), Ct)
hb, t_h2 = timeit("dir pass bwd+acc (W grid)",
                  lambda c, a: sp.directional_pass_pallas(c, P1, P2, True,
                                                          False, acc=a), Ct, hf)
Sh, t_tr2 = timeit("transpose back (W,D,H)->(H,D,W) [pallas]",
                   sp.transpose_vol_pallas, hb)
_, t_tr2x = timeit("transpose back [XLA]",
                   lambda c: jnp.transpose(c, (2, 1, 0)), hb)
bias = sp._wta_bias(params, True, jnp.int16)
Sdh, t_d = timeit("dir pass down+acc+bias (d-major C)",
                  lambda c, a: sp.directional_pass_pallas(
                      c, P1, P2, False, True, acc=a, out_offset=-bias,
                      c_dmajor=True), Cd, Sh)
disp, t_wta = timeit("fused up+WTA+LR (d-major C)",
                     lambda c, s: sp.up_wta_pallas(c, s, None, params,
                                                   sd_offset=bias,
                                                   c_dmajor=True), Cd, Sdh)
_, t_lab = timeit("speckle labels (pallas CCL)",
                  lambda d: sp.speckle_labels_pallas(d, 2.0), disp)
lab = jax.jit(lambda d: sp.speckle_labels_pallas(d, 2.0))(disp)
_, t_siz = timeit("component sizes (XLA sort)",
                  lambda l: sp.component_sizes_sorted(l).astype(jnp.float32),
                  lab)
from stereo_depth_ruler_tpu.ops.sort_tpu import equal_value_counts_pallas
_, t_siz2 = timeit("component sizes (bitonic pallas)",
                   lambda l: equal_value_counts_pallas(l).astype(jnp.float32),
                   lab)
from stereo_depth_ruler_tpu.ops.sort_tpu import speckle_keep_pallas
_, t_keep = timeit("speckle keep (packed bitonic)",
                   lambda l: speckle_keep_pallas(l, 200).astype(jnp.float32),
                   lab)
_, t_all = timeit("full sgbm_pallas",
                  lambda a, b: sp.sgbm_pallas(a, b, params), left, right)

tot = (t_cost + t_tr1 + t_h1 + t_h2 + t_tr2 + t_d + t_wta + t_lab + t_keep)
print(f"{'sum of stages (product path)':36s} {tot:8.3f} ms", file=sys.stderr)
