"""Full-pipeline stage profile on TPU: rectify / matchers / WLS /
reproject wall-clock split at the headline 1280x720x128 config (VERDICT
r3 item 3 — commit the output alongside bench results).

Run as the ONLY JAX process. Chained-fori timing with a host fetch per
measurement (block_until_ready does not synchronize through the remote
runtime tunnel)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from stereo_depth_ruler_tpu.calib.config import StereoRig
from stereo_depth_ruler_tpu.io.synthetic import make_scene, render_stereo_pair
from stereo_depth_ruler_tpu.ops.remap import remap_bilinear
from stereo_depth_ruler_tpu.ops.reproject import reproject_to_3d
from stereo_depth_ruler_tpu.ops.sgbm import SGBMParams
from stereo_depth_ruler_tpu.ops.sgbm_pallas import sgbm_pallas
from stereo_depth_ruler_tpu.ops.wls import wls_disparity_filter
from stereo_depth_ruler_tpu.pipeline import PipelineConfig, StereoPipeline

H, W, D = 720, 1280, 128


def timeit(name, fn, *args, iters=10):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)

    @jax.jit
    def chained(*a):
        def body(i, acc):
            o = fn(*[x + acc * 1e-20 if jnp.issubdtype(x.dtype, jnp.floating)
                     else x for x in a])
            leaves = jax.tree.leaves(o)
            return acc + jnp.sum(leaves[0][:1, :1].astype(jnp.float32)) * 1e-30
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(chained(*args))
    t0 = time.perf_counter()
    float(chained(*args))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:40s} {dt:8.3f} ms", file=sys.stderr, flush=True)
    return out, dt


def main():
    rig = StereoRig.synthetic(width=W, height=H)
    scene = make_scene(rig, n_boxes=5, z_range_mm=(900.0, 4000.0),
                       background_z_mm=6000.0, seed=0)
    left, right, _ = render_stereo_pair(scene, seed=0)
    left = jnp.asarray(left, jnp.float32)
    right = jnp.asarray(right, jnp.float32)
    params = SGBMParams(num_disparities=D, block_size=5,
                        speckle_window_size=200, speckle_range=2)

    cfg = PipelineConfig(sgbm=params, downscale=1, use_wls=True,
                         lr_mode="right_matcher")
    pipe = StereoPipeline(rig, cfg, rectify=True)

    _, t_rect = timeit("rectify (remap x2)",
                       lambda a, b: (remap_bilinear(a, pipe.grid_l),
                                     remap_bilinear(b, pipe.grid_r)),
                       left, right)
    lr, rr = jax.jit(lambda a, b: (remap_bilinear(a, pipe.grid_l),
                                   remap_bilinear(b, pipe.grid_r)))(left, right)

    _, t_one = timeit("matcher (single, left)",
                      lambda a, b: sgbm_pallas(a, b, params), lr, rr)

    def both(a, b):
        pl_ = jnp.stack([a, b[:, ::-1]])
        pr_ = jnp.stack([b, a[:, ::-1]])
        dd = jax.vmap(lambda x, y: sgbm_pallas(x, y, params))(pl_, pr_)
        return dd[0], dd[1][:, ::-1]

    (dl, dr), t_both = timeit("matcher x2 (batched L+R)", both, lr, rr)

    _, t_wls = timeit("WLS filter (FGS, jnp)",
                      lambda d1, d2, g: wls_disparity_filter(d1, d2, g),
                      dl, dr, lr)
    from stereo_depth_ruler_tpu.ops.wls_pallas import \
        wls_disparity_filter_pallas
    _, t_wlsp = timeit("WLS filter (FGS, pallas)",
                       lambda d1, d2, g: wls_disparity_filter_pallas(
                           d1, d2, g), dl, dr, lr)
    from stereo_depth_ruler_tpu.ops.sgbm_pallas import sgbm_pair_pallas
    _, t_pair = timeit("matcher x2 (shared-cost pair)",
                       lambda a, b: sgbm_pair_pallas(a, b, params), lr, rr)
    disp = jax.jit(lambda d1, d2, g: wls_disparity_filter(d1, d2, g))(
        dl, dr, lr)[0]

    _, t_rep = timeit("reproject_to_3d",
                      lambda d: reproject_to_3d(d, rig.Q), disp)

    fwd = pipe._build_forward()
    _, t_full = timeit("full pipeline forward", fwd, left, right)

    print(f"{'sum (rect+2x match+wls+reproj)':40s} "
          f"{t_rect + t_both + t_wls + t_rep:8.3f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
