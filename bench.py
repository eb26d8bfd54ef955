"""Benchmark: stereo frames/sec/chip at 1280x720 x 128-disp SGBM vs the
OpenCV-CPU baseline (BASELINE.json primary metric).

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}
Details go to stderr. Run as the ONLY JAX process (the TPU tunnel
serializes clients).
"""

import argparse
import json
import sys
import time

import numpy as np

H, W, D = 720, 1280, 128
# per-Pallas-launch overhead measured ~0.5 ms through the runtime; batching
# folds the batch into each kernel's grid to amortize it. r5: the sort
# restructure cured the r4 batch-8 compile pathology (>10 min); batch 8 now
# compiles in ~75 s and measures 70.3 vs 68.5 fps at batch 4. Batch 16
# measured no further gain (69.7).
BATCH = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_inputs(batch=BATCH):
    from stereo_depth_ruler_tpu.calib.config import StereoRig
    from stereo_depth_ruler_tpu.io.synthetic import (make_scene,
                                                     render_stereo_pair)
    rig = StereoRig.synthetic(width=W, height=H)
    scene = make_scene(rig, n_boxes=5, z_range_mm=(900.0, 4000.0),
                       background_z_mm=6000.0, seed=0)
    lefts, rights = [], []
    for i in range(batch):
        l, r, _ = render_stereo_pair(scene, seed=0, shift=(2.0 * i, 0.0))
        lefts.append(l)
        rights.append(r)
    return rig, np.stack(lefts), np.stack(rights)


def bench_opencv(lefts, rights, frames=30, trials=5):
    """Reference-parameter cv2.StereoSGBM at the headline config
    (numDisparities=128; other params as stereo_disparity.cpp:5-9).

    Pinned methodology (round-1 review: best-of-3 over 2 frames wobbled
    ±45%): >=30 frames per trial, median of >=5 trials, spread logged.
    cv2 threading is left at its default (the reference runs OpenCV's own
    thread pool, SURVEY.md §2.10)."""
    import cv2
    matcher = cv2.StereoSGBM_create(
        minDisparity=0, numDisparities=D, blockSize=5,
        P1=8 * 3 * 25, P2=32 * 3 * 25, disp12MaxDiff=1, preFilterCap=63,
        uniquenessRatio=12, speckleWindowSize=200, speckleRange=2,
        mode=cv2.STEREO_SGBM_MODE_SGBM_3WAY)
    matcher.compute(lefts[0], rights[0])  # warm
    fps = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for n in range(frames):
            matcher.compute(lefts[n % len(lefts)], rights[n % len(rights)])
        fps.append(frames / (time.perf_counter() - t0))
    fps.sort()
    med = fps[len(fps) // 2]
    log(f"OpenCV trials fps: {['%.2f' % f for f in fps]} "
        f"median {med:.2f} spread {(fps[-1] - fps[0]) / med * 100:.0f}%")
    return med


COMPILE_S = {}


def bench_tpu(rig, lefts, rights, iters=8, use_pallas=True):
    import jax
    from stereo_depth_ruler_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from stereo_depth_ruler_tpu.ops.reproject import reproject_to_3d
    from stereo_depth_ruler_tpu.ops.sgbm import SGBMParams, sgbm

    matcher = sgbm
    if use_pallas:
        try:
            from stereo_depth_ruler_tpu.ops.sgbm_pallas import sgbm_pallas
            matcher = sgbm_pallas
        except Exception as e:  # pallas kernels are optional at this stage
            log("pallas matcher unavailable:", e)

    params = SGBMParams(num_disparities=D, block_size=5,
                        speckle_window_size=200, speckle_range=2)
    Q = rig.Q

    def one(left, right):
        disp = matcher(left, right, params, apply_lr=True, apply_speckle=True)
        z = reproject_to_3d(disp, Q)[..., 2]
        return disp, z

    fwd = jax.jit(jax.vmap(one))
    lb = jnp.asarray(lefts, jnp.float32)
    rb = jnp.asarray(rights, jnp.float32)
    t0 = time.perf_counter()
    out = fwd(lb, rb)
    jax.block_until_ready(out)
    COMPILE_S["sgbm"] = round(time.perf_counter() - t0, 1)
    log(f"compile+first batch: {COMPILE_S['sgbm']}s")
    disp = np.asarray(out[0][0])
    log(f"valid disparity frac: {(disp >= 0).mean():.3f}")

    # honest timing: iterations chained by a data dependency INSIDE one
    # XLA program, fetching only a scalar — async dispatch / remote
    # runtimes cannot elide or overlap-hide the work, and the ~15 ms
    # per-dispatch tunnel latency (measured: multi-dispatch timing read
    # 40.5 fps where the chained program reads ~46) stays out of the
    # number
    @jax.jit
    def chained(l, r):
        def body(i, acc):
            d, z = jax.vmap(one)(l + acc * 1e-20, r)
            return jnp.sum(d) * 1e-30 + acc
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(chained(lb, rb))  # compile
    dts = []
    for _ in range(3):      # median of 3 chained reps (run noise ~±1 fps)
        t0 = time.perf_counter()
        float(chained(lb, rb))
        dts.append(time.perf_counter() - t0)
    dt = sorted(dts)[1]
    return iters * lb.shape[0] / dt


def bench_tpu_full_pipeline(rig, lefts, rights, iters=6):
    """The reference's complete live path on TPU: rectify -> SGBM x2
    (left + ximgproc-style right matcher) -> WLS -> reproject
    (stereo_disparity.cpp:17-39) at the full-res headline config."""
    import jax
    from stereo_depth_ruler_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from stereo_depth_ruler_tpu.ops.sgbm import SGBMParams
    from stereo_depth_ruler_tpu.pipeline import PipelineConfig, StereoPipeline

    params = SGBMParams(num_disparities=D, block_size=5,
                        speckle_window_size=200, speckle_range=2)
    cfg = PipelineConfig(sgbm=params, downscale=1, use_wls=True,
                         lr_mode="right_matcher")
    pipe = StereoPipeline(rig, cfg, rectify=True)
    fwd = pipe._forward_batch
    lb = jnp.asarray(lefts, jnp.float32)
    rb = jnp.asarray(rights, jnp.float32)
    t0 = time.perf_counter()
    out = fwd(lb, rb)
    jax.block_until_ready(out)
    COMPILE_S["full_pipeline"] = round(time.perf_counter() - t0, 1)
    log(f"full-pipeline compile+first batch: {COMPILE_S['full_pipeline']}s")

    forward = pipe._build_forward()

    @jax.jit
    def chained(l, r):
        def body(i, acc):
            o = jax.vmap(forward)(l + acc * 1e-20, r)
            return jnp.sum(o["disparity"][:1, :1, :1]) * 1e-30 + acc
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(chained(lb, rb))  # compile
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(lb, rb))
        dts.append(time.perf_counter() - t0)
    dt = sorted(dts)[1]
    return iters * lb.shape[0] / dt


def bench_tpu_sweep(iters=4):
    """The 2560x1440x256 stress config (SURVEY §5 long-context analog):
    1.9 GB int16 cost volume per frame, VMEM-autotuned cost blocks."""
    import jax
    from stereo_depth_ruler_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from stereo_depth_ruler_tpu.ops.sgbm import SGBMParams
    from stereo_depth_ruler_tpu.ops.sgbm_pallas import sgbm_pallas

    Hs, Ws, Ds = 1440, 2560, 256
    params = SGBMParams(num_disparities=Ds, block_size=5,
                        speckle_window_size=200, speckle_range=2)
    rng = np.random.default_rng(0)
    left = jnp.asarray(rng.uniform(0, 255, (Hs, Ws)), jnp.float32)
    right = jnp.asarray(np.roll(np.asarray(left), -20, axis=1))

    fwd = jax.jit(lambda a, b: sgbm_pallas(a, b, params))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fwd(left, right))
    log(f"sweep compile+first: {time.perf_counter() - t0:.1f}s, "
        f"valid frac {(np.asarray(out) >= 0).mean():.3f}")

    @jax.jit
    def chained(l, r):
        def body(i, acc):
            d = sgbm_pallas(l + acc * 1e-20, r, params)
            return jnp.sum(d[:1, :1]) * 1e-30 + acc
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(chained(left, right))
    t0 = time.perf_counter()
    float(chained(left, right))
    return iters / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--no-full", action="store_true")
    ap.add_argument("--sweep", action="store_true",
                    help="also run the 2560x1440x256 stress config")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--cv-frames", type=int, default=30)
    args = ap.parse_args()

    rig, lefts, rights = make_inputs()
    log("benchmarking OpenCV CPU baseline...")
    cv_fps = bench_opencv(lefts, rights, frames=args.cv_frames)
    log(f"OpenCV CPU SGBM_3WAY {W}x{H}x{D}: {cv_fps:.2f} fps")

    log("benchmarking TPU...")
    tpu_fps = bench_tpu(rig, lefts, rights, iters=args.iters,
                        use_pallas=not args.no_pallas)
    log(f"TPU {W}x{H}x{D}: {tpu_fps:.2f} fps")

    extra = {}
    if not args.no_full:
        log("benchmarking TPU full pipeline (rectify+SGBMx2+WLS)...")
        full_fps = bench_tpu_full_pipeline(rig, lefts, rights,
                                           iters=max(2, args.iters // 2))
        log(f"TPU full pipeline {W}x{H}x{D}: {full_fps:.2f} fps")
        # the CPU baseline is a single matcher pass; the full pipeline adds
        # rectify + a second matcher + WLS, so its honest CPU counterpart
        # is slower than cv_fps — the ratio below is therefore conservative
        extra = {"full_pipeline_fps": round(full_fps, 3),
                 "full_pipeline_vs_cv_sgbm": round(full_fps / cv_fps, 3)}

    if args.sweep:
        log("benchmarking 2560x1440x256 sweep config...")
        sweep_fps = bench_tpu_sweep()
        log(f"TPU sweep 2560x1440x256: {sweep_fps:.2f} fps")
        extra["sweep_2560x1440x256_fps"] = round(sweep_fps, 3)

    print(json.dumps({
        "metric": f"stereo_fps_per_chip_{W}x{H}_{D}disp_sgbm",
        "value": round(tpu_fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(tpu_fps / cv_fps, 3),
        "cv_baseline_fps": round(cv_fps, 3),
        "compile_s": COMPILE_S,
        **extra,
    }))


if __name__ == "__main__":
    main()
