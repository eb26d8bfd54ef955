"""On-hardware MAE artifact at the headline operating point (VERDICT r4
missing item 2 / task 5): compiled-TPU 1280x720x128 full SGBM chain vs
cv2.StereoSGBM (reference parameters, stereo_disparity.cpp:5-9) on >= 8
synthetic stereo frames with known ground truth.

Writes MAE_r05.json at the repo root:
  - disparity MAE vs cv2 over pixels both matchers mark valid
  - reprojected-depth (Z) MAE vs cv2 through the same Q
  - valid-pixel agreement fraction
  - each side's error vs the synthetic ground-truth disparity

Run as the ONLY JAX process:  python tools/mae_r5.py
"""
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

H, W, D = 720, 1280, 128
N_FRAMES = 8


def main():
    import cv2
    import jax
    import jax.numpy as jnp

    from stereo_depth_ruler_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from stereo_depth_ruler_tpu.calib.config import StereoRig
    from stereo_depth_ruler_tpu.io.synthetic import (make_scene,
                                                     render_stereo_pair)
    from stereo_depth_ruler_tpu.ops.reproject import reproject_to_3d
    from stereo_depth_ruler_tpu.ops.sgbm import SGBMParams
    from stereo_depth_ruler_tpu.ops.sgbm_pallas import sgbm_pallas

    params = SGBMParams(num_disparities=D, block_size=5,
                        speckle_window_size=200, speckle_range=2)
    rig = StereoRig.synthetic(width=W, height=H)
    matcher = cv2.StereoSGBM_create(
        minDisparity=0, numDisparities=D, blockSize=5,
        P1=8 * 3 * 25, P2=32 * 3 * 25, disp12MaxDiff=1, preFilterCap=63,
        uniquenessRatio=12, speckleWindowSize=200, speckleRange=2,
        mode=cv2.STEREO_SGBM_MODE_HH)

    fwd = jax.jit(lambda a, b: sgbm_pallas(a, b, params))
    Q = np.asarray(rig.Q)

    rows = []
    agg = {"n_px": 0, "abs_d": 0.0, "abs_z": 0.0,
           "gt_cv": 0.0, "gt_tpu": 0.0, "agree": 0.0, "n_union": 0}
    for i in range(N_FRAMES):
        scene = make_scene(rig, n_boxes=5, z_range_mm=(900.0, 4000.0),
                           background_z_mm=6000.0, seed=i)
        left, right, gt = render_stereo_pair(scene, seed=i)
        ref = matcher.compute(left, right).astype(np.float32) / 16.0
        ours = np.asarray(jax.block_until_ready(
            fwd(jnp.asarray(left, jnp.float32),
                jnp.asarray(right, jnp.float32))))

        cv_valid = ref > 0
        tpu_valid = ours >= 0
        both = cv_valid & tpu_valid
        both[:, :D] = False        # no-partner band differs by design
        union = (cv_valid | tpu_valid)
        union[:, :D] = False

        d_mae = float(np.abs(ref[both] - ours[both]).mean())
        z_cv = (Q[2, 3] / (Q[3, 2] * ref + Q[3, 3]))
        z_tpu = (Q[2, 3] / (Q[3, 2] * ours + Q[3, 3]))
        z_mae = float(np.abs(z_cv[both] - z_tpu[both]).mean())
        gt_cv = float(np.abs(ref[both] - gt[both]).mean())
        gt_tpu = float(np.abs(ours[both] - gt[both]).mean())
        agree = float(both.sum() / max(union.sum(), 1))
        rows.append({"frame": i, "disp_mae_px": round(d_mae, 4),
                     "z_mae_mm": round(z_mae, 3),
                     "cv_vs_gt_px": round(gt_cv, 4),
                     "tpu_vs_gt_px": round(gt_tpu, 4),
                     "valid_agreement": round(agree, 4),
                     "n_both": int(both.sum())})
        agg["n_px"] += int(both.sum())
        agg["abs_d"] += float(np.abs(ref[both] - ours[both]).sum())
        agg["abs_z"] += float(np.abs(z_cv[both] - z_tpu[both]).sum())
        agg["gt_cv"] += float(np.abs(ref[both] - gt[both]).sum())
        agg["gt_tpu"] += float(np.abs(ours[both] - gt[both]).sum())
        agg["agree"] += agree
        print(f"frame {i}: disp MAE {d_mae:.4f} px, Z MAE {z_mae:.2f} mm, "
              f"agree {agree:.4f}", file=sys.stderr)

    out = {
        "config": f"{W}x{H}x{D}, reference SGBM params, compiled TPU "
                  "sgbm_pallas vs cv2.StereoSGBM MODE_HH",
        "n_frames": N_FRAMES,
        "disp_mae_px": round(agg["abs_d"] / agg["n_px"], 4),
        "depth_mae_mm": round(agg["abs_z"] / agg["n_px"], 3),
        "cv_vs_gt_px": round(agg["gt_cv"] / agg["n_px"], 4),
        "tpu_vs_gt_px": round(agg["gt_tpu"] / agg["n_px"], 4),
        "valid_agreement": round(agg["agree"] / N_FRAMES, 4),
        "bound_met": "disp_mae_px < 0.5 (BASELINE.json config #2)",
        "frames": rows,
    }
    out["pass"] = out["disp_mae_px"] < 0.5
    path = Path(__file__).resolve().parent.parent / "MAE_r05.json"
    path.write_text(json.dumps(out, indent=2))
    print(json.dumps({k: out[k] for k in
                      ("disp_mae_px", "depth_mae_mm", "valid_agreement",
                       "pass")}))


if __name__ == "__main__":
    main()
