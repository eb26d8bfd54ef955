"""Device-trace profile of the batch-8 SGBM matcher AND the full
pipeline (PROFILE_r05).

Unlike the chained-iteration harness (tools/ab_r5.py), this uses
jax.profiler device traces, so each kernel's time is the REAL on-chip
duration inside the composed program — no harness input-copy tax, no
identity-subtraction noise (the r4 roofline's per-stage 'ms' column
swung +-1 ms between runs from exactly that).

Writes PROFILE_r05.log: per-kernel device ms (whole batch and per
frame), grouped by source line, for (a) the matcher-only headline path
and (b) the complete default pipeline (u8 rectify + SGBM x2 + WLS +
reproject) — the u8 remap rows close VERDICT r4 weak-2.

Run as the ONLY JAX process:  python tools/profile_trace_r5.py
"""
import collections
import glob
import gzip
import json
import sys
import tempfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

BATCH = 8


def trace_section(fwd, args, title):
    import jax
    jax.block_until_ready(fwd(*args))          # compile + warm
    tmp = tempfile.mkdtemp(prefix="sdr_trace_")
    with jax.profiler.trace(tmp):
        jax.block_until_ready(fwd(*args))
    files = glob.glob(f"{tmp}/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace written under {tmp}"
    d = json.load(gzip.open(files[0]))
    evs = d.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "") for e in evs
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg = collections.Counter()
    cnt = collections.Counter()
    jit_ms = 0.0
    for e in evs:
        if (e.get("ph") == "X" and "dur" in e
                and pids.get(e.get("pid"), "") == "/device:TPU:0"):
            if e["name"].startswith("jit_"):
                jit_ms = max(jit_ms, e["dur"] / 1000.0)
                continue
            a = e.get("args", {}) or {}
            src = str(a.get("source", e["name"])).replace(
                str(ROOT) + "/", "")
            agg[src] += e["dur"]
            cnt[src] += 1
    lines = [title,
             f"jit total: {jit_ms:.3f} ms/batch = "
             f"{jit_ms / BATCH:.3f} ms/frame "
             f"({1000.0 * BATCH / jit_ms:.2f} fps device-side)",
             "",
             f"{'ms/batch':>9} {'ms/frame':>9} {'calls':>6}  source"]
    for src, us in agg.most_common(30):
        lines.append(f"{us / 1000:9.3f} {us / (1000 * BATCH):9.3f} "
                     f"{cnt[src]:6d}  {src}")
    return lines, jit_ms


def main():
    import jax
    import jax.numpy as jnp

    from stereo_depth_ruler_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import bench

    from stereo_depth_ruler_tpu.ops.reproject import reproject_to_3d
    from stereo_depth_ruler_tpu.ops.sgbm import SGBMParams
    from stereo_depth_ruler_tpu.ops.sgbm_pallas import sgbm_pallas
    from stereo_depth_ruler_tpu.pipeline import (PipelineConfig,
                                                 StereoPipeline)

    rig, lefts, rights = bench.make_inputs(batch=BATCH)
    params = SGBMParams(num_disparities=bench.D, block_size=5,
                        speckle_window_size=200, speckle_range=2)
    Q = rig.Q
    lb = jnp.asarray(lefts, jnp.float32)
    rb = jnp.asarray(rights, jnp.float32)

    def one(l, r):
        disp = sgbm_pallas(l, r, params, apply_lr=True, apply_speckle=True)
        return disp, reproject_to_3d(disp, Q)[..., 2]

    sec1, m_ms = trace_section(
        jax.jit(jax.vmap(one)), (lb, rb),
        f"PROFILE_r05 (a): batch-{BATCH} matcher device trace "
        f"(1280x720x128, sgbm_pallas + reproject)")

    cfg = PipelineConfig(sgbm=params, downscale=1, use_wls=True,
                         lr_mode="right_matcher")   # default u8 rectify
    pipe = StereoPipeline(rig, cfg, rectify=True)
    sec2, p_ms = trace_section(
        pipe._forward_batch, (lb, rb),
        f"PROFILE_r05 (b): batch-{BATCH} FULL default pipeline "
        f"(u8 rectify + SGBM x2 + WLS + reproject)")

    out = ROOT / "PROFILE_r05.log"
    out.write_text("\n".join(sec1) + "\n\n" + "\n".join(sec2) + "\n")
    print("\n".join(sec1[:4]), file=sys.stderr)
    print("\n".join(sec2[:4]), file=sys.stderr)
    print(json.dumps({
        "matcher_ms_per_frame": round(m_ms / BATCH, 3),
        "matcher_device_fps": round(1000.0 * BATCH / m_ms, 2),
        "pipeline_ms_per_frame": round(p_ms / BATCH, 3),
        "pipeline_device_fps": round(1000.0 * BATCH / p_ms, 2)}))


if __name__ == "__main__":
    main()
