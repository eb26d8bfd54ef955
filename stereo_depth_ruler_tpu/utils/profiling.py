"""Per-stage profiling + speed-of-light roofline report.

SURVEY.md §5: the reference has no tracing at all; the BASELINE.json north
star requires "benchmark disparity kernels at speed-of-light per chip".
This module times jitted stages honestly (loop-chained inside one XLA
program so async dispatch can't hide work) and reports each stage's
fraction of its bandwidth/compute bound.

TPU v5e (1 chip) reference numbers used for the bounds:
  HBM BW ~819 GB/s, VPU ~ (8x128 lanes) * 940 MHz * 4 ops ≈ 3.9 Tops f32.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

__all__ = ["StageSpec", "roofline_report", "chain_time"]

HBM_GBPS = 819.0
VPU_TOPS = 3.9


def chain_time(fn: Callable, x0, reps: int = 5) -> float:
    """Wall-time one stage, loop-chained inside a single jit so every
    iteration's work really executes (async dispatch + remote tunnels make
    naive block_until_ready timings lie). Returns ms per iteration."""

    @jax.jit
    def g(x):
        def body(i, acc):
            out = fn(x + (acc * 1e-20).astype(x.dtype))
            # consume a tiny slice of every output leaf: enough of a
            # data dependency to force execution, without the full-
            # volume f32 convert+reduce that inflated every stage by
            # ~3.5 ms in the first r4 roofline run
            leaves = jax.tree.leaves(out)
            probe = sum(jnp.sum(jnp.reshape(l, (-1,))[:8].astype(
                jnp.float32)) for l in leaves)
            return probe * 1e-30 + acc
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    float(g(x0))  # compile
    t0 = time.perf_counter()
    float(g(x0))
    return (time.perf_counter() - t0) / reps * 1000.0


@dataclasses.dataclass
class StageSpec:
    name: str
    fn: Callable             # stage: array -> array
    example_input: object
    bytes_accessed: float    # HBM bytes read+written per invocation
    flops: float = 0.0       # VPU elementwise ops per invocation


def roofline_report(stages: List[StageSpec], reps: int = 5,
                    out_path: Optional[str] = None) -> Dict:
    """Time each stage and compare to its speed-of-light bound.

    The chained harness must copy each stage's (often 236 MB) input per
    iteration to carry the loop dependency — a measurable tax. For each
    distinct input we also time an IDENTITY stage and report
    ``ms`` = raw − identity (the kernel's own time), with ``ms_raw``
    kept for audit."""
    rows = []
    id_cache = {}
    for s in stages:
        key = id(s.example_input)
        if key not in id_cache:
            id_cache[key] = chain_time(lambda x: x, s.example_input,
                                       reps=reps)
        overhead = id_cache[key]
        ms_raw = chain_time(s.fn, s.example_input, reps=reps)
        ms = max(ms_raw - overhead, 1e-3)
        bw_bound_ms = s.bytes_accessed / (HBM_GBPS * 1e9) * 1000.0
        cp_bound_ms = s.flops / (VPU_TOPS * 1e12) * 1000.0
        bound_ms = max(bw_bound_ms, cp_bound_ms)
        rows.append({
            "stage": s.name,
            "ms": round(ms, 3),
            "ms_raw": round(ms_raw, 3),
            "harness_ms": round(overhead, 3),
            "bound_ms": round(bound_ms, 3),
            "bound": "bandwidth" if bw_bound_ms >= cp_bound_ms else "compute",
            "sol_frac": round(bound_ms / ms, 3) if ms > 0 else None,
            "gbps_achieved": round(s.bytes_accessed / (ms / 1000.0) / 1e9, 1)
            if ms > 0 else None,
        })
    report = {"hbm_gbps": HBM_GBPS, "vpu_tops": VPU_TOPS, "stages": rows,
              "total_ms": round(sum(r["ms"] for r in rows), 3)}
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=2)
    return report
