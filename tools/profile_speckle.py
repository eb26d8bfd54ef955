"""Microbench: speckle stage pieces + alternatives (dev tool)."""
import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from stereo_depth_ruler_tpu.ops import sgbm_pallas as sp

H, W = 720, 1280
n = H * W


def timeit(name, fn, *args, iters=20):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))

    @jax.jit
    def chained(*a):
        def body(i, acc):
            def pert(x):
                if jnp.issubdtype(x.dtype, jnp.floating):
                    return x + acc.astype(x.dtype) * 1e-20
                if jnp.issubdtype(x.dtype, jnp.integer):
                    # runtime-zero XLA cannot fold away
                    return x + (acc * 1e-30).astype(x.dtype)
                return x
            perturbed = jax.tree.map(pert, a)
            o = fn(*perturbed)
            leaf = jax.tree.leaves(o)[0]
            return acc + leaf.reshape(-1)[0].astype(jnp.float32) * 1e-30
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(chained(*args))
    t0 = time.perf_counter()
    float(chained(*args))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:40s} {dt:8.3f} ms", file=sys.stderr, flush=True)
    return out


rng = np.random.default_rng(0)
disp = rng.uniform(0, 128, (H, W)).astype(np.float32)
disp[rng.uniform(size=(H, W)) < 0.1] = -1.0
disp = jnp.asarray(disp)

labels = timeit("labels kernel (pallas CCL)",
                lambda d: sp.speckle_labels_pallas(d, 2.0), disp)
labels_i = labels.astype(jnp.int32)
valid = disp >= 0


def hist_scatter(lab, v):
    sizes = jnp.zeros(n + 1, jnp.int32).at[lab.reshape(-1)].add(
        v.reshape(-1).astype(jnp.int32))
    return jnp.take(sizes, lab)


timeit("scatter-add hist + gather", hist_scatter, labels_i, valid)

timeit("scatter-add only",
       lambda lab, v: jnp.zeros(n + 1, jnp.int32).at[lab.reshape(-1)].add(
           v.reshape(-1).astype(jnp.int32)), labels_i, valid)

timeit("gather only",
       lambda lab: jnp.take(jnp.zeros(n + 1, jnp.int32), lab), labels_i)


def sort_sizes(lab):
    flat = lab.reshape(-1)
    skey, sidx = jax.lax.sort_key_val(flat, jnp.arange(n, dtype=jnp.int32))
    # run boundaries in sorted order
    start = jnp.concatenate([jnp.array([True]), skey[1:] != skey[:-1]])
    pos = jnp.arange(n, dtype=jnp.int32)
    run_start = jax.lax.associative_scan(jnp.maximum,
                                         jnp.where(start, pos, 0))
    endb = jnp.concatenate([skey[1:] != skey[:-1], jnp.array([True])])
    run_end = jax.lax.associative_scan(
        jnp.minimum, jnp.where(endb, pos, n - 1), reverse=True)
    size_sorted = run_end - run_start + 1
    # unpermute: second sort by original index
    _, out = jax.lax.sort_key_val(sidx, size_sorted)
    return out.reshape(lab.shape)


ss = timeit("sort-based sizes (2 sorts + scans)", sort_sizes, labels_i)
ref = hist_scatter(labels_i, valid)
sv = jnp.where(valid, ref, -1)
sv2 = jnp.where(valid, ss, -1)
print("sort sizes match scatter (valid px):",
      bool(jnp.all(sv == sv2)), file=sys.stderr)

timeit("single pair sort only",
       lambda lab: jax.lax.sort_key_val(lab.reshape(-1),
                                        jnp.arange(n, dtype=jnp.int32))[0],
       labels_i)

timeit("full speckle_filter_pallas", lambda d: sp.speckle_filter_pallas(d, 200, 2.0), disp)
from stereo_depth_ruler_tpu.ops.sgbm import speckle_filter
timeit("jnp speckle_filter", lambda d: speckle_filter(jnp.where(d >= 0, d, -1.0), d >= 0, 200, 2.0), disp)
