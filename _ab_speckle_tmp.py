import time, numpy as np, jax, jax.numpy as jnp
from stereo_depth_ruler_tpu.utils.cache import enable_compile_cache
enable_compile_cache()
from stereo_depth_ruler_tpu.ops import sgbm_pallas as sp
from stereo_depth_ruler_tpu.ops import sort_tpu as st
from stereo_depth_ruler_tpu.ops.sort_tpu import speckle_keep_pallas

H, W, B, ITERS = 720, 1280, 8, 10
rng = np.random.default_rng(0)
disp = rng.integers(0, 128, (B, H, W)).astype(np.float32)
from scipy.ndimage import uniform_filter
for b in range(B):
    disp[b] = uniform_filter(disp[b], 25)
disp = np.round(disp)
disp[rng.uniform(size=disp.shape) < 0.05] = -1.0
d = jnp.asarray(disp)

def labels_of(dd):
    return jax.vmap(lambda x: sp.speckle_labels_pallas(x, 2.0))(dd)

def chain(fn):
    @jax.jit
    def c(dd):
        def body(i, acc):
            out = fn(dd + acc * 1e-20)
            return acc + jnp.sum(out.astype(jnp.int32)) * 1e-30
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))
    return c

stages = {
  "labels": lambda dd: labels_of(dd),
  "labels+old_keep": lambda dd: jax.vmap(lambda l: speckle_keep_pallas(l, 200))(labels_of(dd)),
  "labels+sort_only": lambda dd: st.sorted_labels(labels_of(dd))[0],
  "labels+seeded_keep": lambda dd: jax.vmap(lambda l: sp.speckle_keep_seeded(l, 200))(labels_of(dd)),
}
base = None
for name, fn in stages.items():
    c = chain(fn)
    float(c(d))
    dts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(c(d)); dts.append(time.perf_counter()-t0)
    ms = sorted(dts)[1] / ITERS / B * 1e3
    print(f"{name}: {ms:.3f} ms/frame")
