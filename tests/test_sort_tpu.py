"""VMEM bitonic sort / equal-value-counts kernel vs numpy (interpret
mode; exactness is required because the speckle filter's component-size
threshold is pinned to cv::filterSpeckles semantics)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from stereo_depth_ruler_tpu.ops.sort_tpu import (  # noqa: E402
    equal_value_counts_pallas)


@pytest.mark.parametrize("shape,hi", [((8, 128), 37), ((23, 41), 5),
                                      ((60, 100), 1000), ((32, 129), 2)])
def test_equal_value_counts(shape, hi):
    rng = np.random.default_rng(hash(shape) % 2 ** 31)
    lab = rng.integers(0, hi, shape).astype(np.int32)
    ref = np.bincount(lab.reshape(-1), minlength=lab.max() + 1)[lab]
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(equal_value_counts_pallas(jnp.asarray(lab)))
    np.testing.assert_array_equal(got, ref)


def test_counts_match_component_sizes_sorted():
    """Drop-in parity with the XLA-sort path it replaces in
    speckle_filter_pallas."""
    from stereo_depth_ruler_tpu.ops.sgbm_pallas import component_sizes_sorted
    rng = np.random.default_rng(3)
    lab = rng.integers(0, 17, (23, 41)).astype(np.int32)
    ref = np.asarray(component_sizes_sorted(jnp.asarray(lab)))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(equal_value_counts_pallas(jnp.asarray(lab)))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("max_size", [1, 4, 50])
def test_speckle_keep_pallas(max_size):
    from stereo_depth_ruler_tpu.ops.sort_tpu import speckle_keep_pallas
    rng = np.random.default_rng(max_size)
    lab = rng.integers(0, 23, (40, 70)).astype(np.int32)
    counts = np.bincount(lab.reshape(-1), minlength=lab.max() + 1)[lab]
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(speckle_keep_pallas(jnp.asarray(lab), max_size))
    np.testing.assert_array_equal(got, counts > max_size)


def test_speckle_keep_vmap():
    from stereo_depth_ruler_tpu.ops.sort_tpu import speckle_keep_pallas
    rng = np.random.default_rng(9)
    lab = rng.integers(0, 11, (3, 24, 40)).astype(np.int32)
    ref = np.stack([np.bincount(l.reshape(-1), minlength=l.max() + 1)[l] > 5
                    for l in lab])
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(jax.vmap(
            lambda l: speckle_keep_pallas(l, 5))(jnp.asarray(lab)))
    np.testing.assert_array_equal(got, ref)


def _keep_ref(disp, max_size, max_diff):
    """Flood-fill reference keep mask over real CCL components."""
    from stereo_depth_ruler_tpu.ops import sgbm as js
    return np.asarray(js.speckle_filter(jnp.asarray(disp),
                                        jnp.asarray(disp) >= 0,
                                        max_size, max_diff))


@pytest.mark.parametrize("max_size", [3, 8, 50])
def test_speckle_keep_seeded(max_size):
    """Seeded keep path (key-only sort + root seeds + OR-propagation)
    == the jnp CCL speckle filter, on noisy disparity maps."""
    from stereo_depth_ruler_tpu.ops import sgbm_pallas as sp
    rng = np.random.default_rng(max_size)
    disp = rng.integers(0, 5, (40, 70)).astype(np.float32)
    disp[rng.uniform(size=disp.shape) < 0.25] = -1.0
    ref = _keep_ref(disp, max_size, 1.0)
    with pltpu.force_tpu_interpret_mode():
        labels = sp.speckle_labels_pallas(jnp.asarray(disp), 1.0)
        keep = np.asarray(sp.speckle_keep_seeded(labels, max_size))
    np.testing.assert_array_equal((disp >= 0) & keep, ref)


def test_speckle_keep_seeded_threshold_boundary():
    """Components of exactly max_size are removed; max_size+1 kept
    (cv::filterSpeckles: strictly-greater survives)."""
    from stereo_depth_ruler_tpu.ops import sgbm_pallas as sp
    disp = np.full((16, 130), -1.0, np.float32)
    disp[2, 10:15] = 3.0          # size 5 == max_size -> removed
    disp[5, 20:26] = 3.0          # size 6 -> kept
    # snaky component, size 5+4+5 = 14 -> kept
    disp[8, 40:45] = 2.0
    disp[9:13, 44] = 2.0
    disp[12, 40:44] = 2.0
    ref = _keep_ref(disp, 5, 1.0)
    with pltpu.force_tpu_interpret_mode():
        labels = sp.speckle_labels_pallas(jnp.asarray(disp), 1.0)
        keep = np.asarray(sp.speckle_keep_seeded(labels, 5))
    np.testing.assert_array_equal((disp >= 0) & keep, ref)
    assert not keep[2, 12] and keep[5, 22] and keep[12, 41]


def test_speckle_keep_seeded_vmap_matches_sorted():
    """Batched seeded path == the pair-sort keep path on valid pixels."""
    from stereo_depth_ruler_tpu.ops import sgbm_pallas as sp
    from stereo_depth_ruler_tpu.ops.sort_tpu import speckle_keep_pallas
    rng = np.random.default_rng(4)
    disp = rng.integers(0, 4, (3, 24, 40)).astype(np.float32)
    disp[rng.uniform(size=disp.shape) < 0.3] = -1.0
    with pltpu.force_tpu_interpret_mode():
        labels = jax.vmap(
            lambda d: sp.speckle_labels_pallas(d, 1.0))(jnp.asarray(disp))
        a = np.asarray(jax.vmap(
            lambda l: sp.speckle_keep_seeded(l, 6))(labels))
        b = np.asarray(jax.vmap(
            lambda l: speckle_keep_pallas(l, 6))(labels))
    valid = disp >= 0
    np.testing.assert_array_equal(a & valid, b & valid)
