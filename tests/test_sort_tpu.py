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
