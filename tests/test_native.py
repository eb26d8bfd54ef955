"""Native host runtime (C++ hostio) vs Python fallbacks."""

import numpy as np
import pytest

from stereo_depth_ruler_tpu.io.pcd import read_pcd, write_pcd
from stereo_depth_ruler_tpu.io.video import write_sbsv
from stereo_depth_ruler_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def test_native_pcd_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.uniform(-10, 10, (256, 3)).astype(np.float32)
    rgb = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    p_native = tmp_path / "n.pcd"
    assert native.write_pcd_native(p_native, xyz, rgb)
    x2, c2, _ = read_pcd(p_native)
    np.testing.assert_allclose(x2, xyz, atol=1e-5)
    np.testing.assert_array_equal(c2, rgb)


def test_native_voxel_matches_python(tmp_path):
    from stereo_depth_ruler_tpu.ops.voxel import voxel_downsample
    rng = np.random.default_rng(1)
    xyz = rng.uniform(-100, 100, (400, 3)).astype(np.float32)
    rgb = rng.integers(0, 256, (400, 3)).astype(np.uint8)
    res = native.voxel_downsample_native(xyz, rgb, 25.0)
    assert res is not None
    nx, nc = res
    px, pc, cnt = voxel_downsample(xyz, rgb.astype(np.float32), 25.0)
    cnt = int(cnt)
    assert len(nx) == cnt
    oi = np.lexsort(nx.T)
    pi = np.lexsort(np.asarray(px)[:cnt].T)
    np.testing.assert_allclose(nx[oi], np.asarray(px)[:cnt][pi], atol=1e-3)


def test_native_sbsv_reader(tmp_path):
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, (10, 16, 32), dtype=np.uint8)
    p = tmp_path / "v.sbsv"
    write_sbsv(p, frames)
    r = native.NativeSbsvReader(p)
    assert (r.n, r.height, r.width, r.channels) == (10, 16, 32, 1)
    got = r.read(2, 3)
    np.testing.assert_array_equal(got, frames[2:5])
    # prefetch path
    r.prefetch(5, 4)
    got2 = r.read(5, 4)
    np.testing.assert_array_equal(got2, frames[5:9])
    r.close()


def test_native_csv_append(tmp_path):
    p = tmp_path / "m.csv"
    assert native.csv_append_native(p, "Image, First_point,   Second_point, Distance",
                                    "3, [434, 117],    [440, 189], 240.02902 cm   \n")
    text = p.read_text()
    assert text.startswith("Image,")
    assert "240.02902 cm" in text
    # second append: no duplicate header
    native.csv_append_native(p, "Image, ...", "4, [1, 2],    [3, 4], 10.00000 cm   \n")
    assert p.read_text().count("Image,") == 1
