"""Native IO library tests: build + parity with the python parsers."""

import numpy as np
import pytest

from gaustudio_tpu.datasets import utils as dsu
from gaustudio_tpu.utils import native


def _fixture(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(50, 3))
    rgb = rng.integers(0, 255, (50, 3))
    dsu.write_points3D_binary(xyz, rgb, tmp_path / "points3D.bin")
    ims = {}
    for i in range(4):
        q = rng.normal(size=4); q /= np.linalg.norm(q)
        ims[i + 1] = dsu.ColmapImage(
            i + 1, q, rng.normal(size=3), 1, f"img_{i:03d}.png",
            rng.normal(size=(i + 1, 2)), rng.integers(-1, 100, i + 1).astype(np.int64),
        )
    dsu.write_extrinsics_binary(ims, tmp_path / "images.bin")
    return xyz, rgb, ims


def test_native_builds():
    assert native.available(), "native library failed to build"


def test_native_points3d_parity(tmp_path):
    xyz, rgb, _ = _fixture(tmp_path)
    out = native.read_points3d_binary(str(tmp_path / "points3D.bin"))
    assert out is not None
    nxyz, nrgb, nerr = out
    np.testing.assert_allclose(nxyz, xyz, atol=1e-12)
    np.testing.assert_array_equal(nrgb, rgb)


def test_native_images_parity(tmp_path):
    _, _, ims = _fixture(tmp_path)
    out = native.read_images_binary(str(tmp_path / "images.bin"))
    assert out is not None
    assert set(out.keys()) == set(ims.keys())
    for k, (q, t, cid, name, xys, pids) in out.items():
        np.testing.assert_allclose(q, ims[k].qvec, atol=1e-12)
        np.testing.assert_allclose(t, ims[k].tvec, atol=1e-12)
        assert name == ims[k].name
        np.testing.assert_allclose(xys, ims[k].xys, atol=1e-12)
        np.testing.assert_array_equal(pids, ims[k].point3D_ids)


def test_wired_into_dataset_utils(tmp_path):
    xyz, rgb, ims = _fixture(tmp_path)
    # the public readers (which now prefer the native path) stay correct
    rxyz, rrgb, _ = dsu.read_points3D_binary(tmp_path / "points3D.bin")
    np.testing.assert_allclose(rxyz, xyz, atol=1e-12)
    rims = dsu.read_extrinsics_binary(tmp_path / "images.bin")
    assert rims[2].name == ims[2].name
    np.testing.assert_allclose(rims[3].qvec, ims[3].qvec, atol=1e-12)
