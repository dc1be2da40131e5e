"""Native voxelizer tests: unit cube/sphere meshes vs analytic occupancy,
native vs NumPy-fallback agreement, OFF loading, native NMS parity."""

import os

import numpy as np
import pytest

from anytime3d_tpu.data.voxelize import (
    _voxelize_numpy,
    load_off,
    native_available,
    nms_native,
    normalize_mesh,
    voxelize,
)


def cube_mesh(lo=0.0, hi=1.0):
    v = np.array(
        [
            [lo, lo, lo], [hi, lo, lo], [hi, hi, lo], [lo, hi, lo],
            [lo, lo, hi], [hi, lo, hi], [hi, hi, hi], [lo, hi, hi],
        ],
        np.float32,
    )
    f = np.array(
        [
            [0, 2, 1], [0, 3, 2],  # bottom
            [4, 5, 6], [4, 6, 7],  # top
            [0, 1, 5], [0, 5, 4],
            [1, 2, 6], [1, 6, 5],
            [2, 3, 7], [2, 7, 6],
            [3, 0, 4], [3, 4, 7],
        ],
        np.int32,
    )
    return v, f


def icosphere(subdiv=2):
    t = (1.0 + np.sqrt(5.0)) / 2.0
    v = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float32,
    )
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int32,
    )
    for _ in range(subdiv):
        nv = list(v)
        nf = []
        cache = {}

        def mid(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = (v[a] + v[b]) / 2.0
                m /= np.linalg.norm(m)
                cache[key] = len(nv)
                nv.append(m)
            return cache[key]

        for a, b, c in f:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            nf += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        v = np.array(nv, np.float32)
        f = np.array(nf, np.int32)
    return v, f


class TestVoxelize:
    def test_native_lib_built(self):
        assert native_available(), "native/libvoxelizer.so missing — run make in native/"

    def test_solid_cube_fills_volume(self):
        v, f = cube_mesh()
        grid = voxelize(v, f, dim=32, solid=True)
        # cube normalized to 90% of the grid -> occupancy ~0.9³
        frac = grid.mean()
        assert 0.6 < frac < 0.85, frac

    def test_surface_cube_is_hollow(self):
        v, f = cube_mesh()
        solid = voxelize(v, f, dim=32, solid=True)
        surf = voxelize(v, f, dim=32, solid=False)
        assert surf.sum() < solid.sum()
        # interior voxel occupied only in solid mode
        assert solid[16, 16, 16] == 1.0 and surf[16, 16, 16] == 0.0

    def test_sphere_volume_matches_analytic(self):
        v, f = icosphere(2)
        dim = 48
        grid = voxelize(v, f, dim=dim, solid=True)
        radius = dim * 0.45  # normalize pad 0.05
        expected = 4.0 / 3.0 * np.pi * radius**3
        assert abs(grid.sum() - expected) / expected < 0.1

    def test_numpy_fallback_agrees_with_native(self):
        if not native_available():
            pytest.skip("no native lib")
        v, f = cube_mesh()
        vn = normalize_mesh(v, 16)
        native = voxelize(vn, f, dim=16, solid=True, normalize=False)
        numpy_ = _voxelize_numpy(vn, f, dim=16, solid=True)
        # interiors must agree; surfaces may differ by the conservative
        # rasterization (native marks every overlapped voxel)
        disagree = np.abs(native - numpy_).sum()
        assert disagree / native.sum() < 0.35
        assert numpy_[8, 8, 8] == 1.0

    def test_load_off(self, tmp_path):
        v, f = cube_mesh()
        path = tmp_path / "cube.off"
        lines = ["OFF", f"{len(v)} {len(f)} 0"]
        lines += [" ".join(map(str, p)) for p in v]
        lines += ["3 " + " ".join(map(str, t)) for t in f]
        path.write_text("\n".join(lines) + "\n")
        v2, f2 = load_off(str(path))
        assert v2.shape == v.shape and f2.shape == f.shape
        assert np.allclose(v2, v)


class TestNativeNMS:
    def test_agrees_with_ops_nms(self):
        rng = np.random.default_rng(0)
        boxes = []
        for _ in range(50):
            x0, y0 = rng.uniform(0, 0.7, 2)
            w, h = rng.uniform(0.05, 0.3, 2)
            boxes.append([x0, y0, x0 + w, y0 + h, rng.uniform()])
        boxes = np.array(boxes, np.float32)
        from anytime3d_tpu.ops.nms import nms_indices

        expected = set(nms_indices(boxes, 0.5))
        keep = nms_native(boxes, 0.5)
        assert set(np.nonzero(keep)[0]) == expected
