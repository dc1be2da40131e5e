"""Structural instance curriculum (data/instances.py) and the shaded
orientation-identifiable render (data/modelnet.py, r4).

The reference's instance priors separate CAD models that differ in
STRUCTURE (nolbo.py:166-181); these tests pin the properties the stand-in
curriculum needs for that capability to be learnable: per-(class, inst)
determinism, structural distinctness between instances, and azimuth
identifiability of the rendered images (a bare silhouette of a
mirror-symmetric shape fixes azimuth only mod pi)."""

import numpy as np

from anytime3d_tpu.data.instances import instance_grid, instance_parts, parts_to_grid
from anytime3d_tpu.data.modelnet import (
    SyntheticImageObjectLoader,
    SyntheticVoxelLoader,
)

DIM = 32


def _iou(a, b):
    a, b = a > 0.5, b > 0.5
    return (a & b).sum() / max((a | b).sum(), 1)


class TestInstanceGrids:
    def test_deterministic(self):
        g1 = parts_to_grid(instance_parts(3, 2), DIM)
        g2 = parts_to_grid(instance_parts(3, 2), DIM)
        np.testing.assert_array_equal(g1, g2)

    def test_instances_structurally_distinct(self):
        """Across every family, same-class instances must differ well beyond
        voxelization noise (IoU bounded away from 1) while staying non-empty."""
        for cls in range(8):
            grids = [instance_grid(cls, i, DIM) for i in range(4)]
            for g in grids:
                assert 0.005 < g.mean() < 0.5, (cls, g.mean())
            ious = [
                _iou(grids[i], grids[j])
                for i in range(4)
                for j in range(i + 1, 4)
            ]
            assert max(ious) < 0.9, (cls, ious)

    def test_classes_distinct(self):
        """Different classes (same inst index) differ structurally too."""
        grids = [instance_grid(c, 0, DIM) for c in range(8)]
        ious = [
            _iou(grids[i], grids[j]) for i in range(8) for j in range(i + 1, 8)
        ]
        assert np.mean(ious) < 0.6, ious


class TestStructuralLoader:
    def test_loader_uses_structural_shapes(self):
        ld = SyntheticVoxelLoader(
            num_samples=24, dim=DIM, num_classes=4, num_inst=3,
            seed=0, structural_inst=True,
        )
        b = ld.getNextBatch(8)
        assert b["input_images"].shape == (8, DIM, DIM, DIM, 1)
        occ = b["input_images"].mean(axis=(1, 2, 3, 4))
        assert (occ > 0.003).all()
        # same (class, inst) across two loaders -> same base structure
        ld2 = SyntheticVoxelLoader(
            num_samples=24, dim=DIM, num_classes=4, num_inst=3,
            seed=0, structural_inst=True,
        )
        np.testing.assert_array_equal(
            ld._cache.astype(np.float32), ld2._cache.astype(np.float32)
        )

    def test_instance_identity_is_shape_not_scale(self):
        """Two instances of one class keep distinct structure after the
        loader's jitter: cross-instance IoU < within-instance IoU."""
        ld = SyntheticVoxelLoader(
            num_samples=64, dim=DIM, num_classes=2, num_inst=2,
            seed=1, structural_inst=True,
        )
        vox = ld._cache.astype(np.float32)
        within, across = [], []
        for c in range(2):
            sel = [i for i in range(64) if ld._labels[i] == c]
            for i in sel[:12]:
                for j in sel[:12]:
                    if i >= j or ld._rots[i] != ld._rots[j]:
                        continue
                    pair = within if ld._insts[i] == ld._insts[j] else across
                    pair.append(_iou(vox[i], vox[j]))
        assert within and across
        assert np.mean(within) > np.mean(across) + 0.05, (
            np.mean(within), np.mean(across),
        )


class TestShadedRender:
    def test_azimuth_identifiable(self):
        """The shaded render must distinguish az from az+pi (silhouettes
        cannot); unshaded renders of symmetric shapes are ~identical there."""
        ld = SyntheticImageObjectLoader(
            num_samples=8, dim=DIM, num_classes=4, num_inst=2, seed=0,
        )
        vox = ld._make(0)
        for az in (0.3, 1.1, -2.0):
            a = ld._render(vox, az, (48, 48))
            b = ld._render(vox, az + np.pi, (48, 48))
            diff = np.abs(a - b).mean()
            assert diff > 0.01, (az, diff)

    def test_unshaded_flag_restores_silhouette(self):
        ld = SyntheticImageObjectLoader(
            num_samples=8, dim=DIM, num_classes=4, num_inst=2, seed=0,
        )
        ld.render_shaded = False
        vox = (ld._make(0) > 0.5).astype(np.float32)
        img = ld._render(vox, 0.7, (48, 48))
        # binary silhouette: only {0, 1}
        assert set(np.unique(img)).issubset({0.0, 1.0})
