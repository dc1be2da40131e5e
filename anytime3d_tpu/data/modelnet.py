"""ModelNet40 pre-voxelized loader + synthetic fallback.

Reference semantics: dataLoader at src/dataset_loader/modelnet_dataset.py:5-91
— sharded .npy triples ({i}Full/Class/Inst.npy) under
``32to64_4rot_64sqr/{train,test}`` (30 train shards, 5 test shards), all in
RAM, index-shuffled epochs. TPU-first additions: optional process sharding
(each host loads every Nth shard — the multi-host input pipeline), memory-
mapped loads, and a seeded RNG instead of global np.random.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


class ModelNetLoader:
    """Host-side loader for pre-voxelized ModelNet shards.

    ``getNextBatch(batchSize)`` -> dict with ``input_images`` (B, 64, 64, 64[,1]),
    ``class_list`` (B, 40), ``inst_list`` — matching the reference batch dict
    (modelnet_dataset.py:86-91). Exposes ``epoch`` / ``batchStart`` /
    ``dataLength`` for the trainer's progress display.
    """

    def __init__(
        self,
        data_path: str,
        train_or_test: str = "train",
        partial_num: int = 30,
        process_index: int = 0,
        process_count: int = 1,
        seed: int = 0,
        mmap: bool = True,
    ):
        self.epoch = 0
        self.batchStart = 0
        self._rng = np.random.default_rng(seed + process_index)
        split = "train" if train_or_test == "train" else "test"
        n_shards = partial_num if split == "train" else 5
        base = os.path.join(data_path, "32to64_4rot_64sqr", split)
        mmap_mode = "r" if mmap else None

        vox, cls, inst = [], [], []
        for i in range(process_index, n_shards, process_count):
            vox.append(np.load(os.path.join(base, f"{i}Full.npy"), mmap_mode=mmap_mode))
            cls.append(np.load(os.path.join(base, f"{i}Class.npy"), mmap_mode=mmap_mode))
            inst.append(np.load(os.path.join(base, f"{i}Inst.npy"), mmap_mode=mmap_mode))
        self._vox = np.concatenate(vox, axis=0)
        self._cls = np.concatenate(cls, axis=0)
        self._inst = np.concatenate(inst, axis=0)
        self.dataLength = len(self._vox)
        self._idx = np.arange(self.dataLength)
        self._shuffle()

    def _shuffle(self):
        self._rng.shuffle(self._idx)
        self.batchStart = 0

    def getNextBatch(self, batchSize: int = 32) -> Dict[str, np.ndarray]:
        if self.batchStart + batchSize > self.dataLength:
            self.epoch += 1
            self._shuffle()
        sel = self._idx[self.batchStart : self.batchStart + batchSize]
        self.batchStart += batchSize
        vox = np.ascontiguousarray(self._vox[sel]).astype(np.float32)
        if vox.ndim == 4:
            vox = vox[..., None]
        return {
            "input_images": vox,
            "class_list": np.ascontiguousarray(self._cls[sel]).astype(np.float32),
            "inst_list": np.ascontiguousarray(self._inst[sel]).astype(np.float32),
        }


class SyntheticVoxelLoader:
    """Drop-in ModelNetLoader replacement producing procedural shapes
    (axis-aligned boxes/ellipsoids per class) for tests and benches when the
    dataset is absent. Deterministic under seed."""

    def __init__(
        self,
        num_samples: int = 512,
        dim: int = 64,
        num_classes: int = 40,
        num_inst: int = 10,
        seed: int = 0,
    ):
        self.epoch = 0
        self.batchStart = 0
        self.dataLength = num_samples
        self._dim = dim
        self._num_classes = num_classes
        self._num_inst = num_inst
        rng = np.random.default_rng(seed)
        self._labels = rng.integers(0, num_classes, num_samples)
        self._insts = rng.integers(0, num_inst, num_samples)
        self._params = rng.uniform(0.2, 0.45, size=(num_samples, 3))
        self._idx = np.arange(num_samples)
        self._rng = rng
        coords = (np.arange(dim) + 0.5) / dim - 0.5
        self._grid = np.stack(np.meshgrid(coords, coords, coords, indexing="ij"), -1)

    def _make(self, i: int) -> np.ndarray:
        label = self._labels[i]
        a, b, c = self._params[i]
        g = self._grid
        if label % 2 == 0:  # ellipsoid
            occ = (g[..., 0] / a) ** 2 + (g[..., 1] / b) ** 2 + (g[..., 2] / c) ** 2 <= 1.0
        else:  # box
            occ = (np.abs(g[..., 0]) <= a) & (np.abs(g[..., 1]) <= b) & (np.abs(g[..., 2]) <= c)
        return occ.astype(np.float32)

    def getNextBatch(self, batchSize: int = 32) -> Dict[str, np.ndarray]:
        if self.batchStart + batchSize > self.dataLength:
            self.epoch += 1
            self._rng.shuffle(self._idx)
            self.batchStart = 0
        sel = self._idx[self.batchStart : self.batchStart + batchSize]
        self.batchStart += batchSize
        vox = np.stack([self._make(i) for i in sel])[..., None]
        cls = np.eye(self._num_classes, dtype=np.float32)[self._labels[sel]]
        inst = np.eye(self._num_inst, dtype=np.float32)[self._insts[sel]]
        return {"input_images": vox, "class_list": cls, "inst_list": inst}
