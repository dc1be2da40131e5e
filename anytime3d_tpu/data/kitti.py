"""KITTI per-object loader — reconstructed from call sites.

The reference imports ``src/dataset_loader/KITTI_dataset.py`` from 30+
scripts but the file is MISSING from the repo (SURVEY.md §2.4). Its interface
is reconstructed from ``train_kitti.py:52,94-100``:

  loader = dataLoaderSingleObject(trainOrVal='train')  # + .epoch/.dataStart/.dataLength
  inst_list, sin, cos, input_images, output_images = \
      loader.getNextBatch(batchSizeof3DShape=B, imageSize=(cols, rows))

Semantics implied by the consuming model (nolboSingleObject_instOnly,
nolbo.py:326-539): car detections cropped from KITTI frames, a 10-dim CAD
instance one-hot (the Pascal3D car CAD set), orientation sin/cos of
(azimuth, elevation, in-plane), and the instance's 64³ CAD voxel as target.

On-disk layout expected (standard KITTI object detection):
  <root>/training/image_2/<frame>.png
  <root>/training/label_2/<frame>.txt   # type trunc occl alpha x0 y0 x1 y1 h w l x y z ry
plus a CAD dir of 10 car voxel models (``cad_path``, .npy 64³) — Pascal3D's
CAD/car works directly. Instance assignment: nearest CAD by (h, w, l) aspect
(KITTI has no CAD annotation; documented heuristic).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional, Tuple

import numpy as np

from anytime3d_tpu.data.augment import image_random_augmentation

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


class KittiSingleObjectLoader:
    def __init__(
        self,
        kitti_path: str,
        cad_path: str,
        trainOrVal: str = "train",
        val_fraction: float = 0.1,
        min_height_px: float = 25.0,
        classes: Tuple[str, ...] = ("Car",),
        seed: int = 0,
        workers: int = 8,
    ):
        self.epoch = 0
        self.dataStart = 0
        self._root = kitti_path
        self._rng = np.random.default_rng(seed)
        self._split = trainOrVal
        self._classes = classes
        self._min_h = min_height_px

        # CAD set: 10 car models, each 64³ (Pascal3D CAD/car layout)
        files = sorted(f for f in os.listdir(cad_path) if f.endswith(".npy"))[:10]
        self.cad_shapes = np.stack(
            [
                (np.load(os.path.join(cad_path, f)).reshape(64, 64, 64, 1) > 0).astype(np.float32)
                for f in files
            ]
        )
        self._cad_aspects = self._compute_cad_aspects()

        self._records = self._build_records(val_fraction)
        self.dataLength = len(self._records)
        self._order = np.arange(self.dataLength)
        self._rng.shuffle(self._order)
        self._pool = ThreadPoolExecutor(max_workers=workers)

    def _compute_cad_aspects(self) -> np.ndarray:
        """(10, 2) per-CAD (w/l, h/l) voxel-extent aspect for instance matching."""
        aspects = []
        for vox in self.cad_shapes:
            occ = np.nonzero(vox[..., 0] > 0.5)
            ext = np.array([o.max() - o.min() + 1 for o in occ], np.float32)
            d, h, w = ext  # voxel grid axes
            aspects.append([w / max(d, 1.0), h / max(d, 1.0)])
        return np.array(aspects, np.float32)

    def _build_records(self, val_fraction: float) -> List[dict]:
        label_dir = os.path.join(self._root, "training", "label_2")
        image_dir = os.path.join(self._root, "training", "image_2")
        frames = sorted(f[:-4] for f in os.listdir(label_dir) if f.endswith(".txt"))
        n_val = max(1, int(len(frames) * val_fraction))
        frames = frames[:-n_val] if self._split == "train" else frames[-n_val:]
        records = []
        for frame in frames:
            with open(os.path.join(label_dir, frame + ".txt")) as fh:
                for line in fh:
                    p = line.strip().split(" ")
                    if p[0] not in self._classes:
                        continue
                    x0, y0, x1, y1 = map(float, p[4:8])
                    if y1 - y0 < self._min_h:
                        continue
                    h, w, l = map(float, p[8:11])
                    ry = float(p[14])
                    alpha = float(p[3])
                    records.append(
                        {
                            "image": os.path.join(image_dir, frame + ".png"),
                            "bbox": (x0, y0, x1, y1),
                            "hwl": (h, w, l),
                            # egocentric observation angle -> azimuth; KITTI
                            # has no elevation/in-plane labels (ground plane)
                            "euler": (alpha, 0.0, 0.0),
                            "inst": self._match_instance(h, w, l),
                        }
                    )
        return records

    def _match_instance(self, h: float, w: float, l: float) -> int:
        """Nearest CAD by box aspect (w/l, h/l) — the 10-way instance label."""
        q = np.array([w / max(l, 1e-3), h / max(l, 1e-3)], np.float32)
        return int(np.argmin(np.sum((self._cad_aspects - q) ** 2, axis=-1)))

    def _load_one(self, rec: dict, image_size, seed: int):
        rng = np.random.default_rng(seed)
        img = cv2.imread(rec["image"], cv2.IMREAD_COLOR)
        if img is None:
            return None
        rows, cols = img.shape[:2]
        x0, y0, x1, y1 = rec["bbox"]
        w, h = x1 - x0, y1 - y0
        border = rng.random() * 0.2 if self._split == "train" else 0.1
        x0, y0 = max(0, x0 - w * border), max(0, y0 - h * border)
        x1, y1 = min(cols, x1 + w * border), min(rows, y1 + h * border)
        crop = img[int(y0) : int(y1), int(x0) : int(x1)]
        if crop.size == 0:
            return None
        azimuth, elevation, inplane = rec["euler"]
        if self._split == "train" and rng.random() > 0.5:
            crop = crop[:, ::-1]
            azimuth = -azimuth
        out_c, out_r = image_size
        crop, _ = image_random_augmentation(
            rng, np.ascontiguousarray(crop), (out_c, out_r),
            augmentation=self._split == "train",
            add_noise=self._split == "train",
            pad_to_aspect=False,
        )
        inst_vec = np.zeros(10, np.float32)
        inst_vec[rec["inst"]] = 1.0
        euler = np.array([azimuth, elevation, inplane], np.float32)
        return crop / 255.0, self.cad_shapes[rec["inst"]], inst_vec, euler

    def getNextBatch(self, batchSizeof3DShape=32, imageSize=(64, 64)):
        picked = []
        while len(picked) < batchSizeof3DShape:
            if self.dataStart >= self.dataLength:
                self.epoch += 1
                self.dataStart = 0
                self._rng.shuffle(self._order)
            picked.append(self._records[self._order[self.dataStart]])
            self.dataStart += 1
        seeds = self._rng.integers(0, 2**31 - 1, len(picked))
        results = [
            r
            for r in self._pool.map(
                lambda ps: self._load_one(ps[0], imageSize, ps[1]), zip(picked, seeds)
            )
            if r is not None
        ]
        images = np.stack([r[0] for r in results]).astype(np.float32)
        voxels = np.stack([r[1] for r in results]).astype(np.float32)
        inst = np.stack([r[2] for r in results])
        euler = np.stack([r[3] for r in results])
        return inst, np.sin(euler), np.cos(euler), images, voxels
