"""Generate the committed real-format dataset fixtures.

Each fixture reproduces the GENUINE on-disk byte layout the reference
pipeline consumes, at miniature scale, so the loaders prove they parse real
files rather than their own synthetic stand-ins:

- ModelNet shard triples ``{i}Full/Class/Inst.npy`` under
  ``32to64_4rot_64sqr/{train,test}`` (reference
  src/dataset_loader/modelnet_dataset.py:33-52: 30 train / 5 test shards;
  here 2 train shards + the fixed 5 test shards, 64^3 bool voxels);
- the Pascal3D+ tree: ``Image_sets/<dataset>/<class>_<split>.txt`` lists
  (pascal dataset rows carry a trailing 1/-1 keep flag),
  ``training_data/{pascal,imagenet}/<datapoint>/<obj>/objInfo.txt`` single
  lines "class imgPath cadPath colMin rowMin colMax rowMax azimuth
  elevation inPlaneRot" (pascal3D.py:196-215), real PNG images, and
  ``CAD/<class>/<k>.npy`` 64^3 voxel models;
- KITTI object detection: ``training/{image_2,label_2}`` with standard
  15-field label lines "type trunc occl alpha x0 y0 x1 y1 h w l x y z ry"
  plus a 10-model car CAD dir (data/kitti.py reconstruction).

Deterministic (seeded); rerunning reproduces the committed bytes.
Run from the repo root:  python tests/fixtures/make_fixtures.py
"""

from __future__ import annotations

import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def _ellipsoid(a: float, b: float, c: float, dim: int = 64) -> np.ndarray:
    g = (np.arange(dim) + 0.5) / dim - 0.5
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    return (x / a) ** 2 + (y / b) ** 2 + (z / c) ** 2 <= 1.0


def _box(a: float, b: float, c: float, dim: int = 64) -> np.ndarray:
    g = (np.arange(dim) + 0.5) / dim - 0.5
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    return (np.abs(x) <= a) & (np.abs(y) <= b) & (np.abs(z) <= c)


def _png(path: str, rows: int, cols: int, seed: int):
    import cv2

    rng = np.random.default_rng(seed)
    img = (rng.uniform(0, 255, size=(rows, cols, 3))).astype(np.uint8)
    # a bright block so crops are visibly non-constant
    img[rows // 4 : rows // 2, cols // 4 : cols // 2] = (255, 128, 0)
    cv2.imwrite(path, img)


def make_modelnet(root: str):
    base = os.path.join(root, "modelnet", "32to64_4rot_64sqr")
    # label -> deterministic shape: solid box with class-keyed half-extent
    def sample(label: int) -> np.ndarray:
        return _box(0.1 + 0.03 * label, 0.2, 0.3)

    specs = {"train": [[0, 1, 2], [3, 4]], "test": [[5], [6], [7], [8], [9]]}
    for split, shards in specs.items():
        d = os.path.join(base, split)
        os.makedirs(d, exist_ok=True)
        for i, labels in enumerate(shards):
            vox = np.stack([sample(l) for l in labels])  # (N, 64, 64, 64) bool
            cls = np.eye(40, dtype=np.float32)[labels]
            inst = np.eye(10, dtype=np.float32)[[l % 10 for l in labels]]
            np.save(os.path.join(d, f"{i}Full.npy"), vox)
            np.save(os.path.join(d, f"{i}Class.npy"), cls)
            np.save(os.path.join(d, f"{i}Inst.npy"), inst)


def make_pascal3d(root: str):
    base = os.path.join(root, "pascal3d")
    # CAD models: 2 car + 1 chair, distinct occupancy counts
    cads = {
        "car": [_ellipsoid(0.30, 0.18, 0.40), _ellipsoid(0.25, 0.22, 0.35)],
        "chair": [_box(0.15, 0.35, 0.15)],
    }
    for cls, models in cads.items():
        d = os.path.join(base, "CAD", cls)
        os.makedirs(d, exist_ok=True)
        for k, m in enumerate(models, start=1):
            np.save(os.path.join(d, f"{k}.npy"), m)

    # Image_sets: pascal rows carry the keep flag; imagenet rows are bare
    sets = {
        ("pascal", "car_train.txt"): "dp_a 1\ndp_b -1\n",
        ("pascal", "car_val.txt"): "dp_d 1\n",
        ("imagenet", "chair_train.txt"): "dp_c\n",
    }
    for (dataset, txt), content in sets.items():
        d = os.path.join(base, "Image_sets", dataset)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, txt), "w") as fh:
            fh.write(content)

    os.makedirs(os.path.join(base, "Images"), exist_ok=True)
    _png(os.path.join(base, "Images", "car_a.png"), 60, 80, seed=1)
    _png(os.path.join(base, "Images", "chair_c.png"), 48, 64, seed=2)
    _png(os.path.join(base, "Images", "car_d.png"), 60, 80, seed=3)

    # objInfo.txt lines: angles in DEGREES (loaders convert to radians)
    objs = {
        ("pascal", "dp_a", "0"): "car Images/car_a.png CAD/car/1 10 8 42 40 30 10 5",
        ("pascal", "dp_a", "1"): "car Images/car_a.png CAD/car/2 45 20 75 55 -60 0 0",
        ("pascal", "dp_b", "0"): "car Images/car_a.png CAD/car/1 10 8 42 40 30 10 5",
        ("pascal", "dp_d", "0"): "car Images/car_d.png CAD/car/2 12 10 50 45 90 20 10",
        ("imagenet", "dp_c", "0"): "chair Images/chair_c.png CAD/chair/1 8 6 40 42 45 15 -10",
    }
    for (dataset, dp, obj), line in objs.items():
        d = os.path.join(base, "training_data", dataset, dp, obj)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "objInfo.txt"), "w") as fh:
            fh.write(line + "\n")


def make_kitti(root: str):
    base = os.path.join(root, "kitti")
    # 10 car CADs with distinct, known (w/l, h/l) voxel-extent aspects so
    # the nearest-CAD instance heuristic is exactly checkable
    d = os.path.join(base, "cad")
    os.makedirs(d, exist_ok=True)
    for k in range(10):
        # extents along (d, h, w) grid axes; w/l and h/l sweep with k
        m = _box(0.40, 0.10 + 0.02 * k, 0.12 + 0.03 * k)
        np.save(os.path.join(d, f"{k}.npy"), m)

    img_d = os.path.join(base, "training", "image_2")
    lab_d = os.path.join(base, "training", "label_2")
    os.makedirs(img_d, exist_ok=True)
    os.makedirs(lab_d, exist_ok=True)
    _png(os.path.join(img_d, "000000.png"), 96, 128, seed=10)
    _png(os.path.join(img_d, "000001.png"), 96, 128, seed=11)
    # frame 0: two keepable Cars + one sub-min-height Car + a DontCare
    with open(os.path.join(lab_d, "000000.txt"), "w") as fh:
        fh.write(
            "Car 0.00 0 1.57 10.0 20.0 60.0 60.0 1.50 1.60 4.00 1.0 1.5 8.0 1.60\n"
            "Car 0.10 1 -0.50 70.0 30.0 120.0 70.0 1.40 1.70 3.50 4.0 1.5 12.0 -0.40\n"
            "Car 0.00 0 0.00 5.0 5.0 25.0 20.0 1.40 1.60 3.80 1.0 1.5 30.0 0.00\n"
            "DontCare -1 -1 -10 0.0 0.0 10.0 10.0 -1 -1 -1 -1000 -1000 -1000 -10\n"
        )
    # frame 1 (becomes the val split): one Car
    with open(os.path.join(lab_d, "000001.txt"), "w") as fh:
        fh.write(
            "Car 0.00 0 0.80 30.0 25.0 90.0 75.0 1.55 1.65 4.20 2.0 1.4 9.0 0.90\n"
        )


if __name__ == "__main__":
    make_modelnet(HERE)
    make_pascal3d(HERE)
    make_kitti(HERE)
    print("fixtures written under", HERE)
