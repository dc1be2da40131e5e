"""Data layer tests: voxel utils, augmentation remap, loaders over synthetic
on-disk fixtures (ModelNet shards, Pascal3D layout, KITTI layout)."""

import os

import numpy as np
import pytest

from anytime3d_tpu.data import (
    DevicePrefetcher,
    ImagenetLoader,
    KittiSingleObjectLoader,
    ModelNetLoader,
    Pascal3DSingleObjectLoader,
    SyntheticVoxelLoader,
    binarize,
    convert_axis_32to64,
    image_random_augmentation,
    remap_bbox,
    zoom_nearest,
)
from anytime3d_tpu.data.pascal3d import build_grid_targets

try:
    import cv2
except Exception:
    cv2 = None


class TestVoxelUtils:
    def test_zoom_nearest(self):
        v = np.zeros((2, 2, 2), np.float32)
        v[0, 0, 0] = 1.0
        z = zoom_nearest(v, 2)
        assert z.shape == (4, 4, 4)
        assert z[:2, :2, :2].sum() == 8

    def test_convert_axis_32to64(self):
        v = np.zeros((1, 32, 32, 32), np.float32)
        v[0, 1, 2, 3] = 1.0
        out = convert_axis_32to64(v)
        assert out.shape == (1, 64, 64, 64)
        assert out.sum() == 8
        # transposed (0,2,3,1): voxel (1,2,3) -> (2,3,1) -> zoomed block at (4:6,6:8,2:4)
        assert out[0, 4:6, 6:8, 2:4].sum() == 8

    def test_binarize(self):
        assert binarize(np.array([0.2, 0.5, 0.9])).tolist() == [0.0, 1.0, 1.0]


class TestAugment:
    def test_shapes_and_determinism(self):
        rng1 = np.random.default_rng(0)
        rng2 = np.random.default_rng(0)
        img = np.random.default_rng(1).uniform(0, 255, (48, 72, 3)).astype(np.float32)
        out1, p1 = image_random_augmentation(rng1, img, (64, 32))
        out2, p2 = image_random_augmentation(rng2, img, (64, 32))
        assert out1.shape == (32, 64, 3)
        assert np.array_equal(out1, out2) and p1 == p2

    def test_no_aug_identity_params(self):
        rng = np.random.default_rng(0)
        img = np.zeros((32, 32, 3), np.float32)
        _, params = image_random_augmentation(rng, img, (32, 32), augmentation=False)
        scale, tx, ty = params[0], params[1], params[2]
        assert scale == 1.0 and tx == 0.0 and ty == 0.0

    def test_remap_bbox_identity(self):
        params = (1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0)
        b = remap_bbox(np.array([0.1, 0.2, 0.5, 0.6]), params)
        assert np.allclose(b, [0.1, 0.2, 0.5, 0.6])

    def test_remap_bbox_scale_about_center(self):
        params = (0.5, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0)
        b = remap_bbox(np.array([0.0, 0.0, 1.0, 1.0]), params)
        assert np.allclose(b, [0.25, 0.25, 0.75, 0.75])


class TestNoisy:
    def test_all_noise_types(self):
        from anytime3d_tpu.data.augment import noisy

        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (16, 16, 3)).astype(np.float32)
        for t in ("gauss", "s&p", "poisson", "speckle"):
            out = noisy(rng, t, img)
            assert out.shape == img.shape, t
            assert np.all(np.isfinite(out)), t
            assert not np.array_equal(out, img), t
        with pytest.raises(ValueError):
            noisy(rng, "nope", img)


class TestPhotometric:
    def test_hue_sat_jitter_changes_chroma(self):
        """datasetUtils.py:76 AddToHueAndSaturation((-20,20)): with every
        other op's coin forced off, the hue/sat branch must change pixel
        chroma but keep shape/range; grayscale inputs must pass through the
        function unchanged in shape."""
        from anytime3d_tpu.data.augment import photometric_augment

        # deterministic rng: first five coins (brightness/contrast/blur/
        # invert/noise) high, hue/sat coin low
        class FakeRng:
            def __init__(self):
                self._coins = iter([0.9, 0.9, 0.9, 0.9, 0.9, 0.0])

            def random(self):
                return next(self._coins)

            def uniform(self, lo, hi):
                return 15.0

            def normal(self, *a, **k):
                raise AssertionError("noise branch must be off")

            def integers(self, *a, **k):
                raise AssertionError("blur branch must be off")

        img = np.zeros((8, 8, 3), np.float32)
        img[..., 0] = 200.0  # saturated red: hue shift must move channels
        out = photometric_augment(FakeRng(), img)
        assert out.shape == img.shape
        assert out.dtype == np.float32
        assert (out >= 0).all() and (out <= 255).all()
        assert not np.allclose(out, img), "hue/sat jitter did not change the image"

        gray = np.full((8, 8), 100.0, np.float32)
        out_gray = photometric_augment(FakeRng(), gray)
        assert out_gray.shape == gray.shape  # 2D input skips the chroma op


class TestSyntheticLoader:
    def test_batches_and_epochs(self):
        loader = SyntheticVoxelLoader(num_samples=64, dim=16, num_classes=4)
        b = loader.getNextBatch(16)
        assert b["input_images"].shape == (16, 16, 16, 16, 1)
        assert b["class_list"].shape == (16, 4)
        for _ in range(4):
            loader.getNextBatch(16)
        assert loader.epoch >= 1

    def test_shapes_nontrivial(self):
        loader = SyntheticVoxelLoader(num_samples=8, dim=16)
        b = loader.getNextBatch(8)
        occ = b["input_images"].mean()
        assert 0.01 < occ < 0.9

    def test_image_object_loader_pascal_contract(self):
        from anytime3d_tpu.data import SyntheticImageObjectLoader

        loader = SyntheticImageObjectLoader(
            num_samples=16, dim=16, num_classes=4, num_inst=3
        )
        inst, cls, sin, cos, images, voxels = loader.getNextBatch(8, imageSize=(24, 16))
        assert images.shape == (8, 16, 24, 3)  # imageSize=(cols, rows)
        assert voxels.shape == (8, 16, 16, 16, 1)
        assert inst.shape == (8, 3) and cls.shape == (8, 4)
        assert sin.shape == (8, 3) and cos.shape == (8, 3)
        assert np.allclose(sin**2 + cos**2, 1.0, atol=1e-6)
        assert 0.0 < images.mean() < 1.0  # projections are non-trivial

    def test_multi_object_loader_contract(self):
        from anytime3d_tpu.data import SyntheticMultiObjectLoader
        from anytime3d_tpu.data.collate import collate_multiobject

        loader = SyntheticMultiObjectLoader(
            num_samples=32, dim=8, num_classes=4, image_size=(64, 48),
            grid_size=(4, 3), max_objects=2,
        )
        images, targets, voxel_lists = loader.getNextBatch(4)
        assert images.shape == (4, 48, 64, 3)
        assert targets["objness"].shape == (4, 3, 4, 5, 1)
        assert targets["bbox"].shape == (4, 3, 4, 5, 4)
        n_obj = targets["objness"].sum()
        assert 4 <= n_obj <= 8  # 1..2 objects per image
        assert all(1 <= len(v) <= 2 for v in voxel_lists)
        b = collate_multiobject(images, targets, voxel_lists, max_slots=4)
        assert b["voxels"].shape == (4, 4, 8, 8, 8, 1)
        assert b["voxel_slot"].max() < 4

    def test_image_object_loader_azimuth_changes_image(self):
        from anytime3d_tpu.data import SyntheticImageObjectLoader

        loader = SyntheticImageObjectLoader(num_samples=4, dim=16, num_classes=2)
        vox = loader._make(0)
        a = loader._render(vox, 0.0, (16, 16))
        b = loader._render(vox, 1.2, (16, 16))
        assert a.shape == (16, 16, 3)
        assert not np.array_equal(a, b)


class TestModelNetLoader:
    def test_sharded_layout(self, tmp_path):
        base = tmp_path / "32to64_4rot_64sqr" / "train"
        base.mkdir(parents=True)
        for i in range(3):
            np.save(base / f"{i}Full.npy", np.zeros((4, 8, 8, 8), np.float32))
            np.save(base / f"{i}Class.npy", np.eye(40, dtype=np.float32)[np.zeros(4, int)])
            np.save(base / f"{i}Inst.npy", np.zeros((4, 10), np.float32))
        loader = ModelNetLoader(str(tmp_path), "train", partial_num=3)
        assert loader.dataLength == 12
        b = loader.getNextBatch(4)
        assert b["input_images"].shape == (4, 8, 8, 8, 1)

    def test_process_sharding(self, tmp_path):
        base = tmp_path / "32to64_4rot_64sqr" / "train"
        base.mkdir(parents=True)
        for i in range(4):
            np.save(base / f"{i}Full.npy", np.full((2, 4, 4, 4), i, np.float32))
            np.save(base / f"{i}Class.npy", np.zeros((2, 40), np.float32))
            np.save(base / f"{i}Inst.npy", np.zeros((2, 10), np.float32))
        l0 = ModelNetLoader(str(tmp_path), "train", partial_num=4, process_index=0, process_count=2)
        l1 = ModelNetLoader(str(tmp_path), "train", partial_num=4, process_index=1, process_count=2)
        assert l0.dataLength == 4 and l1.dataLength == 4
        # disjoint shards
        assert set(np.unique(l0._vox)) == {0.0, 2.0}
        assert set(np.unique(l1._vox)) == {1.0, 3.0}


@pytest.fixture
def pascal_fixture(tmp_path):
    """Minimal Pascal3D+ directory layout with 2 classes, 2 images."""
    if cv2 is None:
        pytest.skip("cv2 unavailable")
    root = tmp_path
    for cls in ("aeroplane", "car"):
        cad = root / "CAD" / cls
        cad.mkdir(parents=True)
        for k in range(1, 3):
            np.save(cad / f"{k:02d}.npy", (np.random.default_rng(k).uniform(size=(64, 64, 64)) > 0.8))
    sets = root / "Image_sets" / "imagenet"
    sets.mkdir(parents=True)
    (sets / "car_train.txt").write_text("img0\nimg1\n")
    img_dir = root / "Images"
    img_dir.mkdir()
    for i in range(2):
        img = np.random.default_rng(i).integers(0, 255, (120, 160, 3), dtype=np.uint8)
        cv2.imwrite(str(img_dir / f"img{i}.jpg"), np.ascontiguousarray(img))
    for i in range(2):
        dp = root / "training_data" / "imagenet" / f"img{i}"
        for j in range(2):
            obj = dp / f"obj{j}"
            obj.mkdir(parents=True)
            (obj / "objInfo.txt").write_text(
                f"car Images/img{i}.jpg CAD/car/0{j+1} 10 20 90 100 30 5 2\n"
            )
    return str(root)


class TestPascalLoader:
    def test_single_object_batch(self, pascal_fixture):
        loader = Pascal3DSingleObjectLoader(pascal_fixture, "train", workers=2)
        assert loader.dataLength == 4
        inst, cls, sin, cos, images, voxels = loader.getNextBatch(4, imageSize=(32, 32))
        assert images.shape == (4, 32, 32, 3)
        assert voxels.shape == (4, 64, 64, 64, 1)
        assert cls.shape == (4, 2)  # two classes in fixture
        assert inst.shape == (4, 10)
        assert np.allclose(sin**2 + cos**2, 1.0, atol=1e-5)
        assert images.max() <= 1.0
        assert loader.bad_records == 0

    def test_epoch_advances(self, pascal_fixture):
        loader = Pascal3DSingleObjectLoader(pascal_fixture, "train", workers=2)
        for _ in range(3):
            loader.getNextBatch(4, imageSize=(16, 16))
        assert loader.epoch >= 1


class TestGridTargets:
    def test_single_object_placement(self):
        objs = [
            {
                "bbox": np.array([0.1, 0.1, 0.3, 0.5]),
                "euler_rad": (0.5, 0.0, 0.0),
                "inst_onehot": np.eye(10, dtype=np.float32)[3],
                "voxel_index": 0,
            }
        ]
        t = build_grid_targets(objs, grid_size=(10, 10), predictors_per_cell=3)
        # center (0.2, 0.3) -> cell (col 2, row 3)
        assert t["objness"][3, 2, 0, 0] == 1.0
        assert t["objness"].sum() == 1.0
        h, w, x, y = t["bbox"][3, 2, 0]
        assert np.isclose(h, 0.4) and np.isclose(w, 0.2)
        assert np.isclose(x, 0.0) and np.isclose(y, 0.0)
        assert t["voxel_slot"][3, 2, 0] == 0
        assert t["voxel_slot"].min() == -1

    def test_two_objects_same_cell(self):
        mk = lambda i: {
            "bbox": np.array([0.42, 0.42, 0.58, 0.58]),
            "euler_rad": (0, 0, 0),
            "inst_onehot": np.eye(10, dtype=np.float32)[i],
            "voxel_index": i,
        }
        t = build_grid_targets([mk(0), mk(1)], grid_size=(2, 2), predictors_per_cell=5)
        assert t["objness"][1, 1, 0, 0] == 1.0 and t["objness"][1, 1, 1, 0] == 1.0


@pytest.fixture
def kitti_fixture(tmp_path):
    if cv2 is None:
        pytest.skip("cv2 unavailable")
    img_dir = tmp_path / "training" / "image_2"
    lbl_dir = tmp_path / "training" / "label_2"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        img = rng.integers(0, 255, (375, 1242, 3), dtype=np.uint8)
        cv2.imwrite(str(img_dir / f"{i:06d}.png"), np.ascontiguousarray(img))
        (lbl_dir / f"{i:06d}.txt").write_text(
            "Car 0.0 0 1.2 300 150 500 300 1.5 1.7 4.1 1.0 1.5 20.0 1.6\n"
            "Pedestrian 0.0 0 0.5 600 140 640 280 1.8 0.6 0.9 4.0 1.6 15.0 0.4\n"
            "Car 0.0 0 -0.3 700 160 800 240 1.4 1.6 3.9 6.0 1.4 25.0 -0.1\n"
        )
    cad_dir = tmp_path / "cad"
    cad_dir.mkdir()
    for k in range(10):
        np.save(cad_dir / f"{k:02d}.npy", (rng.uniform(size=(64, 64, 64)) > 0.8))
    return str(tmp_path), str(cad_dir)


class TestKittiLoader:
    def test_interface_matches_call_sites(self, kitti_fixture):
        root, cad = kitti_fixture
        loader = KittiSingleObjectLoader(root, cad, trainOrVal="train", workers=2)
        # train_kitti.py:94-100 contract
        assert hasattr(loader, "epoch") and hasattr(loader, "dataStart")
        inst, sin, cos, images, voxels = loader.getNextBatch(
            batchSizeof3DShape=4, imageSize=(64, 64)
        )
        assert inst.shape == (4, 10)
        assert images.shape == (4, 64, 64, 3)
        assert voxels.shape == (4, 64, 64, 64, 1)
        assert np.allclose(sin**2 + cos**2, 1.0, atol=1e-5)

    def test_only_cars_kept(self, kitti_fixture):
        root, cad = kitti_fixture
        loader = KittiSingleObjectLoader(root, cad, trainOrVal="train")
        # 4 frames x 2 cars (pedestrian filtered)
        assert loader.dataLength <= 8


class TestPrefetcher:
    def test_prefetch_order_and_close(self):
        counter = {"n": 0}

        def make():
            counter["n"] += 1
            return {"x": np.full((2, 2), counter["n"], np.float32)}

        pf = DevicePrefetcher(make, depth=2)
        a = pf.get()
        b = pf.get()
        assert float(np.asarray(a["x"])[0, 0]) < float(np.asarray(b["x"])[0, 0])
        pf.close()

    def test_close_waits_for_inflight_batch(self):
        """close() must not return while the worker is mid-batch: a timed-out
        join would let a successor prefetcher race the stateful loader."""
        import threading
        import time

        in_fn = threading.Event()

        def slow_make():
            in_fn.set()
            time.sleep(0.5)
            return {"x": np.zeros((2, 2), np.float32)}

        pf = DevicePrefetcher(slow_make, depth=1)
        assert in_fn.wait(timeout=5.0)
        pf.close()
        assert not pf._thread.is_alive()

    def test_sharded_put(self):
        """With a sharding, leaves come back placed with exactly that
        sharding (the trainer's mesh path relies on this single put)."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec

        from anytime3d_tpu.parallel import make_mesh

        mesh = make_mesh(data=len(jax.devices()))
        sh = NamedSharding(mesh, PartitionSpec("data"))
        pf = DevicePrefetcher(
            lambda: {"x": np.zeros((8, 4), np.float32)}, sharding=sh, depth=1
        )
        out = pf.get()
        assert out["x"].sharding == sh
        pf.close()
