"""Drive the native voxelizer + NMS + augmentation engine under an ASan/TSan
build (no JAX import).

Usage: LD_PRELOAD=$(g++ -print-file-name=libasan.so) \
       ANYTIME3D_VOXELIZER_LIB=native/libvoxelizer_asan.so \
       ANYTIME3D_AUGMENT_LIB=native/libaugment_asan.so \
       ANYTIME3D_PACK_LIB=native/libpack_asan.so python native/sanitize_check.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from anytime3d_tpu.data.voxelize import native_available, voxelize, nms_native
from anytime3d_tpu.data.augment import augment_batch, augment_native_available

assert native_available(), "native lib not loaded"
rng = np.random.default_rng(0)

# batch augmentation across the thread pool (disjoint-output parallelism)
assert augment_native_available(), "augment lib not loaded"
imgs = [
    rng.uniform(0, 255, (int(rng.integers(3, 90)), int(rng.integers(3, 90)), 3)).astype(
        np.float32
    )
    for _ in range(32)
]
out, params, flips = augment_batch(rng, imgs, (48, 40), flip_prob=0.5, n_threads=8)
assert out.shape == (32, 40, 48, 3) and np.isfinite(out).all()
# a couple of meshes incl. degenerate triangles
for n in (4, 64):
    verts = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    tris = rng.integers(0, n, (2 * n, 3)).astype(np.int32)
    vox = voxelize(verts, tris, dim=32, solid=True)
    assert vox.shape == (32, 32, 32)
boxes = rng.uniform(0, 1, (200, 5)).astype(np.float32)
boxes[:, 2:4] += boxes[:, 0:2]
keep = nms_native(boxes, 0.5)
assert keep.dtype == np.bool_ and keep.shape == (200,)

# blocked bit-packer across the batch thread pool (disjoint out rows;
# point ANYTIME3D_PACK_LIB at libpack_{asan,tsan}.so)
from anytime3d_tpu.data import packing
if packing._find_pack_lib() is not None:
    v = (rng.uniform(size=(16, 16, 16, 16, 1)) > 0.5).astype(np.float32)
    got = packing.pack_voxels_blocked(v)
    lib = packing._PACK_LIB
    packing._PACK_LIB = None
    want = packing.pack_voxels_blocked(v)
    packing._PACK_LIB = lib
    assert np.array_equal(got, want)

print("sanitize_check ok")
