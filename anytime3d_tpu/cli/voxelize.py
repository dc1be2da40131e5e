"""Dataset preparation CLI: voxelize CAD mesh directories into .npy grids.

Produces the artifacts the reference framework assumes already exist
(CAD/<class>/*.npy 64³ grids, pascal3D.py:132-154) from raw OFF meshes,
using the native C++ voxelizer (native/voxelizer.cpp).

  python -m anytime3d_tpu.cli.voxelize --mesh-root CAD_off --out-root CAD --dim 64
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--mesh-root", required=True, help="dir of <class>/<model>.off")
    parser.add_argument("--out-root", required=True)
    parser.add_argument("--dim", type=int, default=64)
    parser.add_argument("--surface-only", action="store_true")
    parser.add_argument("--threads", type=int, default=0)
    args = parser.parse_args(argv)

    import numpy as np

    from anytime3d_tpu.data.voxelize import load_off, native_available, voxelize

    print(f"native voxelizer: {'yes' if native_available() else 'NO (numpy fallback)'}")
    n_done = 0
    t0 = time.time()
    for cls in sorted(os.listdir(args.mesh_root)):
        cdir = os.path.join(args.mesh_root, cls)
        if not os.path.isdir(cdir):
            continue
        out_dir = os.path.join(args.out_root, cls)
        os.makedirs(out_dir, exist_ok=True)
        for f in sorted(os.listdir(cdir)):
            if not f.lower().endswith(".off"):
                continue
            verts, tris = load_off(os.path.join(cdir, f))
            grid = voxelize(
                verts, tris, dim=args.dim, solid=not args.surface_only,
                threads=args.threads,
            )
            np.save(os.path.join(out_dir, f[:-4] + ".npy"), grid.astype(np.uint8))
            n_done += 1
            if n_done % 50 == 0:
                print(f"{n_done} meshes, {(time.time()-t0)/n_done:.2f}s each")
    print(f"done: {n_done} meshes in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
