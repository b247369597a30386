"""Export a trained checkpoint as a canonical 3DGS PLY.

The standard interchange format every 3DGS viewer/editor consumes
(utils/gaussian_ply.py implements the graphdeco field layout).  Loads the
latest (or a given) orbax checkpoint through the trainer's resume path, so
capacity growth during the run is handled.

Usage: python scripts/export_ply.py --output runs/NAME [--data PATH]
           [--config YAML] [--checkpoint IT] [--out model.ply]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None)
    p.add_argument("--data", default=None)
    p.add_argument("--output", required=True, help="training output dir")
    p.add_argument("--checkpoint", type=int, default=None)
    p.add_argument("--out", default=None, help="PLY path (default: "
                   "<output>/point_cloud.ply)")
    args = p.parse_args(argv)

    import dataclasses
    from mini3dgs_tpu.config import ConfigManager, TrainingConfig
    from mini3dgs_tpu.train.checkpoint import latest_checkpoint_iteration
    from mini3dgs_tpu.train.trainer import GaussianTrainer
    from mini3dgs_tpu.utils.gaussian_ply import export_gaussians_ply

    if args.config:
        config = ConfigManager.load_from_yaml(args.config)
    else:
        config = TrainingConfig()
    over = {"output_path": args.output}
    if args.data:
        over["data_path"] = args.data
    config = dataclasses.replace(config, **over)

    trainer = GaussianTrainer(config)
    trainer.setup()
    it = args.checkpoint or latest_checkpoint_iteration(args.output)
    if it is None:
        print(f"no checkpoint found under {args.output}", file=sys.stderr)
        return 1
    trainer.load_checkpoint(it)
    out = args.out or str(Path(args.output) / "point_cloud.ply")
    n = export_gaussians_ply(trainer.state.gaussians, out)
    print(f"wrote {n} gaussians (checkpoint it {it}) to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
