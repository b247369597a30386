"""Evaluate a trained model: PSNR/SSIM over the test split.

Reference `scripts/evaluate.py` is a 0-byte stub; this implements its
documented intent (SURVEY §5 metrics).

Usage: python scripts/evaluate.py --data PATH --checkpoint ITERATION [--output DIR]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None, help="training YAML (render/"
                   "color settings must match the checkpoint)")
    p.add_argument("--data", required=True)
    p.add_argument("--output", default="output")
    p.add_argument("--checkpoint", type=int, default=None,
                   help="iteration to load (default: latest)")
    p.add_argument("--save-images", action="store_true")
    args = p.parse_args(argv)

    import dataclasses
    import numpy as np
    from mini3dgs_tpu.config import TrainingConfig
    from mini3dgs_tpu.core.loss import ssim as ssim_fn
    from mini3dgs_tpu.ops.renderer import render
    from mini3dgs_tpu.train.checkpoint import latest_checkpoint_iteration
    from mini3dgs_tpu.train.trainer import GaussianTrainer
    from mini3dgs_tpu.utils.io import save_image
    from mini3dgs_tpu.utils.metrics import psnr as psnr_fn

    if args.config:
        from mini3dgs_tpu.config import ConfigManager
        config = ConfigManager.load_from_yaml(args.config)
        config = dataclasses.replace(config, data_path=args.data,
                                     output_path=args.output)
    else:
        config = TrainingConfig(data_path=args.data, output_path=args.output)
    trainer = GaussianTrainer(config)
    trainer.setup()
    it = args.checkpoint or latest_checkpoint_iteration(args.output)
    if it is not None:
        trainer.load_checkpoint(it)
        print(f"loaded checkpoint at iteration {it}")

    if trainer.mesh is None:
        # load-time slot compaction: eval pays per-CAPACITY stage cost per
        # camera; a mid-growth checkpoint can sit at low occupancy
        from mini3dgs_tpu.core.gaussians import compact
        trainer.state = trainer.state.replace(
            gaussians=compact(trainer.state.gaussians))
    cams = trainer.dataset.get_test_cameras()
    psnrs, ssims = [], []
    # shard-aware: under a mesh, render through the band-sharded (or
    # gauss-sharded) eval renderer instead of materializing replicated
    # parameters on one device (GaussianTrainer._mesh_render_fn)
    mesh_render = trainer._mesh_render_fn(trainer.settings)
    for i, cam in enumerate(cams):
        if mesh_render is not None:
            out = mesh_render(trainer.state.gaussians,
                              cam.replace(uid=0, image_name=""))
        else:
            out = render(trainer.state.gaussians, cam, trainer.settings)
        if cam.image is not None:
            psnrs.append(float(psnr_fn(out["image"], cam.image)))
            ssims.append(float(ssim_fn(out["image"], cam.image)))
            print(f"view {i:3d} ({cam.image_name}): "
                  f"psnr={psnrs[-1]:.2f} ssim={ssims[-1]:.4f}")
        if args.save_images:
            save_image(out["image"], f"{args.output}/eval/render_{i:04d}.png")
    if psnrs:
        print(f"mean: psnr={np.mean(psnrs):.2f} ssim={np.mean(ssims):.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
