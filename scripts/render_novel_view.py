"""Render novel views (turntable orbit) from a trained model.

Reference `scripts/render_novel_view.py` is a 0-byte stub; this implements its
documented intent.

Usage: python scripts/render_novel_view.py --output DIR [--n-frames 60]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None, help="training YAML")
    p.add_argument("--data", default=None)
    p.add_argument("--output", default="output")
    p.add_argument("--checkpoint", type=int, default=None)
    p.add_argument("--n-frames", type=int, default=60)
    p.add_argument("--radius", type=float, default=4.0)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--video", default=None, help="optional mp4 path")
    args = p.parse_args(argv)

    from mini3dgs_tpu.config import TrainingConfig
    from mini3dgs_tpu.ops.renderer import RenderSettings, render
    from mini3dgs_tpu.train.checkpoint import latest_checkpoint_iteration
    from mini3dgs_tpu.train.trainer import GaussianTrainer
    from mini3dgs_tpu.utils.vis import create_video_from_cameras, turntable_cameras

    if args.config:
        import dataclasses
        from mini3dgs_tpu.config import ConfigManager
        config = ConfigManager.load_from_yaml(args.config)
        config = dataclasses.replace(
            config, output_path=args.output,
            **({"data_path": args.data} if args.data else {}))
    else:
        config = TrainingConfig(data_path=args.data or "data/scene",
                                output_path=args.output)
    trainer = GaussianTrainer(config)
    trainer.setup()
    it = args.checkpoint or latest_checkpoint_iteration(args.output)
    if it is not None:
        trainer.load_checkpoint(it)
        if trainer.mesh is None:
            from mini3dgs_tpu.core.gaussians import compact
            trainer.state = trainer.state.replace(
                gaussians=compact(trainer.state.gaussians))

    cams = turntable_cameras(args.n_frames, radius=args.radius,
                             width=args.size, image_height=args.size)
    if trainer.settings is not None:
        # keep color/kernel settings consistent with the checkpoint
        settings = trainer.settings.replace(image_height=args.size,
                                            image_width=args.size)
    else:
        settings = RenderSettings(image_height=args.size,
                                  image_width=args.size)

    def render_fn(cam):
        return render(trainer.state.gaussians, cam, settings)["image"]

    frames = create_video_from_cameras(render_fn, cams,
                                       f"{args.output}/novel_views",
                                       video_path=args.video)
    print(f"wrote {len(frames)} frames to {args.output}/novel_views")
    return 0


if __name__ == "__main__":
    sys.exit(main())
