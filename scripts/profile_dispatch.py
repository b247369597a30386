"""Wall-clock dispatch-amortization measurement (VERDICT r3 next #6): the
per-step host dispatch through the axon tunnel costs ~8 ms (PERF.md:528) —
~27% of wall clock at the ~22 ms bench-scale step.  This times the REAL
trainer loop at bench scale (800^2, 100K gaussians, Pallas path) both ways:

  A) steps_per_call=1  — one jitted dispatch per step (round-3 behavior)
  B) steps_per_call=0  — auto K-step on-device loop (K = gcd of cadences
                         = 100 here; make_train_loop)

and prints wall-clock it/s for each.  Run on the chip:
    python scripts/profile_dispatch.py [--iters 300]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def build_trainer(steps_per_call: int):
    from __graft_entry__ import _scene
    from mini3dgs_tpu.config import TrainingConfig
    from mini3dgs_tpu.data.dataset import RandomDataset
    from mini3dgs_tpu.ops.renderer import RenderSettings
    from mini3dgs_tpu.train.trainer import GaussianTrainer

    size = 800
    cfg = TrainingConfig(
        capacity=2 ** 17, image_height=size, image_width=size,
        use_pallas=True, max_instances=1536 * 256, gaussian_chunk=256,
        tile_size=32, max_dup_per_axis=3, auto_max_instances=False,
        densify_from_iter=10 ** 9, densify_until_iter=10 ** 9,
        prune_interval=10 ** 9, opacity_reset_interval=0,
        log_interval=100, eval_interval=10 ** 9, save_interval=10 ** 9,
        steps_per_call=steps_per_call, color_mode="dc_sigmoid")
    ds = RandomDataset(n_cameras=4, width=size, height=size)
    ds.load_cameras()
    target = jnp.zeros((3, size, size), jnp.float32)
    ds.train_cameras = [c.replace(image=target) for c in ds.train_cameras]
    ds.test_cameras = []
    settings = RenderSettings(
        image_height=size, image_width=size, use_pallas=True,
        max_instances=1536 * 256, gaussian_chunk=256, tile_size=32,
        max_dup_per_axis=3, color_mode="dc_sigmoid")
    g, _ = _scene(capacity=2 ** 17, n=100_000, width=size, height=size)
    tr = GaussianTrainer(cfg, settings)
    tr.setup(dataset=ds, gaussians=g)
    return tr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    args = ap.parse_args()
    assert jax.default_backend() == "tpu"

    for mode, spc in (("per-step dispatch", 1), ("K-step loop", 0)):
        tr = build_trainer(spc)
        K = tr._loop_K()
        warm = max(K, 100)
        tr.train(iterations=warm)          # compile + warm
        jax.block_until_ready(tr.state.gaussians.xyz)
        t0 = time.perf_counter()
        tr.train(iterations=args.iters)
        jax.block_until_ready(tr.state.gaussians.xyz)
        dt = time.perf_counter() - t0
        print(f"{mode} (K={K}): {args.iters} iters in {dt:.2f}s = "
              f"{args.iters/dt:.2f} it/s ({dt/args.iters*1e3:.2f} ms/it)",
              flush=True)


if __name__ == "__main__":
    main()
