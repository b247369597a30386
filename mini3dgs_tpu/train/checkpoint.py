"""Checkpoint / resume (orbax): sharded-aware serialization of the Gaussian
state, optimizer moments and step counter.

The reference declares but stubs this (`/root/reference/src/train/trainer.py:73-83`,
`save_interval: 5000` in default.yaml).  Resume is exact: the full TrainState
pytree round-trips, including Adam moments and the alive mask.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Optional

import jax


def _ckpt_dir(output_path: str, iteration: int) -> Path:
    return Path(output_path).absolute() / "checkpoints" / f"it{iteration:07d}"


def save_checkpoint(output_path: str, iteration: int, state: Any) -> str:
    import orbax.checkpoint as ocp
    path = _ckpt_dir(output_path, iteration)
    path.parent.mkdir(parents=True, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    return str(path)


def load_checkpoint(output_path: str, iteration: int, template: Any) -> Any:
    import orbax.checkpoint as ocp
    path = _ckpt_dir(output_path, iteration)
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=jax.device_get(template))
    return jax.tree.map(lambda t, r: jax.numpy.asarray(r), template, restored)


def latest_checkpoint_iteration(output_path: str) -> Optional[int]:
    root = Path(output_path) / "checkpoints"
    if not root.exists():
        return None
    its = sorted(int(p.name[2:]) for p in root.iterdir()
                 if p.name.startswith("it"))
    return its[-1] if its else None
