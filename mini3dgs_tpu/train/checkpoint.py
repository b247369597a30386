"""Checkpoint / resume (orbax): sharded serialization of the Gaussian state,
optimizer moments and step counter.

The reference declares but stubs this (`/root/reference/src/train/trainer.py:73-83`,
`save_interval: 5000` in default.yaml).  Resume is exact: the full TrainState
pytree round-trips, including Adam moments, the alive mask and (when enabled)
per-camera exposure + its optimizer state.

Multi-host safe: arrays are handed to orbax AS THEY ARE SHARDED — each host
writes only its addressable shards and restore places shards directly on the
owning devices (no host-0 gather; the gauss-sharded TrainState of
parallel/sharded.py round-trips without ever materializing the full state on
one host).  Restoring onto a different mesh re-shards via the template's
shardings.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np


def _ckpt_dir(output_path: str, iteration: int) -> Path:
    return Path(output_path).absolute() / "checkpoints" / f"it{iteration:07d}"


def save_checkpoint(output_path: str, iteration: int, state: Any) -> str:
    import orbax.checkpoint as ocp
    path = _ckpt_dir(output_path, iteration)
    path.parent.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        # jax.Arrays pass through sharded: orbax writes per-host shards.
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()
    return str(path)


def load_checkpoint(output_path: str, iteration: int, template: Any) -> Any:
    """Restore into the template's structure AND shardings: every leaf comes
    back as a jax.Array placed per the template leaf's sharding (sharded
    leaves are restored shard-by-shard on their owning devices)."""
    import orbax.checkpoint as ocp
    path = _ckpt_dir(output_path, iteration)

    def as_abstract(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return x

    abstract = jax.tree.map(as_abstract, template)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract)


def checkpoint_capacity(output_path: str, iteration: int) -> Optional[int]:
    """Gaussian slot-pool capacity recorded in a checkpoint (leading dim of
    gaussians.xyz), read from orbax metadata without loading any data."""
    import orbax.checkpoint as ocp
    path = _ckpt_dir(output_path, iteration)
    if not path.exists():
        return None
    with ocp.StandardCheckpointer() as ckptr:
        meta = ckptr.metadata(path)
    return int(meta.item_metadata.tree["gaussians"]["xyz"].shape[0])


def latest_checkpoint_iteration(output_path: str) -> Optional[int]:
    root = Path(output_path) / "checkpoints"
    if not root.exists():
        return None
    its = sorted(int(p.name[2:]) for p in root.iterdir()
                 if p.name.startswith("it"))
    return its[-1] if its else None
