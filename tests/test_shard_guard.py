"""Setup-time sharded-gradient parity self-check (parallel/sharded.py
verify_shard_grad_parity): passes under current shard_map transpose
semantics, and FIRES when the reduction scaling is tampered with — the
guard against a JAX upgrade silently changing the legacy psum-transpose
factor the reductions assume."""

import jax
import numpy as np
import pytest

from mini3dgs_tpu.config import TrainingConfig
from mini3dgs_tpu.parallel import sharded
from mini3dgs_tpu.parallel.mesh import make_mesh
from mini3dgs_tpu.parallel.sharded import verify_shard_grad_parity

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@requires_8
@pytest.mark.parametrize("gauss_sharded", [False, True])
def test_parity_check_passes(gauss_sharded):
    cfg = TrainingConfig(mesh_data=2, mesh_tile=2,
                         shard_gauss_state=gauss_sharded)
    mesh = make_mesh(data=2, tile=2)
    dev = verify_shard_grad_parity(cfg, mesh, gauss_sharded=gauss_sharded)
    assert dev < 0.05


@requires_8
@pytest.mark.parametrize("gauss_sharded", [False, True])
def test_parity_check_fires_on_tampered_scale(gauss_sharded,
                                              monkeypatch):
    """Simulate a transpose-semantics change (grads scaled 2x) and require
    the check to raise — proving it can actually catch the regression it
    exists for."""
    cfg = TrainingConfig(mesh_data=2, mesh_tile=2,
                         shard_gauss_state=gauss_sharded)
    mesh = make_mesh(data=2, tile=2)
    monkeypatch.setattr(sharded, "_LEGACY_PSUM_TRANSPOSE_SCALE", 2.0)
    with pytest.raises(RuntimeError, match="psum-transpose"):
        verify_shard_grad_parity(cfg, mesh, gauss_sharded=gauss_sharded)


@requires_8
def test_trainer_setup_runs_parity_check(monkeypatch):
    """GaussianTrainer.setup under a mesh must refuse to proceed when the
    reduction is wrong (verify_sharding default on)."""
    from mini3dgs_tpu.data.dataset import RandomDataset
    from mini3dgs_tpu.train.trainer import GaussianTrainer

    cfg = TrainingConfig(capacity=64, image_height=32, image_width=32,
                         use_pallas=False, mesh_data=1, mesh_tile=2,
                         iterations=1)
    ds = RandomDataset(n_cameras=2, width=32, height=32)
    ds.load_cameras()
    monkeypatch.setattr(sharded, "_LEGACY_PSUM_TRANSPOSE_SCALE", 2.0)
    tr = GaussianTrainer(cfg)
    with pytest.raises(RuntimeError, match="psum-transpose"):
        tr.setup(dataset=ds)
