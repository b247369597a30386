"""Shard-aware evaluation (VERDICT r2 weak #3): GaussianTrainer.validate()
must route through the mesh renderers when a mesh is active — including the
gauss-sharded state, where single-device rendering would require
materializing replicated parameters."""

import dataclasses

import jax
import numpy as np
import pytest

from mini3dgs_tpu.config import TrainingConfig
from mini3dgs_tpu.data.dataset import RandomDataset
from mini3dgs_tpu.train.trainer import GaussianTrainer

requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _trainer(cfg, ds):
    tr = GaussianTrainer(cfg)
    tr.setup(dataset=ds)
    return tr


@requires_8
@pytest.mark.parametrize("gauss_sharded", [False, True])
def test_validate_on_mesh_matches_single_device(gauss_sharded):
    base = TrainingConfig(capacity=2048, image_height=32, image_width=32,
                          use_pallas=False, iterations=1)
    ds = RandomDataset(n_cameras=2, width=32, height=32)
    ds.load_cameras()

    tr_single = _trainer(base, ds)
    m_single = tr_single.validate()

    cfg_mesh = dataclasses.replace(base, mesh_data=1, mesh_tile=2,
                                   shard_gauss_state=gauss_sharded)
    tr_mesh = _trainer(cfg_mesh, ds)
    if gauss_sharded:
        # state really is sharded over the gauss axis (not replicated)
        shard_names = {
            s.spec for s in
            [tr_mesh.state.gaussians.xyz.sharding]}
        assert any(s for s in shard_names), tr_mesh.state.gaussians.xyz.sharding
    m_mesh = tr_mesh.validate()

    assert np.isfinite(m_mesh["psnr"]) and np.isfinite(m_mesh["ssim"])
    np.testing.assert_allclose(m_mesh["psnr"], m_single["psnr"], rtol=2e-3)
    np.testing.assert_allclose(m_mesh["ssim"], m_single["ssim"], rtol=2e-3)
    # the mesh path really was used (renderer cache populated)
    assert tr_mesh._eval_renderers, "validate() bypassed the mesh renderer"


@requires_8
def test_validate_mesh_fallback_on_odd_camera_size():
    """Cameras whose height cannot band-split fall back to the single-device
    render instead of crashing."""
    cfg = TrainingConfig(capacity=2048, image_height=48, image_width=48,
                         use_pallas=False, iterations=1,
                         mesh_data=1, mesh_tile=2, tile_size=32)
    ds = RandomDataset(n_cameras=2, width=48, height=48)
    ds.load_cameras()
    tr = _trainer(cfg, ds)
    m = tr.validate()
    assert np.isfinite(m["psnr"])
