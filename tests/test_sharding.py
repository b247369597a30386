"""Multi-device SPMD tests on the 8-virtual-CPU-device mesh (SURVEY §4(d)):
band-sharded rendering must match single-device rendering exactly, and the
sharded train step must match the single-device train step."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mini3dgs_tpu.config import TrainingConfig
from mini3dgs_tpu.core.camera import Camera
from mini3dgs_tpu.ops.renderer import RenderSettings, render
from mini3dgs_tpu.parallel.mesh import make_mesh
from mini3dgs_tpu.parallel.sharded import (GAUSS_AXES, make_sharded_render,
                                           make_sharded_train_step)
from mini3dgs_tpu.train.trainer import create_train_state, make_train_step
from tests.test_raster_pallas import random_scene, rotated_scene
from tests.test_render_golden import identity_camera


requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@requires_8
def test_band_sharded_render_matches_single():
    cam = identity_camera(64, 64, 70.0)
    gs = random_scene(60, seed=4)
    settings = RenderSettings(image_height=64, image_width=64)
    mesh = make_mesh(data=1, tile=4)
    out_single = render(gs, cam, settings)
    out_sharded = make_sharded_render(settings, mesh)(gs, cam)
    np.testing.assert_allclose(np.asarray(out_sharded["image"]),
                               np.asarray(out_single["image"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_sharded["alpha"]),
                               np.asarray(out_single["alpha"]), atol=1e-5)


@requires_8
def test_sharded_train_step_matches_single_device():
    cfg = TrainingConfig(capacity=64, image_height=32, image_width=32,
                         use_pallas=False, lambda_dssim=0.2)
    gs = random_scene(40, seed=2, spread=0.35)
    cam = identity_camera(32, 32, 70.0)
    target = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (3, 32, 32)).astype(np.float32))
    cam = cam.replace(image=target)
    settings = RenderSettings(image_height=32, image_width=32)

    # Build both states before stepping: train steps donate their input
    # buffers, which `gs` shares.
    state1 = create_train_state(gs, cfg)
    state2 = create_train_state(jax.tree.map(jnp.copy, gs), cfg)
    step1 = make_train_step(cfg, settings)
    state1, m1 = step1(state1, cam)

    # 1 data x 2 tile bands
    mesh = make_mesh(data=1, tile=2)
    step2 = make_sharded_train_step(cfg, settings, mesh)
    cams = jax.tree.map(lambda x: jnp.stack([x]), cam)  # batch of 1
    state2, m2 = step2(state2, cams)

    np.testing.assert_allclose(float(m2["total_loss"]), float(m1["total_loss"]),
                               rtol=1e-5)
    # psum of band-partial grads reorders float sums, and Adam's first step is
    # ~sign(g), which amplifies that noise to O(lr); tolerance scales with the
    # per-group LR (xyz 1.6e-4, opacity 5e-2).
    np.testing.assert_allclose(np.asarray(state2.gaussians.xyz),
                               np.asarray(state1.gaussians.xyz), atol=2e-5)
    np.testing.assert_allclose(np.asarray(state2.gaussians.opacity),
                               np.asarray(state1.gaussians.opacity), atol=3e-3)


@requires_8
def test_data_parallel_averages_gradients():
    cfg = TrainingConfig(capacity=64, image_height=32, image_width=32,
                         use_pallas=False)
    gs = random_scene(40, seed=3, spread=0.35)
    settings = RenderSettings(image_height=32, image_width=32)
    rng = np.random.default_rng(2)
    cams = []
    for i in range(2):
        cam = identity_camera(32, 32, 70.0)
        img = jnp.asarray(rng.uniform(0, 1, (3, 32, 32)).astype(np.float32))
        cams.append(cam.replace(image=img))
    batch = jax.tree.map(lambda *x: jnp.stack(x), *cams)

    mesh = make_mesh(data=2, tile=2)
    state = create_train_state(gs, cfg)
    step = make_sharded_train_step(cfg, settings, mesh)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))
    # Params remain replicated across devices after the update.
    xyz = state.gaussians.xyz
    assert np.all(np.isfinite(np.asarray(xyz)))


@requires_8
def test_trainer_with_mesh(tmp_path):
    """GaussianTrainer orchestration on a (2 data x 2 tile) mesh."""
    from tests.test_trainer_integration import build_trainer
    trainer = build_trainer(tmp_path, iterations=6, mesh_data=2, mesh_tile=2)
    assert trainer.mesh is not None
    trainer.train(iterations=6)
    assert trainer.iteration == 6
    assert np.isfinite(trainer.train_losses[-1] if trainer.train_losses else 0.0)


@requires_8
def test_sharded_render_pallas_interpret():
    """Band-sharded rendering through the PALLAS path (interpret mode) on the
    virtual mesh must match the single-device golden render."""
    cam = identity_camera(64, 64, 70.0)
    gs = random_scene(40, seed=6)
    golden = RenderSettings(image_height=64, image_width=64)
    pallas = golden.replace(use_pallas=True, max_instances=4096,
                            gaussian_chunk=32)
    mesh = make_mesh(data=1, tile=2)
    out_single = render(gs, cam, golden)
    out_sharded = make_sharded_render(pallas, mesh)(gs, cam)
    np.testing.assert_allclose(np.asarray(out_sharded["image"]),
                               np.asarray(out_single["image"]), atol=3e-5)


def test_make_global_mesh_single_host():
    from mini3dgs_tpu.parallel.distributed import make_global_mesh
    mesh = make_global_mesh()
    assert set(mesh.axis_names) == {"data", "tile"}
    assert mesh.shape["data"] * mesh.shape["tile"] <= len(jax.devices())


@requires_8
@pytest.mark.parametrize("aniso", [False, True])
def test_sharded_binning_matches_replicated_bands(aniso):
    """bin_gaussians_sharded (rank-sharded sort + all_to_all routing) must
    produce exactly the replicated per-band binning when nothing drops —
    including with the exact ellipse-vs-tile cull firing (aniso=True:
    rotated anisotropic splats where the band-restricted exact counts and
    the routed emission must agree bitwise)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from mini3dgs_tpu.ops import binning
    from mini3dgs_tpu.ops.projection import project_gaussians

    n = 4
    H = W = 64
    band_h = H // n
    cam = identity_camera(H, W, 70.0)
    # capacity divisible by n either way
    gs = rotated_scene(60, seed=11) if aniso else random_scene(60, seed=11)
    proj = project_gaussians(gs, cam)
    mesh = make_mesh(data=1, tile=n)

    def sharded(proj):
        b = binning.bin_gaussians_sharded(
            proj, band_h, W, 16, 1024, 32, "tile", n,
            full_height=H, full_width=W, route_capacity=1024)
        return (b.s_rank, b.rank_counts, b.tile_start,
                b.tile_count, b.n_live[None], b.n_dropped[None])

    f = shard_map(sharded, mesh=mesh,
                  in_specs=(P(),), out_specs=P("tile"), check_vma=False)
    out = jax.jit(f)(proj)

    for i in range(n):
        ref = binning.bin_gaussians(proj, band_h, W, 16, 1024, 32,
                                    row0=i * band_h, col0=0,
                                    full_height=H, full_width=W)
        got = jax.tree.map(lambda x: np.asarray(x).reshape(
            (n, -1) + x.shape[1:])[i] if x.ndim else x, out)
        assert int(ref.n_dropped) == 0
        np.testing.assert_array_equal(got[0], np.asarray(ref.s_rank))
        np.testing.assert_array_equal(got[1], np.asarray(ref.rank_counts))
        np.testing.assert_array_equal(got[2], np.asarray(ref.tile_start))
        np.testing.assert_array_equal(got[3], np.asarray(ref.tile_count))
        assert int(np.asarray(out[4]).reshape(n)[i]) == int(ref.n_live)
        assert int(np.asarray(out[5]).reshape(n)[i]) == 0


@requires_8
def test_sharded_exposure_matches_single_device():
    """Per-camera exposure on the (data, tile) mesh: the sharded step must
    reproduce the single-device exposure step (same camera/index), update
    only the selected camera's affine, and leave the others at identity."""
    cfg = TrainingConfig(capacity=64, image_height=32, image_width=32,
                         use_pallas=False, use_exposure=True)
    gs = random_scene(40, seed=2, spread=0.35)
    cam = identity_camera(32, 32, 70.0)
    target = jnp.asarray(
        np.random.default_rng(7).uniform(0, 1, (3, 32, 32)).astype(np.float32))
    cam = cam.replace(image=target)
    settings = RenderSettings(image_height=32, image_width=32)

    state1 = create_train_state(gs, cfg, n_cameras=3)
    state2 = create_train_state(jax.tree.map(jnp.copy, gs), cfg, n_cameras=3)
    step1 = make_train_step(cfg, settings)
    state1, m1 = step1(state1, cam, jnp.int32(1))

    mesh = make_mesh(data=1, tile=2)
    step2 = make_sharded_train_step(cfg, settings, mesh)
    cams = jax.tree.map(lambda x: jnp.stack([x]), cam)
    state2, m2 = step2(state2, cams, jnp.array([1], jnp.int32))

    np.testing.assert_allclose(float(m2["total_loss"]),
                               float(m1["total_loss"]), rtol=1e-5)
    exp1 = np.asarray(state1.exposure)
    exp2 = np.asarray(state2.exposure)
    ident = np.concatenate([np.eye(3, dtype=np.float32),
                            np.zeros((3, 1), np.float32)], axis=1)
    # only camera 1's affine moved, and it matches the single-device update
    np.testing.assert_array_equal(exp2[0], ident)
    np.testing.assert_array_equal(exp2[2], ident)
    assert np.abs(exp2[1] - ident).max() > 0
    np.testing.assert_allclose(exp2[1], exp1[1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(state2.gaussians.xyz),
                               np.asarray(state1.gaussians.xyz), atol=2e-5)


@requires_8
def test_sharded_exposure_data2_matches_sequential():
    """data=2 exposure: per-shard cam indices route each camera's grads to its
    own affine.  Oracle: with distinct indices, the pmean halves each
    camera's exposure grad, and Adam's first step is scale-invariant (up to
    eps), so each row must match the single-device first step for that
    camera.  With duplicate indices (both shards on camera 1, same target),
    the pmean reproduces the single-camera grad exactly."""
    cfg = TrainingConfig(capacity=64, image_height=32, image_width=32,
                         use_pallas=False, use_exposure=True,
                         exposure_lr=5e-2)
    gs = random_scene(40, seed=2, spread=0.35)
    rng = np.random.default_rng(11)
    cam = identity_camera(32, 32, 70.0)
    t1 = jnp.asarray(rng.uniform(0, 1, (3, 32, 32)).astype(np.float32))
    t2 = jnp.asarray(rng.uniform(0, 1, (3, 32, 32)).astype(np.float32))
    settings = RenderSettings(image_height=32, image_width=32)
    step1 = make_train_step(cfg, settings)
    mesh = make_mesh(data=2, tile=2)
    stepN = make_sharded_train_step(cfg, settings, mesh)

    def fresh():
        return create_train_state(jax.tree.map(jnp.copy, gs), cfg,
                                  n_cameras=3)

    # single-device oracles (independent first steps per camera)
    sA, _ = step1(fresh(), cam.replace(image=t1), jnp.int32(1))
    sB, _ = step1(fresh(), cam.replace(image=t2), jnp.int32(2))

    # distinct indices (1, 2)
    batch = jax.tree.map(lambda *x: jnp.stack(x),
                         cam.replace(image=t1), cam.replace(image=t2))
    sD, _ = stepN(fresh(), batch, jnp.array([1, 2], jnp.int32))
    expD = np.asarray(sD.exposure)
    np.testing.assert_allclose(expD[1], np.asarray(sA.exposure)[1], atol=1e-5)
    np.testing.assert_allclose(expD[2], np.asarray(sB.exposure)[2], atol=1e-5)
    ident = np.concatenate([np.eye(3, dtype=np.float32),
                            np.zeros((3, 1), np.float32)], axis=1)
    np.testing.assert_array_equal(expD[0], ident)

    # duplicate indices (1, 1) with the same camera: exact single-cam grads
    batch_dup = jax.tree.map(lambda *x: jnp.stack(x),
                             cam.replace(image=t1), cam.replace(image=t1))
    sDup, _ = stepN(fresh(), batch_dup, jnp.array([1, 1], jnp.int32))
    np.testing.assert_allclose(np.asarray(sDup.exposure)[1],
                               np.asarray(sA.exposure)[1], atol=1e-6)
    # ... and the gaussian update equals the single-device one too
    np.testing.assert_allclose(np.asarray(sDup.gaussians.xyz),
                               np.asarray(sA.gaussians.xyz), atol=2e-5)


@requires_8
def test_trainer_batched_camera_requires_per_shard_cam_idx(tmp_path):
    """With mesh + use_exposure, passing a batched camera without per-shard
    indices must raise instead of silently training camera 0's exposure for
    every shard."""
    import pytest as _pytest
    from tests.test_trainer_integration import build_trainer
    trainer = build_trainer(tmp_path, iterations=4, mesh_data=2, mesh_tile=2,
                            use_exposure=True)
    cams = trainer.train_cameras()
    sel = [cams[0].replace(uid=0, image_name=""),
           cams[1].replace(uid=0, image_name="")]
    batch = jax.tree.map(lambda *x: jnp.stack(x), *sel)
    with _pytest.raises(ValueError, match="per-shard cam_idx"):
        trainer.train_step(batch, 0)
    # explicit per-shard indices work
    m = trainer.train_step(batch, np.array([0, 1], np.int32))
    assert np.isfinite(float(m["total_loss"]))


@requires_8
def test_sharded_grad_scale_matches_single_device():
    """Scale-sensitive gate: xyz_gradient_accum (raw ||grad|| norms, no Adam
    normalization) must match the single-device step exactly-ish across mesh
    shapes.  Catches collective double-counting that Adam's scale invariance
    hides (a psum-vs-pmean bug inflated these stats n_tile x)."""
    cfg = TrainingConfig(capacity=64, image_height=32, image_width=32,
                         use_pallas=False)
    gs = random_scene(40, seed=2, spread=0.35)
    cam = identity_camera(32, 32, 70.0)
    t1 = jnp.asarray(np.random.default_rng(7)
                     .uniform(0, 1, (3, 32, 32)).astype(np.float32))
    cam = cam.replace(image=t1)
    settings = RenderSettings(image_height=32, image_width=32)

    def fresh():
        return create_train_state(jax.tree.map(jnp.copy, gs), cfg)

    s1, _ = make_train_step(cfg, settings)(fresh(), cam)
    acc1 = np.asarray(s1.gaussians.xyz_gradient_accum)

    for d, t in [(1, 2), (2, 2), (4, 2)]:
        mesh = make_mesh(data=d, tile=t)
        stepN = make_sharded_train_step(cfg, settings, mesh)
        batch = jax.tree.map(lambda *x: jnp.stack(x), *([cam] * d))
        s2, _ = stepN(fresh(), batch)
        acc2 = np.asarray(s2.gaussians.xyz_gradient_accum)
        np.testing.assert_allclose(acc2, acc1, atol=1e-6, rtol=1e-4,
                                   err_msg=f"mesh data={d} tile={t}")


@requires_8
def test_gauss_sharded_state_step_matches_replicated():
    """Model + Adam state sharded over the gauss axis (SURVEY §2.5 TP): the
    step must reproduce the replicated-state step (params AND raw grad-norm
    stats), per-device state memory must be C/n, and densify must work on
    the sharded state."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mini3dgs_tpu.parallel.sharded import (
        make_gauss_sharded_densify_step, make_gauss_sharded_train_step,
        shard_train_state, train_state_specs)

    cfg = TrainingConfig(capacity=64, image_height=32, image_width=32,
                         use_pallas=False)
    gs = random_scene(40, seed=2, spread=0.35)
    cam = identity_camera(32, 32, 70.0)
    t1 = jnp.asarray(np.random.default_rng(7)
                     .uniform(0, 1, (3, 32, 32)).astype(np.float32))
    cam = cam.replace(image=t1)
    settings = RenderSettings(image_height=32, image_width=32)

    # replicated oracle (tile-sharded step, state P())
    mesh = make_mesh(data=2, tile=2)
    s_ref = create_train_state(jax.tree.map(jnp.copy, gs), cfg)
    step_ref = make_sharded_train_step(cfg, settings, mesh)
    batch = jax.tree.map(lambda *x: jnp.stack(x), cam, cam)
    s_ref, m_ref = step_ref(s_ref, batch)

    # gauss-sharded state
    s0 = create_train_state(jax.tree.map(jnp.copy, gs), cfg)
    s0 = shard_train_state(s0, mesh)
    # per-device shard of every [C,...] leaf is C/4 rows
    C = s0.gaussians.capacity
    xyz_shards = s0.gaussians.xyz.addressable_shards
    assert all(sh.data.shape[0] == C // 4 for sh in xyz_shards)
    mu_shards = s0.opt_state[0].mu["xyz"].addressable_shards
    assert all(sh.data.shape[0] == C // 4 for sh in mu_shards)

    step = make_gauss_sharded_train_step(cfg, settings, mesh, s0)
    s1, m1 = step(s0, batch)
    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m_ref["total_loss"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.gaussians.xyz),
                               np.asarray(s_ref.gaussians.xyz), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s1.gaussians.opacity),
                               np.asarray(s_ref.gaussians.opacity), atol=3e-3)
    # scale-sensitive: raw accumulated grad norms match (collective factors)
    np.testing.assert_allclose(np.asarray(s1.gaussians.xyz_gradient_accum),
                               np.asarray(s_ref.gaussians.xyz_gradient_accum),
                               atol=1e-6, rtol=1e-4)
    # the updated state keeps its sharding (no silent replication)
    assert s1.gaussians.xyz.sharding.spec == P(GAUSS_AXES)
    assert s1.opt_state[0].mu["xyz"].sharding.spec == P(GAUSS_AXES)

    # densify on the sharded state: force split/clone candidates
    import math as _m
    g1 = s1.gaussians
    scaling = g1.scaling.at[0:4].set(_m.log(0.05)).at[4:8].set(_m.log(0.005))
    accum = jnp.zeros_like(g1.xyz_gradient_accum).at[0:8].set(1.0)
    denom = jnp.zeros_like(g1.denom).at[0:8].set(1.0)
    s1 = s1.replace(gaussians=g1.replace(
        scaling=scaling, xyz_gradient_accum=accum, denom=denom))
    s1 = jax.device_put(s1, jax.tree.map(
        lambda s: NamedSharding(mesh, s), train_state_specs(s1, mesh)))
    dstep = make_gauss_sharded_densify_step(cfg, mesh, s1)
    s2, stats = dstep(s1, jax.random.PRNGKey(0), jnp.float32(1.0))
    assert int(stats["n_split"]) == 4 and int(stats["n_clone"]) == 4
    assert s2.gaussians.xyz.sharding.spec == P(GAUSS_AXES)
    assert int(s2.gaussians.num_alive()) == int(stats["n_alive"])


@requires_8
def test_gauss_sharded_step_distinct_cameras_matches_replicated():
    """Regression: with DISTINCT cameras along the data axis (what
    trainer.train() actually feeds), the gauss-sharded step must still
    reproduce the replicated oracle.  The original single post-projection
    all_gather over both mesh axes assembled a stream whose rows were
    projected under DIFFERENT cameras (each gid shard under its owner's
    camera) — silently wrong images/grads whenever data > 1; the step now
    gathers param rows over "data" first so each data slice projects every
    row under its own camera."""
    from mini3dgs_tpu.parallel.sharded import (make_gauss_sharded_train_step,
                                               shard_train_state)
    cfg = TrainingConfig(capacity=64, image_height=32, image_width=32,
                         use_pallas=False)
    gs = random_scene(40, seed=2, spread=0.35)
    rng = np.random.default_rng(7)
    cams = []
    for fov in (70.0, 50.0):   # genuinely different projections
        c = identity_camera(32, 32, fov)
        cams.append(c.replace(image=jnp.asarray(
            rng.uniform(0, 1, (3, 32, 32)).astype(np.float32))))
    batch = jax.tree.map(lambda *x: jnp.stack(x), *cams)
    mesh = make_mesh(data=2, tile=2)
    settings = RenderSettings(image_height=32, image_width=32)

    s_ref = create_train_state(jax.tree.map(jnp.copy, gs), cfg)
    s_ref, m_ref = make_sharded_train_step(cfg, settings, mesh)(s_ref, batch)

    s0 = shard_train_state(create_train_state(jax.tree.map(jnp.copy, gs),
                                              cfg), mesh)
    s1, m1 = make_gauss_sharded_train_step(cfg, settings, mesh, s0)(s0, batch)
    np.testing.assert_allclose(float(m1["total_loss"]),
                               float(m_ref["total_loss"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s1.gaussians.xyz),
                               np.asarray(s_ref.gaussians.xyz), atol=2e-5)
    np.testing.assert_allclose(np.asarray(s1.gaussians.xyz_gradient_accum),
                               np.asarray(s_ref.gaussians.xyz_gradient_accum),
                               atol=1e-6, rtol=1e-4)


@requires_8
def test_trainer_with_gauss_sharded_state(tmp_path):
    """GaussianTrainer orchestration with shard_gauss_state: full loop incl.
    densify on a sharded state."""
    from jax.sharding import PartitionSpec as P
    from tests.test_trainer_integration import build_trainer
    trainer = build_trainer(tmp_path, iterations=6, mesh_data=2, mesh_tile=2,
                            shard_gauss_state=True)
    assert trainer.state.gaussians.xyz.sharding.spec == P(GAUSS_AXES)
    trainer.train(iterations=6)
    assert trainer.iteration == 6
    assert np.isfinite(trainer.train_losses[-1] if trainer.train_losses else 0.0)
    # state still sharded after steps + densify
    assert trainer.state.gaussians.xyz.sharding.spec == P(GAUSS_AXES)
    assert trainer.state.opt_state[0].mu["xyz"].sharding.spec == P(GAUSS_AXES)


@requires_8
def test_gauss_sharded_large_capacity_smoke():
    """1M-slot capacity with sharded state on the virtual mesh: the step runs
    with per-device param memory C/8 (the Pallas interpret path keeps the
    instance stream small so this stays CPU-feasible)."""
    from mini3dgs_tpu.parallel.sharded import (make_gauss_sharded_train_step,
                                               shard_train_state)
    C = 1 << 20
    cfg = TrainingConfig(capacity=C, image_height=32, image_width=32,
                         use_pallas=True, max_instances=4096,
                         gaussian_chunk=32)
    import math as _m
    rng = np.random.default_rng(0)
    n = 512
    from mini3dgs_tpu.core.gaussians import Gaussians
    xyz = np.zeros((C, 3), np.float32)
    xyz[:n] = (rng.random((n, 3)) - 0.5) * 1.4
    fdc = np.zeros((C, 1, 3), np.float32)
    fdc[:n] = rng.random((n, 1, 3))
    scal = np.full((C, 3), -10.0, np.float32)
    scal[:n] = _m.log(0.05)
    rot = np.zeros((C, 4), np.float32)
    rot[:, 0] = 1.0
    opac = np.full((C, 1), -10.0, np.float32)
    opac[:n] = -1.0
    alive = np.zeros(C, bool)
    alive[:n] = True
    gs = Gaussians(xyz=jnp.asarray(xyz), features_dc=jnp.asarray(fdc),
                   features_rest=jnp.zeros((C, 15, 3), jnp.float32),
                   scaling=jnp.asarray(scal), rotation=jnp.asarray(rot),
                   opacity=jnp.asarray(opac), alive=jnp.asarray(alive),
                   xyz_gradient_accum=jnp.zeros(C), denom=jnp.zeros(C),
                   max_radii2D=jnp.zeros(C))
    cam = identity_camera(32, 32, 70.0)
    cam = cam.replace(image=jnp.zeros((3, 32, 32)))
    settings = RenderSettings(image_height=32, image_width=32,
                              use_pallas=True, max_instances=4096,
                              gaussian_chunk=32)
    mesh = make_mesh(data=2, tile=2)
    state = shard_train_state(create_train_state(gs, cfg), mesh)
    assert all(sh.data.shape[0] == C // 4
               for sh in state.gaussians.xyz.addressable_shards)
    step = make_gauss_sharded_train_step(cfg, settings, mesh, state)
    batch = jax.tree.map(lambda *x: jnp.stack(x), cam, cam)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))
    assert np.all(np.isfinite(np.asarray(state.gaussians.xyz[:n])))


@requires_8
def test_sharded_checkpoint_roundtrip(tmp_path):
    """A gauss-sharded TrainState round-trips through orbax without a host-0
    gather: restored leaves come back with the template's shardings and
    exact values."""
    from jax.sharding import PartitionSpec as P
    from mini3dgs_tpu.parallel.sharded import shard_train_state
    from mini3dgs_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    cfg = TrainingConfig(capacity=64, image_height=32, image_width=32,
                         use_pallas=False)
    gs = random_scene(40, seed=2, spread=0.35)
    mesh = make_mesh(data=2, tile=2)
    state = shard_train_state(create_train_state(gs, cfg), mesh)
    save_checkpoint(str(tmp_path), 7, state)

    template = jax.tree.map(jnp.zeros_like, state)  # keeps shardings
    restored = load_checkpoint(str(tmp_path), 7, template)
    assert restored.gaussians.xyz.sharding.spec == P(GAUSS_AXES)
    assert restored.opt_state[0].mu["xyz"].sharding.spec == P(GAUSS_AXES)
    np.testing.assert_array_equal(np.asarray(restored.gaussians.xyz),
                                  np.asarray(state.gaussians.xyz))
    np.testing.assert_array_equal(np.asarray(restored.gaussians.alive),
                                  np.asarray(state.gaussians.alive))
    np.testing.assert_array_equal(np.asarray(restored.opt_state[0].mu["xyz"]),
                                  np.asarray(state.opt_state[0].mu["xyz"]))
