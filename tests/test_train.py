"""End-to-end training slice tests (BASELINE config #1: random-init Gaussians,
one small camera, L1+D-SSIM loss, Adam step) + densification semantics
(reference `tests/test_gaussian_model.py:91-140`: split/clone point-count
deltas) + LR schedule + checkpoint round-trip."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mini3dgs_tpu.config import TrainingConfig
from mini3dgs_tpu.core.camera import Camera
from mini3dgs_tpu.core.gaussians import create_from_random
from mini3dgs_tpu.ops.renderer import RenderSettings, render
from mini3dgs_tpu.train import density
from mini3dgs_tpu.train.optimizer import cosine_delay_lr
from mini3dgs_tpu.train.trainer import (TrainState, create_train_state,
                                        make_densify_step, make_train_step)


def small_config(**kw):
    defaults = dict(capacity=128, iterations=50, image_height=32,
                    image_width=32, use_pallas=False,
                    densify_from_iter=1, densify_until_iter=1000,
                    densify_interval=10)
    defaults.update(kw)
    return TrainingConfig(**defaults)


def make_scene(capacity=128, n=64, seed=0):
    g = create_from_random(jax.random.PRNGKey(seed), n, scene_extent=1.0,
                           capacity=capacity)
    cam = Camera.create(0, np.eye(3), np.array([0, 0, -3.0]),
                        math.radians(60), math.radians(60),
                        width=32, height=32)
    return g, cam


def test_lr_schedule_matches_reference_formula():
    lr = float(cosine_delay_lr(0, 1.6e-4, 1.6e-6, 0, 0.01, 30000))
    np.testing.assert_allclose(lr, 1.6e-4, rtol=1e-6)
    lr_end = float(cosine_delay_lr(30000, 1.6e-4, 1.6e-6, 0, 0.01, 30000))
    np.testing.assert_allclose(lr_end, 1.6e-6, rtol=1e-5)
    t = 10000
    expected = 1.6e-6 + (1.6e-4 - 1.6e-6) * 0.5 * (1 + math.cos(math.pi * t / 30000))
    np.testing.assert_allclose(float(cosine_delay_lr(t, 1.6e-4, 1.6e-6, 0, 0.01, 30000)),
                               expected, rtol=1e-6)
    # delay ramp
    lr_delayed = float(cosine_delay_lr(0, 1.6e-4, 1.6e-6, 100, 0.01, 30000))
    np.testing.assert_allclose(lr_delayed, 1.6e-4 * 0.01, rtol=1e-5)


def test_train_step_reduces_loss():
    cfg = small_config()
    g, cam = make_scene()
    # target: a render of a *different* gaussian set
    g_target, _ = make_scene(seed=7)
    settings = RenderSettings(image_height=32, image_width=32)
    target = render(g_target, cam, settings)["image"]
    cam = cam.replace(image=target)

    state = create_train_state(g, cfg)
    step = make_train_step(cfg, settings)
    state, m0 = step(state, cam)
    first = float(m0["total_loss"])
    for _ in range(30):
        state, m = step(state, cam)
    last = float(m["total_loss"])
    assert last < first, (first, last)
    assert int(state.step) == 31


def test_densify_split_and_clone_counts():
    """Split: parent removed, two children added => +k.  Clone: +k.
    (reference tests/test_gaussian_model.py:128-140)."""
    cfg = small_config(densify_grad_threshold=1e-4)
    g, _ = make_scene(capacity=256, n=32)
    n0 = int(g.num_alive())
    extent = 1.0
    # Force candidacy: large accumulated grads on slots 0..3 (split: big sigma)
    # and 4..7 (clone: small sigma).
    big = math.log(0.05 * extent)    # mean sigma > 0.03*extent
    small = math.log(0.005 * extent)  # mean sigma < 0.01*extent
    scaling = g.scaling
    scaling = scaling.at[0:4].set(big).at[4:8].set(small)
    accum = jnp.zeros_like(g.xyz_gradient_accum).at[0:8].set(1.0)
    denom = jnp.zeros_like(g.denom).at[0:8].set(1.0)
    g = g.replace(scaling=scaling, xyz_gradient_accum=accum, denom=denom)

    res = density.densify_and_prune(g, jax.random.PRNGKey(0), extent, cfg)
    assert int(res.n_split) == 4
    assert int(res.n_clone) == 4
    assert int(res.n_dropped) == 0
    # split: -4 parents +8 children; clone: +4 => net +8
    n_pruned = int(res.n_pruned)
    assert int(res.gaussians.num_alive()) == n0 + 8 - n_pruned

    # children of splits carry 0.75*sigma
    # (hard to trace exact slots; check some slot has sigma == 0.75*exp(big))
    sig = np.asarray(res.gaussians.get_scaling)
    alive = np.asarray(res.gaussians.alive)
    assert np.any(np.isclose(sig[alive], 0.75 * math.exp(big), rtol=1e-4))


def test_densify_prune_low_opacity():
    cfg = small_config()
    g, _ = make_scene(capacity=128, n=32)
    # opacity logit -10 => sigmoid ~ 0 < 0.01 threshold for slots 0..9
    g = g.replace(opacity=g.opacity.at[0:10].set(-10.0))
    res = density.densify_and_prune(g, jax.random.PRNGKey(0), 1.0, cfg)
    assert int(res.n_pruned) >= 10
    assert int(res.gaussians.num_alive()) == 32 - int(res.n_pruned)


def test_densify_capacity_overflow_drops():
    cfg = small_config(densify_grad_threshold=1e-6)
    g, _ = make_scene(capacity=64, n=60)
    extent = 1.0
    g = g.replace(
        scaling=jnp.full_like(g.scaling, math.log(0.05 * extent)),
        xyz_gradient_accum=jnp.where(g.alive, 1.0, 0.0),
        denom=jnp.where(g.alive, 1.0, 0.0))
    res = density.densify_and_prune(g, jax.random.PRNGKey(0), extent, cfg)
    assert int(res.n_dropped) > 0
    assert int(res.gaussians.num_alive()) <= 64


def test_adam_state_reset_on_densify():
    cfg = small_config(densify_grad_threshold=1e-4)
    g, cam = make_scene(capacity=256, n=32)
    target = jnp.zeros((3, 32, 32))
    cam = cam.replace(image=target)
    settings = RenderSettings(image_height=32, image_width=32)
    state = create_train_state(g, cfg)
    step = make_train_step(cfg, settings)
    for _ in range(3):
        state, _ = step(state, cam)
    dstep = make_densify_step(cfg)
    state2, stats = dstep(state, jax.random.PRNGKey(1), jnp.float32(1.0))
    mu = state2.opt_state[0].mu
    changed = None
    # find some changed slot: compare alive masks
    a0 = np.asarray(state.gaussians.alive)
    a1 = np.asarray(state2.gaussians.alive)
    newly = np.nonzero(a1 & ~a0)[0]
    if len(newly):
        assert np.all(np.asarray(mu["xyz"])[newly] == 0)


def test_dead_slots_do_not_drift():
    cfg = small_config()
    g, cam = make_scene()
    cam = cam.replace(image=jnp.zeros((3, 32, 32)))
    settings = RenderSettings(image_height=32, image_width=32)
    state = create_train_state(g, cfg)
    step = make_train_step(cfg, settings)
    dead = ~np.asarray(state.gaussians.alive)
    xyz_before = np.asarray(state.gaussians.xyz)[dead]
    for _ in range(5):
        state, _ = step(state, cam)
    xyz_after = np.asarray(state.gaussians.xyz)[dead]
    np.testing.assert_array_equal(xyz_before, xyz_after)


def test_checkpoint_roundtrip(tmp_path):
    from mini3dgs_tpu.train.checkpoint import (latest_checkpoint_iteration,
                                               load_checkpoint, save_checkpoint)
    cfg = small_config()
    g, cam = make_scene()
    state = create_train_state(g, cfg)
    save_checkpoint(str(tmp_path), 5, state)
    assert latest_checkpoint_iteration(str(tmp_path)) == 5
    # perturb, then restore
    state2 = state.replace(step=jnp.int32(99))
    restored = load_checkpoint(str(tmp_path), 5, state2)
    assert int(restored.step) == 0
    np.testing.assert_array_equal(np.asarray(restored.gaussians.xyz),
                                  np.asarray(state.gaussians.xyz))


def test_grad_stats_accumulate_and_reset():
    """Densification statistics accumulate a positional-grad norm per
    visible step and reset after densify (reference buffers
    gaussian_model.py:29-31; the norm itself comes from
    density.densify_stat_norm — viewspace by default, world optional)."""
    from mini3dgs_tpu.train.density import accumulate_grad_stats
    g, _ = make_scene(capacity=64, n=16)
    norm = jnp.full((64,), math.sqrt(3 * 0.09))
    radii = jnp.full((64,), 5.0)
    vis = jnp.zeros((64,), bool).at[:16].set(True)
    g = accumulate_grad_stats(g, norm, radii, vis)
    g = accumulate_grad_stats(g, norm, radii, vis)
    acc = np.asarray(g.xyz_gradient_accum)
    den = np.asarray(g.denom)
    np.testing.assert_allclose(acc[:16], 2 * math.sqrt(3 * 0.09), rtol=1e-5)
    np.testing.assert_allclose(den[:16], 2.0)
    np.testing.assert_allclose(acc[16:], 0.0)
    np.testing.assert_allclose(np.asarray(g.max_radii2D)[:16], 5.0)
    cfg = small_config()
    res = density.densify_and_prune(g, jax.random.PRNGKey(0), 1.0, cfg)
    np.testing.assert_allclose(np.asarray(res.gaussians.xyz_gradient_accum), 0.0)
    np.testing.assert_allclose(np.asarray(res.gaussians.denom), 0.0)


def test_densify_stat_norm_spaces():
    """densify_stat_norm: viewspace (default) is the NDC-scaled means2D grad
    norm (canonical 3DGS units for tau=2e-4); "world" is the reference's
    literal ||grad_xyz||."""
    import dataclasses
    from mini3dgs_tpu.train.density import densify_stat_norm
    cfg = small_config()
    xyz_g = jnp.ones((8, 3)) * 0.3
    vs_g = jnp.ones((8, 2)) * 1e-3
    vs = densify_stat_norm(cfg, xyz_g, vs_g, 200, 100)
    np.testing.assert_allclose(
        np.asarray(vs), math.sqrt(2) * 1e-3 * 100.0, rtol=1e-6)
    wcfg = dataclasses.replace(cfg, densify_grad_space="world")
    w = densify_stat_norm(wcfg, xyz_g, vs_g, 200, 100)
    np.testing.assert_allclose(np.asarray(w), math.sqrt(3 * 0.09), rtol=1e-6)


def test_train_step_accumulates_viewspace_stats():
    """A train step under the default viewspace mode accumulates nonzero
    stats for visible gaussians, and the statistic really is the viewspace
    probe gradient (independent of a pure world-space translation symmetry
    argument: it must differ from the world-grad norm in general)."""
    from mini3dgs_tpu.train.trainer import create_train_state, make_train_step
    g, cam = make_scene(capacity=64, n=16)
    target = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (3, cam.height, cam.width))
        .astype(np.float32))
    cam = cam.replace(image=target)
    cfg = small_config()
    settings = RenderSettings(image_height=cam.height, image_width=cam.width)
    state = create_train_state(g, cfg)
    state, _ = make_train_step(cfg, settings)(state, cam)
    acc = np.asarray(state.gaussians.xyz_gradient_accum)
    vis = np.asarray(state.gaussians.denom) > 0
    assert vis[:16].any()
    assert (acc[vis] > 0).all()
    assert np.all(acc[~np.asarray(state.gaussians.alive)] == 0)


def test_big_point_prune():
    """Canonical big-point prunes (screen radius > prune_max_screen_size,
    world sigma > prune_max_world_size * extent) fire only when the traced
    size_prune flag is set (post-first-opacity-reset gating)."""
    g, _ = make_scene(capacity=64, n=16)
    # gaussian 0: huge world size; gaussian 1: huge window screen radius
    g = g.replace(
        scaling=g.scaling.at[0].set(jnp.log(0.5)),
        max_radii2D=g.max_radii2D.at[1].set(100.0))
    cfg = small_config(prune_max_screen_size=20.0, prune_max_world_size=0.1)
    key = jax.random.PRNGKey(0)
    res_off = density.densify_and_prune(g, key, 1.0, cfg, size_prune=False)
    assert bool(res_off.gaussians.alive[0]) and bool(res_off.gaussians.alive[1])
    res_on = density.densify_and_prune(g, key, 1.0, cfg, size_prune=True)
    assert not bool(res_on.gaussians.alive[0])   # world-size pruned
    assert not bool(res_on.gaussians.alive[1])   # screen-size pruned
    assert bool(res_on.gaussians.alive[2])       # normal ones survive


def test_render_drops_metric_surfaces_overflow():
    """An undersized instance stream must be OBSERVABLE: the train step
    reports render_drops > 0 instead of silently degrading gradients."""
    from mini3dgs_tpu.train.trainer import create_train_state, make_train_step
    g, cam = make_scene(capacity=128, n=64)
    target = jnp.zeros((3, cam.height, cam.width), jnp.float32)
    cam = cam.replace(image=target)
    cfg = small_config()
    settings = RenderSettings(image_height=cam.height, image_width=cam.width,
                              use_pallas=True, max_instances=32,
                              gaussian_chunk=32)
    state = create_train_state(g, cfg)
    state, metrics = make_train_step(cfg, settings)(state, cam)
    assert int(metrics["render_drops"]) > 0
    assert np.all(np.isfinite(np.asarray(state.gaussians.xyz)))


def test_should_densify_cadence():
    cfg = small_config(densify_from_iter=500, densify_until_iter=15000,
                       densify_interval=100)
    assert not density.should_densify(499, cfg)
    assert density.should_densify(500, cfg)
    assert not density.should_densify(550, cfg)
    assert density.should_densify(600, cfg)
    assert density.should_densify(15000, cfg)
    assert not density.should_densify(15100, cfg)


def test_exposure_compensation_learns_color_shift():
    """With use_exposure, the per-camera affine transform absorbs a global
    color shift of the target (train/exposure.py); identity init is a
    no-op on the loss."""
    from mini3dgs_tpu.train.trainer import make_train_step
    from mini3dgs_tpu.train.exposure import apply_exposure, init_exposure

    g, cam = make_scene(seed=3)
    settings = RenderSettings(image_height=32, image_width=32)
    # target = rendered scene, globally darkened and tinted
    base = render(g, cam, settings)["image"]
    target = jnp.clip(0.6 * base + 0.08, 0.0, 1.0)
    cam = cam.replace(image=target)

    # identity exposure leaves the image unchanged
    M = init_exposure(3)
    np.testing.assert_allclose(np.asarray(apply_exposure(M[1], base)),
                               np.asarray(base), atol=1e-6)

    cfg = small_config(use_exposure=True, exposure_lr=5e-2)
    state = create_train_state(g, cfg, n_cameras=3)
    assert state.exposure is not None and state.exposure.shape == (3, 3, 4)
    step = make_train_step(cfg, settings)
    losses = []
    for _ in range(40):
        state, m = step(state, cam, jnp.int32(1))
        losses.append(float(m["total_loss"]))
    # exposure matrix moved away from identity for the trained camera only
    exp = np.asarray(state.exposure)
    assert np.abs(exp[1] - np.asarray(M[1])).max() > 1e-2
    np.testing.assert_array_equal(exp[0], np.asarray(M[0]))
    np.testing.assert_array_equal(exp[2], np.asarray(M[2]))
    assert losses[-1] < 0.5 * losses[0]


def test_densify_preserves_exposure_state():
    """Densification must carry exposure + its Adam state through (a dropped
    exposure silently disables exposure training from the first densify)."""
    cfg = small_config(use_exposure=True, densify_grad_threshold=1e-4)
    g, cam = make_scene(capacity=256, n=32)
    target = jnp.zeros((3, 32, 32))
    cam = cam.replace(image=target)
    settings = RenderSettings(image_height=32, image_width=32)
    state = create_train_state(g, cfg, n_cameras=3)
    step = make_train_step(cfg, settings)
    for _ in range(3):
        state, _ = step(state, cam, jnp.int32(1))
    assert state.exposure is not None
    exp_before = np.asarray(state.exposure)
    state, _ = make_densify_step(cfg)(state, jax.random.PRNGKey(1),
                                      jnp.float32(1.0))
    assert state.exposure is not None and state.exp_opt_state is not None
    np.testing.assert_array_equal(np.asarray(state.exposure), exp_before)
    # ... and the post-densify train step still trains exposure
    state, _ = step(state, cam, jnp.int32(1))
    assert np.abs(np.asarray(state.exposure) - exp_before).max() > 0


def test_prune_threshold_comes_from_config():
    """`prune_opacity_threshold` is wired (reference default.yaml:34); a
    threshold above a slot's opacity prunes it, a lower one keeps it."""
    g, _ = make_scene(capacity=128, n=32)
    # slot 0 at sigmoid(-3) ~ 0.047
    g = g.replace(opacity=g.opacity.at[0].set(-3.0))
    res_hi = density.densify_and_prune(
        g, jax.random.PRNGKey(0), 1.0,
        small_config(prune_opacity_threshold=0.05))
    res_lo = density.densify_and_prune(
        g, jax.random.PRNGKey(0), 1.0,
        small_config(prune_opacity_threshold=0.01))
    assert not bool(res_hi.gaussians.alive[0])
    assert bool(res_lo.gaussians.alive[0])


def test_prune_step_cadence_and_adam_reset():
    """Standalone prune at `prune_interval` (reference default.yaml:35):
    cadence excludes densify iterations, and newly-dead slots get zeroed
    Adam moments so they never drift."""
    cfg = small_config(prune_interval=50, densify_from_iter=1,
                       densify_until_iter=1000, densify_interval=100)
    assert density.should_prune(50, cfg)
    assert not density.should_prune(100, cfg)   # densify handles it
    assert not density.should_prune(55, cfg)
    assert not density.should_prune(50, small_config(prune_interval=0))

    from mini3dgs_tpu.train.trainer import make_prune_step
    g, cam = make_scene(capacity=128, n=32)
    cam = cam.replace(image=jnp.zeros((3, 32, 32)))
    settings = RenderSettings(image_height=32, image_width=32)
    state = create_train_state(g, cfg)
    step = make_train_step(cfg, settings)
    for _ in range(3):
        state, _ = step(state, cam)  # build up nonzero Adam moments
    # push slots 0..4 below the prune threshold
    gs = state.gaussians
    state = state.replace(gaussians=gs.replace(
        opacity=gs.opacity.at[0:5].set(-10.0)))
    state2, n_pruned = make_prune_step(cfg)(state)
    assert int(n_pruned) >= 5
    assert not np.any(np.asarray(state2.gaussians.alive[0:5]))
    mu = state2.opt_state[0].mu
    assert np.all(np.asarray(mu["xyz"])[0:5] == 0)
    # dead slots stay put under further steps
    xyz_before = np.asarray(state2.gaussians.xyz)[0:5]
    state3, _ = step(state2, cam)
    np.testing.assert_array_equal(np.asarray(state3.gaussians.xyz)[0:5],
                                  xyz_before)


def test_checkpoint_roundtrip_exposure(tmp_path):
    """Exposure + its optimizer state survive save/load (resumed
    exposure-enabled runs must not lose the per-camera affines)."""
    from mini3dgs_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    cfg = small_config(use_exposure=True)
    g, cam = make_scene()
    cam = cam.replace(image=jnp.zeros((3, 32, 32)))
    settings = RenderSettings(image_height=32, image_width=32)
    state = create_train_state(g, cfg, n_cameras=3)
    step = make_train_step(cfg, settings)
    for _ in range(3):
        state, _ = step(state, cam, jnp.int32(1))
    save_checkpoint(str(tmp_path), 3, state)
    template = create_train_state(
        jax.tree.map(jnp.copy, state.gaussians), cfg, n_cameras=3)
    restored = load_checkpoint(str(tmp_path), 3, template)
    assert restored.exposure is not None
    np.testing.assert_array_equal(np.asarray(restored.exposure),
                                  np.asarray(state.exposure))
    # Adam moments of the exposure optimizer round-trip too
    mu0 = np.asarray(state.exp_opt_state[0].mu)
    mu1 = np.asarray(restored.exp_opt_state[0].mu)
    np.testing.assert_array_equal(mu1, mu0)


def test_checkpoint_capacity_metadata_and_grown_resume(tmp_path):
    """A checkpoint saved after capacity growth restores into a trainer
    configured with the original (smaller) capacity (trainer grows its
    template from checkpoint metadata before loading)."""
    from mini3dgs_tpu.train.checkpoint import (checkpoint_capacity,
                                               save_checkpoint)
    from mini3dgs_tpu.train.trainer import grow_capacity
    cfg = small_config()
    g, cam = make_scene(capacity=128, n=64)
    state = create_train_state(g, cfg)
    state = grow_capacity(state, 256)
    save_checkpoint(str(tmp_path / "run"), 4, state)
    assert checkpoint_capacity(str(tmp_path / "run"), 4) == 256
    assert checkpoint_capacity(str(tmp_path / "run"), 99) is None

    from mini3dgs_tpu.data.dataset import RandomDataset
    from mini3dgs_tpu.train.trainer import GaussianTrainer
    cfg2 = small_config(capacity=128, output_path=str(tmp_path / "run"))
    ds = RandomDataset(n_cameras=2, width=32, height=32)
    ds.load_cameras()
    settings = RenderSettings(image_height=32, image_width=32)
    tr = GaussianTrainer(cfg2, settings)
    g2, _ = make_scene(capacity=128, n=64)
    tr.setup(dataset=ds, gaussians=g2)
    tr.load_checkpoint(4)
    assert tr.state.gaussians.capacity == 256
    np.testing.assert_array_equal(np.asarray(tr.state.gaussians.xyz),
                                  np.asarray(state.gaussians.xyz))


def test_grow_capacity_names_optimizer_layout_contract():
    """grow_capacity pads optax moments through state.opt_state[0]; if the
    make_optimizer chain is ever reordered so ScaleByAdamState is no longer
    first, it must fail loudly naming the expectation, not pad a wrong leaf
    (VERDICT r2 weak #7)."""
    from mini3dgs_tpu.train.trainer import grow_capacity
    cfg = small_config()
    g, _ = make_scene(capacity=128, n=64)
    state = create_train_state(g, cfg)
    tampered = state.replace(opt_state=(object(),) + tuple(state.opt_state[1:]))
    with pytest.raises(TypeError, match="ScaleByAdamState"):
        grow_capacity(tampered, 256)
