"""Ring-exchange raster (parallel/ring.py) vs the one-shot all_to_all route.

The ring partitions instances by depth-rank range and composites range s
strictly behind ranges < s with per-pixel transmittance chained through the
kernels' t0 input.  Output must match the all_to_all route (and the
single-device render) up to f32 association at segment boundaries: the
monolithic stream groups the per-chunk log-space transmittance prefix
differently than the per-segment streams, so bit-identity is not expected,
but everything else is the same math on the same sorted multiset.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mini3dgs_tpu.config import TrainingConfig
from mini3dgs_tpu.ops.renderer import RenderSettings, render
from mini3dgs_tpu.parallel.mesh import make_mesh
from mini3dgs_tpu.parallel.sharded import (make_sharded_render,
                                           make_sharded_train_step)
from mini3dgs_tpu.train.trainer import create_train_state
from tests.test_raster_pallas import make_gaussians, random_scene, rotated_scene
from tests.test_render_golden import identity_camera


requires_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _settings(cam, ring, **kw):
    return RenderSettings(image_height=cam.height, image_width=cam.width,
                          use_pallas=True, max_instances=4096,
                          gaussian_chunk=32, ring=ring, **kw)


@requires_8
@pytest.mark.parametrize("aniso", [False, True])
def test_ring_render_matches_route_and_single(aniso):
    """Ring vs the all_to_all route is the apples-to-apples gate (identical
    sharded projection + instance multisets; only chunk-boundary f32
    association differs).  The vs-single gate is tight for isotropic scenes
    only: the mesh path's slot-sharded projection compiles different XLA
    fusions than the [C]-shaped replicated projection, and the resulting
    f32-level covariance wiggle is amplified by the 2x2 inverse's
    conditioning on strongly anisotropic splats (measured ~6e-3 conic ->
    ~8e-3 image on rotated_scene, identically for the golden path and the
    all_to_all route — a property of sharded projection, not the ring)."""
    cam = identity_camera(64, 64, 70.0)
    gs = rotated_scene(60, seed=11) if aniso else random_scene(60, seed=4)
    mesh = make_mesh(data=1, tile=4)
    out_single = render(gs, cam, _settings(cam, ring=False))
    out_route = make_sharded_render(_settings(cam, ring=False), mesh)(gs, cam)
    out_ring = make_sharded_render(_settings(cam, ring=True), mesh)(gs, cam)
    # `depth` is D/(A+1e-6): where A ~ 0 it is a ratio of near-zeros and the
    # conic wiggle flips it arbitrarily — compare the raw accumulator
    # D = depth * (alpha + 1e-6) instead (linear, well-conditioned).
    def field(out, k):
        if k == "depth":
            return np.asarray(out["depth"]) * (np.asarray(out["alpha"])
                                               + 1e-6)
        return np.asarray(out[k])

    for k in ("image", "alpha", "depth"):
        np.testing.assert_allclose(field(out_ring, k), field(out_route, k),
                                   atol=2e-5,
                                   err_msg=f"ring vs all_to_all: {k}")
        np.testing.assert_allclose(
            field(out_ring, k), field(out_single, k),
            atol=2e-2 if aniso else 2e-5,
            err_msg=f"ring vs single: {k}")


@requires_8
def test_ring_transmittance_chain_saturating():
    """Deep co-centered high-opacity stack: early stop fires mid-stream, so
    segment boundaries cross saturated pixels — the t0 chain must carry the
    global accumulated alpha into later ring steps (gate + early exit)."""
    n = 48
    rng = np.random.default_rng(9)
    xyz = np.concatenate([rng.uniform(-0.05, 0.05, (n, 2)),
                          np.linspace(0.8, 2.4, n)[:, None]], axis=1)
    sig = np.full((n, 3), 0.25, np.float32)
    col = rng.uniform(0, 1, (n, 3))
    op = np.full(n, 0.7, np.float32)
    gs = make_gaussians(xyz.astype(np.float32), sig, col, op)
    cam = identity_camera(64, 64, 70.0)
    mesh = make_mesh(data=1, tile=4)
    out_single = render(gs, cam, _settings(cam, ring=False))
    out_ring = make_sharded_render(_settings(cam, ring=True), mesh)(gs, cam)
    np.testing.assert_allclose(np.asarray(out_ring["image"]),
                               np.asarray(out_single["image"]), atol=3e-5)
    np.testing.assert_allclose(np.asarray(out_ring["alpha"]),
                               np.asarray(out_single["alpha"]), atol=3e-5)
    # the scene actually saturates somewhere (early-stop path exercised)
    assert float(np.max(np.asarray(out_single["alpha"]))) > 0.995


@requires_8
def test_ring_train_step_matches_route():
    """One full sharded train step (loss, grads through the ppermute /
    all_to_all transposes, Adam) with ring=True must match ring=False."""
    cfg = TrainingConfig(capacity=64, image_height=32, image_width=32,
                         use_pallas=True, max_instances=2048,
                         gaussian_chunk=32, lambda_dssim=0.2)
    gs = random_scene(40, seed=2, spread=0.35)
    cam = identity_camera(32, 32, 70.0)
    target = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (3, 32, 32)).astype(np.float32))
    cam = cam.replace(image=target)
    base = RenderSettings(image_height=32, image_width=32, use_pallas=True,
                          max_instances=2048, gaussian_chunk=32)
    mesh = make_mesh(data=1, tile=2)

    state1 = create_train_state(gs, cfg)
    state2 = create_train_state(jax.tree.map(jnp.copy, gs), cfg)
    cams = jax.tree.map(lambda x: jnp.stack([x]), cam)
    state1, m1 = make_sharded_train_step(cfg, base, mesh)(state1, cams)
    state2, m2 = make_sharded_train_step(
        cfg, base.replace(ring=True), mesh)(state2, cams)

    np.testing.assert_allclose(float(m2["total_loss"]),
                               float(m1["total_loss"]), rtol=1e-5)
    # Adam's first step is ~sign(g) * lr, which amplifies f32 association
    # noise at segment boundaries; tolerances scale with per-group LRs.
    np.testing.assert_allclose(np.asarray(state2.gaussians.xyz),
                               np.asarray(state1.gaussians.xyz), atol=2e-5)
    np.testing.assert_allclose(np.asarray(state2.gaussians.opacity),
                               np.asarray(state1.gaussians.opacity), atol=4e-3)
    np.testing.assert_allclose(np.asarray(state2.gaussians.features_dc),
                               np.asarray(state1.gaussians.features_dc),
                               atol=4e-4)


@requires_8
def test_ring_with_gauss_sharded_state():
    """Ring exchange composes with the gauss-sharded (TP) step: the model
    and Adam state stay sharded over the gauss axis while the raster runs
    the ring schedule; loss matches the all_to_all route."""
    from mini3dgs_tpu.parallel.sharded import (make_gauss_sharded_train_step,
                                               shard_train_state)
    from mini3dgs_tpu.train.trainer import create_train_state
    cfg = TrainingConfig(capacity=64, image_height=32, image_width=32,
                         use_pallas=True, max_instances=2048,
                         gaussian_chunk=32, mesh_data=1, mesh_tile=2,
                         shard_gauss_state=True)
    gs = random_scene(40, seed=2, spread=0.35)
    cam = identity_camera(32, 32, 70.0)
    target = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (3, 32, 32)).astype(np.float32))
    cam = cam.replace(image=target)
    cams = jax.tree.map(lambda x: jnp.stack([x]), cam)
    base = RenderSettings(image_height=32, image_width=32, use_pallas=True,
                          max_instances=2048, gaussian_chunk=32)
    mesh = make_mesh(data=1, tile=2)
    losses = {}
    for ring in (False, True):
        st = shard_train_state(
            create_train_state(jax.tree.map(jnp.copy, gs), cfg), mesh)
        step = make_gauss_sharded_train_step(
            cfg, base.replace(ring=ring), mesh, st)
        st, m = step(st, cams)
        losses[ring] = float(m["total_loss"])
        assert np.isfinite(losses[ring])
    np.testing.assert_allclose(losses[True], losses[False], rtol=1e-5)


@requires_8
@pytest.mark.parametrize("aniso", [False, True])
def test_ring_reshard_output_bitwise_matches_v1(aniso):
    """Ring v2 (rank-resharded origin, binning.rank_reshard_rows +
    bin_gaussians_ring_origin_resharded): every per-Gaussian stage runs on
    C/n rows, but each origin emits the identical candidate multiset with
    identical (tile*C + global rank) keys — so segments, kernel inputs, and
    therefore the rendered band must be BIT-identical to ring v1."""
    cam = identity_camera(64, 64, 70.0)
    gs = rotated_scene(48) if aniso else random_scene(48, seed=3, spread=0.35)
    mesh = make_mesh(data=1, tile=4)
    st = _settings(cam, ring=True)
    o1 = make_sharded_render(st, mesh)(gs, cam)
    o2 = make_sharded_render(st.replace(ring_reshard=True), mesh)(gs, cam)
    for k in ("image", "alpha", "depth"):
        np.testing.assert_array_equal(np.asarray(o1[k]), np.asarray(o2[k]))


@requires_8
def test_ring_reshard_grads_match_v1():
    """Cotangents must route back through the reshard all_to_all's
    transpose and the scatter-free _take_rows VJP to the gid owners —
    matching ring v1's gradients up to f32 association in the transpose
    reductions (different summation grouping, same terms)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from mini3dgs_tpu.parallel.sharded import _render_band

    cam = identity_camera(64, 64, 70.0)
    gs = random_scene(48, seed=3, spread=0.35)
    mesh = make_mesh(data=1, tile=4)

    def grads(st):
        def f(params):
            def loss(p):
                g = gs.with_params(p)
                row0 = jax.lax.axis_index("tile") * 16
                out = _render_band(g, cam, st, 16, row0,
                                   shard_axis="tile", n_shards=4)
                return jax.lax.psum(
                    jnp.square(out["image"]).sum()
                    + 0.01 * out["depth"].sum(), "tile")
            gr = jax.grad(loss)(params)
            return jax.tree.map(
                lambda x: jax.lax.pmean(x, ("data", "tile")), gr)
        return jax.jit(shard_map(f, mesh=mesh, in_specs=(P(),),
                                 out_specs=P(), check_vma=False))(gs.params())

    st = _settings(cam, ring=True)
    g1, g2 = grads(st), grads(st.replace(ring_reshard=True))
    for k in g1:
        a, b = np.asarray(g1[k]), np.asarray(g2[k])
        tol = 1e-5 * max(float(np.abs(a).max()), 1e-3)
        np.testing.assert_allclose(b, a, atol=tol, err_msg=k)


@requires_8
def test_ring_reshard_overflow_finite():
    """v2 under segment overflow: finite image, drops surfaced."""
    cam = identity_camera(64, 64, 70.0)
    gs = random_scene(64, seed=4)
    mesh = make_mesh(data=1, tile=4)
    st = _settings(cam, ring=True).replace(ring_capacity=32,
                                           ring_reshard=True)
    out = make_sharded_render(st, mesh)(gs, cam)
    assert np.all(np.isfinite(np.asarray(out["image"])))


@requires_8
@pytest.mark.parametrize("ring", [False, True, "reshard"])
def test_sharded_step_reports_render_drops(ring):
    """All sharded routes (one-shot, ring v1, ring v2) must surface
    instance-stream overflow in the step metrics (render_drops, psum'd over
    tile to the per-camera total) exactly like the single-device step —
    overflow silently degrades gradients, so it must never be silent
    (PERF.md round-3; the v2 case is ADVICE r3: its n_dropped counting was
    never asserted).  Healthy capacity reports zero; an undersized stream
    reports > 0."""
    cfg = TrainingConfig(capacity=64, image_height=32, image_width=32,
                         use_pallas=True, max_instances=2048,
                         gaussian_chunk=32)
    gs = random_scene(48, seed=3, spread=0.35)
    cam = identity_camera(32, 32, 70.0)
    target = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (3, 32, 32)).astype(np.float32))
    cam = cam.replace(image=target)
    mesh = make_mesh(data=1, tile=2)
    cams = jax.tree.map(lambda x: jnp.stack([x]), cam)

    healthy = RenderSettings(image_height=32, image_width=32, use_pallas=True,
                             max_instances=2048, gaussian_chunk=32,
                             ring=bool(ring),
                             ring_reshard=(ring == "reshard"))
    state = create_train_state(jax.tree.map(jnp.copy, gs), cfg)
    _, m = make_sharded_train_step(cfg, healthy, mesh)(state, cams)
    assert float(m["render_drops"]) == 0.0

    tight = (healthy.replace(ring_capacity=32) if ring
             else healthy.replace(max_instances=32))
    state = create_train_state(jax.tree.map(jnp.copy, gs), cfg)
    _, m = make_sharded_train_step(cfg, tight, mesh)(state, cams)
    assert float(m["render_drops"]) > 0.0


@requires_8
def test_ring_overflow_finite():
    """Undersized ring segments (per-(band,range) capacity overflow) must
    degrade gracefully: finite image and gradients, never NaN/crash."""
    cam = identity_camera(64, 64, 70.0)
    gs = random_scene(64, seed=4)
    mesh = make_mesh(data=1, tile=4)
    st = _settings(cam, ring=True).replace(ring_capacity=32)
    f = make_sharded_render(st, mesh)
    out = f(gs, cam)
    assert np.all(np.isfinite(np.asarray(out["image"])))

    from functools import partial
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from mini3dgs_tpu.parallel.sharded import _render_band

    def grads(params):
        def loss(p):
            g = gs.with_params(p)
            row0 = jax.lax.axis_index("tile") * 16
            out = _render_band(g, cam, st, 16, row0,
                               shard_axis="tile", n_shards=4)
            return jax.lax.psum(jnp.square(out["image"]).sum(), "tile")
        g = jax.grad(loss)(params)
        return jax.tree.map(lambda x: jax.lax.pmean(x, ("data", "tile")), g)

    gr = jax.jit(shard_map(grads, mesh=mesh, in_specs=(P(),), out_specs=P(),
                           check_vma=False))(gs.params())
    for k, v in gr.items():
        assert np.all(np.isfinite(np.asarray(v))), k


@requires_8
def test_ring_grads_match_route_exactly_scaled():
    """Raw loss gradients (no optimizer) through both exchange schedules
    agree to f32-association tolerance — pinned on a normalized scale so a
    schedule bug (wrong segment order, missing transmittance carry, wrong
    ppermute direction) cannot hide behind optimizer scaling."""
    from functools import partial
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from mini3dgs_tpu.parallel.sharded import _render_band

    cam = identity_camera(64, 64, 70.0)
    gs = random_scene(48, seed=7)  # divisible over the 4 ring devices
    target = jnp.asarray(
        np.random.default_rng(3).uniform(0, 1, (3, 64, 64)).astype(np.float32))
    mesh = make_mesh(data=1, tile=4)
    n = 4
    band_h = 64 // n

    def make_loss(ring):
        st = _settings(cam, ring=ring)

        def band_loss(params):
            g = gs.with_params(params)
            row0 = jax.lax.axis_index("tile") * band_h
            out = _render_band(g, cam, st, band_h, row0,
                               shard_axis="tile", n_shards=n)
            tgt = jax.lax.dynamic_slice(target, (0, row0, 0), (3, band_h, 64))
            return jax.lax.psum(jnp.abs(out["image"] - tgt).sum(), "tile")

        def grads(params):
            g = jax.grad(band_loss)(params)
            return jax.tree.map(lambda x: jax.lax.pmean(x, ("data", "tile")),
                                g)

        return jax.jit(shard_map(grads, mesh=mesh, in_specs=(P(),),
                                 out_specs=P(), check_vma=False))

    params = gs.params()
    g_route = make_loss(False)(params)
    g_ring = make_loss(True)(params)
    for k in g_route:
        a, b = np.asarray(g_route[k]), np.asarray(g_ring[k])
        scale = np.abs(a).max() + 1e-8
        np.testing.assert_allclose(b / scale, a / scale, atol=5e-5,
                                   err_msg=f"grad {k}")


# ---------------------------------------------------------------------------
# Ring v3 (gid-sharded local projection, O(C/n) activations)
# ---------------------------------------------------------------------------

@requires_8
@pytest.mark.parametrize("cap", ["ample", "exact_mean_x4"])
def test_rank_reshard_compact_matches_dense(cap):
    """binning.rank_reshard_rows_compact must reproduce the dense
    rank_reshard_rows output (value AND gradient) whenever no bucket
    overflows; its send buffer is [n, cap, R] instead of [n, Cs, R]."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from mini3dgs_tpu.ops import binning as B

    n, Cs, R = 8, 64, 16
    C = n * Cs
    rng = np.random.default_rng(5)
    mat_all = jnp.asarray(rng.standard_normal((C, R)), jnp.float32)
    # a permutation with nonuniform bucket loads (depth correlated with gid)
    depth = rng.standard_normal(C) + np.arange(C) / C * 2.0
    rank_all = jnp.asarray(np.argsort(np.argsort(depth)), jnp.int32)
    mesh = make_mesh(data=1, tile=n)
    cap_rows = Cs if cap == "ample" else 4 * (Cs // n)

    def run(fn):
        return jax.jit(shard_map(
            fn, mesh=mesh,
            in_specs=(P(("data", "tile")), P(("data", "tile"))),
            out_specs=P(("data", "tile")), check_vma=False))

    dense = run(lambda m, r: B.rank_reshard_rows(m, r, "tile", n))(
        mat_all.reshape(C, R), rank_all)
    compact = run(lambda m, r: B.rank_reshard_rows_compact(
        m, r, "tile", n, cap_rows)[0])(mat_all.reshape(C, R), rank_all)
    if cap == "ample":
        np.testing.assert_array_equal(np.asarray(compact), np.asarray(dense))
    else:
        # nonuniform loads may overflow the tight cap: rows either match
        # dense or are exact zeros (dropped), never garbage
        c, d = np.asarray(compact), np.asarray(dense)
        mismatch = ~np.isclose(c, d).all(axis=1)
        assert np.all(c[mismatch] == 0.0)

    # gradient: sum-of-squares pullback must land on the gid owners
    def gfn(fn):
        def body(mat, rank):
            def loss(m):
                out = fn(m, rank)
                return jax.lax.psum(jnp.square(out).sum(), "tile")
            return jax.grad(loss)(mat)
        return jax.jit(shard_map(
            body, mesh=mesh,
            in_specs=(P(("data", "tile")), P(("data", "tile"))),
            out_specs=P(("data", "tile")), check_vma=False))

    gd = gfn(lambda m, r: B.rank_reshard_rows(m, r, "tile", n))(
        mat_all.reshape(C, R), rank_all)
    gc = gfn(lambda m, r: B.rank_reshard_rows_compact(
        m, r, "tile", n, cap_rows)[0])(mat_all.reshape(C, R), rank_all)
    if cap == "ample":
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gd),
                                   rtol=1e-6, atol=1e-6)
    else:
        g1, g2 = np.asarray(gc), np.asarray(gd)
        mismatch = ~np.isclose(g1, g2, rtol=1e-6, atol=1e-6).all(axis=1)
        assert np.all(g1[mismatch] == 0.0)  # dropped rows: zero gradient


@requires_8
def test_ring_local_matches_gathered_routes():
    """Ring v3 (gid-sharded local projection) through the gauss-sharded
    train step must land the same loss and updated parameters as the
    gathered ring (v1) — the projection rows reach the same rank owners
    through the depth-key-only gather + compact reshard instead of a full
    [C]-row all_gather."""
    from mini3dgs_tpu.parallel.sharded import (make_gauss_sharded_train_step,
                                               shard_train_state)
    cfg = TrainingConfig(capacity=64, image_height=32, image_width=32,
                         use_pallas=True, max_instances=2048,
                         gaussian_chunk=32, mesh_data=1, mesh_tile=2,
                         shard_gauss_state=True)
    gs = random_scene(40, seed=2, spread=0.35)
    cam = identity_camera(32, 32, 70.0)
    target = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (3, 32, 32)).astype(np.float32))
    cam = cam.replace(image=target)
    cams = jax.tree.map(lambda x: jnp.stack([x]), cam)
    base = RenderSettings(image_height=32, image_width=32, use_pallas=True,
                          max_instances=2048, gaussian_chunk=32, ring=True)
    mesh = make_mesh(data=1, tile=2)
    results = {}
    for mode in ("v1", "local"):
        st = shard_train_state(
            create_train_state(jax.tree.map(jnp.copy, gs), cfg), mesh)
        settings = base.replace(ring_local=(mode == "local"),
                                # ample buckets: nothing may drop
                                ring_reshard_capacity=32)
        step = make_gauss_sharded_train_step(cfg, settings, mesh, st)
        st, m = step(st, cams)
        results[mode] = (float(m["total_loss"]),
                         np.asarray(st.gaussians.xyz),
                         float(m["render_drops"]))
    assert results["local"][2] == 0.0
    np.testing.assert_allclose(results["local"][0], results["v1"][0],
                               rtol=1e-5)
    np.testing.assert_allclose(results["local"][1], results["v1"][1],
                               atol=2e-5)


@requires_8
def test_ring_local_bucket_overflow_counted():
    """v3 with an undersized reshard bucket must stay finite and surface
    the dropped rows in the SEPARATE reshard_drops metric (never silent
    degradation; ADVICE r4: reshard drops count Gaussian rows, stream
    drops count tile instances — mixing the units in one number made
    capacity sizing uninterpretable)."""
    from mini3dgs_tpu.parallel.sharded import (make_gauss_sharded_train_step,
                                               shard_train_state)
    cfg = TrainingConfig(capacity=64, image_height=32, image_width=32,
                         use_pallas=True, max_instances=2048,
                         gaussian_chunk=32, mesh_data=1, mesh_tile=2,
                         shard_gauss_state=True)
    # depth strongly correlated with gid order -> both gid blocks' rows
    # land in ONE rank range each; cap 8 < Cs=32 must overflow
    rng = np.random.default_rng(4)
    xyz = np.concatenate([rng.uniform(-0.4, 0.4, (64, 2)),
                          np.linspace(1.0, 3.0, 64)[:, None]], axis=1)
    sig = np.full((64, 3), 0.08, np.float32)
    col = rng.uniform(0, 1, (64, 3)).astype(np.float32)
    op = np.full(64, 0.8, np.float32)
    gs = make_gaussians(xyz.astype(np.float32), sig, col, op)
    cam = identity_camera(32, 32, 70.0)
    target = jnp.asarray(rng.uniform(0, 1, (3, 32, 32)).astype(np.float32))
    cam = cam.replace(image=target)
    cams = jax.tree.map(lambda x: jnp.stack([x]), cam)
    mesh = make_mesh(data=1, tile=2)
    settings = RenderSettings(image_height=32, image_width=32,
                              use_pallas=True, max_instances=2048,
                              gaussian_chunk=32, ring=True, ring_local=True,
                              ring_reshard_capacity=8)
    st = shard_train_state(create_train_state(gs, cfg), mesh)
    step = make_gauss_sharded_train_step(cfg, settings, mesh, st)
    st, m = step(st, cams)
    assert np.isfinite(float(m["total_loss"]))
    assert float(m["reshard_drops"]) > 0.0
    assert np.all(np.isfinite(np.asarray(st.gaussians.xyz)))


# ---------------------------------------------------------------------------
# Round 5: distributed ranking (zero [C] arrays) + invisible-row exclusion
# ---------------------------------------------------------------------------

@requires_8
def test_distributed_ranks_matches_replicated():
    """binning.distributed_ranks (ring-rotation counting sort, O(Cs) peak)
    must reproduce the replicated stable-sort ranks exactly for visible
    rows — including cross-device f32 depth ties, which break by ascending
    global gid (the stable sort's iota payload) — and return the
    _INT32_MAX sentinel for invisible rows (ADVICE r4: excluded from the
    rank reshard instead of flooding back-of-order buckets)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from mini3dgs_tpu.ops import binning as B

    n, Cs = 8, 16
    C = n * Cs
    rng = np.random.default_rng(9)
    depth = rng.uniform(1.0, 5.0, C).astype(np.float32)
    # deliberate tie classes spanning device boundaries
    depth[3] = depth[40] = depth[77] = depth[126] = 2.5
    depth[10] = depth[11] = depth[90] = 3.25
    visible = rng.random(C) > 0.3
    visible[40] = visible[77] = True
    mesh = make_mesh(data=1, tile=n)

    ranks = jax.jit(shard_map(
        lambda d, v: B.distributed_ranks(d, v, "tile", n), mesh=mesh,
        in_specs=(P(("data", "tile")), P(("data", "tile"))),
        out_specs=P(("data", "tile")), check_vma=False))(
            jnp.asarray(depth), jnp.asarray(visible))
    ranks = np.asarray(ranks)

    # replicated oracle: stable sort of (visible ? depth : inf, gid)
    key = np.where(visible, depth, np.inf)
    order = np.lexsort((np.arange(C), key))      # stable by (key, gid)
    oracle = np.empty(C, np.int64)
    oracle[order] = np.arange(C)
    np.testing.assert_array_equal(ranks[visible], oracle[visible])
    assert np.all(ranks[~visible] == np.iinfo(np.int32).max)


@requires_8
def test_ring_local_high_cull_no_false_drops():
    """ADVICE r4 medium: a device whose rows are mostly CULLED must not
    overflow the v3 reshard buckets — invisible rows used to get real
    back-of-order ranks concentrated on 1-2 destinations, so >4/n culled
    fraction structurally tripped the default 4x-mean cap and render_drops
    false-alarmed.  8-way tile axis, 75% culled, default cap: zero drops,
    and the loss must match the gathered ring (v1) exactly."""
    from mini3dgs_tpu.parallel.sharded import (make_gauss_sharded_train_step,
                                               shard_train_state)
    n = 8
    cap = 64
    rng = np.random.default_rng(6)
    # 16 visible in front of the camera, 48 behind it (culled), interleaved
    # over gid space so every device block is ~75% invisible
    xyz = np.zeros((cap, 3), np.float32)
    xyz[:, 0] = rng.uniform(-0.4, 0.4, cap)
    xyz[:, 1] = rng.uniform(-0.4, 0.4, cap)
    z = np.full(cap, -2.0, np.float32)           # behind the camera
    z[::4] = rng.uniform(1.0, 3.0, cap // 4)     # every 4th visible
    xyz[:, 2] = z
    sig = np.full((cap, 3), 0.08, np.float32)
    col = rng.uniform(0, 1, (cap, 3)).astype(np.float32)
    op = np.full(cap, 0.8, np.float32)
    gs = make_gaussians(xyz, sig, col, op)
    H, W = 16 * n, 32
    cam = identity_camera(W, H, 70.0)
    target = jnp.asarray(rng.uniform(0, 1, (3, H, W)).astype(np.float32))
    cam = cam.replace(image=target)
    cams = jax.tree.map(lambda x: jnp.stack([x]), cam)
    mesh = make_mesh(data=1, tile=n)
    cfg = TrainingConfig(capacity=cap, image_height=H, image_width=W,
                         use_pallas=True, max_instances=2048,
                         gaussian_chunk=32, mesh_data=1, mesh_tile=n,
                         shard_gauss_state=True)
    results = {}
    for ring_local in (False, True):
        settings = RenderSettings(
            image_height=H, image_width=W, use_pallas=True,
            max_instances=2048, gaussian_chunk=32, ring=True,
            ring_local=ring_local)  # DEFAULT reshard cap: 4x uniform mean
        st = shard_train_state(create_train_state(gs, cfg), mesh)
        step = make_gauss_sharded_train_step(cfg, settings, mesh, st)
        st, m = step(st, cams)
        results[ring_local] = m
    m = results[True]
    assert float(m.get("reshard_drops", 0.0)) == 0.0, (
        "invisible rows must not consume reshard bucket capacity")
    assert float(m["render_drops"]) == 0.0
    np.testing.assert_allclose(float(m["total_loss"]),
                               float(results[False]["total_loss"]),
                               rtol=1e-5)


def _walk_shardmap_avals(jaxpr, in_shard_map=False):
    """Yield every aval shape appearing in eqns INSIDE shard_map bodies,
    recursing through pjit/custom/scan sub-jaxprs."""
    for eqn in jaxpr.eqns:
        inside = in_shard_map or "shard_map" in eqn.primitive.name
        if in_shard_map:
            for v in list(eqn.invars) + list(eqn.outvars):
                aval = getattr(v, "aval", None)
                if aval is not None and hasattr(aval, "shape"):
                    yield aval.shape, eqn.primitive.name
        for sub in _sub_jaxprs(eqn.params):
            yield from _walk_shardmap_avals(sub, inside)


def _sub_jaxprs(obj):
    import jax.extend.core as jex
    if isinstance(obj, dict):
        obj = obj.values()
    elif not isinstance(obj, (list, tuple)):
        obj = [obj]
    for v in obj:
        if isinstance(v, jex.ClosedJaxpr) or (hasattr(v, "eqns")
                                              and hasattr(v, "invars")):
            yield v.jaxpr if hasattr(v, "jaxpr") else v
        elif isinstance(v, (list, tuple, dict)):
            yield from _sub_jaxprs(v)


@requires_8
def test_ring_local_jaxpr_has_no_C_arrays():
    """VERDICT r4 next #3 acceptance: walking the jaxpr of the
    gauss-sharded ring-v3 train step, NO per-device array inside the
    shard_map body may carry a dimension equal to the global capacity C —
    ranks, routing, binning, raster, loss, and the whole backward must run
    at O(C/n).  C is chosen to collide with no other static size in the
    program (C=328: bands 16x32, P=256, G=32, grids Cs*9)."""
    from mini3dgs_tpu.parallel.sharded import (make_gauss_sharded_train_step,
                                               shard_train_state)
    n = 8
    C = 328                      # 41 rows/device; indivisible by tile sizes
    H, W = 16 * n, 32
    rng = np.random.default_rng(3)
    xyz = np.concatenate([rng.uniform(-0.4, 0.4, (C, 2)),
                          rng.uniform(1.0, 3.0, (C, 1))],
                         axis=1).astype(np.float32)
    gs = make_gaussians(xyz, np.full((C, 3), 0.06, np.float32),
                        rng.uniform(0, 1, (C, 3)).astype(np.float32),
                        np.full(C, 0.7, np.float32))
    cam = identity_camera(W, H, 70.0)
    cam = cam.replace(image=jnp.zeros((3, H, W), jnp.float32))
    cams = jax.tree.map(lambda x: jnp.stack([x]), cam)
    mesh = make_mesh(data=1, tile=n)
    cfg = TrainingConfig(capacity=C, image_height=H, image_width=W,
                         use_pallas=True, max_instances=2048,
                         gaussian_chunk=32, max_dup_per_axis=3,
                         mesh_data=1, mesh_tile=n, shard_gauss_state=True)
    settings = RenderSettings(image_height=H, image_width=W,
                              use_pallas=True, max_instances=2048,
                              gaussian_chunk=32, max_dup_per_axis=3,
                              ring=True, ring_local=True)
    st = shard_train_state(create_train_state(gs, cfg), mesh)
    step = make_gauss_sharded_train_step(cfg, settings, mesh, st)
    jaxpr = jax.make_jaxpr(lambda s, c: step(s, c))(st, cams)
    shapes = list(_walk_shardmap_avals(jaxpr.jaxpr))
    assert shapes, "walk found no shard_map body (test harness broken)"
    offenders = sorted({(shape, prim) for shape, prim in shapes
                        if C in shape})
    assert not offenders, (
        f"per-device arrays with a C={C} dimension inside the shard_map "
        f"body: {offenders[:20]}")
    # sanity: the walk DOES see the Cs-sized per-device rows
    assert any(C // n in shape for shape, _ in shapes)
