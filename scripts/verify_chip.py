"""On-chip numerics check: Pallas kernels vs the golden XLA renderer on the
REAL TPU (CPU tests run the kernels in interpret mode; this validates the
actual Mosaic lowering — matmul precision, transcendental units, DMA
masking) and a short end-to-end training convergence probe."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def parity(width=256, height=256, n=6_000, capacity=2 ** 13):
    from __graft_entry__ import _scene
    from mini3dgs_tpu.ops.renderer import RenderSettings, render

    g, cam = _scene(capacity=capacity, n=n, width=width, height=height,
                    seed=7)
    # _scene is isotropic (equal sigmas) — the true rotation gradient of an
    # isotropic gaussian is 0, making the normalized rotation-error metric
    # noise-over-noise.  Make the splats anisotropic.
    aniso = jnp.asarray(np.array([0.0, 0.45, -0.5], np.float32))
    g = g.replace(scaling=g.scaling + aniso[None, :])
    target = jnp.zeros((3, height, width), jnp.float32)
    # IDENTICAL tile_size on both: the reference's tile-AABB cutoff makes
    # the output legitimately tile-size-dependent (a 16-vs-32 mismatch here
    # measured 4e-3 image diff that looked like a kernel precision bug).
    sets = {
        "golden": RenderSettings(image_height=height, image_width=width,
                                 use_pallas=False, tile_size=32),
        "pallas": RenderSettings(image_height=height, image_width=width,
                                 use_pallas=True, max_instances=2 ** 16,
                                 gaussian_chunk=256, tile_size=32),
    }

    outs, grads = {}, {}
    for name, st in sets.items():
        def loss(params):
            out = render(g.with_params(params), cam, st)
            return (jnp.mean((out["image"] - target) ** 2)
                    + 0.1 * jnp.mean(out["alpha"])), out

        (lv, out), dg = jax.jit(jax.value_and_grad(loss, has_aux=True))(
            g.params())
        outs[name] = jax.device_get(out)
        grads[name] = jax.device_get(dg)
        print(f"{name}: loss={float(lv):.6f}")

    # Cliff calibration: the early-stop gate (T < 0.005) and the W_EPS skip
    # are non-differentiable; tiny forward rounding (different exp
    # implementations, accumulation orders) flips them for barely-gated
    # instances, producing O(1) gradient differences on isolated entries
    # between ANY two correct implementations.  Golden-on-CPU vs
    # golden-on-TPU measures that floor for this scene; the pallas gate is
    # set relative to it.
    calib = {}
    try:
        cpu = jax.devices("cpu")[0]

        def loss_g(params):
            out = render(g.with_params(params), cam, sets["golden"])
            return (jnp.mean((out["image"] - target) ** 2)
                    + 0.1 * jnp.mean(out["alpha"])), out

        (_, _), dg_cpu = jax.jit(jax.value_and_grad(loss_g, has_aux=True),
                                 device=cpu)(g.params())
        dg_cpu = jax.device_get(dg_cpu)
        for k in dg_cpu:
            a, b = np.asarray(dg_cpu[k]), np.asarray(grads["golden"][k])
            calib[k] = float(np.linalg.norm(a - b)
                             / (np.linalg.norm(b) + 1e-12))
        print("cliff calibration (golden TPU vs golden CPU, rel-L2): "
              + ", ".join(f"{k}={v:.2e}" for k, v in sorted(calib.items())))
    except Exception as e:
        print(f"no CPU backend for calibration ({type(e).__name__}); "
              "using absolute gates")

    # Forward gate, cliff-aware like the gradient gates below: the
    # early-stop (T < 0.005) is a non-differentiable cliff — a 1-ulp
    # forward rounding difference (different exp implementations /
    # accumulation orders) can stop one pixel one chunk earlier in one
    # implementation, moving its alpha/color by up to the remaining
    # transmittance (<= 5e-3) on that ISOLATED pixel.  A bare max-diff
    # gate at 1e-3 therefore flickers with any numerics-neutral change
    # (measured round-5: alpha max hit exactly 1.0e-3 with image max
    # 4.3e-4 and every grad gate passing).  Gate instead on: bulk
    # agreement (99.9th pct < 1e-3), isolation (few cliff pixels), and
    # the model's own bound (max < 5.5e-3 = early-stop T + rounding).
    ok = True
    for field in ("image", "alpha"):
        d = np.abs(outs["pallas"][field] - outs["golden"][field])
        p999 = float(np.quantile(d, 0.999))
        big = int((d > 1e-3).sum())
        fld_ok = (p999 < 1e-3 and big <= max(8, d.size // 100_000)
                  and d.max() < 5.5e-3)
        print(f"{field:5s} |diff|: max={d.max():.2e}  p99.9={p999:.2e}  "
              f"pixels>1e-3: {big}/{d.size}  -> "
              f"{'ok' if fld_ok else 'FAIL'}")
        ok &= fld_ok
    for k in ("xyz", "scaling", "rotation", "opacity", "features_dc"):
        a = np.asarray(grads["pallas"][k])
        b = np.asarray(grads["golden"][k])
        scale = np.abs(b).max() + 1e-12
        d = np.abs(a - b) / scale
        err = d.max()
        # The early-stop gate (T < 0.005) is a non-differentiable cliff in
        # the MODEL: tiny forward rounding flips it for barely-gated
        # instances, producing O(1) differences on isolated entries in any
        # two implementations (golden autodiff included).  Gate on the L2
        # relative error + the count of cliff entries instead of the max.
        l2 = float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))
        big = int((d > 3e-3).sum())
        gate = max(3e-3, 2.0 * calib.get(k, 0.0))
        print(f"grad {k:12s} max={err:.2e}  rel-L2={l2:.2e}  "
              f"entries>3e-3: {big}/{d.size}  (gate {gate:.1e})")
        ok &= l2 < gate
    print("PARITY", "OK" if ok else "FAIL")
    return ok


def convergence(width=256, height=256, n=2_000, steps=200):
    import optax
    from __graft_entry__ import _scene
    from mini3dgs_tpu.core.loss import gaussian_loss
    from mini3dgs_tpu.ops.renderer import RenderSettings, render
    from mini3dgs_tpu.utils.metrics import psnr

    g, cam = _scene(capacity=4096, n=n, width=width, height=height, seed=11)
    st = RenderSettings(image_height=height, image_width=width,
                        use_pallas=True, max_instances=2 ** 15,
                        gaussian_chunk=256, tile_size=32)
    # target = a perturbed render of the same scene (self-supervised probe)
    g2, _ = _scene(capacity=4096, n=n, width=width, height=height, seed=11)
    target = render(g2, cam, st)["image"]

    tx = optax.adam(2e-3)
    params = g.params()
    params = {**params, "xyz": params["xyz"]
              + 0.01 * jax.random.normal(jax.random.PRNGKey(0),
                                         params["xyz"].shape)}
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            out = render(g.with_params(p), cam, st)
            total, _ = gaussian_loss(out["image"], target, 0.2)
            return total
        l, grad = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grad, opt, params)
        return jax.tree.map(lambda a, b: a + b, params, upd), opt, l

    l0 = None
    t0 = time.perf_counter()
    for i in range(steps):
        params, opt, l = step(params, opt)
        if i == 0:
            l0 = float(l)
    lN = float(l)
    dt = (time.perf_counter() - t0) / steps
    final = render(g.with_params(params), cam, st)["image"]
    p = float(psnr(final, target))
    print(f"train: loss {l0:.4f} -> {lN:.4f} in {steps} steps, "
          f"PSNR {p:.1f} dB, {1 / dt:.1f} it/s (incl. dispatch)")
    print("CONVERGENCE", "OK" if (lN < 0.3 * l0 and p > 30.0) else "FAIL")


if __name__ == "__main__":
    ok = parity()
    convergence()
    sys.exit(0 if ok else 1)
