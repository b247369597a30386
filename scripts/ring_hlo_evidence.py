"""Schedule-level evidence for the ring exchange's comm/compute overlap
(VERDICT r3 next #7: replace the bare assertion at parallel/ring.py with
analyzable artifacts).

Two artifacts, by what the available hardware can show:

1. DEPENDENCY PROOF (any backend, runs here on the 8-virtual-device CPU
   mesh): walk the shard_map body's jaxpr and verify that each ring hop's
   ppermute consumes ONLY pre-placement buffers — never the output of the
   raster call it is supposed to overlap.  This is the precondition for
   overlap: XLA's TPU latency-hiding scheduler (LHS) converts
   collective-permute into -start/-done pairs and hoists starts past any
   compute they do not depend on; a data dependence would make overlap
   impossible on every backend.

2. SCHEDULE DUMP (needs a real multi-chip TPU slice): when run with >= 2
   TPU devices, compiles the ring render and prints every
   collective-permute-start/-done line with the ops scheduled between them
   — the direct evidence that the starts straddle the raster custom-call.
   On the CPU backend the compiled module shows synchronous
   `collective-permute` ops (the CPU runtime has no async collectives), so
   the CPU text can neither confirm nor refute TPU overlap; only the
   dependency structure transfers.

Usage:  python scripts/ring_hlo_evidence.py [--dump-hlo FILE]
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os
if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax
import jax.numpy as jnp


def build_ring_render(n_tile=4):
    from mini3dgs_tpu.ops.renderer import RenderSettings
    from mini3dgs_tpu.parallel.mesh import make_mesh
    from mini3dgs_tpu.parallel.sharded import make_sharded_render
    from tests.test_raster_pallas import random_scene
    from tests.test_render_golden import identity_camera

    cam = identity_camera(64, 64, 70.0)
    gs = random_scene(48, seed=3)
    mesh = make_mesh(data=1, tile=n_tile)
    st = RenderSettings(image_height=64, image_width=64, use_pallas=True,
                        max_instances=4096, gaussian_chunk=32, ring=True)
    return make_sharded_render(st, mesh), gs, cam


def _sub_jaxprs(eq):
    for v in eq.params.values():
        for w in (v if isinstance(v, (list, tuple)) else [v]):
            if hasattr(w, "jaxpr"):          # ClosedJaxpr
                yield w.jaxpr
            elif hasattr(w, "eqns"):         # plain Jaxpr (shard_map body)
                yield w


def _find_ring_level(jp):
    """The (unique) jaxpr level holding the ring schedule: the one whose
    own eqn list contains ppermute ops."""
    if any(eq.primitive.name == "ppermute" for eq in jp.eqns):
        return jp
    for eq in jp.eqns:
        for sub in _sub_jaxprs(eq):
            found = _find_ring_level(sub)
            if found is not None:
                return found
    return None


def dependency_proof() -> bool:
    """Jaxpr-level reachability inside the shard_map body: no ring hop's
    ppermute input may be reachable from the output of any raster
    (custom-VJP pallas) call that precedes it — hop s+1's buffers come
    from the pre-placement all_to_all and earlier hops only, so a
    scheduler is free to issue the exchange while the raster runs."""
    f, gs, cam = build_ring_render()
    jaxpr = jax.make_jaxpr(lambda g, c: f(g, c))(gs, cam).jaxpr
    level = _find_ring_level(jaxpr)
    if level is None:
        print("NO ppermute eqns found — did the ring path trace?")
        return False

    eqns = level.eqns

    def contains_pallas(jp, depth=0):
        if depth > 6:
            return False
        for eq in jp.eqns:
            if "pallas" in eq.primitive.name:
                return True
            for sub in _sub_jaxprs(eq):
                if contains_pallas(sub, depth + 1):
                    return True
        return False

    produced_by = {}
    raster_eqns, ppermute_eqns = [], []
    for i, eq in enumerate(eqns):
        for ov in eq.outvars:
            produced_by[id(ov)] = i
        name = eq.primitive.name
        if "pallas" in name or ("custom_vjp" in name and any(
                contains_pallas(s) for s in _sub_jaxprs(eq))):
            # raster ops only — pack_instances is also a custom_vjp but
            # the ring hops legitimately depend on the packed buffers
            raster_eqns.append(i)
        elif name == "ppermute":
            ppermute_eqns.append(i)
    print(f"ring level: {len(eqns)} eqns, {len(raster_eqns)} raster calls "
          f"{raster_eqns}, {len(ppermute_eqns)} ppermutes {ppermute_eqns}")

    def reaches_raster(eq_idx):
        seen, stack = set(), list(eqns[eq_idx].invars)
        while stack:
            v = stack.pop()
            if id(v) in seen or not hasattr(v, "aval"):
                continue
            seen.add(id(v))
            src = produced_by.get(id(v))
            if src is None:
                continue
            if src in raster_eqns:
                return src
            stack.extend(eqns[src].invars)
        return None

    ok = True
    for pi in ppermute_eqns:
        prior = [r for r in raster_eqns if r < pi]
        hit = reaches_raster(pi)
        if hit is not None:
            print(f"ppermute eqn #{pi} DEPENDS on raster eqn #{hit} — "
                  f"overlap impossible")
            ok = False
        else:
            print(f"ppermute eqn #{pi}: independent of all "
                  f"{len(prior)} preceding raster calls — overlappable")
    return ok


def schedule_dump(dump_path=None):
    f, gs, cam = build_ring_render()
    txt = f.lower(gs, cam).compile().as_text()
    if dump_path:
        Path(dump_path).write_text(txt)
        print(f"full module -> {dump_path}")
    starts = [l.strip()[:160] for l in txt.splitlines()
              if re.search(r"collective-permute(-start|-done)?", l)]
    async_pairs = [l for l in starts if "-start" in l or "-done" in l]
    print(f"\n{len(starts)} collective-permute lines, "
          f"{len(async_pairs)} async (-start/-done)")
    for l in starts[:20]:
        print(" ", l)
    backend = jax.default_backend()
    if backend != "tpu":
        print(f"\n[backend={backend}] synchronous collective-permutes are "
              f"expected here — the CPU runtime has no async collectives. "
              f"Re-run on a >=2-chip TPU slice for the -start/-done "
              f"schedule; the dependency proof above is the "
              f"backend-independent fact.")
    return len(async_pairs)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump-hlo", type=str, default=None)
    args = ap.parse_args()
    if len(jax.devices()) < 8:
        jax.config.update("jax_platforms", "cpu")
        import jax.extend.backend as jeb
        jeb.clear_backends()
    ok = dependency_proof()
    schedule_dump(args.dump_hlo)
    print("\nDEPENDENCY PROOF:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)
