"""Debug: ring-origin instance multisets vs replicated band binning."""
import jax
jax.config.update("jax_platforms", "cpu")
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax.extend.backend as jeb
jeb.clear_backends()

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from mini3dgs_tpu.ops import binning as B
from mini3dgs_tpu.ops.projection import project_gaussians
from mini3dgs_tpu.parallel.mesh import make_mesh
from test_raster_pallas import rotated_scene, random_scene
from test_render_golden import identity_camera

cam = identity_camera(64, 64, 70.0)
gs = rotated_scene(60, seed=11)
proj = project_gaussians(gs, cam)
n = 4
mesh = make_mesh(data=1, tile=n)
ts, Q, G = 16, 1024, 32

def origin(proj):
    rb = B.bin_gaussians_ring_origin(proj, 64, 64, ts, Q, G, "tile", n)
    return rb.flat_rank, rb.live, rb.tile_start, rb.tile_count, rb.n_dropped.reshape(1)

fr, lv, tstart, tcount, nd = jax.jit(shard_map(
    origin, mesh=mesh, in_specs=(P(),),
    out_specs=(P(("data", "tile")), P(("data", "tile")),
               P(("data", "tile")), P(("data", "tile")), P(("data", "tile"))),
    check_vma=False))(proj)
fr = np.asarray(fr).reshape(n, n, Q)      # [origin, band, Q]
lv = np.asarray(lv).reshape(n, n, Q)
tstart = np.asarray(tstart).reshape(n, n, -1)
tcount = np.asarray(tcount).reshape(n, n, -1)
print("ring n_dropped per origin:", np.asarray(nd))

# replicated band binning for each band
band_h = 64 // n
for b in range(n):
    bb = B.bin_gaussians(proj, band_h, 64, ts, 4096, G,
                         row0=b * band_h, col0=0,
                         full_height=64, full_width=64)
    s_rank = np.asarray(bb.s_rank)
    live = np.asarray(bb.live)
    ref_ranks = np.sort(s_rank[live])
    ring_ranks = np.sort(np.concatenate(
        [fr[o, b][lv[o, b]] for o in range(n)]))
    same = (len(ref_ranks) == len(ring_ranks)
            and np.array_equal(ref_ranks, ring_ranks))
    print(f"band {b}: ref {len(ref_ranks)} ring {len(ring_ranks)} "
          f"multiset_equal={same}")
    if not same:
        from collections import Counter
        cr, cg = Counter(ref_ranks.tolist()), Counter(ring_ranks.tolist())
        extra = cg - cr
        miss = cr - cg
        print("  extra in ring:", dict(list(extra.items())[:10]))
        print("  missing in ring:", dict(list(miss.items())[:10]))
