"""16- and 32-virtual-device tier for the sharded/ring paths (VERDICT r4
next #8): n-dependent layout bugs — reshard bucket caps, ring hop counts,
band indexing, gauss-axis divisibility — only appear past the default
8-device test mesh.  The conftest pins this process at 8 virtual devices,
so each tier runs in a subprocess with its own device count.

Each worker runs the SAME scene through (a) the replicated-state sharded
step (all_to_all route) and (b) the gauss-sharded ring-v3 step (TP state +
distributed ranking + compact reshard), and checks both against the
single-device oracle loss it computes itself.
"""

import os
import re
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parent.parent

WORKER = r"""
import sys
sys.path.insert(0, {root!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", {n})
import jax.numpy as jnp
import numpy as np
from mini3dgs_tpu.config import TrainingConfig
from mini3dgs_tpu.ops.renderer import RenderSettings
from mini3dgs_tpu.parallel.mesh import make_mesh
from mini3dgs_tpu.parallel.sharded import (make_gauss_sharded_train_step,
                                           make_sharded_train_step,
                                           shard_train_state)
from mini3dgs_tpu.train.trainer import create_train_state, make_train_step
from tests.test_raster_pallas import random_scene
from tests.test_render_golden import identity_camera

assert len(jax.devices()) == {n}
data, tile = {data}, {tile}
H, W = 16 * tile, 16
cap = 64
cfg = TrainingConfig(capacity=cap, image_height=H, image_width=W,
                     use_pallas=True, max_instances=1024, gaussian_chunk=32,
                     mesh_data=data, mesh_tile=tile)
gs = random_scene(64, seed=2, spread=0.35)
cam = identity_camera(W, H, 70.0)
target = jnp.asarray(np.random.default_rng(7)
                     .uniform(0, 1, (3, H, W)).astype(np.float32))
cam = cam.replace(image=target)
settings = RenderSettings(image_height=H, image_width=W, use_pallas=True,
                          max_instances=1024, gaussian_chunk=32)

# single-device oracle (no mesh)
st0 = create_train_state(random_scene(64, seed=2, spread=0.35), cfg)
_, m0 = make_train_step(cfg, settings)(st0, cam)
oracle = float(m0["total_loss"])

mesh = make_mesh(data=data, tile=tile)
cams = jax.tree.map(lambda x: jnp.stack([x] * data), cam)

# (a) replicated state, one-shot all_to_all route
st1 = create_train_state(random_scene(64, seed=2, spread=0.35), cfg)
st1, m1 = make_sharded_train_step(cfg, settings, mesh)(st1, cams)
loss1 = float(m1["total_loss"])

# (b) gauss-sharded state + ring v3 (distributed ranking, compact reshard)
cfg3 = TrainingConfig(capacity=cap, image_height=H, image_width=W,
                      use_pallas=True, max_instances=1024,
                      gaussian_chunk=32, mesh_data=data, mesh_tile=tile,
                      shard_gauss_state=True)
settings3 = settings.replace(ring=True, ring_local=True,
                             ring_reshard_capacity=cap // tile)  # lossless
st3 = shard_train_state(
    create_train_state(random_scene(64, seed=2, spread=0.35), cfg3), mesh)
st3, m3 = make_gauss_sharded_train_step(cfg3, settings3, mesh, st3)(st3, cams)
loss3 = float(m3["total_loss"])
drops3 = float(m3.get("reshard_drops", -1.0)) + float(m3["render_drops"])

ok1 = abs(loss1 - oracle) <= 1e-4 * max(abs(oracle), 1e-3)
ok3 = abs(loss3 - oracle) <= 1e-4 * max(abs(oracle), 1e-3)
print(f"RESULT oracle={{oracle:.8f}} route={{loss1:.8f}} ring3={{loss3:.8f}} "
      f"ok1={{ok1}} ok3={{ok3}} drops3={{drops3}}", flush=True)
"""


@pytest.mark.parametrize("n,data,tile", [(16, 2, 8), (32, 2, 16)])
def test_sharded_paths_at_scale(tmp_path, n, data, tile):
    script = tmp_path / f"worker{n}.py"
    script.write_text(WORKER.format(root=str(ROOT), n=n, data=data,
                                    tile=tile))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    p = subprocess.run([sys.executable, str(script)], capture_output=True,
                       text=True, cwd=str(ROOT), env=env, timeout=1200)
    out = p.stdout + p.stderr
    assert p.returncode == 0, f"worker failed rc={p.returncode}:\n{out[-3000:]}"
    m = re.search(r"RESULT oracle=([\d.]+) route=([\d.]+) ring3=([\d.]+) "
                  r"ok1=(\w+) ok3=(\w+) drops3=([-\d.]+)", out)
    assert m, out
    assert m.group(4) == "True", f"route loss off-oracle at n={n}:\n{out}"
    assert m.group(5) == "True", f"ring v3 loss off-oracle at n={n}:\n{out}"
    assert float(m.group(6)) == 0.0, f"drops at n={n}:\n{out}"
