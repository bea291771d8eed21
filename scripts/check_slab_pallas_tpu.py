"""On-TPU check: the slab-sharded step (shard_map + ppermute) composes
with the fused Pallas contact kernel — run on a real chip (1-device
mesh exercises the pallas-under-shard_map lowering; scale n_dev on real
multi-chip hardware).  Verified 2026-08-17 on v5e: one slab step is
allclose(1e-6) to the plain pallas step.
"""

import os, sys, time
sys.path.insert(0, '/root/repo'); sys.path.insert(0, '/root/repo/tests')
import numpy as np, jax, jax.numpy as jnp
# real TPU, 1-device mesh: exercises pallas-under-shard_map lowering
from rigid_body_2d_3d_pysph_tpu.ops.kernels import get_kernel
from rigid_body_2d_3d_pysph_tpu.parallel import slab as slabmod
from rigid_body_2d_3d_pysph_tpu.parallel.sharded import make_mesh
from rigid_body_2d_3d_pysph_tpu.geom import get_2d_block
from rigid_body_2d_3d_pysph_tpu.models.rigid_body import RigidBody2DScheme
from rigid_body_2d_3d_pysph_tpu.state import make_group, build_scene, ROLE_RIGID, ROLE_BOUNDARY

dx = 0.05
xb, yb = get_2d_block(dx, 0.2, 0.2)
xs, ys, bids = [], [], []
for b in range(4):
    xs.append(xb + 0.3 * b); ys.append(yb); bids.append(np.full(len(xb), b, np.int32))
x = np.concatenate(xs); y = np.concatenate(ys); bid = np.concatenate(bids)
xw = np.arange(-8, 40) * dx
yw = np.full(len(xw), yb.min() - 0.7 * dx)
m = 2000 * dx * dx
body = make_group("body", x, y, m=m, h=1.3*dx, rho=2000.0, rad_s=dx/2,
                  role=ROLE_RIGID, body_id=bid, dem_id=bid)
wall = make_group("wall", xw, yw, m=m, h=1.3*dx, rho=2000.0, rad_s=dx/2,
                  role=ROLE_BOUNDARY, dem_id=4)
scene = build_scene([body, wall], dim=2, total_no_bodies=5, spacing0=dx)
scheme = RigidBody2DScheme(rigid_bodies=["body"], boundaries=["wall"], gy=-9.81, dim=2)
scheme.engine = "pallas"
scene = scheme.setup(scene)
kernel = get_kernel(scheme.kernel_name, scheme.dim)
base = scheme.cell_config(scene, kernel)
mesh = make_mesh(1)
cfg = slabmod.make_slab_config(scene, base, 1)
dec = slabmod.shard_slab_scene(slabmod.slab_decompose(scene, cfg), mesh)
step = slabmod.make_slab_step(scheme, dec, mesh, cfg)
s = step(dec, jnp.asarray(1e-4))
jax.block_until_ready(s.fields['x'])
assert not bool(np.asarray(s.nbr_overflow))
# compare one step vs the plain pallas step
plain = scheme.make_step(scene)
p = plain(scene, jnp.asarray(1e-4))
act = np.asarray(s.active)
a = np.lexsort((np.asarray(s.y)[act], np.asarray(s.x)[act]))
b = np.lexsort((np.asarray(p.y), np.asarray(p.x)))
np.testing.assert_allclose(np.asarray(s.x)[act][a], np.asarray(p.x)[b], atol=1e-6)
print("slab+pallas 1-device: ok, matches plain step", flush=True)

# ---- blob layout (the production slab path: compact eval + slot_blob) ----
decb = slabmod.shard_slab_scene(
    slabmod.slab_decompose(scene, cfg, use_blob=True), mesh)
stepb = slabmod.make_slab_step(scheme, decb, mesh, cfg)
sb = stepb(decb, jnp.asarray(1e-4))
jax.block_until_ready(sb.fields['x'])
assert not bool(np.asarray(sb.nbr_overflow))
actb = np.asarray(sb.active)
ab = np.lexsort((np.asarray(sb.y)[actb], np.asarray(sb.x)[actb]))
np.testing.assert_allclose(np.asarray(sb.x)[actb][ab], np.asarray(p.x)[b],
                           atol=1e-6)
# spring state must match the plain compact path's expansion
from rigid_body_2d_3d_pysph_tpu.models.rigid_body import (
    deblobify_slot_scene, expand_slot_scene)
sb_full = deblobify_slot_scene(sb)
p_full = expand_slot_scene(p)
for k in ("delta_lt_x", "fn_y", "overlap"):
    va = np.asarray(sb_full[k])[actb][ab]
    vb = np.asarray(p_full[k])[b]
    np.testing.assert_allclose(va, vb, atol=1e-6, err_msg=k)
print("slab+pallas 1-device (blob/compact): ok, matches plain step",
      flush=True)
