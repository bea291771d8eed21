import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax, jax.numpy as jnp
from bench import build_scene_3d
from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cm
from rigid_body_2d_3d_pysph_tpu.ops import contact_cell as ccops
from rigid_body_2d_3d_pysph_tpu.ops.kernels import get_kernel

scheme, scene = build_scene_3d()
kernel = get_kernel(scheme.kernel_name, scheme.dim)
cfg = scheme.cell_config(scene, kernel)
S = scene.meta.total_no_bodies
NCM = cfg.NC_max * cfg.M

def flat_of(s):
    grid = cm.build_cell_grid(s.x, s.y, s.z, s.active, cfg)
    df, di = ccops.pack_scene(s, grid, cfg)
    cfn_x, cfn_y, cfn_z, sw, dist, mind, srcs = ccops.contact_sums_fused(
        s, grid, cfg, kernel, S, df, di, s.meta.spacing0)
    stacked = jnp.concatenate(
        [jnp.stack([cfn_x, cfn_y, cfn_z, sw, dist, mind], axis=-1), srcs],
        axis=-1).reshape(NCM, S * 12)
    bar = jax.lax.optimization_barrier(stacked)
    return bar.at[grid.dense_pos].get(mode="fill", fill_value=0.0)

v_flat      = jax.jit(lambda s: flat_of(s))                       # [n,108]
v_reshape   = jax.jit(lambda s: flat_of(s).reshape(s.n, S, 12))   # [n,S,12]
v_slice     = jax.jit(lambda s: flat_of(s).reshape(s.n, S, 12)[..., 5])
v_bar_resh  = jax.jit(lambda s: jax.lax.optimization_barrier(
    flat_of(s)).reshape(s.n, S, 12))

exp = np.asarray(v_flat(scene))
for name, fn, post in [
    ("reshape out", v_reshape, lambda a: a.reshape(scene.n, S * 12)),
    ("slice col5", v_slice, None),
    ("barrier-then-reshape", v_bar_resh, lambda a: a.reshape(scene.n, S * 12)),
]:
    got = np.asarray(fn(scene))
    if post is not None:
        d = np.abs(post(got) - exp)
    else:
        d = np.abs(got - exp.reshape(scene.n, S, 12)[..., 5])
    print(f"{name:22s} max|d|={d.max():.3e} bad={int((d>0).sum())}", flush=True)
