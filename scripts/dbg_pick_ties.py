"""Diagnose remaining closest-pick mismatches between the sorted-pack
Pallas path and the XLA fused engine on the SAME 3D spill grid: for
every (particle, entity-slot) where the picked source positions differ,
recompute both candidates' f32 pair distance from raw positions and
report whether they are bit-equal (a genuine tie — pick order
ambiguity) or not (a real bug in one engine)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import numpy as np, jax
from bench import build_scene_3d
from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cm
from rigid_body_2d_3d_pysph_tpu.ops import contact_cell as ccops
from rigid_body_2d_3d_pysph_tpu.ops import pallas_contact as pc
from rigid_body_2d_3d_pysph_tpu.ops.kernels import get_kernel

scheme, scene = build_scene_3d()
kernel = get_kernel(scheme.kernel_name, scheme.dim)
cutoff = float(kernel.radius_scale * np.asarray(scene.h).max())
cfg = cm.config_from_positions(
    np.asarray(scene.x), np.asarray(scene.y), np.asarray(scene.z),
    cutoff, 3, spill=True)

out_s = jax.jit(lambda s: pc.contact_pipeline_sorted_pallas(s, cfg, kernel))(scene)

def xla(s):
    grid = cm.build_cell_grid(s.x, s.y, s.z, s.active, cfg)
    return ccops.contact_pipeline_cell_fused(s, grid, cfg, kernel)
out_x = jax.jit(xla)(scene)

S = scene.meta.total_no_bodies
xs_s = np.asarray(out_s[4]["x_source"]); xs_x = np.asarray(out_x[4]["x_source"])
ys_s = np.asarray(out_s[4]["y_source"]); ys_x = np.asarray(out_x[4]["y_source"])
zs_s = np.asarray(out_s[4]["z_source"]); zs_x = np.asarray(out_x[4]["z_source"])
cd_s = np.asarray(out_s[4]["closest_point_dist_to_source"])
cd_x = np.asarray(out_x[4]["closest_point_dist_to_source"])

mism = np.argwhere((xs_s != xs_x) | (ys_s != ys_x) | (zs_s != zs_x))
print(f"pick mismatches: {len(mism)} / {xs_s.size} (particle, slot) pairs")
print(f"closest_dist bit-equal overall: {np.array_equal(cd_s, cd_x)}")

x32, y32, z32 = map(np.asarray, (scene.x, scene.y, scene.z))
nties = nbug = 0
for (i, s) in mism[:200]:
    # recompute f32 distance particle i -> each picked source position
    def d_to(px, py, pz):
        return np.sqrt((x32[i]-px)**2 + (y32[i]-py)**2 + (z32[i]-pz)**2,
                       dtype=np.float32)
    da = d_to(xs_s[i, s], ys_s[i, s], zs_s[i, s])
    db = d_to(xs_x[i, s], ys_x[i, s], zs_x[i, s])
    if da == db:
        nties += 1
    else:
        nbug += 1
        if nbug <= 10:
            print(f"  i={i} slot={s}: pallas pick d={da:.9f} xla pick d={db:.9f}"
                  f"  (cd_s={cd_s[i,s]:.9f} cd_x={cd_x[i,s]:.9f})")
print(f"of first {min(len(mism),200)} mismatches: {nties} exact ties, {nbug} real divergences")
