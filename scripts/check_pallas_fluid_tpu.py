"""On-TPU (compiled, interpret=False) equivalence check of the Pallas
fluid passes vs the XLA cell engine.

Same scene and tolerances as tests/test_pallas_fluid.py, which runs the
kernels in interpret mode on CPU; this script is the real-hardware gate
(round-3 shipped a broken _D-deep DMA pipeline that interpret mode
masked by clamping an out-of-bounds buffer index — this catches that
class of bug).  Exit code 0 = all three passes match.

Run: python scripts/check_pallas_fluid_tpu.py
"""

import os
import sys

import numpy as np

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(_here, ".."))
sys.path.insert(0, os.path.join(_here, "..", "tests"))

import jax
import jax.numpy as jnp

from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cellmod
from rigid_body_2d_3d_pysph_tpu.ops import fluid_cell as fcops
from rigid_body_2d_3d_pysph_tpu.ops import pallas_fluid as pfops
from rigid_body_2d_3d_pysph_tpu.ops.kernels import QuinticSpline


def main():
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}",
          flush=True)
    from test_fluid_coupling import _tank_scene

    scheme, scene, dx, gy, rho0 = _tank_scene(with_body=True)
    f32 = jnp.float32
    fields = {k: (v.astype(f32) if hasattr(v, "dtype")
                  and v.dtype in (jnp.float64, jnp.float32) else v)
              for k, v in scene.fields.items()}
    scene = type(scene)(fields, scene.meta)
    rng = np.random.default_rng(5)
    scene = scene.replace(
        u=jnp.asarray(rng.uniform(-0.2, 0.2, scene.n), f32),
        v=jnp.asarray(rng.uniform(-0.2, 0.2, scene.n), f32))
    kernel = QuinticSpline(dim=2)
    cfg = cellmod.config_from_positions(
        np.asarray(scene.x), np.asarray(scene.y), np.asarray(scene.z),
        3.0 * dx, 2, cell_chunk=32)
    c0 = float(np.asarray(scene.cs)[0])
    nu_edac = 0.02
    ga = (0.0, float(gy), 0.0)

    @jax.jit
    def run(scene):
        grid = cellmod.build_cell_grid(scene.x, scene.y, scene.z,
                                       scene.active, cfg)
        df, di = fcops.pack_fluid_scene(scene, grid, cfg)
        dfp, dfT = pfops.pack_fluid_pallas(scene, grid, cfg)
        rates_c = fcops.fluid_rates_cell(scene, grid, cfg, kernel, df, di,
                                         nu_edac, c0, True, True)
        rates_p = pfops.fluid_rates_pallas(scene, grid, cfg, kernel, dfp,
                                           dfT, nu_edac, c0, True, True)
        wall_c = fcops.wall_bc_cell(scene, grid, cfg, kernel, df, di, *ga)
        wall_p = pfops.wall_bc_pallas(scene, grid, cfg, kernel, dfp, dfT,
                                      *ga)
        uf, vf, wf, sw, p_num = wall_c
        has = sw > 1e-14
        p_bc = jnp.where(has, p_num / jnp.where(has, sw, 1.0), p_num)
        bd = scene.is_static_boundary & scene.active
        rb = scene.is_rigid & scene.active
        scene2 = scene.replace(
            p=jnp.where(bd, jnp.maximum(p_bc, 0.0), scene.p),
            p_fsi=jnp.where(rb, p_bc, scene.p_fsi))
        p_d = cellmod.pack_fields(grid, cfg, [scene2.p], [0.0])[..., 0]
        pfsi_d = cellmod.pack_fields(grid, cfg, [scene2.p_fsi],
                                     [0.0])[..., 0]
        force_c = fcops.fluid_forces_cell(scene2, grid, cfg, kernel, df,
                                          di, p_d, pfsi_d, 0.1, c0, True)
        dfp2, dfT2 = pfops.pack_fluid_pallas(scene2, grid, cfg)
        force_p = pfops.fluid_forces_pallas(scene2, grid, cfg, kernel,
                                            dfp2, dfT2, 0.1, c0, True)
        return grid.overflow, rates_c, rates_p, wall_c, wall_p, \
            force_c, force_p

    ovf, rates_c, rates_p, wall_c, wall_p, force_c, force_p = run(scene)
    assert not bool(ovf), "grid overflow"
    ok = True
    for nm, a, b, atol in (
            [(n, a, b, 2e-4) for n, a, b in
             zip(["arho", "ap"], rates_c, rates_p)]
            + [(n, a, b, 2e-5) for n, a, b in
               zip(["uf", "vf", "wf", "sw", "p_num"], wall_c, wall_p)]
            + [(n, a, b, 2e-3) for n, a, b in
               zip(["au", "av", "aw", "fx", "fy", "fz"], force_c,
                   force_p)]):
        a, b = np.asarray(a), np.asarray(b)
        try:
            np.testing.assert_allclose(b, a, rtol=2e-4, atol=atol)
            print(f"  {nm:6s} OK   max|d|={np.abs(b - a).max():.3e}",
                  flush=True)
        except AssertionError as e:
            ok = False
            print(f"  {nm:6s} FAIL max|d|={np.abs(b - a).max():.3e}",
                  flush=True)
    print("PALLAS_FLUID_TPU", "OK" if ok else "FAIL", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
