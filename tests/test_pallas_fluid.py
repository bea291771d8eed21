"""Pallas fluid-pass kernels vs the XLA cell engine (interpret mode).

Same scene as the coupling tests (fluid + tank + partially submerged
rigid body), run in f32 (the kernels' dtype).  Each of the three passes
(rates R, wall-BC W, forces F) is compared independently; F is fed the
post-wall-BC pressures through a repack, mirroring the scheme wiring.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cellmod
from rigid_body_2d_3d_pysph_tpu.ops import fluid_cell as fcops
from rigid_body_2d_3d_pysph_tpu.ops import pallas_fluid as pfops
from rigid_body_2d_3d_pysph_tpu.ops.kernels import QuinticSpline

from test_fluid_coupling import _tank_scene


def _f32(scene):
    f32 = jnp.float32
    fields = {k: (v.astype(f32) if hasattr(v, "dtype")
                  and v.dtype in (jnp.float64, jnp.float32) else v)
              for k, v in scene.fields.items()}
    return type(scene)(fields, scene.meta)


@pytest.mark.slow
def test_pallas_fluid_passes_match_cell():
    scheme, scene, dx, gy, rho0 = _tank_scene(with_body=True)
    scene = _f32(scene)
    rng = np.random.default_rng(5)
    # non-trivial velocities so rates/viscosity/ghost terms are exercised
    scene = scene.replace(
        u=jnp.asarray(rng.uniform(-0.2, 0.2, scene.n), jnp.float32),
        v=jnp.asarray(rng.uniform(-0.2, 0.2, scene.n), jnp.float32))
    kernel = QuinticSpline(dim=2)
    cutoff = 3.0 * dx
    cfg = cellmod.config_from_positions(
        np.asarray(scene.x), np.asarray(scene.y), np.asarray(scene.z),
        cutoff, 2, cell_chunk=32)
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
                                           dfT, nu_edac, c0, True, True,
                                           interpret=True)

        wall_c = fcops.wall_bc_cell(scene, grid, cfg, kernel, df, di, *ga)
        wall_p = pfops.wall_bc_pallas(scene, grid, cfg, kernel, dfp, dfT,
                                      *ga, interpret=True)

        # wall-BC pressure update (as the scheme does), then forces
        uf, vf, wf, sw, p_num = wall_c
        has = sw > 1e-14
        p_bc = jnp.where(has, p_num / jnp.where(has, sw, 1.0), p_num)
        bd = scene.is_static_boundary & scene.active
        rb = scene.is_rigid & scene.active
        scene2 = scene.replace(
            p=jnp.where(bd, jnp.maximum(p_bc, 0.0), scene.p),
            p_fsi=jnp.where(rb, p_bc, scene.p_fsi))
        from rigid_body_2d_3d_pysph_tpu.ops.cellpairs import pack_fields
        p_d = pack_fields(grid, cfg, [scene2.p], [0.0])[..., 0]
        pfsi_d = pack_fields(grid, cfg, [scene2.p_fsi], [0.0])[..., 0]
        force_c = fcops.fluid_forces_cell(scene2, grid, cfg, kernel, df,
                                          di, p_d, pfsi_d, 0.1, c0, True)
        dfp2, dfT2 = pfops.pack_fluid_pallas(scene2, grid, cfg)
        force_p = pfops.fluid_forces_pallas(scene2, grid, cfg, kernel,
                                            dfp2, dfT2, 0.1, c0, True,
                                            interpret=True)
        return grid.overflow, rates_c, rates_p, wall_c, wall_p, force_c, \
            force_p

    ovf, rates_c, rates_p, wall_c, wall_p, force_c, force_p = run(scene)
    assert not bool(ovf)
    for nm, a, b in zip(["arho", "ap"], rates_c, rates_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-4, err_msg=nm)
    for nm, a, b in zip(["uf", "vf", "wf", "sw", "p_num"], wall_c, wall_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5, err_msg=nm)
    for nm, a, b in zip(["au", "av", "aw", "fx", "fy", "fz"], force_c,
                        force_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-3, err_msg=nm)


def test_kdkf_step_pallas_matches_cell():
    """3 fused-KDK steps: the Pallas fluid branch (interpret mode, with
    its dense column patches) must track the XLA dense branch.  This is
    the only off-TPU coverage of the kdkf pallas wiring — the scheme
    selects it on TPU only."""
    def build(pallas):
        scheme, scene, dx, gy, rho0 = _tank_scene(with_body=True)
        scene = _f32(scene)
        scheme.engine = "cell"
        scheme.gtvf_ordering = "kdkf"
        if pallas:
            scheme.fluid_pallas_interpret = True
        return scheme, scene

    sch_c, sc_c = build(False)
    sch_p, sc_p = build(True)
    step_c = sch_c.make_step(sc_c)
    step_p = sch_p.make_step(sc_p)
    dt = jnp.asarray(1e-4, jnp.float32)
    for _ in range(3):
        sc_c = step_c(sc_c, dt)
        sc_p = step_p(sc_p, dt)
    for k in ("x", "y", "u", "v", "rho", "p", "p_fsi", "arho", "au",
              "av", "fx", "fy"):
        a, b = np.asarray(sc_c[k]), np.asarray(sc_p[k])
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, atol=5e-4 * scale, rtol=0,
                                   err_msg=k)
