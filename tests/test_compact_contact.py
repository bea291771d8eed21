"""Compact slot-state pipeline vs the full sorted-pack path.

The compact path (``rigid_contact_force_eval_compact``) runs the Pallas
kernel + Eq.-24 tail only on culled interesting slots and stores slot
state compactly (``cl_pid``/``cl_state`` instead of 25 [N, S] fields).
Expanded, it must match the full path on every field — including the
persistent tangential springs across steps — because non-interesting
lanes' full-path outputs are exactly the init row.  Interpret mode on
CPU.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rigid_body_2d_3d_pysph_tpu.geom import get_2d_block
from rigid_body_2d_3d_pysph_tpu.models import rigid_body as rb
from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cellmod
from rigid_body_2d_3d_pysph_tpu.ops.kernels import QuinticSpline
from rigid_body_2d_3d_pysph_tpu.state import (
    make_group, build_scene, ROLE_RIGID, ROLE_BOUNDARY,
)
from rigid_body_2d_3d_pysph_tpu.state import rigid_setup as rs

PARAMS = dict(kr=1e5, kf=1e3, fric_coeff=0.5, gx=0.0, gy=-9.81, gz=0.0)

# every field the stage-2 eval updates
CHECK = ("fx", "fy", "fz", "force", "torque") + rb.SLOT_FIELDS


def _scene_f32():
    """Two touching bodies resting just above a wall — real contacts, so
    the interesting set is nonempty and spring state evolves."""
    dx = 0.05
    xb, yb = get_2d_block(dx, 0.2, 0.2)
    x = np.concatenate([xb, xb + 0.2 + 0.6 * dx])
    y = np.concatenate([yb, yb])
    bid = np.concatenate([np.zeros(len(xb), np.int32),
                          np.ones(len(xb), np.int32)])
    xw = np.arange(-10, 20) * dx
    yw = np.full(len(xw), yb.min() - 0.7 * dx)
    body = make_group("body", x, y, m=2000 * dx * dx, h=1.3 * dx,
                      rho=2000.0, rad_s=dx / 2, role=ROLE_RIGID,
                      body_id=bid, dem_id=bid)
    wall = make_group("wall", xw, yw, m=2000 * dx * dx, h=1.3 * dx,
                      rho=2000.0, rad_s=dx / 2, role=ROLE_BOUNDARY,
                      dem_id=2)
    scene = build_scene([body, wall], dim=2, total_no_bodies=3, spacing0=dx)
    scene = rs.setup_body_state(scene)
    scene = rb._attach_contact_fields(scene)
    rng = np.random.default_rng(11)
    n = scene.n
    f32 = jnp.float32
    fields = {k: (v.astype(f32) if hasattr(v, "dtype")
                  and v.dtype in (jnp.float64, jnp.float32) else v)
              for k, v in scene.fields.items()}
    scene = type(scene)(fields, scene.meta)
    scene = scene.replace(
        contact_force_is_boundary=jnp.ones(n, f32),
        u=jnp.asarray(rng.uniform(-1, 1, n), f32),
        v=jnp.asarray(rng.uniform(-1, 1, n), f32),
        vcm=jnp.asarray([[0.1, -0.2, 0.0], [-0.1, 0.1, 0.0]], f32),
    )
    return scene, dx


def _setup():
    scene, dx = _scene_f32()
    kernel = QuinticSpline(dim=2)
    cutoff = 3 * 1.3 * dx
    cfg = cellmod.config_from_positions(
        np.asarray(scene.x), np.asarray(scene.y), np.asarray(scene.z),
        cutoff, 2, cell_chunk=16)
    assert cfg.spill
    return scene, kernel, cfg, jnp.float32(1e-4)


def _mini_step(scene, cfg, kernel, dt, eval_fn, two_d=True):
    """The GTVF sequence around a given stage-2 force eval."""
    scene = rb._body_half_kick(scene, dt, two_d)
    scene = rb._particles_from_body_velocity(scene)
    scene, ovf = eval_fn(scene)
    scene = rb._body_drift(scene, dt, two_d)
    scene = rb._particles_from_body_position(scene)
    scene = rb._body_half_kick(scene, dt, two_d)
    scene = rb._particles_from_body_velocity(scene)
    return scene, ovf


def _compare(s_full, s_comp_expanded, exact=True):
    assert float(np.abs(np.asarray(s_full.overlap)).max()) > 0  # nonvacuous
    for name in CHECK + ("x", "y", "u", "v", "xcm", "vcm", "omega"):
        a = np.asarray(s_full.fields[name])
        b = np.asarray(s_comp_expanded.fields[name])
        if exact:
            ok = np.array_equal(a, b)
        else:
            scale = max(np.abs(a).max(), 1.0)
            ok = np.allclose(a, b, rtol=1e-5, atol=1e-5 * scale)
        assert ok, f"{name}: max abs diff {np.abs(a - b).max()}"


@pytest.mark.parametrize("ni_max", ["full", "tight"])
def test_compact_matches_sorted_bitwise(ni_max):
    """Op-level bit parity: run the two paths EAGERLY (each primitive
    executed standalone) so XLA cannot re-fuse/FMA-contract the shared
    tail math differently per program — any bit difference is then a
    real logic difference.  (A single jitted program containing both
    paths shows ~1-ulp fusion-reassociation noise on XLA:CPU; the
    jitted-closeness test below covers that form.)"""
    scene, kernel, cfg, dt = _setup()
    # tight: a capacity well under NC (but >= the actual interesting
    # count) exercises the compacted static shapes + sentinel rows
    ni = cfg.NC_max if ni_max == "full" else max(32, cfg.NC_max // 4)

    s_full = scene
    s_comp = rb.compact_slot_scene(scene, ni * cfg.M)
    for _ in range(3):
        s_full, o1 = _mini_step(
            scene=s_full, cfg=cfg, kernel=kernel, dt=dt,
            eval_fn=lambda s: rb.rigid_contact_force_eval_sorted(
                s, cfg, kernel, PARAMS, dt, interpret=True))
        s_comp, o2 = _mini_step(
            scene=s_comp, cfg=cfg, kernel=kernel, dt=dt,
            eval_fn=lambda s: rb.rigid_contact_force_eval_compact(
                s, cfg, kernel, PARAMS, dt, ni, interpret=True))
        assert not bool(o1) and not bool(o2)

    _compare(s_full, rb.expand_slot_scene(s_comp), exact=True)


def test_compact_matches_sorted_jitted_close():
    """Both paths inside one jitted program: XLA may fuse the shared
    f32 tail math differently (FMA contraction), so this asserts
    f32-ulp-scale closeness, not bit equality."""
    scene, kernel, cfg, dt = _setup()
    ni = cfg.NC_max
    s_comp0 = rb.compact_slot_scene(scene, ni * cfg.M)

    @jax.jit
    def run(s_full, s_comp):
        ovfs = []
        for _ in range(3):
            s_full, o1 = _mini_step(
                scene=s_full, cfg=cfg, kernel=kernel, dt=dt,
                eval_fn=lambda s: rb.rigid_contact_force_eval_sorted(
                    s, cfg, kernel, PARAMS, dt, interpret=True))
            s_comp, o2 = _mini_step(
                scene=s_comp, cfg=cfg, kernel=kernel, dt=dt,
                eval_fn=lambda s: rb.rigid_contact_force_eval_compact(
                    s, cfg, kernel, PARAMS, dt, ni, interpret=True))
            ovfs.append(o1 | o2)
        return s_full, s_comp, jnp.stack(ovfs)

    s_full, s_comp, ovfs = run(scene, s_comp0)
    assert not bool(np.asarray(ovfs).any())
    _compare(s_full, rb.expand_slot_scene(s_comp), exact=False)


def test_compact_roundtrip_with_state():
    """compact -> expand -> compact round-trips a scene carrying real
    slot state (the Solver's rebuild/migration path)."""
    scene, kernel, cfg, dt = _setup()
    ni = cfg.NC_max
    s = rb.compact_slot_scene(scene, ni * cfg.M)
    for _ in range(2):
        s, _ = _mini_step(
            scene=s, cfg=cfg, kernel=kernel, dt=dt,
            eval_fn=lambda sc: rb.rigid_contact_force_eval_compact(
                sc, cfg, kernel, PARAMS, dt, ni, interpret=True))
    full = rb.strip_compact_fields(rb.expand_slot_scene(s))
    re_c = rb.compact_slot_scene(full, ni * cfg.M)
    # migration must also pad cleanly
    mig = rb.migrate_compact_scene(re_c, ni * cfg.M + 64)
    back = rb.expand_slot_scene(mig)
    for name in rb.CL_FIELDS:
        a = np.asarray(rb.expand_slot_scene(s).fields[name])
        b = np.asarray(back.fields[name])
        assert np.array_equal(a, b), name


def test_compact_overflow_flag():
    """ni_max below the interesting count must raise the overflow flag
    (the Solver's rebuild path keys off it)."""
    scene, kernel, cfg, dt = _setup()
    s = rb.compact_slot_scene(scene, 2 * cfg.M)

    @jax.jit
    def run(s):
        _, ovf = rb.rigid_contact_force_eval_compact(
            s, cfg, kernel, PARAMS, dt, 2, interpret=True)
        return ovf

    assert bool(run(s))
