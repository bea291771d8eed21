"""Throughput benchmark: contact-scheme steps/sec at ~100k particles.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload: the rigid-body contact pipeline (benchmark-3 physics: bodies
under gravity over a tank, full Mofidi contact + GTVF step) at ~100k
particles, 2D, float32 — the configuration the north-star metric tracks
(BASELINE.md: steps/sec at 100k on one chip).

``vs_baseline``: speedup over the SAME fused program executed by XLA on
the host CPU (all cores) — our stand-in for the reference's
OpenMP-parallel C loops, measured in a subprocess so both backends get
identical code.  The reference publishes no numbers (BASELINE.md), so a
measured same-machine CPU baseline is the honest comparison.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_STEPS = int(os.environ.get("BENCH_STEPS", 200))
# the host has ONE CPU core behind this TPU: a few baseline steps are
# ~25 s each at 100k particles, so keep the default sample small
CPU_STEPS = int(os.environ.get("BENCH_CPU_STEPS", 4))


def n_target() -> int:
    """BENCH_N, read at CALL time (not import time) so callers like
    __graft_entry__.dryrun_multichip can set it after importing bench
    (the round-3 dryrun silently ran at 100k because of an import-time
    read)."""
    return int(os.environ.get("BENCH_N", 100_000))


def build_scene():
    from rigid_body_2d_3d_pysph_tpu.geom import (
        get_2d_block, create_tank_2d_from_block_2d,
    )
    from rigid_body_2d_3d_pysph_tpu.models.rigid_body import RigidBody2DScheme
    from rigid_body_2d_3d_pysph_tpu.state import (
        make_group, build_scene, ROLE_RIGID, ROLE_BOUNDARY,
    )

    # 8 large bodies falling into a tank; body size derived from the
    # particle target
    n_bodies = 8
    side = max(int(np.sqrt(max(n_target(), 1000) / n_bodies)), 12)
    dx = 0.2 / (side - 1)
    xb1, yb1 = get_2d_block(dx, 0.2, 0.2)
    xs, ys, bid = [], [], []
    for b in range(n_bodies):
        col, row = b % 4, b // 4
        xs.append(xb1 + col * 0.25)
        ys.append(yb1 + 0.3 + row * 0.25)
        bid.append(np.full(len(xb1), b, np.int32))
    xb, yb = np.concatenate(xs), np.concatenate(ys)
    bid = np.concatenate(bid)
    xt, yt = create_tank_2d_from_block_2d(
        np.array([-0.15, 1.1]), np.array([0.0, 1.2]), 1.25, 1.2, dx, 3)
    m = 2000.0 * dx * dx
    body = make_group("body", xb, yb, m=m, h=1.3 * dx, rho=2000.0,
                      rad_s=dx / 2, role=ROLE_RIGID, body_id=bid, dem_id=bid,
                      constants={"E": 69e9, "poisson_ratio": 0.3})
    tank = make_group("tank", xt, yt, m=m, h=1.3 * dx, rho=2000.0,
                      rad_s=dx / 2, role=ROLE_BOUNDARY, dem_id=n_bodies,
                      constants={"E": 69e9, "poisson_ratio": 0.3})
    scene = build_scene([body, tank], dim=2, total_no_bodies=n_bodies + 1,
                        spacing0=dx)
    scheme = RigidBody2DScheme(rigid_bodies=["body"], boundaries=["tank"],
                               gy=-9.81, dim=2)
    # let the baseline run the engine that suits its platform (the dense
    # cell formulation is TPU-optimal; [N,K] lists suit the CPU better)
    # TPU default: the fused Pallas pair kernel; the CPU baseline runs
    # the XLA cell engine (Pallas is TPU-only).
    default_engine = ("pallas" if os.environ.get("RB_TPU_PLATFORM") != "cpu"
                      else "cell")
    scheme.engine = os.environ.get("BENCH_ENGINE", default_engine)
    scene = scheme.setup(scene)
    return scheme, scene


def build_scene_3d():
    """~BENCH_N-particle 3D contact scene (benchmark-5-3d-like: cubes
    falling onto a floor slab) on the 27-cell stencil path."""
    from rigid_body_2d_3d_pysph_tpu.geom import get_3d_block
    from rigid_body_2d_3d_pysph_tpu.models.rigid_body import RigidBody3DScheme
    from rigid_body_2d_3d_pysph_tpu.state import (
        make_group, build_scene, ROLE_RIGID, ROLE_BOUNDARY,
    )

    n_bodies = 8
    side = max(int(round((max(n_target(), 1000) / n_bodies) ** (1 / 3))), 5)
    dx = 0.2 / (side - 1)
    xb1, yb1, zb1 = get_3d_block(dx, 0.2, 0.2, 0.2)
    xs, ys, zs, bid = [], [], [], []
    for b in range(n_bodies):
        col, row = b % 4, b // 4
        xs.append(xb1 + col * 0.25)
        ys.append(yb1 + 0.1 + 0.05 * (b % 3))
        zs.append(zb1 + row * 0.25)
        bid.append(np.full(len(xb1), b, np.int32))
    xb = np.concatenate(xs)
    yb = np.concatenate(ys)
    zb = np.concatenate(zs)
    bid = np.concatenate(bid)
    # floor slab, 3 layers
    gx = np.arange(-0.2, 1.3, dx)
    gz = np.arange(-0.2, 0.7, dx)
    fx, fz = np.meshgrid(gx, gz)
    xs_f, ys_f, zs_f = [], [], []
    for layer in range(3):
        xs_f.append(fx.ravel())
        zs_f.append(fz.ravel())
        ys_f.append(np.full(fx.size, yb.min() - (layer + 1) * dx))
    xf = np.concatenate(xs_f)
    yf = np.concatenate(ys_f)
    zf = np.concatenate(zs_f)
    m = 2000.0 * dx**3
    body = make_group("body", xb, yb, z=zb, m=m, h=1.3 * dx, rho=2000.0,
                      rad_s=dx / 2, role=ROLE_RIGID, body_id=bid,
                      dem_id=bid,
                      constants={"E": 69e9, "poisson_ratio": 0.3})
    floor = make_group("floor", xf, yf, z=zf, m=m, h=1.3 * dx, rho=2000.0,
                       rad_s=dx / 2, role=ROLE_BOUNDARY, dem_id=n_bodies,
                       constants={"E": 69e9, "poisson_ratio": 0.3})
    scene = build_scene([body, floor], dim=3, total_no_bodies=n_bodies + 1,
                        spacing0=dx)
    scheme = RigidBody3DScheme(rigid_bodies=["body"], boundaries=["floor"],
                               gy=-9.81, dim=3)
    default_engine = ("pallas" if os.environ.get("RB_TPU_PLATFORM") != "cpu"
                      else "cell")
    scheme.engine = os.environ.get("BENCH_ENGINE", default_engine)
    scene = scheme.setup(scene)
    return scheme, scene


def build_dem_scene():
    """~BENCH_N-grain column over a floor (the dem_granular_column_collapse
    geometry scaled up) on the cell-engine DEM path."""
    from rigid_body_2d_3d_pysph_tpu.geom import get_2d_block
    from rigid_body_2d_3d_pysph_tpu.models.dem import DEMScheme
    from rigid_body_2d_3d_pysph_tpu.state import (
        make_group, build_scene, ROLE_RIGID, ROLE_BOUNDARY,
    )

    radius, s, rho = 1e-3, 2.1e-3, 2600.0
    k = np.sqrt(max(n_target(), 1000) / 1130.0)
    w, h = 0.05 * k, 0.1 * k
    xg, yg = get_2d_block(s, w, h)
    yg -= yg.min() - radius
    m = rho * np.pi * radius**2
    grains = make_group("sand", xg, yg, m=m, h=2.0 * radius, rho=rho,
                        rad_s=radius, role=ROLE_RIGID,
                        body_id=np.arange(len(xg), dtype=np.int32),
                        dem_id=0)
    xf = np.arange(-3.5 * h, 3.5 * h, 2 * radius)
    yf = np.full(len(xf), -radius)
    floor = make_group("floor", xf, yf, m=m, h=2.0 * radius, rho=rho,
                       rad_s=radius, role=ROLE_BOUNDARY, dem_id=1)
    scene = build_scene([grains, floor], dim=2, total_no_bodies=2,
                        spacing0=s)
    scheme = DEMScheme(granular_particles=["sand"], boundaries=["floor"],
                       kn=1e5, en=0.5, mu=0.5, dim=2, gy=-9.81,
                       max_tng_contacts_limit=8)
    default_engine = ("pallas" if os.environ.get("RB_TPU_PLATFORM") != "cpu"
                      else "cell")
    scheme.engine = os.environ.get("BENCH_ENGINE", default_engine)
    scene = scheme.setup(scene)
    return scheme, scene


def build_dem_scene_3d():
    """~BENCH_N-sphere 3D granular column over a floor plane (the
    reference DEM is sphere-sphere 3D, code/dem.py:35-205)."""
    from rigid_body_2d_3d_pysph_tpu.models.dem import DEMScheme
    from rigid_body_2d_3d_pysph_tpu.state import (
        make_group, build_scene, ROLE_RIGID, ROLE_BOUNDARY,
    )

    radius, s, rho = 1e-3, 2.1e-3, 2600.0
    base = (0.05 * 0.1 * 0.05) / s**3           # grains at unit scale
    k = (max(n_target(), 1000) / base) ** (1.0 / 3.0)
    w, h, d = 0.05 * k, 0.1 * k, 0.05 * k
    ax = np.arange(0.0, w, s)
    ay = np.arange(0.0, h, s)
    az = np.arange(0.0, d, s)
    gx_, gy_, gz_ = np.meshgrid(ax, ay, az)
    xg, yg, zg = gx_.ravel(), gy_.ravel(), gz_.ravel()
    yg = yg - yg.min() + radius
    m = rho * (4.0 / 3.0) * np.pi * radius**3
    grains = make_group("sand", xg, yg, z=zg, m=m, h=2.0 * radius,
                        rho=rho, rad_s=radius, role=ROLE_RIGID,
                        body_id=np.arange(len(xg), dtype=np.int32),
                        dem_id=0)
    fx_, fz_ = np.meshgrid(np.arange(-1.5 * w, 2.5 * w, 2 * radius),
                           np.arange(-1.5 * d, 2.5 * d, 2 * radius))
    xf, zf = fx_.ravel(), fz_.ravel()
    yf = np.full(len(xf), -radius)
    floor = make_group("floor", xf, yf, z=zf, m=m, h=2.0 * radius,
                       rho=rho, rad_s=radius, role=ROLE_BOUNDARY,
                       dem_id=1)
    scene = build_scene([grains, floor], dim=3, total_no_bodies=2,
                        spacing0=s)
    scheme = DEMScheme(granular_particles=["sand"], boundaries=["floor"],
                       kn=1e5, en=0.5, mu=0.5, dim=3, gy=-9.81,
                       max_tng_contacts_limit=8)
    default_engine = ("pallas" if os.environ.get("RB_TPU_PLATFORM") != "cpu"
                      else "cell")
    scheme.engine = os.environ.get("BENCH_ENGINE", default_engine)
    scene = scheme.setup(scene)
    return scheme, scene


def build_coupling_scene():
    """~BENCH_N-particle rigid-fluid coupling scene: the sinking-box FSI
    case (Sun 2015; the reference's largest workload) with the particle
    spacing scaled to hit the target count."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "cases"))
    from rigid_body_rotating_and_sinking_in_tank_2d import SinkingBox

    app = SinkingBox(fname="bench_coupling")
    # the stock case is ~33k particles at dx=0.02; scale dx for BENCH_N
    # through the case's own initialize so every spacing-derived
    # quantity (h, dt) comes from one place
    scale = np.sqrt(33_000.0 / max(n_target(), 2000))
    app.initialize(spacing=0.02 * scale)
    app.scheme = app.create_scheme()
    app.scheme.configure(dim=2)
    scheme = app.scheme.scheme
    default_engine = ("pallas" if os.environ.get("RB_TPU_PLATFORM") != "cpu"
                      else "cell")
    scheme.engine = os.environ.get("BENCH_ENGINE", default_engine)
    scene = app.create_particles()
    dt = 0.25 * app.fluid_spacing * app.hdx / (app.co * 1.1)
    return scheme, scene, dt


def measure_slab(n_steps: int) -> dict:
    """BENCH_WORKLOAD=slab: the slab-sharded step (shard_map + ppermute
    + Pallas kernel) on a 1-device mesh of the real chip vs the plain
    unsharded step — the measured (not extrapolated) per-step overhead
    of the multi-chip path's decomposition/halo machinery.  On real
    multi-chip hardware the same code scales n_dev."""
    import time as _t

    import jax
    import jax.numpy as jnp
    from rigid_body_2d_3d_pysph_tpu.ops.kernels import get_kernel
    from rigid_body_2d_3d_pysph_tpu.parallel import slab as slabmod
    from rigid_body_2d_3d_pysph_tpu.parallel.sharded import make_mesh

    scheme, scene = build_scene()
    kernel = get_kernel(scheme.kernel_name, scheme.dim)
    base = scheme.cell_config(scene, kernel)
    dt = jnp.asarray(1e-4)

    def time_chain(stepfn, state, leaf, per_call=1):
        out = stepfn(state, dt)
        jax.block_until_ready(out.fields[leaf])
        t0 = _t.perf_counter()
        s = out
        for _ in range(n_steps):
            s = stepfn(s, dt)
        jax.block_until_ready(s.fields[leaf])
        assert not bool(np.asarray(s.nbr_overflow).any())
        return n_steps * per_call / (_t.perf_counter() - t0)

    plain = scheme.make_step(scene)
    plain_sps = time_chain(plain, scene, "x")

    mesh = make_mesh(1)
    cfg = slabmod.make_slab_config(scene, base, 1)
    dec = slabmod.shard_slab_scene(
        slabmod.slab_decompose(scene, cfg,
                               use_blob=scheme._compact_enabled()), mesh)
    # chain steps inside the shard_map: one dispatch per 10 steps, like
    # the plain path's scan chunks (a per-step shard_map dispatch costs
    # ~4 ms over this host's tunnel — half the slab step itself)
    chain = 10
    slab_step = slabmod.make_slab_step(scheme, dec, mesh, cfg,
                                       chain=chain)
    slab_sps = time_chain(slab_step, dec, "x", per_call=chain)
    return dict(steps_per_sec=slab_sps, plain_steps_per_sec=plain_sps,
                n=scene.n, platform=jax.devices()[0].platform)


def measure(n_steps: int) -> dict:
    import jax
    import jax.numpy as jnp
    from rigid_body_2d_3d_pysph_tpu.models.rigid_body import make_multi_step

    workload = os.environ.get("BENCH_WORKLOAD", "rigid")
    if workload == "slab":
        return measure_slab(min(n_steps, 100))
    if workload == "dem":
        scheme, scene = build_dem_scene()
        dt = jnp.asarray(5e-6)
        # (the round-2 scan>25 device fault was specific to the old XLA
        # table program; the Pallas DEM kernel scans clean — verified
        # through scan(50) at 100k grains)
        chunk = min(n_steps, 50)
    elif workload == "dem3d":
        scheme, scene = build_dem_scene_3d()
        dt = jnp.asarray(5e-6)
        chunk = min(n_steps, 50)
    elif workload == "rigid3d":
        scheme, scene = build_scene_3d()
        dt = jnp.asarray(5e-5)
        chunk = min(n_steps, 50)
    elif workload == "coupling":
        scheme, scene, dt_f = build_coupling_scene()
        dt = jnp.asarray(dt_f)
        chunk = min(n_steps, 50)
    else:
        scheme, scene = build_scene()
        dt = jnp.asarray(1e-4)
        chunk = min(n_steps, 50)
    step = scheme.make_step(scene)
    multi = make_multi_step(step, chunk)

    # warmup/compile
    scene_w = multi(scene, dt)
    jax.block_until_ready(scene_w.fields["x"])

    done = 0
    t0 = time.perf_counter()
    s = scene_w
    while done < n_steps:
        s = multi(s, dt)
        done += chunk
    jax.block_until_ready(s.fields["x"])
    el = time.perf_counter() - t0
    assert not bool(np.asarray(s.nbr_overflow)), "neighbor overflow"
    assert np.isfinite(np.asarray(s.fields["x"])).all()
    util = None
    if workload == "rigid" and getattr(scheme, "_compact_enabled",
                                       lambda: False)():
        # utilization telemetry (VERDICT r4 item 9): how many kernel
        # candidate lanes the interest cull leaves vs the analytic true
        # pair count — tracks whether the overcount is shrinking
        try:
            from rigid_body_2d_3d_pysph_tpu.ops import (
                cellpairs as _cm, pallas_contact as _pc,
                pallas_pack as _pk)
            from rigid_body_2d_3d_pysph_tpu.ops.kernels import get_kernel
            kernel = get_kernel(scheme.kernel_name, scheme.dim)
            cfg = scheme.cell_config(s, kernel)

            @jax.jit
            def _probe(s):
                payload = _pc.contact_payload(s, cfg.dim == 2)
                grid, pt = _cm.build_cell_grid_packed(
                    s.x, s.y, s.z, s.active, cfg, payload,
                    want_dense_pos=False)
                dfT = _pk.expand_dft_pallas(pt, grid.n_occupied, cfg,
                                            _pc.sent_fields(cfg.dim == 2))
                interesting, _ = _pc._cull_interesting_slots(
                    dfT, pt.slot_cid, cfg)
                return (grid.n_occupied,
                        jnp.sum(interesting.astype(jnp.int32)))
            n_occ, n_int = jax.device_get(_probe(s))
            lanes = int(n_int) * cfg.M * cfg.O * cfg.M
            true_pairs = scene.n * 48  # ~48 quintic neighbors in 2D
            eff = true_pairs / lanes if lanes else float("inf")
            util = (f"cull {int(n_occ)}->{int(n_int)} slots, "
                    f"{lanes:.3g} candidate lanes/step vs ~{true_pairs:.3g} "
                    f"true pairs (lane efficiency "
                    f"{'inf' if lanes == 0 else f'{eff:.2f}'})")
        except Exception:
            util = None
    return dict(steps_per_sec=done / el, n=scene.n,
                platform=jax.devices()[0].platform, util=util)


if __name__ == "__main__":
    if "--cpu-baseline" in sys.argv:
        # NOTE: env var alone is ignored by the axon plugin; force via
        # the config API (see rigid_body_2d_3d_pysph_tpu.config).
        os.environ["RB_TPU_PLATFORM"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
        r = measure(CPU_STEPS)
        print(json.dumps(r))
        sys.exit(0)

    r = measure(N_STEPS)

    if os.environ.get("BENCH_WORKLOAD") == "slab":
        eff = r["steps_per_sec"] / r["plain_steps_per_sec"]
        print(json.dumps({
            "metric": f"slab-sharded contact steps/sec @ {r['n']} "
                      f"particles (1-device mesh on {r['platform']}; "
                      f"plain step {r['plain_steps_per_sec']:.1f}/s -> "
                      f"slab efficiency {100 * eff:.0f}%)",
            "value": round(r["steps_per_sec"], 3),
            "unit": "steps/sec",
            "vs_baseline": round(eff, 3),
        }))
        sys.exit(0)

    # CPU baseline in a subprocess (same code, XLA CPU on all host cores).
    # BENCH_SKIP_CPU=1 skips it (the 3D/1M baselines take tens of minutes
    # on a 1-core host; vs_baseline comes out null).
    vs = None
    try:
        if os.environ.get("BENCH_SKIP_CPU"):
            raise RuntimeError("skipped")
        env = dict(os.environ, RB_TPU_PLATFORM="cpu")
        env.setdefault("BENCH_ENGINE", "cell")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpu-baseline"],
            capture_output=True, text=True, timeout=3600, env=env)
        for line in out.stdout.strip().splitlines()[::-1]:
            try:
                cpu = json.loads(line)
                vs = r["steps_per_sec"] / cpu["steps_per_sec"]
                break
            except json.JSONDecodeError:
                continue
    except Exception:
        pass

    # ~48 quintic-kernel neighbors per particle in 2D, ~250 in 3D
    workload = os.environ.get("BENCH_WORKLOAD", "rigid")
    name = {"rigid": "rigid-contact", "rigid3d": "rigid-contact-3d",
            "dem": "DEM-LVC", "dem3d": "DEM-LVC-3d",
            "coupling": "rigid-fluid-coupling"}.get(workload, workload)
    # ~48 2D / ~250 3D candidate lanes per query (same ratio for DEM)
    nbrs = 250 if workload in ("rigid3d", "dem3d") else 48
    pair_evals = r["steps_per_sec"] * r["n"] * nbrs * 2  # 2 pair passes
    util = f"; {r['util']}" if r.get("util") else ""
    print(json.dumps({
        "metric": f"{name} steps/sec @ {r['n']} particles "
                  f"({r['platform']}; ~{pair_evals:.3g} contact-pair "
                  f"evals/sec{util})",
        "value": round(r["steps_per_sec"], 3),
        "unit": "steps/sec",
        "vs_baseline": round(vs, 2) if vs else None,
    }))
