"""Spatially-local multi-chip sharding: x-slab decomposition with
``shard_map`` + ``ppermute`` halo exchange.

The GSPMD row-sharding path (``parallel/sharded.py``) is correct but
communication-oblivious: neighbor gathers across shards lower to full
all-gathers — O(N) ICI traffic per step per chip.  This module is the
SURVEY §7.7 / §2.3.4 plan executed for real: devices own contiguous
x-slabs of the *cell grid*, each step exchanges only the boundary strip
(O(halo)) with its two ring neighbors, and per-body force/torque
reductions ride one small ``psum``.  There is no reference file to
match — the reference is single-node OpenMP (``automate.py:17-19``);
this is the TPU-native scaling story for the particle axis.

Design:

* The cell-grid layout (origin/dims/cell size) stays GLOBAL and static;
  a device simply bins *its own* particles (+ received ghosts), so every
  device runs the identical program and no per-device grid config is
  needed.  Slab d owns cells with ``cx in [d*W, (d+1)*W)``.
* Host-side ``slab_decompose`` sorts particles by slab and pads each
  slab to a uniform per-device capacity (static shapes); ownership is
  re-established between device chunks by ``redistribute`` (classic
  MD-style re-decomposition; the in-step halo covers intra-chunk drift,
  and the step raises ``nbr_overflow`` if a particle outruns it).
* Per step, each device compacts the particles within ``halo_width`` of
  its slab faces into fixed-capacity send buffers, ``ppermute``s them to
  the ring neighbors, appends the received rows as source-only ghosts
  (``is_rigid=0`` so they never act as queries and never contribute
  force rows), and runs the standard fused cell-engine contact pipeline
  on the extended local scene.
* Per-body state is replicated; every device computes the identical
  body update from the ``psum``-reduced force/torque.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import config
from ..ops import cellpairs as cellmod
from ..state.scene import Scene

# fields a ghost (source-only) particle must carry into the pair pass
GHOST_FIELDS = ("x", "y", "z", "u", "v", "w", "h", "m", "rho",
                "contact_force_is_boundary")
_BIG = 1.0e9


@dataclass(frozen=True)
class SlabConfig:
    """Static decomposition parameters (identical on every device)."""

    base: cellmod.CellGridConfig  # global grid geometry
    n_dev: int                    # devices along the slab axis
    slab_cells: int               # owned cell columns per device
    n_cap: int                    # particle capacity per device
    halo_cap: int                 # ghost capacity per face
    nc_max_local: int             # occupied-cell bound per device

    @property
    def halo_width(self) -> float:
        # one stencil ring of cells covers cutoff + skin
        return self.base.cell * self.base.sub

    def slab_lo(self, d):
        """x of slab d's lower face (traced-friendly)."""
        return self.base.origin[0] + (self.base.sub + d * self.slab_cells
                                      ) * self.base.cell


def _slab_of(x, cfg: SlabConfig):
    """Owning slab index per particle (clipped to the mesh)."""
    cx = np.floor((np.asarray(x) - cfg.base.origin[0]) / cfg.base.cell
                  ).astype(np.int64) - cfg.base.sub
    return np.clip(cx // cfg.slab_cells, 0, cfg.n_dev - 1)


def make_slab_config(scene: Scene, base: cellmod.CellGridConfig,
                     n_dev: int, cap_safety: float = 1.35,
                     halo_safety: float = 2.0) -> SlabConfig:
    """Size the decomposition from the initial particle distribution."""
    gx = base.dims[0]
    interior = gx - 2 * base.sub
    slab_cells = -(-interior // n_dev)
    cfg = SlabConfig(base=base, n_dev=n_dev, slab_cells=int(slab_cells),
                     n_cap=0, halo_cap=0, nc_max_local=0)
    slab = _slab_of(scene.x, cfg)
    counts = np.bincount(slab, minlength=n_dev)
    n_cap = int(-(-int(counts.max() * cap_safety) // 8) * 8)
    # ghosts per face: particles within one cell ring of a face
    x = np.asarray(scene.x)
    h_max = 0
    for d in range(n_dev):
        lo = cfg.slab_lo(d)
        hi = cfg.slab_lo(d + 1)
        w = cfg.halo_width
        h_max = max(h_max,
                    int(((x >= lo) & (x < lo + w)).sum()),
                    int(((x >= hi - w) & (x < hi)).sum()))
    halo_cap = int(-(-max(8, int(h_max * halo_safety)) // 8) * 8)
    # occupied cells per slab region (+ the two halo rings)
    cells = np.floor((x - base.origin[0]) / base.cell).astype(np.int64)
    cy = np.floor((np.asarray(scene.y) - base.origin[1]) / base.cell
                  ).astype(np.int64)
    cz = (np.floor((np.asarray(scene.z) - base.origin[2]) / base.cell
                   ).astype(np.int64) if base.dim == 3
          else np.zeros_like(cells))
    nc_local = 0
    for d in range(n_dev):
        m = (slab >= max(d - 1, 0)) & (slab <= min(d + 1, n_dev - 1))
        occ = len(np.unique(np.stack([cells[m], cy[m], cz[m]], 1), axis=0))
        nc_local = max(nc_local, occ)
    nc_max_local = max(64, int(nc_local * 1.6))
    return SlabConfig(base=base, n_dev=n_dev, slab_cells=int(slab_cells),
                      n_cap=n_cap, halo_cap=halo_cap,
                      nc_max_local=nc_max_local)


def slab_decompose(scene: Scene, cfg: SlabConfig) -> Scene:
    """Host-side: order particles by owning slab, pad every slab to
    ``n_cap`` with inactive sentinels -> one [n_dev * n_cap] scene ready
    to shard on axis 0."""
    slab = _slab_of(scene.x, cfg)
    n = scene.n
    perm_parts, pad_rows = [], []
    for d in range(cfg.n_dev):
        idx = np.nonzero(slab == d)[0]
        if len(idx) > cfg.n_cap:
            raise RuntimeError(
                f"slab {d} holds {len(idx)} > capacity {cfg.n_cap}")
        perm_parts.append(idx)
        pad_rows.append(cfg.n_cap - len(idx))

    fields = {}
    for k, v in scene.fields.items():
        arr = np.asarray(v)
        if arr.ndim >= 1 and arr.shape[0] == n:
            parts = []
            for d, idx in enumerate(perm_parts):
                part = arr[idx]
                if pad_rows[d]:
                    pad_shape = (pad_rows[d],) + arr.shape[1:]
                    if k in ("x", "y", "z"):
                        pad = np.full(pad_shape, _BIG, arr.dtype)
                    elif k in ("m", "rho", "h"):
                        pad = np.ones(pad_shape, arr.dtype)
                    else:
                        pad = np.zeros(pad_shape, arr.dtype)
                    part = np.concatenate([part, pad])
                parts.append(part)
            fields[k] = jnp.asarray(np.concatenate(parts))
        else:
            fields[k] = v
    out = Scene(fields, scene.meta)
    return out.replace(active=out.active & (out.x < _BIG / 2))


def redistribute(scene: Scene, cfg: SlabConfig) -> Scene:
    """Host-side re-decomposition between device chunks: re-sort the
    (already slab-ordered, padded) scene by current positions."""
    keep = np.asarray(scene.active)
    idx = np.nonzero(keep)[0]
    fields = {}
    n = scene.n
    for k, v in scene.fields.items():
        arr = np.asarray(v)
        if arr.ndim >= 1 and arr.shape[0] == n:
            fields[k] = arr[idx]
        else:
            fields[k] = v
    packed = Scene({k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
                    for k, v in fields.items()}, scene.meta)
    return slab_decompose(packed, cfg)


# ---------------------------------------------------------------------------
# the sharded step
# ---------------------------------------------------------------------------

def _compact_rows(mask, fields, cap):
    """First ``cap`` rows matching ``mask`` (stable order), as a
    [cap, F+1] buffer whose last column is the validity flag."""
    n = mask.shape[0]
    order = jnp.argsort(jnp.where(mask, 0, 1), stable=True)
    take = order[:cap]
    valid = mask[take]
    cols = [jnp.where(valid, f[take], 0.0) for f in fields]
    cols.append(valid.astype(fields[0].dtype))
    overflow = jnp.sum(mask) > cap
    return jnp.stack(cols, axis=1), overflow


def make_slab_step(scheme, scene: Scene, mesh: Mesh, cfg: SlabConfig):
    """Build the sharded fused step: per-device halo exchange + local
    cell-engine contact evaluation + psum body reduction.

    ``scene`` must already be slab-decomposed (:func:`slab_decompose`)
    and sharded (:func:`shard_slab_scene`).
    """
    from ..models import rigid_body as rb
    from ..ops.kernels import get_kernel

    kernel = get_kernel(scheme.kernel_name, scheme.dim)
    params = dict(kr=scheme.kr, kf=scheme.kf,
                  fric_coeff=scheme.fric_coeff,
                  gx=scheme.gx, gy=scheme.gy, gz=scheme.gz)
    two_d = scheme.two_d
    pipeline = scheme._cell_pipeline()
    base = cfg.base
    # chunk == NC_max so map_over_cells runs the single-block path (a
    # bigger global chunk would pad every device's small local grid up
    # to it, multiplying the per-device pair work)
    local_chunk = min(base.cell_chunk, -(-cfg.nc_max_local // 8) * 8)
    local_cfg = cellmod.CellGridConfig(
        cell=base.cell, M=base.M, NC_max=cfg.nc_max_local,
        origin=base.origin, dims=base.dims, dim=base.dim,
        cell_chunk=local_chunk, cutoff=base.cutoff, sub=base.sub)
    H = cfg.halo_cap
    D = cfg.n_dev
    fdt = config.float_dtype()

    specs = {}
    nrows = scene.n
    for k, v in scene.fields.items():
        if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == nrows:
            specs[k] = P("p", *([None] * (v.ndim - 1)))
        else:
            specs[k] = P()
    keys = sorted(scene.fields.keys())
    scene_spec = Scene({k: specs[k] for k in keys}, scene.meta)

    def local_step(scene_l: Scene, dt):
        d = jax.lax.axis_index("p")
        lo = cfg.slab_lo(d)
        hi = cfg.slab_lo(d + 1)
        w = cfg.halo_width

        scene_l = rb._body_half_kick(scene_l, dt, two_d)
        scene_l = rb._particles_from_body_velocity(scene_l)

        # ---- halo exchange ------------------------------------------------
        act = scene_l.active
        gf = [scene_l[k] for k in GHOST_FIELDS]
        right_buf, ovr = _compact_rows(act & (scene_l.x >= hi - w), gf, H)
        left_buf, ovl = _compact_rows(act & (scene_l.x < lo + w), gf, H)
        dem_r, _ = _compact_rows(act & (scene_l.x >= hi - w),
                                 [scene_l.dem_id.astype(fdt),
                                  scene_l.is_fluid.astype(fdt)], H)
        dem_l, _ = _compact_rows(act & (scene_l.x < lo + w),
                                 [scene_l.dem_id.astype(fdt),
                                  scene_l.is_fluid.astype(fdt)], H)
        right_buf = jnp.concatenate([right_buf, dem_r[:, :2]], axis=1)
        left_buf = jnp.concatenate([left_buf, dem_l[:, :2]], axis=1)

        # ring sends (non-periodic: edge devices receive zeros -> valid=0)
        from_left = jax.lax.ppermute(
            right_buf, "p", [(i, i + 1) for i in range(D - 1)])
        from_right = jax.lax.ppermute(
            left_buf, "p", [(i + 1, i) for i in range(D - 1)])
        ghosts = jnp.concatenate([from_left, from_right], axis=0)  # [2H, F]
        gvalid = ghosts[:, len(GHOST_FIELDS)] > 0.5

        # ---- extended local scene (ghosts are source-only) ----------------
        nl = scene_l.n
        S = scene_l.meta.total_no_bodies
        ext = {}
        gcol = {k: ghosts[:, i] for i, k in enumerate(GHOST_FIELDS)}
        gdem = ghosts[:, len(GHOST_FIELDS) + 1].astype(jnp.int32)
        gfluid = ghosts[:, len(GHOST_FIELDS) + 2] > 0.5
        for k, v in scene_l.fields.items():
            if not (hasattr(v, "ndim") and v.ndim >= 1
                    and v.shape[0] == nl):
                ext[k] = v
                continue
            if k in gcol:
                tail = gcol[k].astype(v.dtype)
                if k in ("x", "y", "z"):
                    tail = jnp.where(gvalid, tail, _BIG)
            elif k == "dem_id":
                tail = jnp.where(gvalid, gdem, -1)
            elif k == "is_fluid":
                tail = gvalid & gfluid
            elif k == "active":
                tail = gvalid
            else:
                # incl. is_rigid=0: ghosts never act as queries
                tail = jnp.zeros((2 * H,) + v.shape[1:], v.dtype)
            ext[k] = jnp.concatenate([v, tail], axis=0)
        scene_e = Scene(ext, scene_l.meta)

        # ---- local grid + fused contact pipeline --------------------------
        grid = cellmod.build_cell_grid(scene_e.x, scene_e.y, scene_e.z,
                                       scene_e.active, local_cfg)
        scene_e = rb.rigid_contact_force_eval_cell(
            scene_e, grid, local_cfg, kernel, params, dt,
            pipeline=pipeline)

        # psum the per-body reduction (ghosts contributed nothing)
        force = jax.lax.psum(scene_e.force, "p")
        torque = jax.lax.psum(scene_e.torque, "p")

        # drop ghost rows, keep the new slot state
        upd = {k: (v[:nl] if hasattr(v, "ndim") and v.ndim >= 1
                   and v.shape[0] == nl + 2 * H else v)
               for k, v in scene_e.fields.items()}
        scene_l = Scene(upd, scene_l.meta)
        scene_l = scene_l.replace(
            force=force, torque=torque,
            nbr_overflow=(scene_l.nbr_overflow | grid.overflow
                          | ovr | ovl))

        scene_l = rb._body_drift(scene_l, dt, two_d)
        scene_l = rb._particles_from_body_position(scene_l)
        scene_l = rb._body_half_kick(scene_l, dt, two_d)
        scene_l = rb._particles_from_body_velocity(scene_l)
        return scene_l

    step = jax.jit(jax.shard_map(
        local_step, mesh=mesh, in_specs=(scene_spec, P()),
        out_specs=scene_spec, check_vma=False))
    return step


def shard_slab_scene(scene: Scene, mesh: Mesh) -> Scene:
    """device_put the slab-decomposed scene: particle rows over 'p',
    everything else replicated."""
    n = scene.n
    fields = {}
    for k, v in scene.fields.items():
        if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == n:
            spec = P("p", *([None] * (v.ndim - 1)))
        else:
            spec = P()
        fields[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return Scene(fields, scene.meta)
