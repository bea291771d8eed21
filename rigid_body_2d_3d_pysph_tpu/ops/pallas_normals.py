"""Pallas TPU kernel for the contact-normals pair pass (experimental).

A hand-scheduled variant of ``contact_cell.contact_normals_cell``'s
block computation: one program per occupied cell, the stencil's source
cells DMA'd HBM->VMEM with double buffering, pair math and the per-slot
reductions done in VMEM.  Compared to the XLA cell engine this avoids
materializing the ``[C, O, M, F]`` source blocks in HBM (they live only
in a 2-deep VMEM scratch), trading it for explicit DMA scheduling.

Layout: ``[NC+1, F, L]`` with L = 128 lanes (cell capacity M padded to
the TPU lane width; Mosaic requires DMA slices 128-aligned in the minor
dimension).  Pair matrices are then [L, L] — VPU/MXU-aligned.

Status: numerically validated against the XLA engine in interpret mode
(CPU) and compiled on TPU (tests/test_pallas_normals.py).  The
production step keeps the XLA engine as default; this kernel is the
scheduling template for the round-2 fused pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cellpairs import CellGrid, CellGridConfig
from .kernels import Kernel

_BIG = 1.0e9
LANES = 128
# packed field order (all f32)
_PX, _PY, _PZ, _PM, _PRHO, _PH, _PCFIB, _PDEM, _PRIG = range(9)
_NF = 9
_SENT = [_BIG, _BIG, _BIG, 0.0, 1.0, 1.0, 0.0, -1.0, 0.0]


def pack_for_pallas(scene, grid: CellGrid, cfg: CellGridConfig):
    """[NC_max + 1, F, LANES] f32; last cell row = sentinel; lanes beyond
    M hold sentinel values."""
    from .cellpairs import pack_fields

    dense = pack_fields(
        grid, cfg,
        [scene.x, scene.y, scene.z, scene.m, scene.rho, scene.h,
         scene.contact_force_is_boundary,
         scene.dem_id.astype(scene.x.dtype),
         scene.is_rigid.astype(scene.x.dtype)],
        _SENT)  # [NC, M, F]
    dense = jnp.swapaxes(dense, 1, 2)  # [NC, F, M]
    NC, F, M = dense.shape
    sent_col = jnp.asarray(_SENT, dense.dtype)[None, :, None]
    if M < LANES:
        pad = jnp.broadcast_to(sent_col, (NC, F, LANES - M))
        dense = jnp.concatenate([dense, pad], axis=2)
    sent_cell = jnp.broadcast_to(sent_col, (1, F, LANES))
    return jnp.concatenate([dense, sent_cell], axis=0).astype(jnp.float32)


def _kernel(S, O, cutoff, two_d,
            nbr_ref, qf_ref, df_hbm, out_ref, scratch, sems):
    """One program per cell: accumulate per-slot normal sums [L, S*4]."""
    c = pl.program_id(0)
    q = qf_ref[0]  # [F, L]

    def get_dma(buf, o):
        slot = nbr_ref[c, o]
        return pltpu.make_async_copy(
            df_hbm.at[slot], scratch.at[buf], sems.at[buf])

    get_dma(0, 0).start()

    def body(o, acc):
        buf = jax.lax.rem(o, 2)

        @pl.when(o + 1 < O)
        def _():
            get_dma(1 - buf, o + 1).start()

        get_dma(buf, o).wait()
        s = scratch[buf]  # [F, L]

        xij = q[_PX][:, None] - s[_PX][None, :]
        yij = q[_PY][:, None] - s[_PY][None, :]
        zij = q[_PZ][:, None] - s[_PZ][None, :]
        rij = jnp.sqrt(xij * xij + yij * yij + zij * zij)
        hij = 0.5 * (q[_PH][:, None] + s[_PH][None, :])

        # quintic spline W (support 3h)
        qq = rij / hij
        t3 = jnp.clip(3.0 - qq, 0.0, None)
        t2 = jnp.clip(2.0 - qq, 0.0, None)
        t1 = jnp.clip(1.0 - qq, 0.0, None)
        if two_d:
            sigma = 7.0 / (478.0 * jnp.pi * hij * hij)
        else:
            sigma = 1.0 / (120.0 * jnp.pi * hij * hij * hij)
        wij = sigma * (t3**5 - 6.0 * t2**5 + 15.0 * t1**5)

        s_dem = s[_PDEM][None, :]
        gate = ((s[_PCFIB][None, :] == 1.0)
                & (s_dem != q[_PDEM][:, None])
                & (q[_PRIG][:, None] == 1.0)
                & (rij <= cutoff))
        rinv = 1.0 / jnp.maximum(rij, 1e-30)
        tmp = jnp.where(gate,
                        q[_PM][:, None] / q[_PRHO][:, None] * rinv * wij,
                        0.0)

        cols = []
        for s_id in range(S):
            pick = jnp.where(s_dem == float(s_id), tmp, 0.0)
            cols.append(jnp.stack([
                jnp.sum(pick * xij, axis=1),
                jnp.sum(pick * yij, axis=1),
                jnp.sum(pick * zij, axis=1),
                jnp.sum(pick * rij, axis=1),
            ], axis=-1))  # [L, 4]
        return acc + jnp.concatenate(cols, axis=-1)  # [L, S*4]

    acc0 = jnp.zeros((LANES, S * 4), jnp.float32)
    out_ref[0] = jax.lax.fori_loop(0, O, body, acc0)


def pallas_contact_normal_sums(df_ext, nbr_slots, cfg: CellGridConfig,
                               kernel: Kernel, S: int,
                               interpret: bool = False):
    """Per-slot normal sums [NC_max, M, S, 4] (raw, pre-normalization;
    identical to the XLA engine's block sums).  ``df_ext`` from
    :func:`pack_for_pallas`."""
    NCp1, F, L = df_ext.shape
    NC = NCp1 - 1
    O = nbr_slots.shape[1]
    slots = jnp.minimum(nbr_slots, NC).astype(jnp.int32)

    kern = functools.partial(_kernel, S, O, cfg.radius, cfg.dim == 2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NC,),
        in_specs=[
            pl.BlockSpec((1, F, L), lambda c, nbr: (c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, L, S * 4), lambda c, nbr: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, F, L), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((NC, L, S * 4), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(slots, df_ext[:NC], df_ext)
    return out[:, : cfg.M, :].reshape(NC, cfg.M, S, 4)
