"""Shared helpers for neighbor-pair operators.

Every reference ``Equation.loop`` becomes: gather source fields at the
padded ``[N, K]`` neighbor indices, compute the pair quantities
(XIJ/RIJ/WIJ/DWIJ/VIJ/HIJ — the PySPH evaluator's implicit symbols, cf.
``code/rigid_body_common.py:663-690``), mask, and reduce over K (sums) or
scatter into ``[N, S]`` contact slots.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .neighbors import NeighborList


class PairData(NamedTuple):
    j: jnp.ndarray      # [N, K] neighbor indices
    mask: jnp.ndarray   # [N, K] base validity
    xij: jnp.ndarray    # [N, K] x_i - x_j
    yij: jnp.ndarray
    zij: jnp.ndarray
    rij: jnp.ndarray    # [N, K] |xij|
    hij: jnp.ndarray    # [N, K] 0.5 (h_i + h_j)


def pair_data(scene, nbrs: NeighborList) -> PairData:
    j = nbrs.idx
    xij = scene.x[:, None] - scene.x[j]
    yij = scene.y[:, None] - scene.y[j]
    zij = scene.z[:, None] - scene.z[j]
    rij = jnp.sqrt(xij * xij + yij * yij + zij * zij)
    hij = 0.5 * (scene.h[:, None] + scene.h[j])
    return PairData(j=j, mask=nbrs.mask, xij=xij, yij=yij, zij=zij,
                    rij=rij, hij=hij)


def masked_sum(values, mask, axis=1):
    return jnp.sum(jnp.where(mask, values, 0.0), axis=axis)


def scatter_to_slots(values, slot, mask, n_slots: int):
    """Sum [N, K] pair values into [N, S] dem-id slots.

    Implements the reference's strided accumulation
    ``d_prop[d_idx * total_no_bodies + s_dem_id] += v``
    (e.g. ``code/rigid_body_common.py:681-690``).
    """
    n, k = values.shape
    dst = jnp.where(mask, slot, n_slots)  # out-of-range rows dropped
    rows = jnp.broadcast_to(jnp.arange(n)[:, None], (n, k))
    out = jnp.zeros((n, n_slots + 1), values.dtype)
    out = out.at[rows, dst].add(jnp.where(mask, values, 0.0), mode="drop")
    return out[:, :n_slots]


def scatter_min_to_slots(values, slot, mask, n_slots: int, init):
    """Per-(particle, slot) minimum of [N, K] pair values; `init` is the
    starting value (reference inits closest-point distance to
    ``4 * spacing0``, ``code/rigid_body_common.py:765``)."""
    n, k = values.shape
    dst = jnp.where(mask, slot, n_slots)
    rows = jnp.broadcast_to(jnp.arange(n)[:, None], (n, k))
    big = jnp.asarray(init, values.dtype)
    out = jnp.full((n, n_slots + 1), big, values.dtype)
    out = out.at[rows, dst].min(jnp.where(mask, values, big), mode="drop")
    return out[:, :n_slots]
