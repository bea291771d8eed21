"""Hash-grid neighbor list vs O(N^2) brute force."""

import numpy as np
import jax.numpy as jnp

from rigid_body_2d_3d_pysph_tpu.ops import neighbors as nb


def _sets(nl):
    idx = np.asarray(nl.idx)
    mask = np.asarray(nl.mask)
    return [frozenset(idx[i][mask[i]].tolist()) for i in range(idx.shape[0])]


def _check(x, y, z, active, cutoff, dim):
    cfg = nb.NeighborConfig(
        cutoff=cutoff, max_neighbors=96, max_per_cell=64, dim=dim,
        n_buckets=1 << 12, row_chunk=128,
    )
    got = nb.build_neighbors(jnp.asarray(x), jnp.asarray(y), jnp.asarray(z),
                             jnp.asarray(active), cfg)
    ref = nb.brute_force_neighbors(jnp.asarray(x), jnp.asarray(y),
                                   jnp.asarray(z), jnp.asarray(active),
                                   cutoff, 96)
    assert not bool(got.overflow)
    assert not bool(ref.overflow)
    gs, rs = _sets(got), _sets(ref)
    for i, (a, b) in enumerate(zip(gs, rs)):
        assert a == b, f"row {i}: extra={a - b} missing={b - a}"


def test_random_2d():
    rng = np.random.default_rng(0)
    n = 500
    x = rng.uniform(-1, 1, n)
    y = rng.uniform(-1, 1, n)
    z = np.zeros(n)
    _check(x, y, z, np.ones(n, bool), 0.25, 2)


def test_random_3d():
    rng = np.random.default_rng(1)
    n = 400
    x = rng.uniform(-1, 1, n)
    y = rng.uniform(-1, 1, n)
    z = rng.uniform(-1, 1, n)
    _check(x, y, z, np.ones(n, bool), 0.4, 3)


def test_inactive_particles_excluded():
    rng = np.random.default_rng(2)
    n = 200
    x = rng.uniform(-1, 1, n)
    y = rng.uniform(-1, 1, n)
    z = np.zeros(n)
    active = rng.uniform(size=n) > 0.3
    _check(x, y, z, active, 0.3, 2)


def test_negative_coordinates_and_cell_edges():
    # lattice straddling cell boundaries incl. negative coords
    xs = np.arange(-10, 10) * 0.1
    x, y = np.meshgrid(xs, xs, indexing="ij")
    x, y = x.ravel(), y.ravel()
    z = np.zeros_like(x)
    _check(x, y, z, np.ones(len(x), bool), 0.1 * 3.0, 2)


def test_self_included():
    x = np.array([0.0, 10.0])
    y = np.zeros(2)
    z = np.zeros(2)
    cfg = nb.NeighborConfig(cutoff=1.0, max_neighbors=8, max_per_cell=8,
                            dim=2, n_buckets=1 << 10, row_chunk=2)
    nl = nb.build_neighbors(jnp.asarray(x), jnp.asarray(y), jnp.asarray(z),
                            jnp.ones(2, bool), cfg)
    s = _sets(nl)
    assert s[0] == {0}
    assert s[1] == {1}


def test_overflow_flag():
    # 50 coincident points with tiny caps must flag overflow
    n = 50
    x = np.zeros(n)
    cfg = nb.NeighborConfig(cutoff=1.0, max_neighbors=8, max_per_cell=8,
                            dim=2, n_buckets=1 << 10, row_chunk=64)
    nl = nb.build_neighbors(jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
                            jnp.ones(n, bool), cfg)
    assert bool(nl.overflow)
