"""Row-window grid (ops/rowwin.py): coverage + layout invariants.

The grid's contract: every unordered pair within the cutoff appears,
for BOTH directions, as (query lane in window w, source lane in one of
w's runs).  Checked against a brute-force O(n^2) pair list on random 2D
and 3D scenes, plus the expand-kernel window invariants.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rigid_body_2d_3d_pysph_tpu.ops import rowwin as rw


def _scene(dim, n=700, seed=0, clumpy=False):
    rng = np.random.default_rng(seed)
    if clumpy:
        # clusters + sparse stragglers: exercises partial windows, empty
        # rows, and windows whose run bands span gaps
        c = rng.uniform(0, 1, (8, dim))
        x = np.concatenate([c[i] + rng.normal(0, 0.02, (n // 10, dim))
                            for i in range(8)]
                           + [rng.uniform(0, 1, (n // 5, dim))])
    else:
        x = rng.uniform(0, 1, (n, dim))
    z = x[:, 2] if dim == 3 else np.zeros(len(x))
    return x[:, 0], x[:, 1], z


@pytest.mark.parametrize("dim,clumpy", [(2, False), (2, True),
                                        (3, False), (3, True)])
def test_rowwin_pair_coverage(dim, clumpy):
    x, y, z = _scene(dim, clumpy=clumpy)
    n = len(x)
    cutoff = 0.06
    cfg = rw.rowwin_config_from_positions(x, y, z, cutoff, dim)
    active = jnp.ones(n, bool)
    grid, pt = jax.jit(
        lambda: rw.build_row_window_grid(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(z), active, cfg,
            [jnp.arange(n, dtype=jnp.float32)]))()
    assert not bool(grid.overflow)
    n_occ = int(grid.n_occupied)
    M = cfg.M

    # reconstruct window membership from the pack tables
    base = np.asarray(pt.base)[:n_occ]
    cnt = np.asarray(pt.cnt)[:n_occ]
    sidx = np.asarray(pt.sorted_fields[0]).astype(np.int64)  # orig index
    assert int(cnt.sum()) == n
    # lane fill: windows are M-full except one partial per row; sparse
    # test scenes (3D uniform: ~2.5 particles per (y,z) row) sit near
    # the one-window-per-row floor, dense scenes near 1.0
    assert cnt.sum() / (n_occ * M) > (0.45 if dim == 2 else 0.25)

    runs = np.asarray(grid.nbr_runs)[:n_occ]               # [n_occ, R]
    rcnt = np.asarray(grid.run_cnt)[:n_occ]
    covered = set()
    dup = 0
    for w in range(n_occ):
        q = sidx[base[w]:base[w] + cnt[w]]
        src = []
        for sa, sc in zip(runs[w], rcnt[w]):
            for s in range(sa, min(sa + sc, n_occ)):
                src.extend(sidx[base[s]:base[s] + cnt[s]])
        # no source may appear twice (kernel force sums would double)
        dup += len(src) - len(set(src))
        for qi in q:
            for sj in src:
                covered.add((int(qi), int(sj)))
    assert dup == 0, f"{dup} duplicated source lanes across runs"

    xs = np.stack([x, y, z], axis=1)
    d2 = ((xs[:, None, :] - xs[None, :, :]) ** 2).sum(-1)
    qi, sj = np.nonzero(d2 <= cutoff ** 2)
    missing = [(int(a), int(b)) for a, b in zip(qi, sj)
               if a != b and (int(a), int(b)) not in covered]
    assert not missing, f"{len(missing)} in-cutoff pairs not covered"

    # dense_pos maps every particle to its (window, lane)
    dp = np.asarray(grid.dense_pos)
    assert (dp < n_occ * M).all()
    w_of, lane_of = dp // M, dp % M
    for i in (0, n // 2, n - 1):
        wi, li = int(w_of[i]), int(lane_of[i])
        assert sidx[base[wi] + li] == i

    # expand-kernel invariants: base nondecreasing, steps <= M
    full_base = np.asarray(pt.base)
    assert (np.diff(full_base) >= 0).all()
    assert (np.diff(full_base) <= M).all()

    # numpy reference agrees on the window layout
    order, wbase_np, wcnt_np, _, _, _, _ = rw._np_windows(x, y, z, cfg)
    assert len(wbase_np) == n_occ
    np.testing.assert_array_equal(base, wbase_np)
    np.testing.assert_array_equal(cnt, wcnt_np)


def test_rowwin_inactive_and_empty():
    x, y, z = _scene(2, n=64, seed=3)
    n = len(x)
    cfg = rw.rowwin_config_from_positions(x, y, z, 0.08, 2)
    active = jnp.arange(n) < 40
    grid, pt = rw.build_row_window_grid(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(z), active, cfg,
        [jnp.arange(n, dtype=jnp.float32)])
    assert int(pt.n_valid) == 40
    dp = np.asarray(grid.dense_pos)
    assert (dp[40:] == cfg.NC_max * cfg.M).all()
    assert (dp[:40] < int(grid.n_occupied) * cfg.M).all()

    # fully inactive scene: no windows, no overflow
    grid0, pt0 = rw.build_row_window_grid(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(z),
        jnp.zeros(n, bool), cfg, [jnp.arange(n, dtype=jnp.float32)])
    assert int(grid0.n_occupied) == 0
    assert not bool(grid0.overflow)


def test_rowwin_domain_exit_overflow():
    x, y, z = _scene(2, n=32, seed=4)
    cfg = rw.rowwin_config_from_positions(x, y, z, 0.08, 2)
    x2 = jnp.asarray(x).at[5].set(x.max() + 10.0)  # outside the AABB
    grid, _ = rw.build_row_window_grid(
        x2, jnp.asarray(y), jnp.asarray(z), jnp.ones(len(x), bool), cfg,
        [jnp.arange(len(x), dtype=jnp.float32)])
    assert bool(grid.overflow)
