"""Sorted-pack fast path: grid-build parity and pipeline equivalence.

``build_cell_grid_packed`` must produce the identical grid to
``build_cell_grid`` (same sort, dense_pos via sort instead of scatter),
and the Pallas pack-expansion kernel + contact kernel
(``contact_pipeline_sorted_pallas``, interpret mode here) must match the
XLA fused cell engine the way the gather-packed Pallas pipeline does.
"""

import numpy as np
import jax
import jax.numpy as jnp

from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cellmod
from rigid_body_2d_3d_pysph_tpu.ops import contact_cell as ccops
from rigid_body_2d_3d_pysph_tpu.ops import pallas_contact as pcops
from rigid_body_2d_3d_pysph_tpu.ops import pallas_pack as ppack
from rigid_body_2d_3d_pysph_tpu.ops.kernels import QuinticSpline

from test_pallas_contact import _scene_f32


def _cfg(scene, dx):
    cutoff = 3 * 1.3 * dx
    cfg = cellmod.config_from_positions(
        np.asarray(scene.x), np.asarray(scene.y), np.asarray(scene.z),
        cutoff, 2, cell_chunk=16)
    assert cfg.spill, "2D default must be the spillover grid"
    return cfg


def test_packed_grid_matches_plain_build():
    scene, dx = _scene_f32()
    cfg = _cfg(scene, dx)
    payload = [p.astype(jnp.float32)
               for p in pcops.contact_payload(scene, True)]

    @jax.jit
    def run(scene):
        g0 = cellmod.build_cell_grid(scene.x, scene.y, scene.z,
                                     scene.active, cfg)
        g1, pt = cellmod.build_cell_grid_packed(
            scene.x, scene.y, scene.z, scene.active, cfg, payload)
        return g0, g1, pt

    g0, g1, pt = run(scene)
    np.testing.assert_array_equal(np.asarray(g0.dense_pos),
                                  np.asarray(g1.dense_pos))
    np.testing.assert_array_equal(np.asarray(g0.nbr_slots),
                                  np.asarray(g1.nbr_slots))
    assert int(g0.n_occupied) == int(g1.n_occupied)
    assert bool(g0.overflow) == bool(g1.overflow)
    assert g1.slot2p.shape == (0,)

    # the (base, cnt) tables must reproduce dense_pos exactly: lane j of
    # slot s is the sorted particle at base[s] + j, for j < cnt[s]
    n_occ = int(g1.n_occupied)
    base = np.asarray(pt.base)
    cnt = np.asarray(pt.cnt)
    n_valid = int(pt.n_valid)
    assert cnt[:n_occ].sum() == n_valid
    assert (cnt[n_occ:] == 0).all()
    # reconstruct each slot's sorted x values through the tables and
    # compare against the packed gather reference
    xs = np.asarray(pt.sorted_fields[0])
    df_ref = np.asarray(cellmod.pack_fields(
        g0, cfg, [scene.x.astype(jnp.float32)], [pcops._SENT[0]]))
    for s in range(n_occ):
        got = xs[base[s]:base[s] + cnt[s]]
        np.testing.assert_array_equal(got, df_ref[s, :cnt[s], 0])


def test_expand_dft_matches_xla_pack():
    scene, dx = _scene_f32()
    cfg = _cfg(scene, dx)

    @jax.jit
    def run(scene):
        payload = pcops.contact_payload(scene, True)
        grid0 = cellmod.build_cell_grid(scene.x, scene.y, scene.z,
                                        scene.active, cfg)
        df = pcops.pack_for_contact(scene, grid0, cfg)
        grid, pt = cellmod.build_cell_grid_packed(
            scene.x, scene.y, scene.z, scene.active, cfg, payload)
        dfT = ppack.expand_dft_pallas(pt, grid.n_occupied, cfg,
                                      pcops.sent_fields(True), interpret=True)
        return grid.n_occupied, df, dfT

    n_occ, df, dfT = run(scene)
    n_occ = int(n_occ)
    df = np.asarray(df)          # [NC, M, F] gather-packed reference
    dfT = np.asarray(dfT)        # [NCe, F, 128]
    M = cfg.M
    # occupied slots match the reference pack exactly (f32 copies)
    got = np.swapaxes(dfT[:n_occ, :, :M], 1, 2)
    np.testing.assert_array_equal(got, df[:n_occ])
    # the sentinel row at n_occ is all-sentinel
    sent = np.asarray(pcops.sent_fields(True), np.float32)
    np.testing.assert_array_equal(
        dfT[n_occ], np.broadcast_to(sent[:, None], dfT[n_occ].shape))


def test_sorted_pipeline_matches_xla_fused():
    scene, dx = _scene_f32()
    cfg = _cfg(scene, dx)
    kernel = QuinticSpline(dim=2)

    @jax.jit
    def run(scene):
        grid = cellmod.build_cell_grid(scene.x, scene.y, scene.z,
                                       scene.active, cfg)
        xla = ccops.contact_pipeline_cell_fused(scene, grid, cfg, kernel)
        srt = pcops.contact_pipeline_sorted_pallas(scene, cfg, kernel,
                                                   interpret=True)
        return grid.overflow, xla, srt

    ovf, (cx, cy, cz, cw, dx_), srt = run(scene)
    px, py, pz, pw, dp, grid = srt
    assert not bool(ovf)
    assert not bool(grid.overflow)
    np.testing.assert_allclose(np.asarray(px), np.asarray(cx), atol=2e-4)
    np.testing.assert_allclose(np.asarray(py), np.asarray(cy), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pz), np.asarray(cz), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pw), np.asarray(cw),
                               rtol=2e-4, atol=1e-8)
    for k in dx_:
        np.testing.assert_allclose(np.asarray(dp[k]), np.asarray(dx_[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)
