"""Compare dfT from the XLA gather pack vs the Pallas sorted-pack
expansion on the 3D spill grid — pinpoint where the sorted path
diverges."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_scene_3d
from rigid_body_2d_3d_pysph_tpu.ops import cellpairs as cm
from rigid_body_2d_3d_pysph_tpu.ops import pallas_contact as pc
from rigid_body_2d_3d_pysph_tpu.ops import pallas_pack
from rigid_body_2d_3d_pysph_tpu.ops.kernels import get_kernel


def main():
    scheme, scene = build_scene_3d()
    kernel = get_kernel(scheme.kernel_name, scheme.dim)
    cutoff = float(kernel.radius_scale * np.asarray(scene.h).max())
    cfg = cm.config_from_positions(
        np.asarray(scene.x), np.asarray(scene.y), np.asarray(scene.z),
        cutoff, 3, spill=True)
    two_d = cfg.dim == 2

    @jax.jit
    def gather_dft(s):
        grid = cm.build_cell_grid(s.x, s.y, s.z, s.active, cfg)
        df = pc.pack_for_contact(s, grid, cfg)
        NC, M, F = df.shape
        sent_l = pc.sent_fields(two_d)
        sent = jnp.broadcast_to(jnp.asarray(sent_l, df.dtype),
                                (M, F))[None]
        dfT = jnp.swapaxes(jnp.concatenate([df, sent], axis=0), 1, 2)
        if M < 128:
            pad = jnp.broadcast_to(
                jnp.asarray(sent_l, df.dtype)[None, :, None],
                (NC + 1, F, 128 - M))
            dfT = jnp.concatenate([dfT, pad], axis=2)
        return dfT, grid.n_occupied, grid.nbr_slots

    @jax.jit
    def sorted_dft(s):
        payload = pc.contact_payload(s, two_d)
        grid, pt = cm.build_cell_grid_packed(s.x, s.y, s.z, s.active,
                                             cfg, payload)
        dfT = pallas_pack.expand_dft_pallas(pt, grid.n_occupied, cfg,
                                            pc.sent_fields(two_d))
        return dfT, grid.n_occupied, grid.nbr_slots

    a, nocc_a, nbr_a = map(np.asarray, gather_dft(scene))
    b, nocc_b, nbr_b = map(np.asarray, sorted_dft(scene))
    print(f"n_occ gather={nocc_a} sorted={nocc_b}", flush=True)
    print(f"nbr_slots equal: {np.array_equal(nbr_a, nbr_b)}", flush=True)
    no = int(nocc_a)
    # compare occupied rows, M lanes only (pad lanes are sentinel both)
    M = cfg.M
    aa, bb = a[:no, :, :M], b[:no, :, :M]
    eq = np.array_equal(aa, bb)
    print(f"dfT[:n_occ,:,:M] equal: {eq}", flush=True)
    if not eq:
        d = np.abs(aa - bb)
        bad = np.argwhere(d > 0)
        print(f"  mismatching entries: {len(bad)}", flush=True)
        print(f"  first 10: {bad[:10].tolist()}", flush=True)
        slots = np.unique(bad[:, 0])
        print(f"  bad slots: {len(slots)} of {no}; first {slots[:10]}",
              flush=True)
        fields = np.unique(bad[:, 1])
        print(f"  bad fields: {fields}", flush=True)
        s0 = int(slots[0])
        print(f"  slot {s0} gather:\n{aa[s0]}", flush=True)
        print(f"  slot {s0} sorted:\n{bb[s0]}", flush=True)
    # sentinel row at n_occ on the sorted path
    sent_l = np.asarray(pc.sent_fields(two_d), np.float32)
    srow = b[no]
    print(f"sorted sentinel row ok: "
          f"{np.array_equal(srow, np.broadcast_to(sent_l[:, None], srow.shape))}",
          flush=True)


if __name__ == "__main__":
    main()
