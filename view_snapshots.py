"""Snapshot viewer: render case output frames to PNGs (and optionally an
animated GIF).

The reference relies on PySPH's Mayavi viewer with per-case configs
(``customize_output``, e.g. ``code/stack_of_cylinders.py:511-515``).
This is the headless equivalent: scatter plots per snapshot, colored by
group (or a field), suitable for quick inspection of any run.

Usage:
  python view_snapshots.py benchmark_3_output                 # every 10th
  python view_snapshots.py sinking_box_output --every 50 --field p
  python view_snapshots.py stack_of_cylinders_output --gif
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rigid_body_2d_3d_pysph_tpu.app import output as out_mod  # noqa: E402


def render(output_dir: str, every: int = 10, field: str | None = None,
           gif: bool = False, size: float = 2.0):
    files = out_mod.get_files(output_dir)[::every]
    if not files:
        print(f"no snapshots in {output_dir}")
        return
    frame_dir = os.path.join(output_dir, "frames")
    os.makedirs(frame_dir, exist_ok=True)

    # fixed axes from the first + last frame extents
    sd0, g0 = out_mod.load(files[0])
    sdl, gl = out_mod.load(files[-1])
    xs = np.concatenate([np.concatenate([g.x for g in gs.values()])
                         for gs in (g0, gl)])
    ys = np.concatenate([np.concatenate([g.y for g in gs.values()])
                         for gs in (g0, gl)])
    pad = 0.05 * max(np.ptp(xs), np.ptp(ys))
    xlim = (xs.min() - pad, xs.max() + pad)
    ylim = (ys.min() - pad, ys.max() + pad)

    paths = []
    for f in files:
        sd, groups = out_mod.load(f)
        fig, ax = plt.subplots(figsize=(6, 6 * (ylim[1] - ylim[0])
                                        / max(xlim[1] - xlim[0], 1e-9)))
        for name, g in sorted(groups.items()):
            if field and hasattr(g, field):
                sc = ax.scatter(g.x, g.y, c=getattr(g, field), s=size,
                                cmap="viridis")
            else:
                ax.scatter(g.x, g.y, s=size, label=name)
        if field:
            fig.colorbar(sc, ax=ax, label=field)
        else:
            ax.legend(loc="upper right", markerscale=4)
        ax.set_xlim(*xlim)
        ax.set_ylim(*ylim)
        ax.set_aspect("equal")
        ax.set_title(f"t = {float(sd['t']):.4f} s")
        p = os.path.join(frame_dir,
                         os.path.basename(f).replace(".npz", ".png"))
        fig.savefig(p, dpi=110)
        plt.close(fig)
        paths.append(p)
    print(f"rendered {len(paths)} frames -> {frame_dir}")

    if gif:
        try:
            from PIL import Image
            imgs = [Image.open(p) for p in paths]
            gp = os.path.join(output_dir, "animation.gif")
            imgs[0].save(gp, save_all=True, append_images=imgs[1:],
                         duration=80, loop=0)
            print(f"gif -> {gp}")
        except ImportError:
            print("PIL not available; skipped gif")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("output_dir")
    p.add_argument("--every", type=int, default=10)
    p.add_argument("--field", default=None)
    p.add_argument("--gif", action="store_true")
    p.add_argument("--size", type=float, default=2.0)
    a = p.parse_args()
    render(a.output_dir, a.every, a.field, a.gif, a.size)
