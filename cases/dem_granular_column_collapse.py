"""DEM demo: 2D granular column collapse (Luding LVC contact).

The reference ships the DEM scheme (``code/dem.py``) but no runnable DEM
application (its docstring cites the 2D granular column collapse of
https://doi.org/10.1007/s10035-016-0684-3 as the target benchmark,
``dem.py:1-6``).  This case provides that missing end-to-end driver: a
rectangular column of grains collapses onto a floor; the runout length
and the final pile height are the observables.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rigid_body_2d_3d_pysph_tpu.app.application import Application
from rigid_body_2d_3d_pysph_tpu.app import output as out_mod
from rigid_body_2d_3d_pysph_tpu.geom import get_2d_block
from rigid_body_2d_3d_pysph_tpu.models.base import SchemeChooser
from rigid_body_2d_3d_pysph_tpu.models.dem import DEMScheme
from rigid_body_2d_3d_pysph_tpu.state import (
    make_group, build_scene, ROLE_RIGID, ROLE_BOUNDARY,
)


class GranularColumnCollapse(Application):
    def add_user_options(self, group):
        group.add_argument(
            "--column-scale", dest="column_scale", type=float, default=1.0,
            help="scale the column dimensions (10 -> ~113k grains; the "
                 "cell-engine DEM path is built for this regime)")

    def initialize(self):
        self.dim = 2
        self.radius = 1e-3            # grain radius
        self.spacing = 2.1e-3         # slightly loose packing
        self.column_width = 0.05
        self.column_height = 0.1
        self.rho = 2600.0
        self.kn = 1e5
        self.en = 0.5
        self.mu = 0.5
        self.gy = -9.81
        self.dt = 1e-6 * 5
        self.tf = 0.3

    def consume_user_options(self):
        k = float(getattr(self.options, "column_scale", 1.0) or 1.0)
        self.column_width *= k
        self.column_height *= k

    def create_particles(self):
        s = self.spacing
        xg, yg = get_2d_block(s, self.column_width, self.column_height)
        yg -= yg.min() - self.radius
        m = self.rho * np.pi * self.radius**2
        n = len(xg)
        grains = make_group(
            "sand", xg, yg, m=m, h=2.0 * self.radius / 1.0,
            rho=self.rho, rad_s=self.radius, role=ROLE_RIGID,
            body_id=np.arange(n, dtype=np.int32),
            dem_id=np.zeros(n, np.int32),
        )
        # floor (wide enough that the runout stays on it)
        xf = np.arange(-3.5 * self.column_height,
                       3.5 * self.column_height, 2 * self.radius)
        yf = np.full(len(xf), -self.radius)
        floor = make_group(
            "floor", xf, yf, m=m, h=2.0 * self.radius, rho=self.rho,
            rad_s=self.radius, role=ROLE_BOUNDARY,
            dem_id=np.ones(len(xf), np.int32),
        )
        scene = build_scene([grains, floor], dim=self.dim,
                            total_no_bodies=2, spacing0=s)
        scene = self.scheme.scheme.setup(scene)
        return scene

    def create_scheme(self):
        dem = DEMScheme(granular_particles=["sand"], boundaries=["floor"],
                        kn=self.kn, en=self.en, mu=self.mu, dim=self.dim,
                        gy=self.gy, max_tng_contacts_limit=8)
        return SchemeChooser(default="dem", dem=dem)

    def configure_scheme(self):
        self.scheme.configure_solver(dt=self.dt, tf=self.tf, pfreq=1000)

    def post_process(self, fname=None):
        # glob the dir (resume-robust: self.output_files only holds the
        # snapshots written by THIS process)
        files = out_mod.get_files(self.output_dir)
        if not files:
            return None
        t, runout, height = [], [], []
        for sd, g in out_mod.iter_output(files, "sand"):
            t.append(float(sd["t"]))
            runout.append(float(g.x.max()))
            height.append(float(g.y.max()))
        res = dict(t=np.asarray(t), runout=np.asarray(runout),
                   height=np.asarray(height))
        np.savez(os.path.join(self.output_dir, "results.npz"), **res)
        return res


if __name__ == "__main__":
    app = GranularColumnCollapse(fname="dem_column_collapse")
    app.run()
    app.post_process(app.info_filename)
