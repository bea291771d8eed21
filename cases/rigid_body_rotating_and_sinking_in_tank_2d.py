"""Sun 2015 §3.1.2: a rigid box (rho=2) rotating and sinking in a tank
of viscous liquid (rho=1) — the repo's free-surface FSI validation.

Mirrors ``code/rigid_body_rotating_and_sinking_in_tank_2d.py``: 4L x 3L
fluid tank at dx=0.02, 1 x 0.5 box placed at the surface offset 65 mm
from the left (:27-61,103-134), hydrostatic initial pressure (:80-81),
fluid void carved under the body (:140-155), FSI shadow mass/density set
to the displaced fluid (:158-159), gy=-1,
dt = 0.25 dx hdx / (1.1 c0), tf=4 (:177-185).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from rigid_body_2d_3d_pysph_tpu import config
from rigid_body_2d_3d_pysph_tpu.app.application import Application
from rigid_body_2d_3d_pysph_tpu.app import output as out_mod
from rigid_body_2d_3d_pysph_tpu.geom import get_2d_block, hydrostatic_tank_2d
from rigid_body_2d_3d_pysph_tpu.models.base import SchemeChooser
from rigid_body_2d_3d_pysph_tpu.models.rigid_fluid_coupling import (
    RigidFluidCouplingScheme,
)
from rigid_body_2d_3d_pysph_tpu.state import (
    make_group, build_scene, ROLE_RIGID, ROLE_BOUNDARY, ROLE_FLUID,
)


class SinkingBox(Application):
    def initialize(self, spacing=0.02):
        # ``spacing`` is overridable so benchmark harnesses (bench.py's
        # coupling workload) can scale the particle count while every
        # spacing-derived quantity (h, dt) stays consistent here
        self.hdx = 1.0
        self.L = 1.0
        self.fluid_length = 4.0 * self.L
        self.fluid_height = 3.0 * self.L
        self.fluid_density = 1.0
        self.fluid_spacing = spacing
        self.tank_height = 5.0 * self.L
        self.tank_layers = 3
        self.body_length = self.L
        self.body_height = 0.5 * self.L
        self.body_density = 2.0
        self.body_spacing = spacing
        self.body_h = self.hdx * spacing
        self.h = self.hdx * spacing
        self.co = 10 * np.sqrt(2 * 9.81 * self.fluid_height)
        self.p0 = self.fluid_density * self.co**2
        self.c0 = self.co
        self.alpha = 0.1
        self.gy = -1.0
        self.dim = 2

    def create_particles(self):
        dx = self.fluid_spacing
        xf, yf, xt, yt = hydrostatic_tank_2d(
            self.fluid_length, self.fluid_height, self.tank_height,
            self.tank_layers, dx, dx)
        m_fluid = self.fluid_density * dx**self.dim

        # hydrostatic initial pressure (:80-81)
        p0 = -self.fluid_density * self.gy * (yf.max() - yf)

        # rigid box at the fluid surface (:106-134)
        xb, yb = get_2d_block(dx, self.body_length - dx,
                              self.body_height - dx)
        xb -= xb.min() - xf.min()
        xb += 1.5 * self.L
        yb += yf.max() - yb.min() + dx
        yb -= 0.25 * self.L + dx / 2.0

        # carve the fluid void under the body (:140-155)
        fac = 1.0 * dx
        keep = ~(
            (xf > xb.min() - fac) & (xf < xb.max() + fac)
            & (yf > yb.min() - fac) & (yf < yb.max() + fac)
        )
        xf, yf, p0 = xf[keep], yf[keep], p0[keep]

        m_body = self.body_density * dx**self.dim

        fluid = make_group("fluid", xf, yf, m=m_fluid, h=self.h,
                           rho=self.fluid_density, role=ROLE_FLUID, p=p0)
        tank = make_group(
            "tank", xt, yt, m=m_fluid, h=self.h, rho=self.fluid_density,
            rad_s=dx / 2.0, role=ROLE_BOUNDARY, dem_id=1,
            constants={"E": 69e9, "poisson_ratio": 0.3},
        )
        body = make_group(
            "body", xb, yb, m=m_body, h=self.body_h, rho=self.body_density,
            rad_s=dx / 2.0, role=ROLE_RIGID,
            body_id=np.zeros(len(xb), np.int32),
            dem_id=np.zeros(len(xb), np.int32),
            constants={"E": 69e9, "poisson_ratio": 0.3},
        )
        scene = build_scene([fluid, tank, body], dim=self.dim,
                            total_no_bodies=2, spacing0=dx)
        scene = self.scheme.scheme.setup(scene)

        # displaced-fluid shadow mass/density on the body (:158-159)
        fdt = config.float_dtype()
        g = scene.meta.group("body")
        m_fsi = np.asarray(scene.m_fsi).copy()
        rho_fsi = np.asarray(scene.rho_fsi).copy()
        m_fsi[g.start:g.stop] += self.fluid_density * dx**self.dim
        rho_fsi[g.start:g.stop] = self.fluid_density
        scene = scene.replace(m_fsi=jnp.asarray(m_fsi, fdt),
                              rho_fsi=jnp.asarray(rho_fsi, fdt))
        return scene

    def create_scheme(self):
        rfc = RigidFluidCouplingScheme(
            rigid_bodies=["body"], fluids=["fluid"], boundaries=["tank"],
            dim=2, rho0=self.fluid_density, p0=self.p0, c0=self.c0,
            gy=self.gy, nu=0.0, h=self.h)
        return SchemeChooser(default="rfc", rfc=rfc)

    def configure_scheme(self):
        dt = 0.25 * self.fluid_spacing * self.hdx / (self.co * 1.1)
        self.scheme.configure_solver(dt=dt, tf=4.0, pfreq=100)

    def post_process(self, fname=None):
        # glob the dir (resume-robust: self.output_files only holds the
        # snapshots written by THIS process)
        files = out_mod.get_files(self.output_dir)
        if not files:
            return None
        t, ymax, ycm = [], [], []
        for sd, body in out_mod.iter_output(files, "body"):
            t.append(float(sd["t"]))
            ymax.append(float(np.max(body.y)))
            ycm.append(float(body.xcm[1]))
        res = dict(t=np.asarray(t), max_y=np.asarray(ymax),
                   y_com=np.asarray(ycm))
        np.savez(os.path.join(self.output_dir, "results.npz"), **res)
        return res


if __name__ == "__main__":
    app = SinkingBox(fname="sinking_box")
    app.run()
    app.post_process(app.info_filename)
