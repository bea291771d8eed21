"""Smoke test: two cylinders dropped on a thin dam floor using the
*coupling* scheme with no fluids.

Mirrors ``code/stack_of_cylinders_test_1.py`` (:165-176): exercises
``RigidFluidCouplingScheme`` with ``fluids=[]`` — the rigid contact
pipeline must behave identically to the rigid-only scheme.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from rigid_body_2d_3d_pysph_tpu import config
from rigid_body_2d_3d_pysph_tpu.app.application import Application
from rigid_body_2d_3d_pysph_tpu.app.boundary_utils import identify_template
from rigid_body_2d_3d_pysph_tpu.geom import create_circle_1, get_2d_block
from rigid_body_2d_3d_pysph_tpu.models.base import SchemeChooser
from rigid_body_2d_3d_pysph_tpu.models.rigid_fluid_coupling import (
    RigidFluidCouplingScheme,
)
from rigid_body_2d_3d_pysph_tpu.state import (
    make_group, build_scene, ROLE_RIGID, ROLE_BOUNDARY,
)


class StackOfCylindersTest1(Application):
    def initialize(self):
        self.dim = 2
        self.cylinder_radius = 0.5e-2
        self.cylinder_diameter = 1e-2
        self.cylinder_spacing = 1e-3
        self.cylinder_rho = 2700.0
        self.hdx = 1.0
        self.gy = -9.81
        self.h = self.hdx * self.cylinder_spacing
        self.dt = 5e-5
        self.tf = 0.1

    def create_particles(self):
        s = self.cylinder_spacing
        d, r = self.cylinder_diameter, self.cylinder_radius
        xc1, yc1 = create_circle_1(d, s, [r, r + s / 2.0])
        xc2 = xc1 + 1.5 * d
        n_per = len(xc1)
        x = np.concatenate([xc1, xc2])
        y = np.concatenate([yc1, yc1]) + 2.0 * d
        bid = np.concatenate([np.zeros(n_per, np.int32),
                              np.ones(n_per, np.int32)])
        m = self.cylinder_rho * s**2

        cylinders = make_group(
            "cylinders", x, y, m=m, h=self.h, rho=self.cylinder_rho,
            rad_s=s / 2.0, role=ROLE_RIGID, body_id=bid, dem_id=bid,
            constants={"E": 69e9, "poisson_ratio": 0.3},
        )
        # thin dam floor
        xd, yd = get_2d_block(s, 6.0 * d, 2.0 * s)
        xd += x.mean() - xd.mean()
        yd -= yd.max() + s
        dam = make_group(
            "dam", xd, yd, m=m, h=self.h, rho=self.cylinder_rho,
            rad_s=s / 2.0, role=ROLE_BOUNDARY, dem_id=2,
            constants={"E": 30e8, "poisson_ratio": 0.3},
        )
        scene = build_scene([cylinders, dam], dim=self.dim,
                            total_no_bodies=3, spacing0=s)
        scene = self.scheme.scheme.setup(scene)

        isb_tpl = identify_template(xc1, yc1, m=m, h=self.h,
                                    rho=self.cylinder_rho, dim=self.dim)
        fdt = config.float_dtype()
        g = scene.meta.group("cylinders")
        isb = np.asarray(scene.is_boundary).copy()
        isb[g.start:g.stop] = np.tile(isb_tpl, 2)
        cfib = np.asarray(scene.contact_force_is_boundary).copy()
        cfib[g.start:g.stop] = np.tile(isb_tpl, 2)
        scene = scene.replace(
            is_boundary=jnp.asarray(isb, np.int32),
            contact_force_is_boundary=jnp.asarray(cfib, fdt))
        return scene

    def create_scheme(self):
        rfc = RigidFluidCouplingScheme(
            rigid_bodies=["cylinders"], fluids=[], boundaries=["dam"],
            dim=2, rho0=1000.0, p0=1e5, c0=10.0, gy=self.gy, nu=0.0,
            h=self.h)
        return SchemeChooser(default="rfc", rfc=rfc)

    def configure_scheme(self):
        self.scheme.configure_solver(dt=self.dt, tf=self.tf, pfreq=100)


if __name__ == "__main__":
    app = StackOfCylindersTest1(fname="stack_of_cylinders_test_1")
    app.run()
