"""Zhang et al. stack-of-cylinders collapse — the repo's experimental
validation case.

Mirrors ``code/stack_of_cylinders.py``: 33 cylinders (rows of 6/5
alternating, ``create_cylinders_stack_1`` :300-367) of diameter 1 cm at
1 mm spacing behind a dam wall; the retaining wall is yanked +0.25 m in
x at t = 0.2 s (``post_step`` :438-445); the system COM trajectory is
compared against the digitized experimental curves
``x_com_zhang.csv`` / ``y_com_zhang.csv`` (``post_process`` :447-509).
fric_coeff = 0.45, restitution 0.6 (:231-234, :245), dt = 5e-5,
tf = 0.5 + 0.2.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from rigid_body_2d_3d_pysph_tpu import config
from rigid_body_2d_3d_pysph_tpu.app.application import Application
from rigid_body_2d_3d_pysph_tpu.app.boundary_utils import identify_template
from rigid_body_2d_3d_pysph_tpu.app import output as out_mod
from rigid_body_2d_3d_pysph_tpu.geom import (
    create_circle_1, get_2d_block, hydrostatic_tank_2d,
)
from rigid_body_2d_3d_pysph_tpu.models.base import SchemeChooser
from rigid_body_2d_3d_pysph_tpu.models.rigid_body import RigidBody3DScheme
from rigid_body_2d_3d_pysph_tpu.state import (
    make_group, build_scene, ROLE_RIGID, ROLE_BOUNDARY,
)

ZHANG_DIR = os.path.join(os.path.dirname(__file__), "data")


class ZhangStackOfCylinders(Application):
    def initialize(self):
        self.dim = 2
        spacing = 1.0
        self.dam_length = 26e-2
        self.dam_height = 26e-2
        self.dam_spacing = spacing * 1e-3
        self.dam_layers = 5
        self.dam_rho = 2000.0
        self.cylinder_radius = 0.5e-2
        self.cylinder_diameter = 1e-2
        self.cylinder_spacing = spacing * 1e-3
        self.cylinder_rho = 2700.0
        self.wall_height = 20e-2
        self.wall_spacing = spacing * 1e-3
        self.wall_layers = 2
        self.wall_time = 0.2
        self.wall_rho = 2700.0
        self.hdx = 1.0
        self.gy = -9.81
        self.h = self.hdx * self.cylinder_spacing
        self.tf = 0.5 + self.wall_time
        self.dt = 5e-5

    def create_cylinders_stack(self):
        """Rows of 6/5 cylinders x 3, with the reference's exact stacking
        arithmetic (``stack_of_cylinders.py:300-367``): 6-rows pitched
        d + s/4, 5-rows pitched d + s/2 offset 0.78 d vertically and
        -s/2 horizontally; each subsequent row shifted to clear the
        previous row's top by one spacing."""
        d, s, r = (self.cylinder_diameter, self.cylinder_spacing,
                   self.cylinder_radius)
        xc6, yc6 = create_circle_1(d, s, [r, r + s / 2.0])
        xc5, yc5 = create_circle_1(d, s, [2.0 * r, r + 3.0 * s])
        n_per = len(xc6)

        x_six = np.concatenate([xc6 + i * (d + s / 4.0) for i in range(6)])
        y_six = np.tile(yc6, 6)
        x_five = np.concatenate(
            [xc5 + i * (d + s / 2.0) for i in range(5)]) - s / 2.0
        y_five = np.tile(yc5, 5) + 0.78 * d

        y_six_2 = y_six + (y_five.max() - y_six.min() + s)
        y_five_2 = y_five + (y_six_2.max() - y_five.min() + s)
        y_six_3 = y_six_2 + (y_five_2.max() - y_six_2.min() + s)
        y_five_3 = y_five_2 + (y_six_3.max() - y_five_2.min() + s)

        x = np.concatenate([x_six, x_five, x_six, x_five, x_six, x_five])
        y = np.concatenate([y_six, y_five, y_six_2, y_five_2, y_six_3,
                            y_five_3])
        n_bodies = 3 * 6 + 3 * 5
        bid = np.concatenate([
            np.full(n_per, i, np.int32) for i in range(n_bodies)])
        return x, y, bid, n_per

    def create_particles(self):
        s = self.cylinder_spacing
        xc, yc, body_id, n_per = self.create_cylinders_stack()
        m = self.cylinder_rho * s**2
        n_bodies = int(body_id.max()) + 1  # 33

        cylinders = make_group(
            "cylinders", xc, yc, m=m, h=self.h, rho=self.cylinder_rho,
            rad_s=s / 2.0, role=ROLE_RIGID, body_id=body_id, dem_id=body_id,
            constants={"E": 69e9, "poisson_ratio": 0.3},
        )

        # dam (tank walls), aligned to the cylinders (reference :152-169)
        _, _, xd, yd = hydrostatic_tank_2d(
            self.dam_length, self.dam_height, self.dam_height,
            self.dam_layers, s, s)
        xd += xc.min() - xd.min() - self.dam_spacing * self.dam_layers
        yd += yc.min() - yd.min() - self.dam_spacing * self.dam_layers

        # the full tank lattice is used as the dam (the reference trims
        # interior + outer rows, :203-226 — a particle-count optimization
        # only; contact physics sees just the surface layer either way)
        dam = make_group(
            "dam", xd, yd, m=m, h=self.h, rho=self.cylinder_rho,
            rad_s=self.dam_spacing / 2.0, role=ROLE_BOUNDARY,
            dem_id=n_bodies, constants={"E": 30e8, "poisson_ratio": 0.3},
        )

        # removable wall right of the stack (reference :171-190)
        xw, yw = get_2d_block(self.wall_spacing, self.cylinder_spacing / 2.0,
                              self.wall_height / 4.0)
        xw += xc.max() - xw.min() + self.cylinder_spacing
        yw += yd.min() - yw.min()
        wall = make_group(
            "wall", xw, yw, m=m, h=self.h, rho=self.cylinder_rho,
            rad_s=self.cylinder_spacing / 2.0, role=ROLE_BOUNDARY,
            dem_id=n_bodies + 1, constants={"E": 30e8, "poisson_ratio": 0.3},
        )

        scene = build_scene([cylinders, dam, wall], dim=self.dim,
                            total_no_bodies=n_bodies + 2, spacing0=s)
        coeff = np.full((n_bodies, n_bodies + 2), 0.6)
        scene = self.scheme.scheme.setup(scene, coeff_of_rest=coeff)

        # per-cylinder template surface flags (reference :194-198,254-297)
        isb_tpl = identify_template(
            xc[:n_per], yc[:n_per], m=m, h=self.h, rho=self.cylinder_rho,
            dim=self.dim)
        fdt = config.float_dtype()
        full_isb = np.asarray(scene.is_boundary).copy()
        cfib = np.asarray(scene.contact_force_is_boundary).copy()
        g = scene.meta.group("cylinders")
        full_isb[g.start:g.stop] = np.tile(isb_tpl, n_bodies)
        cfib[g.start:g.stop] = np.tile(isb_tpl, n_bodies)
        # wall: every particle is a contact surface (reference :228-229)
        gw = scene.meta.group("wall")
        cfib[gw.start:gw.stop] = 1.0
        scene = scene.replace(
            is_boundary=jnp.asarray(full_isb, jnp.int32),
            contact_force_is_boundary=jnp.asarray(cfib, fdt),
        )

        # schedule the wall removal (reference post_step :438-445)
        def yank_wall(scene):
            gw = scene.meta.group("wall")
            x = np.asarray(scene.x).copy()
            x[gw.start:gw.stop] += 0.25
            return scene.replace(x=jnp.asarray(x, fdt))

        self.add_event(self.wall_time, yank_wall)
        return scene

    def create_scheme(self):
        rb3d = RigidBody3DScheme(
            rigid_bodies=["cylinders"], boundaries=["dam", "wall"],
            gx=0.0, gy=self.gy, gz=0.0, dim=2, fric_coeff=0.45)
        return SchemeChooser(default="rb3d", rb3d=rb3d)

    def configure_scheme(self):
        self.scheme.configure_solver(dt=self.dt, tf=self.tf, pfreq=100)

    def post_process(self, fname=None):
        # glob the dir (resume-robust: self.output_files only holds the
        # snapshots written by THIS process)
        files = out_mod.get_files(self.output_dir)
        if not files:
            return None
        t, sx, sy = [], [], []
        for sd, arr in out_mod.iter_output(files, "cylinders"):
            t.append(float(sd["t"]))
            xcm = arr.xcm_mat
            sx.append(xcm[:, 0].mean() / self.dam_length)
            sy.append(xcm[:, 1].mean() / self.dam_length)
        t = np.asarray(t) - self.wall_time
        res = dict(t=t, x_com=np.asarray(sx), y_com=np.asarray(sy))
        zx = np.loadtxt(os.path.join(ZHANG_DIR, "x_com_zhang.csv"),
                        delimiter=",")
        zy = np.loadtxt(os.path.join(ZHANG_DIR, "y_com_zhang.csv"),
                        delimiter=",")
        res["zhang_t_x"], res["zhang_x"] = zx[:, 0], zx[:, 1]
        res["zhang_t_y"], res["zhang_y"] = zy[:, 0], zy[:, 1]
        np.savez(os.path.join(self.output_dir, "results.npz"), **res)
        return res


if __name__ == "__main__":
    app = ZhangStackOfCylinders(fname="stack_of_cylinders")
    app.run()
    app.post_process(app.info_filename)
