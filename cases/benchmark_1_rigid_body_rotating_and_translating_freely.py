"""Benchmark 1: a cube translating and rotating freely, no gravity.

Validates the rigid-body integrator (energy conservation + straight-line
COM).  Mirrors the reference case
``code/benchmark_1_rigid_body_rotating_and_traslating_freely.py``:
11x11-particle 1m cube at dx=0.1, rho=10 (:23-31,76-90), initial
v=(0.5,0.5,0), omega=(0,0,1) (:106-107), dt=1e-3, tf=10, pfreq=100
(:129).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from rigid_body_2d_3d_pysph_tpu.app.application import Application
from rigid_body_2d_3d_pysph_tpu.app import output as out_mod
from rigid_body_2d_3d_pysph_tpu.geom import get_2d_block
from rigid_body_2d_3d_pysph_tpu.models.base import SchemeChooser
from rigid_body_2d_3d_pysph_tpu.models.rigid_body import (
    RigidBody2DScheme,
    RigidBody3DScheme,
)
from rigid_body_2d_3d_pysph_tpu.state import make_group, build_scene, ROLE_RIGID


class Case0(Application):
    def initialize(self):
        self.rho0 = 10.0
        self.hdx = 1.0
        self.dx = 0.1
        self.dim = 2
        self.dt = 1e-3
        self.tf = 10.0

    def create_particles(self):
        dx = self.dx
        x, y = get_2d_block(dx, 1.0, 1.0)
        m = np.full(len(x), dx * dx * self.rho0)
        body = make_group(
            "body", x, y, m=m, h=self.hdx * dx, rho=self.rho0, rad_s=dx,
            role=ROLE_RIGID,
            body_id=np.zeros(len(x), np.int32),
            dem_id=np.zeros(len(x), np.int32),
            constants={"E": 69e9, "poisson_ratio": 0.3},
        )
        scene = build_scene([body], dim=self.dim, total_no_bodies=1,
                            spacing0=dx)
        scheme = self.scheme.scheme
        scene = scheme.setup(scene)
        scene = scheme.set_linear_velocity(scene, np.array([0.5, 0.5, 0.0]))
        scene = scheme.set_angular_velocity(scene, np.array([0.0, 0.0, 1.0]))
        return scene

    def create_scheme(self):
        rb3d = RigidBody3DScheme(rigid_bodies=["body"], boundaries=None,
                                 dim=self.dim)
        rb2d = RigidBody2DScheme(rigid_bodies=["body"], boundaries=None,
                                 dim=self.dim)
        return SchemeChooser(default="rb2d", rb3d=rb3d, rb2d=rb2d)

    def configure_scheme(self):
        self.scheme.configure_solver(dt=self.dt, tf=self.tf, pfreq=100)

    def post_process(self, fname=None):
        # glob the dir (resume-robust: self.output_files only holds the
        # snapshots written by THIS process)
        files = out_mod.get_files(self.output_dir)
        if not files:
            return None
        t, total_energy, xs, ys = [], [], [], []
        for sd, body in out_mod.iter_output(files, "body"):
            t.append(float(sd["t"]))
            total_energy.append(
                0.5 * np.sum(body.m * (body.u**2 + body.v**2)))
            xs.append(body.xcm[0])
            ys.append(body.xcm[1])
        res = dict(t=np.asarray(t), total_energy=np.asarray(total_energy),
                   x=np.asarray(xs), y=np.asarray(ys))
        np.savez(os.path.join(self.output_dir, "results.npz"), **res)
        return res


if __name__ == "__main__":
    app = Case0(fname="benchmark_1")
    app.run()
    app.post_process(app.info_filename)
