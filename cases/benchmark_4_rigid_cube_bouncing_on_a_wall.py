"""Benchmark 4: rigid cubes bouncing on a tank wall with a configurable
coefficient of restitution.

Mirrors ``code/benchmark_4_rigid_cube_bouncing_on_a_wall.py``: geometry
identical to benchmark 3, plus the ``--coeff-of-restitution`` CLI flag
(:59-65) and the eta damping matrix built after setup (:141-145);
dt = 1e-4, tf = 3 (:188-192).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from benchmark_3_multiple_rigid_bodies_colliding_same_particle_array import (
    Benchmark3,
)
from rigid_body_2d_3d_pysph_tpu.geom import get_2d_block, hydrostatic_tank_2d
from rigid_body_2d_3d_pysph_tpu.state import (
    make_group, build_scene, ROLE_RIGID, ROLE_BOUNDARY,
)


class Benchmark4(Benchmark3):
    def initialize(self):
        super().initialize()
        self.coeff_of_rest = 1.0
        self.tf = 3.0

    def add_user_options(self, group):
        group.add_argument("--coeff-of-restitution", type=float,
                           dest="coeff_of_rest", default=1.0,
                           help="Coefficient of restitution")

    def consume_user_options(self):
        self.coeff_of_rest = self.options.coeff_of_rest

    def create_particles(self):
        dx = self.body_spacing
        xb, yb, body_id, xt, yt = self.make_body_and_tank()
        m = self.body_density * dx**self.dim
        body = make_group(
            "body", xb, yb, m=m, h=self.body_h, rho=self.body_density,
            rad_s=dx / 2.0, role=ROLE_RIGID, body_id=body_id,
            dem_id=body_id, constants={"E": 69e9, "poisson_ratio": 0.3},
        )
        tank = make_group(
            "tank", xt, yt, m=m, h=self.body_h, rho=self.body_density,
            rad_s=dx / 2.0, role=ROLE_BOUNDARY, dem_id=2,
            constants={"E": 69e9, "poisson_ratio": 0.3},
        )
        scene = build_scene([body, tank], dim=self.dim, total_no_bodies=3,
                            spacing0=dx)
        coeff = np.full((2, 3), self.coeff_of_rest)
        scene = self.scheme.scheme.setup(scene, coeff_of_rest=coeff)
        return scene


if __name__ == "__main__":
    app = Benchmark4(fname="benchmark_4")
    app.run()
