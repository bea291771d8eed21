from .base import Scheme, SchemeChooser
from .rigid_body import RigidBody2DScheme, RigidBody3DScheme
from .dem import DEMScheme
from .rigid_fluid_coupling import RigidFluidCouplingScheme
