from . import kernels, neighbors, pairs, boundary, contact, rigid, dem, fluid
