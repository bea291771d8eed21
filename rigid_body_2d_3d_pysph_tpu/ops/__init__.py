from . import kernels, neighbors
