"""SPH kernel correctness: normalization, gradient consistency, supports."""

import numpy as np
import pytest

from rigid_body_2d_3d_pysph_tpu.ops import kernels as K


ALL = ["quintic", "cubic", "wendland", "wendland_c4", "gaussian"]


@pytest.mark.parametrize("name", ALL)
@pytest.mark.parametrize("dim", [2, 3])
def test_normalization(name, dim):
    """∫ W dV == 1 over the support (Gaussian ~1 due to truncation)."""
    k = K.get_kernel(name, dim)
    h = 0.13
    rmax = k.radius_scale * h
    r = np.linspace(0, rmax, 20001)
    w = np.asarray(k.w(r, h))
    if dim == 2:
        integral = np.trapezoid(w * 2 * np.pi * r, r)
    else:
        integral = np.trapezoid(w * 4 * np.pi * r**2, r)
    assert abs(integral - 1.0) < 2e-3, (name, dim, integral)


@pytest.mark.parametrize("name", ALL)
@pytest.mark.parametrize("dim", [2, 3])
def test_gradient_consistency(name, dim):
    """dW/dq matches finite differences of W."""
    k = K.get_kernel(name, dim)
    h = 0.2
    r = np.linspace(1e-3, k.radius_scale * h * 0.999, 500)
    eps = 1e-6
    dnum = (np.asarray(k.w(r + eps, h)) - np.asarray(k.w(r - eps, h))) / (2 * eps)
    dana = np.asarray(k.dwdq(r, h)) / h
    scale = np.abs(dana).max()
    np.testing.assert_allclose(dnum, dana, atol=2e-4 * scale)


@pytest.mark.parametrize("name,support", [("quintic", 3.0), ("cubic", 2.0),
                                          ("wendland", 2.0)])
def test_compact_support(name, support):
    k = K.get_kernel(name, 2)
    h = 1.0
    assert float(k.w(support * h + 1e-9, h)) == 0.0
    assert float(k.w(support * h * 0.99, h)) > 0.0


def test_gradw_scalar_zero_at_origin():
    k = K.get_kernel("quintic", 3)
    assert float(k.gradw_scalar(0.0, 1.0)) == 0.0


def test_quintic_value_2d():
    """Spot value: W(0) = sigma * (3^5 - 6*2^5 + 15) = 66*sigma."""
    k = K.QuinticSpline(dim=2)
    h = 0.5
    sigma = 7.0 / (478.0 * np.pi * h * h)
    np.testing.assert_allclose(float(k.w(0.0, h)), 66.0 * sigma, rtol=1e-12)
