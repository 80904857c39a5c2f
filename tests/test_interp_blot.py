"""Tests for ops.interp and blot (vs scipy.ndimage oracle; shift recovery)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage

from subpixal_tpu.blot import blot_image, compute_pixmap
from subpixal_tpu.ops.interp import sample_image
from subpixal_tpu.wcs.wcs import TanWCS


def smooth_field(h=64, w=64, seed=0):
    rng = np.random.default_rng(seed)
    f = rng.normal(size=(h, w))
    return ndimage.gaussian_filter(f, 3.0).astype(np.float32)


def test_nearest_exact():
    img = np.arange(25, dtype=np.float32).reshape(5, 5)
    v, ok = sample_image(jnp.asarray(img), jnp.asarray([1.2, 3.6]),
                         jnp.asarray([2.4, 0.4]), interp="nearest")
    np.testing.assert_array_equal(np.asarray(v), [img[2, 1], img[0, 4]])
    assert np.asarray(ok).all()


def test_linear_matches_scipy_map_coordinates():
    img = smooth_field()
    rng = np.random.default_rng(1)
    x = rng.uniform(2, 61, 200)
    y = rng.uniform(2, 61, 200)
    v, ok = sample_image(jnp.asarray(img), jnp.asarray(x), jnp.asarray(y),
                         interp="linear")
    ref = ndimage.map_coordinates(img, [y, x], order=1)
    np.testing.assert_allclose(np.asarray(v), ref, atol=1e-5)
    assert np.asarray(ok).all()


def test_spline3_matches_scipy_order3():
    """True B-spline path (associative-scan prefilter + basis weights)
    == scipy.ndimage order-3 spline to f32 precision — prefilter,
    arbitrary-point sampling AND the interpolation (grid-identity)
    property. Reference parity: drizzlepac tblot interp='spline3'."""
    from subpixal_tpu.ops.interp import bspline3_prefilter

    rng = np.random.default_rng(7)
    img = rng.normal(0, 1, (64, 80)).astype(np.float32)
    c_ref = ndimage.spline_filter(img.astype(np.float64), order=3,
                                  mode="mirror")
    np.testing.assert_allclose(np.asarray(bspline3_prefilter(img)), c_ref,
                               atol=1e-5)
    x = rng.uniform(3, 76, 400)
    y = rng.uniform(3, 60, 400)
    v, ok = sample_image(jnp.asarray(img), jnp.asarray(x), jnp.asarray(y),
                         interp="spline3")
    ref = ndimage.map_coordinates(img.astype(np.float64), [y, x], order=3,
                                  mode="mirror")
    np.testing.assert_allclose(np.asarray(v), ref, atol=5e-5)
    assert np.asarray(ok).all()
    # grid identity: spline3 INTERPOLATES (poly3 does too; a naive
    # B-spline without prefiltering would fail this hard)
    XX, YY = np.meshgrid(np.arange(4.0, 70.0, 3), np.arange(4.0, 58.0, 3))
    vi, _ = sample_image(jnp.asarray(img), jnp.asarray(XX.ravel()),
                         jnp.asarray(YY.ravel()), interp="spline3")
    np.testing.assert_allclose(
        np.asarray(vi),
        img[YY.ravel().astype(int), XX.ravel().astype(int)], atol=5e-6)


@pytest.mark.parametrize("interp,atol", [("poly3", 1e-3), ("poly5", 5e-5),
                                         ("spline3", 2e-4),
                                         ("sinc", 1e-2)])
def test_highorder_interpolates_smooth_function(interp, atol):
    """High-order kernels must reproduce a band-limited function closely."""
    h = w = 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    f = np.sin(2 * np.pi * xx / 16) * np.cos(2 * np.pi * yy / 20)
    img = f.astype(np.float32)
    rng = np.random.default_rng(2)
    x = rng.uniform(5, 58, 300)
    y = rng.uniform(5, 58, 300)
    v, _ = sample_image(jnp.asarray(img), jnp.asarray(x), jnp.asarray(y),
                        interp=interp)
    truth = np.sin(2 * np.pi * x / 16) * np.cos(2 * np.pi * y / 20)
    assert np.abs(np.asarray(v) - truth).max() < atol


def test_exact_on_grid_points():
    img = smooth_field(seed=3)
    xs = np.array([5.0, 17.0, 40.0])
    ys = np.array([9.0, 30.0, 55.0])
    for interp in ("linear", "poly3", "poly5", "sinc"):
        v, _ = sample_image(jnp.asarray(img), jnp.asarray(xs), jnp.asarray(ys),
                            interp=interp)
        np.testing.assert_allclose(np.asarray(v), img[ys.astype(int),
                                                      xs.astype(int)],
                                   atol=2e-5, err_msg=interp)


def test_out_of_bounds_masked():
    img = np.ones((10, 10), np.float32)
    v, ok = sample_image(jnp.asarray(img), jnp.asarray([-5.0, 5.0, 20.0]),
                         jnp.asarray([5.0, 5.0, 5.0]), interp="poly5",
                         fill=-1.0)
    ok = np.asarray(ok)
    assert not ok[0] and ok[1] and not ok[2]
    assert np.asarray(v)[0] == -1.0


def test_bad_interp_raises():
    with pytest.raises(ValueError):
        sample_image(jnp.ones((4, 4)), jnp.zeros(1), jnp.zeros(1),
                     interp="bogus")


def make_wcs(crpix, scale=0.05, rot=0.0, crval=(150.0, 2.0)):
    s = scale / 3600.0
    th = np.deg2rad(rot)
    cd = s * np.array([[-np.cos(th), np.sin(th)], [np.sin(th), np.cos(th)]])
    return TanWCS(crpix=np.asarray(crpix, float), crval=np.asarray(crval, float),
                  cd=cd)


def test_pixmap_identity():
    w = make_wcs((32, 32))
    px, py = compute_pixmap(w, w, (8, 8), blc=(3, 5))
    yy, xx = np.mgrid[0:8, 0:8]
    np.testing.assert_allclose(px, xx + 5, atol=1e-9)
    np.testing.assert_allclose(py, yy + 3, atol=1e-9)


def test_blot_recovers_known_shift():
    """Blotting a reference through shifted WCSs moves the image by the
    WCS offset: verify against scipy.ndimage.shift."""
    ref = smooth_field(96, 96, seed=5)
    w_ref = make_wcs((48, 48))
    w_img = make_wcs((48 - 2.3, 48 + 1.6))  # image frame offset by (2.3,-1.6)
    px, py = compute_pixmap(w_img, w_ref, (64, 64), blc=(16, 16))
    blotted, valid = blot_image(ref, px, py, interp="poly5")
    # oracle: ref sampled at (x + 2.3, y - 1.6)
    yy, xx = np.mgrid[16:80, 16:80].astype(np.float64)
    oracle = ndimage.map_coordinates(ref.astype(np.float64),
                                     [yy - 1.6, xx + 2.3], order=3)
    b = np.asarray(blotted)
    v = np.asarray(valid)
    assert v.mean() > 0.9
    np.testing.assert_allclose(b[v], oracle[v], atol=2e-3)
