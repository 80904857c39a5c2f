"""Unit tests for subpixal_tpu.ops.peaks (SURVEY §4 item 1: analytic recovery)."""

import jax.numpy as jnp
import numpy as np
import pytest

from subpixal_tpu.ops.peaks import find_peak


def quad_surface(h, w, x0, y0, a=-0.05, b=-0.08, c=0.01, v0=2.0):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    dx, dy = xx - x0, yy - y0
    return v0 + a * dx * dx + b * dy * dy + c * dx * dy


def gauss_surface(h, w, x0, y0, sx=2.0, sy=1.5, amp=3.0):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    return amp * np.exp(-((xx - x0) ** 2) / (2 * sx**2) - ((yy - y0) ** 2) / (2 * sy**2))


def test_exact_quadratic_recovery():
    z = quad_surface(21, 21, 10.3, 9.6)
    r = find_peak(jnp.asarray(z, jnp.float32), peak_fit_box=5)
    assert bool(r.fit_ok)
    assert abs(float(r.x) - 10.3) < 1e-3
    assert abs(float(r.y) - 9.6) < 1e-3
    assert abs(float(r.value) - 2.0) < 1e-2


def test_batched_quadratic_recovery():
    rng = np.random.default_rng(0)
    xs = 10 + rng.uniform(-0.5, 0.5, size=16)
    ys = 10 + rng.uniform(-0.5, 0.5, size=16)
    z = np.stack([quad_surface(21, 21, x, y) for x, y in zip(xs, ys)])
    r = find_peak(jnp.asarray(z, jnp.float32), peak_fit_box=5)
    assert bool(jnp.all(r.fit_ok))
    np.testing.assert_allclose(np.asarray(r.x), xs, atol=2e-3)
    np.testing.assert_allclose(np.asarray(r.y), ys, atol=2e-3)


def test_gaussian_fit_beats_quadratic_on_gaussian():
    z = gauss_surface(31, 31, 15.37, 14.62)
    zj = jnp.asarray(z, jnp.float32)
    rq = find_peak(zj, peak_fit_box=5, fit_type="quadratic")
    rg = find_peak(zj, peak_fit_box=5, fit_type="gaussian")
    err_q = abs(float(rq.x) - 15.37) + abs(float(rq.y) - 14.62)
    err_g = abs(float(rg.x) - 15.37) + abs(float(rg.y) - 14.62)
    assert bool(rg.fit_ok)
    assert err_g < 5e-3
    assert err_g <= err_q + 1e-6


def test_fallback_to_argmax_on_flat_surface():
    z = np.zeros((15, 15), np.float32)
    z[4, 11] = 1.0  # delta: quadratic fit around it is fine, but a flat
    flat = np.ones((15, 15), np.float32)
    r = find_peak(jnp.asarray(flat))
    # flat surface: degenerate Hessian -> fallback, position = argmax (0, 0)
    assert not bool(r.fit_ok)
    assert float(r.x) == float(r.ix)
    rd = find_peak(jnp.asarray(z))
    assert int(rd.ix) == 11 and int(rd.iy) == 4


def test_peak_near_edge_translated_box():
    z = quad_surface(15, 15, 1.2, 13.6)
    r = find_peak(jnp.asarray(z, jnp.float32), peak_fit_box=5)
    assert bool(r.fit_ok)
    assert abs(float(r.x) - 1.2) < 1e-2
    assert abs(float(r.y) - 13.6) < 1e-2


def test_mask_excludes_contaminated_pixels():
    z = quad_surface(21, 21, 10.3, 9.6)
    z_bad = z.copy()
    z_bad[8, 9] = 50.0  # hot pixel inside the would-be fit box
    mask = np.ones_like(z, bool)
    mask[8, 9] = False
    r = find_peak(jnp.asarray(z_bad, jnp.float32), peak_fit_box=5,
                  mask=jnp.asarray(mask))
    assert bool(r.fit_ok)
    assert abs(float(r.x) - 10.3) < 5e-3
    assert abs(float(r.y) - 9.6) < 5e-3


def test_search_box_restricts_argmax():
    z = np.zeros((20, 20), np.float32)
    z[3, 3] = 5.0   # global max, outside the search box
    z += quad_surface(20, 20, 14.2, 15.1) * 0.1
    r = find_peak(jnp.asarray(z), peak_fit_box=5,
                  peak_search_box=(10, 20, 10, 20))
    assert abs(float(r.x) - 14.2) < 0.6
    assert abs(float(r.y) - 15.1) < 0.6


def test_small_fit_box_rejected():
    with pytest.raises(ValueError):
        find_peak(jnp.zeros((9, 9)), peak_fit_box=2)


def test_find_peak_nan_outside_box_is_harmless():
    """A non-finite pixel far from the peak must not poison the fit box
    (the one-hot extraction zeroes it); one inside the box falls back to
    the integer argmax, like the reference."""
    import numpy as np
    import jax.numpy as jnp
    from subpixal_tpu.ops.peaks import find_peak

    yy, xx = np.mgrid[0:32, 0:32].astype(np.float64)
    img = np.exp(-((xx - 16.3) ** 2 + (yy - 15.6) ** 2) / 6.0)
    img = img.astype(np.float32)

    far = img.copy()
    far[2, 2] = np.nan
    mask = np.isfinite(far)  # NaNs must be masked for the argmax search
    r = find_peak(jnp.asarray(far[None]), peak_fit_box=5,
                  mask=jnp.asarray(mask[None]))
    assert bool(r.fit_ok[0])
    assert abs(float(r.x[0]) - 16.3) < 0.05
    assert abs(float(r.y[0]) - 15.6) < 0.05

    near = img.copy()
    near[15, 16] = np.nan  # inside the fit box around the argmax
    r2 = find_peak(jnp.asarray(near[None]), peak_fit_box=5)
    assert not bool(r2.fit_ok[0])  # integer-argmax fallback


def test_masked_nan_pixel_does_not_poison_fit():
    """A NaN pixel with weight 0 must leave the subpixel fit intact
    (0 * NaN = NaN used to poison the normal equations)."""
    yy, xx = np.mgrid[0:15, 0:15].astype(np.float64)
    surf = np.exp(-((xx - 7.26) ** 2 + (yy - 7.4) ** 2) / 4.0)
    surf[6, 6] = np.nan
    res = find_peak(jnp.asarray(surf, jnp.float32), peak_fit_box=5,
                    mask=np.isfinite(surf), fit_type="gaussian")
    assert bool(res.fit_ok)
    assert abs(float(res.x) - 7.26) < 0.02
    assert abs(float(res.y) - 7.40) < 0.02


def test_fully_masked_surface_not_ok():
    surf = np.random.default_rng(0).normal(size=(16, 16))
    res = find_peak(jnp.asarray(surf, jnp.float32), peak_fit_box=5,
                    mask=np.zeros((16, 16), bool))
    assert not bool(res.fit_ok)
