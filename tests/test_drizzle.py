"""Tests for ops.drizzle and resample.Drizzle (flux conservation, add/drop)."""

import jax.numpy as jnp
import numpy as np
import pytest

from subpixal_tpu.ops.drizzle import drizzle_combine, drizzle_deposit
from subpixal_tpu.resample import Drizzle, Exposure, make_output_wcs
from subpixal_tpu.wcs.wcs import TanWCS


def make_wcs(crpix, scale=0.05, rot=0.0, crval=(150.0, 2.0)):
    s = scale / 3600.0
    th = np.deg2rad(rot)
    cd = s * np.array([[-np.cos(th), np.sin(th)], [np.sin(th), np.cos(th)]])
    return TanWCS(crpix=np.asarray(crpix, float), crval=np.asarray(crval, float),
                  cd=cd)


def identity_pixmap(h, w, dx=0.0, dy=0.0):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    return xx + dx, yy + dy


def test_identity_deposit_conserves_flux():
    rng = np.random.default_rng(0)
    img = rng.uniform(1, 2, (16, 16)).astype(np.float32)
    px, py = identity_pixmap(16, 16)
    sci, wht = drizzle_deposit(jnp.asarray(img), None, jnp.asarray(px),
                               jnp.asarray(py), (16, 16), pixfrac=1.0)
    out = np.asarray(drizzle_combine(sci, wht))
    np.testing.assert_allclose(out, img, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wht), 1.0, atol=1e-6)


def test_half_pixel_shift_splits_flux():
    img = np.zeros((9, 9), np.float32)
    img[4, 4] = 8.0
    px, py = identity_pixmap(9, 9, dx=0.5)
    sci, wht = drizzle_deposit(jnp.asarray(img), None, jnp.asarray(px),
                               jnp.asarray(py), (9, 9), pixfrac=1.0)
    s = np.asarray(sci)
    assert s[4, 4] == pytest.approx(4.0, abs=1e-5)
    assert s[4, 5] == pytest.approx(4.0, abs=1e-5)


def test_pixfrac_smaller_droplet():
    img = np.zeros((9, 9), np.float32)
    img[4, 4] = 1.0
    px, py = identity_pixmap(9, 9, dx=0.2)
    sci, _ = drizzle_deposit(jnp.asarray(img), None, jnp.asarray(px),
                             jnp.asarray(py), (9, 9), pixfrac=0.5)
    s = np.asarray(sci)
    # droplet half-size 0.25 centered at 4.2 lies fully in cell 4
    assert s[4, 4] == pytest.approx(1.0, abs=1e-5)
    assert s[4, 5] == pytest.approx(0.0, abs=1e-6)


def test_point_kernel():
    img = np.zeros((5, 5), np.float32)
    img[2, 2] = 3.0
    px, py = identity_pixmap(5, 5, dx=0.4)
    sci, wht = drizzle_deposit(jnp.asarray(img), None, jnp.asarray(px),
                               jnp.asarray(py), (5, 5), kernel="point")
    assert np.asarray(sci)[2, 2] == pytest.approx(3.0)


def test_zero_weight_pixels_dropped():
    img = np.ones((4, 4), np.float32) * 7.0
    wht_in = np.ones((4, 4), np.float32)
    wht_in[1, 1] = 0.0
    px, py = identity_pixmap(4, 4)
    sci, wht = drizzle_deposit(jnp.asarray(img), jnp.asarray(wht_in),
                               jnp.asarray(px), jnp.asarray(py), (4, 4))
    assert np.asarray(wht)[1, 1] == 0.0
    out = np.asarray(drizzle_combine(sci, wht, fill=-1.0))
    assert out[1, 1] == -1.0
    assert out[0, 0] == pytest.approx(7.0, abs=1e-5)


def test_bad_kernel_raises():
    with pytest.raises(ValueError):
        drizzle_deposit(jnp.ones((2, 2)), None, jnp.zeros((2, 2)),
                        jnp.zeros((2, 2)), (2, 2), kernel="bogus")


def gauss(h, w, x0, y0, s=2.0, amp=50.0):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    return (amp * np.exp(-((xx - x0) ** 2 + (yy - y0) ** 2) / (2 * s * s))
            ).astype(np.float32)


def test_resample_drizzle_two_dithered_exposures():
    """Two exposures offset by a half-pixel dither must combine into a
    reference image whose source lands at the WCS-predicted position."""
    w1 = make_wcs((32, 32))
    w2 = make_wcs((31.5, 32.5))  # dithered pointing
    e1 = Exposure(gauss(64, 64, 30, 34), w1, name="e1")
    e2 = Exposure(gauss(64, 64, 29.5, 34.5), w2, name="e2")  # same sky pos
    d = Drizzle([e1, e2], pixfrac=1.0)
    d.execute()
    sci = d.output_sci
    assert sci.shape == d.output_shape
    # the source sky position: from e1 pixel (30, 34)
    ra, dec = w1.pixel_to_world(30.0, 34.0)
    ox, oy = d.output_wcs.world_to_pixel(ra, dec)
    iy, ix = np.unravel_index(np.argmax(sci), sci.shape)
    assert abs(ix - ox) <= 1.0 and abs(iy - oy) <= 1.0
    # weight ~2 where both exposures overlap
    assert np.isclose(d.output_wht.max(), 2.0, atol=0.1)


def test_fast_drop_equals_rebuild():
    w1 = make_wcs((32, 32))
    w2 = make_wcs((30, 33))
    e1 = Exposure(gauss(64, 64, 30, 34), w1, name="e1")
    e2 = Exposure(gauss(64, 64, 28, 35), w2, name="e2")
    owcs, oshape = make_output_wcs([w1, w2], [(64, 64)] * 2)
    d_all = Drizzle([e1, e2], output_wcs=owcs, output_shape=oshape)
    d_all.execute()
    d_all.fast_drop_image("e2")
    d_one = Drizzle([e1], output_wcs=owcs, output_shape=oshape)
    d_one.execute()
    np.testing.assert_allclose(d_all.output_sci, d_one.output_sci, atol=1e-5)
    np.testing.assert_allclose(d_all.output_wht, d_one.output_wht, atol=1e-5)


def test_fast_replace_after_wcs_update():
    w1 = make_wcs((32, 32))
    w2 = make_wcs((30, 33))
    w2b = make_wcs((30.3, 32.8))  # corrected WCS
    e1 = Exposure(gauss(64, 64, 30, 34), w1, name="e1")
    e2 = Exposure(gauss(64, 64, 28, 35), w2, name="e2")
    owcs, oshape = make_output_wcs([w1, w2], [(64, 64)] * 2)
    d = Drizzle([e1, e2], output_wcs=owcs, output_shape=oshape)
    d.execute()
    e2b = Exposure(e2.data, w2b, name="e2")
    d.fast_replace_image(e2b)
    d_ref = Drizzle([e1, e2b], output_wcs=owcs, output_shape=oshape)
    d_ref.execute()
    np.testing.assert_allclose(d.output_sci, d_ref.output_sci, atol=1e-5)


@pytest.mark.parametrize("frac", [0.1, 0.25, 0.457, 0.6, 0.9])
def test_fractional_offset_centroid_preserved(frac):
    """Deposits at arbitrary fractional offsets must preserve flux AND
    centroid (regression: the candidate window must use cell-center
    convention or the rightmost cell's flux is dropped)."""
    img = np.zeros((16, 16), np.float32)
    img[8, 8] = 10.0
    px, py = identity_pixmap(16, 16, dx=frac, dy=frac / 2)
    sci, wht = drizzle_deposit(jnp.asarray(img), None, jnp.asarray(px),
                               jnp.asarray(py), (20, 20), pixfrac=1.0)
    s = np.asarray(sci)
    assert s.sum() == pytest.approx(10.0, rel=1e-5)  # flux conserved
    yy, xx = np.mgrid[0:20, 0:20]
    cx = (s * xx).sum() / s.sum()
    cy = (s * yy).sum() / s.sum()
    assert cx == pytest.approx(8 + frac, abs=1e-5)
    assert cy == pytest.approx(8 + frac / 2, abs=1e-5)


def _dithered_exposures(n=3, shape=(56, 60), noise=0.02, seed=1):
    """n dithered exposures of one synthetic star field."""
    rng = np.random.default_rng(seed)
    stars = [(15.0, 18.0), (40.0, 22.0), (28.0, 44.0)]
    exps = []
    for e in range(n):
        dx, dy = rng.uniform(-2, 2, 2)
        # crpix shifted by (dx, dy) -> a fixed sky point lands at
        # pixel + (dx, dy): render stars there so the stack is aligned
        wcs = make_wcs((shape[1] / 2 + dx, shape[0] / 2 + dy))
        img = rng.normal(0, noise, shape).astype(np.float32)
        for x0, y0 in stars:
            img += gauss(*shape, x0 + dx, y0 + dy, s=1.8, amp=30.0)
        exps.append(Exposure(img, wcs, name=f"d{e}"))
    return exps


def test_output_ctx_bitmask():
    """Context map: bit e set exactly where exposure e deposited weight."""
    exps = _dithered_exposures(n=2)
    d = Drizzle(exps)
    d.execute()
    ctx = d.output_ctx
    for e, exp in enumerate(exps):
        w = np.asarray(d._per_exp[exp.name][1])
        np.testing.assert_array_equal((ctx >> e) & 1, (w > 0).astype(int))


def test_reject_cr_removes_planted_hits():
    """Planted cosmic rays in single exposures are flagged against the
    median stack and removed from the combined product (driz_cr parity)."""
    rng = np.random.default_rng(8)
    exps = _dithered_exposures(n=4, noise=0.01, seed=3)
    # plant bright single-exposure hits well inside the frame
    hits = [(20, 30), (40, 15), (11, 44)]
    for k, (y, x) in enumerate(hits):
        exps[k % len(exps)].data[y, x] += 500.0
    d = Drizzle(exps)
    d.execute()
    masks = d.reject_cr(snr=5.0)
    for k, (y, x) in enumerate(hits):
        assert masks[k % len(exps)][y, x], f"CR at {(y, x)} not flagged"
    # false-positive rate stays tiny
    fp = sum(m.sum() for m in masks) - len(hits)
    assert fp < 0.001 * exps[0].data.size * len(exps)
    # combined product no longer carries the hits
    sci = d.output_sci
    wcs0 = exps[0].wcs
    for k, (y, x) in enumerate(hits):
        e = exps[k % len(exps)]
        ra, dec = e.wcs.pixel_to_world(np.array([float(x)]),
                                       np.array([float(y)]))
        ox, oy = d.output_wcs.world_to_pixel(ra, dec)
        v = sci[int(round(float(oy[0]))), int(round(float(ox[0])))]
        assert v < 100.0, f"CR flux leaked into the stack at {(y, x)}: {v}"


def test_match_sky_equalizes_backgrounds():
    """skymethod='match' (default): backgrounds are EQUALIZED across
    exposures but the common sky level survives into the data (reference
    skymethod='match' semantics — real diffuse background is kept)."""
    exps = _dithered_exposures(n=3, noise=0.02)
    offsets = [0.7, -0.3, 1.5]
    for exp, off in zip(exps, offsets):
        exp.data = exp.data + np.float32(off)
    d = Drizzle(exps)
    skies = d.match_sky()
    np.testing.assert_allclose(skies, offsets, atol=0.05)
    # after matching, every exposure sits at the common (minimum) sky
    np.testing.assert_allclose(d.match_sky(subtract=False),
                               min(offsets), atol=0.05)


def test_match_sky_localmin_subtracts_absolute_sky():
    """skymethod='localmin': each exposure's absolute sky is removed."""
    exps = _dithered_exposures(n=3, noise=0.02)
    offsets = [0.7, -0.3, 1.5]
    for exp, off in zip(exps, offsets):
        exp.data = exp.data + np.float32(off)
    d = Drizzle(exps)
    skies = d.match_sky(skymethod="localmin")
    np.testing.assert_allclose(skies, offsets, atol=0.05)
    np.testing.assert_allclose(d.match_sky(subtract=False), 0.0, atol=0.05)


def test_static_mask_flags_dead_pixels():
    """Pixels consistently low across the whole stack are detector
    defects; transient lows are not flagged."""
    exps = _dithered_exposures(n=4, noise=0.05)
    dead = [(7, 9), (33, 41)]
    for exp in exps:
        for y, x in dead:
            exp.data[y, x] = -5.0  # defect: low in EVERY exposure
    exps[0].data[20, 20] = -5.0  # transient: low in one exposure only
    from subpixal_tpu.resample import make_static_mask

    mask = make_static_mask(exps)
    for y, x in dead:
        assert mask[y, x]
    assert not mask[20, 20]
    d = Drizzle(exps)
    m2 = d.apply_static_mask()
    np.testing.assert_array_equal(m2, mask)
    d.execute()
    for y, x in dead:
        assert np.asarray(d._per_exp[exps[0].name][1])[y, x] >= 0  # runs


def test_turbo_is_square_alias():
    img = np.zeros((9, 9), np.float32)
    img[4, 4] = 8.0
    px, py = identity_pixmap(9, 9, dx=0.5)
    s1, w1 = drizzle_deposit(jnp.asarray(img), None, jnp.asarray(px),
                             jnp.asarray(py), (9, 9), kernel="square")
    s2, w2 = drizzle_deposit(jnp.asarray(img), None, jnp.asarray(px),
                             jnp.asarray(py), (9, 9), kernel="turbo")
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_tophat_kernel_uniform_disc():
    """tophat: uniform weight on cells within the droplet radius."""
    img = np.zeros((11, 11), np.float32)
    img[5, 5] = 1.0
    win = np.zeros((11, 11), np.float32)
    win[5, 5] = 1.0  # only the center pixel deposits
    px, py = identity_pixmap(11, 11)
    sci, wht = drizzle_deposit(jnp.asarray(img), jnp.asarray(win),
                               jnp.asarray(px),
                               jnp.asarray(py), (11, 11), kernel="tophat",
                               pixfrac=3.0)  # radius 1.5 -> 5-cell plus
    w = np.asarray(wht)
    # exactly the cells whose centers lie within radius 1.5 of (5, 5)
    for (yy, xx) in np.argwhere(np.ones((11, 11))):
        r = np.hypot(yy - 5, xx - 5)
        assert (w[yy, xx] > 0) == (r <= 1.5), (yy, xx, r)
    # uniform within the disc
    assert np.allclose(w[w > 0], w.max())


def test_lanczos3_centered_delta_reproduces_delta():
    """A droplet exactly on a cell center deposits ~all flux there
    (lanczos(0)=1, zeros at integer offsets)."""
    img = np.zeros((15, 15), np.float32)
    img[7, 7] = 5.0
    px, py = identity_pixmap(15, 15)
    sci, wht = drizzle_deposit(jnp.asarray(img), None, jnp.asarray(px),
                               jnp.asarray(py), (15, 15),
                               kernel="lanczos3")
    s = np.asarray(sci)
    assert s[7, 7] == pytest.approx(5.0, rel=1e-5)
    assert np.abs(np.delete(s.ravel(), 7 * 15 + 7)).max() < 1e-5


def test_lanczos3_interpolates_smooth_field():
    """Half-pixel lanczos3 deposit of a smooth field combines back to the
    shifted field (windowed-sinc interpolation property)."""
    yy, xx = np.mgrid[0:24, 0:24].astype(np.float32)
    img = np.sin(xx * 0.4) + np.cos(yy * 0.3)
    px, py = identity_pixmap(24, 24, dx=0.5)
    sci, wht = drizzle_deposit(jnp.asarray(img.astype(np.float32)), None,
                               jnp.asarray(px), jnp.asarray(py), (24, 30),
                               kernel="lanczos3")
    out = np.asarray(drizzle_combine(sci, wht))
    want = np.sin((xx - 0.5) * 0.4) + np.cos(yy * 0.3)
    # interior cells only (window needs full support)
    np.testing.assert_allclose(out[4:20, 4:20], want[4:20, 4:20],
                               atol=5e-3)


def test_precombine_stages_device_resident():
    """match_sky / static_mask / reject_cr run with device-resident
    Exposures (jax-array data) and match the host-path results."""
    import jax
    import jax.numpy as jnp

    def scenes():
        rng = np.random.default_rng(8)
        exps = _dithered_exposures(n=4, noise=0.02, seed=3)
        offsets = [0.7, -0.3, 1.5, 0.1]
        hits = [(20, 30), (40, 15), (11, 44)]
        dead = [(7, 9), (33, 41)]
        for exp, off in zip(exps, offsets):
            exp.data = exp.data + np.float32(off)
            for y, x in dead:
                exp.data[y, x] = -5.0
        for k, (y, x) in enumerate(hits):
            exps[k % len(exps)].data[y, x] += 500.0
        return exps, hits, dead

    exps_h, hits, dead = scenes()
    exps_d, _, _ = scenes()
    for e in exps_d:
        e.data = jnp.asarray(e.data)

    dh = Drizzle([e.copy() for e in exps_h])
    dd = Drizzle([e.copy() for e in exps_d])
    sk_h = dh.match_sky()
    sk_d = dd.match_sky()
    np.testing.assert_allclose(sk_d, sk_h, atol=1e-4)
    assert isinstance(dd.exposures[0].data, jax.Array)  # stayed device

    m_h = dh.apply_static_mask()
    m_d = dd.apply_static_mask()
    np.testing.assert_array_equal(m_d, m_h)
    assert isinstance(dd.exposures[0].weight, jax.Array)

    dh.execute()
    dd.execute()
    cr_h = dh.reject_cr(snr=5.0)
    cr_d = dd.reject_cr(snr=5.0)
    for k, (y, x) in enumerate(hits):
        assert cr_d[k % 4][y, x]
    # same flags up to sigma-estimator float differences: require
    # identical planted-hit detections and near-identical totals
    tot_h = sum(int(m.sum()) for m in cr_h)
    tot_d = sum(int(m.sum()) for m in cr_d)
    assert abs(tot_h - tot_d) <= 2
