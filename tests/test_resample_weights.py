"""Exposure-time / weight-map semantics in resample (reference:
``subpixal/cutout.py · Cutout.exptime/data_units`` and AstroDrizzle
``final_wht_type`` EXP/IVM/ERR reached via ``Drizzle(config=...)``,
SURVEY §2 #3, §3.2)."""

import numpy as np
import pytest

from subpixal_tpu.blot import blot_cutout
from subpixal_tpu.cutout import Cutout
from subpixal_tpu.resample import (Drizzle, Exposure, exposure_pixel_weight,
                                   exposure_rate_data)
from subpixal_tpu.wcs.wcs import TanWCS


def make_wcs(crpix, scale=0.05, crval=(150.0, 2.0)):
    s = scale / 3600.0
    cd = s * np.array([[-1.0, 0.0], [0.0, 1.0]])
    return TanWCS(crpix=np.asarray(crpix, float),
                  crval=np.asarray(crval, float), cd=cd)


def const_exposure(value, exptime=1.0, name="e", shape=(24, 24), **kw):
    return Exposure(np.full(shape, value, np.float32), make_wcs((12, 12)),
                    exptime=exptime, name=name, **kw)


def _interior(d):
    """Slice well inside the output frame (away from edge partial pixels)."""
    sci = d.output_sci
    H, W = sci.shape
    return sci[H // 2 - 4:H // 2 + 4, W // 2 - 4:W // 2 + 4]


def test_exptime_weighted_mean():
    """wht_type='exptime' (EXP): combined image equals the hand-computed
    exposure-time-weighted mean of the rate images."""
    e1 = const_exposure(1.0, exptime=1.0, name="a")
    e2 = const_exposure(2.0, exptime=3.0, name="b")
    d = Drizzle([e1, e2], wht_type="exptime")
    d.execute()
    expect = (1.0 * 1.0 + 3.0 * 2.0) / (1.0 + 3.0)
    np.testing.assert_allclose(_interior(d), expect, atol=1e-5)
    assert d.texptime == pytest.approx(4.0)


def test_uniform_weighting_matches_round1_behavior():
    e1 = const_exposure(1.0, exptime=1.0, name="a")
    e2 = const_exposure(2.0, exptime=3.0, name="b")
    d = Drizzle([e1, e2], wht_type="uniform")
    d.execute()
    np.testing.assert_allclose(_interior(d), 1.5, atol=1e-5)


def test_counts_units_converted_to_rate():
    """'counts' exposures are divided by exptime: two exposures of the same
    source at different exptimes must combine to the common rate."""
    rate = 2.5
    e1 = const_exposure(rate * 2.0, exptime=2.0, name="a",
                        data_units="counts")
    e2 = const_exposure(rate * 5.0, exptime=5.0, name="b",
                        data_units="counts")
    d = Drizzle([e1, e2])
    d.execute()
    np.testing.assert_allclose(_interior(d), rate, atol=1e-5)


def test_ivm_weighting():
    """wht_type='ivm': per-pixel inverse-variance weighted mean."""
    shape = (24, 24)
    e1 = const_exposure(1.0, name="a", shape=shape,
                        ivm=np.full(shape, 4.0, np.float32))
    e2 = const_exposure(3.0, name="b", shape=shape,
                        ivm=np.full(shape, 1.0, np.float32))
    d = Drizzle([e1, e2], wht_type="ivm")
    d.execute()
    expect = (4.0 * 1.0 + 1.0 * 3.0) / 5.0
    np.testing.assert_allclose(_interior(d), expect, atol=1e-5)


def test_ivm_counts_units_scaling():
    """Counts-units ivm is rescaled by exptime^2 to rate-units weight."""
    shape = (24, 24)
    e = const_exposure(6.0, exptime=3.0, name="a", shape=shape,
                       data_units="counts",
                       ivm=np.full(shape, 2.0, np.float32))
    base, _ = exposure_pixel_weight(e, "ivm")
    np.testing.assert_allclose(base, 2.0 * 9.0)
    np.testing.assert_allclose(exposure_rate_data(e), 2.0)


def test_error_weighting():
    """wht_type='error' (ERR): w = 1/err^2 in rate units."""
    shape = (24, 24)
    e1 = const_exposure(1.0, name="a", shape=shape,
                        err=np.full(shape, 0.5, np.float32))   # w = 4
    e2 = const_exposure(3.0, name="b", shape=shape,
                        err=np.full(shape, 1.0, np.float32))   # w = 1
    d = Drizzle([e1, e2], wht_type="error")
    d.execute()
    expect = (4.0 * 1.0 + 1.0 * 3.0) / 5.0
    np.testing.assert_allclose(_interior(d), expect, atol=1e-5)


def test_missing_ivm_raises():
    e = const_exposure(1.0, name="a")
    with pytest.raises(ValueError, match="ivm"):
        Drizzle([e], wht_type="ivm").execute()


def test_bad_units_raises():
    with pytest.raises(ValueError, match="data_units"):
        const_exposure(1.0, data_units="furlongs")


def test_exptime_weight_respects_bad_pixel_mask():
    """The user/bad-pixel weight multiplies the statistical base weight."""
    shape = (24, 24)
    wmask = np.ones(shape, np.float32)
    wmask[12, 12] = 0.0
    e1 = const_exposure(1.0, exptime=2.0, name="a", shape=shape,
                        weight=wmask)
    e2 = const_exposure(3.0, exptime=2.0, name="b", shape=shape)
    d = Drizzle([e1, e2])
    d.execute()
    sci = d.output_sci
    # at the masked pixel only e2 contributes
    owcs = d.output_wcs
    ra, dec = e1.wcs.pixel_to_world(12.0, 12.0)
    ox, oy = owcs.world_to_pixel(ra, dec)
    assert sci[int(round(float(oy))), int(round(float(ox)))] == \
        pytest.approx(3.0, abs=1e-4)


def test_blot_cutout_expout_from_units():
    """Rate reference blotted onto a counts cutout is scaled by exptime
    (do_blot's expout, derived from Cutout.exptime/data_units)."""
    w = make_wcs((8, 8))
    src = Cutout(np.full((16, 16), 2.0, np.float32), w, data_units="rate")
    img = Cutout(np.zeros((16, 16), np.float32), w.copy(),
                 exptime=40.0, data_units="counts")
    b = blot_cutout(src, img, interp="linear")
    assert b.data_units == "counts"
    np.testing.assert_allclose(b.data[4:12, 4:12], 80.0, atol=1e-3)
    # explicit expout overrides the derivation
    b2 = blot_cutout(src, img, interp="linear", expout=1.0)
    np.testing.assert_allclose(b2.data[4:12, 4:12], 2.0, atol=1e-4)


def test_blot_cutout_sinscl():
    """sinscl > 1 widens/smooths the sinc interpolant (reference
    blot_cutout(sinscl=) kwarg)."""
    w = make_wcs((8, 8))
    data = np.zeros((17, 17), np.float32)
    data[8, 8] = 1.0
    src = Cutout(data, w)
    img = Cutout(np.zeros((17, 17), np.float32),
                 make_wcs((8.5, 8.0)))  # half-pixel offset grid
    b1 = blot_cutout(src, img, interp="sinc", sinscl=1.0)
    b2 = blot_cutout(src, img, interp="sinc", sinscl=2.0)
    assert b2.data.max() < b1.data.max()  # low-passed peak


def test_output_ctx_multiplane():
    """>32 exposures roll into extra int32 CTX planes (AstroDrizzle
    multi-plane CTX format; round-1 int64 bitmask was UB at e>=63)."""
    exps = [const_exposure(1.0, name=f"e{k}", shape=(8, 8))
            for k in range(34)]
    d = Drizzle(exps)
    d.execute()
    ctx = d.output_ctx
    assert ctx.shape == (2,) + d.output_shape
    assert ctx.dtype == np.int32
    for e, exp in enumerate(exps):
        wgt = np.asarray(d._per_exp[exp.name][1])
        plane, bit = divmod(e, 32)
        got = (ctx[plane].view(np.uint32) >> np.uint32(bit)) & 1
        np.testing.assert_array_equal(got, (wgt > 0).astype(np.uint32))


def test_align_counts_units_mixed_exptime():
    """End-to-end: counts-units exposures with mixed exptimes still align
    (VERDICT r1 item 2 'counts-units alignment test')."""
    from subpixal_tpu.align import align_images

    rng = np.random.default_rng(5)
    shape = (56, 60)
    stars = [(15.0, 18.0), (40.0, 22.0), (28.0, 44.0), (45.0, 45.0)]
    exps = []
    true_off = []
    exptimes = [1.0, 30.0, 400.0]
    for e in range(3):
        dx, dy = rng.uniform(-0.4, 0.4, 2)
        true_off.append((dx, dy))
        wcs = make_wcs((shape[1] / 2, shape[0] / 2))
        rate = rng.normal(0, 0.01, shape).astype(np.float32)
        yy, xx = np.mgrid[0:shape[0], 0:shape[1]].astype(np.float64)
        for x0, y0 in stars:
            rate += (30.0 * np.exp(-((xx - x0 - dx) ** 2 +
                                     (yy - y0 - dy) ** 2) / (2 * 1.8 ** 2))
                     ).astype(np.float32)
        t = exptimes[e]
        exps.append(Exposure(rate * t, wcs, exptime=t, name=f"c{e}",
                             data_units="counts"))
    res = align_images(exposures=exps, fitgeom="shift", max_iterations=6,
                       usfac=8, min_sources=3, use_pallas=False)
    # planted offsets are relative; compare pairwise differences of the
    # recovered shifts against the planted ones
    sh = res.shifts
    for i in range(3):
        for j in range(3):
            got = sh[i] - sh[j]
            want = (true_off[j][0] - true_off[i][0],
                    true_off[j][1] - true_off[i][1])
            np.testing.assert_allclose(got, want, atol=0.03)


def test_drizzle_astrodrizzle_config_dict():
    """Drizzle(config=...) accepts AstroDrizzle-style keys (reference
    Drizzle(config=...) forwards a config dict; SURVEY §3.2)."""
    d = Drizzle(config={"final_pixfrac": 0.8, "final_kernel": "gaussian",
                        "final_wht_type": "IVM", "final_fillval": -1.0})
    assert d.pixfrac == 0.8
    assert d.kernel == "gaussian"
    assert d.wht_type == "ivm"
    assert d.fillval == -1.0
    # direct kwarg names work too; unknown keys are rejected loudly
    d2 = Drizzle(config={"pixfrac": 0.6})
    assert d2.pixfrac == 0.6
    with pytest.raises(ValueError, match="unknown Drizzle config"):
        Drizzle(config={"final_bogus": 1})


def test_execute_stack_matches_per_frame(monkeypatch):
    """The one-program stacked execute path (pixmap stack + all deposits
    in one jit) must reproduce the per-frame flow exactly (round 3)."""
    import jax.numpy as jnp

    import subpixal_tpu.blot as B
    from subpixal_tpu.resample import Drizzle
    from subpixal_tpu.testing import simulate_stack

    exps, _ = simulate_stack(n_exp=3, shape=(96, 96), n_stars=6, seed=3)

    # per-frame reference flow (host pixmaps on CPU)
    d1 = Drizzle([e.copy() for e in exps], use_pallas=False)
    d1.execute()
    ref_sci = np.asarray(d1.output_sci)

    # stacked path: force device pixmaps on CPU + interpret-mode Pallas
    monkeypatch.setattr(B, "device_pixmap_min_pixels", lambda: 1)
    d2 = Drizzle([e.copy() for e in exps], use_pallas=False)
    d2._ensure_output_grid()
    d2._warm_combine()
    tile = d2._shared_tile()
    out = d2._execute_stack(tile, _interpret=True)
    assert out is not None, "stacked path did not engage"
    sci_s, wht_s, sci, wht = out
    assert sci_s.shape[0] == 3
    from subpixal_tpu.ops.drizzle import drizzle_combine
    got = np.asarray(drizzle_combine(sci, wht))
    # f32 device pixmaps vs f64 host pixmaps: tiny coordinate jitter
    near = np.abs(got - ref_sci) / (np.abs(ref_sci) + 1e-3)
    assert np.quantile(near, 0.999) < 5e-3, near.max()
    # stack slices must equal what fast_drop expects: sums consistent
    np.testing.assert_allclose(np.asarray(jnp.sum(sci_s, 0)),
                               np.asarray(sci), rtol=1e-6)
