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
