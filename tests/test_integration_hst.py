"""End-to-end "real HST shape" integration (VERDICT r4 task 9).

One synthetic observation with every structural feature of a real HST
visit at once — previously each piece was tested separately
(multi-chip expansion: test_pipeline.py, WCSDVARR/D2IMARR round-trip:
test_wcs.py, align-through-distortion: test_align.py) so the COMPOSED
path could regress piecewise:

* two gzip-compressed FITS files (``*_flt.fits.gz``),
* each with two SCI chips (SCI,1 / SCI,2) + per-chip WHT extensions,
* TAN+SIP science WCS per chip,
* lookup-table distortion: per-chip WCSDVARR grids at the stwcs
  multi-chip EXTVER layout (chip k -> 2k-1, 2k) plus a shared D2IMARR,
* planted per-chip pointing errors,

through ``align_fits`` (load -> align -> header write-back) and a full
reload. Done-criterion: relative residual < 5 mpix.
"""

import gzip as _gzip

import numpy as np

from subpixal_tpu.io.fits import HDU, Header, read_fits, write_fits
from subpixal_tpu.pipeline import align_fits, load_exposures
from subpixal_tpu.wcs.fitswcs import (distortion_to_hdus, wcs_from_hdul,
                                      wcs_to_header)
from subpixal_tpu.wcs.wcs import DistGrid, TanWCS

SCALE = 0.05 / 3600.0  # deg/pix


def _smooth_grid(ny, nx, amp, seed):
    rng = np.random.default_rng(seed)
    g = rng.normal(0, 1.0, (ny, nx))
    for _ in range(3):  # crude smoothing -> NPOL-like low-order field
        g = 0.25 * (np.roll(g, 1, 0) + np.roll(g, -1, 0)
                    + np.roll(g, 1, 1) + np.roll(g, -1, 1))
    return (amp * g / np.abs(g).max()).astype(np.float64)


def _chip_wcs(crpix, chip, seed):
    """TAN + SIP + per-chip NPOL table + shared-style D2IM for one
    256^2 chip."""
    a = np.zeros((3, 3)); a[2, 0] = 4e-7; a[0, 2] = -3e-7
    b = np.zeros((3, 3)); b[2, 0] = -2e-7; b[0, 2] = 3e-7
    cpdis = DistGrid(
        data_x=_smooth_grid(8, 8, 0.06, seed),
        data_y=_smooth_grid(8, 8, 0.06, seed + 1),
        crpix=(0.0, 0.0), crval=(0.0, 0.0), cdelt=(256 / 7, 256 / 7))
    d2im = DistGrid(
        data_x=_smooth_grid(6, 6, 0.02, 99),  # same grid for all chips
        crpix=(0.0, 0.0), crval=(0.0, 0.0), cdelt=(256 / 5, 256 / 5))
    return TanWCS(crpix=np.asarray(crpix, float),
                  crval=np.array([150.0, 2.0]),
                  cd=SCALE * np.array([[-1.0, 0.0], [0.0, 1.0]]),
                  a=a, b=b, cpdis=cpdis, d2im=d2im)


def _stars(seed=3, n=34):
    """Sky-frame star positions covering BOTH chips' footprints."""
    rng = np.random.default_rng(seed)
    pts = []
    while len(pts) < n:
        p = rng.uniform((30, 30), (226, 510))
        if all(np.hypot(*(p - q)) > 16 for q in pts):
            pts.append(p)
    return np.asarray(pts)


def _render(true_wcs, sky_xy, ref_wcs, shape, seed):
    rng = np.random.default_rng(seed)
    H, W = shape
    img = rng.normal(0, 0.1, shape)
    ra, dec = ref_wcs.pixel_to_world(sky_xy[:, 0], sky_xy[:, 1])
    xs, ys = true_wcs.world_to_pixel(ra, dec)
    yy, xx = np.mgrid[0:H, 0:W]
    for x0, y0 in zip(xs, ys):
        if -10 < x0 < W + 10 and -10 < y0 < H + 10:
            img += 250.0 * np.exp(-((xx - x0) ** 2 + (yy - y0) ** 2)
                                  / (2 * 2.2 ** 2))
    return img.astype(np.float32)


def test_full_hst_shape_roundtrip(tmp_path):
    # reference (catalogued) frame spanning both chips
    ref_frame = TanWCS(crpix=np.array([128.0, 270.0]),
                       crval=np.array([150.0, 2.0]),
                       cd=SCALE * np.array([[-1.0, 0.0], [0.0, 1.0]]))
    sky = _stars()
    rng = np.random.default_rng(11)
    # planted pointing errors per (file, chip)
    err = np.array([[(0.0, 0.0), (0.0, 0.0)],
                    [(0.8, -0.5), (0.8, -0.5)]])
    paths, true_wcs_all = [], []
    for f in range(2):
        dith = rng.uniform(-4, 4, 2)
        hdus = [HDU()]
        tabs = []
        for chip in range(2):
            # chip k's detector sits 270 rows up in the focal plane
            crpix = (128 + dith[0], 128 + dith[1] - 270 * chip)
            true_w = _chip_wcs(crpix, chip, seed=7 + chip)
            e = err[f, chip]
            wrong_w = true_w.replace(
                crpix=np.array([crpix[0] + e[0], crpix[1] + e[1]]))
            data = _render(true_w, sky, ref_frame, (256, 256),
                           seed=40 + 2 * f + chip)
            h = Header()
            h["EXTNAME"] = "SCI"
            h["EXTVER"] = chip + 1
            h["EXPTIME"] = 1.0
            h["BUNIT"] = "ELECTRONS"
            wcs_to_header(wrong_w, h)
            hdus.append(HDU(data, h))
            wh = Header()
            wh["EXTNAME"] = "WHT"
            wh["EXTVER"] = chip + 1
            hdus.append(HDU(np.ones((256, 256), np.float32), wh))
            # per-chip NPOL grids at the stwcs multi-chip layout
            tabs += distortion_to_hdus(
                wrong_w.cpdis, "WCSDVARR",
                extvers=(2 * chip + 1, 2 * chip + 2))
            true_wcs_all.append(true_w)
        tabs += distortion_to_hdus(true_wcs_all[-1].d2im, "D2IMARR")
        p = str(tmp_path / f"visit{f}_flt.fits.gz")
        write_fits(p, hdus + tabs)
        paths.append(p)

    # the gzip files really are gzip
    with open(paths[0], "rb") as fh:
        assert fh.read(2) == b"\x1f\x8b"

    # loader composes SIP + per-chip WCSDVARR + D2IMARR
    loaded = load_exposures(paths, wht_ext="WHT")
    assert len(loaded) == 4
    assert all(e.wcs.cpdis is not None for e in loaded)
    assert all(e.wcs.d2im is not None for e in loaded)
    assert all(e.weight is not None for e in loaded)
    # chip 2 got ITS grids (EXTVER 3/4), not chip 1's
    assert not np.allclose(loaded[0].wcs.cpdis.data_x,
                           loaded[1].wcs.cpdis.data_x)

    res = align_fits(paths, wht_ext="WHT", fitgeom="shift",
                     max_iterations=10, eps_shift=0.001, usfac=16,
                     fit_type="gaussian", min_sources=5)
    assert res.converged

    # reload the UPDATED files and measure the end-to-end residual:
    # predicted star positions under each chip's corrected WCS vs the
    # TRUE WCS. The meaningful residual is per chip-PAIR (same chip,
    # different file): those share identical distortion, so the
    # planted relative pointing error must cancel exactly. Across
    # DIFFERENT chips a shift-only fit absorbs each chip's own mean
    # distortion Jacobian into its gauge (measured ~8 mpix here with
    # 0.06 px NPOL tables; header write-back verified bit-identical to
    # the internal fixed point) — that spread is a property of
    # fitgeom='shift' under distortion, identical in the reference,
    # and is pinned only loosely.
    ra, dec = ref_frame.pixel_to_world(sky[:, 0], sky[:, 1])
    rel = []
    for k, (f, chip) in enumerate([(0, 1), (0, 2), (1, 1), (1, 2)]):
        hdul = read_fits(paths[f])
        w = wcs_from_hdul(hdul, ext=("SCI", chip), chip=chip)
        xs, ys = w.world_to_pixel(ra, dec)
        xt, yt = true_wcs_all[k].world_to_pixel(ra, dec)
        rel.append(np.stack([xs - xt, ys - yt]))
    rel = np.asarray(rel)          # (4, 2, n) order: f0c1 f0c2 f1c1 f1c2
    # RMS per chip pair: the mean is the fit's job (sub-mpix); the
    # per-star scatter is distortion sampled across the dither
    # baseline — the irreducible floor of a shift-only correction
    pair_resid = max(
        1e3 * float(np.sqrt(np.mean((rel[2] - rel[0]) ** 2))),
        1e3 * float(np.sqrt(np.mean((rel[3] - rel[1]) ** 2))))
    assert pair_resid < 5.0, f"end-to-end residual {pair_resid:.2f} mpix"
    # and the fitted relative shifts recover the planted errors
    sh = np.asarray(res.shifts)
    for a, b in ((2, 0), (3, 1)):
        d = 1e3 * np.abs((sh[a] - sh[b]) - np.asarray(err[1, 0]))
        assert d.max() < 2.0, f"planted shift missed by {d} mpix"
    # cross-chip gauge spread stays bounded (gross-regression guard)
    gauge = rel - rel.mean(axis=0)
    assert 1e3 * np.abs(gauge).max() < 15.0
