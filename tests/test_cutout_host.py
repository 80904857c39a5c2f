"""Tests for the host Cutout layer (creation, pairing, blot_cutout)."""

import numpy as np
import pytest

from subpixal_tpu.blot import blot_cutout
from subpixal_tpu.catalogs import find_sources
from subpixal_tpu.cutout import (
    Cutout,
    NoOverlapError,
    create_cutouts,
    create_primary_cutouts,
    cutouts_to_batch,
    drz_from_input_cutouts,
)
from subpixal_tpu.wcs.wcs import TanWCS


def make_wcs(crpix, scale=0.05, rot=0.0, crval=(150.0, 2.0)):
    s = scale / 3600.0
    th = np.deg2rad(rot)
    cd = s * np.array([[-np.cos(th), np.sin(th)], [np.sin(th), np.cos(th)]])
    return TanWCS(crpix=np.asarray(crpix, float), crval=np.asarray(crval, float),
                  cd=cd)


def field_with_sources(h=128, w=128, seed=0, nsrc=8, amp=100.0, min_sep=20.0):
    rng = np.random.default_rng(seed)
    img = rng.normal(0, 1, (h, w)).astype(np.float32)
    xs, ys = [], []
    while len(xs) < nsrc:  # rejection-sample well-separated positions
        x0 = rng.uniform(15, w - 15)
        y0 = rng.uniform(15, h - 15)
        if all((x0 - a) ** 2 + (y0 - b) ** 2 > min_sep**2
               for a, b in zip(xs, ys)):
            xs.append(x0)
            ys.append(y0)
    xs, ys = np.array(xs), np.array(ys)
    yy, xx = np.mgrid[0:h, 0:w]
    for x0, y0 in zip(xs, ys):
        img += amp * np.exp(-((xx - x0) ** 2 + (yy - y0) ** 2) / (2 * 2.0**2)
                            ).astype(np.float32)
    return img, np.stack([xs, ys], 1)


def test_create_primary_cutouts_from_catalog():
    img, truth = field_with_sources()
    cat, seg = find_sources(img, nsigma=5.0)
    w = make_wcs((64, 64))
    cuts = create_primary_cutouts(cat, seg, img, w, pad=2)
    assert len(cuts) == len(cat)
    for c in cuts:
        # source position within the cutout is near its parent position
        xpar, ypar = c.src_pos_parent
        k = int(np.argmin((truth[:, 0] - xpar) ** 2 + (truth[:, 1] - ypar) ** 2))
        assert abs(truth[k, 0] - xpar) < 1.0
        assert abs(truth[k, 1] - ypar) < 1.0
        # cutout WCS is consistent with the parent WCS
        ra1, dec1 = c.wcs.pixel_to_world(*c.src_pos)
        ra2, dec2 = w.pixel_to_world(xpar, ypar)
        assert abs(ra1 - ra2) < 1e-10 and abs(dec1 - dec2) < 1e-10


def test_create_cutouts_pairs_across_frames():
    img, truth = field_with_sources()
    cat, seg = find_sources(img, nsigma=5.0)
    w_drz = make_wcs((64, 64))
    w_flt = make_wcs((60.5, 66.2))  # offset exposure frame
    cuts = create_primary_cutouts(cat, seg, img, w_drz, pad=2)
    # the exposure sees the same sky, shifted by the crpix offset
    flt_img = np.roll(np.roll(img, -3, axis=0), 4, axis=1)  # placeholder data
    img_cuts, matched = create_cutouts(cuts, flt_img, w_flt, pad=2)
    assert len(img_cuts) == len(matched) > 0
    for ic, pc in zip(img_cuts, matched):
        assert ic.src_id == pc.src_id
        # predicted source position: crpix offset is (-3.5, +2.2) in (x, y)
        xp, yp = ic.src_pos_parent
        xd, yd = pc.src_pos_parent
        assert abs((xd - xp) - 3.5) < 1e-6
        assert abs((yd - yp) + 2.2) < 1e-6


def test_no_overlap_skipped():
    img, _ = field_with_sources()
    cat, seg = find_sources(img, nsigma=5.0)
    w_drz = make_wcs((64, 64))
    w_far = make_wcs((5000, 5000))  # frame far away
    cuts = create_primary_cutouts(cat, seg, img, w_drz)
    img_cuts, matched = create_cutouts(cuts, img, w_far)
    assert img_cuts == [] and matched == []


def test_drz_from_input_roundtrip():
    img, _ = field_with_sources()
    cat, seg = find_sources(img, nsigma=5.0)
    w = make_wcs((64, 64))
    prim = create_primary_cutouts(cat, seg, img, w)
    flt_cuts, _ = create_cutouts(prim, img, w)
    back, matched = drz_from_input_cutouts(flt_cuts, img, w)
    assert len(back) == len(flt_cuts)


def test_insert_into_image_and_errors():
    c = Cutout(np.ones((4, 4)), make_wcs((2, 2)), blc=(2, 3))
    img = np.zeros((10, 10))
    c.insert_into_image(img)
    assert img[2:6, 3:7].sum() == 16
    c_out = Cutout(np.ones((4, 4)), make_wcs((2, 2)), blc=(50, 50))
    with pytest.raises(NoOverlapError):
        c_out.insert_into_image(np.zeros((10, 10)))


def test_cutouts_to_batch_fixed_shape():
    img, _ = field_with_sources()
    cat, seg = find_sources(img, nsigma=5.0)
    w = make_wcs((64, 64))
    cuts = create_primary_cutouts(cat, seg, img, w)
    data, mask, offs = cutouts_to_batch(cuts)
    assert data.shape[0] == len(cuts)
    assert data.shape[1] % 8 == 0 and data.shape[2] % 8 == 0
    assert mask.dtype == bool
    # centered padding preserved data
    i = 0
    oy, ox = int(offs[i, 0]), int(offs[i, 1])
    ch, cw = cuts[i].data.shape
    np.testing.assert_array_equal(data[i, oy:oy + ch, ox:ox + cw],
                                  cuts[i].data)


def test_blot_cutout_produces_comparable_pair():
    """Blot a drizzled-frame cutout onto a shifted exposure cutout grid;
    the blotted data must match the exposure's view of the same sky."""
    img, truth = field_with_sources(seed=4)
    cat, seg = find_sources(img, nsigma=5.0)
    w_drz = make_wcs((64, 64))
    dx, dy = 2.3, -1.6
    w_flt = make_wcs((64 - dx, 64 - dy))
    # exposure data = same sky rendered in the shifted frame
    from scipy import ndimage

    flt_img = ndimage.shift(img, (-dy, -dx), order=3).astype(np.float32)
    prim = create_primary_cutouts(cat, seg, img, w_drz, pad=2,
                                  combine_seg_mask=False)
    flt_cuts, matched = create_cutouts(prim, flt_img, w_flt, pad=3)
    assert flt_cuts
    pc, ic = matched[0], flt_cuts[0]
    blot = blot_cutout(pc, ic, interp="poly5")
    sel = blot.mask & (np.abs(blot.data) > 1)
    if sel.sum() > 10:
        rel = np.abs(blot.data[sel] - ic.data[sel]) / np.abs(ic.data[sel])
        assert np.median(rel) < 0.05
