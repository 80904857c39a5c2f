"""Tests for catalogs: native labeling, source finder, filters, SEx parsing."""

import numpy as np
import pytest

from subpixal_tpu._native import component_stats, get_lib, label_components
from subpixal_tpu.catalogs import (
    ImageSourceCatalog,
    SExCatalog,
    Table,
    find_sources,
    sigma_clipped_stats,
)


def make_field(h=256, w=256, nsrc=25, seed=0, fwhm=2.5, amp=100.0, bg=10.0,
               noise=1.0):
    rng = np.random.default_rng(seed)
    img = bg + rng.normal(0, noise, (h, w))
    xs = rng.uniform(20, w - 20, nsrc)
    ys = rng.uniform(20, h - 20, nsrc)
    sig = fwhm / 2.3548
    yy, xx = np.mgrid[0:h, 0:w]
    for x0, y0 in zip(xs, ys):
        img += amp * np.exp(-((xx - x0) ** 2 + (yy - y0) ** 2) / (2 * sig**2))
    return img.astype(np.float32), np.stack([xs, ys], 1)


def test_native_lib_builds():
    assert get_lib() is not None, "native labeling lib failed to build"


def test_label_components_matches_scipy():
    rng = np.random.default_rng(1)
    mask = rng.random((64, 64)) > 0.7
    labels, n = label_components(mask, connectivity=8)
    from scipy import ndimage

    ref_labels, ref_n = ndimage.label(mask, structure=np.ones((3, 3)))
    assert n == ref_n
    # same partition (labels may be permuted): compare via matched pairs
    for l in range(1, n + 1):
        sel = labels == l
        ref_vals = np.unique(ref_labels[sel])
        assert len(ref_vals) == 1 and ref_vals[0] != 0
    assert np.array_equal(labels > 0, ref_labels > 0)


def test_component_stats_simple():
    mask = np.zeros((10, 10), bool)
    mask[2:5, 3:6] = True   # 3x3 block
    mask[7:9, 7:9] = True   # 2x2 block
    labels, n = label_components(mask)
    assert n == 2
    data = np.ones((10, 10), np.float32)
    s = component_stats(labels, data, n)
    areas = sorted(s["area"].tolist())
    assert areas == [4, 9]
    i9 = int(np.argmax(s["area"]))
    assert s["cx"][i9] == pytest.approx(4.0)
    assert s["cy"][i9] == pytest.approx(3.0)


def test_find_sources_recovers_planted():
    img, truth = make_field()
    cat, seg = find_sources(img, nsigma=5.0, npixels=5)
    assert len(cat) >= 20  # most of the 25 planted (some may blend)
    # each detection matches a planted source to subpixel-ish accuracy
    d2 = ((cat["x"][:, None] - truth[None, :, 0]) ** 2
          + (cat["y"][:, None] - truth[None, :, 1]) ** 2)
    nearest = np.sqrt(d2.min(axis=1))
    assert np.median(nearest) < 0.2
    assert seg.max() == int(cat["id"].max())
    # segmentation ids match catalog ids
    assert set(cat["id"].tolist()) <= set(np.unique(seg).tolist())


def test_catalog_filters():
    img, _ = make_field()
    c = ImageSourceCatalog(img, nsigma=5.0)
    n_all = len(c.catalog)
    c.set_filters([("flux", ">", float(np.median(c.rawcat["flux"])))])
    n_bright = len(c.catalog)
    assert 0 < n_bright < n_all
    c.append_filters(("area", ">=", 5))
    assert len(c.catalog) <= n_bright
    with pytest.raises(ValueError):
        c.set_filters([("flux", "~", 1.0)])


def test_table_basics():
    t = Table({"a": np.arange(5), "b": np.arange(5) * 2.0})
    assert len(t) == 5
    assert t.colnames == ["a", "b"]
    sub = t[t["a"] > 2]
    assert len(sub) == 2
    with pytest.raises(ValueError):
        t["c"] = np.zeros(3)


def test_sex_catalog_parsing(tmp_path):
    cat = tmp_path / "test.cat"
    cat.write_text(
        "#   1 NUMBER     Running object number\n"
        "#   2 X_IMAGE    Object position along x    [pixel]\n"
        "#   3 Y_IMAGE    Object position along y    [pixel]\n"
        "#   4 FLUX_AUTO  Flux within a Kron-like elliptical aperture\n"
        "1 10.5 20.5 100.0\n"
        "2 30.0 40.0 250.0\n"
    )
    c = SExCatalog(str(cat))
    t = c.catalog
    assert len(t) == 2
    np.testing.assert_allclose(t["x"], [9.5, 29.0])  # 1-based -> 0-based
    np.testing.assert_allclose(t["y"], [19.5, 39.0])
    np.testing.assert_allclose(t["flux"], [100.0, 250.0])
    c.set_filters([("flux", ">", 150)])
    assert len(c.catalog) == 1


def test_sigma_clipped_stats_rejects_sources():
    rng = np.random.default_rng(0)
    data = rng.normal(5.0, 1.0, 10000)
    data[:100] += 500.0  # bright contamination
    mean, med, std = sigma_clipped_stats(data)
    assert abs(med - 5.0) < 0.1
    assert abs(std - 1.0) < 0.1


def test_find_sources_deblends_merged_pair():
    """Two overlapping Gaussians whose footprints merge at the detection
    threshold must be separated by the multi-threshold deblender
    (SExtractor DEBLEND_NTHRESH/DEBLEND_MINCONT semantics)."""
    import numpy as np
    from subpixal_tpu.catalogs import find_sources

    yy, xx = np.mgrid[0:64, 0:64].astype(np.float64)
    img = (100 * np.exp(-((xx - 28) ** 2 + (yy - 32) ** 2) / (2 * 2.5**2))
           + 80 * np.exp(-((xx - 38) ** 2 + (yy - 32) ** 2) / (2 * 2.5**2)))
    rng = np.random.default_rng(0)
    img = (img + rng.normal(0, 0.05, img.shape)).astype(np.float32)

    cat_noD, seg_noD = find_sources(img, threshold=1.0, deblend=False)
    assert len(cat_noD) == 1  # merged at threshold

    cat, seg = find_sources(img, threshold=1.0, deblend=True)
    assert len(cat) == 2
    xs = np.sort(np.asarray(cat["x"]))
    assert abs(xs[0] - 28) < 1.0 and abs(xs[1] - 38) < 1.0
    # segmentation ids match catalog ids and split the pair
    ids = set(np.unique(np.asarray(seg))) - {0}
    assert ids == set(int(i) for i in cat["id"])


def test_find_sources_deblend_keeps_isolated():
    """Isolated sources are untouched by deblending."""
    import numpy as np
    from subpixal_tpu.catalogs import find_sources

    yy, xx = np.mgrid[0:96, 0:96].astype(np.float64)
    img = np.zeros((96, 96))
    for cx, cy in [(20, 20), (70, 25), (40, 70)]:
        img += 50 * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * 2.0**2))
    img = img.astype(np.float32)
    c1, _ = find_sources(img, threshold=0.5, deblend=False)
    c2, _ = find_sources(img, threshold=0.5, deblend=True)
    assert len(c1) == len(c2) == 3


def test_find_sources_deblend_zero_threshold():
    """threshold<=0 (background-subtracted images) must not crash the
    deblender (ratio ladder undefined; falls back to additive ladder)."""
    import numpy as np
    from subpixal_tpu.catalogs import find_sources

    yy, xx = np.mgrid[0:64, 0:64].astype(np.float64)
    img = (100 * np.exp(-((xx - 28) ** 2 + (yy - 32) ** 2) / (2 * 2.5**2))
           + 80 * np.exp(-((xx - 38) ** 2 + (yy - 32) ** 2) / (2 * 2.5**2))
           - 0.5).astype(np.float32)
    for thr in (0.0, -0.2):
        cat, _ = find_sources(img, threshold=thr, deblend=True)
        assert len(cat) >= 2


def test_find_sources_deblend_keeps_faint_child():
    """A faint companion above deblend_cont must survive even though it
    drops below the high threshold levels (most-children split wins,
    not the last level's)."""
    import numpy as np
    from subpixal_tpu.catalogs import find_sources

    yy, xx = np.mgrid[0:96, 0:96].astype(np.float64)
    img = (100 * np.exp(-((xx - 36) ** 2 + (yy - 48) ** 2) / (2 * 2.5**2))
           + 95 * np.exp(-((xx - 60) ** 2 + (yy - 48) ** 2) / (2 * 2.5**2))
           + 10 * np.exp(-((xx - 48) ** 2 + (yy - 60) ** 2) / (2 * 2.5**2)))
    img = img.astype(np.float32)
    cat, _ = find_sources(img, threshold=1.0, deblend=True,
                          deblend_cont=0.005)
    assert len(cat) == 3, f"expected 3 deblended sources, got {len(cat)}"


class TestDeviceCatalog:
    """Device-side detection (catalogs/device.py) must match the host
    finder (deblending off) — stats, catalog, segmentation footprint."""

    def _scene(self):
        rng = np.random.default_rng(11)
        H = W = 256
        img = rng.normal(5.0, 2.0, (H, W)).astype(np.float32)
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
        for (y0, x0), amp in zip(rng.uniform(20, H - 20, (12, 2)),
                                 rng.uniform(40, 120, 12)):
            img += (amp * np.exp(-((xx - x0) ** 2 + (yy - y0) ** 2) / 4.0)
                    ).astype(np.float32)
        return img

    def test_stats_match_host(self):
        from subpixal_tpu.catalogs import sigma_clipped_stats
        from subpixal_tpu.catalogs.device import sigma_clipped_stats_device

        img = self._scene()
        m, med, std = sigma_clipped_stats(img)
        md, medd, stdd = sigma_clipped_stats_device(img)
        assert abs(float(md) - m) < 5e-3
        assert abs(float(medd) - med) < 5e-3
        assert abs(float(stdd) - std) < 5e-3

    @pytest.mark.parametrize("method", ["peaks", "ccl"])
    def test_find_sources_matches_host(self, method):
        from subpixal_tpu.catalogs import find_sources
        from subpixal_tpu.catalogs.device import find_sources_device

        img = self._scene()
        cat_h, seg_h = find_sources(img, deblend=False)
        cat_d, seg_d = find_sources_device(img, method=method)
        assert len(cat_h) == len(cat_d) > 5
        oh = np.lexsort((cat_h["x"], cat_h["y"]))
        od = np.lexsort((cat_d["x"], cat_d["y"]))
        dpos = np.hypot(np.asarray(cat_h["x"])[oh] - np.asarray(cat_d["x"])[od],
                        np.asarray(cat_h["y"])[oh] - np.asarray(cat_d["y"])[od])
        assert dpos.max() < 1e-3
        assert (np.asarray(cat_h["area"])[oh]
                == np.asarray(cat_d["area"])[od]).all()
        rel = (np.abs(np.asarray(cat_h["flux"])[oh]
                      - np.asarray(cat_d["flux"])[od])
               / np.asarray(cat_h["flux"])[oh].max())
        assert rel.max() < 1e-5
        assert ((np.asarray(seg_d) > 0) == (seg_h > 0)).all()

    def test_npixels_filter_and_seg_zeroing(self):
        from subpixal_tpu.catalogs.device import find_sources_device

        img = np.zeros((64, 64), np.float32)
        img[10, 10] = 100.0            # 1-px source: rejected (npixels=5)
        img[30:33, 30:33] = 50.0       # 9-px source: kept
        cat, seg = find_sources_device(img, threshold=10.0)
        assert len(cat) == 1
        seg = np.asarray(seg)
        assert seg[10, 10] == 0
        assert seg[31, 31] > 0

    def test_peaks_cap_keeps_brightest(self):
        """max_sources overflow must drop the FAINTEST sources, not the
        bottom of the image (the r2 'ccl' cap dropped by position)."""
        from subpixal_tpu.catalogs.device import find_sources_device

        rng = np.random.default_rng(3)
        img = rng.normal(0, 0.1, (256, 256)).astype(np.float32)
        yy, xx = np.mgrid[0:9, 0:9].astype(np.float32) - 4
        psf = np.exp(-(xx**2 + yy**2) / (2 * 1.5**2))
        amps = np.linspace(10, 100, 20)
        poss = rng.integers(12, 244, (20, 2))
        for (y, x), a in zip(poss, amps):
            img[y - 4:y + 5, x - 4:x + 5] += a * psf
        with pytest.warns(UserWarning, match="FAINTEST"):
            cat, _ = find_sources_device(img, threshold=3.0,
                                         max_sources=8)
        assert len(cat) == 8
        # the 8 brightest planted sources survive (set comparison: blends
        # can reorder peak values), returned brightest-first
        want = poss[np.argsort(amps)[::-1][:8]]
        got = np.stack([np.asarray(cat["y"]), np.asarray(cat["x"])], 1)
        gr = np.round(got).astype(int)
        ow = np.lexsort((want[:, 1], want[:, 0]))
        og = np.lexsort((gr[:, 1], gr[:, 0]))
        assert np.abs(got[og] - want[ow]).max() < 0.5
        assert (np.diff(np.asarray(cat["peak"])) <= 0).all()

    def test_peaks_dedup_single_component(self):
        """Two local maxima in ONE connected component: with the
        deblender disabled only the brighter survives and its moments
        cover the whole component; with the (default) deblender the
        pair splits — matching the host finder, which also returns 2."""
        from subpixal_tpu.catalogs.device import find_sources_device

        img = np.zeros((64, 64), np.float32)
        yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
        img += 50 * np.exp(-((xx - 30) ** 2 + (yy - 32) ** 2) / 8.0)
        img += 30 * np.exp(-((xx - 36) ** 2 + (yy - 32) ** 2) / 8.0)
        cat, seg = find_sources_device(img, threshold=1.0,
                                       deblend_nthresh=1)
        assert len(cat) == 1
        comp = (img > 1.0)
        assert int(cat["area"][0]) == int(comp.sum())
        assert ((np.asarray(seg) > 0) == comp).all()
        cat2, seg2 = find_sources_device(img, threshold=1.0)
        assert len(cat2) == 2
        # every component pixel is assigned to one of the two children
        # except the contested lockstep-tie ring (documented deviation)
        covered = (np.asarray(seg2) > 0) & comp
        assert covered.sum() >= 0.9 * comp.sum()

    def test_peaks_border_source(self):
        from subpixal_tpu.catalogs.device import find_sources_device

        img = np.zeros((128, 128), np.float32)
        yy, xx = np.mgrid[0:128, 0:128].astype(np.float32)
        img += 40 * np.exp(-((xx - 2) ** 2 + (yy - 64) ** 2) / 4.0)
        cat, _ = find_sources_device(img, threshold=1.0)
        assert len(cat) == 1
        assert abs(float(cat["y"][0]) - 64) < 0.2
        assert float(cat["x"][0]) < 3.0

    def test_peaks_diagonal_string_minarea(self):
        """A 5-px diagonal component must survive npixels=5 — the
        integral-image prefilter uses radius npixels-1, so a thin
        string reaching away from its peak is not falsely rejected."""
        from subpixal_tpu.catalogs.device import find_sources_device

        img = np.zeros((64, 64), np.float32)
        for k in range(5):              # descending diagonal string
            img[20 + k, 20 + k] = 50.0 - k
        cat, _ = find_sources_device(img, threshold=10.0, npixels=5)
        assert len(cat) == 1
        assert int(cat["area"][0]) == 5


def test_device_deblend_matches_host_crowded_pair():
    """VERDICT r3 task 8: a crowded pair merged at the detection
    threshold deblends on the DEVICE path into the same source count
    and positions as the host multi-threshold deblender."""
    from subpixal_tpu.catalogs import find_sources
    from subpixal_tpu.catalogs.device import find_sources_device

    rng = np.random.default_rng(9)
    H = W = 96
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)

    def g(x0, y0, amp, sig):
        return amp * np.exp(-((xx - x0) ** 2 + (yy - y0) ** 2)
                            / (2 * sig * sig))

    # two pairs merged at threshold (separations ~3.5-4 sigma) plus an
    # isolated control star
    img = (g(40.0, 48.0, 100.0, 2.0) + g(47.0, 50.0, 55.0, 2.0)
           + g(70.0, 20.0, 80.0, 1.8) + g(70.0, 27.5, 60.0, 1.8)
           + g(20.0, 75.0, 90.0, 2.0)
           + rng.normal(0, 0.05, (H, W))).astype(np.float32)
    thr = 1.0

    cat_h, _ = find_sources(img, threshold=thr, npixels=5)
    cat_d, seg_d = find_sources_device(img, threshold=thr, npixels=5,
                                       method="peaks", window=32)

    assert len(cat_d) == len(cat_h) == 5, (len(cat_d), len(cat_h))
    hxy = np.sort(np.stack([cat_h["x"], cat_h["y"]], 1), axis=0)
    dxy = np.sort(np.stack([np.asarray(cat_d["x"]),
                            np.asarray(cat_d["y"])], 1), axis=0)
    # round 5: euclidean nearest-seed skirt assignment (host parity;
    # the only remaining deviation is the other-children seed proxy —
    # 3x3-refined peaks vs the host's core centroids). Measured
    # 0.074 px max on this scene; pinned at 0.2 (VERDICT r4 task 5
    # target, was 0.5 with the geodesic growth).
    np.testing.assert_allclose(dxy, hxy, atol=0.2)

    # deblending must not perturb isolated sources: rerun with it off
    cat_off, _ = find_sources_device(img, threshold=thr, npixels=5,
                                     method="peaks", window=32,
                                     deblend_nthresh=1)
    assert len(cat_off) == 3  # pairs stay merged without deblending

    # the segmentation plane splits the pair (both ids present near
    # the two seeds)
    seg = np.asarray(seg_d)
    assert seg[48, 40] != seg[50, 47] and seg[48, 40] > 0
    assert seg[20, 70] != seg[27, 70] and seg[20, 70] > 0


def test_device_finder_big_source_window_escalation():
    """VERDICT r4 task 5: a source larger than the measurement window
    is no longer truncated — the finder escalates the window until the
    footprint fits, and the measurement matches the host finder."""
    from subpixal_tpu.catalogs import find_sources
    from subpixal_tpu.catalogs.device import find_sources_device

    rng = np.random.default_rng(21)
    H = W = 160
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)

    def g(x0, y0, amp, sig):
        return amp * np.exp(-((xx - x0) ** 2 + (yy - y0) ** 2)
                            / (2 * sig * sig))

    # giant (footprint ~65 px at thr=1) + two ordinary stars
    img = (g(80.0, 78.0, 100.0, 12.0) + g(30.0, 30.0, 60.0, 1.8)
           + g(130.0, 40.0, 70.0, 1.8)
           + rng.normal(0, 0.05, (H, W))).astype(np.float32)

    cat_h, _ = find_sources(img, threshold=1.0, npixels=5,
                            deblend=False)
    cat_d, seg_d = find_sources_device(img, threshold=1.0, npixels=5,
                                       method="peaks", window=32,
                                       deblend_nthresh=1)
    assert len(cat_d) == len(cat_h) == 3
    order_h = np.argsort(np.asarray(cat_h["flux"]))
    order_d = np.argsort(np.asarray(cat_d["flux"]))
    for col, tol in (("x", 0.05), ("y", 0.05), ("area", 0),
                     ("xmin", 0), ("xmax", 0), ("ymin", 0), ("ymax", 0)):
        hv = np.asarray(cat_h[col], np.float64)[order_h]
        dv = np.asarray(cat_d[col], np.float64)[order_d]
        np.testing.assert_allclose(dv, hv, atol=tol, err_msg=col)
    # flux of the giant measured WHOLE (window escalated past 65 px)
    np.testing.assert_allclose(
        np.asarray(cat_d["flux"], np.float64)[order_d],
        np.asarray(cat_h["flux"], np.float64)[order_h], rtol=1e-4)
