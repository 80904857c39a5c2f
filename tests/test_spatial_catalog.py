"""Band-local spatial source detection (catalogs/spatial.py) vs the
replicated-plane device finder — VERDICT r3 task 5 (no host gather in
spatial detection)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from subpixal_tpu.catalogs.device import (find_sources_device,
                                          sigma_clipped_stats_device)
from subpixal_tpu.catalogs.spatial import (SpatialSourceCatalog,
                                           find_sources_spatial,
                                           sigma_clipped_stats_spatial)
from subpixal_tpu.parallel import gather_rows, make_mesh, shard_rows


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, axis_name="rows")


def _starfield(H=128, W=96, seed=3, n=12, boundary_rows=(16, 64)):
    """Random stars plus sources planted EXACTLY on band boundaries
    (Hl = H/8 = 16)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    img = rng.normal(0, 0.05, (H, W))
    pts = []
    for _ in range(n):
        x0 = rng.uniform(8, W - 8)
        y0 = rng.uniform(8, H - 8)
        if min(abs(y0 - b) for b in boundary_rows) < 6:
            y0 += 8.0
        pts.append((x0, y0, rng.uniform(30, 80)))
    for b in boundary_rows:  # straddlers: peak ~on the boundary
        pts.append((rng.uniform(10, W - 10), b + rng.uniform(-0.4, 0.4),
                    60.0))
    for x0, y0, a in pts:
        img += a * np.exp(-((xx - x0) ** 2 + (yy - y0) ** 2) / (2 * 1.8 ** 2))
    return img.astype(np.float32), pts


def test_spatial_stats_match_device(mesh):
    rng = np.random.default_rng(0)
    img = rng.normal(5.0, 2.0, (128, 64)).astype(np.float32)
    img[:40] += 30.0 * (rng.random((40, 64)) > 0.97)  # contamination
    mean_d, med_d, std_d = (float(v) for v in
                            sigma_clipped_stats_device(jnp.asarray(img)))
    band = shard_rows(mesh, jnp.asarray(img))
    mean_s, med_s, std_s = (float(v) for v in
                            sigma_clipped_stats_spatial(mesh, band, 128))
    assert abs(mean_s - mean_d) < 5e-3 * max(1.0, abs(mean_d))
    assert abs(med_s - med_d) < 5e-3 * max(1.0, abs(med_d))
    assert abs(std_s - std_d) < 5e-3 * max(1.0, abs(std_d))


@pytest.fixture(scope="module")
def starband(mesh):
    """One shared (img, pts, band) scene: the finder tests each pay
    only their own finder call, not a fresh scene + H2D + shard."""
    img, pts = _starfield()
    return img, pts, shard_rows(mesh, jnp.asarray(img))


def test_spatial_finder_matches_device(mesh, starband):
    img, pts, band = starband
    cat_d, seg_d = find_sources_device(img, nsigma=5.0, npixels=5,
                                       method="peaks", window=16)
    cat_s, seg_s = find_sources_spatial(mesh, band, 128, nsigma=5.0,
                                        npixels=5, window=16)
    assert len(cat_s) == len(cat_d) == len(pts)
    d_xy = np.sort(np.stack([np.asarray(cat_d["x"]),
                             np.asarray(cat_d["y"])], 1), axis=0)
    s_xy = np.sort(np.stack([np.asarray(cat_s["x"]),
                             np.asarray(cat_s["y"])], 1), axis=0)
    np.testing.assert_allclose(s_xy, d_xy, atol=0.05)
    # straddlers were found exactly once, near the planted boundary rows
    ys = np.asarray(cat_s["y"])
    for b in (16, 64):
        hits = np.abs(ys - b) < 1.0
        assert hits.sum() == 1, f"boundary {b}: {hits.sum()} detections"
    # the sharded seg plane covers every source's peak with its own id
    seg_host = gather_rows(seg_s, 128)
    for i in range(len(cat_s)):
        x = int(round(float(cat_s["x"][i])))
        y = int(round(float(cat_s["y"][i])))
        assert seg_host[y, x] == int(cat_s["id"][i])


def test_spatial_finder_threshold_override(mesh, starband):
    _, pts, band = starband
    # amplitudes in the shared scene span ~30-80: a threshold of 50
    # must drop the faint half while the nsigma default (the
    # matches_device test) finds all len(pts)
    cat_hi, _ = find_sources_spatial(mesh, band, 128, threshold=50.0,
                                     window=16)
    assert 0 < len(cat_hi) < len(pts)


def test_spatial_catalog_facade(mesh, starband):
    img, pts, band = starband
    c = SpatialSourceCatalog(mesh, band, 128, nsigma=5.0, window=16)
    assert len(c) == len(pts)
    assert c.segmentation_device.shape[1] == img.shape[1]
    seg = c.segmentation
    assert seg.shape == img.shape


def test_spatial_align_with_band_local_catalog(mesh):
    """align_images(spatial Drizzle, device_catalog='device') detects
    band-locally (no host gather) and lands on the plain device-catalog
    align's shifts."""
    from subpixal_tpu.align import align_images
    from subpixal_tpu.resample import Drizzle
    from subpixal_tpu.testing import pairwise_shift_errors, simulate_stack

    exps, planted = simulate_stack(n_exp=3, shape=(96, 96), n_stars=6,
                                   seed=21)
    kw = dict(fitgeom="shift", max_iterations=3, usfac=4,
              fit_type="gaussian", cutout_shape=(16, 16), min_sources=3,
              device_catalog="device", catalog_window=16)
    ref = align_images(exposures=[e.copy() for e in exps], **kw)
    d = Drizzle([e.copy() for e in exps], spatial_mesh=mesh)
    res = align_images(resample=d, **kw)
    # round 5: both finders escalate truncated windows, but the
    # band-local finder's effective window is capped by the band
    # height (12 rows here), so window-touching sources measure
    # slightly differently than the replicated finder's escalated
    # 32 px window — a structural band-local property (docs/parity.md
    # #6), ~0.011 px on this scene
    np.testing.assert_allclose(np.asarray(res.shifts),
                               np.asarray(ref.shifts), atol=2e-2)
    err = pairwise_shift_errors(res.shifts, planted)
    assert err < max(0.1, 1.5 * pairwise_shift_errors(ref.shifts,
                                                      planted))
