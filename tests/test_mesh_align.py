"""Full mesh-parallel align_images (SURVEY §2b): parity vs single-device.

Runs on the virtual 8-CPU mesh (conftest). The mesh path shards the
re-drizzle over exposures and the measurement over the flattened cutout
batch, psum-reducing accumulators and fit moments — results must match
the single-device fixed point to float32 reduction tolerance.
"""

import numpy as np
import pytest

from subpixal_tpu.align import align_images
from subpixal_tpu.parallel import make_mesh
from subpixal_tpu.resample import Exposure
from subpixal_tpu.wcs.wcs import TanWCS


def _scene(E=3, shape=(256, 256), nstars=12, seed=7):
    rng = np.random.default_rng(seed)
    cd = (0.05 / 3600.0) * np.array([[-1.0, 0.0], [0.0, 1.0]])
    stars = np.stack([rng.uniform(25, shape[1] - 25, nstars),
                      rng.uniform(25, shape[0] - 25, nstars)], 1)
    yy, xx = np.mgrid[0:shape[0], 0:shape[1]].astype(np.float32)
    exps, planted = [], []
    for e in range(E):
        dx, dy = rng.uniform(-0.4, 0.4, 2)
        planted.append((dx, dy))
        img = rng.normal(0, 0.01, shape).astype(np.float32)
        for x0, y0 in stars:
            r2 = (xx - x0 - dx) ** 2 + (yy - y0 - dy) ** 2
            img += np.where(r2 < 64.0,
                            20.0 * np.exp(-r2 / (2 * 1.6 ** 2)),
                            0.0).astype(np.float32)
        wcs = TanWCS(crpix=np.array([shape[1] / 2, shape[0] / 2]),
                     crval=np.array([150.0, 2.0]), cd=cd)
        exps.append(Exposure(img, wcs, name=f"m{e}"))
    return exps, planted


COMMON = dict(fitgeom="shift", max_iterations=3, usfac=4,
              fit_type="gaussian", cutout_shape=(24, 24), min_sources=3)


@pytest.mark.parametrize("n_dev", [8, 4])
def test_mesh_align_matches_single_device(n_dev):
    exps, planted = _scene()
    res1 = align_images(exposures=exps, **COMMON)
    exps, _ = _scene()
    mesh = make_mesh(n_dev)
    res2 = align_images(exposures=exps, mesh=mesh, **COMMON)

    sh1 = np.asarray(res1.shifts)
    sh2 = np.asarray(res2.shifts)
    assert np.abs(sh1 - sh2).max() < 5e-4, (sh1, sh2)
    np.testing.assert_allclose(np.asarray(res1.matrices),
                               np.asarray(res2.matrices), atol=5e-5)
    # same iteration structure and match counts
    assert res1.n_iterations == res2.n_iterations
    for recs1, recs2 in zip(res1.history, res2.history):
        for r1, r2 in zip(recs1, recs2):
            assert r1.nmatches == r2.nmatches


def test_mesh_align_recovers_planted_shifts():
    exps, planted = _scene(seed=9)
    E = len(exps)
    mesh = make_mesh(8)
    res = align_images(exposures=exps, mesh=mesh, **COMMON)
    sh = np.asarray(res.shifts)
    errs = []
    for i in range(E):
        for j in range(E):
            got = sh[i] - sh[j]
            want = (planted[j][0] - planted[i][0],
                    planted[j][1] - planted[i][1])
            errs.append(np.hypot(got[0] - want[0], got[1] - want[1]))
    assert max(errs) < 0.02, f"max pairwise err {max(errs):.4f} px"


def test_mesh_align_device_loop():
    """The on-device while_loop drives the SPMD step too."""
    exps, _ = _scene(seed=3)
    mesh = make_mesh(8)
    res = align_images(exposures=exps, mesh=mesh, device_loop=True,
                       **COMMON)
    assert res.n_iterations >= 1
    assert np.isfinite(np.asarray(res.shifts)).all()




def test_mesh_align_more_frames_than_devices():
    """E > n_devices: each device deposits MULTIPLE local frames (the
    static unroll over Ep // D slots) and frame padding still rounds Ep
    up to the mesh size."""
    exps, _ = _scene(E=6, seed=17)
    res1 = align_images(exposures=exps, **COMMON)
    exps, _ = _scene(E=6, seed=17)
    res2 = align_images(exposures=exps, mesh=make_mesh(4), **COMMON)
    np.testing.assert_allclose(np.asarray(res1.shifts),
                               np.asarray(res2.shifts), atol=5e-4)
    assert res1.n_iterations == res2.n_iterations


def _sparse_scene(E=3, shape=(256, 1024), nstars=10, seed=23):
    """Wide frame with sources confined to the left third so the sparse
    live set genuinely engages (block columns are 128 px wide)."""
    rng = np.random.default_rng(seed)
    cd = (0.05 / 3600.0) * np.array([[-1.0, 0.0], [0.0, 1.0]])
    stars = np.stack([rng.uniform(40, 300, nstars),
                      rng.uniform(30, shape[0] - 30, nstars)], 1)
    yy, xx = np.mgrid[0:shape[0], 0:shape[1]].astype(np.float32)
    exps, planted = [], []
    for e in range(E):
        dx, dy = rng.uniform(-0.4, 0.4, 2)
        planted.append((dx, dy))
        img = rng.normal(0, 0.01, shape).astype(np.float32)
        for x0, y0 in stars:
            r2 = (xx - x0 - dx) ** 2 + (yy - y0 - dy) ** 2
            img += np.where(r2 < 64.0,
                            20.0 * np.exp(-r2 / (2 * 1.6 ** 2)),
                            0.0).astype(np.float32)
        wcs = TanWCS(crpix=np.array([shape[1] / 2, shape[0] / 2]),
                     crval=np.array([150.0, 2.0]), cd=cd)
        exps.append(Exposure(img, wcs, name=f"sp{e}"))
    return exps


def test_mesh_align_with_sparse_deposit():
    """Frame-padded COMPACT deposit arrays under the mesh: the sparse
    compaction and the SPMD sharding compose (XLA deposit path)."""
    exps = _sparse_scene()
    res1 = align_images(exposures=exps, sparse_deposit=True, **COMMON)
    exps = _sparse_scene()
    res2 = align_images(exposures=exps, mesh=make_mesh(4),
                        sparse_deposit=True, **COMMON)
    # compaction must actually have ENGAGED in both runs (the recorded
    # live fraction only exists when the deposit was compacted)
    assert res1.setup_breakdown.get("sparse_live_frac", 1.0) < 0.85
    assert res2.setup_breakdown.get("sparse_live_frac", 1.0) < 0.85
    np.testing.assert_allclose(np.asarray(res1.shifts),
                               np.asarray(res2.shifts), atol=5e-4)
    assert res1.n_iterations == res2.n_iterations


def test_mesh_align_mixed_pixel_scales():
    """Mixed-pixel-scale stacks under a mesh use EXACT per-frame pscale
    ratios (one lax.switch branch per distinct static ratio) — parity
    with the single-device path, no mean-ratio degradation and no
    warning (VERDICT r2 weak #3 / ADVICE r2 #1)."""
    import warnings

    def scene():
        rng = np.random.default_rng(31)
        ref = TanWCS(crpix=np.array([128.0, 128.0]),
                     crval=np.array([150.0, 2.0]),
                     cd=(0.05 / 3600.0) * np.array([[-1.0, 0.0],
                                                    [0.0, 1.0]]))
        stars = np.stack([rng.uniform(30, 226, 10),
                          rng.uniform(30, 226, 10)], 1)
        ra, dec = ref.pixel_to_world(stars[:, 0], stars[:, 1])
        exps = []
        for e, scale in enumerate([0.05, 0.05, 0.065, 0.065]):
            cd = (scale / 3600.0) * np.array([[-1.0, 0.0], [0.0, 1.0]])
            err = rng.uniform(-0.3, 0.3, 2) if e else np.zeros(2)
            true_wcs = TanWCS(crpix=np.array([128.0, 128.0]),
                              crval=np.array([150.0, 2.0]), cd=cd)
            wrong = true_wcs.replace(crpix=true_wcs.crpix + err)
            H = W = 256
            img = rng.normal(0, 0.01, (H, W)).astype(np.float32)
            xs, ys = true_wcs.world_to_pixel(ra, dec)
            yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
            for x0, y0 in zip(xs, ys):
                r2 = (xx - x0) ** 2 + (yy - y0) ** 2
                img += np.where(r2 < 64.0,
                                20.0 * np.exp(-r2 / (2 * 1.6 ** 2)),
                                0.0).astype(np.float32)
            exps.append(Exposure(img, wrong, name=f"mx{e}"))
        return exps

    res1 = align_images(exposures=scene(), **COMMON)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        res2 = align_images(exposures=scene(), mesh=make_mesh(4),
                            **COMMON)
    assert not any("pscale" in str(w.message).lower() for w in rec)
    np.testing.assert_allclose(np.asarray(res1.shifts),
                               np.asarray(res2.shifts), atol=1e-3)
    assert res1.n_iterations == res2.n_iterations


def test_mesh_with_device_resident_exposures():
    """Mesh-parallel align consumes device-resident Exposures
    (jax-array .data) end-to-end."""
    import jax

    from subpixal_tpu.align import align_images
    from subpixal_tpu.parallel import make_mesh
    from subpixal_tpu.testing import pairwise_shift_errors, simulate_stack

    exps, planted = simulate_stack(n_exp=4, shape=(256, 256), n_stars=20,
                                   seed=5, device=True)
    assert isinstance(exps[0].data, jax.Array)
    res = align_images(exposures=exps, fitgeom="shift", max_iterations=3,
                       usfac=8, fit_type="gaussian", mesh=make_mesh())
    assert pairwise_shift_errors(
        np.asarray(res.shifts), planted) < 5e-3


def test_mesh_align_oversized_footprint_bucket():
    """Round 4: the oversized-footprint bucket runs under ``mesh=`` —
    the giant source is measured whole in its sharded big-shape bucket
    (no truncation record, no footprint warning) and the fixed point
    matches the single-chip bucket path."""
    import warnings

    def scene():
        exps, planted = _scene(seed=31)
        yy, xx = np.mgrid[0:256, 0:256].astype(np.float32)
        for e, (dx, dy) in zip(exps, planted):
            e.data = e.data + (60.0 * np.exp(
                -((xx - 70 - dx) ** 2 + (yy - 180 - dy) ** 2)
                / (2 * 7.0 ** 2))).astype(np.float32)
        return exps

    kw = dict(COMMON, use_weights=False)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        res1 = align_images(exposures=scene(), **kw)
        res2 = align_images(exposures=scene(), mesh=make_mesh(4), **kw)
    assert not [w for w in rec if "footprint" in str(w.message)]
    # the bucket really ENGAGED (the scene's giant footprint exceeds
    # the 24x24 base cutout): its staging stage was marked on both
    # paths — truncated_sources == [] alone would also hold vacuously
    assert "big_bucket_stage" in res1.setup_breakdown
    assert "big_bucket_stage" in res2.setup_breakdown
    assert res1.truncated_sources == []
    assert res2.truncated_sources == []
    sh1 = np.asarray(res1.shifts)
    sh2 = np.asarray(res2.shifts)
    assert np.abs(sh1 - sh2).max() < 5e-4, (sh1, sh2)


def test_mesh_align_otf_matches_single_device():
    """Round 5 (VERDICT r4 task 6): ``wcsupdate='otf'`` runs under
    ``mesh=`` — sequential per-exposure updates with the full sharded
    deposit+measurement reused per sub-step — and lands on the
    single-chip otf fixed point."""
    kw = dict(COMMON, wcsupdate="otf")
    exps, _ = _scene()
    res1 = align_images(exposures=exps, **kw)
    exps, _ = _scene()
    res2 = align_images(exposures=exps, mesh=make_mesh(8), **kw)
    sh1 = np.asarray(res1.shifts)
    sh2 = np.asarray(res2.shifts)
    assert np.abs(sh1 - sh2).max() < 5e-4, (sh1, sh2)
    np.testing.assert_allclose(np.asarray(res1.matrices),
                               np.asarray(res2.matrices), atol=5e-5)
    assert res1.n_iterations == res2.n_iterations
    # otf differs from batch on this scene (the mode actually engaged)
    exps, _ = _scene()
    resb = align_images(exposures=exps, mesh=make_mesh(8), **COMMON)
    assert np.abs(np.asarray(resb.shifts) - sh2).max() > 1e-6


def test_mesh_align_otf_bucket_composes():
    """Round 5: ``wcsupdate='otf'`` + the oversized-footprint bucket
    compose under ``mesh=`` (each otf sub-step re-measures the big
    sources whole before ITS fit) and match the single-chip otf+bucket
    fixed point."""
    import warnings

    def scene():
        exps, planted = _scene(seed=31)
        yy, xx = np.mgrid[0:256, 0:256].astype(np.float32)
        for e, (dx, dy) in zip(exps, planted):
            e.data = e.data + (60.0 * np.exp(
                -((xx - 70 - dx) ** 2 + (yy - 180 - dy) ** 2)
                / (2 * 7.0 ** 2))).astype(np.float32)
        return exps

    kw = dict(COMMON, use_weights=False, wcsupdate="otf")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        res1 = align_images(exposures=scene(), **kw)
        res2 = align_images(exposures=scene(), mesh=make_mesh(4), **kw)
    assert not [w for w in rec if "footprint" in str(w.message)]
    assert "big_bucket_stage" in res2.setup_breakdown
    assert res1.truncated_sources == res2.truncated_sources == []
    sh1 = np.asarray(res1.shifts)
    sh2 = np.asarray(res2.shifts)
    assert np.abs(sh1 - sh2).max() < 5e-4, (sh1, sh2)
