"""Tests for subpixal_tpu.ops.fit (planted-transform recovery, SURVEY §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from subpixal_tpu.ops.fit import apply_affine, iter_linear_fit


def planted(n=200, geom="general", seed=0, noise=0.0, outliers=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, 4096, size=(n, 2))
    if geom == "shift":
        M = np.eye(2)
        t = np.array([0.37, -0.21])
    elif geom == "rscale":
        th = np.deg2rad(0.01)
        s = 1.0003
        M = s * np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        t = np.array([1.2, -0.8])
    else:
        M = np.array([[1.0002, 3e-5], [-2e-5, 0.9997]])
        t = np.array([0.5, 0.9])
    uv = xy @ M.T + t
    if noise:
        uv = uv + rng.normal(0, noise, uv.shape)
    if outliers:
        idx = rng.choice(n, outliers, replace=False)
        uv[idx] += rng.uniform(3, 10, size=(outliers, 2))
    return xy, uv, M, t, (np.arange(n), idx if outliers else np.array([], int))


@pytest.mark.parametrize("geom", ["shift", "rscale", "general"])
def test_exact_recovery(geom):
    xy, uv, M, t, _ = planted(geom=geom)
    r = iter_linear_fit(jnp.asarray(xy), jnp.asarray(uv), fitgeom=geom, nclip=0)
    np.testing.assert_allclose(np.asarray(r.matrix), M, atol=2e-5)
    np.testing.assert_allclose(np.asarray(r.shift), t, atol=0.05)
    assert float(r.rmse) < 0.02
    assert int(r.nmatches) == 200


@pytest.mark.parametrize("geom", ["shift", "rscale", "general"])
def test_sigma_clip_rejects_planted_outliers(geom):
    xy, uv, M, t, (_, out_idx) = planted(
        geom=geom, noise=0.01, outliers=20, seed=3
    )
    r = iter_linear_fit(jnp.asarray(xy), jnp.asarray(uv), fitgeom=geom,
                        nclip=5, sigma=3.0)
    w = np.asarray(r.weights)
    # all planted outliers clipped
    assert np.all(w[out_idx] == 0.0), "outliers survived clipping"
    # most inliers kept
    assert int(r.nmatches) > 150
    np.testing.assert_allclose(np.asarray(r.matrix), M, atol=1e-4)
    assert float(r.rmse) < 0.05


def test_weights_zero_points_ignored():
    xy, uv, M, t, _ = planted(geom="general", seed=5)
    uv2 = uv.copy()
    uv2[:50] += 100.0  # corrupt half, but zero their weights
    w = np.ones(len(xy))
    w[:50] = 0.0
    r = iter_linear_fit(jnp.asarray(xy), jnp.asarray(uv2), wxy=jnp.asarray(w),
                        fitgeom="general", nclip=0)
    np.testing.assert_allclose(np.asarray(r.matrix), M, atol=2e-5)
    assert int(r.nmatches) == 150


def test_rscale_is_similarity():
    xy, uv, M, t, _ = planted(geom="rscale", noise=0.005, seed=7)
    r = iter_linear_fit(jnp.asarray(xy), jnp.asarray(uv), fitgeom="rscale")
    Mf = np.asarray(r.matrix)
    # similarity: M^T M = s^2 I
    mtm = Mf.T @ Mf
    s2 = mtm[0, 0]
    np.testing.assert_allclose(mtm, s2 * np.eye(2), atol=1e-6)


def test_apply_affine_roundtrip():
    xy = jnp.asarray(np.random.default_rng(0).uniform(0, 100, (10, 2)))
    M = jnp.asarray([[1.01, 0.02], [-0.02, 0.99]])
    t = jnp.asarray([3.0, -4.0])
    uv = apply_affine(xy, M, t)
    r = iter_linear_fit(xy, uv, fitgeom="general", nclip=0)
    np.testing.assert_allclose(np.asarray(apply_affine(xy, r.matrix, r.shift)),
                               np.asarray(uv), atol=1e-3)


def test_vmappable_over_images():
    """The fit must vmap over a leading image axis (multi-frame alignment)."""
    xys, uvs = [], []
    for i in range(4):
        xy, uv, _, _, _ = planted(n=100, geom="general", seed=10 + i, noise=0.01)
        xys.append(xy)
        uvs.append(uv)
    xys = jnp.asarray(np.stack(xys), jnp.float32)
    uvs = jnp.asarray(np.stack(uvs), jnp.float32)
    fit = jax.vmap(lambda a, b: iter_linear_fit(a, b, fitgeom="general", nclip=2))
    r = fit(xys, uvs)
    assert r.matrix.shape == (4, 2, 2)
    assert float(jnp.max(r.rmse)) < 0.05


def test_bad_fitgeom_raises():
    with pytest.raises(ValueError):
        iter_linear_fit(jnp.zeros((10, 2)), jnp.zeros((10, 2)), fitgeom="bogus")


def test_fit_far_from_origin_precision():
    """Catalogs clustered far from the origin must not lose the fit to
    float32 moment cancellation (uncentered second moments of absolute
    coordinates cancel ~7 digits at x~3500; the fix centers on the
    weighted centroid before accumulating)."""
    rng = np.random.default_rng(0)
    N = 200
    xy = rng.normal(3500.0, 60.0, (N, 2))
    shift = np.array([0.02, -0.015])
    M = np.array([[1.0 + 3e-5, -2e-5], [1.5e-5, 1.0 - 1e-5]])
    uv = xy @ M.T + shift + rng.normal(0, 1e-3, (N, 2))
    fit = iter_linear_fit(xy, uv, fitgeom="general", nclip=2, sigma=3.0)
    pred = xy @ np.asarray(fit.matrix).T + np.asarray(fit.shift)
    err = np.abs(pred - uv).max()
    assert err < 5e-3, f"prediction error {err:.4f} px"
    # the planted transform is recovered to sub-mpix at the catalog
    got = np.asarray(fit.shift) + np.array([3500.0, 3500.0]) @ (
        np.asarray(fit.matrix) - np.eye(2)).T
    want = shift + np.array([3500.0, 3500.0]) @ (M - np.eye(2)).T
    assert np.abs(got - want).max() < 2e-3


def test_fit_frames_far_from_origin_precision():
    """Same guarantee for the flattened per-frame fit."""
    from subpixal_tpu.ops.fit import iter_linear_fit_frames

    rng = np.random.default_rng(1)
    E, N = 3, 120
    xy = rng.normal(3000.0, 50.0, (E * N, 2))
    fid = np.repeat(np.arange(E, dtype=np.int32), N)
    shifts = rng.uniform(-0.05, 0.05, (E, 2))
    uv = xy + shifts[fid] + rng.normal(0, 1e-3, (E * N, 2))
    fit = iter_linear_fit_frames(xy, uv, fid, E, fitgeom="shift",
                                 nclip=2, sigma=3.0)
    assert np.abs(np.asarray(fit.shift) - shifts).max() < 1e-3
