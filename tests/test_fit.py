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
