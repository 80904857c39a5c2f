"""Tests for subpixal_tpu.ops.cutouts (gather semantics vs numpy oracle)."""

import jax.numpy as jnp
import numpy as np
import pytest

from subpixal_tpu.ops.cutouts import (
    OVERLAP_FULL,
    OVERLAP_NONE,
    OVERLAP_PARTIAL,
    extract_cutouts,
    insert_cutouts,
)


def test_interior_cutout_matches_numpy():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(100, 120)).astype(np.float32)
    centers = jnp.asarray([[60.0, 50.0], [30.2, 40.7]])
    cb = extract_cutouts(jnp.asarray(img), centers, (16, 16))
    # center (x=60, y=50) -> blc = (50-8, 60-8) = (42, 52)
    np.testing.assert_array_equal(np.asarray(cb.data[0]), img[42:58, 52:68])
    # rounded center (x=30, y=41) -> blc = (33, 22)
    np.testing.assert_array_equal(np.asarray(cb.data[1]), img[33:49, 22:38])
    assert np.all(np.asarray(cb.mask))
    assert np.all(np.asarray(cb.overlap) == OVERLAP_FULL)


def test_edge_cutout_partial_overlap_and_padding():
    img = np.arange(64, dtype=np.float32).reshape(8, 8)
    cb = extract_cutouts(jnp.asarray(img), jnp.asarray([[0.0, 0.0]]), (6, 6))
    data = np.asarray(cb.data[0])
    mask = np.asarray(cb.mask[0])
    # blc = (-3, -3): top-left 3 rows/cols are padding
    assert int(cb.overlap[0]) == OVERLAP_PARTIAL
    assert not mask[0, 0] and mask[3, 3]
    np.testing.assert_array_equal(data[3:, 3:], img[0:3, 0:3])
    assert np.all(data[~mask] == 0.0)


def test_no_overlap():
    img = np.zeros((8, 8), np.float32)
    cb = extract_cutouts(jnp.asarray(img), jnp.asarray([[50.0, 50.0]]), (4, 4))
    assert int(cb.overlap[0]) == OVERLAP_NONE
    assert not np.any(np.asarray(cb.mask[0]))


def test_insert_roundtrip_set():
    rng = np.random.default_rng(1)
    img = rng.normal(size=(40, 40)).astype(np.float32)
    centers = jnp.asarray([[10.0, 10.0], [30.0, 25.0]])
    cb = extract_cutouts(jnp.asarray(img), centers, (8, 8))
    out = insert_cutouts(jnp.zeros((40, 40)), cb.data, cb.blc, cb.mask, mode="set")
    out = np.asarray(out)
    np.testing.assert_array_equal(out[6:14, 6:14], img[6:14, 6:14])
    np.testing.assert_array_equal(out[21:29, 26:34], img[21:29, 26:34])
    # untouched elsewhere
    assert out[0, 0] == 0.0


def test_insert_add_accumulates_overlap():
    data = jnp.ones((2, 4, 4))
    blc = jnp.asarray([[0, 0], [2, 2]], jnp.int32)
    out = np.asarray(insert_cutouts(jnp.zeros((8, 8)), data, blc, mode="add"))
    assert out[0, 0] == 1.0
    assert out[3, 3] == 2.0  # overlap region
    assert out[5, 5] == 1.0
    assert out[7, 7] == 0.0


def test_insert_clips_out_of_image():
    data = jnp.ones((1, 4, 4))
    blc = jnp.asarray([[-2, -2]], jnp.int32)
    out = np.asarray(insert_cutouts(jnp.zeros((8, 8)), data, blc, mode="add"))
    assert out[0, 0] == 1.0 and out[1, 1] == 1.0
    assert out.sum() == 4.0  # only the 2x2 in-image corner landed


def test_bad_mode_raises():
    with pytest.raises(ValueError):
        insert_cutouts(jnp.zeros((8, 8)), jnp.ones((1, 2, 2)),
                       jnp.zeros((1, 2), jnp.int32), mode="bogus")
