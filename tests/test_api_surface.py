"""Edge coverage for public-API symbols not exercised elsewhere:
``parse_file_name``/``py2round`` (reference ``subpixal/utils.py``),
the overlap-exception taxonomy, ``create_input_image_cutouts``'s
skip-on-NoOverlap pairing, ``SExImageCatalog``'s binary discovery, and
``ImageAlignInfo``'s structured JSON-lines contract (SURVEY §5)."""

import dataclasses
import json

import numpy as np
import pytest

from subpixal_tpu import (
    Cutout,
    NoOverlapError,
    PartialOverlapError,
    create_input_image_cutouts,
    parse_file_name,
)
from subpixal_tpu.align import ImageAlignInfo
from subpixal_tpu.cutout import _extract_host
from subpixal_tpu.utils import py2round
from subpixal_tpu.wcs.wcs import TanWCS


def _wcs(crpix, scale=0.05):
    s = scale / 3600.0
    return TanWCS(crpix=np.asarray(crpix, float),
                  crval=np.array([150.0, 2.0]),
                  cd=s * np.array([[-1.0, 0.0], [0.0, 1.0]]))


class TestParseFileName:
    @pytest.mark.parametrize("spec,want", [
        ("img.fits", ("img.fits", None)),
        ("img.fits[3]", ("img.fits", 3)),
        ("img.fits[sci]", ("img.fits", ("SCI", 1))),
        ("img.fits[sci,2]", ("img.fits", ("SCI", 2))),
        ("img.fits[SCI, 2]", ("img.fits", ("SCI", 2))),
        ("/a/b/img.fits[err,1]", ("/a/b/img.fits", ("ERR", 1))),
    ])
    def test_specs(self, spec, want):
        assert parse_file_name(spec) == want


def test_py2round_half_away_from_zero():
    # the reference relies on Python-2 rounding (0.5 away from zero),
    # not banker's rounding
    assert py2round(0.5) == 1.0
    assert py2round(-0.5) == -1.0
    assert py2round(1.5) == 2.0
    assert py2round(2.5) == 3.0


class TestOverlapExceptions:
    def test_no_overlap_raises(self):
        img = np.zeros((16, 16), np.float32)
        with pytest.raises(NoOverlapError):
            _extract_host(img, 100, 100, 8, 8)

    def test_partial_overlap_policy(self):
        img = np.arange(256, dtype=np.float32).reshape(16, 16)
        with pytest.raises(PartialOverlapError):
            _extract_host(img, -2, 0, 8, 8, allow_partial=False)
        # default policy: translate/pad with a validity mask instead
        data, mask = _extract_host(img, -2, 0, 8, 8)
        assert data.shape == (8, 8)
        assert not mask[0].any() and mask[2:].all()
        # exception taxonomy: both are ValueErrors (reference parity)
        assert issubclass(NoOverlapError, ValueError)
        assert issubclass(PartialOverlapError, ValueError)


def test_create_input_image_cutouts_skips_off_frame_sources():
    """Sources off the exposure are dropped, and the returned pairing
    (image cutout <-> its primary) stays aligned (reference NoOverlap
    skip path, SURVEY §3.1)."""
    drz = np.zeros((64, 64), np.float32)
    wcs_drz = _wcs((32, 32))
    primaries = []
    for sid, (sx, sy) in enumerate([(20.0, 20.0), (60.0, 60.0)]):
        x0, y0 = int(sx) - 5, int(sy) - 5
        primaries.append(Cutout(
            data=drz[y0:y0 + 11, x0:x0 + 11].copy(),
            wcs=wcs_drz.with_shifted_crpix(x0, y0),
            blc=(y0, x0), src_pos=(sx - x0, sy - y0), src_id=sid))
    # the exposure covers only the first source's sky position
    img = np.ones((24, 24), np.float32)
    wcs_img = _wcs((12, 12))
    # place the exposure's center on the drizzled (20, 20) sky position
    ra, dec = wcs_drz.pixel_to_world(np.array([20.0]), np.array([20.0]))
    wcs_img = wcs_img.replace(crval=np.array([float(ra[0]), float(dec[0])]))
    cuts, matched = create_input_image_cutouts(primaries, img, wcs_img)
    assert len(cuts) == len(matched) == 1
    assert matched[0].src_id == 0
    # the matched source's position lands at the exposure center
    np.testing.assert_allclose(
        np.asarray(cuts[0].src_pos) + np.asarray(cuts[0].blc)[::-1],
        [12.0, 12.0], atol=0.1)


def test_sex_image_catalog_requires_binary(tmp_path, monkeypatch):
    """Without a SExtractor binary on PATH, execute() raises a clear
    error pointing at the native finder (the default in this build)."""
    import shutil as _shutil

    from subpixal_tpu import SExImageCatalog

    monkeypatch.setattr(_shutil, "which", lambda *_a, **_k: None)
    img = tmp_path / "x.fits"
    img.write_bytes(b"")
    cat = SExImageCatalog(str(img), "conf.sex")
    assert cat.sextractor_cmd is None
    with pytest.raises(RuntimeError, match="SExtractor"):
        cat.execute()


def test_image_align_info_json_roundtrip():
    rec = ImageAlignInfo(
        name="e0", iteration=2, shift=(0.1, -0.2),
        matrix=((1.0, 0.0), (0.0, 1.0)), rms=(0.01, 0.02),
        rmse=0.015, mae=0.012, nmatches=42, iter_s=0.033)
    line = json.dumps(dataclasses.asdict(rec))
    back = json.loads(line)
    assert back["name"] == "e0" and back["nmatches"] == 42
    assert back["shift"] == [0.1, -0.2]
