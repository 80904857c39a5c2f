"""Band-local source detection on a row-sharded mosaic (no host gather).

VERDICT r3 task 5: spatial (row-band) aligns previously fetched the
drizzled mosaic to host chunk-wise and ran the host finder — re-paying
the very transfer the spatial mode exists to avoid. This module runs
the device peaks finder (:mod:`subpixal_tpu.catalogs.device`,
reference-parity detection semantics: threshold = median +
nsigma*std, npixels area filter, in-window deblending) BAND-LOCALLY
under ``shard_map``:

* **global statistics without a gather**: the sigma-clip keeps a value
  interval, so per-iteration count/sum/sumsq of the kept values are
  exact ``psum`` reductions; the median comes from a fixed 40-step
  value-axis bisection on psum'd counts (exact to f32 resolution);
* **detection**: each band is extended by ``window`` halo rows
  (:func:`~subpixal_tpu.parallel.spatial.halo_exchange`), the
  replicated-plane peaks finder runs per band, and a candidate is OWNED
  by the band containing its peak pixel — a straddling source is seen
  by both neighbors but kept exactly once, measured on its full
  (in-window) footprint via the halo;
* **merge**: only the KB-class packed tables cross to host; the
  segmentation planes stay on device, band-local ranks remapped to
  global catalog ids per band.

The mosaic plane itself never crosses to host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from . import Table

__all__ = ["sigma_clipped_stats_spatial", "find_sources_spatial",
           "SpatialSourceCatalog"]


def _rows_axis(mesh: Mesh) -> str:
    return mesh.axis_names[-1]


@functools.partial(jax.jit, static_argnames=("mesh", "logical_rows",
                                             "sigma", "maxiters"))
def sigma_clipped_stats_spatial(mesh: Mesh, band_plane, logical_rows: int,
                                sigma: float = 3.0, maxiters: int = 5):
    """(mean, median, std) of a row-sharded plane, via psum reductions.

    Same value-interval fixed point as
    :func:`~subpixal_tpu.catalogs.device.sigma_clipped_stats_device`
    (and the host ``sigma_clipped_stats``), but with the per-iteration
    statistics computed as exact global ``psum``s of band-local
    partials, and the median located by a fixed 40-step bisection of
    the value axis on psum'd counts — no sort, no gather. Median
    agreement with the sorted path is to f32 bisection resolution
    (relative ~2^-40), far below the nsigma*std term it feeds.
    """
    rax = _rows_axis(mesh)
    Hl = band_plane.shape[0] // mesh.shape[rax]
    Ho = int(logical_rows)

    def shard_fn(band):
        row0 = jax.lax.axis_index(rax) * Hl
        rows = row0 + jax.lax.iota(jnp.int32, band.shape[0])
        x = band.astype(jnp.float32)
        finite = jnp.isfinite(x) & (rows < Ho)[:, None]
        xs = jnp.where(finite, x, 0.0)
        big = jnp.float32(3.4e38)
        gmin = jax.lax.pmin(jnp.min(jnp.where(finite, x, big)), rax)
        gmax = -jax.lax.pmin(jnp.min(jnp.where(finite, -x, big)), rax)

        def interval_stats(vlo, vhi):
            inside = finite & (x >= vlo) & (x <= vhi)
            cnt = jax.lax.psum(jnp.sum(inside.astype(jnp.float32)), rax)
            s1 = jax.lax.psum(jnp.sum(jnp.where(inside, xs, 0.0)), rax)
            mean = s1 / jnp.maximum(cnt, 1.0)
            # psum of MEAN-CENTERED squares (cancellation guard)
            s2 = jax.lax.psum(
                jnp.sum(jnp.where(inside, (xs - mean) ** 2, 0.0)), rax)
            var = jnp.maximum(s2 / jnp.maximum(cnt, 1.0), 0.0)
            # median: bisection on the value axis; count below midpoint
            target = (cnt - 1.0) * 0.5

            def bis(state, _):
                a, b = state
                mid = 0.5 * (a + b)
                below = jax.lax.psum(
                    jnp.sum((inside & (x < mid)).astype(jnp.float32)),
                    rax)
                a2 = jnp.where(below <= target, mid, a)
                b2 = jnp.where(below <= target, b, mid)
                return (a2, b2), None

            (a, b), _ = jax.lax.scan(
                bis, (jnp.minimum(vlo, gmin), jnp.maximum(vhi, gmax)),
                None, length=40)
            med = 0.5 * (a + b)
            return mean, med, jnp.sqrt(var)

        vlo = gmin
        vhi = gmax
        mean = med = std = jnp.float32(0.0)
        for _ in range(maxiters):
            mean, med, std = interval_stats(vlo, vhi)
            vlo = med - sigma * std
            vhi = med + sigma * std
        mean, med, std = interval_stats(vlo, vhi)
        return mean, med, std

    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=P(rax, None),
                       out_specs=(P(), P(), P()))
    return fn(band_plane)


@functools.partial(
    jax.jit, static_argnames=("mesh", "logical_rows", "halo",
                              "npixels", "nsigma"))
def _count_spatial_auto(band_plane, *, mesh, logical_rows, halo,
                        npixels, nsigma):
    """(max per-band candidate count, derived threshold) — stage A of
    the two-stage band-local finder (same rationale as the replicated
    ``_count_candidates_auto``: the per-band static candidate batch is
    sized from the ACTUAL count instead of ``max_sources``)."""
    from .device import _candidate_mask

    _, med, std = sigma_clipped_stats_spatial(mesh, band_plane,
                                              int(logical_rows))
    thr = (med + jnp.float32(nsigma) * std).astype(jnp.float32)
    rax = _rows_axis(mesh)
    Nr = mesh.shape[rax]
    Hl = band_plane.shape[0] // Nr
    Ho = int(logical_rows)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P(rax, None), P()),
        out_specs=P(), check_vma=False)
    def count(band, t):
        from ..parallel.spatial import halo_exchange

        row0 = jax.lax.axis_index(rax) * Hl
        rows_abs = row0 + jax.lax.iota(jnp.int32, Hl)
        band = jnp.where((rows_abs < Ho)[:, None], band, jnp.nan)
        ext = halo_exchange(band, halo, rax, edge="zero")
        pk = _candidate_mask(ext, t, npixels)
        return jax.lax.pmax(jnp.sum(pk.astype(jnp.int32)), rax)

    return count(band_plane, thr), thr


@functools.partial(
    jax.jit, static_argnames=("mesh", "logical_rows", "halo", "B",
                              "win", "npixels", "deblend_nthresh",
                              "deblend_cont"))
def _detect_core(band_plane, thr, *, mesh, logical_rows, halo, B, win,
                 npixels, deblend_nthresh, deblend_cont):
    """Band-local detection at an explicit threshold: one program."""
    from .device import _find_sources_peaks_core

    rax = _rows_axis(mesh)
    Nr = mesh.shape[rax]
    Hl = band_plane.shape[0] // Nr
    W = band_plane.shape[1]
    Ho = int(logical_rows)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P(rax, None), P()),
        out_specs=(P(rax, None), P(rax, None, None)),
        # the finder's flood-fill while_loops carry unvarying bool
        # scalars that become axis-varying inside shard_map — the vma
        # checker rejects that; the program is band-local by
        # construction (no cross-band collectives inside)
        check_vma=False)
    def detect(band, t):
        from ..parallel.spatial import halo_exchange

        row0 = jax.lax.axis_index(rax) * Hl
        rows_abs = row0 + jax.lax.iota(jnp.int32, Hl)
        # beyond-mosaic padding rows must not detect: mask to -inf-ish
        band = jnp.where((rows_abs < Ho)[:, None], band, jnp.nan)
        ext = halo_exchange(band, halo, rax, edge="zero")
        ero0 = row0 - halo                      # ext row 0 in absolute
        seg_rank, packed, _ = _find_sources_peaks_core(
            ext, t, max_sources=B, npixels=npixels, window=win,
            deblend_nthresh=deblend_nthresh, deblend_cont=deblend_cont)
        # ownership: the peak pixel must lie in THIS band's own rows.
        # NON-owned candidates stay in the table (keep flag intact):
        # the host merge re-identifies them by exact peak coordinates
        # so a straddling source's spill pixels in the NEIGHBOR band
        # remap to the same global id instead of dropping to 0.
        py_abs = packed[11] + ero0
        own = ((py_abs >= row0) & (py_abs < jnp.minimum(row0 + Hl, Ho))
               & (packed[0] > 0))
        # absolute-row coordinates for the host merge
        packed = packed.at[4].add(jnp.float32(ero0))   # cy
        packed = packed.at[8].add(jnp.float32(ero0))   # ymin
        packed = packed.at[9].add(jnp.float32(ero0))   # ymax
        packed = packed.at[11].add(jnp.float32(ero0))  # peak_y
        packed = jnp.concatenate(
            [packed, own.astype(jnp.float32)[None]], axis=0)  # row 14
        # seg: own rows, band-LOCAL ranks (remapped after the merge)
        seg_own = jax.lax.dynamic_slice(seg_rank, (halo, 0), (Hl, W))
        return seg_own, packed[None]

    return detect(band_plane, thr)


@functools.partial(
    jax.jit, static_argnames=("mesh", "logical_rows", "nsigma", "halo",
                              "B", "win", "npixels", "deblend_nthresh",
                              "deblend_cont"))
def _find_spatial_core(band_plane, *, mesh, logical_rows, nsigma, halo,
                       B, win, npixels, deblend_nthresh, deblend_cont):
    """Sigma-clip threshold + band-local detection as ONE program
    (same dispatch-diet rationale as the replicated finder's
    ``_find_sources_peaks_fused``: no stats dispatch, no eager
    threshold math, no scalar fetch — fresh-process latency)."""
    _, med, std = sigma_clipped_stats_spatial(mesh, band_plane,
                                              int(logical_rows))
    thr = (med + jnp.float32(nsigma) * std).astype(jnp.float32)
    seg_local, packed_all = _detect_core(
        band_plane, thr, mesh=mesh, logical_rows=logical_rows,
        halo=halo, B=B, win=win, npixels=npixels,
        deblend_nthresh=deblend_nthresh, deblend_cont=deblend_cont)
    return seg_local, packed_all, thr


@functools.partial(jax.jit, static_argnames=("mesh",))
def _remap_spatial(seg, lut, *, mesh):
    rax = _rows_axis(mesh)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(rax, None), P(rax, None)), out_specs=P(rax, None))
    def remap(seg, lut):
        return lut[0][seg]

    return remap(seg, lut)


def find_sources_spatial(mesh: Mesh, band_plane, logical_rows: int,
                         threshold: float | None = None,
                         nsigma: float = 3.0, npixels: int = 5,
                         max_sources: int = 8192, window: int = 32,
                         deblend_nthresh: int = 32,
                         deblend_cont: float = 0.005):
    """Band-local :func:`~subpixal_tpu.catalogs.device.
    find_sources_device` on a row-sharded mosaic (module docstring).

    ``band_plane``: ``(ceil(H/Nr)*Nr, W)`` row-sharded science plane;
    ``logical_rows``: the un-padded H. Returns ``(Table, seg)`` with
    ``seg`` a row-sharded int32 id plane (0 = background). The
    detection programs are served from the serialized-executable cache
    (:mod:`..aot`) so warm processes skip their compile RPCs.
    """
    from ..aot import get_executable
    from .device import _peaks_dims

    rax = _rows_axis(mesh)
    Nr = mesh.shape[rax]
    Hp, W = band_plane.shape
    Hl = Hp // Nr
    Ho = int(logical_rows)
    halo = max(2, min(int(window), max(Hl - 1, 1)))
    B, win = _peaks_dims((Hl + 2 * halo, W), max_sources, window)
    core_statics = dict(mesh=mesh, logical_rows=Ho, halo=halo, B=B,
                        win=win, npixels=npixels,
                        deblend_nthresh=int(deblend_nthresh),
                        deblend_cont=float(deblend_cont))

    if threshold is None and B > 256:
        # two-stage candidate sizing (round 5 — see the replicated
        # finder): a cheap counting program fetches the max per-band
        # candidate count + the derived threshold; detection then runs
        # with its static batch bucketed to the actual count
        stA = dict(mesh=mesh, logical_rows=Ho, halo=halo,
                   npixels=int(npixels), nsigma=float(nsigma))
        cexe = get_executable("spatial_count", _count_spatial_auto,
                              (band_plane,), statics=stA)
        cnt, thr_d = (cexe(band_plane) if cexe is not None
                      else _count_spatial_auto(band_plane, **stA))
        n_est, thr_v = jax.device_get((cnt, thr_d))
        threshold = float(thr_v)
        b_eff = 128
        while b_eff < int(n_est) + 8:
            b_eff *= 2
        if b_eff < B:
            max_sources = b_eff
            B, win = _peaks_dims((Hl + 2 * halo, W), max_sources,
                                 window)
            core_statics = dict(core_statics, B=B, win=win)
    if threshold is None:
        statics = dict(nsigma=float(nsigma), **core_statics)
        exe = get_executable("spatial_find", _find_spatial_core,
                             (band_plane,), statics=statics)
        if exe is not None:
            seg_local, packed_all, _thr = exe(band_plane)
        else:
            seg_local, packed_all, _thr = _find_spatial_core(
                band_plane, **statics)
    else:
        thr = jnp.asarray(threshold, jnp.float32)
        exe = get_executable("spatial_detect", _detect_core,
                             (band_plane, thr), statics=core_statics)
        if exe is not None:
            seg_local, packed_all = exe(band_plane, thr)
        else:
            seg_local, packed_all = _detect_core(band_plane, thr,
                                                 **core_statics)
    from ..utils import fetch_to_host

    arr = np.asarray(fetch_to_host(packed_all))     # (Nr, 15, B) — KB
    keep = arr[:, 0, :] > 0
    owned = keep & (arr[:, 14, :] > 0)
    # window escalation (VERDICT r4 task 5, band-local variant): an
    # owned source whose bbox touched its measurement window (device
    # flag, row 13) was truncated — re-run with the window doubled
    # while that actually enlarges the effective in-band window
    if (keep & owned & (arr[:, 13, :] > 0)).any():
        cap = min(256, W, Ho)
        win2 = min(2 * window, cap)
        halo2 = max(2, min(int(win2), max(Hl - 1, 1)))
        _, win2_eff = _peaks_dims((Hl + 2 * halo2, W), max_sources,
                                  win2)
        if win2_eff > win:
            # cap the escalated static batch at the known per-band
            # candidate count (same threshold -> same candidates; see
            # find_sources_device's escalation)
            n_cand = int(arr[:, 10, 0].max())
            b2 = min(max_sources,
                     max(64, -(-(n_cand + 8) // 64) * 64))
            return find_sources_spatial(
                mesh, band_plane, logical_rows, threshold=threshold,
                nsigma=nsigma, npixels=npixels,
                max_sources=b2, window=win2,
                deblend_nthresh=deblend_nthresh,
                deblend_cont=deblend_cont)
    order = []
    for bnd in range(arr.shape[0]):
        for i in np.nonzero(owned[bnd])[0]:
            order.append((float(-arr[bnd, 5, i]), bnd, int(i)))
    order.sort()
    if len(order) > max_sources:
        order = order[:max_sources]
    ids = np.arange(1, len(order) + 1, dtype=np.int32)
    cols = {k: np.array([arr[b, r, i] for _, b, i in order])
            for k, r in (("x", 3), ("y", 4), ("flux", 2), ("area", 1),
                         ("peak", 5), ("xmin", 6), ("xmax", 7),
                         ("ymin", 8), ("ymax", 9))}
    cat = Table({
        "id": ids,
        "x": cols["x"].astype(np.float64),
        "y": cols["y"].astype(np.float64),
        "flux": cols["flux"].astype(np.float64),
        "area": cols["area"].astype(np.int64),
        "peak": cols["peak"],
        "xmin": cols["xmin"].astype(np.int64),
        "xmax": cols["xmax"].astype(np.int64),
        "ymin": cols["ymin"].astype(np.int64),
        "ymax": cols["ymax"].astype(np.int64),
    })
    # per-band rank -> global id lut, applied band-locally on device.
    # Owned candidates map directly; a neighbor band's VALID view of
    # the same source (peak in its halo) maps via exact peak coords.
    luts = np.zeros((arr.shape[0], B + 1), np.int32)
    by_peak = {}
    for gid, (_, bnd, i) in zip(ids, order):
        luts[bnd, i + 1] = gid
        by_peak[(int(arr[bnd, 11, i]), int(arr[bnd, 12, i]))] = gid
    for bnd in range(arr.shape[0]):
        for i in np.nonzero(keep[bnd] & ~owned[bnd])[0]:
            gid = by_peak.get((int(arr[bnd, 11, i]),
                               int(arr[bnd, 12, i])), 0)
            luts[bnd, i + 1] = gid

    luts_j = jax.device_put(
        jnp.asarray(luts), NamedSharding(mesh, P(rax, None)))
    exe = get_executable("spatial_remap", _remap_spatial,
                         (seg_local, luts_j),
                         statics=dict(mesh=mesh))
    if exe is not None:
        seg_ids = exe(seg_local, luts_j)
    else:
        seg_ids = _remap_spatial(seg_local, luts_j, mesh=mesh)
    return cat, seg_ids


class SpatialSourceCatalog:
    """Catalog facade over :func:`find_sources_spatial` — the spatial
    analogue of :class:`~subpixal_tpu.catalogs.device.
    DeviceSourceCatalog` (same duck-typed surface the align setup
    consumes: ``catalog``, ``segmentation_device``, ``segmentation``).
    """

    def __init__(self, mesh, band_plane, logical_rows: int,
                 nsigma: float = 3.0, npixels: int = 5,
                 max_sources: int = 8192, window: int = 32):
        self._mesh = mesh
        self._logical_rows = int(logical_rows)
        self._cat, self._seg = find_sources_spatial(
            mesh, band_plane, logical_rows, nsigma=nsigma,
            npixels=npixels, max_sources=max_sources, window=window)
        self._seg_host = None

    @property
    def catalog(self) -> Table:
        return self._cat

    def execute(self):  # pragma: no cover - already computed
        return self._cat

    @property
    def segmentation_device(self):
        """Row-sharded (padded-H, W) int32 id plane."""
        return self._seg

    @property
    def segmentation(self):
        if self._seg_host is None:
            from ..parallel.spatial import gather_rows

            self._seg_host = gather_rows(self._seg, self._logical_rows)
        return self._seg_host

    def __len__(self) -> int:
        return len(self._cat)
