"""Resample: combine exposures into a reference image (TPU drizzle).

Capability parity with the reference's ``subpixal/resample.py`` (SURVEY.md
§2 #7, §3.2): an abstract ``Resample`` interface plus a concrete
``Drizzle`` implementation, including the **fast add/drop** path the align
loop relies on (re-drizzling after one image's WCS update without redoing
the whole stack).

TPU-first redesign: where the reference shells out to
``drizzlepac.astrodrizzle`` (C ``cdriz.tdriz``) and communicates through
FITS files on disk, this implementation keeps every plane device-resident:
per-exposure pixmaps are composed from WCSs on host (float64) once per
update, deposits run as vectorized area-overlap scatter-adds on TPU
(:mod:`subpixal_tpu.ops.drizzle`), and per-exposure accumulators are
cached so ``add_image``/``drop_image`` are O(1 exposure), not O(stack).
"""

from __future__ import annotations

import functools
import time
import warnings
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.drizzle import drizzle_combine, drizzle_deposit
from ..wcs.wcs import TanWCS


@functools.partial(
    jax.jit,
    static_argnames=("shape", "sip_mode", "sip2_mode", "oshape",
                     "pixfrac", "kernel", "tile", "ratios",
                     "interpret"))
def _deposit_stack_core(params, data, wht, scales, *, shape, sip_mode,
                        sip2_mode, oshape, pixfrac, kernel, tile,
                        ratios, interpret=False):
    """ONE device program: stack pixmaps (vmap'd WCS composition) + all
    Pallas deposits + the stack sums. Per-frame dispatches cost ~65 ms
    each on tunneled TPU runtimes, so a warm 8-frame execute() pays ~1 s
    in dispatch alone when issued frame-by-frame."""
    from ..blot import _pixmap_stack_core
    from ..kernels.drizzle import drizzle_deposit_pallas

    px, py = _pixmap_stack_core(params, shape=shape, sip_mode=sip_mode,
                                sip2_mode=sip2_mode)
    ss, ws = [], []
    for e in range(data.shape[0]):  # static unroll
        s, w = drizzle_deposit_pallas(
            data[e], None if wht is None else wht[e], px[e], py[e],
            oshape, pixfrac=pixfrac,
            pscale_ratio=ratios[e], kernel=kernel, tile=tile,
            interpret=interpret)
        ss.append(s * scales[e])
        ws.append(w * scales[e])
    sci_s = jnp.stack(ss)
    wht_s = jnp.stack(ws)
    return sci_s, wht_s, jnp.sum(sci_s, axis=0), jnp.sum(wht_s, axis=0)

__all__ = ["Resample", "Drizzle", "Exposure", "make_output_wcs",
           "make_static_mask", "exposure_rate_data",
           "exposure_pixel_weight"]


def _exposure_stack_key(exposures):
    """Identity key for a cached device rate-data stack: any rebinding
    of an exposure's ``.data`` (e.g. ``match_sky``) or a different
    exposure list produces a different key."""
    return tuple((id(e), id(e.data), float(e.exptime), str(e.data_units))
                 for e in exposures)


def make_static_mask(exposures: "Sequence[Exposure]",
                     nsigma: float = 4.0) -> np.ndarray:
    """Static bad-pixel mask in the DETECTOR frame (True = bad).

    The AstroDrizzle "static mask" stage: pixels that sit consistently
    low relative to each exposure's own sky statistics across the whole
    stack are detector defects (dead/hot-subtracted pixels), flagged
    once and excluded from every deposit. A defect is low in EVERY
    exposure, so the pixel-wise MAXIMUM of the sky-subtracted normalized
    stack must still sit below -nsigma; a transient low pixel (noise,
    one bad readout) has a normal value in some exposure and escapes.
    """
    from ..catalogs import sigma_clipped_stats

    if any(isinstance(e.data, jax.Array) for e in exposures):
        # device-resident stack: normalize + max-combine on device;
        # only the boolean mask (1 byte/px) crosses to host
        from ..catalogs.device import sigma_clipped_stats_device

        hi = None
        for exp in exposures:
            d = jnp.asarray(exp.data)
            _, med, std = sigma_clipped_stats_device(d)
            z = (d - med) / jnp.maximum(std, 1e-12)
            hi = z if hi is None else jnp.maximum(hi, z)
        return np.asarray(hi < -float(nsigma))
    stack = []
    for exp in exposures:
        _, med, std = sigma_clipped_stats(exp.data)
        stack.append((exp.data - med) / max(std, 1e-12))
    hi = np.max(np.stack(stack), axis=0)
    return hi < -float(nsigma)


@jax.jit
def _reject_cr_one_device(blot, ok, rate, weight, snr, scale):
    """One exposure's driz_cr flagging entirely on device.

    Same math as the host branch of :meth:`Drizzle.reject_cr`: local
    4-neighbor gradient of the blotted model, MAD-robust residual sigma
    over usable pixels, ``|resid| > snr*sig + scale*deriv`` flags.
    Returns (cr_mask bool, new_weight f32).
    """
    p = jnp.pad(blot, 1, mode="edge")
    deriv = jnp.maximum(
        jnp.maximum(jnp.abs(blot - p[:-2, 1:-1]),
                    jnp.abs(blot - p[2:, 1:-1])),
        jnp.maximum(jnp.abs(blot - p[1:-1, :-2]),
                    jnp.abs(blot - p[1:-1, 2:])))
    resid = rate - blot
    sel = ok & jnp.isfinite(resid)
    if weight is not None:
        sel = sel & (jnp.asarray(weight) > 0)
    rs = jnp.where(sel, resid, jnp.nan)
    sig_std = jnp.nan_to_num(
        jnp.sqrt(jnp.nanmean((rs - jnp.nanmean(rs)) ** 2)))
    med_r = jnp.nanmedian(rs)
    mad = jnp.nanmedian(jnp.abs(rs - med_r)) * 1.4826
    sig = jnp.where(mad > 0, mad, sig_std)
    sig = jnp.where(jnp.any(sel), sig, 0.0)
    cr = ok & (jnp.abs(resid) > snr * sig + scale * deriv)
    wht = (jnp.ones_like(blot) if weight is None
           else jnp.asarray(weight, jnp.float32))
    return cr, jnp.where(cr, 0.0, wht)


def _as_exposure_plane(a):
    """float32 plane, preserving device residency (no fetch)."""
    if isinstance(a, jax.Array):
        return a if a.dtype == jnp.float32 else a.astype(jnp.float32)
    return np.asarray(a, np.float32)


class Exposure:
    """One input exposure: science data + weight + WCS (+ metadata).

    ``data_units`` follows the reference's ``Cutout.data_units`` semantics
    (SURVEY §2 #3): ``'rate'`` (counts/s, HST *_flc-style) or ``'counts'``
    (raw counts, *_flt-style); counts data is converted to rate with
    ``exptime`` before combination. ``err`` / ``ivm`` are optional
    per-pixel error / inverse-variance maps in the SAME units as ``data``,
    consumed by ``Drizzle(wht_type='error'|'ivm')`` (the AstroDrizzle
    ``final_wht_type`` ERR/IVM modes).

    DEVICE-RESIDENT data: ``data`` (and ``weight``/``err``/``ivm``) may
    be a ``jax.Array`` already living on an accelerator — it is kept
    as-is, never fetched to host. The drizzle/align device paths then
    consume it with ZERO host<->device transfers, which is how stages
    compose in an on-device pipeline (and the only fast path on
    tunneled dev runtimes, where a 4x4k^2 stack crossing the link costs
    40-400 s at the measured 2-6 MB/s). Host-only stages (``match_sky``,
    host cutouts, FITS write-back) transparently fetch when asked.
    """

    def __init__(self, data, wcs: TanWCS, weight=None, exptime: float = 1.0,
                 name: str = "", data_units: str = "rate", err=None,
                 ivm=None):
        if data_units not in ("rate", "counts"):
            raise ValueError(f"data_units must be 'rate' or 'counts', "
                             f"got {data_units!r}")
        self.data = _as_exposure_plane(data)
        self.wcs = wcs
        self.weight = (None if weight is None
                       else _as_exposure_plane(weight))
        self.exptime = float(exptime)
        self.data_units = data_units
        self.err = None if err is None else _as_exposure_plane(err)
        self.ivm = None if ivm is None else _as_exposure_plane(ivm)
        self.name = name or f"exposure@{id(self):x}"

    def copy(self) -> "Exposure":
        cp = lambda a: (a if isinstance(a, jax.Array)  # noqa: E731
                        else a.copy())                 # jax: immutable
        return Exposure(
            cp(self.data), self.wcs.copy(),
            weight=None if self.weight is None else cp(self.weight),
            exptime=self.exptime, name=self.name,
            data_units=self.data_units,
            err=None if self.err is None else cp(self.err),
            ivm=None if self.ivm is None else cp(self.ivm),
        )

    def __repr__(self):
        return f"Exposure({self.name!r}, shape={self.data.shape})"


def exposure_rate_data(exp: "Exposure") -> np.ndarray:
    """Exposure science data converted to rate units (counts/s).

    The counts↔rate handling the reference reaches through
    ``Cutout.data_units`` / AstroDrizzle input units: 'counts' data is
    divided by ``exptime`` so every exposure combines in common units.
    """
    if exp.data_units == "counts":
        return exp.data / np.float32(max(exp.exptime, 1e-30))
    return exp.data


def exposure_pixel_weight(exp: "Exposure",
                          wht_type: str = "exptime") -> tuple:
    """(base, mask): statistical deposit weight for one exposure.

    ``base`` is the per-pixel (or scalar, when uniform) inverse-variance
    weight of the exposure's RATE image; ``mask`` is the user/bad-pixel
    weight (``exp.weight``, may be None). Parity with AstroDrizzle's
    ``final_wht_type`` (SURVEY §3.2):

    - ``'exptime'`` (EXP, default): w = exptime — optimal for
      Poisson-dominated data (var(rate) ∝ rate / t).
    - ``'ivm'``: w = exp.ivm, the inverse variance of ``data`` in its own
      units (converted to rate-units variance when data is in counts).
    - ``'error'`` (ERR): w = 1 / err², from the per-pixel error array.
    - ``'uniform'``: w = 1 (round-1 behavior).
    """
    t = max(float(exp.exptime), 1e-30)
    if wht_type in ("exptime", "exp"):
        base = t
    elif wht_type == "uniform":
        base = 1.0
    elif wht_type == "ivm":
        if exp.ivm is None:
            raise ValueError(f"wht_type='ivm' but exposure {exp.name!r} "
                             "has no ivm array")
        ivm = np.asarray(exp.ivm, np.float32)
        # var(rate) = var(counts) / t^2  ->  ivm_rate = ivm_counts * t^2
        base = ivm * np.float32(t * t) if exp.data_units == "counts" else ivm
    elif wht_type in ("error", "err"):
        if exp.err is None:
            raise ValueError(f"wht_type='error' but exposure {exp.name!r} "
                             "has no err array")
        err = np.asarray(exp.err, np.float64)
        if exp.data_units == "counts":
            err = err / t
        with np.errstate(divide="ignore", invalid="ignore"):
            base = np.where(err > 0, 1.0 / (err * err), 0.0
                            ).astype(np.float32)
    else:
        raise ValueError(f"unknown wht_type: {wht_type!r} (expected "
                         "'exptime' | 'ivm' | 'error' | 'uniform')")
    return base, exp.weight


def make_output_wcs(wcs_list: Sequence[TanWCS],
                    shapes: Sequence[tuple[int, int]],
                    pscale: float | None = None,
                    pscale_ratio: float = 1.0) -> tuple[TanWCS, tuple[int, int]]:
    """Construct an undistorted TAN output grid covering all inputs.

    The role of AstroDrizzle's output-WCS setup: north-up TAN frame at the
    mean sky position, pixel scale = ``pscale`` arcsec (default: mean input
    scale × ``pscale_ratio``), sized to cover every input footprint.
    Returns (wcs, (H, W)).
    """
    # mean tangent point
    crvals = np.array([w.crval for w in wcs_list])
    ra0 = np.deg2rad(crvals[:, 0])
    dec0 = np.deg2rad(crvals[:, 1])
    x = np.cos(dec0) * np.cos(ra0)
    y = np.cos(dec0) * np.sin(ra0)
    z = np.sin(dec0)
    cen = np.array([x.mean(), y.mean(), z.mean()])
    cen /= np.linalg.norm(cen)
    crval = np.array([np.rad2deg(np.arctan2(cen[1], cen[0])) % 360.0,
                      np.rad2deg(np.arcsin(cen[2]))])
    if pscale is None:
        pscale = float(np.mean([w.pscale for w in wcs_list])) * pscale_ratio
    s = pscale / 3600.0
    cd = np.array([[-s, 0.0], [0.0, s]])  # north-up, RA increasing left
    out = TanWCS(crpix=np.zeros(2), crval=crval, cd=cd)

    # project all input corners; pad by 1 pixel
    xs, ys = [], []
    for w, (H, W) in zip(wcs_list, shapes):
        cx = np.array([0.0, W - 1.0, 0.0, W - 1.0])
        cy = np.array([0.0, 0.0, H - 1.0, H - 1.0])
        ra, dec = w.pixel_to_world(cx, cy)
        px, py = out.world_to_pixel(ra, dec)
        xs.append(px)
        ys.append(py)
    xs = np.concatenate(xs)
    ys = np.concatenate(ys)
    x0, x1 = np.floor(xs.min()) - 1, np.ceil(xs.max()) + 1
    y0, y1 = np.floor(ys.min()) - 1, np.ceil(ys.max()) + 1
    Wo = int(x1 - x0 + 1)
    Ho = int(y1 - y0 + 1)
    out = out.replace(crpix=np.array([-x0, -y0]))
    return out, (Ho, Wo)


class Resample:
    """ABC: combine input exposures into one reference image.

    Parity with the reference ``Resample`` interface (SURVEY §2 #7):
    ``execute()`` (re)builds the combined product; ``output_sci`` /
    ``output_wht`` / ``output_wcs`` expose it; ``fast_add_image`` /
    ``fast_drop_image`` update it incrementally.
    """

    def execute(self) -> None:
        raise NotImplementedError

    @property
    def output_sci(self) -> np.ndarray:
        raise NotImplementedError

    @property
    def output_wht(self) -> np.ndarray:
        raise NotImplementedError

    @property
    def output_wcs(self) -> TanWCS:
        raise NotImplementedError


class Drizzle(Resample):
    """TPU-resident drizzle combiner with cached per-exposure deposits.

    Parameters mirror the knobs the reference forwards to AstroDrizzle:
    ``pixfrac``, ``kernel``, ``fillval``, output pixel scale (via
    ``pscale`` / ``pscale_ratio``), and the final weighting mode
    ``wht_type`` ('exptime' | 'ivm' | 'error' | 'uniform' — AstroDrizzle
    ``final_wht_type`` EXP/IVM/ERR). Exposures in 'counts' units are
    converted to rate with their exptimes; ``output_sci`` is always in
    rate units (cps), the AstroDrizzle default.
    """

    #: AstroDrizzle config keys accepted via ``Drizzle(config=...)`` and
    #: the constructor kwarg each maps to (reference ``Drizzle(config=…)``
    #: forwards a config dict to AstroDrizzle, SURVEY §3.2 / §5 "Config").
    CONFIG_KEYS = {
        "final_pixfrac": "pixfrac",
        "final_kernel": "kernel",
        "final_fillval": "fillval",
        "final_scale": "pscale",
        "final_wht_type": "wht_type",
    }

    def __init__(self, exposures: Sequence[Exposure] | None = None,
                 output_wcs: TanWCS | None = None,
                 output_shape: tuple[int, int] | None = None,
                 pixfrac: float = 1.0, kernel: str = "square",
                 fillval: float = 0.0, pscale: float | None = None,
                 pscale_ratio: float = 1.0,
                 use_pallas: bool | str = "auto",
                 wht_type: str = "exptime",
                 config: dict | None = None,
                 spatial_mesh=None):
        if config:
            kw = {}
            for key, val in config.items():
                name = self.CONFIG_KEYS.get(key, key)
                if name == "wht_type" and isinstance(val, str):
                    val = {"EXP": "exptime", "IVM": "ivm",
                           "ERR": "error"}.get(val.upper(), val)
                if name == "fillval" and isinstance(val, str):
                    # AstroDrizzle's documented default final_fillval is
                    # the string 'INDEF' (undefined); map it to 0.0 (our
                    # no-coverage fill) instead of crashing float()
                    val = 0.0 if val.strip().upper() == "INDEF" \
                        else float(val)
                kw[name] = val
            known = {"pixfrac", "kernel", "fillval", "pscale",
                     "pscale_ratio", "wht_type", "use_pallas"}
            bad = set(kw) - known
            # a real AstroDrizzle config dict carries many stage knobs
            # beyond the combine parameters this class consumes
            # ('skymethod', 'driz_cr', 'driz_sep_*', 'combine_*', ...);
            # reference parity means ACCEPTING such dicts — recognized
            # AstroDrizzle names are ignored with a warning, and the
            # hard error is reserved for names AstroDrizzle would also
            # reject (likely typos).
            astrodrizzle_prefixes = (
                "driz_sep_", "driz_cr", "combine_", "sky",
                "static", "median", "blot", "crbit", "in_memory",
                "build", "context", "clean", "preserve", "restore",
                "resetbits", "num_cores", "runfile", "input", "output",
                "updatewcs", "wcskey", "proc_unit", "coeffs", "group",
                "mdriztab", "stepsize")
            # final_* keys are enumerated (not prefix-matched) so a typo
            # of a SUPPORTED final_ key still fails loudly
            astrodrizzle_final = {
                "final_wcs", "final_rot", "final_units", "final_bits",
                "final_wt_scl", "final_refimage", "final_outnx",
                "final_outny", "final_ra", "final_dec", "final_crpix1",
                "final_crpix2"}
            recognized = {
                k for k in bad
                if str(k).lower().startswith(astrodrizzle_prefixes)
                or str(k).lower() in astrodrizzle_final}
            if recognized:
                warnings.warn(
                    "ignoring AstroDrizzle config key(s) with no "
                    f"equivalent here: {sorted(recognized)} (the sky/"
                    "static-mask/CR stages are explicit methods: "
                    "match_sky(), apply_static_mask(), reject_cr())",
                    stacklevel=2)
                for k in recognized:
                    kw.pop(k)
                bad -= recognized
            if bad:
                raise ValueError(
                    f"unknown Drizzle config key(s): {sorted(bad)} "
                    f"(accepted: {sorted(known | set(self.CONFIG_KEYS))})")
            loc = locals()
            defaults = {k: loc[k] for k in known}
            defaults.update(kw)
            pixfrac = defaults["pixfrac"]
            kernel = defaults["kernel"]
            fillval = defaults["fillval"]
            pscale = defaults["pscale"]
            pscale_ratio = defaults["pscale_ratio"]
            wht_type = defaults["wht_type"]
            use_pallas = defaults["use_pallas"]
        self.exposures: list[Exposure] = list(exposures or [])
        names = [e.name for e in self.exposures]
        if len(set(names)) != len(names):
            dup = sorted({n for n in names if names.count(n) > 1})
            raise ValueError(
                f"duplicate exposure name(s) {dup}: the per-exposure "
                "deposit cache and fast add/drop/replace paths are keyed "
                "by name — give each exposure a unique name")
        self.pixfrac = float(pixfrac)
        self.kernel = kernel
        self.fillval = float(fillval)
        self.pscale = pscale
        self.pscale_ratio = float(pscale_ratio)
        self.use_pallas = use_pallas
        self.wht_type = wht_type
        #: 1-D jax.sharding.Mesh: row-band-shard the output sci/wht
        #: accumulators over the mesh (parallel/spatial.py) — mosaics
        #: larger than one chip's HBM. Deposits run the XLA kernel
        #: inside shard_map (band-exact); the per-exposure cache, fast
        #: add/drop/replace, reject_cr (sharded median + sample_spatial
        #: blot-back) and the full align loop all stay sharded
        #: end-to-end. The stacked one-program execute is skipped; blot
        #: from the sharded product via ``parallel.sample_spatial``.
        self.spatial_mesh = spatial_mesh
        self._owcs = output_wcs
        self._oshape = output_shape
        self._sci_acc = None  # device arrays
        self._wht_acc = None
        self._per_exp: dict[str, tuple] = {}  # name -> (sci_dep, wht_dep)
        self._combine_warm = False
        self._data_stack = None   # device rate-data stack (stacked path)
        self._data_stack_key = None

    def _warm_combine(self):
        """Compile the XLA combine BEFORE any Pallas deposit runs.

        On tunneled TPU runtimes the first pure-XLA compile issued after
        a Mosaic (Pallas) compile can stall for minutes (see
        .claude/skills/verify/SKILL.md); compiling the tiny combine
        up-front (~1s) sidesteps that for ``output_sci``.
        """
        if self._combine_warm or self._oshape is None:
            return
        z = jnp.zeros(self._oshape, jnp.float32)
        jax.block_until_ready(drizzle_combine(z, z))
        self._combine_warm = True

    def _zero_accumulators(self):
        """Fresh (sci, wht) zeros — row-band-sharded under a spatial
        mesh (rows padded to the mesh size), plain device arrays else."""
        Ho, Wo = self._oshape
        if self.spatial_mesh is not None:
            from ..parallel.spatial import shard_rows

            z = shard_rows(self.spatial_mesh, jnp.zeros((Ho, Wo),
                                                        jnp.float32))
            return z, z
        z = jnp.zeros((Ho, Wo), jnp.float32)
        return z, z

    # -- setup ----------------------------------------------------------- #
    def _ensure_output_grid(self):
        if self._owcs is None or self._oshape is None:
            if not self.exposures:
                raise ValueError("no exposures and no explicit output grid")
            owcs, oshape = make_output_wcs(
                [e.wcs for e in self.exposures],
                [e.data.shape for e in self.exposures],
                pscale=self.pscale, pscale_ratio=self.pscale_ratio,
            )
            self._owcs = self._owcs or owcs
            self._oshape = self._oshape or oshape

    def _shared_tile(self):
        """One static Pallas tile covering every exposure's deposit.

        Sized on host from the WCSs' Jacobian bound
        (:func:`~subpixal_tpu.kernels.drizzle.required_tile_wcs`;
        same-shape exposures only). A shared tile means ONE Pallas
        compile and no per-exposure host ``required_tile`` block walk —
        the walks dominated warm ``execute()`` time at stack scale.
        """
        from ..kernels.drizzle import required_tile_wcs
        from ..ops.drizzle import kernel_reach

        reach = 0.0
        for exp in self.exposures:
            ratio = exp.wcs.pscale / self._owcs.pscale
            reach = max(reach, kernel_reach(self.kernel, self.pixfrac,
                                            ratio))
        # same padding/margin convention as the align loop's tile sizing
        # (align.py driz_tile): identical scenes then quantize to the
        # IDENTICAL static tile -> the setup drizzle and the in-loop
        # deposits share one Mosaic compile. Sized from the WCSs on
        # host (required_tile_wcs) — needs NO pixmaps, so execute() can
        # build each frame's pixmap right before its deposit and free
        # it, bounding peak HBM to one pixmap (ADVICE r2 #2), and no
        # device->host fetch can stall the tunneled runtime.
        return required_tile_wcs(
            [e.wcs for e in self.exposures], self._owcs,
            self.exposures[0].data.shape, reach=reach + 0.1, margin=4)

    @staticmethod
    def _frame_pixmap(wcs, owcs, shape):
        """Drizzle pixmap: f64 host for small frames, f32 device at
        mosaic scale (host trig costs ~13 s per 4k^2 frame; the deposit
        only needs mpix-class grids — see compute_pixmap_device)."""
        from ..blot import (compute_pixmap, compute_pixmap_device,
                            device_pixmap_min_pixels)

        if shape[0] * shape[1] >= device_pixmap_min_pixels():
            return compute_pixmap_device(wcs, owcs, shape)
        return compute_pixmap(wcs, owcs, shape)

    def _deposit(self, exp: Exposure, tile=None, pixmap=None):
        from ..kernels import use_pallas as _use_pallas

        H, W = exp.data.shape
        px, py = (pixmap if pixmap is not None
                  else self._frame_pixmap(exp.wcs, self._owcs, (H, W)))
        ratio = exp.wcs.pscale / self._owcs.pscale
        data = exposure_rate_data(exp)
        base, mask = exposure_pixel_weight(exp, self.wht_type)
        # scalar base weights scale the (linear) deposit afterwards, so
        # the mask-only / no-weight fast paths stay array-free
        scale = 1.0
        if np.isscalar(base) or np.ndim(base) == 0:
            scale, wht = float(base), mask
        else:
            wht = base if mask is None else base * mask
        wht_j = None if wht is None else jnp.asarray(wht, jnp.float32)
        if self.spatial_mesh is not None:
            # row-band-sharded output accumulators: the deposit runs
            # inside shard_map, exactly band-restricted (spatial.py) —
            # as the Pallas matmul kernel on TPU backends, XLA elsewhere
            from ..parallel.spatial import drizzle_deposit_spatial

            s, w = drizzle_deposit_spatial(
                self.spatial_mesh, jnp.asarray(data), wht_j,
                jnp.asarray(px, jnp.float32), jnp.asarray(py, jnp.float32),
                self._oshape, pixfrac=self.pixfrac, pscale_ratio=ratio,
                kernel=self.kernel,
                use_pallas=_use_pallas(self.use_pallas))
            if scale != 1.0:
                s = s * jnp.float32(scale)
                w = w * jnp.float32(scale)
            return s, w
        # tophat is not per-axis separable -> always the XLA deposit
        if _use_pallas(self.use_pallas) and self.kernel != "tophat":
            # MXU matmul-deposit kernel; tile sized exactly from the
            # concrete host pixmap (SURVEY §2a/§7)
            from ..kernels.drizzle import (drizzle_deposit_pallas,
                                           required_tile,
                                           required_tile_wcs)
            from ..ops.drizzle import kernel_reach

            reach = kernel_reach(self.kernel, self.pixfrac, ratio)
            if tile is None:
                if hasattr(px, "devices"):
                    # device pixmap: size from the WCS Jacobian bound
                    # instead of fetching the pixmap back (the tiny
                    # post-pixmap fetch stalls the tunneled runtime)
                    tile = required_tile_wcs([exp.wcs], self._owcs,
                                             (H, W), reach=reach)
                else:
                    tile = required_tile(px, py, wht=wht, reach=reach)
            s, w = drizzle_deposit_pallas(
                jnp.asarray(data), wht_j,
                jnp.asarray(px, jnp.float32), jnp.asarray(py, jnp.float32),
                self._oshape, pixfrac=self.pixfrac, pscale_ratio=ratio,
                kernel=self.kernel, tile=tile,
            )
        else:
            s, w = drizzle_deposit(
                jnp.asarray(data), wht_j,
                jnp.asarray(px, jnp.float32), jnp.asarray(py, jnp.float32),
                self._oshape, pixfrac=self.pixfrac, pscale_ratio=ratio,
                kernel=self.kernel,
            )
        if scale != 1.0:
            s = s * jnp.float32(scale)
            w = w * jnp.float32(scale)
        return s, w

    #: the stacked one-program execute path materializes every frame's
    #: pixmap at once in HBM — gate it by total pixmap bytes so mosaic-
    #: scale stacks keep the one-pixmap-at-a-time flow (ADVICE r2 #2)
    _STACK_EXEC_MAX_PIXMAP_BYTES = 1_500_000_000

    def _execute_stack(self, tile, _interpret=False, _mark=None):
        """All pixmaps + deposits as ONE device program (per-frame
        dispatches cost ~65 ms each on tunneled runtimes). Returns
        (sci_stack, wht_stack, sci_sum, wht_sum) or None when the stack
        is not eligible (mixed SIP structure, host-pixmap regime, or a
        pixmap footprint beyond the HBM gate)."""
        from ..blot import _stacked_wcs_params, device_pixmap_min_pixels

        _mark = _mark or (lambda name: None)
        shape = self.exposures[0].data.shape
        E = len(self.exposures)
        if shape[0] * shape[1] < device_pixmap_min_pixels():
            return None
        if E * shape[0] * shape[1] * 8 > self._STACK_EXEC_MAX_PIXMAP_BYTES:
            return None
        stacked, sip_mode, sip2_mode = _stacked_wcs_params(
            [e.wcs for e in self.exposures], self._owcs)
        if stacked is None:
            return None
        _mark("wcs_params")
        planes = [exposure_rate_data(e) for e in self.exposures]
        if any(isinstance(p, jax.Array) for p in planes):
            # device-resident exposures: stack ON device, zero H2D
            data = jnp.stack([jnp.asarray(p) for p in planes])
        else:
            data = np.stack(planes)
        whts, scales = [], []
        for exp in self.exposures:
            base, mask = exposure_pixel_weight(exp, self.wht_type)
            if np.isscalar(base) or np.ndim(base) == 0:
                scales.append(float(base))
                whts.append(mask)
            else:
                scales.append(1.0)
                whts.append(base if mask is None else base * mask)
        if all(w is None for w in whts):
            # unweighted stack: let the deposit kernel synthesize unit
            # weights on device — an all-ones (E, H, W) stack would
            # double the host->device payload (268 MB at 4x4k^2), the
            # dominant cost of a tunneled mosaic-scale execute()
            wht_stack = None
        elif any(isinstance(w, jax.Array) for w in whts):
            # device-resident weights (static mask / CR rejection on
            # device pipelines): stack ON device — an np.asarray here
            # would be an (E, H, W) d2h fetch, the 100-500 s tunnel
            # stall class the data stack above already avoids
            wht_stack = jnp.stack(
                [jnp.ones(shape, jnp.float32) if w is None
                 else jnp.asarray(w, jnp.float32) for w in whts])
        else:
            wht_stack = jnp.asarray(np.stack(
                [np.ones(shape, np.float32) if w is None
                 else np.asarray(w, np.float32) for w in whts]))
        ratios = tuple(round(float(e.wcs.pscale / self._owcs.pscale), 6)
                       for e in self.exposures)
        _mark("rate_wht_host")
        data_j = jnp.asarray(data)
        jax.block_until_ready(data_j)
        _mark("h2d_stack")
        scales_j = jnp.asarray(np.asarray(scales, np.float32))
        statics = dict(
            shape=tuple(shape), sip_mode=sip_mode, sip2_mode=sip2_mode,
            oshape=self._oshape, pixfrac=self.pixfrac,
            kernel=self.kernel, tile=tile, ratios=ratios,
            interpret=_interpret)
        # serialized-executable cache (aot.py): a warm process
        # deserializes the one-program deposit stack instead of paying
        # its compile RPC (fresh-process latency, VERDICT r4 weak #1)
        from ..aot import get_executable

        exe = get_executable(
            "deposit_stack", _deposit_stack_core,
            (stacked, data_j, wht_stack, scales_j), statics=statics)
        out = (exe(stacked, data_j, wht_stack, scales_j)
               if exe is not None else
               _deposit_stack_core(stacked, data_j, wht_stack, scales_j,
                                   **statics))
        _mark("deposit_stack")
        # keep the device-resident rate-data stack for reuse by the
        # align loop's staging (the SAME (E, H, W) stack would otherwise
        # cross the host->device tunnel a second time — 268 MB at
        # 4x4k^2, the dominant mosaic-scale setup cost). Keyed on object
        # identities so any .data reassignment (match_sky) invalidates.
        self._data_stack = data_j
        self._data_stack_key = _exposure_stack_key(self.exposures)
        return out

    # -- public API ------------------------------------------------------ #
    def execute(self) -> None:
        """(Re)drizzle the full stack; caches per-exposure deposits.

        Per-stage wall times land in ``self.last_execute_breakdown``
        (tracing subsystem, SURVEY §5) — the align driver folds them
        into its ``setup_breakdown``.
        """
        bd = self.last_execute_breakdown = {}
        t0 = time.time()

        def _mark(name):
            nonlocal t0
            bd[name] = bd.get(name, 0.0) + (time.time() - t0)
            t0 = time.time()

        self._ensure_output_grid()
        _mark("output_grid")
        if self.spatial_mesh is None:
            self._warm_combine()
            _mark("warm_combine")
        Ho, Wo = self._oshape
        sci, wht = self._zero_accumulators()
        self._per_exp.clear()
        self._data_stack = self._data_stack_key = None  # free stale HBM
        from ..blot import compute_pixmap
        from ..kernels import use_pallas as _use_pallas

        tile = None
        if (self.spatial_mesh is None
                and _use_pallas(self.use_pallas) and self.kernel != "tophat"
                and len(self.exposures) > 1
                and len({e.data.shape for e in self.exposures}) == 1):
            # one shared tile for the whole stack, sized on host from
            # the WCSs (no pixmaps needed) -> one Mosaic compile
            tile = self._shared_tile()
            _mark("shared_tile")
            out = self._execute_stack(tile, _mark=_mark)
            if out is not None:
                sci_s, wht_s, sci, wht = out
                for e, exp in enumerate(self.exposures):
                    self._per_exp[exp.name] = (sci_s[e], wht_s[e])
                self._sci_acc, self._wht_acc = sci, wht
                return
        for exp in self.exposures:
            # each deposit builds (and frees) its own pixmap: peak HBM
            # is bounded by ONE pixmap regardless of stack size
            # (ADVICE r2 #2; a 40-frame 4k^2 stack would otherwise pin
            # ~5 GB of f32 pixmaps). Host pixmaps come from the
            # compute_pixmap memo-cache; device pixmaps re-evaluate in
            # ~2 ms.
            s, w = self._deposit(exp, tile=tile)
            self._per_exp[exp.name] = (s, w)
            sci = sci + s
            wht = wht + w
        self._sci_acc, self._wht_acc = sci, wht

    def fast_add_image(self, exp: Exposure) -> None:
        """Add one exposure's contribution (the reference's fast add path,
        SURVEY §3.2)."""
        self._ensure_output_grid()
        if self.spatial_mesh is None:
            self._warm_combine()
        if self._sci_acc is None:
            self._sci_acc, self._wht_acc = self._zero_accumulators()
        if exp not in self.exposures:
            if any(e.name == exp.name for e in self.exposures):
                raise ValueError(
                    f"an exposure named {exp.name!r} is already in the "
                    "stack (the deposit cache is keyed by name); use "
                    "fast_replace_image or a unique name")
            self.exposures.append(exp)
        s, w = self._deposit(exp)
        self._per_exp[exp.name] = (s, w)
        self._sci_acc = self._sci_acc + s
        self._wht_acc = self._wht_acc + w

    def fast_drop_image(self, name: str) -> None:
        """Remove one exposure's cached contribution (fast drop path)."""
        if name not in self._per_exp:
            raise KeyError(f"no cached deposit for {name!r}")
        s, w = self._per_exp.pop(name)
        self._sci_acc = self._sci_acc - s
        self._wht_acc = self._wht_acc - w
        self.exposures = [e for e in self.exposures if e.name != name]

    def fast_replace_image(self, exp: Exposure) -> None:
        """drop + add in one call: the align loop's per-iteration
        'update this exposure's WCS and refresh the reference' step."""
        if exp.name in self._per_exp:
            s, w = self._per_exp.pop(exp.name)
            self._sci_acc = self._sci_acc - s
            self._wht_acc = self._wht_acc - w
            self.exposures = [e for e in self.exposures if e.name != exp.name]
        self.fast_add_image(exp)

    @property
    def output_sci(self) -> np.ndarray:
        if self._sci_acc is None:
            self.execute()
        from ..utils import fetch_to_host
        out = fetch_to_host(
            drizzle_combine(self._sci_acc, self._wht_acc, fill=self.fillval)
        )
        return out[:self._oshape[0]]  # crop spatial-mesh row padding

    @property
    def output_ctx(self) -> np.ndarray:
        """Context map: bit e set where exposure e contributed weight
        (parity with AstroDrizzle's CTX product).

        Like AstroDrizzle's multi-plane CTX format, stacks with more than
        32 exposures roll into extra 32-bit planes: the result is
        (Ho, Wo) int32 for <= 32 exposures, else (nplanes, Ho, Wo) with
        exposure e in plane e // 32, bit e % 32.
        """
        if self._sci_acc is None:
            self.execute()
        Ho, Wo = self._oshape
        nplanes = max(1, -(-len(self.exposures) // 32))
        ctx = np.zeros((nplanes, Ho, Wo), np.uint32)
        for e, exp in enumerate(self.exposures):
            dep = self._per_exp.get(exp.name)
            if dep is not None:
                plane, bit = divmod(e, 32)
                from ..utils import fetch_to_host

                ctx[plane] |= ((fetch_to_host(dep[1])[:Ho] > 0)
                               .astype(np.uint32) << np.uint32(bit))
        ctx = ctx.view(np.int32)
        return ctx[0] if nplanes == 1 else ctx

    def match_sky(self, subtract: bool = True,
                  skymethod: str = "match") -> np.ndarray:
        """Per-exposure sky estimation / matching (AstroDrizzle's sky
        stage, SURVEY §3.2).

        Estimates each exposure's sky as the sigma-clipped median of its
        pixels (in the exposure's own data units) and, when ``subtract``,
        removes it in place so the combine is background-consistent.

        ``skymethod`` (AstroDrizzle ``skymethod`` semantics):

        - ``'match'`` (default): equalize backgrounds ACROSS exposures —
          subtract ``sky_e - min(sky)``, keeping the common sky level in
          the data (real diffuse background survives into the product).
        - ``'localmin'``: subtract each exposure's absolute sky estimate.

        Returns the per-exposure sky estimates in RATE units (before
        differencing).
        """
        from ..catalogs import sigma_clipped_stats

        if skymethod not in ("match", "localmin"):
            raise ValueError(f"unknown skymethod: {skymethod!r}")
        # estimate and DIFFERENCE skies in commensurable RATE units —
        # 'match' on native counts would compare sky levels scaled by
        # each exposure's exptime (a 1 s and a 100 s exposure of the
        # same sky differ 100x in counts), leaving per-exposure
        # background steps in the combined product. The subtraction is
        # converted back to each exposure's native units.
        skies = np.zeros(len(self.exposures))
        to_native = np.ones(len(self.exposures))
        for e, exp in enumerate(self.exposures):
            if isinstance(exp.data, jax.Array):
                # device-resident exposure: stats on device, fetch only
                # the scalar (match_sky runs pre-Pallas, so the sync is
                # safe even on tunneled runtimes)
                from ..catalogs.device import sigma_clipped_stats_device

                _, med_j, _ = sigma_clipped_stats_device(exp.data)
                med = float(med_j)
            else:
                _, med, _ = sigma_clipped_stats(exp.data)
            scale = (float(exp.exptime)
                     if str(exp.data_units).lower().startswith("count")
                     and exp.exptime else 1.0)
            skies[e] = med / scale      # rate units
            to_native[e] = scale
        if subtract and len(self.exposures):
            sub = skies - skies.min() if skymethod == "match" else skies
            for exp, sky, scale in zip(self.exposures, sub, to_native):
                # jax-array data stays on device (scalar subtraction)
                exp.data = exp.data - np.float32(sky * scale)
            # cached deposits are stale now
            self._per_exp.clear()
            self._sci_acc = self._wht_acc = None
        return skies

    def apply_static_mask(self, nsigma: float = 4.0) -> np.ndarray:
        """Build the stack's static bad-pixel mask and zero its weight
        in every exposure (AstroDrizzle's static-mask stage)."""
        mask = make_static_mask(self.exposures, nsigma=nsigma)
        if mask.any():
            mask_j = None
            for exp in self.exposures:
                if (isinstance(exp.data, jax.Array)
                        or isinstance(exp.weight, jax.Array)):
                    # device-resident: weights built/zeroed on device
                    if mask_j is None:
                        mask_j = jnp.asarray(mask)
                    wht = (jnp.ones(exp.data.shape, jnp.float32)
                           if exp.weight is None
                           else jnp.asarray(exp.weight))
                    exp.weight = jnp.where(mask_j, 0.0, wht)
                else:
                    wht = (np.ones_like(exp.data) if exp.weight is None
                           else exp.weight.copy())
                    wht[mask] = 0.0
                    exp.weight = wht
            self._per_exp.clear()
            self._sci_acc = self._wht_acc = None
        return mask

    def reject_cr(self, snr: float = 4.0, scale: float = 1.2,
                  interp: str = "linear") -> list[np.ndarray]:
        """Cosmic-ray rejection against the median-combined stack.

        The AstroDrizzle ``driz_cr`` capability (SURVEY §3.2 "CR
        rejection"), TPU-style: each exposure's resampled plane is
        median-combined on the output grid (robust to single-exposure
        CRs); the median is blotted back onto each exposure's distorted
        frame; pixels with ``|data - blot| > snr·sigma + scale·deriv``
        (deriv = local gradient of the blotted image, absorbing
        interpolation error at sharp sources) are flagged, their weights
        zeroed, and the stack re-drizzled.

        Returns the per-exposure boolean CR masks (True = rejected).
        Requires >= 3 exposures for a meaningful median.
        """
        import jax.numpy as jnp

        from ..blot import compute_pixmap
        from ..ops.interp import sample_image
        from ..utils import fetch_to_host

        if len(self.exposures) < 3:
            raise ValueError("CR rejection needs >= 3 exposures")
        if self._sci_acc is None:
            self.execute()
        Ho, Wo = self._oshape

        # spatial mode always takes the device-median branch: the
        # per-exposure deposits are row-band-sharded, so the (E, Hp, Wo)
        # stack, the nanmedian (elementwise over the plane) and the
        # blot-back (sample_spatial) never materialize a full mosaic on
        # any single device
        device_mode = (self.spatial_mesh is not None
                       or any(isinstance(e.data, jax.Array)
                              for e in self.exposures))
        if device_mode:
            # masked median ON DEVICE: the (E, Ho, Wo) plane stack and
            # the median never visit the host
            s_st = jnp.stack([jnp.asarray(self._per_exp[e.name][0])
                              for e in self.exposures])
            w_st = jnp.stack([jnp.asarray(self._per_exp[e.name][1])
                              for e in self.exposures])
            good = w_st > 0
            planes_j = jnp.where(good,
                                 s_st / jnp.where(good, w_st, 1.0),
                                 jnp.nan)
            med_j = jnp.nan_to_num(jnp.nanmedian(planes_j, axis=0),
                                   nan=float(self.fillval))
        else:
            planes = np.full((len(self.exposures), Ho, Wo), np.nan,
                             np.float32)
            for e, exp in enumerate(self.exposures):
                s, w = self._per_exp[exp.name]
                s = fetch_to_host(s)
                w = fetch_to_host(w)
                good = w > 0
                planes[e][good] = s[good] / w[good]
            with warnings.catch_warnings():
                # pixels covered by no exposure are all-NaN -> fillval
                warnings.simplefilter("ignore", RuntimeWarning)
                med = np.nanmedian(planes, axis=0)
            med = np.nan_to_num(med, nan=float(self.fillval))
            med_j = jnp.asarray(med, jnp.float32)

        masks: list[np.ndarray] = []
        for exp in self.exposures:
            px, py = compute_pixmap(exp.wcs, self._owcs, exp.data.shape)
            if self.spatial_mesh is not None:
                from ..parallel.spatial import sample_spatial

                blot_j, ok_j = sample_spatial(
                    self.spatial_mesh, med_j, jnp.asarray(px, jnp.float32),
                    jnp.asarray(py, jnp.float32), interp=interp,
                    logical_rows=Ho)
            else:
                blot_j, ok_j = sample_image(med_j,
                                            jnp.asarray(px, jnp.float32),
                                            jnp.asarray(py, jnp.float32),
                                            interp=interp)
            if device_mode:
                cr_j, wht_j = _reject_cr_one_device(
                    blot_j, ok_j, exposure_rate_data(exp), exp.weight,
                    snr, scale)
                exp.weight = wht_j
                masks.append(np.asarray(cr_j))
                continue
            blot = fetch_to_host(blot_j)
            ok = np.asarray(ok_j)
            # local gradient of the blotted model (driz_cr's derivative
            # image): max abs difference to the 4 neighbors
            p = np.pad(blot, 1, mode="edge")
            deriv = np.maximum.reduce([
                np.abs(blot - p[:-2, 1:-1]), np.abs(blot - p[2:, 1:-1]),
                np.abs(blot - p[1:-1, :-2]), np.abs(blot - p[1:-1, 2:]),
            ])
            # residuals in RATE units (blot of the combined product is in
            # rate; counts exposures are converted before differencing)
            resid = exposure_rate_data(exp) - blot
            # noise estimate from weight>0 pixels only: zero-weight
            # (already-rejected / masked) pixels must not feed the sigma
            # that gates CR flagging
            sel = ok & (np.abs(resid) < np.inf)
            if exp.weight is not None:
                sel = sel & (exp.weight > 0)
            sig = float(np.std(resid[sel])) if sel.any() else 0.0
            # robust sigma: clip once around the bulk
            if sel.any():
                r = resid[sel]
                med_r = np.median(r)
                mad = np.median(np.abs(r - med_r)) * 1.4826
                sig = float(mad) if mad > 0 else sig
            cr = ok & (np.abs(resid) > snr * sig + scale * deriv)
            masks.append(cr)
            wht = (np.ones_like(exp.data) if exp.weight is None
                   else exp.weight.copy())
            wht[cr] = 0.0
            exp.weight = wht
        self.execute()  # re-drizzle with CRs removed
        return masks

    @property
    def output_wht(self) -> np.ndarray:
        if self._wht_acc is None:
            self.execute()
        from ..utils import fetch_to_host
        return fetch_to_host(self._wht_acc)[:self._oshape[0]]

    @property
    def output_wcs(self) -> TanWCS:
        self._ensure_output_grid()
        return self._owcs

    @property
    def output_shape(self) -> tuple[int, int]:
        self._ensure_output_grid()
        return self._oshape

    @property
    def texptime(self) -> float:
        """Total exposure time of the stack (AstroDrizzle's TEXPTIME)."""
        return float(sum(e.exptime for e in self.exposures))
