"""Subpixel peak localization on (correlation) surfaces — TPU-native.

Capability parity with the reference's ``subpixal/centroid.py · find_peak``
(quadratic-surface subpixel peak fit with argmax fallback), redesigned for
TPU/XLA:

* fully **batched** over a leading axis — one call fits every cutout's
  correlation peak at once;
* the fit box has a **static size**, so the quadratic design matrix is a
  compile-time constant and the unweighted solve reduces to a single
  ``(k*k, 6)`` pseudo-inverse matmul (MXU-friendly);
* masked/weighted fits solve batched 6x6 normal equations with
  Tikhonov-guarded ``jnp.linalg.solve``;
* the reference's Python fallback logic (degenerate Hessian, peak outside
  the fit box) becomes branch-free ``jnp.where`` selects.

Reference semantics matched (see SURVEY.md §2 #5, §3.4):
``find_peak(image_data, peak_fit_box=5, peak_search_box='fitbox', mask=None)``
fits ``c0 + c1*x + c2*y + c3*x^2 + c4*xy + c5*y^2`` over a ``peak_fit_box``
square around the argmax, solves the gradient=0 2x2 system, and falls back
to the integer argmax when the stationary point is not a maximum or leaves
the box.

Additionally supports ``fit_type='gaussian'`` (quadratic fit on the log of
the positive-shifted surface), per BASELINE.json's north-star ("parabolic /
Gaussian surface fit around the correlation peak").
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class PeakFitResult(NamedTuple):
    """Batched peak-fit output.

    Attributes
    ----------
    x, y : (B,) float32
        Subpixel peak position in array coordinates (x = column, y = row).
    value : (B,) float32
        Fitted (or raw, on fallback) surface value at the peak.
    fit_ok : (B,) bool
        True where the quadratic fit produced a valid interior maximum;
        False where the result fell back to the integer argmax.
    ix, iy : (B,) int32
        Integer argmax position used to center the fit box.
    """

    x: jax.Array
    y: jax.Array
    value: jax.Array
    fit_ok: jax.Array
    ix: jax.Array
    iy: jax.Array


def _design_matrix(k: int) -> np.ndarray:
    """(k*k, 6) quadratic design matrix on a centered k x k grid.

    Columns: [1, x, y, x^2, x*y, y^2] with x/y in box coordinates centered
    on the box center (the argmax), which keeps the normal equations
    well-conditioned (SURVEY.md §7 "Numerics").
    """
    c = (k - 1) / 2.0
    yy, xx = np.mgrid[0:k, 0:k].astype(np.float64)
    x = (xx - c).ravel()
    y = (yy - c).ravel()
    cols = np.stack([np.ones_like(x), x, y, x * x, x * y, y * y], axis=1)
    return cols


@functools.partial(jnp.vectorize, signature="(n,m)->(),()")
def _argmax2d(a):
    """Row/col of the (first) maximum of a 2-D array."""
    flat = jnp.argmax(a.reshape(-1))
    n, m = a.shape
    return flat // m, flat % m


def _extract_box(data: jax.Array, iy: jax.Array, ix: jax.Array, k: int):
    """Extract a k x k box around (iy, ix), clipped to stay inside ``data``.

    Returns the box plus the (row0, col0) top-left corner actually used.
    Static shapes: the box is always k x k; near edges the window slides
    inward (matching the reference's behavior of shrinking/translating the
    fit box at the border, here realized as translation only).

    TPU note: a vmapped ``dynamic_slice`` lowers to a batched gather —
    ~1 ms for 500 surfaces. The separable one-hot contraction below is
    pure dense math (select + reduce, fully fused by XLA) and ~10x
    faster; surfaces here are small (correlation windows), so the dense
    (B, k, H/W) selectors are tiny.
    """
    h, w = data.shape[-2:]
    half = k // 2
    r0 = jnp.clip(iy - half, 0, h - k)
    c0 = jnp.clip(ix - half, 0, w - k)

    dt = data.dtype
    ki = jnp.arange(k, dtype=r0.dtype)
    sel_r = (r0[:, None, None] + ki[None, :, None]
             == jnp.arange(h, dtype=r0.dtype)[None, None, :])  # (B, k, h)
    sel_c = (c0[:, None, None] + ki[None, :, None]
             == jnp.arange(w, dtype=c0.dtype)[None, None, :])  # (B, k, w)
    # box[b, i, j] = sum_{r, c} sel_r[b,i,r] data[b,r,c] sel_c[b,j,c].
    # Non-finite pixels must be zeroed first (0 * nan = nan, so one bad
    # pixel ANYWHERE in the surface would otherwise poison every box);
    # they are re-poisoned below only where they fall INSIDE a box —
    # exactly the dynamic_slice semantics (NaN in box -> fit falls back).
    finite = jnp.isfinite(data)
    safe = jnp.where(finite, data, jnp.zeros((), dt))
    # Precision.HIGHEST: the one-hot contraction must reproduce each
    # selected pixel EXACTLY (dynamic_slice semantics). HIGH's 2-term
    # bf16 operand split carries only ~16 mantissa bits (the 3rd pass
    # only recovers cross terms), so it would perturb every box pixel
    # by ~2^-17 relative; HIGHEST's split is lossless for f32.
    P = jax.lax.Precision.HIGHEST
    sr = sel_r.astype(dt)
    sc = sel_c.astype(dt)
    # the data plane and the non-finite indicator ride ONE pair of
    # einsums (batch-concatenated) instead of two — the box gather is
    # a measured hot spot of the displacement pipeline's peak fit
    planes = jnp.concatenate([safe, (~finite).astype(dt)], axis=0)
    sr2 = jnp.concatenate([sr, sr], axis=0)
    sc2 = jnp.concatenate([sc, sc], axis=0)
    tmp = jnp.einsum("bir,brc->bic", sr2, planes, precision=P)
    both = jnp.einsum("bjc,bic->bij", sc2, tmp, precision=P)
    b = data.shape[0]
    box = jnp.where(both[b:] > 0, jnp.nan, both[:b])
    return box, r0, c0


def _quad_coeffs(box: jax.Array, wts: jax.Array | None, k: int) -> jax.Array:
    """Least-squares quadratic coefficients for each k x k box.

    box : (B, k, k); wts : (B, k, k) nonnegative weights or None.
    Returns (B, 6) coefficients [c0, c1, c2, c3, c4, c5].
    """
    # NOTE: these matmuls determine subpixel precision; they must run with
    # full f32 accumulation (Precision.HIGHEST), not the bf16 default the
    # MXU would otherwise use. They are tiny (k*k x 6) — cost is negligible.
    P = jax.lax.Precision.HIGHEST
    A = jnp.asarray(_design_matrix(k), dtype=box.dtype)  # (k*k, 6)
    z = box.reshape(box.shape[0], k * k)
    if wts is None:
        # Constant design matrix -> precomputed pseudo-inverse, single matmul.
        pinv = jnp.asarray(np.linalg.pinv(_design_matrix(k)), dtype=box.dtype)
        return jnp.dot(z, pinv.T, precision=P)
    w = wts.reshape(wts.shape[0], k * k)
    # zero data where the weight is zero: 0 * NaN = NaN would otherwise
    # poison the normal equations, so a single masked NaN pixel inside
    # the fit box silently degraded every fit to the integer argmax
    z = jnp.where(w > 0, z, 0.0)
    # Batched weighted normal equations (A^T W A) c = A^T W z, assembled
    # as TWO matmuls against FIXED right operands: ata[b] = w[b] @ P6
    # with P6[n, i*6+j] = A[n,i]*A[n,j], and atz = (w*z) @ A — no
    # (B, k*k, 6) intermediate, and both contractions are plain
    # (B, k*k) x (k*k, ...) MXU matmuls
    An = _design_matrix(k)
    P6 = jnp.asarray((An[:, :, None] * An[:, None, :]).reshape(k * k, 36),
                     dtype=box.dtype)
    ata = jnp.dot(w, P6, precision=P).reshape(-1, 6, 6)
    atz = jnp.dot(w * z, A, precision=P)
    # Tikhonov guard keeps the solve finite when too many pixels are masked;
    # such fits are rejected downstream by the fit_ok checks anyway.
    ata = ata + 1e-8 * jnp.eye(6, dtype=box.dtype)[None]
    return _solve_spd_small(ata, atz)


def _solve_spd_small(A: jax.Array, b: jax.Array) -> jax.Array:
    """Batched SPD solve for tiny static n via unrolled Cholesky.

    ``jnp.linalg.solve`` on (B, 6, 6) lowers to a pivoted batched LU that
    costs ~0.8 ms for B=500 on TPU; the normal equations here are SPD (+
    Tikhonov), so an unrolled Cholesky — ~70 elementwise (B,)-vector ops,
    entirely on the VPU — solves the same systems in ~10 µs.
    """
    n = A.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[:, i, j]
            for p in range(j):
                s = s - L[i][p] * L[j][p]
            if i == j:
                L[i][i] = jnp.sqrt(jnp.maximum(s, 1e-30))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * n
    for i in range(n):
        s = b[:, i]
        for p in range(i):
            s = s - L[i][p] * y[p]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for p in range(i + 1, n):
            s = s - L[p][i] * x[p]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def normalize_search_box(
    peak_search_box, H: int, W: int, peak_fit_box: int,
) -> tuple[int, int, int, int] | None:
    """Resolve the reference's ``peak_search_box`` forms to static bounds.

    Accepted forms (parity with reference ``centroid.find_peak``):
    ``None`` / ``'all'`` — the whole surface; ``'fitbox'`` — a
    ``peak_fit_box``-sized window centered on the surface center (for a
    centered correlation surface: around ZERO lag, confining the coarse
    argmax near zero shift); an ``int`` side; or explicit
    ``(r0, r1, c0, c1)`` bounds. Returns bounds or None.
    """
    if peak_search_box is None or peak_search_box == "all":
        return None
    if isinstance(peak_search_box, bool):
        # bool is an int subclass: True would otherwise confine the
        # search to a 1-pixel box. Read it as on/off instead.
        return (normalize_search_box("fitbox", H, W, peak_fit_box)
                if peak_search_box else None)
    if peak_search_box == "fitbox":
        s = int(peak_fit_box)
    elif isinstance(peak_search_box, (int, np.integer)):
        s = int(peak_search_box)
    else:
        r0, r1, c0, c1 = peak_search_box
        return (int(r0), int(r1), int(c0), int(c1))
    s = max(min(s, H, W), 1)
    r0 = H // 2 - s // 2
    c0 = W // 2 - s // 2
    return (r0, r0 + s, c0, c0 + s)


def find_peak(
    data: jax.Array,
    peak_fit_box: int = 5,
    peak_search_box=None,
    mask: jax.Array | None = None,
    fit_type: str = "quadratic",
) -> PeakFitResult:
    """Locate the peak of each surface in a batch with subpixel precision.

    Parameters
    ----------
    data : (B, H, W) or (H, W) array
        Surfaces (typically correlation images).
    peak_fit_box : int
        Side of the square box, centered on the argmax, over which the
        quadratic surface is fit (reference default 5).
    peak_search_box : None | 'all' | 'fitbox' | int | (r0, r1, c0, c1)
        Restrict the argmax search (static bounds; see
        :func:`normalize_search_box` — the fixed-shape analogue of the
        reference's ``peak_search_box``). ``None`` searches the full
        surface.
    mask : optional bool/float array broadcastable to ``data``
        True/nonzero = valid pixel. Invalid pixels are excluded from both
        the argmax and the fit (weighted fit path).
    fit_type : 'quadratic' | 'gaussian'
        'gaussian' fits the quadratic to ``log(surface)`` after shifting the
        box to be positive — exact for Gaussian-shaped peaks.

    Returns
    -------
    PeakFitResult with batch-shaped fields. For 2-D input the batch axis is
    added and results have B=1.
    """
    squeeze = data.ndim == 2
    if squeeze:
        data = data[None]
    if mask is not None and mask.ndim == data.ndim - 1:
        mask = mask[None]
    B, H, W = data.shape
    k = int(peak_fit_box)
    if k < 3:
        raise ValueError("peak_fit_box must be >= 3")
    k = min(k, H, W)

    valid = None
    if mask is not None:
        valid = jnp.broadcast_to(mask.astype(bool), data.shape)

    # --- integer argmax (optionally restricted to the search box) ---
    search = data
    if valid is not None:
        search = jnp.where(valid, search, -jnp.inf)
    bounds = normalize_search_box(peak_search_box, H, W, k)
    if bounds is not None:
        r0, r1, c0, c1 = bounds
        rows = jnp.arange(H)[None, :, None]
        cols = jnp.arange(W)[None, None, :]
        inside = (rows >= r0) & (rows < r1) & (cols >= c0) & (cols < c1)
        search = jnp.where(inside, search, -jnp.inf)
    iy, ix = _argmax2d(search)
    iy = iy.astype(jnp.int32)
    ix = ix.astype(jnp.int32)
    # value at the argmax == max of the (masked) search surface — a plain
    # reduce, ~5x cheaper than a batched take_along_axis gather on TPU
    peak_val = jnp.max(search, axis=(1, 2))

    # --- fit box around argmax ---
    box, r0_, c0_ = _extract_box(data, iy, ix, k)
    if valid is not None:
        vbox, _, _ = _extract_box(valid.astype(data.dtype), iy, ix, k)
        # out-of-image regions of the box come back NaN (also in the
        # extracted validity plane); masked pixels may BE NaN in the
        # data. Neutralize both before any transform — 0 * NaN = NaN
        # would otherwise poison the weighted normal equations and
        # silently degrade every masked fit to the integer argmax.
        vbox = jnp.nan_to_num(vbox, nan=0.0)
        box = jnp.where(vbox > 0, box, 0.0)
    else:
        vbox = None

    if fit_type == "gaussian":
        # log-transform WITHOUT shifting (log of a Gaussian is exactly
        # quadratic only if the surface is scaled, never offset). Values
        # are normalized by the box max; non-positive pixels are floored
        # and strongly downweighted. Value-proportional weights keep the
        # log-space fit from amplifying noise in the faint wings — the
        # standard weighting for Gaussian fits in log space.
        bmax = jnp.max(box, axis=(1, 2), keepdims=True)
        scale = jnp.maximum(bmax, 1e-30)
        ratio = box / scale
        zbox = jnp.log(jnp.clip(ratio, 1e-8, None))
        gw = jnp.clip(ratio, 0.0, 1.0)
        vbox = gw if vbox is None else vbox * gw
    elif fit_type == "quadratic":
        zbox = box
    else:
        raise ValueError(f"unknown fit_type: {fit_type!r}")

    coef = _quad_coeffs(zbox, vbox, k)
    c0c, c1, c2, c3, c4, c5 = [coef[:, i] for i in range(6)]

    # Stationary point of the quadratic: solve [2c3 c4; c4 2c5] p = -[c1; c2]
    det = 4.0 * c3 * c5 - c4 * c4
    safe_det = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    px = (-2.0 * c5 * c1 + c4 * c2) / safe_det
    py = (c4 * c1 - 2.0 * c3 * c2) / safe_det

    # Valid maximum: negative-definite Hessian (det>0, c3<0) and stationary
    # point inside the fit box (reference: fall back to argmax otherwise).
    half = (k - 1) / 2.0
    is_max = (det > 0) & (c3 < 0)
    inside = (jnp.abs(px) <= half + 0.5) & (jnp.abs(py) <= half + 0.5)
    fit_ok = is_max & inside & jnp.isfinite(px) & jnp.isfinite(py)
    # a surface with NO valid pixel in the search area has peak_val=-inf
    # and an argmax of (0, 0) on raw data — never report a good fit there
    fit_ok = fit_ok & jnp.isfinite(peak_val)

    # Box-center coordinates -> image coordinates.
    cy = r0_.astype(data.dtype) + (k - 1) / 2.0
    cx = c0_.astype(data.dtype) + (k - 1) / 2.0
    x_fit = cx + px
    y_fit = cy + py
    v_fit = c0c + c1 * px + c2 * py + c3 * px * px + c4 * px * py + c5 * py * py
    if fit_type == "gaussian":
        v_fit = jnp.exp(v_fit) * scale[:, 0, 0]

    x = jnp.where(fit_ok, x_fit, ix.astype(data.dtype))
    y = jnp.where(fit_ok, y_fit, iy.astype(data.dtype))
    value = jnp.where(fit_ok, v_fit, peak_val)

    res = PeakFitResult(x=x, y=y, value=value, fit_ok=fit_ok, ix=ix, iy=iy)
    if squeeze:
        res = PeakFitResult(*(r[0] for r in res))
    return res
