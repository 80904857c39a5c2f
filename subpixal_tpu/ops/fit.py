"""Sigma-clipped linear (WCS-correction) fits — TPU-native.

Capability parity with the reference's fitting layer
(``subpixal/align.py · find_linear_fit`` — iterative sigma-clipped LSQ fit
of measured displacements, SURVEY.md §1 "Fitting layer", §3.1): given
matched source positions ``xy`` and their measured counterparts ``uv``
(= xy + displacement), fit ``uv ≈ M @ xy + t`` with ``fitgeom`` in
``{'shift', 'rscale', 'general'}`` and iteratively reject outliers beyond
``sigma`` times the fit RMS, ``nclip`` times.

TPU-first redesign: the clip loop is a fixed-trip ``lax.fori_loop`` over
boolean weights (fixed shapes — the reference's data-dependent point
removal becomes weight zeroing, SURVEY §7 "Sigma-clip convergence under
jit"), every moment/solve is a closed-form weighted expression (no
iterative LAPACK path), and everything is batchable over an image axis
with ``vmap``.

Closed forms
------------
With weighted centroids removed (X = xy - <xy>, U = uv - <uv>):

* ``shift``  : M = I,              t = <uv> - <xy>
* ``rscale`` : M = s R (similarity: rotation + single scale, optional
  reflection is NOT fitted — matching the reference's rscale),
  via a = Σw(x·u + y·v), b = Σw(x·v − y·u), s² from ratio of norms.
* ``general``: M = S_ux S_xx⁻¹ (full 2x2 affine), t from centroids.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["iter_linear_fit", "LinearFitResult", "apply_affine"]

_P = jax.lax.Precision.HIGHEST


class LinearFitResult(NamedTuple):
    """Result of a sigma-clipped linear fit.

    matrix : (2, 2) — fitted linear part M.
    shift : (2,) — fitted translation t, so that ``uv ≈ xy @ M.T + t``.
    rms : (2,) — weighted per-axis RMS of the final residuals.
    rmse : () — weighted total RMS residual (sqrt of mean squared radius).
    mae : () — weighted mean absolute (radial) error.
    nmatches : () int32 — number of points surviving the clipping.
    weights : (N,) — final effective weights (0 where clipped).
    """

    matrix: jax.Array
    shift: jax.Array
    rms: jax.Array
    rmse: jax.Array
    mae: jax.Array
    nmatches: jax.Array
    weights: jax.Array


def apply_affine(xy: jax.Array, matrix: jax.Array, shift: jax.Array) -> jax.Array:
    """Apply ``xy @ M.T + t`` (row-vector convention used throughout)."""
    return jnp.dot(xy, matrix.T, precision=_P) + shift


def _weighted_fit(xy, uv, w, fitgeom: str):
    """One closed-form weighted fit. Returns (matrix, shift)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    cx = jnp.sum(w[:, None] * xy, axis=0) / wsum
    cu = jnp.sum(w[:, None] * uv, axis=0) / wsum
    X = xy - cx
    U = uv - cu
    eye = jnp.eye(2, dtype=xy.dtype)

    if fitgeom == "shift":
        M = eye
    elif fitgeom == "rscale":
        # similarity: maximize alignment of U with s R X
        a = jnp.sum(w * (X[:, 0] * U[:, 0] + X[:, 1] * U[:, 1]))
        b = jnp.sum(w * (X[:, 0] * U[:, 1] - X[:, 1] * U[:, 0]))
        nx = jnp.maximum(jnp.sum(w * jnp.sum(X * X, axis=1)), 1e-12)
        denom = jnp.maximum(jnp.sqrt(a * a + b * b), 1e-12)
        cos_t = a / denom
        sin_t = b / denom
        s = denom / nx
        M = s * jnp.array([[1.0, 0.0], [0.0, 1.0]], xy.dtype)
        R = jnp.stack(
            [jnp.stack([cos_t, -sin_t]), jnp.stack([sin_t, cos_t])]
        )
        M = s * R
    elif fitgeom == "general":
        Sxx = jnp.einsum("n,ni,nj->ij", w, X, X, precision=_P)
        Sux = jnp.einsum("n,ni,nj->ij", w, U, X, precision=_P)
        Sxx = Sxx + 1e-10 * jnp.trace(Sxx) * eye + 1e-12 * eye
        M = jnp.dot(Sux, jnp.linalg.inv(Sxx), precision=_P)
    else:
        raise ValueError(
            f"unknown fitgeom: {fitgeom!r} (expected 'shift'|'rscale'|'general')"
        )
    t = cu - jnp.dot(M, cx, precision=_P)
    return M, t


def iter_linear_fit(
    xy: jax.Array,
    uv: jax.Array,
    wxy: jax.Array | None = None,
    fitgeom: str = "general",
    nclip: int = 3,
    sigma: float = 3.0,
) -> LinearFitResult:
    """Iterative sigma-clipped weighted linear fit of ``uv`` against ``xy``.

    Parameters
    ----------
    xy, uv : (N, 2) float arrays
        Matched positions: the fit solves ``uv ≈ xy @ M.T + t``. In the
        align loop, ``xy`` are source positions and ``uv = xy + measured
        displacement`` (reference ``find_linear_fit`` semantics).
    wxy : (N,) optional nonnegative weights
        Measurement weights (reference ``use_weights=True`` path, e.g.
        correlation peak values or source fluxes). Zero-weight points are
        pre-clipped. ``None`` = uniform.
    fitgeom : 'shift' | 'rscale' | 'general'
    nclip : int — number of sigma-clip iterations (reference default 3).
    sigma : float — clip threshold in units of the fit RMS.

    Notes
    -----
    Fixed-shape semantics: clipping zeroes weights instead of removing
    rows, so the function is jit/vmap-safe. If clipping would leave fewer
    than 3 points (the minimum for 'general'), the clip step is skipped
    for that iteration (mirrors the reference keeping the last valid fit).
    """
    xy = jnp.asarray(xy, jnp.float32)
    uv = jnp.asarray(uv, jnp.float32)
    n = xy.shape[0]
    w0 = jnp.ones((n,), jnp.float32) if wxy is None else jnp.asarray(wxy, jnp.float32)
    w0 = jnp.maximum(w0, 0.0)

    def fit_and_resid(w):
        M, t = _weighted_fit(xy, uv, w, fitgeom)
        resid = uv - apply_affine(xy, M, t)
        r2 = jnp.sum(resid * resid, axis=1)
        return M, t, resid, r2

    def clip_step(_, w):
        M, t, resid, r2 = fit_and_resid(w)
        wsum = jnp.maximum(jnp.sum(w), 1e-12)
        rms2 = jnp.sum(w * r2) / wsum
        keep = r2 <= (sigma * sigma) * jnp.maximum(rms2, 1e-24)
        w_new = jnp.where(keep, w, 0.0)
        enough = jnp.sum(w_new > 0) >= 3
        return jnp.where(enough, w_new, w)

    w = jax.lax.fori_loop(0, nclip, clip_step, w0) if nclip > 0 else w0
    M, t, resid, r2 = fit_and_resid(w)

    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    rms = jnp.sqrt(jnp.sum(w[:, None] * resid * resid, axis=0) / wsum)
    rmse = jnp.sqrt(jnp.sum(w * r2) / wsum)
    mae = jnp.sum(w * jnp.sqrt(r2)) / wsum
    nmatches = jnp.sum(w > 0).astype(jnp.int32)
    return LinearFitResult(
        matrix=M, shift=t, rms=rms, rmse=rmse, mae=mae,
        nmatches=nmatches, weights=w,
    )
