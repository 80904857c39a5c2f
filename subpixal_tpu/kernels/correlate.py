"""Pallas TPU kernel: fused NCC normalize + forward DFT cross-spectrum.

The displacement pipeline's front end (reference ``subpixal/cc.py ·
find_displacement``'s normalize + fft2 + conj-multiply; SURVEY.md §3.4)
is HBM-bound as separate XLA ops: the masked NCC statistics, the
normalized cutouts, and the W-/H-pass DFT intermediates each round-trip
HBM (~150 MB per 500×64² batch — docs/architecture.md §Roofline names
this exact fusion as the round-3 frontier).

This kernel performs, per block of ``CB`` cutouts resident in VMEM:

1. masked NCC statistics + normalization of ref and img (VPU),
2. the forward matmul-DFT of both sides — a stacked W-pass MXU
   contraction against ``[CWᵀ|SWᵀ]`` and a stacked H-pass against
   ``[CH;SH]`` (identical math to
   :func:`subpixal_tpu.ops.correlate._rfft2_matmul`),
3. the cross-spectrum product ``G = F(img)·conj(F(ref))``,

writing only the packed half-spectrum ``[Gr|Gi]`` (B·H, 2·Wr) back to
HBM — the normalized cutouts and the per-side spectra never leave VMEM.

Mosaic-shaped: every array in the kernel is 2-D (cutouts stacked along
the sublane axis as ``(CB·H, W)`` blocks; per-cutout work uses static
row slices) — rank-3 blocks with in-kernel reshapes SIGABRT the Mosaic
compiler (measured round 3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["cross_spectrum_pallas", "measure_displacement_pallas"]

_P = jax.lax.Precision.HIGHEST


def _xspec_kernel(ref_ref, img_ref, *rest, H, W, Wr, CB, cc_type,
                  has_rmask, has_imask):
    idx = 0
    rmask_ref = imask_ref = None
    if has_rmask:
        rmask_ref = rest[idx]
        idx += 1
    if has_imask:
        imask_ref = rest[idx]
        idx += 1
    cwst_ref, chs_ref, out_ref = rest[idx:idx + 3]
    cwst = cwst_ref[:]   # (W, 2Wr): [CWᵀ | SWᵀ]
    chs = chs_ref[:]     # (2H, H):  [CH; SH]

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_P)

    for b in range(CB):  # static unroll over the block's cutouts
        sl = slice(b * H, (b + 1) * H)

        def norm(a_ref, m_ref):
            """Masked NCC normalization == ops.correlate._normalize."""
            a = a_ref[sl, :]
            m = None if m_ref is None else m_ref[sl, :]
            if m is not None:
                a = a * m
            if cc_type == "CC":
                return a
            if m is None:
                n = jnp.float32(H * W)
                d = a - jnp.sum(a) / n
                var = jnp.sum(d * d) / n
            else:
                n = jnp.maximum(jnp.sum(m), 1.0)
                d = (a - jnp.sum(a) / n) * m
                var = jnp.sum(d * d) / n
            # d / (sqrt(max(var, eps)) * sqrt(n)) == d * rsqrt(...)
            return d * jax.lax.rsqrt(jnp.maximum(var, 1e-20) * n)

        def fwd(xn):
            """(H, W) -> (Yr, Yi) each (H, Wr): the stacked matmul-DFT."""
            X = dot(xn, cwst)       # (H, 2Wr) = [Xr | Xi]
            Q = dot(chs, X)         # (2H, 2Wr)
            Yr = Q[:H, :Wr] - Q[H:, Wr:]
            Yi = Q[:H, Wr:] + Q[H:, :Wr]
            return Yr, Yi

        Rr, Ri = fwd(norm(ref_ref, rmask_ref))
        Ir, Ii = fwd(norm(img_ref, imask_ref))
        # G = F(img) * conj(F(ref))
        out_ref[sl, :Wr] = Ir * Rr + Ii * Ri
        out_ref[sl, Wr:] = Ii * Rr - Ir * Ri


@functools.partial(
    jax.jit,
    static_argnames=("cc_type", "block_cutouts", "interpret"))
def cross_spectrum_pallas(
    ref: jax.Array,
    img: jax.Array,
    ref_mask: jax.Array | None = None,
    img_mask: jax.Array | None = None,
    cc_type: str = "NCC",
    block_cutouts: int = 16,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused masked-NCC + forward-DFT cross-spectrum of a cutout batch.

    ref, img : (B, H, W) float32; optional masks broadcastable to the
    same shape (True/nonzero = valid). Returns ``(Gr, Gi)`` — the rfft2
    half-spectrum of ``fft2(img_n) * conj(fft2(ref_n))`` as two (B, H,
    Wr) float32 arrays, numerically matching
    :func:`subpixal_tpu.ops.correlate._cross_spectrum` (same stacked
    matmul-DFT constants, ``Precision.HIGHEST``).
    """
    from ..ops.correlate import _dft_consts

    if cc_type not in ("CC", "NCC", "ZNCC"):
        raise ValueError(
            f"unknown cc_type: {cc_type!r} (expected 'CC'|'NCC'|'ZNCC')")
    B, H, W = ref.shape
    Wr = W // 2 + 1
    CB = max(1, min(int(block_cutouts), B))
    Bp = -(-B // CB) * CB

    CWS, CHS, _, _ = _dft_consts(H, W)  # (2Wr, W), (2H, H) numpy f32

    def prep(a):
        a = jnp.asarray(a, jnp.float32)
        if Bp != B:
            a = jnp.pad(a, ((0, Bp - B), (0, 0), (0, 0)))
        return a.reshape(Bp * H, W)

    def prep_mask(m):
        if m is None:
            return None
        return prep(jnp.broadcast_to(m, (B, H, W)).astype(jnp.float32))

    blk = pl.BlockSpec((CB * H, W), lambda g: (g, 0),
                       memory_space=pltpu.VMEM)
    in_specs = [blk, blk]
    inputs = [prep(ref), prep(img)]
    rm = prep_mask(ref_mask)
    im = prep_mask(img_mask)
    if rm is not None:
        in_specs.append(blk)
        inputs.append(rm)
    if im is not None:
        in_specs.append(blk)
        inputs.append(im)
    in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM),
                 pl.BlockSpec(memory_space=pltpu.VMEM)]
    inputs += [jnp.asarray(CWS.T), jnp.asarray(CHS)]

    kern = functools.partial(
        _xspec_kernel, H=H, W=W, Wr=Wr, CB=CB, cc_type=cc_type,
        has_rmask=rm is not None, has_imask=im is not None)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Bp * H, 2 * Wr), jnp.float32),
        grid=(Bp // CB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((CB * H, 2 * Wr), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*inputs)
    out = out.reshape(Bp, H, 2 * Wr)
    return out[:B, :, :Wr], out[:B, :, Wr:]


# --------------------------------------------------------------------- #
# fully-fused displacement measurement kernel
# --------------------------------------------------------------------- #

def _measure_consts(H, W, CB, usfac, nwin, bounds):
    """Static numpy constants for :func:`measure_displacement_pallas`.

    Built in float64 then cast (the XLA path builds the same kernels in
    f32 via :func:`subpixal_tpu.ops.correlate._us_dft_kernel`; at the
    integer lags involved the difference is ~1e-7). Returns a dict of
    f32 arrays sized for the lane-stacked block layout.
    """
    Wr = W // 2 + 1
    r0, r1, c0, c1 = bounds
    ny, nx = r1 - r0, c1 - c0
    nyp = -(-ny // 8) * 8
    nxp = 8 if nx <= 8 else -(-nx // 8) * 8
    ly0, lx0 = r0 - H // 2, c0 - W // 2
    fy = np.round(np.fft.fftfreq(H) * H).astype(np.int64)        # (H,)
    fx = np.round(np.fft.fftfreq(W) * W).astype(np.int64)[:Wr]   # (Wr,)

    def kern(t, f, period):
        # exp(+2pi i f t / period): (len(t), len(f)) complex128
        ang = 2.0 * np.pi * np.outer(t, f) / period
        return np.cos(ang) + 1j * np.sin(ang)

    # coarse lag kernels, zero-padded to (nyp, H) / (Wr, nxp)
    Ky = np.zeros((nyp, H), np.complex128)
    Ky[:ny] = kern(np.arange(ny) + ly0, fy, H)
    KxT = np.zeros((Wr, nxp), np.complex128)
    KxT[:, :nx] = kern(np.arange(nx) + lx0, fx, W).T
    # upsampled window kernels (fractional taps)
    tf = (np.arange(nwin) - nwin // 2) / usfac
    K2y = kern(tf, fy, H)                                        # (nwin, H)
    K2xT = kern(tf, fx, W).T / (H * W)     # (Wr, nwin), 1/(HW) folded in

    def bd(M):  # block-diagonal (CB*rows, CB*cols) from (rows, cols)
        r, c = M.shape
        out = np.zeros((CB * r, CB * c), M.dtype)
        for b in range(CB):
            out[b * r:(b + 1) * r, b * c:(b + 1) * c] = M
        return out

    wk = np.full((Wr,), 2.0, np.float64)
    wk[0] = 1.0
    if W % 2 == 0:
        wk[-1] = 1.0
    f32 = lambda a: np.asarray(a, np.float32)  # noqa: E731
    return {
        "Kyr": f32(Ky.real), "Kyi": f32(Ky.imag),
        "KxTr_bd": f32(bd(KxT.real)), "KxTi_bd": f32(bd(KxT.imag)),
        "K2yr": f32(K2y.real), "K2yi": f32(K2y.imag),
        "K2xTr_bd": f32(bd(K2xT.real)), "K2xTi_bd": f32(bd(K2xT.imag)),
        "wherm": f32(np.tile(wk, CB))[None, :],          # (1, CB*Wr)
        "fy_col": np.asarray(fy, np.int32)[:, None],     # (H, 1)
        "fx_row": np.asarray(np.tile(fx, CB), np.int32)[None, :],
        "expand": f32(np.repeat(np.eye(CB), Wr, axis=1)),  # (CB, CB*Wr)
        "ind": f32(np.repeat(np.eye(CB), H, axis=1)),      # (CB, CB*H)
        "indt": f32(np.repeat(np.eye(CB), H, axis=0)),     # (CB*H, CB)
        "nyp": nyp, "nxp": nxp, "ny": ny, "nx": nx,
        "ly0": ly0, "lx0": lx0,
    }


def _measure_kernel(ref_ref, img_ref, *rest, H, W, Wr, CB, cc_type,
                    has_rmask, has_imask, C, _ablate=""):
    """Fused: normalize -> forward DFT -> cross-spectrum -> windowed
    coarse argmax -> upsampled matrix-DFT window, per CB-cutout block.

    Every array is 2-D (Mosaic: rank-3 blocks + in-kernel reshapes
    SIGABRT). Cutouts enter row-stacked ``(CB*H, W)``; spectra live
    lane-stacked ``(H, CB*Wr)`` so every matmul shares its non-batch
    operand (left: DFT kernels; right: static block-diagonal read-out
    kernels) and fills the MXU — the per-cutout matmuls of the retired
    round-3 prototype starved it (661 us vs 198 us/batch).

    MEASURED OUTCOME (v5e, 2026-08-18): still ~3.5-5x slower than the
    XLA einsum path (450-660 us vs the honest ~131 us per 512x64^2
    batch; the "42 us" first recorded here was the short-loop min-of-5
    timer artifact, see bench.py) — the
    row-block -> lane-block restack (4·CB copies/block) and per-cutout
    argmax extraction are ~2000 small Mosaic ops per batch, dwarfing
    the ~25 us of HBM traffic the fusion saves. Kept OPT-IN
    (``SUBPIXAL_TPU_FUSED_MEASURE=1``) as a numeric cross-check and a
    base for a future restack-free layout; see
    ``ops.correlate._use_fused_measure``.
    """
    from ..ops.correlate import _P_FWD, _P_READOUT

    idx = 0
    rmask_ref = imask_ref = None
    if has_rmask:
        rmask_ref = rest[idx]; idx += 1
    if has_imask:
        imask_ref = rest[idx]; idx += 1
    (cwst_ref, chs_ref, kyr_ref, kyi_ref, kxtr_ref, kxti_ref,
     k2yr_ref, k2yi_ref, k2xtr_ref, k2xti_ref, wherm_ref, fy_ref,
     fx_ref, expand_ref, ind_ref, indt_ref) = rest[idx:idx + 16]
    c2_ref, s0_ref = rest[idx + 16:idx + 18]
    xr_l, xi_l = rest[idx + 18:idx + 20]

    nyp, nxp, ny, nx = C["nyp"], C["nxp"], C["ny"], C["nx"]
    ly0, lx0 = C["ly0"], C["lx0"]

    def dot(a, b, prec):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    def dot_fwd(a, b):
        """Forward-DFT matmul at Precision.HIGH-equivalent accuracy.

        Mosaic rejects ``Precision.HIGH``; this is the same 3-pass
        bf16 split XLA emits for it (hi/lo decomposition, f32
        accumulation, the lo x lo term dropped)."""
        if _P_FWD is jax.lax.Precision.HIGHEST:
            return dot(a, b, jax.lax.Precision.HIGHEST)
        if _P_FWD is jax.lax.Precision.DEFAULT:
            return dot(a, b, jax.lax.Precision.DEFAULT)
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        d = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)
        return d(ah, bh) + d(ah, bl) + d(al, bh)

    def seg_sum(col):
        # per-cutout totals of a (CB*H, 1) row-reduced column: one
        # indicator matmul replaces CB unrolled full reductions
        return dot(ind_ref[:], col, jax.lax.Precision.HIGHEST)  # (CB, 1)

    def seg_bcast(col_cb):
        # (CB, 1) per-cutout scalars -> (CB*H, 1) row-aligned column
        return dot(indt_ref[:], col_cb, jax.lax.Precision.HIGHEST)

    def side(x_ref, m_ref):
        # masked NCC normalize, fully vectorized over the block (the
        # unrolled per-cutout reductions of the first draft cost more
        # than every matmul combined)
        a = x_ref[:]
        m = None if m_ref is None else m_ref[:]
        if m is not None:
            a = a * m
        if cc_type != "CC":
            if m is None:
                n = jnp.full((CB, 1), jnp.float32(H * W))
            else:
                n = jnp.maximum(
                    seg_sum(jnp.sum(m, axis=1, keepdims=True)), 1.0)
            tot = seg_sum(jnp.sum(a, axis=1, keepdims=True))
            d = a - seg_bcast(tot / n)
            if m is not None:
                d = d * m
            var = seg_sum(jnp.sum(d * d, axis=1, keepdims=True)) / n
            scale = jax.lax.rsqrt(jnp.maximum(var, 1e-20) * n)
            a = d * seg_bcast(scale)
        # one W-pass matmul for the whole block
        X = dot_fwd(a, cwst_ref[:])                    # (CB*H, 2Wr)
        # restack row blocks -> lane blocks
        for b in range(CB):
            xr_l[:, b * Wr:(b + 1) * Wr] = X[b * H:(b + 1) * H, :Wr]
            xi_l[:, b * Wr:(b + 1) * Wr] = X[b * H:(b + 1) * H, Wr:]
        # one H-pass (shared left operand) per re/im part
        Q1 = dot_fwd(chs_ref[:], xr_l[:])              # (2H, CB*Wr)
        Q2 = dot_fwd(chs_ref[:], xi_l[:])
        return Q1[:H] - Q2[H:], Q2[:H] + Q1[H:]        # Yr, Yi

    def bail(v):
        c2_ref[:, :] = jnp.broadcast_to(v, (c2_ref.shape[0], 1)) * jnp.ones(
            (1, c2_ref.shape[1]), jnp.float32)
        s0_ref[:, :] = jnp.zeros((8, 128), jnp.float32)

    if _ablate == "norm":
        a = ref_ref[:] + img_ref[:]
        bail(jnp.sum(a, axis=1, keepdims=True)[:c2_ref.shape[0]])
        return
    Rr, Ri = side(ref_ref, rmask_ref)
    Ir, Ii = side(img_ref, imask_ref)
    if _ablate == "fwd":
        bail(jnp.sum(Rr + Ri + Ir + Ii, axis=1, keepdims=True)[:c2_ref.shape[0]])
        return

    # cross-spectrum + hermitian fold weights (whole-array VPU)
    w = wherm_ref[:]                                   # (1, CB*Wr)
    Gwr = (Ir * Rr + Ii * Ri) * w
    Gwi = (Ii * Rr - Ir * Ri) * w

    # windowed coarse lags: C_all = Re{Ky @ Gw @ KxT_bd}
    Kyr, Kyi = kyr_ref[:], kyi_ref[:]
    tr = dot(Kyr, Gwr, _P_READOUT) - dot(Kyi, Gwi, _P_READOUT)
    ti = dot(Kyr, Gwi, _P_READOUT) + dot(Kyi, Gwr, _P_READOUT)
    Cc = (dot(tr, kxtr_ref[:], _P_READOUT)
          - dot(ti, kxti_ref[:], _P_READOUT))          # (nyp, CB*nxp)
    if _ablate == "coarse":
        bail(jnp.sum(Cc, axis=1, keepdims=True)[:1])
        return

    # per-cutout coarse argmax (first-index tie-break, padding masked)
    ri = jax.lax.broadcasted_iota(jnp.int32, (nyp, nxp), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (nyp, nxp), 1)
    valid = (ri < ny) & (ci < nx)
    flat_idx = ri * nxp + ci
    s0y_row = jnp.zeros((1, CB), jnp.float32)
    s0x_row = jnp.zeros((1, CB), jnp.float32)
    onehot = jax.lax.broadcasted_iota(jnp.int32, (1, CB), 1)
    for b in range(CB):
        Cb = Cc[:, b * nxp:(b + 1) * nxp]
        big = jnp.where(valid, Cb, -jnp.inf)
        m = jnp.max(big)
        flat = jnp.min(jnp.where(big == m, flat_idx, jnp.int32(2**30)))
        sy = (flat // nxp + ly0).astype(jnp.float32)
        sx = (flat % nxp + lx0).astype(jnp.float32)
        sel = (onehot == b).astype(jnp.float32)
        s0y_row = s0y_row + sel * sy
        s0x_row = s0x_row + sel * sx

    # integer-shift phase twist, int32-exact (ops.correlate._us_dft_kernel
    # precision contract): ((f * s0) mod P) / P, centered to [-0.5, 0.5).
    # The twist field is rank-1 per cutout, so trig runs on the SMALL
    # factors only — (H, CB) for y, (1, CB*Wr) for x — and the y factor
    # is lane-expanded by one matmul against the block-indicator; a
    # first draft computed cos/sin on the full (H, CB*Wr) field and
    # that alone tripled the kernel's runtime (VPU transcendentals).
    s0x_blk = jnp.round(dot(s0x_row, expand_ref[:],
                            jax.lax.Precision.HIGHEST)).astype(jnp.int32)
    ty = jnp.mod(fy_ref[:] * s0y_row.astype(jnp.int32), H
                 ).astype(jnp.float32) / H              # (H, CB)
    tx = jnp.mod(fx_ref[:] * s0x_blk, W).astype(jnp.float32) / W
    ay = (2.0 * jnp.pi) * (ty - jnp.round(ty))          # (H, CB)
    ax = (2.0 * jnp.pi) * (tx - jnp.round(tx))          # (1, CB*Wr)
    exp = expand_ref[:]
    Dyr = dot(jnp.cos(ay), exp, jax.lax.Precision.HIGHEST)
    Dyi = dot(jnp.sin(ay), exp, jax.lax.Precision.HIGHEST)
    Dxr, Dxi = jnp.cos(ax), jnp.sin(ax)
    Tr = Dyr * Dxr - Dyi * Dxi
    Ti = Dyr * Dxi + Dyi * Dxr
    Gdr = Gwr * Tr - Gwi * Ti
    Gdi = Gwr * Ti + Gwi * Tr
    if _ablate == "twist":
        bail(jnp.sum(Gdr + Gdi, axis=1, keepdims=True)[:1])
        return

    # upsampled window: C2 = Re{K2y @ Gd @ K2xT_bd} (1/(HW) in K2xT)
    K2yr, K2yi = k2yr_ref[:], k2yi_ref[:]
    t2r = dot(K2yr, Gdr, _P_READOUT) - dot(K2yi, Gdi, _P_READOUT)
    t2i = dot(K2yr, Gdi, _P_READOUT) + dot(K2yi, Gdr, _P_READOUT)
    c2_ref[:, :] = (dot(t2r, k2xtr_ref[:], _P_READOUT)
                    - dot(t2i, k2xti_ref[:], _P_READOUT))
    # s0 block is (8, 128) — the minimum tile-aligned output block; the
    # two CB-wide rows of real payload are packed into row 0
    top = jnp.concatenate(
        [s0y_row, s0x_row,
         jnp.zeros((1, 128 - 2 * CB), jnp.float32)], axis=1)
    s0_ref[:, :] = jnp.concatenate(
        [top, jnp.zeros((7, 128), jnp.float32)], axis=0)


@functools.partial(
    jax.jit,
    static_argnames=("cc_type", "usfac", "nwin", "bounds",
                     "block_cutouts", "interpret", "_ablate"))
def measure_displacement_pallas(
    ref: jax.Array,
    img: jax.Array,
    ref_mask: jax.Array | None = None,
    img_mask: jax.Array | None = None,
    *,
    cc_type: str = "NCC",
    usfac: int,
    nwin: int,
    bounds: tuple[int, int, int, int],
    block_cutouts: int = 16,
    interpret: bool = False,
    _ablate: str = "",
):
    """Fused displacement measurement: one kernel from raw cutout pairs
    to the upsampled correlation window + coarse integer shifts.

    Equivalent to ``_cross_spectrum`` + ``_windowed_coarse_surface`` +
    argmax + ``_upsampled_correlation`` of
    :mod:`subpixal_tpu.ops.correlate` (reference ``subpixal/cc.py ·
    find_displacement``, SURVEY §3.4) with every intermediate —
    normalized cutouts, per-side spectra, cross-spectrum, coarse
    surface, twisted spectrum — VMEM-resident. Only the raw cutouts are
    read from HBM and only the ``(B, nwin, nwin)`` window plus the
    ``(B,)`` coarse shifts are written back.

    Returns ``(C2, s0y, s0x)``: the upsampled surface sampled at
    ``s0 + (i - nwin//2)/usfac`` per axis and the integer coarse shifts.
    """
    from ..ops.correlate import _dft_consts

    if cc_type not in ("CC", "NCC", "ZNCC"):
        raise ValueError(
            f"unknown cc_type: {cc_type!r} (expected 'CC'|'NCC'|'ZNCC')")
    B, H, W = ref.shape
    Wr = W // 2 + 1
    CB = max(1, min(int(block_cutouts), B))
    Bp = -(-B // CB) * CB
    nblk = Bp // CB

    C = _measure_consts(H, W, CB, usfac, nwin, bounds)
    CWS, CHS, _, _ = _dft_consts(H, W)

    def prep(a):
        a = jnp.asarray(a, jnp.float32)
        if Bp != B:
            a = jnp.pad(a, ((0, Bp - B), (0, 0), (0, 0)))
        return a.reshape(Bp * H, W)

    def prep_mask(m):
        if m is None:
            return None
        return prep(jnp.broadcast_to(m, (B, H, W)).astype(jnp.float32))

    blk = pl.BlockSpec((CB * H, W), lambda g: (g, 0),
                       memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [blk, blk]
    inputs = [prep(ref), prep(img)]
    rm, im = prep_mask(ref_mask), prep_mask(img_mask)
    for m in (rm, im):
        if m is not None:
            in_specs.append(blk)
            inputs.append(m)
    const_names = ("Kyr", "Kyi", "KxTr_bd", "KxTi_bd", "K2yr", "K2yi",
                   "K2xTr_bd", "K2xTi_bd", "wherm", "fy_col", "fx_row",
                   "expand", "ind", "indt")
    inputs += [jnp.asarray(CWS.T), jnp.asarray(CHS)]
    inputs += [jnp.asarray(C[k]) for k in const_names]
    in_specs += [full] * (2 + len(const_names))

    kern = functools.partial(
        _measure_kernel, H=H, W=W, Wr=Wr, CB=CB, cc_type=cc_type,
        has_rmask=rm is not None, has_imask=im is not None, C=C,
        _ablate=_ablate)
    out1, out2 = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((nblk * nwin, CB * nwin), jnp.float32),
            jax.ShapeDtypeStruct((nblk * 8, 128), jnp.float32),
        ],
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((nwin, CB * nwin), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((H, CB * Wr), jnp.float32),
            pltpu.VMEM((H, CB * Wr), jnp.float32),
        ],
        interpret=interpret,
    )(*inputs)
    C2 = (out1.reshape(nblk, nwin, CB, nwin)
          .transpose(0, 2, 1, 3).reshape(Bp, nwin, nwin)[:B])
    rows = out2.reshape(nblk, 8, 128)[:, 0, :]
    s0y = rows[:, :CB].reshape(Bp)[:B].astype(jnp.int32)
    s0x = rows[:, CB:2 * CB].reshape(Bp)[:B].astype(jnp.int32)
    return C2, s0y, s0x
