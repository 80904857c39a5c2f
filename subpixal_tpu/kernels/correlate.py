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

__all__ = ["cross_spectrum_pallas"]

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
