"""Restack-free fused displacement-measurement kernel (Pallas TPU).

One kernel measures the whole cutout batch: NCC statistics -> forward
matmul-DFT of both sides -> cross-spectrum -> windowed coarse argmax ->
upsampled matrix-DFT window. Capability parity with the reference's
``subpixal/cc.py · find_displacement`` measurement chain (SURVEY.md
§3.4); numerics match :mod:`subpixal_tpu.ops.correlate`'s XLA einsum
path (same DFT constants, same int32-exact phase arithmetic).

Why a third kernel (round 4) — and the post-mortem
--------------------------------------------------
The XLA path is HBM-bound: each einsum stage materializes its
``(B, H, 2Wr)``-class spectra, ~100 MB of inter-stage traffic per
500x64^2 batch against ~20 us of matmul work (docs/architecture.md
§Roofline). Two round-3 fusions lost to that path because their
layouts forced per-cutout Mosaic glue: ~2000 row-block->lane-block
restack copies and argmax extractions per batch at ~0.2 us each
(both deleted in round 4; ``git log -- subpixal_tpu/kernels/correlate.py``
keeps their post-mortems).

**Outcome (v5e, 2026-08-18, hardened dependent-loop median): this
third attempt ALSO loses — ~310-375 us/batch vs the XLA path's
~93 us — and is therefore OPT-IN (``SUBPIXAL_TPU_FUSED_MEASURE=1``),
kept as a numeric cross-check (<1e-6 px shift parity).** Stage
ablation of THIS kernel (each stage cut in turn, per-stage deltas):
forward DFTs ~160 us alone, every later stage +30-75 us, and block
sizes 8/16/24/32 land at 374/309/313/320 us — no VMEM cliff and no
single hot stage. The cost is structural: Mosaic issues each batched
``dot_general``/elementwise op with ~0.2 us of fixed overhead and
tiles rank-3 small-lane arrays (lanes 33-66 of 128) at 2-4x waste,
while XLA lane-packs the same contractions into flat
``(B*H, W) @ (W, N)`` matmuls and fuses ALL elementwise stages into
them, streaming at ~80 % of HBM bandwidth. The ~30 us a perfect
fusion could save (traffic 100 -> 17 MB) is far below Mosaic's
overhead floor for this op mix (many small contractions + tiny
reductions per item). Lesson recorded for future kernels: Pallas wins
here ONLY where the op is a large regular stencil/deposit (see
``kernels/blot.py``/``drizzle.py`` at 0.74-0.78 of speed-of-light),
not where XLA's fusion already rides the bandwidth roofline.

This kernel keeps every array **rank-3 with the cutout batch as the
leading (untiled) axis** — the layout the inputs already have — so
there is NO restack and NO per-cutout op of any kind:

* per-cutout contractions are **batched ``dot_general``** calls;
* per-cutout statistics ride **ones-vector matmuls** (the MXU does the
  lane reduction; a VPU ``sum(axis=(1,2))`` two-step was measured
  ~100 us/batch — and a single fused ``axis=(1, 2)`` reduction
  SIGABRTs Mosaic outright, both measured 2026-08-18);
* the integer-shift phase twist selects rows of a STATIC complex-twist
  table with a one-hot matmul (the coarse shift takes only ``ny``/
  ``nx`` integer values) and is absorbed into per-cutout upsampling
  read-out matrices — no per-cutout trig at all (an earlier variant
  computed ``cos/sin`` on ``(CB, H, 1)``-shaped operands: ~180
  us/batch, the kernel's single largest cost, for math a table lookup
  does exactly);
* the hermitian fold weights are folded into the static read-out
  constants (the x-side kernels' rows), never applied to G elementwise;
* the unmasked-NCC scale uses the moment identity
  ``P_dcfree = H*W*sum(x^2) - (sum x)^2`` (Parseval), so no spatial
  normalize pass touches the cutouts at all;
* the shared bf16 operand splits of the 3-pass ``Precision.HIGH``
  forward DFT are precomputed on host and passed in (per-block
  re-splits + f32 broadcasts measured ~50 us/batch).

Only the raw cutouts are read from HBM and only the ``(B, nwin, nwin)``
window plus the coarse shifts are written back: ~17 MB of traffic per
500x64^2 batch instead of ~100 MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["measure_displacement_rank3"]

_HIGHEST = jax.lax.Precision.HIGHEST
_DEFAULT = jax.lax.Precision.DEFAULT


def _consts(H, W, usfac, nwin, bounds):
    """Static f64->f32 DFT/read-out/twist constants.

    Same math as ``ops.correlate._us_dft_kernel`` at integer lags /
    static fractional taps; built in float64 then cast (difference vs
    the f32 trace-time build is ~1e-7). The hermitian fold weights are
    folded into the x-side read-out kernels (``KxT``/``K2xT`` rows).
    """
    Wr = W // 2 + 1
    r0, r1, c0, c1 = bounds
    ny, nx = r1 - r0, c1 - c0
    nyp = -(-ny // 8) * 8
    nxp = -(-nx // 8) * 8
    ly0, lx0 = r0 - H // 2, c0 - W // 2
    fy = np.round(np.fft.fftfreq(H) * H).astype(np.int64)
    fx = np.round(np.fft.fftfreq(W) * W).astype(np.int64)[:Wr]

    def kern(t, f, period):
        ang = 2.0 * np.pi * np.outer(t, f) / period
        return np.cos(ang) + 1j * np.sin(ang)

    wk = np.full((Wr,), 2.0, np.float64)
    wk[0] = 1.0
    if W % 2 == 0:
        wk[-1] = 1.0

    Ky = np.zeros((nyp, H), np.complex128)
    Ky[:ny] = kern(np.arange(ny) + ly0, fy, H)
    KxT = np.zeros((Wr, nxp), np.complex128)
    KxT[:, :nx] = kern(np.arange(nx) + lx0, fx, W).T
    KxT *= wk[:, None]
    tf = (np.arange(nwin) - nwin // 2) / usfac
    K2y = kern(tf, fy, H)
    K2xT = kern(tf, fx, W).T * wk[:, None] / (H * W)  # 1/(HW) folded in

    # integer-twist tables: row s = exp(2i pi (s + l0) f / period)
    TWY = kern(np.arange(nyp) + ly0, fy, H)            # (nyp, H)
    TWX = kern(np.arange(nxp) + lx0, fx, W)            # (nxp, Wr)

    f32 = lambda a: np.asarray(a, np.float32)  # noqa: E731
    return {
        "Kyr": f32(Ky.real), "Kyi": f32(Ky.imag),
        "KxTr": f32(KxT.real), "KxTi": f32(KxT.imag),
        "K2yr": f32(K2y.real), "K2yi": f32(K2y.imag),
        "K2xTr": f32(K2xT.real), "K2xTi": f32(K2xT.imag),
        "TWY": f32(np.concatenate([TWY.real, TWY.imag], axis=1)),
        # x table TRANSPOSED (2Wr, nxp): the x twist is built in column
        # form (CB, 2Wr, 1) by a broadcast-dot, no in-kernel transpose
        "TWX": f32(np.concatenate([TWX.real, TWX.imag], axis=1).T),
        "nyp": nyp, "nxp": nxp, "ny": ny, "nx": nx,
        "ly0": ly0, "lx0": lx0,
    }


def _split_bf16(m):
    hi = m.astype(jnp.bfloat16)
    lo = (m - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _kernel(ref_ref, img_ref, *rest, H, W, Wr, CB, cc_type, has_rmask,
            has_imask, fwd_mode, meta):
    idx = 0
    rmask_ref = imask_ref = None
    if has_rmask:
        rmask_ref = rest[idx]; idx += 1
    if has_imask:
        imask_ref = rest[idx]; idx += 1
    n_fwd = 4 if fwd_mode == "split3" else 2
    fwd_refs = rest[idx:idx + n_fwd]
    idx += n_fwd
    (kyr_ref, kyi_ref, kxtr_ref, kxti_ref,
     k2yr_ref, k2yi_ref, k2xtr_ref, k2xti_ref,
     twy_ref, twx_ref, ones_ref) = rest[idx:idx + 11]
    c2_ref, s0_ref = rest[idx + 11:idx + 13]

    nyp, nxp, ny, nx = meta["nyp"], meta["nxp"], meta["ny"], meta["nx"]
    ly0, lx0 = meta["ly0"], meta["lx0"]

    def dot_last(x3, m2, prec):
        """(CB, M, K) @ (K, N) -> (CB, M, N): contraction on the lanes."""
        return jax.lax.dot_general(
            x3, m2, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    def dot_b(m2, x3, prec):
        """broadcast (M, K) against (CB, K, N) -> (CB, M, N)."""
        m3 = jnp.broadcast_to(m2[None], (CB,) + m2.shape)
        return jax.lax.dot_general(
            m3, x3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec)

    def dot_bb(a3, b3, prec):
        """batched (CB, M, K) @ (CB, K, N) -> (CB, M, N)."""
        return jax.lax.dot_general(
            a3, b3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=prec)

    def fwd(a):
        """forward DFT of one side: (CB, H, W) -> (CB, 2H, 2Wr)."""
        if fwd_mode == "split3":
            cwh_ref, cwl_ref, chh_ref, chl_ref = fwd_refs
            ah, al = _split_bf16(a)
            X = (dot_last(ah, cwh_ref[:], _DEFAULT)
                 + dot_last(ah, cwl_ref[:], _DEFAULT)
                 + dot_last(al, cwh_ref[:], _DEFAULT))
            xh, xl = _split_bf16(X)
            mh = jnp.broadcast_to(chh_ref[:][None], (CB, 2 * H, H))
            ml = jnp.broadcast_to(chl_ref[:][None], (CB, 2 * H, H))

            def d(m3, x3):
                return jax.lax.dot_general(
                    m3, x3, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                    precision=_DEFAULT)

            return d(mh, xh) + d(mh, xl) + d(ml, xh)
        cws_ref, chs_ref = fwd_refs
        prec = _HIGHEST if fwd_mode == "highest" else _DEFAULT
        X = dot_last(a, cws_ref[:], prec)
        return dot_b(chs_ref[:], X, prec)

    def stat2(a):
        """(sum a, sum a^2) over (H, W) per cutout, via ones-matmuls.

        MXU lane reduction + an 8-sublane VPU fold: measured ~8x
        cheaper than the two-step VPU reduction over (CB, H, W).
        """
        ones = ones_ref[:]                              # (W, 8) f32
        both = jnp.concatenate([a, a * a], axis=1)      # (CB, 2H, W)
        d = dot_last(both, ones, _DEFAULT)              # exact: 0/1 wts
        s1 = jnp.sum(d[:, :H, :1], axis=1, keepdims=True)
        s2 = jnp.sum(d[:, H:, :1], axis=1, keepdims=True)
        return s1, s2

    spectral = cc_type in ("NCC", "ZNCC") and not (has_rmask or has_imask)

    def side(x_ref, m_ref):
        """One side -> (Y (CB, 2H, 2Wr), dc_free_power or None)."""
        a = x_ref[:]
        if m_ref is not None:
            a = a * m_ref[:]
        dcf = None
        if spectral:
            # moment identity: sum_k w_k |X_k|^2 - X_00^2
            #   == H*W*sum(x^2) - (sum x)^2   (Parseval)
            tot, sq = stat2(a)
            dcf = jnp.float32(H * W) * sq - tot * tot    # (CB, 1, 1)
        elif cc_type in ("NCC", "ZNCC"):
            # masked spatial normalize == ops.correlate._normalize
            if m_ref is None:
                m = jnp.ones_like(a)
                n = jnp.full((a.shape[0], 1, 1), float(H * W), jnp.float32)
                msum, _ = stat2(a)
            else:
                m = m_ref[:].astype(jnp.float32)
                nsum, _ = stat2(m)
                n = jnp.maximum(nsum, 1.0)
                msum, _ = stat2(a)
            d = (a - msum / n) * m
            _, var_n = stat2(d)
            a = d * jax.lax.rsqrt(jnp.maximum(var_n / n, 1e-20) * n)
        return fwd(a), dcf

    Q_r, dcf_r = side(ref_ref, rmask_ref)
    Q_i, dcf_i = side(img_ref, imask_ref)
    Rr, Ri = Q_r[:, :H, :Wr] - Q_r[:, H:, Wr:], Q_r[:, :H, Wr:] + Q_r[:, H:, :Wr]
    Ir, Ii = Q_i[:, :H, :Wr] - Q_i[:, H:, Wr:], Q_i[:, :H, Wr:] + Q_i[:, H:, :Wr]

    # cross-spectrum G = F(img) * conj(F(ref)); the hermitian fold
    # weights live in the static KxT/K2xT rows
    Gr = Ir * Rr + Ii * Ri
    Gi = Ii * Rr - Ir * Ri
    if spectral:
        # both means subtracted => the DC bin (0, 0) vanishes exactly
        # (matches ops.correlate._spectral_ncc_product)
        u3 = jax.lax.broadcasted_iota(jnp.int32, Gr.shape, 1)
        v3 = jax.lax.broadcasted_iota(jnp.int32, Gr.shape, 2)
        Gr = jnp.where((u3 == 0) & (v3 == 0), 0.0, Gr)

    # windowed coarse lags: Cc = Re{Ky @ G @ KxT_w}. DEFAULT precision:
    # the surface only feeds an argmax, and neighbor-lag contrast on
    # real correlation peaks is far above bf16 resolution.
    tr = (dot_b(kyr_ref[:], Gr, _DEFAULT)
          - dot_b(kyi_ref[:], Gi, _DEFAULT))             # (CB, nyp, Wr)
    ti = (dot_b(kyr_ref[:], Gi, _DEFAULT)
          + dot_b(kyi_ref[:], Gr, _DEFAULT))
    Cc = (dot_last(tr, kxtr_ref[:], _DEFAULT)
          - dot_last(ti, kxti_ref[:], _DEFAULT))         # (CB, nyp, nxp)

    # per-cutout coarse argmax (first-index tie-break, padding masked)
    ri = jax.lax.broadcasted_iota(jnp.int32, Cc.shape, 1)
    ci = jax.lax.broadcasted_iota(jnp.int32, Cc.shape, 2)
    valid = (ri < ny) & (ci < nx)
    big = jnp.where(valid, Cc, -jnp.inf)
    mx = jnp.max(jnp.max(big, axis=2, keepdims=True), axis=1,
                 keepdims=True)
    flat = jnp.where(big >= mx, ri * nxp + ci, jnp.int32(2 ** 30))
    flat = jnp.min(jnp.min(flat, axis=2, keepdims=True), axis=1,
                   keepdims=True)                        # (CB, 1, 1)
    sy = flat // nxp                                     # box-relative
    sx = flat % nxp

    # integer-shift phase twist: one-hot select the static twist-table
    # row (the coarse shift takes only ny/nx values — no trig), then
    # absorb it into per-cutout complex read-out matrices:
    #   C2 = Re{(K2y diag(Dy)) @ G @ (diag(Dx) K2xT)}
    iy = jax.lax.broadcasted_iota(jnp.int32, (CB, 1, nyp), 2)
    ohy = (iy == sy).astype(jnp.float32)
    Dy = dot_last(ohy, twy_ref[:], _HIGHEST)             # (CB, 1, 2H)
    Dyr, Dyi = Dy[:, :, :H], Dy[:, :, H:]
    # the x twist is built directly in COLUMN form (CB, 2Wr, 1) — a
    # broadcast-dot against the transposed table, no in-kernel transpose
    ix = jax.lax.broadcasted_iota(jnp.int32, (CB, nxp, 1), 1)
    ohx = (ix == sx).astype(jnp.float32)                 # (CB, nxp, 1)
    DxT = dot_b(twx_ref[:], ohx, _HIGHEST)               # (CB, 2Wr, 1)
    DxrT, DxiT = DxT[:, :Wr], DxT[:, Wr:]
    if spectral:
        # unmasked-NCC scale rides the x twist (the coarse argmax above
        # never saw it — scale-invariant)
        n = jnp.float32(H * W)
        scale = (n * jax.lax.rsqrt(jnp.maximum(dcf_r, 1e-20))
                 * jax.lax.rsqrt(jnp.maximum(dcf_i, 1e-20)))
        DxrT = DxrT * scale
        DxiT = DxiT * scale
    # A = K2y * Dy (complex, (CB, nwin, H)); B = Dx * K2xT ((CB, Wr, nwin))
    Ar = k2yr_ref[:][None] * Dyr - k2yi_ref[:][None] * Dyi
    Ai = k2yr_ref[:][None] * Dyi + k2yi_ref[:][None] * Dyr
    Br = k2xtr_ref[:][None] * DxrT - k2xti_ref[:][None] * DxiT
    Bi = k2xtr_ref[:][None] * DxiT + k2xti_ref[:][None] * DxrT

    # upsampled window: C2 = Re{A @ G @ B}
    t2r = dot_bb(Ar, Gr, _HIGHEST) - dot_bb(Ai, Gi, _HIGHEST)
    t2i = dot_bb(Ar, Gi, _HIGHEST) + dot_bb(Ai, Gr, _HIGHEST)
    c2_ref[:] = dot_bb(t2r, Br, _HIGHEST) - dot_bb(t2i, Bi, _HIGHEST)

    # coarse shifts: (CB, 128) f32, s0y in column 0, s0x in column 1
    s0y = sy + ly0
    s0x = sx + lx0
    col = jax.lax.broadcasted_iota(jnp.int32, (CB, 128), 1)
    s0y2 = jnp.broadcast_to(s0y[:, :, 0].astype(jnp.float32), (CB, 128))
    s0x2 = jnp.broadcast_to(s0x[:, :, 0].astype(jnp.float32), (CB, 128))
    s0_ref[:] = jnp.where(col == 0, s0y2,
                          jnp.where(col == 1, s0x2, 0.0))


@functools.partial(
    jax.jit,
    static_argnames=("cc_type", "usfac", "nwin", "bounds",
                     "block_cutouts", "interpret"))
def measure_displacement_rank3(
    ref: jax.Array,
    img: jax.Array,
    ref_mask: jax.Array | None = None,
    img_mask: jax.Array | None = None,
    *,
    cc_type: str = "NCC",
    usfac: int,
    nwin: int,
    bounds: tuple[int, int, int, int],
    block_cutouts: int = 8,
    interpret: bool = False,
):
    """Fused displacement measurement, restack-free rank-3 layout.

    Equivalent to ``_cross_spectrum`` + ``_windowed_coarse_surface`` +
    argmax + ``_upsampled_correlation`` of
    :mod:`subpixal_tpu.ops.correlate` (reference ``subpixal/cc.py ·
    find_displacement``, SURVEY §3.4). Returns ``(C2, s0y, s0x)``: the
    ``(B, nwin, nwin)`` upsampled window sampled at
    ``s0 + (i - nwin//2)/usfac`` per axis, and the integer coarse
    shifts.
    """
    from ..ops.correlate import _P_FWD, _dft_consts

    if cc_type not in ("CC", "NCC", "ZNCC"):
        raise ValueError(
            f"unknown cc_type: {cc_type!r} (expected 'CC'|'NCC'|'ZNCC')")
    B, H, W = ref.shape
    Wr = W // 2 + 1
    # the (CB, 128) coarse-shift output block requires CB % 8 == 0
    # (Mosaic sublane tiling); 8 is also the measured optimum on v5e —
    # 16+ spills VMEM into a ~500x slowdown, so clamp hard
    CB = max(8, min(-(-int(block_cutouts) // 8) * 8, -(-B // 8) * 8))
    Bp = -(-B // CB) * CB
    nblk = Bp // CB

    spectral = (cc_type in ("NCC", "ZNCC")
                and ref_mask is None and img_mask is None)
    C = _consts(H, W, usfac, nwin, bounds)
    CWS, CHS = _dft_consts(H, W)[:2]

    if _P_FWD is jax.lax.Precision.HIGHEST:
        fwd_mode, fwd_consts = "highest", [jnp.asarray(CWS.T),
                                           jnp.asarray(CHS)]
    elif _P_FWD is jax.lax.Precision.DEFAULT:
        fwd_mode, fwd_consts = "default", [jnp.asarray(CWS.T),
                                           jnp.asarray(CHS)]
    else:
        # Precision.HIGH: manual 3-pass bf16 (Mosaic rejects HIGH);
        # the SHARED operand splits are precomputed here — re-splitting
        # + f32-broadcasting them per block measured ~50 us/batch
        cwh, cwl = _split_bf16(jnp.asarray(CWS.T))
        chh, chl = _split_bf16(jnp.asarray(CHS))
        fwd_mode, fwd_consts = "split3", [cwh, cwl, chh, chl]

    def prep(a):
        a = jnp.asarray(a, jnp.float32)
        if Bp != B:
            a = jnp.pad(a, ((0, Bp - B), (0, 0), (0, 0)))
        return a

    def prep_mask(m):
        if m is None:
            return None
        return prep(jnp.broadcast_to(m, (B, H, W)).astype(jnp.float32))

    blk = pl.BlockSpec((CB, H, W), lambda g: (g, 0, 0),
                       memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [blk, blk]
    inputs = [prep(ref), prep(img)]
    rm, im = prep_mask(ref_mask), prep_mask(img_mask)
    for m in (rm, im):
        if m is not None:
            in_specs.append(blk)
            inputs.append(m)
    inputs += fwd_consts
    const_names = ("Kyr", "Kyi", "KxTr", "KxTi", "K2yr", "K2yi",
                   "K2xTr", "K2xTi", "TWY", "TWX")
    inputs += [jnp.asarray(C[k]) for k in const_names]
    ones = np.zeros((W, 8), np.float32)
    ones[:, 0] = 1.0
    inputs.append(jnp.asarray(ones))
    in_specs += [full] * (len(fwd_consts) + len(const_names) + 1)

    kern = functools.partial(
        _kernel, H=H, W=W, Wr=Wr, CB=CB, cc_type=cc_type,
        has_rmask=rm is not None, has_imask=im is not None,
        fwd_mode=fwd_mode, meta=C)
    C2, s0 = pl.pallas_call(
        kern,
        out_shape=[
            jax.ShapeDtypeStruct((Bp, nwin, nwin), jnp.float32),
            jax.ShapeDtypeStruct((Bp, 128), jnp.float32),
        ],
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((CB, nwin, nwin), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CB, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(*inputs)
    s0y = s0[:B, 0].astype(jnp.int32)
    s0x = s0[:B, 1].astype(jnp.int32)
    return C2[:B], s0y, s0x
