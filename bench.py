"""Benchmark: batched cutout cross-correlation throughput + shift RMSE.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "cc/s", "vs_baseline": N, ...}

Workload = BASELINE configs 2+3: a 500-source catalog of 64x64 cutout
pairs with planted subpixel shifts; each pair is measured with NCC
cross-correlation, 10x Fourier-domain upsampling and a Gaussian surface
peak fit.

vs_baseline compares the TPU batched path against a faithful serial numpy
implementation of the reference's per-pair algorithm (subpixal/cc.py:
fft2 -> conj-multiply -> ifft2 -> upsampled matrix-DFT -> quadratic/log
peak fit), timed on this host's CPU. The reference publishes no numbers
(BASELINE.md), so its algorithm re-timed on CPU is the baseline.
"""

import json
import time

import numpy as np


# --------------------------------------------------------------------- #
# workload
# --------------------------------------------------------------------- #
def make_workload(B=500, h=64, w=64, seed=0, sigma=2.0, noise=1e-3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    dxs = rng.uniform(-0.5, 0.5, B)
    dys = rng.uniform(-0.5, 0.5, B)
    ref = np.exp(-((xx - w / 2) ** 2 + (yy - h / 2) ** 2) / (2 * sigma**2))
    refs = (ref[None] + rng.normal(0, noise, (B, h, w))).astype(np.float32)
    imgs = np.exp(
        -((xx[None] - w / 2 - dxs[:, None, None]) ** 2
          + (yy[None] - h / 2 - dys[:, None, None]) ** 2) / (2 * sigma**2)
    )
    imgs = (imgs + rng.normal(0, noise, (B, h, w))).astype(np.float32)
    return refs, imgs, dxs, dys


# --------------------------------------------------------------------- #
# serial numpy reference (the subpixal algorithm, per pair)
# --------------------------------------------------------------------- #
def _np_find_displacement(ref, img, usfac=10, kfit=5):
    """One pair, reference-style: NCC + FFT + upsampled DFT + peak fit."""
    h, w = ref.shape

    def norm(a):
        a = a.astype(np.float64)
        a = a - a.mean()
        s = a.std()
        return a / (s * np.sqrt(a.size) + 1e-30)

    r = norm(ref)
    i = norm(img)
    Fr = np.fft.fft2(r)
    Fi = np.fft.fft2(i)
    G = Fi * np.conj(Fr)
    cc = np.fft.ifft2(G).real
    cc_s = np.fft.fftshift(cc)
    py, px = np.unravel_index(np.argmax(cc_s), cc_s.shape)
    s0y, s0x = py - h // 2, px - w // 2

    # matrix-DFT upsampling around the coarse peak (Guizar-Sicairos style)
    n = usfac + kfit + 3
    fy = np.fft.fftfreq(h) * h
    fx = np.fft.fftfreq(w) * w
    ty = s0y + (np.arange(n) - n // 2) / usfac
    tx = s0x + (np.arange(n) - n // 2) / usfac
    kr = np.exp(2j * np.pi * np.outer(ty, fy) / h)
    kc = np.exp(2j * np.pi * np.outer(fx, tx) / w)
    C = (kr @ G @ kc).real / (h * w)

    # quadratic fit on log surface around the argmax
    qy, qx = np.unravel_index(np.argmax(C), C.shape)
    k = kfit
    y0 = min(max(qy - k // 2, 0), n - k)
    x0 = min(max(qx - k // 2, 0), n - k)
    box = C[y0:y0 + k, x0:x0 + k]
    bmax = box.max()
    z = np.log(np.clip(box / bmax, 1e-8, None))
    wts = np.clip(box / bmax, 0, 1).ravel()
    c = (k - 1) / 2.0
    gy, gx = np.mgrid[0:k, 0:k].astype(np.float64)
    X = np.stack([np.ones(k * k), (gx - c).ravel(), (gy - c).ravel(),
                  ((gx - c) ** 2).ravel(), ((gx - c) * (gy - c)).ravel(),
                  ((gy - c) ** 2).ravel()], 1)
    A = X * wts[:, None]
    coef, *_ = np.linalg.lstsq(A, z.ravel() * wts, rcond=None)
    c0, c1, c2, c3, c4, c5 = coef
    det = 4 * c3 * c5 - c4 * c4
    if det > 0 and c3 < 0:
        sx = (-2 * c5 * c1 + c4 * c2) / det
        sy = (c4 * c1 - 2 * c3 * c2) / det
    else:
        sx = sy = 0.0
    ux = x0 + c + sx
    uy = y0 + c + sy
    dx = s0x + (ux - n // 2) / usfac
    dy = s0y + (uy - n // 2) / usfac
    return dx, dy


def bench_cpu_reference(refs, imgs, n_pairs=200, repeats=5):
    """Serial-numpy baseline rate: BEST of ``repeats`` timed passes over
    ``n_pairs`` pairs. A single 40-pair pass drifted ~15% between rounds
    and even a median-of-3 swung 2x when this (single-core, shared)
    host was busy — the max is the honest capability number and the one
    robust to one-sided slowdown noise (VERDICT r2 weak #6)."""
    out = []
    rates = []
    for rep in range(repeats):
        t0 = time.perf_counter()
        res = [_np_find_displacement(refs[b], imgs[b])
               for b in range(n_pairs)]
        rates.append(n_pairs / (time.perf_counter() - t0))
        if rep == 0:
            out = res
    return float(np.max(rates)), np.asarray(out)


def _dev_time_per_iter(make_loop, iters=(1, 21)):
    """Honest device time per iteration.

    ``make_loop(k)`` must return a one-scalar-argument function running
    the op k times in a *dependent* ``lax.fori_loop`` that folds both the
    scalar and the previous iteration's output into the next input.

    Three defenses, all required on remoted/tunneled runtimes where
    naive timing reports fantasy numbers:
    - dependent loop inside ONE jit → defeats dispatch pipelining and
      measures device compute, not per-call relay round-trips;
    - differencing two loop lengths → subtracts fixed dispatch/sync cost;
    - a DISTINCT scalar argument on every invocation → defeats
      result-caching of repeated identical calls.
    """
    import jax
    import numpy as _np

    fs = {k: jax.jit(make_loop(k)) for k in iters}
    seed = 0.0
    for k in iters:  # compile + warm
        jax.block_until_ready(fs[k](_np.float32(seed)))
        seed += 1.0
    deltas = []
    for _ in range(5):
        ts = {}
        for k in iters:
            arg = _np.float32(seed)
            seed += 1.0
            t0 = time.perf_counter()
            jax.block_until_ready(fs[k](arg))
            ts[k] = time.perf_counter() - t0
        k0, k1 = iters
        deltas.append((ts[k1] - ts[k0]) / (k1 - k0))
    # MEDIAN of the positive deltas. Min-of-5 was the r2 convention
    # ("contention is one-sided") but it is wrong in the other
    # direction: both loop lengths carry the SAME ~65 ms fixed
    # dispatch/relay cost, and a few ms of jitter on the SHORT run
    # deflates the delta — at ~30 us/iter a 3 ms t_1 overshoot wipes
    # the whole signal, and min() then selects exactly that corrupted
    # sample (observed 2026-08-18: 48.5M cc/s "measured" = 90% MFU on
    # the logical count, i.e. >600 TF/s physical through the 3-pass
    # bf16 path — 3x the MXU peak, physically impossible; drizzle
    # likewise read 1.125x its speed-of-light bound). The median is
    # robust to both one-sided contention AND one-sided jitter
    # deflation; callers also size k1 so the differenced signal
    # (k1*dt) is >> dispatch jitter.
    pos = sorted(d for d in deltas if d > 0)
    return pos[len(pos) // 2] if pos else ts[k1] / k1


def _displacement_flops(B, H, W, usfac=10, peak_fit_box=5):
    """(logical, physical) FLOPs of one NCC + windowed-coarse +
    usfac-upsampled displacement batch (matches bench_tpu's call).

    Logical counts each real MAC once; physical multiplies by the
    bf16-emulation pass count of the precision tier actually used
    (fwd Precision.HIGH = 3 passes, read-out HIGHEST = 6) — the MXU
    executes the physical count, so `mfu_physical_pct` is the true
    utilization while `mfu_pct` stays the algorithm-efficiency figure.
    """
    from subpixal_tpu.ops.peaks import normalize_search_box

    Wr = W // 2 + 1
    r0, r1, c0, c1 = normalize_search_box("fitbox", H, W, peak_fit_box)
    ny, nx = r1 - r0, c1 - c0
    nwin = -(-(usfac + peak_fit_box + 1) // 8) * 8
    # forward stacked matmul-DFT, both sides: W-pass (B*H, W) @ (W, 2Wr)
    # + H-pass (2H, H) @ (H, 2Wr) per cutout
    fwd = 2 * (B * H * W * 2 * Wr + B * 2 * H * H * 2 * Wr)
    # windowed coarse: complex (ny, H) @ (H, Wr) per cutout (4 real
    # matmuls) + real read-out (ny, Wr) @ (Wr, nx) x 2
    ro = B * (4 * ny * H * Wr + 2 * ny * Wr * nx)
    # upsampled window: complex (nwin, H) @ (H, Wr) + read-out
    ro += B * (4 * nwin * H * Wr + 2 * nwin * Wr * nwin)
    # elementwise (spectral-NCC scale, phase twist, fold weights)
    ew = B * H * Wr * 24
    logical = 2.0 * (fwd + ro) + ew
    # physical pass counts follow the SAME precision knobs correlate.py
    # traces with — hardcoding 3x/6x would misreport mfu_physical by
    # 2-6x under SUBPIXAL_TPU_{FWD,READOUT}_PRECISION overrides
    import jax

    from subpixal_tpu.ops.correlate import _P_FWD, _P_READOUT

    passes = {jax.lax.Precision.DEFAULT: 1, jax.lax.Precision.HIGH: 3,
              jax.lax.Precision.HIGHEST: 6}
    physical = 2.0 * (passes[_P_FWD] * fwd + passes[_P_READOUT] * ro) + ew
    return logical, physical


def bench_tpu(refs, imgs, dxs, dys):
    import jax
    import jax.numpy as jnp

    from subpixal_tpu.ops.correlate import find_displacement

    f = jax.jit(lambda r, i: find_displacement(
        r, i, cc_type="NCC", usfac=10, fit_type="gaussian"))
    r_j = jnp.asarray(refs)
    i_j = jnp.asarray(imgs)
    compiled = f.lower(r_j, i_j).compile()
    out = compiled(r_j, i_j)
    jax.block_until_ready(out)
    # ANALYTIC logical-FLOP count of the displacement algorithm, for the
    # MFU figure (denominator: v5e bf16 MXU peak 197 TF/s). Analytic
    # instead of XLA cost_analysis so the number is path-independent:
    # custom calls (Pallas) report 0 flops to cost_analysis, and XLA's
    # estimate shifts with fusion choices — a kernel swap would silently
    # move the metric. Counted (real MACs x 2, logical not
    # emulation-pass flops): forward matmul-DFT of both sides, the
    # windowed-coarse and upsampled-window complex contractions.
    flops, flops_phys = _displacement_flops(*r_j.shape)

    def make_loop(k):
        def run(seed):
            def body(_, carry):
                s, _ = carry
                # constant offset: numerically visible, NCC-invariant
                d = find_displacement(
                    r_j + (s * 1e-12 + seed * 1e-6), i_j, cc_type="NCC",
                    usfac=10, fit_type="gaussian")
                return (jnp.sum(d.dx), d.dx[0])
            return jax.lax.fori_loop(
                0, k, body, (jnp.float32(0), jnp.float32(0)))[1]
        return run

    # 1001 iterations: ~30 us/iter x 1000 = ~30 ms of differenced
    # signal, comfortably above the few-ms dispatch jitter (see
    # _dev_time_per_iter's median note)
    dt = _dev_time_per_iter(make_loop, iters=(1, 1001))
    ex = np.asarray(out.dx) - dxs
    ey = np.asarray(out.dy) - dys
    rmse_mpix = 1e3 * float(np.sqrt(np.mean(ex**2 + ey**2)))
    dxy = np.stack([np.asarray(out.dx), np.asarray(out.dy)], 1)
    mfu = (round(100.0 * flops / dt / 197e12, 3)
           if flops else None)
    mfu_phys = (round(100.0 * flops_phys / dt / 197e12, 3)
                if flops_phys else None)
    return refs.shape[0] / dt, rmse_mpix, dxy, mfu, mfu_phys


# Speed-of-light throughput estimates for the kernel roofline fractions
# (docs/architecture.md §Roofline, v5e): blot poly5 ≈ 4 µs MXU matmul +
# 5 µs VPU band build per 64² cutout → ~440 Mpix/s ceiling; drizzle
# square ≈ 0.87 ms matmul + 0.19 ms tile RMW + band build per 1024²
# frame → ~806 Mpix/s ceiling. Emitted as achieved/SoL fractions so a
# kernel perf regression is machine-visible in BENCH_r*.json, not only
# prose-visible (VERDICT r2 task 10).
BLOT_SOL_MPIX_S = 440.0
DRIZZLE_SOL_MPIX_S = 806.0


def bench_align_parity_ref():
    """XLA-path single-iteration align on the smoke scene — the
    reference half of the Pallas-vs-XLA parity gate (VERDICT r2 task 8).

    Runs BEFORE any Mosaic compile in this process (compile-order rule:
    XLA compiles issued after Pallas work intermittently stall minutes
    on the tunneled runtime). Returns the per-exposure first-iteration
    fitted shifts, compared later against ``bench_align_smoke``'s
    Pallas first iteration on the identical scene.
    """
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        return None
    from subpixal_tpu.align import align_images
    from subpixal_tpu.testing import simulate_stack

    exps, _ = simulate_stack(n_exp=8, shape=(1024, 1024), n_stars=60,
                             seed=11)
    res = align_images(exposures=exps, fitgeom="shift", max_iterations=1,
                       eps_shift=1e-7, usfac=8, fit_type="gaussian",
                       use_pallas=False)
    return np.asarray([r.shift for r in res.history[0]])


def bench_kernels():
    """Pallas blot/drizzle kernel throughput (TPU only; see SURVEY §2a).

    Runs AFTER every pure-XLA compile in this process — on the tunneled
    runtime the first XLA compile issued after a Mosaic compile stalls
    for minutes (see .claude/skills/verify/SKILL.md).
    """
    import jax
    import jax.numpy as jnp

    if jax.default_backend() not in ("tpu", "axon"):
        return {}
    from subpixal_tpu.kernels.blot import sample_cutouts_pallas
    from subpixal_tpu.kernels.drizzle import drizzle_deposit_pallas

    rng = np.random.default_rng(3)
    H = W = 1024
    img = jnp.asarray(rng.random((H, W)).astype(np.float32))
    B, h, w = 500, 64, 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cx = jnp.asarray((xx[None] + rng.uniform(3, W - 80, B)[:, None, None]
                      ).astype(np.float32))
    cy = jnp.asarray((yy[None] + rng.uniform(3, H - 80, B)[:, None, None]
                      ).astype(np.float32))
    gx = jnp.asarray(np.mgrid[0:H, 0:W][1].astype(np.float32) + 0.3)
    gy = jnp.asarray(np.mgrid[0:H, 0:W][0].astype(np.float32) + 0.2)
    from subpixal_tpu.kernels.drizzle import required_tile

    driz_tile = required_tile(np.asarray(gx), np.asarray(gy))

    def blot_loop(k):
        def run(seed):
            def body(_, s):
                v, _ok = sample_cutouts_pallas(
                    img, cx + (s * 1e-20 + seed * 1e-6), cy,
                    interp="poly5", tile=(80, 128))
                return jnp.sum(v) * 1e-12
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return run

    def driz_loop(k):
        def run(seed):
            def body(_, s):
                sci, _w = drizzle_deposit_pallas(
                    img, None, gx + (s * 1e-20 + seed * 1e-6), gy,
                    (H, W), tile=driz_tile)
                return jnp.sum(sci) * 1e-12
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return run

    dt_b = _dev_time_per_iter(blot_loop, iters=(1, 41))
    dt_d = _dev_time_per_iter(driz_loop, iters=(1, 61))
    blot_rate = B * h * w / dt_b / 1e6
    driz_rate = H * W / dt_d / 1e6
    return {
        "pallas_blot_poly5_mpix_per_s": round(blot_rate, 1),
        "pallas_drizzle_mpix_per_s": round(driz_rate, 1),
        # achieved / speed-of-light (see BLOT_SOL_MPIX_S above)
        "pallas_blot_sol_frac": round(blot_rate / BLOT_SOL_MPIX_S, 3),
        "pallas_drizzle_sol_frac": round(driz_rate / DRIZZLE_SOL_MPIX_S,
                                         3),
    }


def _iter_ms_diff(run, reps=3, counts=(4, 12)):
    """Median-differenced per-iteration ms for an align runner.

    A single entry's wall (dispatch + device loop + history fetch) is
    polluted by the tunneled relay's random 0.2-200 s fetch stall
    (verify SKILL "post-Pallas stall"), which round-4 numbers
    inherited. Repeating the align at two iteration counts and
    differencing the MINIMUM walls cancels the fixed per-entry
    overhead at its floor and rejects the stall outliers (a median of
    3 was still polluted when 2 of 3 walls caught the slow phase —
    observed 54 ms/iter reported where the xplane device trace showed
    16.6). Validated against the device trace 2026-08-20: 16.3
    reported vs 16.6/16.9 device ms/iter on the replicated/spatial
    8x1024² smoke.
    """

    def wall(res):
        return sum(r[0].iter_s for r in res.history)

    lo, hi = counts
    w_lo = [wall(run(lo)) for _ in range(reps)]
    w_hi = [wall(run(hi)) for _ in range(reps)]
    return 1e3 * float(np.min(w_hi) - np.min(w_lo)) / (hi - lo)


def bench_align_smoke(parity_ref=None):
    """Full use_pallas align smoke on the real chip (SURVEY §3.1 hot loop;
    VERDICT r1 item 5): an 8-frame 1024² scene, 4 device iterations.

    Asserts the planted shifts are recovered (<10 mpix pairwise) and
    emits ms/iter (host-loop step time incl. the ~relay round trip, same
    definition as ImageAlignInfo.iter_s) + setup seconds. Runs LAST:
    Mosaic compiles must follow every pure-XLA compile in the process.

    ``parity_ref``: first-iteration shifts from the pure-XLA run on the
    identical scene (``bench_align_parity_ref``) — the comparison is the
    on-hardware Pallas-vs-XLA assertion gate (`align_parity_ok`): a
    Mosaic regression that degrades ACCURACY (not speed) flips the
    boolean even when timings look healthy.
    """
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        return {}
    from subpixal_tpu.align import align_images
    from subpixal_tpu.testing import pairwise_shift_errors, simulate_stack

    exps, planted = simulate_stack(n_exp=8, shape=(1024, 1024),
                                   n_stars=60, seed=11)
    # eps_shift pinned tiny so exactly max_iterations device iterations
    # run — align_iter_ms then amortizes the single host sync over a
    # fixed count instead of varying with convergence speed
    res = align_images(exposures=exps, fitgeom="shift", max_iterations=4,
                       eps_shift=1e-7,
                       usfac=8, fit_type="gaussian", use_pallas=True)
    err_mpix = 1e3 * pairwise_shift_errors(res.shifts, planted)
    assert err_mpix < 10.0, f"align smoke fit error {err_mpix:.2f} mpix"
    out = {
        "align_fit_err_mpix": round(err_mpix, 3),
        "align_setup_s": round(res.setup_s, 2),
        # machine-visible per-stage breakdown (VERDICT r2 task 2): the
        # three historically dominant stages + whatever else is >0.25 s
        "align_setup_breakdown": {
            k: round(v, 2) for k, v in
            (res.setup_breakdown or {}).items()
            if isinstance(v, float) and
            (v > 0.25 or k in ("resample_execute", "cutout_pixmaps",
                               "frame_pixmaps"))
        },
        "align_n_iterations": res.n_iterations,
    }
    if parity_ref is not None:
        first = np.asarray([r.shift for r in res.history[0]])
        dmax = float(np.abs(first - parity_ref).max())
        out["align_parity_max_dpix"] = round(dmax, 6)
        out["align_parity_ok"] = bool(dmax < 1e-3)
        assert out["align_parity_ok"], (
            f"Pallas-vs-XLA first-iteration shifts differ by {dmax:.2e} "
            "px on hardware")
    # device-scene variant of the SAME smoke: frames rendered on device
    # (zero exposure H2D), so setup_s here is the framework's own cost —
    # the host-scene number above additionally ships 32 MB of novel
    # pixels through the dev tunnel at its measured 2-6 MB/s (production
    # PCIe hosts pay ~10 ms for that). VERDICT r2 task 2's <2 s warm
    # target is judged against this number.
    exps_d, planted_d = simulate_stack(n_exp=8, shape=(1024, 1024),
                                       n_stars=60, seed=11, device=True)
    res_d = align_images(exposures=exps_d, fitgeom="shift",
                         max_iterations=4, eps_shift=1e-7, usfac=8,
                         fit_type="gaussian", use_pallas=True)
    err_d = 1e3 * pairwise_shift_errors(res_d.shifts, planted_d)
    assert err_d < 10.0, f"device-scene smoke fit error {err_d:.2f} mpix"
    out["align_setup_device_s"] = round(res_d.setup_s, 2)
    out["align_iter_ms"] = round(_iter_ms_diff(
        lambda it: align_images(exposures=exps_d, fitgeom="shift",
                                max_iterations=it, eps_shift=1e-7,
                                usfac=8, fit_type="gaussian",
                                use_pallas=True)), 1)
    return out


def bench_align_2k():
    """Mosaic-scale align smoke: 4×2048² frames, 40 sources.

    At this scale the sparse in-loop deposit engages (the cutout blot
    windows cover a small fraction of the frame), so the per-iteration
    device cost reflects the covered area, not the full mosaic — the
    regime real HST/JWST stacks live in. Emits the live-block fraction
    alongside the iteration time.
    """
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        return {}
    from subpixal_tpu.align import align_images
    from subpixal_tpu.testing import pairwise_shift_errors, simulate_stack

    exps, planted = simulate_stack(n_exp=4, shape=(2048, 2048),
                                   n_stars=40, seed=17)
    res = align_images(exposures=exps, fitgeom="shift", max_iterations=3,
                       eps_shift=1e-7, usfac=8, fit_type="gaussian",
                       use_pallas=True)
    err_mpix = 1e3 * pairwise_shift_errors(res.shifts, planted)
    assert err_mpix < 10.0, f"2k align fit error {err_mpix:.2f} mpix"
    # device-resident variant: the same mosaic scene rendered ON device
    # (testing.simulate_stack(device=True)) — setup with zero exposure
    # H2D. The host-scene setup_s above includes shipping 64 MB of
    # novel pixels over the dev tunnel at its measured 2-6 MB/s; on a
    # production host that transfer is PCIe-fast, so the device number
    # is the framework's own setup cost.
    exps_d, planted_d = simulate_stack(n_exp=4, shape=(2048, 2048),
                                       n_stars=40, seed=17, device=True)
    res_d = align_images(exposures=exps_d, fitgeom="shift",
                         max_iterations=3, eps_shift=1e-7, usfac=8,
                         fit_type="gaussian", use_pallas=True)
    err_d = 1e3 * pairwise_shift_errors(res_d.shifts, planted_d)
    assert err_d < 10.0, f"2k device-scene fit error {err_d:.2f} mpix"
    return {
        "align2k_iter_ms": round(_iter_ms_diff(
            lambda it: align_images(exposures=exps_d, fitgeom="shift",
                                    max_iterations=it, eps_shift=1e-7,
                                    usfac=8, fit_type="gaussian",
                                    use_pallas=True),
            reps=2, counts=(3, 9)), 1),
        "align2k_setup_s": round(res.setup_s, 2),
        "align2k_setup_device_s": round(res_d.setup_s, 2),
        "align2k_fit_err_mpix": round(err_mpix, 3),
        "align2k_sparse_live_frac":
            res.setup_breakdown.get("sparse_live_frac", 1.0),
    }


def bench_align_spatial():
    """Spatial (row-band-sharded) align at the smoke's frame size
    (VERDICT r3 task 5 datapoint): the same 8x1024^2 scene driven
    through ``Drizzle(spatial_mesh=...)`` on a 1-device mesh — the
    sharded program (band deposit, halo'd gather, psum'd fit) running
    on the real chip. Emits the per-iteration time for comparison with
    ``align_iter_ms`` (the replicated-plane path on the same scene);
    the multi-band (8-way) execution of the identical program is
    validated by the driver's CPU-mesh dryrun instead (one real chip
    here). Since round 4 spatial mode runs the Mosaic kernels inside
    shard_map on TPU backends (band deposit + ownership-masked blot
    gather) AND the band-local sparse in-loop deposit
    (sparse_deposit='auto' engages it when compaction pays), so the
    remaining gap to ``align_iter_ms`` is the psum'd gather collective
    (docs/roadmap.md §Spatial).

    Runs LAST (see main()): its compiles are the longest of the bench
    and a cold run that went first degraded the relay for every later
    section.
    """
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        return {}
    from subpixal_tpu.align import align_images
    from subpixal_tpu.parallel.sharding import make_mesh
    from subpixal_tpu.resample import Drizzle
    from subpixal_tpu.testing import pairwise_shift_errors, simulate_stack

    mesh = make_mesh(1, axis_name="rows")
    exps, planted = simulate_stack(n_exp=8, shape=(1024, 1024),
                                   n_stars=60, seed=11, device=True)
    d = Drizzle(exps, spatial_mesh=mesh)
    res = align_images(resample=d, fitgeom="shift", max_iterations=4,
                       eps_shift=1e-7, usfac=8, fit_type="gaussian")
    err_mpix = 1e3 * pairwise_shift_errors(res.shifts, planted)
    assert err_mpix < 10.0, f"spatial align fit error {err_mpix:.2f} mpix"
    out = {
        "align_spatial_iter_ms": round(_iter_ms_diff(
            lambda it: align_images(resample=Drizzle(
                exps, spatial_mesh=mesh), fitgeom="shift",
                max_iterations=it, eps_shift=1e-7, usfac=8,
                fit_type="gaussian")), 1),
        "align_spatial_fit_err_mpix": round(err_mpix, 3),
        "align_spatial_setup_s": round(res.setup_s, 2),
    }
    if "sparse_live_frac" in res.setup_breakdown:  # band-sparse engaged
        out["align_spatial_sparse_live_frac"] = (
            res.setup_breakdown["sparse_live_frac"])
    return out


def bench_align_4k_spatial():
    """4096² spatial datapoint (VERDICT r4 task 10): the spatial mode's
    reason to exist is frames beyond one chip's comfort; previous
    rounds topped out at 2048². A 4x4096² scene (256 MB of science
    pixels + accumulators) through ``Drizzle(spatial_mesh=...)`` on
    the real chip: emits setup, fit error, sparse live fraction and
    the median-differenced iteration time. Measured cold 2026-08-20:
    first-ever run paid 446 s of finder compiles; warm (serialized
    executables) setup is ~37 s, err 0.512 mpix, live 14 %.
    """
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        return {}
    from subpixal_tpu.align import align_images
    from subpixal_tpu.parallel.sharding import make_mesh
    from subpixal_tpu.resample import Drizzle
    from subpixal_tpu.testing import pairwise_shift_errors, simulate_stack

    exps, planted = simulate_stack(n_exp=4, shape=(4096, 4096),
                                   n_stars=80, seed=23, device=True)
    mesh = make_mesh(1, axis_name="rows")

    def run(iters):
        return align_images(resample=Drizzle(exps, spatial_mesh=mesh),
                            fitgeom="shift", max_iterations=iters,
                            eps_shift=1e-7, usfac=8,
                            fit_type="gaussian")

    res = run(2)
    err = 1e3 * pairwise_shift_errors(res.shifts, planted)
    assert err < 10.0, f"4k spatial fit error {err:.2f} mpix"
    return {
        "align4k_spatial_setup_s": round(res.setup_s, 2),
        "align4k_spatial_fit_err_mpix": round(float(err), 3),
        "align4k_spatial_live_frac":
            res.setup_breakdown.get("sparse_live_frac"),
        "align4k_spatial_iter_ms": round(
            _iter_ms_diff(run, reps=2, counts=(2, 6)), 1),
    }


def _fresh_child_main():
    """Child mode (``python bench.py --fresh-child``): run the 8x1024²
    device-scene align in THIS fresh process and print one JSON line
    with end-to-end wall timings. The parent (:func:`bench_align_fresh`)
    measures the user-visible cost of a real invocation: interpreter +
    jax import + client init + setup + loop, with whatever cache state
    the environment provides (SUBPIXAL_TPU_AOT_DIR /
    JAX_COMPILATION_CACHE_DIR point cold runs at empty dirs)."""
    import os
    import sys
    import time

    t0 = time.time()
    import jax

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from subpixal_tpu.align import align_images
    from subpixal_tpu.testing import pairwise_shift_errors, simulate_stack

    t_imp = time.time()
    jax.devices()
    t_dev = time.time()
    exps, planted = simulate_stack(n_exp=8, shape=(1024, 1024),
                                   n_stars=60, seed=11, device=True)
    t_scene = time.time()
    res = align_images(exposures=exps, fitgeom="shift", max_iterations=4,
                       eps_shift=1e-7, usfac=8, fit_type="gaussian",
                       use_pallas=True)
    t_align = time.time()
    err = 1e3 * pairwise_shift_errors(res.shifts, planted)
    assert err < 10.0, f"fresh-child fit error {err:.2f} mpix"
    print(json.dumps({
        "total_s": round(time.time() - t0, 2),
        "import_s": round(t_imp - t0, 2),
        "client_init_s": round(t_dev - t_imp, 2),
        "scene_s": round(t_scene - t_dev, 2),
        "align_s": round(t_align - t_scene, 2),
        "err_mpix": round(float(err), 3),
        "setup_s": round(res.setup_s, 2),
        "breakdown": {k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in (res.setup_breakdown or {}).items()
                      if isinstance(v, float) and v > 0.25},
    }))


def bench_align_fresh():
    """Fresh-PROCESS align latency (VERDICT r4 weak #1 / r5 task 1).

    Launches subprocesses running the 8x1024² device-scene align:
    one COLD (private empty AOT + compilation-cache dirs — every
    compile paid) and two WARM (same dirs, now populated — the
    serialized-executable cache serves the loop, the finder, the
    deposit stack and the scene renderer; zero compile RPCs).

    ``align_fresh_warm_s`` is the MIN over the warm runs' align_images
    wall time, ``align_fresh_warm_total_s`` the min end-to-end process
    wall (interpreter + jax + client + scene + align). Min-of-2
    because the tunneled relay intermittently stalls a single fetch
    100-500 s regardless of what the process does (verify SKILL
    "post-Pallas stall"); the minimum is the framework's actual cost,
    the stall is the rig's. Runs LAST: the cold child's compiles can
    leave the relay degraded for anything that follows (observed
    2026-08-19 with a cold spatial section).
    """
    import os
    import subprocess
    import sys
    import tempfile

    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        return {}
    out = {}
    script = os.path.abspath(__file__)
    tmp = tempfile.mkdtemp(prefix="subpixal_fresh_")
    env = dict(os.environ)
    env["SUBPIXAL_TPU_AOT_DIR"] = os.path.join(tmp, "aot")
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(tmp, "xla")
    os.makedirs(env["SUBPIXAL_TPU_AOT_DIR"], exist_ok=True)
    os.makedirs(env["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)

    def run(timeout):
        t0 = time.time()
        r = subprocess.run([sys.executable, script, "--fresh-child"],
                           capture_output=True, text=True, env=env,
                           timeout=timeout, cwd=os.path.dirname(script))
        wall = time.time() - t0
        line = (r.stdout.strip().splitlines() or ["{}"])[-1]
        try:
            child = json.loads(line)
        except json.JSONDecodeError:
            child = {}
        if r.returncode != 0 or "align_s" not in child:
            raise RuntimeError(
                f"fresh child rc={r.returncode}: "
                f"{(r.stderr or '').strip().splitlines()[-1:]}")
        return wall, child

    try:
        cold_wall, cold = run(timeout=1200)
        out["align_fresh_cold_s"] = round(cold_wall, 2)
        out["align_fresh_cold_align_s"] = cold.get("align_s")
        warms = []
        for _ in range(2):
            warms.append(run(timeout=600))
        best = min(warms, key=lambda wc: wc[1]["align_s"])
        out["align_fresh_warm_total_s"] = round(
            min(w for w, _ in warms), 2)
        out["align_fresh_warm_s"] = best[1]["align_s"]
        out["align_fresh_warm_breakdown"] = best[1].get("breakdown", {})
    except Exception as e:  # noqa: BLE001 - fresh section is best-effort
        out["align_fresh_error"] = f"{type(e).__name__}: {e}"[:200]
    return out


def main():
    import os

    import jax

    from subpixal_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    trace_dir = os.environ.get("SUBPIXAL_TPU_TRACE")
    if trace_dir:  # SURVEY §5 tracing hook: perfetto/xplane dump
        jax.profiler.start_trace(trace_dir)
    refs, imgs, dxs, dys = make_workload()
    tpu_ccs, rmse_mpix, tpu_dxy, mfu, mfu_phys = bench_tpu(
        refs, imgs, dxs, dys)
    if trace_dir:
        jax.profiler.stop_trace()
    parity_ref = bench_align_parity_ref()  # pure-XLA; BEFORE any Mosaic
    cpu_ccs, cpu_dxy = bench_cpu_reference(refs, imgs)
    # BASELINE metric "shift RMSE vs reference": same data, TPU vs the
    # reference algorithm's own measurements (data noise cancels).
    n = cpu_dxy.shape[0]
    vs_ref = 1e3 * float(
        np.sqrt(np.mean(np.sum((tpu_dxy[:n] - cpu_dxy) ** 2, axis=1))))
    # Hard numerics gate (VERDICT r3 task 3): the device algorithm must
    # track the f64 reference algorithm to well under the mpix regime on
    # identical data. A future "optimization" that walks this into the
    # mpix range fails the bench loudly instead of shipping silently.
    assert vs_ref < 0.1, (
        f"shift_rmse_vs_reference_mpix={vs_ref:.4f} >= 0.1 — device "
        "measurement drifted from the f64 reference algorithm")
    extras = bench_kernels()  # pallas sections last (compile-order rule)
    extras.update(bench_align_smoke(parity_ref))
    extras.update(bench_align_2k())
    # spatial LAST: its sharded-program compiles are the longest of the
    # whole bench (~17 min cold through the relay, minutes warm) and a
    # 2026-08-19 run that put it FIRST left the relay degraded for every
    # later section (smoke iter 37 -> 138 ms, deposit_stack 2.9 -> 12.6 s
    # — the queued-work stall mode in .claude/skills/verify/SKILL.md)
    extras.update(bench_align_spatial())
    if "align_spatial_iter_ms" in extras and "align_iter_ms" in extras:
        extras["align_spatial_vs_replicated"] = round(
            extras["align_spatial_iter_ms"] / extras["align_iter_ms"], 2)
    extras.update(bench_align_4k_spatial())
    # fresh-process latency LAST: its cold child re-pays every compile
    # in a private cache, which can degrade the relay for later work
    extras.update(bench_align_fresh())

    print(json.dumps({
        "metric": "batched cutout cross-correlations/sec "
                  "(NCC + 10x Fourier upsampling + Gaussian peak fit, "
                  "500x64x64)",
        "value": round(tpu_ccs, 1),
        "unit": "cc/s",
        "vs_baseline": round(tpu_ccs / cpu_ccs, 2),
        "baseline_cpu_ccs": round(cpu_ccs, 1),
        "shift_rmse_vs_truth_mpix": round(rmse_mpix, 4),
        "shift_rmse_vs_reference_mpix": round(vs_ref, 4),
        "device": str(jax.devices()[0]),
        **({"mfu_pct": mfu} if mfu is not None else {}),
        # true MXU occupancy: physical bf16-emulation passes (fwd
        # Precision.HIGH = 3x, read-out HIGHEST = 6x the logical MACs)
        **({"mfu_physical_pct": mfu_phys}
           if mfu_phys is not None else {}),
        **extras,
    }))


def _is_transient(exc: BaseException) -> bool:
    """Only the tunneled-TPU relay abort signatures earn a retry.

    A bare ``except Exception`` retry (round-4 shape) would also launder
    a nondeterministic numerics assertion — gate trips on attempt 1,
    passes on attempt 2, clean JSON ships (VERDICT r4 weak #5).
    AssertionError and friends must stay fatal.
    """
    if isinstance(exc, AssertionError):
        return False
    msg = f"{type(exc).__name__}: {exc}"
    transient_markers = (
        # observed relay/runtime abort signatures on the axon tunnel
        "DEADLINE_EXCEEDED", "UNAVAILABLE", "ABORTED", "INTERNAL",
        "RESOURCE_EXHAUSTED", "Socket closed", "connection reset",
        "Connection reset", "transport", "rpc", "RPC",
        "XlaRuntimeError", "FAILED_PRECONDITION",
    )
    return any(m in msg for m in transient_markers)


if __name__ == "__main__":
    import sys as _sys

    if "--fresh-child" in _sys.argv:
        _fresh_child_main()
        raise SystemExit(0)
    try:
        main()
    except Exception as e:
        # the tunneled TPU runtime intermittently aborts a call after
        # Pallas work (relay-side flake, see .claude/skills/verify/
        # SKILL.md); one retry in a fresh attempt usually succeeds —
        # but ONLY for the known transient signatures (_is_transient)
        import sys
        import traceback

        traceback.print_exc(file=sys.stderr)
        if not _is_transient(e):
            print("bench: non-transient failure, not retrying",
                  file=sys.stderr)
            sys.exit(1)
        try:  # a crash between start_trace/stop_trace leaves the
            import jax  # profiler active; the retry must not re-start it

            jax.profiler.stop_trace()
        except Exception:
            pass
        print("bench: transient failure, retrying once", file=sys.stderr)
        main()
