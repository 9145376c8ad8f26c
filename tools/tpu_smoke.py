#!/usr/bin/env python
"""TPU hardware smoke suite: compile + numerics checks for every Pallas path.

The pytest suite runs on CPU (Pallas interpret mode), which accepts programs
the Mosaic TPU compiler rejects (scatter-add, rev, VMEM overflows...). This
script is the hardware gate: it drives each fused kernel and both engines on
the real chip against float64 oracles and prints one PASS/FAIL line per check.

    python tools/tpu_smoke.py            # all checks (~2-4 min incl. compiles)
    python tools/tpu_smoke.py --fast     # skip the engine end-to-end checks
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

# Allow running as a script from anywhere (tools/ is not the package root).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAILURES = []


def check(name, ok, detail=""):
    status = "PASS" if ok else "FAIL"
    print(f"[{status}] {name} {detail}", flush=True)
    if not ok:
        FAILURES.append(name)


def snr_db(ref, test):
    ref = np.asarray(ref, np.float64)
    err = np.asarray(test, np.float64) - ref
    d = (err * err).sum()
    return np.inf if d == 0 else 10 * np.log10((ref * ref).sum() / d)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--full", action="store_true",
                    help="include the IR measurement pipeline (~40 s)")
    ap.add_argument("--snr", type=float, default=90.0,
                    help="minimum acceptable SNR vs float64 oracles (dB)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from hisstools_library_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()

    from hisstools_library_tpu.fft import pallas_fft
    from hisstools_library_tpu.fft.pallas_kernels import (lag_mac,
                                                          lag_mac_causal)
    from hisstools_library_tpu.utils.profiling import sync

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    rng = np.random.default_rng(0)
    t0 = time.time()

    # Fused real FFT round trips across the supported size range, both modes.
    # 512/1024 run the batched small-N dense kernels; 2048 the FOLDED form
    # (even/odd input fold — two half-size table pairs, round 3).
    for mode in ("bf16x3", "highest"):
        for n in (512, 1024, 2048, 4096, 32768, 65536, 131072):
            x = rng.standard_normal((4, n)).astype(np.float32)
            re, im = jax.jit(
                lambda a, m=mode: pallas_fft.rfft_packed(a, mode=m))(
                    jnp.asarray(x))
            y = jax.jit(
                lambda a, b, m=mode: pallas_fft.rifft_packed(a, b, mode=m))(
                    re, im)
            sync(y)
            s = snr_db(2.0 * n * x, np.asarray(y))
            check(f"rfft/rifft {mode} N={n}", s > args.snr, f"SNR {s:.1f} dB")

    # Split-pair kernels: the engine's upper size range 2^18..2^20
    # (PartitionedConvolve.h:18-19) — stage-chunked two-kernel pipeline.
    split_sizes = (1 << 18,) if args.fast else (1 << 18, 1 << 19, 1 << 20)
    for mode in ("bf16x3", "highest"):
        for n in split_sizes:
            x = rng.standard_normal((2, n)).astype(np.float32)
            re, im = jax.jit(
                lambda a, m=mode: pallas_fft.rfft_packed(a, mode=m))(
                    jnp.asarray(x))
            y = jax.jit(
                lambda a, b, m=mode: pallas_fft.rifft_packed(a, b, mode=m))(
                    re, im)
            sync(y)
            s = snr_db(2.0 * n * x, np.asarray(y))
            check(f"split rfft/rifft {mode} N=2^{n.bit_length() - 1}",
                  s > args.snr, f"SNR {s:.1f} dB")

    # Double-float (df64) mode: the compensation self-check must survive the
    # REAL Mosaic/XLA-TPU pipeline (the bf16 hi/lo split was once silently
    # folded on TPU — CLAUDE.md), and the round trip must hold f64-class SNR.
    from hisstools_library_tpu.fft import df64 as df64_mod
    sc = df64_mod.selfcheck()
    check("df64 compensation selfcheck", sc < 1e-10, f"rel err {sc:.2e}")
    for n in (4096, 65536):
        xd = rng.standard_normal(n).astype(np.float32)
        yh, yl = jax.jit(lambda a: df64_mod.rifft_df64(*df64_mod.rfft_df64(a))
                         )(jnp.asarray(xd))
        sync(yh)
        y = df64_mod.dd_to_f64(yh, yl)
        s = snr_db(2.0 * n * xd, y)
        check(f"df64 roundtrip N={n}", s > 180.0, f"SNR {s:.1f} dB")

    # Two-tier block streaming (round 5): near+far+lag0 on the real chip vs
    # the float64 direct-convolution oracle, carried state across two blocks.
    from hisstools_library_tpu.models import mono as mono_mod
    from hisstools_library_tpu.models.mono import (LatencyMode,
                                                   PartitionScheme)
    sch2 = PartitionScheme.from_latency(LatencyMode.Zero)
    ir2len = 300000
    ir2 = (rng.standard_normal((2, ir2len)) *
           np.exp(-np.arange(ir2len) / 24000.0)).astype(np.float32)
    mir2 = mono_mod.prepare_ir(sch2, ir2, dtype=jnp.float32,
                               offline_tail=False)
    if mir2.far is not None:
        st2t = mono_mod.init_block_state(sch2, mir2, (2,))
        h2b = mir2.far.shape[-1]
        x2t = rng.standard_normal((2, h2b)).astype(np.float32)
        step2t = jax.jit(lambda i, s, b: mono_mod.process(
            i, s, b, backend="pallas"))
        st2t, y_a = step2t(mir2, st2t, jnp.asarray(x2t))
        x2t_b = rng.standard_normal((2, h2b)).astype(np.float32)
        _, y_b = step2t(mir2, st2t, jnp.asarray(x2t_b))
        sync(y_b)
        y2t = np.concatenate([np.asarray(y_a), np.asarray(y_b)], axis=-1)
        ref = np.convolve(np.concatenate([x2t[0], x2t_b[0]]).astype(np.float64),
                          ir2[0].astype(np.float64))[:2 * h2b]
        s = snr_db(ref, y2t[0])
        check("two-tier block streaming", s > args.snr, f"SNR {s:.1f} dB")
    else:
        check("two-tier block streaming", False, "far tier not built")

    # Staged-matmul FFT with in-graph twiddles (core m = 2^23 > the baked-
    # constant cap): the configuration whose host-baked tables used to abort
    # the axon remote compiler with a >100 MB program body.
    if not args.fast:
        from hisstools_library_tpu.fft import matmul_fft
        n_big = 1 << 24
        xb = rng.standard_normal(n_big).astype(np.float32)
        reb, imb = jax.jit(matmul_fft.rfft_packed)(jnp.asarray(xb))
        yb = jax.jit(matmul_fft.rifft_packed)(reb, imb)
        sync(yb)
        s = snr_db(2.0 * n_big * xb, np.asarray(yb))
        check(f"matmul rfft/rifft in-graph twiddles N=2^24", s > args.snr,
              f"SNR {s:.1f} dB")

    # Sub-hop streaming with the fused hop kernel on hardware: random odd
    # callback sizes through a small zero-latency scheme vs np.convolve
    # (the pytest coverage runs interpret mode only; Mosaic can diverge).
    from hisstools_library_tpu.models import mono as mono_mod
    from hisstools_library_tpu.models.mono import PartitionScheme as PS
    scheme_sh = PS((256, 1024), zero_latency=True)
    ir_sh = rng.standard_normal((2, 1800)).astype(np.float32)
    mir_sh = mono_mod.prepare_ir(scheme_sh, ir_sh, dtype=jnp.float32,
                                 offline_tail=False)
    st_sh = mono_mod.init_stream_state(scheme_sh, mir_sh, (2,))
    Lsh = 512 * 5
    x_sh = rng.standard_normal((2, Lsh)).astype(np.float32)
    step_sh = jax.jit(lambda s, b: mono_mod.process_any(mir_sh, s, b,
                                                        backend="pallas"))
    outs, i = [], 0
    for bsz in [64, 480, 333, 100, 512, 64, 480, 333, 100, 512]:
        bsz = min(bsz, Lsh - i)
        if bsz <= 0:
            break
        st_sh, y_sh = step_sh(st_sh, jnp.asarray(x_sh[:, i:i + bsz]))
        outs.append(np.asarray(y_sh))
        i += bsz
    got = np.concatenate(outs, axis=-1)
    ref_sh = np.stack([np.convolve(x_sh[ci].astype(np.float64),
                                   ir_sh[ci].astype(np.float64))[:i]
                       for ci in range(2)])
    s = snr_db(ref_sh, got[:, :i])
    check("sub-hop streaming + fused hop kernel", s > args.snr,
          f"SNR {s:.1f} dB")

    # Streaming forward + tail inverse (the convolution chain kernels).
    hop, t = 32768, 8
    x = rng.standard_normal((2, t * hop)).astype(np.float32)
    x2d = jnp.asarray(x.reshape(2, t, hop))
    sr, si = jax.jit(pallas_fft.rfft_packed_stream)(x2d)
    tail = jax.jit(lambda a, b: pallas_fft.rifft_packed_tail(
        a, b, scale=1.0 / (4.0 * 2 * hop)))(sr, si)
    sync(tail)
    # Oracle: frame t = [block t-1 | block t]; tail = scaled second half.
    blocks = np.concatenate([np.zeros((2, 1, hop)), x.reshape(2, t, hop)], 1)
    ok = True
    worst = np.inf
    for i in (0, t - 1):
        frame = np.concatenate([blocks[:, i], blocks[:, i + 1]], -1)
        z = np.fft.rfft(frame, axis=-1)
        pk_re = 2 * z.real[:, :-1]
        s = snr_db(pk_re, np.asarray(sr[:, i]))
        worst = min(worst, s)
        ok &= s > args.snr
    check("stream rfft (hop frames)", ok, f"worst SNR {worst:.1f} dB")

    # MAC kernels against a numpy lag loop (packed bin-0 semantics).
    c, tt, p, k = 3, 9, 5, 16384
    xr = rng.standard_normal((c, tt, k)).astype(np.float32)
    xi = rng.standard_normal((c, tt, k)).astype(np.float32)
    hr = rng.standard_normal((c, p, k)).astype(np.float32)
    hi = rng.standard_normal((c, p, k)).astype(np.float32)
    ref_re = np.zeros((c, tt, k))
    ref_im = np.zeros((c, tt, k))
    for lag in range(p):
        for ti in range(lag + 1, tt):
            a_re, a_im = xr[:, ti - 1 - lag], xi[:, ti - 1 - lag]
            b_re, b_im = hr[:, lag], hi[:, lag]
            pr = a_re * b_re - a_im * b_im
            pi_ = a_re * b_im + a_im * b_re
            pr[:, 0] = a_re[:, 0] * b_re[:, 0]      # packed DC lane
            pi_[:, 0] = a_im[:, 0] * b_im[:, 0]     # packed Nyquist lane
            ref_re[:, ti] += pr
            ref_im[:, ti] += pi_
    cr, ci = jax.jit(lag_mac_causal)(*map(jnp.asarray, (xr, xi, hr, hi)))
    sync(ci)
    s = min(snr_db(ref_re, np.asarray(cr)), snr_db(ref_im, np.asarray(ci)))
    check("lag_mac_causal", s > args.snr, f"SNR {s:.1f} dB")
    pad = np.zeros((c, p, k), np.float32)
    pr_, pi_ = jax.jit(lambda a, b, cc, dd: lag_mac(a, b, cc, dd, tt))(
        jnp.asarray(np.concatenate([pad, xr], 1)),
        jnp.asarray(np.concatenate([pad, xi], 1)),
        jnp.asarray(hr), jnp.asarray(hi))
    sync(pi_)
    s = min(snr_db(ref_re, np.asarray(pr_)), snr_db(ref_im, np.asarray(pi_)))
    check("lag_mac (padded)", s > args.snr, f"SNR {s:.1f} dB")

    # Analysis layers on hardware: STFT round trip, windows, spectral ops,
    # and the HIRT-style measurement pipeline (deconvolve + smooth + track).
    from hisstools_library_tpu.ops import stft as stft_mod
    from hisstools_library_tpu.ops import windows as win_mod

    w = win_mod.hann(1024)
    sig = rng.standard_normal((2, 48000)).astype(np.float32)
    # boundary=True: without it the first/last window tapers are
    # under-covered and edge error dominates (documented behaviour).
    spec = stft_mod.stft(jnp.asarray(sig), w, 1024, 256, boundary=True)
    back = stft_mod.istft(spec, w, 256, length=48000, boundary=True)
    sync(back)
    s = snr_db(sig, np.asarray(back))
    check("stft/istft round trip", s > 100.0, f"SNR {s:.1f} dB")

    if args.full:
        from hisstools_library_tpu.models.pipeline import run_ir_pipeline
        exc = rng.standard_normal(16384).astype(np.float32)
        true_ir = (rng.standard_normal(2048) * np.exp(-np.arange(2048) / 500)
                   ).astype(np.float32)
        measured = np.convolve(exc, true_ir)[:16384].astype(np.float32)
        res = run_ir_pipeline(jnp.asarray(measured), jnp.asarray(exc),
                              n_peaks=8, sample_rate=48000.0)
        imp = np.asarray(res.impulse)
        s = snr_db(true_ir[:1024], imp[:1024])
        check("IR measurement pipeline (deconvolve)", s > 20.0,
              f"SNR {s:.1f} dB")

    if not args.fast:
        # End-to-end engines vs float64 direct convolution.
        from hisstools_library_tpu.models import mono
        from hisstools_library_tpu.models.mono import (LatencyMode,
                                                       PartitionScheme)
        from hisstools_library_tpu.models.offline import fast_fir

        L, IRL = 131072, 48000
        x1 = rng.standard_normal((4, L)).astype(np.float32)
        ir1 = (rng.standard_normal((4, IRL)) *
               np.exp(-np.arange(IRL) / 16000)).astype(np.float32)
        y = fast_fir(jnp.asarray(x1), ir1, backend="pallas")
        sync(y)
        ref = np.stack([np.convolve(x1[i].astype(np.float64),
                                    ir1[i].astype(np.float64))[:L]
                        for i in range(4)])
        s = snr_db(ref, np.asarray(y))
        check("fast_fir end-to-end", s > args.snr - 10, f"SNR {s:.1f} dB")

        scheme = PartitionScheme.from_latency(LatencyMode.Zero)
        prep = mono.prepare_ir(scheme, ir1)
        y2 = mono.process_offline(prep, jnp.asarray(x1), backend="pallas")
        sync(y2)
        s = snr_db(ref, np.asarray(y2))
        check("scheme offline tail end-to-end", s > args.snr - 10,
              f"SNR {s:.1f} dB")

        # Hop-aligned streaming through the block-collapsed scheme path
        # (round-3: the whole scheme as one uniform engine + lag-0 partition).
        st = mono.init_state(scheme, prep, batch_shape=(4,))
        blk = scheme.sizes[-1] >> 1
        st, ya = mono.process(prep, st, jnp.asarray(x1[:, :8 * blk]),
                              backend="pallas")
        _, yb = mono.process(prep, st, jnp.asarray(x1[:, 8 * blk:16 * blk]),
                             backend="pallas")
        sync(yb)
        ystream = np.concatenate([np.asarray(ya), np.asarray(yb)], axis=-1)
        s = snr_db(ref[:, :16 * blk], ystream)
        check("collapsed scheme streaming (state carry)", s > args.snr - 10,
              f"SNR {s:.1f} dB")

        # Per-stage SNR report on hardware (utils.debug_stages): every stage
        # of the uniform chain must individually clear the floor.
        from hisstools_library_tpu.utils import debug_stages
        rep = debug_stages.stage_report(ir1[:1], jnp.asarray(x1[:1]),
                                        backend="pallas")
        worst = min(s_.snr_db for s_ in rep)
        detail = "; ".join(f"{s_.stage} {s_.snr_db:.0f}" for s_ in rep)
        check("per-stage debug report", worst > args.snr - 10, detail)

    print(f"\n{len(FAILURES)} failures; {time.time() - t0:.0f}s total",
          flush=True)
    if FAILURES:
        print("FAILED:", ", ".join(FAILURES))
        sys.exit(1)
    print("TPU smoke: all checks passed")


if __name__ == "__main__":
    main()
