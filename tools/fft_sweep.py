#!/usr/bin/env python
"""Hardware crash/parity/perf sweep of the upper FFT range (2^20 .. 2^28).

The reference accepts setups up to 2^28 (HISSTools_FFT/HISSTools_FFT.h:87-98)
and crash-sweeps 2^0..2^22 (- Test/FFT_Tester/FFT_Tester/main.cpp:88-140);
round 2 never EXECUTED anything above 2^24 on hardware. This tool closes that
gap: for every size it runs forward + inverse real transforms on the device,
checks the round trip (rifft(rfft(x)) == 2N x), checks parity against the
float64 numpy oracle, and slope-times both directions. Failures are caught
and reported per size so the exact envelope is documented, not guessed.

    python tools/fft_sweep.py                # 2^20..2^28
    python tools/fft_sweep.py --min 22 --max 26 --no-oracle

Output: one line per size + a summary table ready for BASELINE.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def snr_db(ref, test):
    ref = np.asarray(ref, np.float64)
    err = np.asarray(test, np.float64) - ref
    d = float((err * err).sum())
    return np.inf if d == 0 else 10 * np.log10(float((ref * ref).sum()) / d)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--min", type=int, default=20)
    ap.add_argument("--max", type=int, default=28)
    ap.add_argument("--backend", default="pallas",
                    help="fft backend (pallas routes >2^20 to staged matmul)")
    ap.add_argument("--no-oracle", action="store_true",
                    help="skip the host float64 np.fft parity check")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from hisstools_library_tpu.fft import api as fft_api
    from hisstools_library_tpu.utils.profiling import enable_compile_cache, sync

    enable_compile_cache()
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    rows = []
    rng = np.random.default_rng(0)
    for log2n in range(args.min, args.max + 1):
        n = 1 << log2n
        tag = f"2^{log2n}"
        try:
            x = rng.standard_normal(n).astype(np.float32)
            xd = jnp.asarray(x)
            fwd = jax.jit(lambda a: fft_api.rfft(a, backend=args.backend))
            inv = jax.jit(
                lambda r, i: fft_api.rifft(r, i, backend=args.backend))

            t0 = time.time()
            re, im = fwd(xd)
            y = inv(re, im)
            sync(y)
            compile_s = time.time() - t0

            # Round trip on device data.
            y_np = np.asarray(jax.device_get(y), np.float64)
            s_rt = snr_db(2.0 * n * x.astype(np.float64), y_np)

            s_fwd = None
            if not args.no_oracle:
                z = np.fft.rfft(x.astype(np.float64))
                ore = 2.0 * z.real
                oim = 2.0 * z.imag
                oim = np.concatenate([ore[-1:], oim[1:-1]])
                ore = ore[:-1]
                re_np = np.asarray(jax.device_get(re), np.float64)
                im_np = np.asarray(jax.device_get(im), np.float64)
                s_fwd = min(snr_db(ore, re_np), snr_db(oim, im_np))

            # Slope timing: chains of k and 2k round trips, one sync each.
            def chain(k):
                best = np.inf
                for _ in range(2):
                    t0 = time.time()
                    r2, i2 = re, im
                    out = y
                    for _ in range(k):
                        r2, i2 = fwd(out[..., :n] * 0.0 + xd)
                        out = inv(r2, i2)
                    sync(out)
                    best = min(best, time.time() - t0)
                return best

            k = args.iters
            t_pair = max((chain(2 * k) - chain(k)) / k, 1e-9)
            ms = t_pair * 1e3
            rows.append((tag, ms, s_rt, s_fwd, compile_s, "ok"))
            fwd_txt = f"{s_fwd:.1f}" if s_fwd is not None else "-"
            print(f"[ok] {tag}: {ms:.1f} ms/roundtrip, roundtrip "
                  f"{s_rt:.1f} dB, fwd-vs-np {fwd_txt} dB "
                  f"(compile {compile_s:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — we are charting the envelope
            msg = f"{type(e).__name__}: {str(e)[:200]}"
            rows.append((tag, None, None, None, None, msg))
            print(f"[FAIL] {tag}: {msg}", flush=True)

    print("\nsize | ms/roundtrip | roundtrip dB | fwd vs np.fft dB | status")
    for tag, ms, s_rt, s_fwd, _, status in rows:
        if ms is None:
            print(f"{tag} | - | - | - | {status}")
        else:
            fwd_txt = f"{s_fwd:.1f}" if s_fwd is not None else "-"
            print(f"{tag} | {ms:.1f} | {s_rt:.1f} | {fwd_txt} | ok")
    bad = [r for r in rows if r[1] is None]
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
