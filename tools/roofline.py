"""Per-kernel roofline report: achieved vs peak FLOPs and HBM bandwidth.

Runs each hot kernel at its benchmark shape, times a dispatch chain (one sync,
amortising the ~25 ms axon round trip), and compares achieved rates against
the chip's peaks using the same FLOP/byte models the kernels declare in their
``pl.CostEstimate``s. Backs the MXU-efficiency claims in BASELINE.md /
docs/ROADMAP.md with per-kernel numbers (SURVEY.md §5 tracing/profiling row).

Usage: python tools/roofline.py [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# TPU v5e (v5 lite) single-chip peaks.
PEAKS = {
    "TPU v5 lite": {"bf16_flops": 197e12, "hbm_bw": 819e9},
}
DEFAULT_PEAK = {"bf16_flops": 197e12, "hbm_bw": 819e9}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from hisstools_library_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()

    from hisstools_library_tpu.fft import pallas_fft
    from hisstools_library_tpu.fft.pallas_kernels import lag_mac_causal
    from hisstools_library_tpu.utils.profiling import sync

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", str(dev))
    peak = PEAKS.get(kind, DEFAULT_PEAK)
    print(f"device: {dev} (peaks: {peak['bf16_flops']/1e12:.0f} TFLOP/s bf16, "
          f"{peak['hbm_bw']/1e9:.0f} GB/s HBM)", flush=True)
    rng = np.random.default_rng(0)

    def timed(fn, *arrs):
        # Two-length slope: the axon tunnel's ~25 ms sync would otherwise
        # inflate every kernel by 25/iters ms (see BASELINE.md methodology).
        out = fn(*arrs)
        sync(out if not isinstance(out, tuple) else out[0])

        def total(k):
            best = np.inf
            for _ in range(3):
                t0 = time.time()
                o = None
                for _ in range(k):
                    o = fn(*arrs)
                sync(o if not isinstance(o, tuple) else o[0])
                best = min(best, time.time() - t0)
            return best

        return (total(2 * args.iters) - total(args.iters)) / args.iters

    # The kernel's own factorisation helpers — a local copy could silently
    # diverge and misreport MXU efficiency.
    _split_real = pallas_fft._split_real
    _pad8 = pallas_fft._pad8

    rows_out = []

    def report(name, secs, flops, bytes_):
        f_pct = flops / secs / peak["bf16_flops"] * 100
        b_pct = bytes_ / secs / peak["hbm_bw"] * 100
        bound = "MXU" if f_pct >= b_pct else "HBM"
        rows_out.append((name, secs * 1e3, flops / secs / 1e12,
                         f_pct, bytes_ / secs / 1e9, b_pct, bound))
        print(f"{name:44s} {secs*1e3:8.3f} ms  "
              f"{flops/secs/1e12:7.2f} TF/s ({f_pct:5.1f}% MXU)  "
              f"{bytes_/secs/1e9:7.1f} GB/s ({b_pct:5.1f}% HBM)  [{bound}-bound]",
              flush=True)

    # The bench workload's hot shapes: 128 channels, N=2^16 engine size.
    b_, n = 128, 1 << 16
    n1, n2 = _split_real(n)
    rows = _pad8(n2 // 2 + 1)
    hop, t = n // 2, 16

    for mode in ("bf16x3", "highest"):
        pallas_fft.set_mode(mode)

        # Forward/inverse single-kernel real FFT.
        x = jnp.asarray(rng.standard_normal((b_, n)), jnp.float32)
        f = jax.jit(lambda a, m=mode: pallas_fft.rfft_packed(a, mode=m))
        secs = timed(f, x)
        report(f"rfft_packed N=2^16 b=128 [{mode}]", secs,
               b_ * (4 * n1 * n1 * n2 + 8 * n1 * n2 * rows), 8 * b_ * n)

        re, im = f(x)
        fi = jax.jit(lambda a, c, m=mode: pallas_fft.rifft_packed(a, c, mode=m))
        secs = timed(fi, re, im)
        report(f"rifft_packed N=2^16 b=128 [{mode}]", secs,
               b_ * (8 * (n2 // 2) * n2 * n1 + 4 * n1 * n1 * n2), 8 * b_ * n)

        # Streaming forward + tail inverse at the engine's hop shape.
        x2d = jnp.asarray(rng.standard_normal((8, t, hop)), jnp.float32)
        fs = jax.jit(lambda a, m=mode: pallas_fft.rfft_packed_stream(a, mode=m))
        secs = timed(fs, x2d)
        report(f"rfft_packed_stream hop=2^15 T=16 [{mode}]", secs,
               8 * t * (4 * n1 * n1 * n2 + 8 * n1 * n2 * rows),
               8 * t * 12 * hop)

        sr, si = fs(x2d)
        ft = jax.jit(lambda a, c, m=mode: pallas_fft.rifft_packed_tail(
            a, c, scale=0.25 / n, mode=m))
        secs = timed(ft, sr, si)
        report(f"rifft_packed_tail hop=2^15 T=16 [{mode}]", secs,
               8 * t * (8 * (n2 // 2) * n2 * n1 + 2 * n1 * n1 * n2),
               8 * t * 12 * hop)

        # Split-pair kernels at the engine's upper range.
        nbig = 1 << 19
        xb = jnp.asarray(rng.standard_normal((4, nbig)), jnp.float32)
        fb = jax.jit(lambda a, m=mode: pallas_fft.rfft_packed(a, mode=m))
        secs = timed(fb, xb)
        nb1, nb2 = _split_real(nbig)
        rb = _pad8(nb2 // 2 + 1)
        report(f"rfft split-pair N=2^19 b=4 [{mode}]", secs,
               4 * (4 * nb1 * nb1 * nb2 + 8 * nb1 * nb2 * rb), 24 * 4 * nbig)

    # Lag MAC (VPU-bound): the bench workload's partition MAC.
    c, tt, p, k = 128, 16, 15, hop
    xr = jnp.asarray(rng.standard_normal((c, tt, k)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((c, tt, k)), jnp.float32)
    hr = jnp.asarray(rng.standard_normal((c, p, k)), jnp.float32)
    hi = jnp.asarray(rng.standard_normal((c, p, k)), jnp.float32)
    fm = jax.jit(lag_mac_causal)
    secs = timed(fm, xr, xi, hr, hi)
    # ~T*P/2 causal lag products, 8 flops per complex MAC per bin.
    flops = c * k * 8 * sum(min(ti, p) for ti in range(tt))
    bytes_ = 4 * (2 * c * tt * k * 2 + 2 * c * p * k)
    report("lag_mac_causal 128ch P=15 hop=2^15", secs, flops, bytes_)

    print("\n| kernel | ms | TFLOP/s | % MXU peak | GB/s | % HBM peak | bound |",
          flush=True)
    print("|---|---|---|---|---|---|---|", flush=True)
    for r in rows_out:
        print(f"| {r[0]} | {r[1]:.3f} | {r[2]:.2f} | {r[3]:.1f}% | "
              f"{r[4]:.1f} | {r[5]:.1f}% | {r[6]} |", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
