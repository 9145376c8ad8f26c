"""Staged vs out-of-core FFT crossover sweep (TPU, VERDICT r4 item 4).

Round 4 found the out-of-core chunked four-step (fft/oversize.py) at 2^26
runs 5.5x FASTER than the staged whole-array path at 2^25 (161.8 vs 898.1 ms)
— the staged transposes thrash HBM at the top sizes. This tool measures BOTH
paths at 2^22..2^25 so fft/api routes each size at its measured optimum
(MAX_STAGED_PREFERRED_LOG2).

    python tools/fft_crossover.py [--min 22 --max 25]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--min", type=int, default=22)
    ap.add_argument("--max", type=int, default=25)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from hisstools_library_tpu.fft import matmul_fft, oversize
    from hisstools_library_tpu.utils.profiling import enable_compile_cache, sync

    enable_compile_cache()
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)

    def slope(fn, x, iters):
        out = fn(x)
        sync(out[0])

        def best(k):
            b = np.inf
            for _ in range(2):
                t0 = time.time()
                o = None
                for _ in range(k):
                    o = fn(x)
                sync(o[0])
                b = min(b, time.time() - t0)
            return b

        t1, t2 = best(iters), best(2 * iters)
        return (t2 - t1) / iters

    print(f"{'size':>6} {'staged ms':>10} {'oversize ms':>12} {'winner':>9} "
          f"{'rt dB (oversize)':>17}", flush=True)
    for log2n in range(args.min, args.max + 1):
        n = 1 << log2n
        x = jnp.asarray(rng.standard_normal(n), jnp.float32)

        def staged(a):
            re, im = matmul_fft.rfft_packed(a)
            return matmul_fft.rifft_packed(re, im), re

        def oover(a):
            re, im = oversize.rfft_packed_oversize(a)
            return oversize.rifft_packed_oversize(re, im), re

        f_st = jax.jit(lambda a: staged(a)[0])
        f_ov = jax.jit(lambda a: oover(a)[0])
        try:
            t_st = slope(lambda a: (f_st(a),), x, args.iters) * 1e3
        except Exception as e:  # compiler aborts at the envelope edge
            t_st = float("nan")
            print(f"  staged 2^{log2n} failed: {type(e).__name__}", flush=True)
        t_ov = slope(lambda a: (f_ov(a),), x, args.iters) * 1e3
        y = f_ov(x)
        ref = 2.0 * n * np.asarray(x, np.float64)
        err = np.asarray(y, np.float64) - ref
        db = 10 * np.log10(ref.dot(ref) / max(err.dot(err), 1e-300))
        win = "oversize" if (np.isnan(t_st) or t_ov < t_st) else "staged"
        print(f"2^{log2n:<4} {t_st:>10.1f} {t_ov:>12.1f} {win:>9} {db:>17.1f}",
              flush=True)


if __name__ == "__main__":
    main()
