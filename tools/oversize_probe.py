#!/usr/bin/env python
"""Bisect the oversize FFT path on real hardware: which piece aborts the
remote compiler at 2^26+? Each probe compiles+runs one component in isolation.

    python tools/oversize_probe.py [--log2 26] [--probe all|core|recomb|rfft]
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
    ap.add_argument("--log2", type=int, default=26)
    ap.add_argument("--probe", default="all")
    ap.add_argument("--chunk-log2", type=int, default=None,
                    help="override chunk_elems = 2^k")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from hisstools_library_tpu.fft import matmul_fft, oversize
    from hisstools_library_tpu.utils.profiling import enable_compile_cache, sync

    enable_compile_cache()
    print(f"device: {jax.devices()[0]}", flush=True)
    n = 1 << args.log2
    ce = (1 << args.chunk_log2) if args.chunk_log2 else None
    rng = np.random.default_rng(0)

    def run(tag, fn, *arrs):
        t0 = time.time()
        try:
            out = jax.jit(fn)(*arrs)
            sync(out[0] if isinstance(out, tuple) else out)
            print(f"[ok] {tag}: {time.time()-t0:.1f}s", flush=True)
            return out
        except Exception as e:  # noqa: BLE001 — charting the envelope
            print(f"[FAIL] {tag}: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            return None

    if args.probe in ("all", "core"):
        # Complex oversize core at n (the piece the 2^(log2+1) rfft uses at m).
        re = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        im = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        out = run(f"fft_split_oversize 2^{args.log2}",
                  lambda a, b: oversize.fft_split_oversize(
                      a, b, chunk_elems=ce), re, im)
        if out is not None and args.log2 <= 24:
            z = np.fft.fft(np.asarray(re, np.float64)
                           + 1j * np.asarray(im, np.float64))
            err = np.abs(np.asarray(out[0], np.float64) - z.real)
            print(f"     max err vs np: {err.max():.3e}")
        del re, im, out

    if args.probe in ("all", "recomb"):
        # Real<->complex recombination ALONE at m = n/2 (identity core).
        m = n // 2
        x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        ident = lambda a, b, inverse=False: (a, b)  # noqa: E731
        run(f"rfft recombination m=2^{args.log2-1} (identity core)",
            lambda a: matmul_fft.rfft_packed(a, core=ident), x)
        del x

    if args.probe in ("all", "rfft"):
        x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        run(f"rfft_packed_oversize 2^{args.log2}",
            lambda a: oversize.rfft_packed_oversize(a, chunk_elems=ce), x)

    if args.probe in ("all", "icore"):
        m = n // 2
        re = jnp.asarray(rng.standard_normal(m).astype(np.float32))
        im = jnp.asarray(rng.standard_normal(m).astype(np.float32))
        run(f"fft_split_oversize inverse m=2^{args.log2-1}",
            lambda a, b: oversize.fft_split_oversize(
                a, b, inverse=True, chunk_elems=ce), re, im)
        del re, im

    if args.probe in ("all", "irecomb"):
        m = n // 2
        re = jnp.asarray(rng.standard_normal(m).astype(np.float32))
        im = jnp.asarray(rng.standard_normal(m).astype(np.float32))
        ident = lambda a, b, inverse=False: (a, b)  # noqa: E731
        run(f"rifft recombination m=2^{args.log2-1} (identity core)",
            lambda a, b: matmul_fft.rifft_packed(a, b, core=ident), re, im)
        del re, im

    if args.probe in ("all", "rifft"):
        m = n // 2
        re = jnp.asarray(rng.standard_normal(m).astype(np.float32))
        im = jnp.asarray(rng.standard_normal(m).astype(np.float32))
        run(f"rifft_packed_oversize 2^{args.log2}",
            lambda a, b: oversize.rifft_packed_oversize(a, b, chunk_elems=ce),
            re, im)

    return 0


if __name__ == "__main__":
    sys.exit(main())
