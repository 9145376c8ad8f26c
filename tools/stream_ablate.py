"""Stage-level timing of the collapsed Zero-preset streaming block path.

The collapsed path (models/mono._process_block_collapsed) is: 3x
_refresh_aligned_section (small sections) + PartitionedConvolve.process_block
on the final section (frames concat -> rFFT -> lag_mac_ring -> lag0 product ->
tail riFFT). This tool times each stage alone at the exact BENCH_MODE=stream
shape with sync-cancelling slope timing, so round-4 work attacks the measured
bottleneck instead of a guessed one.

Usage: python tools/stream_ablate.py  (real TPU; ~2 min warm)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from hisstools_library_tpu.utils.profiling import enable_compile_cache, sync
    enable_compile_cache()

    from hisstools_library_tpu.core.types import Split, packed_mul
    from hisstools_library_tpu.fft import api as fft_api
    from hisstools_library_tpu.fft import pallas_fft, pallas_kernels as pk
    from hisstools_library_tpu.models import mono
    from hisstools_library_tpu.models import partitioned as part
    from hisstools_library_tpu.models.mono import LatencyMode, PartitionScheme

    mode = os.environ.get("BENCH_FFT_MODE", "bf16x3")
    pallas_fft.set_mode(mode)
    channels = int(os.environ.get("BENCH_CHANNELS", "128"))
    fs = 48000
    scheme = PartitionScheme.from_latency(LatencyMode.Zero)
    hop = scheme.sizes[-1] >> 1
    sig_len = hop * 16
    ir_len = 10 * fs

    rng = np.random.default_rng(0)
    irs = (rng.standard_normal((channels, ir_len)) *
           np.exp(-np.arange(ir_len) / (0.5 * fs))).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((channels, sig_len)), jnp.float32)

    ir = mono.prepare_ir(scheme, irs, dtype=jnp.float32, offline_tail=False)
    state0 = mono.init_state(scheme, ir, batch_shape=(channels,))
    spec = ir.spectra[-1]
    st = state0.sections[-1]
    p = spec.shape[-2]
    n = 2 * hop
    t = sig_len // hop
    print(f"shape: C={channels} hop={hop} T={t} P={p} mode={mode}")

    def slope(fn, iters=8):
        fn()  # compile
        sync(fn())
        best = np.inf
        for k in (iters, 2 * iters):
            bt = np.inf
            for _ in range(3):
                t0 = time.time()
                out = None
                for _ in range(k):
                    out = fn()
                sync(out)
                bt = min(bt, time.time() - t0)
            if k == iters:
                t_n = bt
            else:
                best = (bt - t_n) / iters
        return best

    lead = (channels,)
    blocks = x.reshape(channels, t, hop)
    prev_rows = jnp.concatenate([st.prev[..., None, :], blocks[..., :-1, :]],
                                axis=-2)
    frames = jnp.concatenate([prev_rows, blocks], axis=-1)
    hr_b = jnp.broadcast_to(spec.re, lead + (p, hop))
    hi_b = jnp.broadcast_to(spec.im, lead + (p, hop))

    # -- full collapsed block (what BENCH_MODE=stream times) ------------------
    # Every jit below takes the big arrays as ARGUMENTS: closing over the IR
    # spectra bakes ~0.5 GB of constants into the program body and the axon
    # remote compiler rejects it (HTTP 413) — CLAUDE.md gotcha.
    full = jax.jit(lambda i, s, xx: mono.process(i, s, xx, backend="pallas")[1])
    ms = slope(lambda: full(ir, state0, x)) * 1e3
    print(f"full collapsed block        : {ms:7.2f} ms")

    # -- frames concat + rfft --------------------------------------------------
    f_rfft = jax.jit(lambda xx, pv: fft_api.rfft(jnp.concatenate(
        [jnp.concatenate([pv[..., None, :], xx.reshape(channels, t, hop)[..., :-1, :]], axis=-2),
         xx.reshape(channels, t, hop)], axis=-1), backend="pallas"))
    ms = slope(lambda: f_rfft(x, st.prev)) * 1e3
    print(f"frames concat + rfft        : {ms:7.2f} ms")

    xre, xim = f_rfft(x, st.prev)

    # -- lag_mac_ring alone ----------------------------------------------------
    f_mac = jax.jit(lambda hr, hi, a, b, sr, si: pk.lag_mac_ring(
        hr, hi, a, b, sr, si, interpret=False))
    ms = slope(lambda: f_mac(st.ring.re, st.ring.im, xre, xim,
                             hr_b, hi_b)) * 1e3
    print(f"lag_mac_ring                : {ms:7.2f} ms")

    yre, yim, nre, nim = f_mac(st.ring.re, st.ring.im, xre, xim, hr_b, hi_b)

    # -- lag0 product -----------------------------------------------------------
    f_l0 = jax.jit(lambda a, b, l0: packed_mul(Split(a, b), l0))
    ms = slope(lambda: f_l0(xre, xim, ir.block0)) * 1e3
    print(f"lag0 packed product         : {ms:7.2f} ms")

    # -- tail riFFT -------------------------------------------------------------
    f_tail = jax.jit(lambda a, b: pallas_fft.rifft_packed_tail(
        a, b, scale=1.0 / (4.0 * n)))
    ms = slope(lambda: f_tail(yre, yim)) * 1e3
    print(f"tail riFFT                  : {ms:7.2f} ms")

    # -- small-section refresh (x3) + head refresh ------------------------------
    def f_refresh(specs, xx):
        tail = xx[..., -hop:]
        outs = [mono._refresh_aligned_section(s, tail, "pallas").ring.re
                for s in specs]
        return outs[0]
    f_refresh = jax.jit(f_refresh)
    ms = slope(lambda: f_refresh(ir.spectra[:-1], x)) * 1e3
    print(f"refresh small sections (x{len(ir.spectra) - 1}): {ms:7.2f} ms")

    # -- mega-kernel variant (for reference) ------------------------------------
    if pallas_fft.fastfir_stream_feasible(n, p):
        l0r = jnp.broadcast_to(ir.block0.re, lead + (1, hop)).reshape(channels, hop)
        l0i = jnp.broadcast_to(ir.block0.im, lead + (1, hop)).reshape(channels, hop)
        f_mega = jax.jit(lambda pv, rr, ri, xx, sr, si, ar, ai:
                         pallas_fft.fastfir_chain_stream(
            xx.reshape(channels, t, hop), pv, rr, ri, sr, si,
            scale=1.0 / (4.0 * n), l0_re=ar, l0_im=ai))
        ms = slope(lambda: f_mega(st.prev, st.ring.re, st.ring.im, x,
                                  hr_b, hi_b, l0r, l0i)) * 1e3
        print(f"mega-kernel (chain_stream)  : {ms:7.2f} ms")


if __name__ == "__main__":
    main()
