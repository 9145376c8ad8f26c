"""Per-component slope timings of the two-tier streaming block path (TPU).

Times, at the BENCH_MODE=stream shape, each piece of
mono._process_block_two_tier in isolation — near process_block (+lag0), far
process_block, raw-history push — plus the composed two-tier step and the
single-tier collapsed step for reference. Methodology: chains of M and 2M
dependent dispatches, one sync each, slope (BASELINE.md round-2 timing fix).
"""

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

    from hisstools_library_tpu.core.types import Split
    from hisstools_library_tpu.fft import pallas_fft
    from hisstools_library_tpu.models import mono, partitioned as part
    from hisstools_library_tpu.models.mono import LatencyMode, PartitionScheme

    pallas_fft.set_mode(os.environ.get("BENCH_FFT_MODE", "bf16x3"))
    backend = "pallas"
    C = int(os.environ.get("BENCH_CHANNELS", "128"))
    fs = 48000
    ir_len = 480000
    scheme = PartitionScheme.from_latency(LatencyMode.Zero)
    hop = scheme.sizes[-1] >> 1
    L = hop * 16

    rng = np.random.default_rng(0)
    irs = (rng.standard_normal((C, ir_len)) *
           np.exp(-np.arange(ir_len) / (0.5 * fs))).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((C, L)).astype(np.float32))

    ir = mono.prepare_ir(scheme, irs, dtype=jnp.float32, offline_tail=False)
    jax.block_until_ready(ir.head_taps)
    h = ir.spectra[-1].shape[-1]
    far_g = int(os.environ.get("FAR_G", "0"))
    if far_g:
        # Rebuild the far tier at an alternative hop multiple G.
        from hisstools_library_tpu.models import partitioned as _part
        o2 = far_g * h - scheme.latency
        far = _part.impulse_spectra(irs, 2 * far_g * h, o2, 0, jnp.float32,
                                    "pallas")
        ir = mono.MonoIR(ir.head_taps, ir.spectra, ir.tail, ir.tail_shift,
                         ir.block0, far)
    h2 = ir.far.shape[-1]
    g = h2 // h
    p2 = ir.far.shape[-2]
    print(f"shape: C={C} h={h} T={L//h} P={ir.spectra[-1].shape[-2]} "
          f"far: H2={h2} G={g} P2={p2}", flush=True)
    print(f"far feasible g: "
          f"{[pallas_fft.fastfir_stream_feasible(2*h2, p2, gg) for gg in (1,2,4)]}",
          flush=True)

    def slope(label, fn, s0, m=6, donate=True):
        # Spectra/IR pytrees ride as ARGUMENTS — closed-over device arrays
        # bake into the program body and the remote compiler rejects >100 MB
        # (CLAUDE.md); ir here is ~1 GB of spectra. Substage probes that
        # return an input unchanged must NOT donate (returning a donated
        # buffer is a runtime InvalidArgument on TPU).
        stepf = jax.jit(fn, donate_argnums=(1,) if donate else ())

        def chain(k, s_init):
            s = s_init
            y = None
            for _ in range(k):
                s, y = stepf(ir, s, x)
            return s, y

        # compile + warm
        s, y = chain(2, s0())
        sync(y)

        def best(k):
            b = np.inf
            for _ in range(3):
                s_init = s0()
                t0 = time.time()
                _, yy = chain(k, s_init)
                sync(yy)
                b = min(b, time.time() - t0)
            return b

        t1, t2 = best(m), best(2 * m)
        ms = (t2 - t1) / m * 1e3
        print(f"{label:34s} {ms:8.2f} ms/pass  (chains {t1*1e3:.0f}/{t2*1e3:.0f})",
              flush=True)
        return ms

    def _near_spec(mir):
        return Split(mir.spectra[-1].re[..., :g - 1, :],
                     mir.spectra[-1].im[..., :g - 1, :])

    # near tier alone (P1 lags + lag0)
    def near_fn(mir, s, xx):
        return part.PartitionedConvolve.process_block(
            _near_spec(mir), s, xx, backend=backend, lag0=mir.block0)

    def near0():
        return part.PartitionedState(
            prev=jnp.zeros((C, h), jnp.float32),
            ring=Split.zeros((C, g - 1, h), jnp.float32),
            pos=jnp.zeros((), jnp.int32))

    # near tier without lag0
    def nearn_fn(mir, s, xx):
        return part.PartitionedConvolve.process_block(
            _near_spec(mir), s, xx, backend=backend)

    # far tier alone
    def far_fn(mir, s, xx):
        return part.PartitionedConvolve.process_block(
            mir.far, s, xx, backend=backend)

    def far0():
        return part.PartitionedState(
            prev=jnp.zeros((C, h2), jnp.float32),
            ring=Split.zeros((C, p2, h2), jnp.float32),
            pos=jnp.zeros((), jnp.int32))

    # hist push alone
    s_rows = max(ir.spectra[-1].shape[-2] + 1, (p2 + 1) * g)

    def hist_fn(mir, s, xx):
        del mir
        hist, hpos = s
        hist, hpos = mono._hist_push(hist, hpos, xx)
        return (hist, hpos), hist[..., 0, :1]

    def hist0():
        return (jnp.zeros((C, s_rows, h), jnp.float32),
                jnp.zeros((), jnp.int32))

    # composed two-tier
    def two_fn(mir, s, xx):
        return mono.process(mir, s, xx, backend=backend)

    def two0():
        return mono.init_block_state(scheme, ir, (C,))

    # single-tier collapsed reference
    def one_fn(mir, s, xx):
        return mono.process(mir, s, xx, backend=backend)

    def one0():
        return mono.init_state(scheme, ir, (C,))

    # far-tier substages (staged-path pieces at the far shape)
    from hisstools_library_tpu.fft import api as fft_api
    from hisstools_library_tpu.fft import pallas_kernels as pk
    t2 = L // h2

    def farfft_fn(mir, s, xx):
        del mir
        frames = jnp.concatenate(
            [jnp.zeros((C, 1, h2), jnp.float32),
             xx.reshape(C, t2, h2)[:, :-1]], axis=-2)
        frames = jnp.concatenate([frames, xx.reshape(C, t2, h2)], axis=-1)
        re, im = fft_api.rfft(frames, backend=backend)
        return s, re[..., :1]

    def farmac_fn(mir, s, xx):
        hist_re, hist_im, xre, xim = s
        hr = jnp.broadcast_to(mir.far.re, (C, p2, h2))
        hi = jnp.broadcast_to(mir.far.im, (C, p2, h2))
        yre, yim, nre, nim = pk.lag_mac_ring(hist_re, hist_im, xre, xim,
                                             hr, hi)
        del xx
        return (nre, nim, xre, xim), yre[..., :1]

    def farmac0():
        r = jnp.zeros((C, p2, h2), jnp.float32)
        xs = jnp.zeros((C, t2, h2), jnp.float32)
        return (r, r, xs, xs)

    def fartail_fn(mir, s, xx):
        del mir, xx
        yre, yim = s
        out = pallas_fft.rifft_packed_tail(yre, yim, scale=1.0 / (4.0 * 2 * h2))
        return s, out[..., :1]

    def fartail0():
        z = jnp.zeros((C, t2, h2), jnp.float32)
        return (z, z)

    # single-tier ring MAC alone (t=16, p=P, k=h)
    p1 = ir.spectra[-1].shape[-2]

    def onemac_fn(mir, s, xx):
        hist_re, hist_im, xre, xim = s
        hr = jnp.broadcast_to(mir.spectra[-1].re, (C, p1, h))
        hi = jnp.broadcast_to(mir.spectra[-1].im, (C, p1, h))
        yre, yim, nre, nim = pk.lag_mac_ring(hist_re, hist_im, xre, xim,
                                             hr, hi)
        del xx
        return (nre, nim, xre, xim), yre[..., :1]

    def onemac0():
        r = jnp.zeros((C, p1, h), jnp.float32)
        xs = jnp.zeros((C, L // h, h), jnp.float32)
        return (r, r, xs, xs)

    def dummy0():
        return (jnp.zeros((), jnp.int32),)

    # raw mega stream kernel at the far shape, no process_block glue
    def farmega_fn(mir, s, xx):
        ring_re, ring_im, prev = s
        y, nr, ni = pallas_fft.fastfir_chain_stream(
            xx.reshape(C, t2, h2), prev, ring_re, ring_im,
            mir.far.re, mir.far.im, scale=1.0 / (8.0 * h2))
        return (nr, ni, xx.reshape(C, t2, h2)[:, -1]), y[..., :1]

    def farmega0():
        z = jnp.zeros((C, p2, h2), jnp.float32)
        return (z, z, jnp.zeros((C, h2), jnp.float32))

    # raw offline chain kernel on the same hops (stateless reference)
    def faroff_fn(mir, s, xx):
        y = pallas_fft.fastfir_chain(
            xx.reshape(C, t2, h2), mir.far.re, mir.far.im,
            scale=1.0 / (8.0 * h2))
        return s, y[..., :1]

    def slope_carry(label, fn, s0, m=6):
        """Like slope() but the state CARRIES across chains (the bench's
        pattern) instead of re-initialising to zeros per chain — isolates
        whether warm state data explains the bench-vs-probe delta."""
        stepf = jax.jit(fn, donate_argnums=(1,))
        carried = {"s": s0()}

        def chain(k):
            y = None
            for _ in range(k):
                carried["s"], y = stepf(ir, carried["s"], x)
            return y

        sync(chain(2))

        def best(k):
            b = np.inf
            for _ in range(3):
                t0 = time.time()
                yy = chain(k)
                sync(yy)
                b = min(b, time.time() - t0)
            return b

        t1, t2 = best(m), best(2 * m)
        ms = (t2 - t1) / m * 1e3
        print(f"{label:34s} {ms:8.2f} ms/pass  (chains {t1*1e3:.0f}/{t2*1e3:.0f})",
              flush=True)
        return ms

    which = os.environ.get("PROBE", "near,nearn,far,hist,two,one").split(",")
    if "two_carry" in which:
        slope_carry("two-tier composed (carried state)", two_fn, two0)
    if "one_carry" in which:
        slope_carry("single-tier (carried state)", one_fn, one0)
    if "farmega" in which:
        slope("far mega kernel (raw)", farmega_fn, farmega0, donate=False)
    if "faroff" in which:
        slope("far offline kernel (stateless)", faroff_fn, dummy0,
              donate=False)
    if "farfft" in which:
        slope("far rfft (T2+1 frames)", farfft_fn, dummy0, donate=False)
    if "onemac" in which:
        slope("single-tier ring MAC", onemac_fn, onemac0, donate=False)
    if "farmac" in which:
        slope("far ring MAC", farmac_fn, farmac0, donate=False)
    if "fartail" in which:
        slope("far tail riFFT", fartail_fn, fartail0, donate=False)
    if "near" in which:
        slope("near (P1 lags + lag0)", near_fn, near0)
    if "nearn" in which:
        slope("near (no lag0)", nearn_fn, near0)
    if "far" in which:
        slope("far (P2 at H2)", far_fn, far0)
    if "hist" in which:
        slope("hist push", hist_fn, hist0)
    if "two" in which:
        slope("two-tier composed", two_fn, two0)
    if "one" in which:
        slope("single-tier collapsed", one_fn, one0)


if __name__ == "__main__":
    main()
