"""Benchmark harness: convolved samples/s/chip on the BASELINE.json workload.

Workload: 128 parallel channels, 10 s impulse response at 48 kHz, float32
partitioned convolution on one chip.

Modes (BENCH_MODE env):
- ``fast`` (default): uniform partitioned overlap-save with the fused Pallas
  partition-MAC kernel — the offline/throughput configuration (the reference's
  offline path is spectral_processor's single big FFT; uniform partitioning is the
  memory-bounded TPU equivalent).
- ``scheme``: the zero-latency non-uniform scheme (TD head + 256/1024/4096/16384,
  the reference kLatencyZero preset, MonoConvolve.cpp:26-31) — the real-time-
  capable engine, batched offline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where value is
convolved channel-samples per second per chip and vs_baseline is the real-time
factor against the workload's native rate (128 ch x 48 kHz) — the reference
publishes no absolute numbers (BASELINE.md), so real-time headroom is the
meaningful normalised figure.
"""

import json
import os
import sys
import time

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from hisstools_library_tpu.models import mono
    from hisstools_library_tpu.models.mono import LatencyMode, PartitionScheme
    from hisstools_library_tpu.models.offline import FastFIR

    mode = os.environ.get("BENCH_MODE", "fast")
    channels = int(os.environ.get("BENCH_CHANNELS", "128"))
    fs = int(os.environ.get("BENCH_FS", "48000"))
    ir_seconds = float(os.environ.get("BENCH_IR_SECONDS", "10"))
    sig_seconds = float(os.environ.get("BENCH_SIG_SECONDS", "10"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))

    scheme = PartitionScheme.from_latency(LatencyMode.Zero)
    hop = scheme.sizes[-1] >> 1

    ir_len = int(ir_seconds * fs)
    sig_len = int(np.ceil(sig_seconds * fs / hop)) * hop
    if mode == "stream":
        sig_len = hop * 16  # chain of real-time blocks per timed dispatch

    log(f"bench[{mode}]: {channels}ch, IR {ir_len} samples, signal {sig_len} "
        f"samples, device {jax.devices()[0]}")

    rng = np.random.default_rng(0)
    irs = (rng.standard_normal((channels, ir_len)) *
           np.exp(-np.arange(ir_len) / (0.5 * fs))).astype(np.float32)
    x = rng.standard_normal((channels, sig_len)).astype(np.float32)

    # bf16x3 is the default MXU mode: ~100 dB SNR (target is >=80) at 2x the
    # matmul throughput of Precision.HIGHEST; BENCH_FFT_MODE=highest for ~134 dB.
    fft_mode = os.environ.get("BENCH_FFT_MODE", "bf16x3")
    from hisstools_library_tpu.fft import pallas_fft
    pallas_fft.set_mode(fft_mode)

    backend = os.environ.get("BENCH_FFT_BACKEND", "pallas")
    t0 = time.time()
    if mode == "fast":
        eng = FastFIR(irs, dtype=jnp.float32, backend=backend)
        spectra = eng.spectra
        jax.block_until_ready(spectra.re)
        log(f"FastFIR fft_size {eng.fft_size}, partitions {spectra.shape[-2]}, "
            f"fft backend {backend}; IR prepared in {time.time() - t0:.2f}s")
        fwd = jax.jit(lambda s, x: FastFIR.apply(s, x, backend=backend))
        ir = spectra
    elif mode == "stream":
        # Real-time streaming engine: sequential per-hop scan with carried
        # state (the latency-bounded path, not the offline throughput one).
        ir = mono.prepare_ir(scheme, irs, dtype=jnp.float32, offline_tail=False)
        jax.block_until_ready(ir.head_taps)
        log(f"streaming scheme {scheme.sizes}, block {hop}")
        state0 = mono.init_state(scheme, ir, batch_shape=(channels,))
        step = jax.jit(lambda i, s, xx: mono.process(i, s, xx, backend=backend))

        def fwd(i, xx, _step=step, _s0=state0):
            _, y = _step(i, _s0, xx)
            return y
    else:
        ir = mono.prepare_ir(scheme, irs, dtype=jnp.float32)
        jax.block_until_ready(ir.head_taps)
        log(f"scheme {scheme.sizes} IR spectra prepared in {time.time() - t0:.2f}s "
            f"(partitions: {[s.shape[-2] for s in ir.spectra]})")
        fwd = jax.jit(lambda i, xx: mono.process_offline(i, xx, backend=backend))
    xd = jnp.asarray(x)

    def sync(out):
        # block_until_ready is a no-op under the axon remote backend; a tiny
        # device_get forces the computation to complete.
        np.asarray(out[..., :1])

    t0 = time.time()
    y = fwd(ir, xd)
    sync(y)
    log(f"compile+first run {time.time() - t0:.2f}s")

    # Steady-state timing: the axon tunnel's sync costs ~25ms, so dispatch a chain
    # of iterations and sync once, amortising the fixed round-trip.
    times = []
    for _ in range(3):
        t0 = time.time()
        outs = [fwd(ir, xd) for _ in range(iters)]
        sync(outs[-1])
        times.append((time.time() - t0) / iters)
    best = min(times)
    log(f"times: {[round(t, 4) for t in times]}")

    total_samples = channels * sig_len
    sps = total_samples / best
    realtime_factor = sps / (channels * fs)

    # Sanity: SNR vs float64 oracle on a short prefix of one channel.
    check_len = min(sig_len, 1 << 16)
    ref = np.convolve(x[0].astype(np.float64), irs[0].astype(np.float64))[:check_len]
    err = np.asarray(y[0][:check_len], np.float64) - ref
    snr = 10 * np.log10(np.sum(ref * ref) / max(np.sum(err * err), 1e-300))
    log(f"SNR vs float64 direct conv (ch0, {check_len} samples): {snr:.1f} dB")

    print(json.dumps({
        "metric": "convolved samples/s/chip (128ch x 10s IR partitioned convolve)",
        "value": round(sps, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(realtime_factor, 3),
    }))


if __name__ == "__main__":
    main()
