"""Profiling and roofline accounting helpers.

The reference has no in-library tracing (SURVEY.md §5) — its test drivers carry
ad-hoc wall-clock timers. Here the equivalents are:

- :class:`Timer` — wall-clock timing with forced device synchronisation (the axon
  remote backend's ``block_until_ready`` is a no-op; a 1-element device_get is the
  reliable barrier).
- :func:`trace` — context manager around ``jax.profiler`` for XLA-level traces.
- :func:`convolve_roofline` — analytic bytes/flops model of the partitioned-convolve
  hot loop, for reporting achieved fraction of HBM-bandwidth speed-of-light.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import List, Optional

import numpy as np


def enable_compile_cache(path: str = None) -> str:
    """Enable JAX's persistent compilation cache (works under the axon remote
    compiler: measured 356 s -> 2.5 s for the bench fast path's first run).
    Call before the first jit in benches/tools; the library itself never sets
    process-global config. Returns the cache directory."""
    import os

    import jax

    cache = path or os.environ.get(
        "HISSTOOLS_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache


def sync(out) -> None:
    """Force completion of a device computation (works on the axon backend)."""
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:1])


class Timer:
    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.time()

    def stop(self, out=None) -> float:
        if out is not None:
            sync(out)
        dt = time.time() - self._t0
        self.times.append(dt)
        return dt

    @property
    def best(self) -> float:
        return min(self.times)

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace around a block."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class Roofline:
    flops: float
    bytes: float

    def time_bound(self, peak_flops: float, peak_bw: float) -> float:
        """Speed-of-light seconds on hardware with the given peaks."""
        return max(self.flops / peak_flops, self.bytes / peak_bw)

    def fraction_of_peak(self, measured_seconds: float, peak_flops: float,
                         peak_bw: float) -> float:
        return self.time_bound(peak_flops, peak_bw) / measured_seconds


# TPU v5e (per chip): ~197 TFLOP/s bf16, ~98 TFLOP/s fp32-ish via MXU passes,
# ~819 GB/s HBM. These are public figures for roofline estimates only.
TPU_V5E_PEAK_FLOPS_F32 = 98e12
TPU_V5E_PEAK_BW = 819e9


def convolve_roofline(channels: int, signal_len: int, fft_size: int,
                      num_partitions: int, dtype_bytes: int = 4) -> Roofline:
    """Bytes/flops of one uniform section's offline pass: batched rFFT + lag MAC +
    batched riFFT, assuming ideal fusion (each spectrum read once per MAC pass and
    the accumulator kept on-chip)."""
    h = fft_size // 2
    t = signal_len // h
    bins = h
    # FFTs: 2 x (T frames x 5 N log2 N flops), spectra bytes in/out
    fft_flops = 2 * channels * t * 5.0 * fft_size * np.log2(fft_size)
    # MAC: 8 flops per complex multiply-add per bin per partition
    mac_flops = channels * t * num_partitions * bins * 8.0
    # Ideal traffic: X once, H once, Y once (+ input/output samples)
    traffic = dtype_bytes * channels * (
        2 * t * bins            # X spectra write+...
        + 2 * num_partitions * bins   # H read
        + 2 * t * bins          # Y spectra
        + 2 * signal_len        # raw in + out
    )
    return Roofline(fft_flops + mac_flops, traffic)
