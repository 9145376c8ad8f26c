"""Offline (non-real-time) FIR convolution at maximum throughput.

The reference's non-uniform scheme exists to bound *latency* on a sample-streaming
CPU; offline IR processing in the reference goes through a single big FFT
(spectral_processor::convolve). On TPU the throughput-optimal offline form of long
FIR convolution is **uniform partitioned overlap-save with look-ahead**: one
PartitionedConvolve section at a large FFT size with IR offset 0, whose inherent
one-hop delay is removed by shifting the output left (free offline). This keeps
peak memory bounded (unlike one giant FFT) while the fused Pallas MAC makes the
partition count nearly free.

Use :class:`FastFIR` when the same IR convolves many signals (spectra prepared
once), or :func:`fast_fir` for one-shot use.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Split
from . import partitioned as part


def choose_fft_size(ir_len: int) -> int:
    """Pick the uniform FFT size balancing FFT cost (~sqrt(N) per sample on the
    matmul/Pallas path) against partition-MAC cost (~IR/N per sample), bounded
    to the engine's 2^5..2^20 range.

    Sweeps (sync-cancelling slope timing, BASELINE.md): with the whole-chain
    mega-kernel N=2^16 stays optimal for ~10 s IRs (~16 ms/pass vs 18 ms at
    2^15 and 26 ms at 2^14 on v5e)."""
    target = max(ir_len // 8, 2048)
    n = 1 << max(int(np.ceil(np.log2(target))), 11)
    return int(min(max(n, 1 << part.MIN_FFT_SIZE_LOG2), 1 << 17))


class FastFIR:
    """Uniform partitioned offline convolver with prepared spectra."""

    def __init__(self, ir, fft_size: Optional[int] = None, dtype=jnp.float32,
                 backend: Optional[str] = None):
        from ..utils import debug_stages
        ir = np.asarray(ir)
        self.ir_len = ir.shape[-1]
        self.fft_size = fft_size or choose_fft_size(self.ir_len)
        self.hop = self.fft_size >> 1
        self.spectra = part.impulse_spectra(ir, self.fft_size, 0, 0, dtype, backend)
        self.backend = backend
        # Host IR copy kept only when per-stage debugging is on (the report
        # needs the raw taps for its float64 oracles).
        self._ir_debug = ir if debug_stages.enabled() else None

    def __call__(self, x: jax.Array, mac_backend: str = "auto") -> jax.Array:
        """conv(x, ir)[: len(x)] — the steady-state causal convolution.

        When jitting, wrap :meth:`apply` and pass ``self.spectra`` as an argument
        (a closure would bake the spectra into the program as constants)."""
        if self._ir_debug is not None:
            from ..utils import debug_stages
            debug_stages.maybe_report(self._ir_debug, x, self.fft_size,
                                      self.backend, "FastFIR")
        return self.apply(self.spectra, x, backend=self.backend,
                          mac_backend=mac_backend)

    @staticmethod
    def apply(spectra: Split, x: jax.Array, backend: Optional[str] = None,
              mac_backend: str = "auto") -> jax.Array:
        """Pure function: uniform-partitioned offline convolution with look-ahead."""
        if backend == "pallas" and mac_backend in ("auto", "pallas"):
            # Fully-fused chain with the look-ahead folded into its single pad
            # pass (instead of padding here and again inside).
            y = part.PartitionedConvolve._process_offline_fused(
                spectra, x, shift=spectra.shape[-1])
            if y is not None:
                return y
        h = spectra.shape[-1]
        L = x.shape[-1]
        pad = [(0, 0)] * (x.ndim - 1) + [(0, h)]
        xp = jnp.pad(x, pad)
        y = part.PartitionedConvolve.process_offline(
            spectra, xp, backend=backend, mac_backend=mac_backend)
        # The o=0 engine emits conv delayed by one hop; shift left (look-ahead).
        return y[..., h:h + L]


def fast_fir(x: jax.Array, ir, fft_size: Optional[int] = None,
             dtype=None, backend: Optional[str] = None,
             mac_backend: str = "auto") -> jax.Array:
    """One-shot offline convolution: conv(x, ir)[: len(x)]."""
    dtype = dtype or x.dtype
    eng = FastFIR(ir, fft_size, dtype, backend)
    return eng(x, mac_backend=mac_backend)
