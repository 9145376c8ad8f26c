"""Per-stage SNR debugging against float64 oracles.

SURVEY §5 promises optional per-block debug dumps — "SNR vs reference per
stage". This module delivers that observability: :func:`stage_report` runs the
uniform partitioned-convolution chain stage by stage with the SAME framework
functions the engine dispatches to (so the f32 side exercises the real
kernels, including the Pallas MAC), mirrors every stage in float64 numpy, and
reports the SNR at each boundary. An accuracy regression is thereby localised
to the stage that introduced it:

- ``impulse_spectra``: IR chunk rFFTs (PartitionedConvolve::set analogue,
  reference PartitionedConvolve.cpp:173-225),
- ``hop_rfft``: per-hop input frame spectra (:352-360),
- ``partition_mac``: the frequency-domain lag MAC (:387-426),
- ``rifft_overlap``: the scaled riFFT + overlap-save half (:232-241, 352-377),
- ``engine_output``: the production engine's actual output (whatever fused
  path it selects) vs float64 direct convolution.

Opt-in runtime hook: set ``HISSTOOLS_DEBUG_STAGES=1`` and the offline engine
entry points (:class:`models.offline.FastFIR` calls,
:meth:`models.mono.MonoConvolve.process_offline`) print a report to stderr on
each non-traced call. Under ``jit`` the engines cannot emit host-side dumps —
call :func:`stage_report` directly with the same inputs instead.
"""

from __future__ import annotations

import dataclasses
import os
import sys
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Split

ENV_FLAG = "HISSTOOLS_DEBUG_STAGES"


def enabled() -> bool:
    return os.environ.get(ENV_FLAG, "0") not in ("0", "")


@dataclasses.dataclass
class StageSNR:
    stage: str
    snr_db: float


def snr_db(ref, test) -> float:
    ref = np.asarray(ref, np.float64)
    err = np.asarray(test, np.float64) - ref
    d = float((err * err).sum())
    if d == 0.0:
        return float("inf")
    denom = float((ref * ref).sum())
    return 10.0 * np.log10(max(denom, 1e-300) / d)


# -- float64 oracles of the packed-spectrum conventions -----------------------

def packed_rfft64(frames: np.ndarray):
    """float64 packed rFFT (x2 scale, Nyquist in im[0] — fft/api.rfft)."""
    z = np.fft.rfft(np.asarray(frames, np.float64), axis=-1)
    re = 2.0 * z.real
    im = 2.0 * z.imag
    im = np.concatenate([re[..., -1:], im[..., 1:-1]], axis=-1)
    return re[..., :-1], im


def packed_rifft64(re, im):
    """float64 unscaled packed inverse: rifft(rfft(x)) == 2N x."""
    re = np.asarray(re, np.float64)
    im = np.asarray(im, np.float64)
    n = re.shape[-1] * 2
    full = np.concatenate(
        [re[..., :1], re[..., 1:] + 1j * im[..., 1:], im[..., :1]], axis=-1)
    return np.fft.irfft(full, n=n, axis=-1) * float(n)


def packed_mul64(ar, ai, br, bi):
    """float64 packed product (DC/Nyquist lanes multiply independently)."""
    re = ar * br - ai * bi
    im = ar * bi + ai * br
    re[..., 0] = ar[..., 0] * br[..., 0]
    im[..., 0] = ai[..., 0] * bi[..., 0]
    return re, im


# -- the staged chain ---------------------------------------------------------

def stage_report(ir, x, fft_size: Optional[int] = None,
                 backend: Optional[str] = None,
                 mac_backend: str = "auto") -> List[StageSNR]:
    """Per-stage SNR of the uniform partitioned offline chain.

    ``ir``: (..., L_ir) host or device array; ``x``: (..., L) signal with the
    same leading shape. The f32 side runs the framework's own stage functions
    (fft.api.rfft, models.partitioned._lag_mac_dispatch, fft.api.rifft) plus
    the production engine end to end; each is compared against its float64
    numpy mirror. The scheme engines' offline path delegates to this same
    chain (mono.process_offline -> offline tail), so one report covers them.
    """
    from ..fft import api as fft_api
    from ..models import partitioned as part
    from ..models.offline import FastFIR, choose_fft_size

    ir = np.asarray(ir)
    x_np = np.asarray(jax.device_get(x), np.float64)
    n = fft_size or choose_fft_size(ir.shape[-1])
    h = n >> 1

    report: List[StageSNR] = []

    # Stage 1: impulse spectra (IR chunk rFFTs).
    spectra = part.impulse_spectra(ir, n, 0, 0, jnp.float32, backend)
    p = spectra.shape[-2]
    chunks = np.zeros(ir.shape[:-1] + (p * h,), np.float64)
    chunks[..., :ir.shape[-1]] = ir
    frames64 = chunks.reshape(ir.shape[:-1] + (p, h))
    frames64 = np.concatenate([frames64, np.zeros_like(frames64)], axis=-1)
    sre64, sim64 = packed_rfft64(frames64)
    report.append(StageSNR(
        "impulse_spectra",
        min(snr_db(sre64, spectra.re), snr_db(sim64, spectra.im))))

    # Stage 2: hop spectra of the signal ([prev | cur] frames, zero history).
    L = x_np.shape[-1]
    t = -(-L // h)
    blocks = np.zeros(x_np.shape[:-1] + (t * h,), np.float64)
    blocks[..., :L] = x_np
    blocks = blocks.reshape(x_np.shape[:-1] + (t, h))
    prev = np.concatenate(
        [np.zeros_like(blocks[..., :1, :]), blocks[..., :-1, :]], axis=-2)
    hop_frames64 = np.concatenate([prev, blocks], axis=-1)
    xre, xim = fft_api.rfft(jnp.asarray(hop_frames64, jnp.float32),
                            backend=backend)
    xre64, xim64 = packed_rfft64(hop_frames64)
    report.append(StageSNR(
        "hop_rfft", min(snr_db(xre64, xre), snr_db(xim64, xim))))

    # Stage 3: partition MAC (the engine's own dispatch on the f32 side;
    # feed both sides the f64-exact spectra so the stage is isolated).
    lags = min(p, t)
    pad = np.zeros(xre64.shape[:-2] + (lags,) + xre64.shape[-1:])
    xp_re64 = np.concatenate([pad, xre64], axis=-2)
    xp_im64 = np.concatenate([pad, xim64], axis=-2)
    acc_re, acc_im = part._lag_mac_dispatch(
        jnp.asarray(xp_re64, jnp.float32), jnp.asarray(xp_im64, jnp.float32),
        jnp.asarray(sre64[..., :lags, :], jnp.float32),
        jnp.asarray(sim64[..., :lags, :], jnp.float32), t, mac_backend)
    acc_re64 = np.zeros_like(xre64)
    acc_im64 = np.zeros_like(xim64)
    for lag in range(lags):
        a, b = packed_mul64(xp_re64[..., lags - 1 - lag:, :][..., :t, :],
                            xp_im64[..., lags - 1 - lag:, :][..., :t, :],
                            sre64[..., lag:lag + 1, :],
                            sim64[..., lag:lag + 1, :])
        acc_re64 += a
        acc_im64 += b
    report.append(StageSNR(
        "partition_mac", min(snr_db(acc_re64, acc_re),
                             snr_db(acc_im64, acc_im))))

    # Stage 4: riFFT + 1/(4N) + overlap-save half (from f64-exact accums).
    y32 = fft_api.rifft(jnp.asarray(acc_re64, jnp.float32),
                        jnp.asarray(acc_im64, jnp.float32),
                        backend=backend) * (1.0 / (4.0 * n))
    y64 = packed_rifft64(acc_re64, acc_im64) * (1.0 / (4.0 * n))
    report.append(StageSNR(
        "rifft_overlap", snr_db(y64[..., h:], y32[..., h:])))

    # Stage 5: the production engine end to end (whatever fused path it
    # takes) vs float64 direct convolution. FastFIR.apply (not __call__):
    # the instance hook would re-enter this report when the env flag is set.
    out = jax.device_get(FastFIR.apply(
        spectra, jnp.asarray(x_np, jnp.float32), backend=backend,
        mac_backend=mac_backend))
    ref = _direct_conv64(x_np, ir)[..., :L]
    report.append(StageSNR("engine_output", snr_db(ref, out)))
    return report


def _direct_conv64(x: np.ndarray, ir: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float64)
    ir = np.asarray(ir, np.float64)
    if x.ndim == 1 and ir.ndim == 1:
        return np.convolve(x, ir)[: x.shape[-1]]
    shape = np.broadcast_shapes(x.shape[:-1], ir.shape[:-1])
    xb = np.broadcast_to(x, shape + x.shape[-1:])
    hb = np.broadcast_to(ir, shape + ir.shape[-1:])
    out = np.empty(shape + x.shape[-1:])
    for idx in np.ndindex(*shape):
        out[idx] = np.convolve(xb[idx], hb[idx])[: x.shape[-1]]
    return out


def format_report(stages: List[StageSNR]) -> str:
    width = max(len(s.stage) for s in stages)
    return "\n".join(f"  {s.stage:<{width}}  {s.snr_db:8.1f} dB"
                     for s in stages)


def maybe_report(ir, x, fft_size: Optional[int], backend: Optional[str],
                 tag: str) -> None:
    """Engine hook: print a stage report when HISSTOOLS_DEBUG_STAGES is set
    and the inputs are concrete (skipped silently under tracing)."""
    if not enabled():
        return
    if isinstance(x, jax.core.Tracer):
        return
    stages = stage_report(ir, x, fft_size, backend)
    print(f"[debug-stages] {tag}:\n{format_report(stages)}",
          file=sys.stderr, flush=True)
