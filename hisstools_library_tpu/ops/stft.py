"""Windowed STFT analysis and resynthesis.

The reference composes this from its parts — window generation (WindowFunctions),
zip/unzip + rFFT framing (HISSTools_FFT), per-bin spectral ops (SpectralFunctions)
— as HIRT and the plugins do. Here the composition is provided directly, batched
over channels and frames, with the library's packed-spectrum convention so every
``ir_*`` op applies per frame unchanged.

- :func:`stft`  — frame, window, rfft -> packed Split (..., frames, N/2)
- :func:`istft` — rifft, synthesis window, overlap-add with COLA normalisation
  (least-squares inversion: divide by the summed squared window)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.types import Split
from ..fft import api as fft_api


def num_frames(length: int, fft_size: int, hop: int) -> int:
    return max(0, 1 + (length - fft_size) // hop) if length >= fft_size else 0


def stft(x: jax.Array, window, fft_size: int, hop: int,
         pad: bool = True, boundary: bool = False,
         backend: Optional[str] = None) -> Split:
    """Packed STFT. ``x``: (..., L); ``window``: host or device array of
    ``fft_size`` samples (e.g. ``windows.hann(N-1)`` — N points). With ``pad`` the
    signal is zero-padded so every sample is covered by a whole frame; with
    ``boundary`` it is additionally padded by ``fft_size - hop`` on the left so
    edge samples get full window coverage (pass the same flag to :func:`istft`)."""
    w = jnp.asarray(np.asarray(window, np.float64)[:fft_size], x.dtype)
    L = x.shape[-1]
    if boundary:
        lead_pad = fft_size - hop
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(lead_pad, lead_pad)])
        L = x.shape[-1]
    if pad:
        total = int(np.ceil(max(L - fft_size, 0) / hop)) * hop + fft_size
        if total > L:
            x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, total - L)])
        L = total
    t = num_frames(L, fft_size, hop)
    starts = np.arange(t) * hop
    idx = starts[:, None] + np.arange(fft_size)[None, :]
    frames = x[..., idx] * w  # (..., T, N)
    return Split(*fft_api.rfft(frames, backend=backend))


def istft(spec: Split, window, hop: int, length: Optional[int] = None,
          boundary: bool = False, backend: Optional[str] = None,
          eps: float = 1e-10) -> jax.Array:
    """Least-squares inverse STFT: synthesis-windowed overlap-add divided by the
    overlapped squared-window envelope (exact for any window/hop with full
    coverage)."""
    bins = spec.shape[-1]
    n = bins * 2
    t = spec.shape[-2]
    w64 = np.asarray(window, np.float64)[:n]
    w = jnp.asarray(w64, spec.dtype)

    frames = fft_api.rifft(spec.re, spec.im, backend=backend) * (0.5 / n)
    frames = frames * w  # synthesis window

    total = (t - 1) * hop + n
    # Overlap-add via scatter-add on a static index map.
    starts = np.arange(t) * hop
    idx = starts[:, None] + np.arange(n)[None, :]  # (T, N)
    lead = frames.shape[:-2]
    y = jnp.zeros(lead + (total,), frames.dtype)
    y = y.at[..., idx.reshape(-1)].add(frames.reshape(lead + (t * n,)))

    # COLA normalisation envelope (host-side, static).
    env = np.zeros(total)
    wsq = w64 * w64
    for s in starts:
        env[s:s + n] += wsq
    env = np.maximum(env, eps)
    y = y / jnp.asarray(env, frames.dtype)
    if boundary:
        lead_pad = n - hop
        y = y[..., lead_pad:]
    if length is not None:
        y = y[..., :length]
    return y


def stft_roundtrip_scale_check() -> Tuple[float, float]:
    """The forward x2 packing and the 0.5/N inverse cancel: documented identity."""
    return 2.0, 0.5
