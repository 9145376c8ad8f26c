"""FFT public API with HISSTools/vDSP-compatible packing and scaling.

This is the TPU-native counterpart of the reference C API
(/root/reference/HISSTools_FFT/HISSTools_FFT.h:87-369). The reference exposes
create/destroy setup + in-place transforms over split-complex pointers; here the
equivalent surface is a set of pure functions over arrays (split-complex layout,
batched over any leading axes). "Setup" (twiddle tables,
HISSTools_FFT_Core.h:414-448) has no user-facing role — plans/twiddles are cached
per-size inside the matmul backend and baked into the compiled XLA program.

Conventions (bit-compatible with the reference; see SURVEY.md §3.5):

- ``fft(re, im)``      : unscaled DFT of a complex signal.
- ``ifft(re, im)``     : **unscaled** inverse (N x the textbook IDFT), the reference
                         implements this as an FFT with the planes swapped
                         (HISSTools_FFT_Core.h:1341-1346).
- ``rfft(x)``          : real FFT of size N -> N/2 packed bins, scaled **x2** vs the
                         textbook DFT; DC in ``re[0]``, Nyquist packed in ``im[0]``
                         (HISSTools_FFT_Core.h:934-988).
- ``rifft(re, im)``    : unscaled inverse of the packed layout such that
                         ``rifft(rfft(x)) == 2 * N * x``.
- ``zip/unzip``        : interleave <-> split conversions (HISSTools_FFT.h:295-369).

Scale factors downstream therefore match the reference exactly: ``1/(4N)`` in
partitioned convolution (PartitionedConvolve.cpp:232-241), ``0.25/N`` in real
spectral binary ops (SpectralProcessor.hpp:643), ``0.5/N`` in ``change_phase``
(SpectralProcessor.hpp:207).

Backends: ``"xla"`` lowers to the XLA FFT HLO; ``"matmul"`` evaluates the transform
as (four-step) DFT matrix multiplications on the MXU — the fast path for the batched
small/mid sizes that dominate partitioned convolution.

Precision / float64: the reference offers f32 and f64 overloads
(HISSTools_FFT.h:87-369). TPUs have no native f64 — on TPU-like platforms this
API serves f32 (the pallas backend's "highest" MXU mode reaches ~134 dB, within
~6 dB of what an f64-input/f32-twiddle pipeline could deliver). float64 arrays
are routed explicitly: the pallas backend rejects them with a TypeError
(convert with ``.astype(jnp.float32)`` or pass ``backend="xla"``), while the
xla/matmul backends accept them where the platform does (CPU with
``jax_enable_x64`` — the configuration the test-suite oracles use).

For genuine high precision ON TPU use the double-float mode
(:mod:`fft.df64` — ``rfft_df64``/``rifft_df64``/``fft_df64``): every value
rides as an (hi, lo) f32 pair through compensated (Dekker) arithmetic,
delivering ~280-295 dB round trips (measured) — the on-device counterpart of
the reference's f64 overloads. It is a precision mode (VPU elementwise, no
MXU path); the matmul/pallas backends remain the throughput path.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.types import Split

# Max size parity with the reference: setups up to 2^28 (HISSTools_FFT.h:87-98).
MAX_FFT_SIZE_LOG2 = 28

_DEFAULT_BACKEND: Optional[str] = None  # None = per-platform auto


def set_default_backend(name: Optional[str]) -> None:
    """Set the process-wide default FFT backend ("xla", "matmul", "pallas"),
    or None to restore the per-platform automatic choice."""
    global _DEFAULT_BACKEND
    if name is not None and name not in ("xla", "matmul", "pallas"):
        raise ValueError(f"unknown FFT backend {name!r}")
    _DEFAULT_BACKEND = name


def get_default_backend() -> Optional[str]:
    return _DEFAULT_BACKEND


def _resolve(backend: Optional[str]) -> str:
    if backend is not None:
        return backend
    if _DEFAULT_BACKEND is not None:
        return _DEFAULT_BACKEND
    # Platform-aware default: XLA's TPU FFT runs its twiddles in f32 and is
    # only ~40-60 dB accurate at these sizes; the pallas/matmul backends hold
    # >100 dB there. On CPU jnp.fft is exact and fastest. The pallas default is
    # gated on TPU-like platforms only (the axon plugin presents the TPU as a
    # distinct backend name) — on any other accelerator the pltpu kernels would
    # fail to lower, so fall back to the XLA FFT there.
    name = jax.default_backend()
    if name == "cpu":
        return "xla"
    platform = jax.devices()[0].platform
    return "pallas" if ("tpu" in name or "axon" in name
                        or "tpu" in platform or "axon" in platform) else "xla"


def _check_pallas_dtype(resolved: str, dtype) -> None:
    """Route f64 requests explicitly (the reference has true f64 overloads,
    HISSTools_FFT.h:87-369; TPU does not): the pallas kernels are f32-only, so
    fail with guidance instead of a deep Mosaic lowering error."""
    if resolved == "pallas" and dtype == jnp.float64:
        raise TypeError(
            "the pallas FFT backend is float32-only (TPU has no native f64); "
            "cast with .astype(jnp.float32) — mode='highest' holds ~134 dB — "
            "or pass backend='xla'/'matmul' on an f64-capable platform")


def _log2_size(n: int) -> int:
    if n <= 0:
        # bit_length()-1 would be -1 and `1 << -1` raises a bare
        # "negative shift count" before the real message below.
        raise ValueError(f"FFT size must be a positive power of two, got {n}")
    log2n = n.bit_length() - 1
    if (1 << log2n) != n:
        raise ValueError(f"FFT size must be a power of two, got {n}")
    if log2n > MAX_FFT_SIZE_LOG2:
        raise ValueError(f"FFT size 2^{log2n} exceeds max 2^{MAX_FFT_SIZE_LOG2}")
    return log2n


# Whole-array staged execution envelope, measured on a real TPU v5e with
# tools/fft_sweep.py (round 3): the staged four-step (matmul_fft) executes up
# to 2^25 in one program; 2^26..2^28 abort inside the TPU compiler (oversized
# temporaries). The reference supports setups to 2^28
# (HISSTools_FFT/HISSTools_FFT.h:87-98) — above the staged envelope the API
# routes 1-D transforms to the distributed four-step (parallel/fft_sharded.py)
# when more than one device is available, and otherwise to the single-chip
# out-of-core chunked four-step (fft/oversize.py), which covers the full
# 2^26..2^28 range on ONE chip (round 4). Batches above the envelope loop the
# out-of-core transform over the leading axes (jax.lax.map, round 5) — HBM
# capacity, not the compiler, bounds the batch.
MAX_SINGLE_CHIP_LOG2 = 25

# Measured crossover (round 5, tools/fft_crossover.py on v5e): the chunked
# out-of-core four-step BEATS the whole-array staged path at every 1-D size
# probed — 2^20 3.1 vs 8.6 ms, 2^21 7.0 vs 17.3, 2^22 11.3 vs 34.8, 2^25
# 80.5 vs 791.8 (roundtrip, ~131-132 dB both) — the staged whole-array
# transposes thrash HBM. 1-D transforms at or above this size route
# out-of-core on TPU regardless of backend; 2^20 stays with the pallas
# split-pair kernels (the batched engine path).
OVERSIZE_PREFERRED_LOG2 = 21


def _on_tpu() -> bool:
    name = jax.default_backend()
    if name == "cpu":
        return False
    platform = jax.devices()[0].platform
    return ("tpu" in name or "axon" in name or "tpu" in platform
            or "axon" in platform)


def _route_large(n: int, ndim: int, real: bool):
    """Routing for large transforms on TPU.

    Returns None (no special routing / not TPU), a Mesh (multi-device sharded
    handoff), or the string "oversize" (single-chip out-of-core path). Applies
    to EVERY backend on TPU — including backend="xla", whose >2^25 program
    hits the same compiler abort (advisor round-3 finding)."""
    if not _on_tpu():
        return None
    if n <= (1 << MAX_SINGLE_CHIP_LOG2):
        if ndim == 1 and n >= (1 << OVERSIZE_PREFERRED_LOG2):
            return "oversize"  # measured faster at every probed size
        return None
    if ndim != 1:
        # Batches above the envelope loop the out-of-core transform over the
        # leading axes (jax.lax.map — sequential, chunk-resident); the
        # distributed handoff stays 1-D (its transpose algorithm shards the
        # transform axis itself). HBM bounds the batch, not the compiler.
        return "oversize"
    from ..parallel.fft_sharded import real_sharded_eligible, sharded_eligible
    from ..parallel.mesh import make_mesh
    d = len(jax.devices())
    eligible = real_sharded_eligible if real else sharded_eligible
    if d > 1 and eligible(n, d):
        return make_mesh(channel=1, block=d)
    return "oversize"


# -----------------------------------------------------------------------------
# Complex transforms (split layout, unscaled like the reference)
# -----------------------------------------------------------------------------

def fft(re: jax.Array, im: jax.Array, backend: Optional[str] = None) -> Tuple[jax.Array, jax.Array]:
    """Unscaled complex DFT along the last axis (reference hisstools_fft)."""
    n = re.shape[-1]
    _log2_size(n)
    resolved = _resolve(backend)
    route = _route_large(n, re.ndim, real=False)
    if route == "oversize":
        from .oversize import fft_split_oversize
        if re.ndim == 1:
            return fft_split_oversize(re, im, inverse=False)
        lead = re.shape[:-1]
        fr, fi = jax.lax.map(
            lambda ab: fft_split_oversize(ab[0], ab[1], inverse=False),
            (re.reshape(-1, n), im.reshape(-1, n)))
        return fr.reshape(*lead, n), fi.reshape(*lead, n)
    if route is not None:
        from ..parallel.fft_sharded import fft_sharded
        return fft_sharded(route, re, im)
    if resolved == "matmul":
        from . import matmul_fft
        return matmul_fft.fft_split(re, im, inverse=False)
    if resolved == "pallas":
        _check_pallas_dtype(resolved, re.dtype)
        from . import pallas_fft
        return pallas_fft.fft_split(re, im, inverse=False)
    z = jnp.fft.fft(jax.lax.complex(re, im), axis=-1)
    return jnp.real(z).astype(re.dtype), jnp.imag(z).astype(re.dtype)


def ifft(re: jax.Array, im: jax.Array, backend: Optional[str] = None) -> Tuple[jax.Array, jax.Array]:
    """Unscaled inverse complex DFT (= N x IDFT). Reference hisstools_ifft, which is
    an FFT with real/imag planes swapped (HISSTools_FFT_Core.h:1341-1346)."""
    # DFT(swap(z)) then swap back == N * IDFT(z)
    fr, fi = fft(im, re, backend=backend)
    return fi, fr


# -----------------------------------------------------------------------------
# Real transforms with vDSP packing
# -----------------------------------------------------------------------------

def rfft(x: jax.Array, backend: Optional[str] = None) -> Tuple[jax.Array, jax.Array]:
    """Real FFT of size N -> packed N/2-bin split spectrum (x2 scale, Nyquist in im[0]).

    Equivalent of in-place ``hisstools_rfft`` on pre-zipped data
    (HISSTools_FFT.cpp:123-131). For the out-of-place zero-padding overload use
    :func:`rfft_padded`.
    """
    n = x.shape[-1]
    _log2_size(n)
    if n == 1:
        raise ValueError("rfft requires N >= 2")
    resolved = _resolve(backend)
    route = _route_large(n, x.ndim, real=True)
    if route == "oversize":
        from .oversize import rfft_packed_oversize
        if x.ndim == 1:
            return rfft_packed_oversize(x)
        lead = x.shape[:-1]
        re, im = jax.lax.map(rfft_packed_oversize, x.reshape(-1, n))
        return (re.reshape(*lead, n // 2), im.reshape(*lead, n // 2))
    if route is not None:
        from ..parallel.fft_sharded import rfft_sharded
        return rfft_sharded(route, x)
    if resolved == "matmul":
        from . import matmul_fft
        return matmul_fft.rfft_packed(x)
    if resolved == "pallas":
        _check_pallas_dtype(resolved, x.dtype)
        from . import pallas_fft
        return pallas_fft.rfft_packed(x)
    z = jnp.fft.rfft(x, axis=-1)  # N/2 + 1 bins
    re = 2.0 * jnp.real(z).astype(x.dtype)
    im = 2.0 * jnp.imag(z).astype(x.dtype)
    # Pack Nyquist (purely real) into im[0]; drop the explicit Nyquist bin.
    im = jnp.concatenate([re[..., -1:], im[..., 1:-1]], axis=-1)
    re = re[..., :-1]
    return re, im


def rfft_padded(x: jax.Array, fft_size: int, backend: Optional[str] = None) -> Tuple[jax.Array, jax.Array]:
    """Zero-pad the signal to ``fft_size`` then :func:`rfft`.

    Equivalent of the out-of-place ``hisstools_rfft`` overload
    (HISSTools_FFT.h:180-208) which zero-pads ``in_length`` samples to the FFT size.
    """
    n = x.shape[-1]
    if n > fft_size:
        x = x[..., :fft_size]
    elif n < fft_size:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, fft_size - n)]
        x = jnp.pad(x, pad)
    return rfft(x, backend=backend)


def rifft(re: jax.Array, im: jax.Array, backend: Optional[str] = None) -> jax.Array:
    """Unscaled inverse of the packed real spectrum: ``rifft(rfft(x)) == 2N x``.

    Reference ``hisstools_rifft`` (HISSTools_FFT.h:244-282). Given packed values
    interpreted as ``Z``, returns ``N * IDFT(unpack(Z))``.
    """
    nbins = re.shape[-1]
    n = nbins * 2
    _log2_size(n)
    resolved = _resolve(backend)
    route = _route_large(n, re.ndim, real=True)
    if route == "oversize":
        from .oversize import rifft_packed_oversize
        if re.ndim == 1:
            return rifft_packed_oversize(re, im)
        lead = re.shape[:-1]
        y = jax.lax.map(lambda ab: rifft_packed_oversize(ab[0], ab[1]),
                        (re.reshape(-1, nbins), im.reshape(-1, nbins)))
        return y.reshape(*lead, n)
    if route is not None:
        from ..parallel.fft_sharded import rifft_sharded
        return rifft_sharded(route, re, im)
    if resolved == "matmul":
        from . import matmul_fft
        return matmul_fft.rifft_packed(re, im)
    if resolved == "pallas":
        _check_pallas_dtype(resolved, re.dtype)
        from . import pallas_fft
        return pallas_fft.rifft_packed(re, im)
    dtype = re.dtype
    dc = re[..., :1]
    nyq = im[..., :1]
    body_re = re[..., 1:]
    body_im = im[..., 1:]
    full_re = jnp.concatenate([dc, body_re, nyq], axis=-1)
    full_im = jnp.concatenate([jnp.zeros_like(dc), body_im, jnp.zeros_like(nyq)], axis=-1)
    z = jax.lax.complex(full_re, full_im)
    # rifft(Z) = N * IDFT_hermitian(Z): numpy irfft includes the 1/N, so multiply by
    # N. Round trip: rfft gives 2X, irfft(2X) = 2x, * N = 2Nx — matching the
    # reference identity rifft(rfft(x)) == 2N x.
    y = jnp.fft.irfft(z, n=n, axis=-1) * float(n)
    return y.astype(dtype)


# -----------------------------------------------------------------------------
# zip / unzip (interleaved <-> split conversions)
# -----------------------------------------------------------------------------

def unzip(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Even samples -> re, odd samples -> im (reference hisstools_unzip,
    HISSTools_FFT.h:333-345). Input length must be even."""
    return x[..., 0::2], x[..., 1::2]


def zip_split(re: jax.Array, im: jax.Array) -> jax.Array:
    """Interleave split planes back to a single array (reference hisstools_zip,
    HISSTools_FFT.h:357-369)."""
    return jnp.stack([re, im], axis=-1).reshape(*re.shape[:-1], re.shape[-1] * 2)


def unzip_zero(x: jax.Array, fft_size: int) -> Tuple[jax.Array, jax.Array]:
    """Unzip ``min(len, fft_size)`` samples into an fft_size/2 split buffer, zero
    padding the remainder (reference hisstools_unzip_zero, HISSTools_FFT.h:295-321;
    core unzip_zero HISSTools_FFT_Core.h:1258-1287). Handles odd input lengths by
    zeroing the dangling imaginary slot."""
    n = x.shape[-1]
    take = min(n, fft_size)
    x = x[..., :take]
    if take < fft_size:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, fft_size - take)]
        x = jnp.pad(x, pad)
    return unzip(x)


# -----------------------------------------------------------------------------
# Convenience: packed <-> standard complex-bin conversion helpers
# -----------------------------------------------------------------------------

def pack_spectrum(re_full: jax.Array, im_full: jax.Array) -> Split:
    """(N/2+1)-bin textbook spectrum -> packed N/2-bin Split with the 2x scale."""
    re = 2.0 * re_full
    im = 2.0 * im_full
    im = jnp.concatenate([re[..., -1:], im[..., 1:-1]], axis=-1)
    return Split(re[..., :-1], im)


def unpack_spectrum(s: Split) -> Tuple[jax.Array, jax.Array]:
    """Packed N/2-bin Split -> (N/2+1)-bin textbook spectrum (undo the 2x scale)."""
    dc = s.re[..., :1]
    nyq = s.im[..., :1]
    re = jnp.concatenate([dc, s.re[..., 1:], nyq], axis=-1) * 0.5
    zeros = jnp.zeros_like(dc)
    im = jnp.concatenate([zeros, s.im[..., 1:], zeros], axis=-1) * 0.5
    return re, im
