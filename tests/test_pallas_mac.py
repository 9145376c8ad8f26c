"""Pallas lag-MAC kernel (interpret mode on CPU) and FastFIR offline engine."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hisstools_library_tpu.models import partitioned
from hisstools_library_tpu.models.offline import FastFIR, fast_fir, choose_fft_size


def snr_db(ref, test):
    ref = np.asarray(ref, np.float64)
    err = np.asarray(test, np.float64) - ref
    d = np.sum(err * err)
    return np.inf if d == 0 else 10 * np.log10(np.sum(ref * ref) / d)


def test_pallas_mac_matches_xla_loop(rng):
    fft_size = 256  # bins = 128 (one lane tile)
    h = fft_size >> 1
    L = h * 6
    x = rng.standard_normal((2, L)).astype(np.float32)
    ir = rng.standard_normal((2, 700)).astype(np.float32)
    spec = partitioned.impulse_spectra(ir, fft_size, offset=h, dtype=jnp.float32)
    y_xla = partitioned.PartitionedConvolve.process_offline(
        spec, jnp.asarray(x), mac_backend="xla")
    y_pl = partitioned.PartitionedConvolve.process_offline(
        spec, jnp.asarray(x), mac_backend="pallas")
    assert snr_db(np.asarray(y_xla), y_pl) > 130


def test_pallas_mac_bin0_packing(rng):
    # DC/Nyquist lane must use the two real products, not the complex multiply.
    fft_size = 256
    h = fft_size >> 1
    L = h * 4
    # DC-heavy signal + IR makes bin-0 errors visible.
    x = (np.abs(rng.standard_normal((1, L))) + 1.0).astype(np.float32)
    ir = (np.abs(rng.standard_normal((1, 3 * h))) + 1.0).astype(np.float32)
    spec = partitioned.impulse_spectra(ir, fft_size, offset=h, dtype=jnp.float32)
    y = partitioned.PartitionedConvolve.process_offline(
        spec, jnp.asarray(x), mac_backend="pallas")
    masked = np.zeros_like(ir[0], np.float64)
    masked[h:] = ir[0, h:]
    ref = np.convolve(x[0].astype(np.float64), masked)[:L]
    assert snr_db(ref, np.asarray(y)[0]) > 100


def test_fast_fir_matches_convolve(rng):
    L = 4000
    x = rng.standard_normal(L)
    ir = rng.standard_normal(2500)
    y = fast_fir(jnp.asarray(x), ir, fft_size=1024)
    ref = np.convolve(x, ir)[:L]
    assert snr_db(ref, y) > 180


def test_fast_fir_batched_and_prepared(rng):
    L = 2048
    x = rng.standard_normal((3, L))
    ir = rng.standard_normal((3, 900))
    eng = FastFIR(ir, fft_size=512, dtype=jnp.float64)
    y = np.asarray(eng(jnp.asarray(x)))
    for c in range(3):
        assert snr_db(np.convolve(x[c], ir[c])[:L], y[c]) > 180


def test_fast_fir_short_signal_long_ir(rng):
    # IR longer than the signal
    L = 500
    x = rng.standard_normal(L)
    ir = rng.standard_normal(5000)
    y = fast_fir(jnp.asarray(x), ir, fft_size=2048)
    ref = np.convolve(x, ir)[:L]
    assert snr_db(ref, y) > 180


def test_choose_fft_size_bounds():
    assert choose_fft_size(480000) == 1 << 16  # sweep optimum for 10 s IR
    assert 32 <= choose_fft_size(10) <= 1 << 17
    assert choose_fft_size(10_000_000) == 1 << 17


def test_lag_mac_causal_matches_padded(rng):
    """Causal (unpadded) kernel == padded kernel result."""
    import jax.numpy as jnp
    from hisstools_library_tpu.fft.pallas_kernels import lag_mac, lag_mac_causal

    c, t, p, k = 3, 7, 4, 256
    xr = rng.standard_normal((c, t, k)).astype(np.float32)
    xi = rng.standard_normal((c, t, k)).astype(np.float32)
    hr = rng.standard_normal((c, p, k)).astype(np.float32)
    hi = rng.standard_normal((c, p, k)).astype(np.float32)
    pad = np.zeros((c, p, k), np.float32)
    xpr = jnp.asarray(np.concatenate([pad, xr], axis=1))
    xpi = jnp.asarray(np.concatenate([pad, xi], axis=1))
    ar, ai = lag_mac(xpr, xpi, jnp.asarray(hr), jnp.asarray(hi), t, interpret=True)
    br, bi = lag_mac_causal(jnp.asarray(xr), jnp.asarray(xi),
                            jnp.asarray(hr), jnp.asarray(hi), interpret=True)
    np.testing.assert_allclose(np.asarray(br), np.asarray(ar), atol=1e-4)
    np.testing.assert_allclose(np.asarray(bi), np.asarray(ai), atol=1e-4)


def test_rfft_stream_and_tail_kernels(rng):
    """Streaming forward == rfft of concatenated frames; tail inverse ==
    scaled second half of the full inverse."""
    import jax.numpy as jnp
    from hisstools_library_tpu.fft import pallas_fft

    h, t = 2048, 6
    n = 2 * h
    x = rng.standard_normal((2, t * h)).astype(np.float32)
    x2d = jnp.asarray(x.reshape(2, t, h))
    sr, si = pallas_fft.rfft_packed_stream(x2d, interpret=True)
    # oracle: frames [block_{t-1} (zeros for t=0), block_t]
    blocks = np.concatenate([np.zeros((2, 1, h), np.float32),
                             x.reshape(2, t, h)], axis=1)
    frames = np.stack([np.concatenate([blocks[:, i], blocks[:, i + 1]], axis=-1)
                       for i in range(t)], axis=1)
    fr, fi = pallas_fft.rfft_packed(jnp.asarray(frames), interpret=True)
    np.testing.assert_allclose(np.asarray(sr), np.asarray(fr), atol=2e-2)
    np.testing.assert_allclose(np.asarray(si), np.asarray(fi), atol=2e-2)

    scale = 1.0 / (4.0 * n)
    tail = pallas_fft.rifft_packed_tail(sr, si, scale=scale, interpret=True)
    full = pallas_fft.rifft_packed(sr, si, interpret=True) * scale
    np.testing.assert_allclose(np.asarray(tail), np.asarray(full)[..., h:],
                               atol=1e-4)


def test_process_offline_fused_matches_staged(rng):
    """backend="pallas" fused offline chain == staged matmul/xla chain."""
    import jax.numpy as jnp
    from hisstools_library_tpu.core.types import Split
    from hisstools_library_tpu.models import partitioned as part

    fft_size, ir_len, L = 4096, 9000, 20000
    ir = (rng.standard_normal(ir_len) * 0.2).astype(np.float32)
    x = rng.standard_normal((1, L)).astype(np.float32)
    spec = part.impulse_spectra(ir[None], fft_size, 0, 0)
    y_fused = part.PartitionedConvolve.process_offline(
        Split(spec.re, spec.im), jnp.asarray(x), backend="pallas")
    y_ref = part.PartitionedConvolve.process_offline(
        Split(spec.re, spec.im), jnp.asarray(x), backend="matmul",
        mac_backend="xla")
    ref = np.asarray(y_ref, np.float64)
    d = np.asarray(y_fused, np.float64) - ref
    snr = 10 * np.log10((ref * ref).sum() / max((d * d).sum(), 1e-300))
    assert snr > 100.0
