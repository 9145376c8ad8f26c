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
    assert choose_fft_size(480000, 480000) == 1 << 17
    assert 32 <= choose_fft_size(10, 10) <= 1 << 17
    assert choose_fft_size(10_000_000, 1) == 1 << 17
