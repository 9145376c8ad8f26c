"""Multichannel Convolver routing tests (reference Convolver/NToMonoConvolve)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hisstools_library_tpu.models import multichannel as mc
from hisstools_library_tpu.models.mono import PartitionScheme


def snr_db(ref, test):
    ref = np.asarray(ref, np.float64)
    err = np.asarray(test, np.float64) - ref
    d = np.sum(err * err)
    return np.inf if d == 0 else 10 * np.log10(np.sum(ref * ref) / d)


SCHEME = PartitionScheme((32, 128), zero_latency=True)


def test_n2m_routing(rng):
    N, M, L, IRL = 3, 2, 64 * 6, 200
    conv = mc.Convolver(N, M, scheme=SCHEME)
    irs = rng.standard_normal((M, N, IRL))
    assert conv.set_all(irs).name == "NONE"
    conv.prepare(dtype=jnp.float64)
    state = conv.init_state(dtype=jnp.float64)
    x = rng.standard_normal((N, L))
    state, y = conv.process(state, jnp.asarray(x))
    assert y.shape == (M, L)
    for o in range(M):
        ref = sum(np.convolve(x[i], irs[o, i])[:L] for i in range(N))
        assert snr_db(ref, np.asarray(y)[o]) > 180


def test_parallel_routing(rng):
    C, L, IRL = 4, 64 * 4, 150
    conv = mc.Convolver(C, scheme=SCHEME)  # parallel N x N
    irs = rng.standard_normal((C, IRL))
    conv.set_all(irs)
    conv.prepare(dtype=jnp.float64)
    state = conv.init_state(dtype=jnp.float64)
    x = rng.standard_normal((C, L))
    state, y = conv.process(state, jnp.asarray(x))
    for c in range(C):
        assert snr_db(np.convolve(x[c], irs[c])[:L], np.asarray(y)[c]) > 180


def test_per_pair_set_and_clear(rng):
    N, M, L = 2, 2, 64 * 4
    conv = mc.Convolver(N, M, scheme=SCHEME)
    ir = rng.standard_normal(100)
    assert conv.set(0, 1, ir).name == "NONE"
    assert conv.set(5, 0, ir).name == "IN_CHAN_OUT_OF_RANGE"
    assert conv.set(0, 5, ir).name == "OUT_CHAN_OUT_OF_RANGE"
    conv.prepare(dtype=jnp.float64)
    state = conv.init_state(dtype=jnp.float64)
    x = rng.standard_normal((N, L))
    _, y = conv.process(state, jnp.asarray(x))
    assert np.allclose(np.asarray(y)[0], 0.0)  # out 0 has no IR
    assert snr_db(np.convolve(x[0], ir)[:L], np.asarray(y)[1]) > 180
    # clear and verify silence
    conv.clear()
    conv.prepare(dtype=jnp.float64)
    state = conv.init_state(dtype=jnp.float64)
    _, y = conv.process(state, jnp.asarray(x))
    assert np.allclose(np.asarray(y), 0.0)


def test_parallel_requires_matching_channels(rng):
    conv = mc.Convolver(2, scheme=SCHEME)
    assert conv.set(0, 1, np.ones(10)).name == "IN_CHAN_OUT_OF_RANGE"


def test_offline_equals_streaming(rng):
    N, M, L = 2, 3, 64 * 5
    conv = mc.Convolver(N, M, scheme=SCHEME)
    conv.set_all(rng.standard_normal((M, N, 90)))
    conv.prepare(dtype=jnp.float64)
    state = conv.init_state(dtype=jnp.float64)
    x = rng.standard_normal((N, L))
    _, ys = conv.process(state, jnp.asarray(x))
    yo = conv.process_offline(jnp.asarray(x))
    assert snr_db(np.asarray(ys), yo) > 250
