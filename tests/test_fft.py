"""FFT parity tests against numpy float64 oracles.

Mirrors the reference FFT_Tester (- Test/FFT_Tester/FFT_Tester/main.cpp): size sweeps
over all transforms, zip/unzip round-trip exactness, plus convention checks (packing,
scaling) that the reference only documents implicitly through downstream scale
factors.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from hisstools_library_tpu import fft

SIZES = [2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 1 << 14]
BACKENDS = ["xla", "matmul"]


def packed_oracle(x):
    """Reference packing: 2x spectrum, N/2 bins, Nyquist in im[0] (float64)."""
    X = np.fft.rfft(x, axis=-1)
    re = 2.0 * X.real
    im = 2.0 * X.imag
    im = np.concatenate([re[..., -1:], im[..., 1:-1]], axis=-1)
    return re[..., :-1], im


def snr_db(ref, test):
    err = np.asarray(test, np.float64) - ref
    denom = np.sum(err * err)
    if denom == 0:
        return np.inf
    return 10.0 * np.log10(np.sum(ref * ref) / denom)


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("n", SIZES)
def test_rfft_matches_packed_oracle(rng, backend, n):
    x = rng.standard_normal((3, n)).astype(np.float32)
    re, im = fft.rfft(jnp.asarray(x), backend=backend)
    ore, oim = packed_oracle(x.astype(np.float64))
    scale = np.abs(ore).max()
    assert np.abs(np.asarray(re) - ore).max() / scale < 2e-5
    assert np.abs(np.asarray(im) - oim).max() / scale < 2e-5


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("n", SIZES)
def test_rfft_rifft_roundtrip_is_2N(rng, backend, n):
    x = rng.standard_normal((2, n)).astype(np.float32)
    re, im = fft.rfft(jnp.asarray(x), backend=backend)
    y = fft.rifft(re, im, backend=backend)
    assert snr_db(2.0 * n * x.astype(np.float64), y) > 100.0


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("n", SIZES)
def test_complex_fft_unscaled(rng, backend, n):
    zr = rng.standard_normal((2, n)).astype(np.float32)
    zi = rng.standard_normal((2, n)).astype(np.float32)
    fr, fi = fft.fft(jnp.asarray(zr), jnp.asarray(zi), backend=backend)
    Z = np.fft.fft(zr.astype(np.float64) + 1j * zi.astype(np.float64), axis=-1)
    scale = np.abs(Z).max()
    assert np.abs(np.asarray(fr) - Z.real).max() / scale < 2e-5
    assert np.abs(np.asarray(fi) - Z.imag).max() / scale < 2e-5


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize("n", [8, 256, 4096])
def test_complex_ifft_is_unscaled_inverse(rng, backend, n):
    zr = rng.standard_normal((n,)).astype(np.float32)
    zi = rng.standard_normal((n,)).astype(np.float32)
    fr, fi = fft.fft(jnp.asarray(zr), jnp.asarray(zi), backend=backend)
    gr, gi = fft.ifft(fr, fi, backend=backend)
    # fft then unscaled ifft = N * identity (reference convention: no 1/N anywhere)
    assert snr_db(n * zr.astype(np.float64), gr) > 100.0
    assert snr_db(n * zi.astype(np.float64), gi) > 100.0


def test_zip_unzip_roundtrip_exact(rng):
    # The reference's only hard-FAIL correctness test (FFT_Tester main.cpp:202-250).
    for n in [2, 8, 64, 1024, 1 << 16]:
        x = rng.standard_normal((n,)).astype(np.float32)
        re, im = fft.unzip(jnp.asarray(x))
        y = fft.zip_split(re, im)
        assert np.array_equal(np.asarray(y), x)
        assert np.array_equal(np.asarray(re), x[0::2])
        assert np.array_equal(np.asarray(im), x[1::2])


def test_unzip_zero_pads(rng):
    x = rng.standard_normal((10,)).astype(np.float32)
    re, im = fft.unzip_zero(jnp.asarray(x), 32)
    assert re.shape[-1] == 16 and im.shape[-1] == 16
    assert np.array_equal(np.asarray(re)[:5], x[0::2])
    assert np.all(np.asarray(re)[5:] == 0)
    assert np.all(np.asarray(im)[5:] == 0)


def test_rfft_padded(rng):
    x = rng.standard_normal((100,)).astype(np.float32)
    re, im = fft.rfft_padded(jnp.asarray(x), 256)
    xp = np.zeros(256, np.float64)
    xp[:100] = x
    ore, oim = packed_oracle(xp)
    assert np.abs(np.asarray(re) - ore).max() < 1e-4
    assert np.abs(np.asarray(im) - oim).max() < 1e-4


def test_pack_unpack_spectrum_roundtrip(rng):
    from hisstools_library_tpu.core.types import Split
    x = rng.standard_normal((64,)).astype(np.float32)
    re, im = fft.rfft(jnp.asarray(x))
    fr, fi = fft.unpack_spectrum(Split(re, im))
    X = np.fft.rfft(x.astype(np.float64))
    assert np.abs(np.asarray(fr) - X.real).max() < 1e-4
    assert np.abs(np.asarray(fi) - X.imag).max() < 1e-4
    s2 = fft.pack_spectrum(fr, fi)
    assert np.abs(np.asarray(s2.re) - np.asarray(re)).max() < 1e-5


@pytest.mark.parametrize("n", [1 << 16, 1 << 18])
def test_large_sizes_matmul(rng, n):
    # Crash-sweep analogue of FFT_Tester crash_test for large sizes (2^16..2^18).
    x = rng.standard_normal((n,)).astype(np.float32)
    re, im = fft.rfft(jnp.asarray(x), backend="matmul")
    y = fft.rifft(re, im, backend="matmul")
    assert snr_db(2.0 * n * x.astype(np.float64), y) > 90.0


def test_matmul_fft_recursive_factors(rng, monkeypatch):
    """Factors beyond _DIRECT_MAX recurse instead of building dense DFT
    matrices, and twiddles beyond _TABLE_CONST_MAX_ELEMS are generated
    in-graph — both exercised here at a small size by lowering the caps
    (regression for the >=2^23 baked-constant compile abort on axon)."""
    from hisstools_library_tpu.fft import matmul_fft as mf
    monkeypatch.setattr(mf, "_DIRECT_MAX", 16)
    monkeypatch.setattr(mf, "_TABLE_CONST_MAX_ELEMS", 64)
    n = 4096
    z = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    fr, fi = mf.fft_split(jnp.asarray(z.real), jnp.asarray(z.imag))
    ref = np.fft.fft(z)
    assert snr_db(ref.real, fr) > 200.0
    assert snr_db(ref.imag, fi) > 200.0
    wr, wi = mf.fft_split(fr, fi, inverse=True)  # unscaled inverse: n * z
    assert snr_db(n * z.real, wr) > 200.0
    # f32 in-graph tables (the TPU dtype) stay well above the bf16x3 noise floor
    fr32, fi32 = mf.fft_split(jnp.asarray(z.real, jnp.float32),
                              jnp.asarray(z.imag, jnp.float32))
    assert snr_db(ref.real, fr32) > 100.0


def test_matmul_rfft_ingraph_half_twiddle(rng, monkeypatch):
    from hisstools_library_tpu.fft import matmul_fft as mf
    monkeypatch.setattr(mf, "_TABLE_CONST_MAX_ELEMS", 64)
    n = 1024
    x = rng.standard_normal((n,))
    re, im = mf.rfft_packed(jnp.asarray(x))
    ore, oim = packed_oracle(x)
    assert snr_db(ore, re) > 200.0
    assert snr_db(oim, im) > 200.0
    y = mf.rifft_packed(re, im)
    assert snr_db(2.0 * n * x, y) > 200.0


def test_float64_path(rng):
    # f64 parity path (reference supports double throughout; TPU emulates f64 but
    # CPU tests exercise it exactly).
    n = 1024
    x = rng.standard_normal((n,)).astype(np.float64)
    re, im = fft.rfft(jnp.asarray(x))
    ore, oim = packed_oracle(x)
    assert np.abs(np.asarray(re) - ore).max() < 1e-9
    y = fft.rifft(re, im)
    assert snr_db(2.0 * n * x, y) > 200.0


def test_float64_rejected_by_pallas_backend(rng):
    # f64 requests are routed explicitly: the pallas kernels are f32-only
    # (TPU has no native double), so the API fails fast with guidance instead
    # of a deep Mosaic lowering error.
    x = jnp.asarray(rng.standard_normal(256).astype(np.float64))
    with pytest.raises(TypeError, match="float32-only"):
        fft.rfft(x, backend="pallas")
    re, im = fft.rfft(x, backend="xla")
    with pytest.raises(TypeError, match="float32-only"):
        fft.rifft(re, im, backend="pallas")
    with pytest.raises(TypeError, match="float32-only"):
        fft.fft(x, jnp.zeros_like(x), backend="pallas")


# -----------------------------------------------------------------------------
# Fused Pallas kernels (interpret mode on CPU; the TPU path is identical code)
# -----------------------------------------------------------------------------

PALLAS_REAL_SIZES = [4096, 8192, 16384, 65536, 131072]


@pytest.mark.parametrize("n", PALLAS_REAL_SIZES)
def test_pallas_rfft_matches_packed_oracle(rng, n):
    from hisstools_library_tpu.fft import pallas_fft

    x = rng.standard_normal((2, n)).astype(np.float32)
    re, im = pallas_fft.rfft_packed(jnp.asarray(x), interpret=True)
    ore, oim = packed_oracle(x.astype(np.float64))
    scale = np.abs(ore).max()
    assert np.abs(np.asarray(re) - ore).max() / scale < 2e-5
    assert np.abs(np.asarray(im) - oim).max() / scale < 2e-5


@pytest.mark.parametrize("n", PALLAS_REAL_SIZES)
def test_pallas_rfft_rifft_roundtrip_is_2N(rng, n):
    from hisstools_library_tpu.fft import pallas_fft

    x = rng.standard_normal((4, n)).astype(np.float32)  # batch 4 exercises grouping
    re, im = pallas_fft.rfft_packed(jnp.asarray(x), interpret=True)
    y = pallas_fft.rifft_packed(re, im, interpret=True)
    assert snr_db(2.0 * n * x.astype(np.float64), y) > 100.0


@pytest.mark.parametrize("n", [2048, 8192, 65536])
def test_pallas_complex_fft(rng, n):
    from hisstools_library_tpu.fft import pallas_fft

    zr = rng.standard_normal((2, n)).astype(np.float32)
    zi = rng.standard_normal((2, n)).astype(np.float32)
    fr, fi = pallas_fft.fft_split(jnp.asarray(zr), jnp.asarray(zi), interpret=True)
    z = np.fft.fft(zr.astype(np.float64) + 1j * zi.astype(np.float64), axis=-1)
    scale = np.abs(z.real).max()
    assert np.abs(np.asarray(fr) - z.real).max() / scale < 2e-5
    assert np.abs(np.asarray(fi) - z.imag).max() / scale < 2e-5
    br, bi = pallas_fft.fft_split(fr, fi, inverse=True, interpret=True)
    assert snr_db(n * zr.astype(np.float64), br) > 100.0


def test_pallas_bf16x3_mode_snr(rng):
    from hisstools_library_tpu.fft import pallas_fft

    n = 65536
    x = rng.standard_normal((2, n)).astype(np.float32)
    re, im = pallas_fft.rfft_packed(jnp.asarray(x), interpret=True, mode="bf16x3")
    y = pallas_fft.rifft_packed(re, im, interpret=True, mode="bf16x3")
    assert snr_db(2.0 * n * x.astype(np.float64), y) > 90.0


def test_pallas_complex_fft_bf16x3(rng):
    """_cfft_kernel with pre-stacked bf16x3 table splits matches the oracle."""
    from hisstools_library_tpu.fft import pallas_fft

    n = 8192
    zr = rng.standard_normal((2, n)).astype(np.float32)
    zi = rng.standard_normal((2, n)).astype(np.float32)
    fr, fi = pallas_fft.fft_split(jnp.asarray(zr), jnp.asarray(zi),
                                  interpret=True, mode="bf16x3")
    z = np.fft.fft(zr.astype(np.float64) + 1j * zi.astype(np.float64), axis=-1)
    assert snr_db(z.real, fr) > 90.0
    assert snr_db(z.imag, fi) > 90.0


def test_pallas_backend_via_api(rng):
    """backend="pallas" routes rfft/rifft/fft through the fused kernels with
    fallbacks for small sizes."""
    for n in (256, 8192):  # small -> fallback, large -> fused
        x = rng.standard_normal((2, n)).astype(np.float32)
        re, im = fft.rfft(jnp.asarray(x), backend="pallas")
        ore, oim = packed_oracle(x.astype(np.float64))
        scale = np.abs(ore).max()
        assert np.abs(np.asarray(re) - ore).max() / scale < 2e-5
        y = fft.rifft(re, im, backend="pallas")
        assert snr_db(2.0 * n * x.astype(np.float64), y) > 100.0


def test_pallas_size_boundary_continuity(rng):
    """The fused-kernel size windows hand off cleanly at every boundary:
    staged matmul < MIN_REAL_SIZE <= single kernel <= MAX_SINGLE_REAL <
    split-pair kernels <= MAX_REAL_SIZE < staged matmul — same packing, same
    scaling, oracle-accurate on all sides."""
    from hisstools_library_tpu.fft import pallas_fft

    sizes = [pallas_fft.MIN_REAL_SIZE // 2, pallas_fft.MIN_REAL_SIZE,
             pallas_fft.MAX_SINGLE_REAL, pallas_fft.MAX_SINGLE_REAL * 2,
             pallas_fft.MAX_REAL_SIZE, pallas_fft.MAX_REAL_SIZE * 2]
    for n in sizes:
        x = rng.standard_normal((1, n)).astype(np.float32)
        re, im = fft.rfft(jnp.asarray(x), backend="pallas")
        ore, oim = packed_oracle(x.astype(np.float64))
        scale = np.abs(ore).max()
        assert np.abs(np.asarray(re) - ore).max() / scale < 5e-5, n
        y = fft.rifft(re, im, backend="pallas")
        assert snr_db(2.0 * n * x.astype(np.float64), y) > 95.0, n


def test_rfft_2pow24_ingraph_twiddles(rng):
    """n=2^24: the core FFT (m=2^23) exceeds _TABLE_CONST_MAX_ELEMS, so the
    four-step twiddles are generated in-graph — the configuration that used
    to abort the axon remote compiler with a >100 MB baked-constant body.
    Verifies the int32-iota angle path holds >100 dB at real scale."""
    from hisstools_library_tpu.fft import matmul_fft
    n = 1 << 24
    x = rng.standard_normal(n).astype(np.float32)
    re, im = matmul_fft.rfft_packed(jnp.asarray(x))
    ref = np.fft.rfft(x.astype(np.float64))
    pre = 2.0 * ref[: n // 2].real.copy()
    pim = np.concatenate([[2.0 * ref[n // 2].real], 2.0 * ref[1: n // 2].imag])
    assert snr_db(pre, re) > 100.0
    assert snr_db(pim, im) > 100.0
    y = matmul_fft.rifft_packed(re, im)
    assert snr_db(2.0 * n * x.astype(np.float64), y) > 100.0


def test_backend_default_roundtrip():
    """set_default_backend/get_default_backend steer rfft and restore."""
    from hisstools_library_tpu.fft import api
    old = api.get_default_backend()
    try:
        api.set_default_backend("matmul")
        assert api.get_default_backend() == "matmul"
        x = jnp.asarray(np.ones(64, np.float32))
        re, im = fft.rfft(x)  # runs through the matmul backend
        assert float(re[0]) == 128.0  # DC lane: 2 * sum(x)
    finally:
        api.set_default_backend(old)


# -----------------------------------------------------------------------------
# Batched small-N dense kernels (round 3): N = 128..2048, two matmuls per
# direction with the packed layout baked into the tables
# -----------------------------------------------------------------------------

@pytest.mark.parametrize("mode", ["highest", "bf16x3"])
@pytest.mark.parametrize("n", [128, 256, 512, 1024, 2048])
def test_pallas_small_dense_parity(rng, mode, n):
    from hisstools_library_tpu.fft import pallas_fft

    floor = 120.0 if mode == "highest" else 95.0
    # batch 37: not a multiple of any tile -> exercises the row padding
    x = rng.standard_normal((37, n)).astype(np.float32)
    re, im = pallas_fft._rfft_small(jnp.asarray(x), True, mode)
    assert re is not None
    ore, oim = packed_oracle(x.astype(np.float64))
    assert snr_db(ore, re) > floor
    assert snr_db(oim, im) > floor
    y = pallas_fft._rifft_small(re, im, True, mode)
    assert snr_db(2.0 * n * x.astype(np.float64), y) > floor


def test_pallas_small_dense_routed_from_public_entry(rng):
    """rfft_packed/rifft_packed route 128 <= N < 4096 through the dense
    kernels (small_real_eligible) and keep exact packing semantics."""
    from hisstools_library_tpu.fft import pallas_fft

    assert pallas_fft.small_real_eligible(1024)
    assert not pallas_fft.small_real_eligible(4096)
    assert not pallas_fft.small_real_eligible(64)
    # 2048's whole tables exceed VMEM (the dense plan must stay infeasible,
    # and the measured-slower chunked form stays disabled) — instead the size
    # runs FOLDED: two half-size table pairs, interleaved outside (round 3).
    assert pallas_fft._small_plan(2048, 1024, 1, 2, "bf16x3") is None
    x2 = rng.standard_normal((3, 2048)).astype(np.float32)
    r2, i2 = pallas_fft._rfft_small(jnp.asarray(x2), True, "bf16x3")
    o2r, o2i = packed_oracle(x2.astype(np.float64))
    assert snr_db(o2r, r2) > 95.0 and snr_db(o2i, i2) > 95.0
    x = rng.standard_normal((5, 512)).astype(np.float32)
    re, im = pallas_fft.rfft_packed(jnp.asarray(x), interpret=True)
    ore, oim = packed_oracle(x.astype(np.float64))
    assert snr_db(ore, re) > 95.0
    assert snr_db(oim, im) > 95.0
    y = pallas_fft.rifft_packed(re, im, interpret=True)
    assert snr_db(2.0 * 512 * x.astype(np.float64), y) > 95.0
    assert re.dtype == x.dtype and y.dtype == x.dtype


def test_large_fft_sharded_handoff(rng, monkeypatch):
    """Above the measured single-chip envelope the API hands 1-D transforms to
    the distributed four-step automatically (VERDICT r2 item 3). The envelope
    is lowered so the handoff logic runs at test size on the 8-device mesh."""
    from hisstools_library_tpu.fft import api

    monkeypatch.setattr(api, "MAX_SINGLE_CHIP_LOG2", 12)
    monkeypatch.setattr(api, "_on_tpu", lambda: True)
    n = 1 << 13
    x = rng.standard_normal(n).astype(np.float32)
    re, im = fft.rfft(jnp.asarray(x), backend="matmul")
    ore, oim = packed_oracle(x.astype(np.float64)[None])
    assert snr_db(ore[0], re) > 95.0
    assert snr_db(oim[0], im) > 95.0
    y = fft.rifft(re, im, backend="matmul")
    assert snr_db(2.0 * n * x.astype(np.float64), y) > 95.0
    # 2-D input above the envelope loops the out-of-core transform over the
    # batch (round 5 — the sharded handoff itself stays 1-D)
    xb = rng.standard_normal((2, n)).astype(np.float32)
    rb, ib = fft.rfft(jnp.asarray(xb), backend="matmul")
    orb, oib = packed_oracle(xb.astype(np.float64))
    assert snr_db(orb, rb) > 95.0 and snr_db(oib, ib) > 95.0
    yb = fft.rifft(rb, ib, backend="matmul")
    assert snr_db(2.0 * n * xb.astype(np.float64), yb) > 95.0


def test_large_fft_oversize_handoff(rng, monkeypatch):
    """With ONE device above the staged envelope, the API routes 1-D transforms
    to the single-chip out-of-core four-step (VERDICT r3 item 1 — the
    reference runs 2^28 on one core, HISSTools_FFT.h:87-98). Envelope lowered
    so the routing logic runs at test size; the oversize math itself is
    size-independent (chunked fori_loop stages)."""
    import jax as _jax

    from hisstools_library_tpu.fft import api

    monkeypatch.setattr(api, "MAX_SINGLE_CHIP_LOG2", 12)
    monkeypatch.setattr(api, "_on_tpu", lambda: True)
    one_dev = [_jax.devices("cpu")[0]]
    monkeypatch.setattr(_jax, "devices", lambda *a: one_dev)
    n = 1 << 13
    x = rng.standard_normal(n).astype(np.float32)
    re, im = fft.rfft(jnp.asarray(x), backend="matmul")
    ore, oim = packed_oracle(x.astype(np.float64)[None])
    assert snr_db(ore[0], re) > 95.0
    assert snr_db(oim[0], im) > 95.0
    y = fft.rifft(re, im, backend="matmul")
    assert snr_db(2.0 * n * x.astype(np.float64), y) > 95.0
    # complex route too
    xi = rng.standard_normal(n).astype(np.float32)
    fr, fi = fft.fft(jnp.asarray(x), jnp.asarray(xi), backend="matmul")
    z = np.fft.fft(x.astype(np.float64) + 1j * xi.astype(np.float64))
    assert snr_db(z.real, fr) > 95.0 and snr_db(z.imag, fi) > 95.0


def test_oversize_preferred_routing(rng, monkeypatch):
    """Below the envelope, 1-D transforms at/above OVERSIZE_PREFERRED_LOG2
    route to the chunked out-of-core path (measured faster than the staged
    whole-array at EVERY probed size, round 5 — tools/fft_crossover.py);
    batches keep the staged path. Thresholds lowered to run at test size."""
    from hisstools_library_tpu.fft import api

    monkeypatch.setattr(api, "OVERSIZE_PREFERRED_LOG2", 11)
    monkeypatch.setattr(api, "_on_tpu", lambda: True)
    calls = {}
    from hisstools_library_tpu.fft import oversize as ov
    real_fn = ov.rfft_packed_oversize

    def spy(x, *a, **k):
        calls["n"] = calls.get("n", 0) + 1
        return real_fn(x, *a, **k)

    monkeypatch.setattr(ov, "rfft_packed_oversize", spy)
    n = 1 << 12
    x = rng.standard_normal(n).astype(np.float32)
    re, im = fft.rfft(jnp.asarray(x), backend="matmul")
    assert calls.get("n") == 1  # 1-D routed out-of-core
    ore, oim = packed_oracle(x.astype(np.float64)[None])
    assert snr_db(ore[0], re) > 95.0 and snr_db(oim[0], im) > 95.0
    fft.rfft(jnp.asarray(rng.standard_normal((2, n)).astype(np.float32)),
             backend="matmul")
    assert calls.get("n") == 1  # batch stays staged


def test_oversize_fft_chunked_oracle(rng):
    """fft/oversize.py chunked four-step vs numpy at forced small chunk sizes
    (the identical code path the 2^26..2^28 single-chip transforms run)."""
    from hisstools_library_tpu.fft import oversize

    n = 1 << 12
    x = rng.standard_normal(n)
    y = rng.standard_normal(n)
    for inverse in (False, True):
        z = np.fft.ifft(x + 1j * y) * n if inverse else np.fft.fft(x + 1j * y)
        fr, fi = oversize.fft_split_oversize(
            jnp.asarray(x), jnp.asarray(y), inverse=inverse,
            chunk_elems=1 << 9)
        assert snr_db(z.real, fr) > 200.0
        assert snr_db(z.imag, fi) > 200.0
    re, im = oversize.rfft_packed_oversize(jnp.asarray(x), chunk_elems=1 << 9)
    ore, oim = packed_oracle(x[None])
    assert snr_db(ore[0], re) > 200.0 and snr_db(oim[0], im) > 200.0
    back = oversize.rifft_packed_oversize(re, im, chunk_elems=1 << 9)
    assert snr_db(2.0 * n * x, back) > 200.0
    with pytest.raises(ValueError, match="1-D"):
        oversize.fft_split_oversize(jnp.zeros((2, 64)), jnp.zeros((2, 64)))
