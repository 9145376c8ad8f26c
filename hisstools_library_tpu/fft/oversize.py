"""Out-of-core single-chip FFT: sizes beyond the whole-array staged envelope.

The reference creates setups and executes transforms up to 2^28 on one core
(/root/reference/HISSTools_FFT/HISSTools_FFT.h:87-98, MAX_FFT_SIZE_LOG2 = 28).
On TPU the whole-array staged four-step (matmul_fft.fft_split) aborts the
compiler above 2^25: its reshapes/transposes and fused elementwise stages
materialise full-size temporaries, and the compiler refuses the program long
before HBM itself is exhausted (a 2^27 split-complex plane is 512 MB of a
16 GB chip).

This module restages the same four-step factorisation *out of core*: the two
batched-DFT stages run as ``lax.fori_loop`` s whose bodies read a column chunk
of the (n1, n2) view with ``dynamic_slice``, transform it with the proven
mid-size backend (matmul_fft.fft_split at sqrt(N) ~ 2^13..2^14), and write the
result back with ``dynamic_update_slice``. Every per-iteration temporary is
chunk-sized (~16 MB); only the input/intermediate/output arrays live at full
size, and those are plain HBM loop carries. The big transposes of the six-step
formulation never materialise — they happen chunk-wise inside the loop bodies.

Math (identical to matmul_fft's four-step, N = n1*n2, x[a*n2 + b] = A[a, b]):

  stage 1:  B[b, k1] = T[b, k1] * sum_a A[a, b] W_n1^{± a k1}   (per column chunk b)
  stage 2:  X[k1 + n1*k2] = sum_b B[b, k1] W_n2^{± b k2}        (per column chunk k1)

Twiddles are generated in-graph per chunk with the index product reduced mod N
in int32 (exact: the product is < 2^28) and the angle evaluated as a two-term
sum (hi/lo split of the index) so the int->f32 conversion is exact — slightly
*better* than matmul_fft._twiddle_graph's single-term form at these sizes.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import matmul_fft

# Per-chunk element budget per plane (f32: 2^22 elements = 16 MB). Each loop
# iteration keeps a handful of chunk-sized temporaries live — far inside the
# compiler's working envelope at any supported size.
_CHUNK_ELEMS = 1 << 22


def _pow2_rows(total_rows: int, row_elems: int, chunk_elems: int) -> int:
    """Largest power-of-two row count (dividing total_rows) whose chunk stays
    within chunk_elems; at least one row."""
    cs = 1
    while cs * 2 <= total_rows and (cs * 2) * row_elems <= chunk_elems:
        cs *= 2
    return cs


def _twiddle_rows(j, cs: int, n_cols: int, n: int, dtype, inverse: bool):
    """T[b, k] = exp(-+2i pi b k / n) for rows b = j..j+cs, cols k < n_cols.

    The index product is reduced mod n in int32 (exact: b*k < 2^28) and the
    angle evaluated as a two-term sum, hi = idx >> 12 and lo = idx & 0xfff,
    both exactly representable in f32; cos/sin of the two parts recombine via
    the angle-sum identities. Matches the f64-sourced table to ~2-3 f32 ulps.
    """
    b = (j + jnp.arange(cs, dtype=jnp.int32))[:, None]
    k = jnp.arange(n_cols, dtype=jnp.int32)[None, :]
    idx = (b * k) % n
    hi = (idx >> 12).astype(dtype)
    lo = (idx & 0xFFF).astype(dtype)
    base = 2.0 * np.pi / float(n)
    a1 = hi * jnp.asarray(base * 4096.0, dtype)
    a2 = lo * jnp.asarray(base, dtype)
    c1, s1 = jnp.cos(a1), jnp.sin(a1)
    c2, s2 = jnp.cos(a2), jnp.sin(a2)
    twr = c1 * c2 - s1 * s2
    twi = s1 * c2 + c1 * s2
    if not inverse:
        twi = -twi
    return twr, twi


def fft_split_oversize(re: jax.Array, im: jax.Array, inverse: bool = False,
                       chunk_elems: Optional[int] = None
                       ) -> Tuple[jax.Array, jax.Array]:
    """Unscaled complex (i)DFT of a 1-D split-complex signal, chunked out-of-core.

    Semantics identical to matmul_fft.fft_split (forward = reference
    hisstools_fft, HISSTools_FFT_Core.h:1325-1340; inverse = the unscaled
    N x IDFT of hisstools_ifft). 1-D only: a *batch* of transforms this large
    does not fit HBM in the first place.
    """
    if re.ndim != 1:
        raise ValueError(
            f"fft_split_oversize handles 1-D signals (got ndim={re.ndim})")
    n = re.shape[-1]
    ce = int(chunk_elems or _CHUNK_ELEMS)
    n1, n2 = matmul_fft._split_factors(n)  # n = n1*n2, n1 >= n2
    dtype = re.dtype

    a_r = re.reshape(n1, n2)
    a_i = im.reshape(n1, n2)

    # Stage 1 (+ twiddle): column chunks of A -> row chunks of B[b, k1].
    cs1 = _pow2_rows(n2, n1, ce)

    def body1(c, acc):
        br, bi = acc
        j = c * cs1
        chr_ = jax.lax.dynamic_slice(a_r, (0, j), (n1, cs1)).T
        chi_ = jax.lax.dynamic_slice(a_i, (0, j), (n1, cs1)).T
        fr, fi = matmul_fft.fft_split(chr_, chi_, inverse=inverse)
        twr, twi = _twiddle_rows(j, cs1, n1, n, dtype, inverse)
        cr = fr * twr - fi * twi
        ci = fr * twi + fi * twr
        br = jax.lax.dynamic_update_slice(br, cr, (j, 0))
        bi = jax.lax.dynamic_update_slice(bi, ci, (j, 0))
        return br, bi

    zero = jnp.zeros((n2, n1), dtype)
    br, bi = jax.lax.fori_loop(0, n2 // cs1, body1, (zero, zero))

    # Stage 2: column chunks of B -> column chunks of the output, which viewed
    # as (n2, n1) row-major holds X2[k2, k1] = D[k1, k2] (X[k1 + n1*k2]).
    cs2 = _pow2_rows(n1, n2, ce)

    def body2(c, acc):
        xr, xi = acc
        k = c * cs2
        chr_ = jax.lax.dynamic_slice(br, (0, k), (n2, cs2)).T
        chi_ = jax.lax.dynamic_slice(bi, (0, k), (n2, cs2)).T
        dr, di = matmul_fft.fft_split(chr_, chi_, inverse=inverse)
        xr = jax.lax.dynamic_update_slice(xr, dr.T, (0, k))
        xi = jax.lax.dynamic_update_slice(xi, di.T, (0, k))
        return xr, xi

    xr, xi = jax.lax.fori_loop(0, n1 // cs2, body2, (zero, zero))
    return xr.reshape(n), xi.reshape(n)


def _chunk_len(m: int, chunk_elems: int) -> int:
    """Power-of-two chunk length dividing m, capped at chunk_elems."""
    return _pow2_rows(m, 1, chunk_elems)


def _half_tw_chunk(j, c: int, m: int, dtype):
    """(cos, -sin)(pi k / m) for k = j..j+c — the W_N^k half twiddles
    (N = 2m), generated in-graph per chunk with the exact hi/lo index split
    (k < 2^27 everywhere this runs)."""
    k = j + jnp.arange(c, dtype=jnp.int32)
    hi = (k >> 12).astype(dtype)
    lo = (k & 0xFFF).astype(dtype)
    base = np.pi / float(m)
    a1 = hi * jnp.asarray(base * 4096.0, dtype)
    a2 = lo * jnp.asarray(base, dtype)
    c1, s1 = jnp.cos(a1), jnp.sin(a1)
    c2, s2 = jnp.cos(a2), jnp.sin(a2)
    return c1 * c2 - s1 * s2, -(s1 * c2 + c1 * s2)


def rfft_packed_oversize(x: jax.Array, chunk_elems: Optional[int] = None
                         ) -> Tuple[jax.Array, jax.Array]:
    """Real FFT -> packed N/2 bins (x2 scale, Nyquist in im[0]) for oversize N.

    Same half-size-complex decomposition as the reference real path
    (HISSTools_FFT_Core.h:1350-1360 + pass_real_trig_table :934-988) and as
    matmul_fft.rfft_packed, with EVERY full-size op chunked: the whole-array
    flip/concat recombination compiles at 2^25 but takes ~330 s, and the
    measured envelope ends there — so the even/odd de-interleave and the
    conversion pass run as fori_loops over contiguous chunk slices (the
    mirrored conj(Z[(m-k) % m]) read is contiguous for every chunk except the
    k=0-containing first one, which is done with static slices outside the
    loop).
    """
    if x.ndim != 1:
        raise ValueError(
            f"rfft_packed_oversize handles 1-D signals (got ndim={x.ndim})")
    n = x.shape[-1]
    m = n // 2
    ce = int(chunk_elems or _CHUNK_ELEMS)
    c = _chunk_len(m, ce)
    nc = m // c
    dtype = x.dtype

    # Chunked even/odd de-interleave: z[t] = x[2t] + i x[2t+1].
    def deint(i, acc):
        zr, zi = acc
        j = i * c
        ch = jax.lax.dynamic_slice(x, (2 * j,), (2 * c,)).reshape(c, 2)
        zr = jax.lax.dynamic_update_slice(zr, ch[:, 0], (j,))
        zi = jax.lax.dynamic_update_slice(zi, ch[:, 1], (j,))
        return zr, zi

    zero = jnp.zeros((m,), dtype)
    zr, zi = jax.lax.fori_loop(0, nc, deint, (zero, zero))

    Zr, Zi = fft_split_oversize(zr, zi, inverse=False, chunk_elems=ce)

    def recomb(zr_c, zi_c, rr_c, ri_c, twr, twi):
        # Ze = (Z + conj(Zrev))/2 ; Zo = (Z - conj(Zrev))/(2i); X = Ze + W^k Zo
        ze_r = 0.5 * (zr_c + rr_c)
        ze_i = 0.5 * (zi_c - ri_c)
        zo_r = 0.5 * (zi_c + ri_c)
        zo_i = -0.5 * (zr_c - rr_c)
        xr = ze_r + (zo_r * twr - zo_i * twi)
        xi = ze_i + (zo_r * twi + zo_i * twr)
        return 2.0 * xr, 2.0 * xi

    # Chunk 0 (contains the k=0 packed DC/Nyquist lane): static slices.
    rev0_r = jnp.concatenate([Zr[:1], jnp.flip(Zr[m - c + 1:])]) if c > 1 \
        else Zr[:1]
    rev0_i = jnp.concatenate([Zi[:1], jnp.flip(Zi[m - c + 1:])]) if c > 1 \
        else Zi[:1]
    twr0, twi0 = _half_tw_chunk(0, c, m, dtype)
    p0_r, p0_i = recomb(Zr[:c], Zi[:c], rev0_r, rev0_i, twr0, twi0)
    # Packed lane: pr[0] = DC = 2(ReZ0 + ImZ0), pi[0] = Nyquist = 2(ReZ0 - ImZ0)
    p0_r = p0_r.at[0].set(2.0 * (Zr[0] + Zi[0]))
    p0_i = p0_i.at[0].set(2.0 * (Zr[0] - Zi[0]))

    pr = jax.lax.dynamic_update_slice(zero, p0_r, (0,))
    pi = jax.lax.dynamic_update_slice(zero, p0_i, (0,))

    def body(i, acc):
        pr, pi = acc
        j = i * c
        zr_c = jax.lax.dynamic_slice(Zr, (j,), (c,))
        zi_c = jax.lax.dynamic_slice(Zi, (j,), (c,))
        # conj-mirror read: rev indices m-k for k = j..j+c are the contiguous
        # run [m-j-c+1, m-j], flipped (j >= c >= 1 here, so all in [1, m-1]).
        rr_c = jnp.flip(jax.lax.dynamic_slice(Zr, (m - j - c + 1,), (c,)))
        ri_c = jnp.flip(jax.lax.dynamic_slice(Zi, (m - j - c + 1,), (c,)))
        twr, twi = _half_tw_chunk(j, c, m, dtype)
        xr, xi = recomb(zr_c, zi_c, rr_c, ri_c, twr, twi)
        pr = jax.lax.dynamic_update_slice(pr, xr, (j,))
        pi = jax.lax.dynamic_update_slice(pi, xi, (j,))
        return pr, pi

    pr, pi = jax.lax.fori_loop(1, nc, body, (pr, pi))
    return pr, pi


def rifft_packed_oversize(re: jax.Array, im: jax.Array,
                          chunk_elems: Optional[int] = None) -> jax.Array:
    """Unscaled inverse of the packed layout (rifft(rfft(x)) == 2N x) for
    oversize N; every full-size op chunked (see rfft_packed_oversize — the
    inverse additionally needs a chunked interleave: the whole-array
    stack+reshape relayout to a 2^26-element output aborts the TPU compiler
    outright, measured round 4)."""
    if re.ndim != 1:
        raise ValueError(
            f"rifft_packed_oversize handles 1-D signals (got ndim={re.ndim})")
    m = re.shape[-1]
    ce = int(chunk_elems or _CHUNK_ELEMS)
    c = _chunk_len(m, ce)
    nc = m // c
    dtype = re.dtype

    def recomb(xr_c, xi_c, rr_c, ri_c, twr, twi):
        # Ze = (X + conj(Xrev))/2 ; Zo = conj(W^k)(X - conj(Xrev))/2
        # rr/ri carry conj(Xrev) directly (built by the callers below).
        ze_r = 0.5 * (xr_c + rr_c)
        ze_i = 0.5 * (xi_c + ri_c)
        do_r = 0.5 * (xr_c - rr_c)
        do_i = 0.5 * (xi_c - ri_c)
        zo_r = do_r * twr + do_i * twi
        zo_i = -do_r * twi + do_i * twr
        return ze_r - zo_i, ze_i + zo_r

    # Chunk 0: k=0 lane holds DC in re[0] and Nyquist in im[0].
    # conj(Xrev)[0] = X[m] = Nyquist (real); conj(Xrev)[k>=1] = conj(X[m-k]).
    rev0_r = jnp.concatenate([im[:1], jnp.flip(re[m - c + 1:])]) if c > 1 \
        else im[:1]
    rev0_i = jnp.concatenate([jnp.zeros((1,), dtype),
                              -jnp.flip(im[m - c + 1:])]) if c > 1 \
        else jnp.zeros((1,), dtype)
    x0_r = re[:c]
    x0_i = im[:c].at[0].set(0.0)  # X[0] is real DC; im[0] is the Nyquist lane
    twr0, twi0 = _half_tw_chunk(0, c, m, dtype)
    z0_r, z0_i = recomb(x0_r, x0_i, rev0_r, rev0_i, twr0, twi0)

    zero = jnp.zeros((m,), dtype)
    Zr = jax.lax.dynamic_update_slice(zero, z0_r, (0,))
    Zi = jax.lax.dynamic_update_slice(zero, z0_i, (0,))

    def body(i, acc):
        Zr, Zi = acc
        j = i * c
        xr_c = jax.lax.dynamic_slice(re, (j,), (c,))
        xi_c = jax.lax.dynamic_slice(im, (j,), (c,))
        rr_c = jnp.flip(jax.lax.dynamic_slice(re, (m - j - c + 1,), (c,)))
        ri_c = -jnp.flip(jax.lax.dynamic_slice(im, (m - j - c + 1,), (c,)))
        twr, twi = _half_tw_chunk(j, c, m, dtype)
        zr_c, zi_c = recomb(xr_c, xi_c, rr_c, ri_c, twr, twi)
        Zr = jax.lax.dynamic_update_slice(Zr, zr_c, (j,))
        Zi = jax.lax.dynamic_update_slice(Zi, zi_c, (j,))
        return Zr, Zi

    Zr, Zi = jax.lax.fori_loop(1, nc, body, (Zr, Zi))

    wr, wi = fft_split_oversize(Zr, Zi, inverse=True, chunk_elems=ce)

    # Chunked interleave: y[2t] = Re w[t], y[2t+1] = Im w[t], final scale 2
    # (matmul_fft.rifft_packed:265-268 derives the combined factor).
    y = jnp.zeros((2 * m,), dtype)

    def inter(i, y):
        j = i * c
        wr_c = jax.lax.dynamic_slice(wr, (j,), (c,))
        wi_c = jax.lax.dynamic_slice(wi, (j,), (c,))
        ch = 2.0 * jnp.stack([wr_c, wi_c], axis=-1).reshape(2 * c)
        return jax.lax.dynamic_update_slice(y, ch, (2 * j,))

    return jax.lax.fori_loop(0, nc, inter, y)
