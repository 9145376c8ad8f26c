"""Mesh-sharded four-step FFT: transforms larger than one device.

The reference FFT runs on one core and caps at 2^28 (HISSTools_FFT.h:87-98);
a 2^28 split-complex f32 transform is ~2 GB of working set, and longer IRs /
whole-session spectra exceed one chip's HBM. This module distributes the
four-step (Bailey) factorisation over a mesh axis so the transform scales
with the slice:

  view x as A[n1, n2] row-major, n1 sharded in contiguous row blocks
  1. all_to_all        -> each device holds ALL n1 for a slab of n2 columns
  2. local column DFTs -> B[j, k1] via the MXU four-step (matmul_fft.fft_split)
  3. local twiddle     -> W_N^{n2 k1}, factorised as a per-device column
                          phase times a replicated (n2/D, n1) table — no
                          device ever materialises an N-sized table
  4. local partial DFT over its n2 slab (dense MXU matmul) + psum_scatter
     -> D[k1, k2] arrives k2-sharded; the local transpose-flatten IS the
        contiguous global output chunk (X laid out k2-major)

Communication: ONE all_to_all + ONE psum_scatter, each moving N/D complex
elements per device over ICI — the textbook distributed-FFT transpose
algorithm, expressed as JAX collectives (shard_map).

In/out: 1-D split-complex (re, im) of length N, sharded in D contiguous
chunks over the mesh axis (the same layout in and out, so pipelines chain
without resharding). Unscaled, matching ``hisstools_fft``/``hisstools_ifft``
semantics (fft/api.py conventions).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..fft import matmul_fft
from .mesh import BLOCK_AXIS

__all__ = ["fft_sharded", "sharded_eligible"]


def sharded_eligible(n: int, n_devices: int) -> bool:
    """True when the factorisation supports this (size, device-count)."""
    if n & (n - 1) or n_devices & (n_devices - 1):
        return False
    n1, n2 = matmul_fft._split_factors(n)
    return n1 % n_devices == 0 and n2 % n_devices == 0


@lru_cache(maxsize=32)
def _phase_tables(n: int, d: int, dtype_name: str, inverse: bool):
    """Factorised twiddle/DFT tables (float64-sourced, like every other
    table in the FFT stack — reference generates twiddles in f64 too,
    HISSTools_FFT_Core.h:437-444).

    With m = n2 // d and column j_global = dev*m + j:
      W_N^{n2 k1}      = T1[dev, k1] * T2[j, k1]        (step-3 twiddle)
      W_N2^{n2 k2}     = T3[dev, k2] * T4[j, k2]        (step-4 DFT rows)
    Replicated memory is O(N/D); per-device tables are O(n1 + n2).
    """
    n1, n2 = matmul_fft._split_factors(n)
    m = n2 // d
    sign = 1.0 if inverse else -1.0
    k1 = np.arange(n1)
    k2 = np.arange(n2)
    j = np.arange(m)
    dev = np.arange(d)

    def table(rows, cols, denom):
        # Fold the exponent modulo denom in integer arithmetic first:
        # rows*cols reaches 2^53-ULP territory for huge N.
        prod = np.outer(rows.astype(np.int64), cols.astype(np.int64)) % denom
        ang = sign * 2.0 * np.pi * prod / denom
        dt = np.float32 if dtype_name == "float32" else np.float64
        return np.cos(ang).astype(dt), np.sin(ang).astype(dt)

    t1 = table(dev * m, k1, n)      # (d, n1)
    t2 = table(j, k1, n)            # (m, n1)
    t3 = table(dev * m, k2, n2)     # (d, n2)
    t4 = table(j, k2, n2)           # (m, n2)
    return t1, t2, t3, t4


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def fft_sharded(mesh: Mesh, re: jax.Array, im: jax.Array,
                inverse: bool = False, axis_name: str = BLOCK_AXIS
                ) -> Tuple[jax.Array, jax.Array]:
    """Unscaled complex (i)DFT of a 1-D split-complex signal sharded over
    ``mesh``'s ``axis_name``; output has the identical contiguous-chunk
    sharding. ``rifft(rfft(x)) == 2N x`` scaling conventions do not apply
    here — this is the bare transform pair (fft/ifft), like fft/api.fft."""
    n = re.shape[-1]
    d = mesh.shape[axis_name]
    if re.ndim != 1:
        raise ValueError("fft_sharded operates on 1-D signals")
    if d == 1:
        return matmul_fft.fft_split(re, im, inverse=inverse)
    if not sharded_eligible(n, d):
        raise ValueError(f"size {n} not distributable over {d} devices")
    n1, n2 = matmul_fft._split_factors(n)
    m = n2 // d
    t1, t2, t3, t4 = _phase_tables(n, d, re.dtype.name, inverse)

    def local(re_l, im_l, t1_l, t3_l):
        # re_l: this device's contiguous chunk of x = a (n1/d, n2) row block
        # of A. One all_to_all turns it into all rows for a slab of m columns.
        a0r = re_l.reshape(n1 // d, n2)
        a0i = im_l.reshape(n1 // d, n2)
        ar = jax.lax.all_to_all(a0r, axis_name, split_axis=1, concat_axis=0,
                                tiled=True)            # (n1, m)
        ai = jax.lax.all_to_all(a0i, axis_name, split_axis=1, concat_axis=0,
                                tiled=True)
        # Column DFTs: rows of the transpose, via the single-chip MXU path
        # (recursive four-step for n1 > 1024).
        br, bi = matmul_fft.fft_split(ar.T, ai.T, inverse=inverse)  # (m, k1)
        # Twiddle W_N^{n2 k1} = T1[dev] * T2 (factorised).
        twr, twi = _cmul(t1_l[0, 0][None, :], t1_l[0, 1][None, :],
                         jnp.asarray(t2[0]), jnp.asarray(t2[1]))  # (m, n1)
        cr, ci = _cmul(br, bi, twr, twi)
        # Step 4: partial DFT over this device's n2 slab (dense MXU matmul),
        # summed across devices straight into k2-sharded form.
        fr, fi = _cmul(t3_l[0, 0][None, :], t3_l[0, 1][None, :],
                       jnp.asarray(t4[0]), jnp.asarray(t4[1]))  # (m, n2)
        dr, di = matmul_fft._cmatmul(cr.T, ci.T, fr, fi)  # (k1, k2) partial
        dr = jax.lax.psum_scatter(dr, axis_name, scatter_dimension=1,
                                  tiled=True)          # (n1, m)
        di = jax.lax.psum_scatter(di, axis_name, scatter_dimension=1,
                                  tiled=True)
        # X[k1 + n1*k2]: k2-major flatten -> this device's chunk is rows
        # [dev*m, (dev+1)*m) of X viewed as (n2, n1).
        return dr.T.reshape(-1), di.T.reshape(-1)

    spec = P(axis_name)
    tspec = P(axis_name, None, None)
    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(spec, spec, tspec, tspec),
                       out_specs=(spec, spec), check_vma=False)
    # Per-device tables stacked on the mesh axis: (d, 2, n) = (cos, sin).
    t1d = jnp.stack([jnp.asarray(t1[0]), jnp.asarray(t1[1])], axis=1)
    t3d = jnp.stack([jnp.asarray(t3[0]), jnp.asarray(t3[1])], axis=1)
    return fn(re, im, t1d, t3d)
