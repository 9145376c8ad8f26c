"""Pallas TPU kernels for the partitioned-convolution hot loop.

The frequency-domain partition MAC — ``Y[t,k] = sum_p X[t-1-p,k] * H[p,k]`` — is the
framework's hottest loop (the reference's ``processPartition`` SIMD MAC,
PartitionedConvolve.cpp:387-426). The XLA formulation makes one full pass over the
spectra per partition lag (P passes of HBM traffic); this kernel tiles (channel x
bin) blocks into VMEM and accumulates all P lags on-chip, so every spectrum is read
from HBM exactly once — speed-of-light for this op is then pure HBM bandwidth on
X + H + Y.

Layout: split-complex planes, grid over (channels, bin-tiles); the hop axis stays
whole inside a block (bounded by VMEM; the caller falls back to the XLA loop when
it does not fit).

Packed-bin note: lane handling for the packed DC/Nyquist bin (global bin 0) is a
generic complex multiply inside the kernel; the caller overwrites bin 0 with the
two real products afterwards (cheap (C,T)-sized fix-up) — same result as
``packed_mul``'s special-casing.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for choosing the bin-tile width.
_VMEM_BUDGET = 10 * 1024 * 1024


def _pick_bin_tile(t: int, p: int, bins: int, dtype_bytes: int = 4) -> int:
    """Largest 128-multiple tile such that X+H+Y blocks plus the cumulative
    unrolled-lag temporaries (Mosaic's scoped stack does not reuse across
    unrolled iterations: ~4 product arrays x t rows per lag) fit the budget."""
    tile = min(bins, 8192)
    while tile >= 128:
        need = dtype_bytes * 2 * ((t + p) * tile + p * tile + 2 * t * tile)
        need += 16 * p * t * tile
        if need <= _VMEM_BUDGET and bins % tile == 0:
            return tile
        tile //= 2
    return 0


def _bin0_mask(width: int):
    """Lane mask for the packed DC/Nyquist bin: true only in column 0 of the
    k-tile that holds global bin 0 (grid dim 1 is the bin-tile index)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
    return (cols == 0) & (pl.program_id(1) == 0)


def _packed_products(xr, xi, hr, hi, mask):
    """Complex product per bin with the packed bin-0 lanes handled in place:
    DC and Nyquist are real and multiply independently (re*re, im*im) —
    reference processPartition's special-casing (PartitionedConvolve.cpp:
    387-426) as a lane select instead of a caller-side fix-up pass."""
    pre = jnp.where(mask, xr * hr, xr * hr - xi * hi)
    pim = jnp.where(mask, xi * hi, xr * hi + xi * hr)
    return pre, pim


def _lag_mac_kernel(xre_ref, xim_ref, hre_ref, him_ref, yre_ref, yim_ref,
                    *, t: int, p: int, skip: int):
    """One (channel, bin-tile) block: accumulate all P lags in VMEM.

    The lag loop is unrolled in Python so every sliding-window slice has a
    *static* start — Mosaic cannot prove alignment for dynamic sublane offsets,
    but lowers static unaligned slices fine. ``skip`` ignores that many leading
    rows of the spectra block (callers whose forward transform emits an unused
    leading spectrum avoid slicing it off in HBM).
    """
    shape = (t, yre_ref.shape[-1])
    mask = _bin0_mask(shape[1])
    acc_re = jnp.zeros(shape, yre_ref.dtype)
    acc_im = jnp.zeros(shape, yre_ref.dtype)
    for lag in range(p):
        start = skip + p - 1 - lag
        xr = xre_ref[0, start:start + t, :]
        xi = xim_ref[0, start:start + t, :]
        hr = hre_ref[0, lag:lag + 1, :]
        hi = him_ref[0, lag:lag + 1, :]
        pre, pim = _packed_products(xr, xi, hr, hi, mask)
        acc_re = acc_re + pre
        acc_im = acc_im + pim
    yre_ref[0, :, :] = acc_re
    yim_ref[0, :, :] = acc_im


def lag_mac(xpad_re: jax.Array, xpad_im: jax.Array,
            h_re: jax.Array, h_im: jax.Array, t: int,
            interpret: bool = False, lead_skip: int = 0
            ) -> Tuple[jax.Array, jax.Array]:
    """Fused partition MAC over zero-padded spectra.

    ``xpad_*``: (C, S+T+P, K) — X_t at index lead_skip+t+P (P zeros — or halo
    history — in front, ``lead_skip`` ignored leading rows).
    ``h_*``:    (C, P, K) partition spectra.
    Returns (C, T, K) packed-correct accumulations (the DC/Nyquist lane is
    special-cased inside the kernel).
    """
    c, tp, k = xpad_re.shape
    p = h_re.shape[-2]
    assert tp == lead_skip + t + p, (tp, lead_skip, t, p)
    tile = _pick_bin_tile(t, p, k)
    if tile == 0:
        raise ValueError("block does not fit VMEM; use the XLA fallback")

    grid = (c, k // tile)
    kernel = functools.partial(_lag_mac_kernel, t=t, p=p, skip=lead_skip)
    x_spec = pl.BlockSpec((1, tp, tile), lambda ci, ki: (ci, 0, ki),
                          memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((1, p, tile), lambda ci, ki: (ci, 0, ki),
                          memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec((1, t, tile), lambda ci, ki: (ci, 0, ki),
                          memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((c, t, k), xpad_re.dtype)] * 2

    yre, yim = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[x_spec, x_spec, h_spec, h_spec],
        out_specs=[y_spec, y_spec],
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * c * t * p * k,
            bytes_accessed=8 * c * ((t + p) * k + p * k + t * k),
            transcendentals=0,
        ),
    )(xpad_re, xpad_im, h_re, h_im)
    return yre, yim


def lag_mac_fits(t: int, p: int, bins: int) -> bool:
    return _pick_bin_tile(t, p, bins) > 0


# -----------------------------------------------------------------------------
# Causal (unpadded) variant: accumulate only valid lags via static slice
# offsets, so the caller never materialises a zero-padded spectra array.
# -----------------------------------------------------------------------------

def _lag_mac_causal_kernel(xre_ref, xim_ref, hre_ref, him_ref, exch_ref,
                           yre_ref, yim_ref, *, t: int, p: int):
    """Y_t = sum_p X_{t-1-p} H_p with X unpadded, one output row at a time:
    row t is an elementwise product of X rows [t-nv, t) against the matching
    contiguous slice of the reversed impulse spectra (rows [p-nv, p)), reduced
    over the sublane axis. All slice starts are static (loop unrolled) and the
    live temporaries are constant-size — unlike an accumulator chain of
    front-padded products, which keeps O(P) temporaries alive and blows the
    VMEM stack for large partition counts.

    The reversal happens in-kernel as an exact exchange-matrix matmul
    (Mosaic cannot lower `rev`; an XLA-side flip would cost a full HBM pass
    over the spectra every call). The packed DC/Nyquist lane is special-cased
    in place (see _packed_products).
    """
    width = yre_ref.shape[-1]
    exch = exch_ref[...]
    dn = (((1,), (0,)), ((), ()))
    # HIGHEST keeps the 0/1-coefficient permutation matmul exact for f32.
    hre = jax.lax.dot_general(exch, hre_ref[0], dn,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
    him = jax.lax.dot_general(exch, him_ref[0], dn,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
    mask = _bin0_mask(width)
    rows_re = [jnp.zeros((1, width), yre_ref.dtype)]   # row 0 has no valid lag
    rows_im = [jnp.zeros((1, width), yre_ref.dtype)]
    for ti in range(1, t):
        nv = min(p, ti)
        xr = xre_ref[0, ti - nv:ti, :]
        xi = xim_ref[0, ti - nv:ti, :]
        hr = hre[p - nv:p, :]
        hi = him[p - nv:p, :]
        pre, pim = _packed_products(xr, xi, hr, hi, mask)
        rows_re.append(jnp.sum(pre, axis=0, keepdims=True))
        rows_im.append(jnp.sum(pim, axis=0, keepdims=True))
    yre_ref[0, :, :] = jnp.concatenate(rows_re, axis=0)
    yim_ref[0, :, :] = jnp.concatenate(rows_im, axis=0)


def _pick_bin_tile_causal(t: int, p: int, bins: int) -> int:
    # Mosaic's scoped stack reuses temporaries across unrolled iterations only
    # partially: measured live-set ~2 arrays x 4 bytes x nv rows summed over
    # all output rows (a t=31/p=30/tile=8192 compile reported 29.5M = ~2x
    # cum_rows), modeled here with a 25% margin.
    cum_rows = sum(min(p, ti) for ti in range(1, t))
    tile = min(bins, 8192)
    while tile >= 128:
        need = 4 * 2 * (2 * t + p + 2 * t) * tile + 10 * cum_rows * tile
        if need <= _VMEM_BUDGET and bins % tile == 0:
            return tile
        tile //= 2
    return 0


def lag_mac_causal(x_re: jax.Array, x_im: jax.Array,
                   h_re: jax.Array, h_im: jax.Array,
                   interpret: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Fused partition MAC over UNPADDED spectra.

    ``x_*``: (C, T, K) hop spectra X_0..X_{T-1}; ``h_*``: (C, P, K) in natural
    order (reversal happens in-kernel). Returns (C, T, K) packed-correct
    accumulations Y_t = sum_p X_{t-1-p} * H_p. Row 0 is always zero.
    """
    c, t, k = x_re.shape
    p = h_re.shape[-2]
    tile = _pick_bin_tile_causal(t, p, k)
    if tile == 0:
        raise ValueError("block does not fit VMEM; use the XLA fallback")

    exch = jnp.asarray(np.eye(p, dtype=np.float32)[::-1].copy())

    grid = (c, k // tile)
    kernel = functools.partial(_lag_mac_causal_kernel, t=t, p=p)
    x_spec = pl.BlockSpec((1, t, tile), lambda ci, ki: (ci, 0, ki),
                          memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((1, p, tile), lambda ci, ki: (ci, 0, ki),
                          memory_space=pltpu.VMEM)
    e_spec = pl.BlockSpec((p, p), lambda ci, ki: (0, 0),
                          memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((c, t, k), x_re.dtype)] * 2

    yre, yim = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[x_spec, x_spec, h_spec, h_spec, e_spec],
        out_specs=[x_spec, x_spec],
        out_shape=out_shape,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * c * t * p * k,
            bytes_accessed=8 * c * k * (2 * t + p),
            transcendentals=0,
        ),
    )(x_re, x_im, h_re, h_im, exch)
    return yre, yim


def lag_mac_causal_fits(t: int, p: int, bins: int) -> bool:
    return _pick_bin_tile_causal(t, p, bins) > 0
