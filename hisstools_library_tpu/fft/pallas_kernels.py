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
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fft import vmem_budget

# VMEM budget for choosing the bin-tile width. Scaled by HISSTOOLS_VMEM_SCALE
# (see pallas_fft.vmem_budget); boundaries validated by tools/vmem_probe.py.
_VMEM_BUDGET = vmem_budget(10)


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

    The packed DC/Nyquist lane is fixed up ONCE after the loop (two wide
    selects + a 1-lane accumulation) instead of two selects per lag — the
    in-loop selects were ~25% of the MAC's vector-op count.
    """
    width = yre_ref.shape[-1]
    shape = (t, width)
    acc_re = jnp.zeros(shape, yre_ref.dtype)
    acc_im = jnp.zeros(shape, yre_ref.dtype)
    a0_re = jnp.zeros((t, 1), yre_ref.dtype)
    a0_im = jnp.zeros((t, 1), yre_ref.dtype)
    for lag in range(p):
        start = skip + p - 1 - lag
        xr = xre_ref[0, start:start + t, :]
        xi = xim_ref[0, start:start + t, :]
        hr = hre_ref[0, lag:lag + 1, :]
        hi = him_ref[0, lag:lag + 1, :]
        acc_re = acc_re + (xr * hr - xi * hi)
        acc_im = acc_im + (xr * hi + xi * hr)
        # Packed lane: DC and Nyquist are real pairs multiplying independently.
        a0_re = a0_re + (xre_ref[0, start:start + t, 0:1]
                         * hre_ref[0, lag:lag + 1, 0:1])
        a0_im = a0_im + (xim_ref[0, start:start + t, 0:1]
                         * him_ref[0, lag:lag + 1, 0:1])
    sel = _bin0_mask(width)
    yre_ref[0, :, :] = jnp.where(sel, a0_re, acc_re)
    yim_ref[0, :, :] = jnp.where(sel, a0_im, acc_im)


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
    rows_re = [jnp.zeros((1, width), yre_ref.dtype)]   # row 0 has no valid lag
    rows_im = [jnp.zeros((1, width), yre_ref.dtype)]
    f0_re = [jnp.zeros((1, 1), yre_ref.dtype)]
    f0_im = [jnp.zeros((1, 1), yre_ref.dtype)]
    for ti in range(1, t):
        nv = min(p, ti)
        xr = xre_ref[0, ti - nv:ti, :]
        xi = xim_ref[0, ti - nv:ti, :]
        hr = hre[p - nv:p, :]
        hi = him[p - nv:p, :]
        rows_re.append(jnp.sum(xr * hr - xi * hi, axis=0, keepdims=True))
        rows_im.append(jnp.sum(xr * hi + xi * hr, axis=0, keepdims=True))
        # Packed lane (column 0 of the bin-0 tile): real pairs, accumulated
        # narrowly here and selected in ONCE below — cheaper than two wide
        # selects per output row (was ~25% of the MAC's vector-op count).
        f0_re.append(jnp.sum(xr[:, 0:1] * hr[:, 0:1], axis=0, keepdims=True))
        f0_im.append(jnp.sum(xi[:, 0:1] * hi[:, 0:1], axis=0, keepdims=True))
    yre = jnp.concatenate(rows_re, axis=0)
    yim = jnp.concatenate(rows_im, axis=0)
    sel = _bin0_mask(width)
    yre_ref[0, :, :] = jnp.where(sel, jnp.concatenate(f0_re, axis=0), yre)
    yim_ref[0, :, :] = jnp.where(sel, jnp.concatenate(f0_im, axis=0), yim)


def _pick_bin_tile_causal(t: int, p: int, bins: int) -> int:
    # Mosaic's scoped stack reuses temporaries across unrolled iterations only
    # partially: measured live-set ~2 arrays x 4 bytes x nv rows summed over
    # all output rows (a t=31/p=30/tile=8192 compile reported 29.5M = ~2x
    # cum_rows), modeled here with a 25% margin.
    cum_rows = sum(min(p, ti) for ti in range(1, t))
    tile = min(bins, 8192)
    while tile >= 128:
        # 4*p*p: the whole (P, P) exchange matrix rides in VMEM (e_spec) —
        # tile-independent, and dominant at large P (vmem_probe round 2:
        # the unmodeled 67 MB at P=4096 failed on hardware).
        need = (4 * p * p + 4 * 2 * (2 * t + p + 2 * t) * tile
                + 10 * cum_rows * tile)
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


# Partition-count envelope for the causal/ring kernels: the byte models above
# admit P into the low thousands, but the kernels unroll per-lag slices and
# Mosaic compile time grows super-linearly there (a P~1500 probe compile ran
# past 10 minutes). 512 bounds the hardware-validated region (vmem_probe
# compiles the boundary); beyond it the XLA lag loop serves correctly.
_MAX_MAC_PARTITIONS = 512


def lag_mac_causal_fits(t: int, p: int, bins: int) -> bool:
    return p <= _MAX_MAC_PARTITIONS and _pick_bin_tile_causal(t, p, bins) > 0


# -----------------------------------------------------------------------------
# Fused single-hop engine kernel (the streaming latency path).
#
# One hop-boundary firing of a small partitioned section — rFFT of the
# [prev|cur] frame, ring insert, P-partition MAC, tail-only riFFT with the
# 1/(4N) overlap-save scale — is ~50 small XLA ops taking ~0.2-0.3 ms on
# device (op overhead, not FLOPs: the whole firing is <10 MFLOP). This kernel
# is the entire firing as ONE Pallas program: dense packed-DFT matmuls (MXU)
# with everything VMEM-resident. Reference analogue: the per-hop FFT->MAC->
# iFFT block of PartitionedConvolve::process (PartitionedConvolve.cpp:352-377).
#
# Ring layout: oldest-first with the newest spectrum at slot P-1 — identical
# to the generic StreamState convention at pos == 0 (models/partitioned.py),
# so states are interchangeable between this kernel and the XLA path as long
# as pos stays 0 (the kernel shifts slots statically and never moves pos).
# -----------------------------------------------------------------------------

_HOP_MAX_N = 1024
_HOP_VMEM_BUDGET = vmem_budget(12)


@functools.lru_cache(maxsize=16)
def _hop_tables(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """f64-generated dense tables: M (N, N) maps a frame to the stacked packed
    spectrum [re|im] (x2 scale, Nyquist in im[0]); W (H, N) maps a stacked
    packed accumulation to the KEPT second half-block with 1/(4N) folded in."""
    k = np.arange(n // 2, dtype=np.float64)
    nn = np.arange(n, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(k, nn) / n
    mr = 2.0 * np.cos(ang)
    mi = -2.0 * np.sin(ang)
    mi[0] = 2.0 * np.cos(np.pi * nn)              # packed Nyquist row: 2(-1)^n
    m = np.concatenate([mr, mi], axis=0).astype(np.float32)       # (N, N)

    nt = np.arange(n // 2, n, dtype=np.float64)   # kept (overlap-save) half
    angy = 2.0 * np.pi * np.outer(nt, k) / n
    wr = 2.0 * np.cos(angy)
    wr[:, 0] = 1.0                                # DC coefficient
    wi = -2.0 * np.sin(angy)
    wi[:, 0] = np.cos(np.pi * nt)                 # Nyquist: (-1)^n
    w = (np.concatenate([wr, wi], axis=1) / (4.0 * n)).astype(np.float32)
    return m, w


def hop_fire_fits(n: int, c: int, p: int) -> bool:
    """Kernel feasibility: dense tables + all operands resident in VMEM,
    plus the TILE-PADDING WASTE of the unrolled slot loop's temporaries.

    Mosaic pads every per-slot temporary to (8, 128) tiles and does NOT
    reuse the padding across the unrolled iterations — caught on hardware by
    the round-5 TPU fuzz: a (c=4, N=64, P=888) section aborted at 41 MB
    scoped where the dense-operand model said 2.8 MB. Charge ~10 temps per
    slot at (padded - true) size; configs whose dims already tile (c % 8 ==
    0, k >= 128) are unaffected. P is also capped: the slot loop unrolls P
    iterations (Mosaic compile time, and the stack grows with P even when
    tiled)."""
    if n > _HOP_MAX_N or n < 16 or (n & (n - 1)):
        return False
    if p > 256:
        return False
    k = n // 2
    tables = 4 * (n * n + k * n)
    data = 4 * c * (2 * n + 6 * p * k + 8 * k)
    cp = -(-c // 8) * 8
    kp = -(-k // 128) * 128
    pad_waste = 4 * 10 * p * (cp * kp - c * k)
    return tables + data + pad_waste <= _HOP_VMEM_BUDGET


def _hop_fire_kernel(frame_ref, rr_ref, ri_ref, hr_ref, hi_ref, m_ref, w_ref,
                     orr_ref, ori_ref, y_ref, *, p: int, k: int):
    hp = jax.lax.Precision.HIGHEST
    f = frame_ref[...]                                            # (C, N)
    x = jax.lax.dot_general(f, m_ref[...], (((1,), (1,)), ((), ())),
                            precision=hp, preferred_element_type=jnp.float32)
    xre = x[:, :k]
    xim = x[:, k:]
    cols = jax.lax.broadcasted_iota(jnp.int32, xre.shape, 1)
    lane0 = cols == 0                    # packed DC/Nyquist lane (real pair)
    acc_re = jnp.zeros_like(xre)
    acc_im = jnp.zeros_like(xim)
    for s in range(p):
        # New slot s: old slot s+1 shifted up; newest (the fresh X) at P-1.
        rre = xre if s == p - 1 else rr_ref[:, s + 1]
        rim = xim if s == p - 1 else ri_ref[:, s + 1]
        hr = hr_ref[:, p - 1 - s]                   # slot s holds lag p-1-s
        hi = hi_ref[:, p - 1 - s]
        acc_re += jnp.where(lane0, rre * hr, rre * hr - rim * hi)
        acc_im += jnp.where(lane0, rim * hi, rre * hi + rim * hr)
        orr_ref[:, s] = rre
        ori_ref[:, s] = rim
    packed = jnp.concatenate([acc_re, acc_im], axis=1)            # (C, N)
    y_ref[...] = jax.lax.dot_general(
        packed, w_ref[...], (((1,), (1,)), ((), ())),
        precision=hp, preferred_element_type=jnp.float32)


def hop_fire(frame: jax.Array, ring_re: jax.Array, ring_im: jax.Array,
             spec_re: jax.Array, spec_im: jax.Array,
             interpret: bool = False):
    """One fused hop firing. ``frame``: (..., N) the completed [prev|cur]
    frame; ``ring_*``: (..., P, N/2) oldest-first (pos == 0 convention);
    ``spec_*``: (..., P, N/2) (broadcastable over the lead dims). Returns
    (new_ring_re, new_ring_im, y) with y the H kept output samples, scaled."""
    n = frame.shape[-1]
    k = n // 2
    lead = frame.shape[:-1]
    c = int(np.prod(lead)) if lead else 1
    p = ring_re.shape[-2]
    m, w = _hop_tables(n)

    f2 = frame.reshape(c, n).astype(jnp.float32)
    rr = ring_re.reshape(c, p, k).astype(jnp.float32)
    ri = ring_im.reshape(c, p, k).astype(jnp.float32)
    hr = jnp.broadcast_to(spec_re, lead + (p, k)).reshape(c, p, k).astype(jnp.float32)
    hi = jnp.broadcast_to(spec_im, lead + (p, k)).reshape(c, p, k).astype(jnp.float32)

    vm = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    orr, ori, y = pl.pallas_call(
        functools.partial(_hop_fire_kernel, p=p, k=k),
        in_specs=[vm() for _ in range(7)],
        out_specs=[vm(), vm(), vm()],
        out_shape=[jax.ShapeDtypeStruct((c, p, k), jnp.float32),
                   jax.ShapeDtypeStruct((c, p, k), jnp.float32),
                   jax.ShapeDtypeStruct((c, k), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=c * (2 * n * n + n * k + 8 * p * k),
            bytes_accessed=4 * c * (2 * n + 6 * p * k + k) + 4 * (n * n + k * n),
            transcendentals=0,
        ),
    )(f2, rr, ri, hr, hi, jnp.asarray(m), jnp.asarray(w))
    dt = frame.dtype
    return (orr.reshape(lead + (p, k)).astype(dt),
            ori.reshape(lead + (p, k)).astype(dt),
            y.reshape(lead + (k,)).astype(dt))


# -----------------------------------------------------------------------------
# Ring-aware streaming MAC: history and new spectra read IN PLACE.
#
# process_block previously gathered the ring into oldest-first order (~4 ms of
# strided row-gather at the bench's 59-partition section), concatenated it
# with the new spectra (another full HBM round trip), ran the causal MAC over
# the concat, and sliced the last P rows back out for the new state. This
# kernel removes all three data-movement passes: the sliding lag windows read
# straight from the (already oldest-first, pos == 0) ring block and the new
# spectra block, and the new ring (the last P virtual rows) is emitted as a
# second output of the same kernel.
#
# Virtual rows V = [hist(P) | X(T)]; output row t uses V[t : t+P) against the
# REVERSED impulse spectra (exchange-matrix matmul, as in the causal kernel).
# Requires T <= P (streaming blocks shorter than the IR coverage — the usual
# case; callers fall back otherwise).
# -----------------------------------------------------------------------------

_RING_NACC = 4

# Accumulator form threshold: at small partition counts the scratch-RMW form
# (temps die each lag -> 4-16x bigger tiles -> fewer grid steps) wins — far
# tier (t=4, p=14, k=32768): 8.53 -> 7.64 ms. At large p the per-lag RMW
# round trips through VMEM scratch cost more than the grid-step savings —
# the single-tier shape (t=16, p=58) measured 21.7 ms in-situ vs 16.2 with
# the register-accumulator form. Measured round 5 on v5e.
_RING_ACC_MAX_P = 32


def _ring_use_acc(p: int) -> bool:
    env = os.environ.get("HISSTOOLS_RING_ACC", "")
    if env in ("0", "1"):
        return env == "1"
    return p <= _RING_ACC_MAX_P


def _lag_mac_ring_kernel(hre_ref, him_ref, xre_ref, xim_ref, sre_ref, sim_ref,
                         yre_ref, yim_ref, nre_ref, nim_ref, vre_s, vim_s,
                         *refs, t: int, p: int, use_acc: bool):
    # Virtual rows V = [hist | x] staged CONTIGUOUSLY in scratch, then the
    # causal kernel's lag-major loop: one static sliding slice per lag, no
    # per-row reductions. The previous ti-major form measured 0.84 logical
    # TF/s on the VPU vs the causal kernel's 1.62 at the same FLOP count —
    # the round-4 streaming bottleneck (9.26 ms of a 12.6 ms block).
    #
    # Two accumulation forms (see _RING_ACC_MAX_P):
    # - use_acc: accumulate into a SCRATCH buffer (RMW per lag) so each
    #   iteration's product temporaries die at the store and Mosaic's scoped
    #   stack REUSES them — the live-jnp-accumulator form holds every
    #   unrolled iteration's temps live (the 16*t*p*tile model term), capping
    #   the tile and making the kernel per-grid-step-overhead bound.
    # - else: FOUR interleaved register accumulators (independent dependency
    #   chains so the VPU overlaps multiply-accumulate latency).
    #
    # The packed DC/Nyquist lane is NOT special-cased here: the wrapper
    # overwrites bin 0 with the exact packed product computed in XLA.
    vre_s[:p, :] = hre_ref[0]
    vim_s[:p, :] = him_ref[0]
    vre_s[p:, :] = xre_ref[0]
    vim_s[p:, :] = xim_ref[0]
    nacc = min(_RING_NACC, p)
    if use_acc:
        acc_s = refs[0]
        for lag in range(p):
            start = p - 1 - lag
            xr = vre_s[start:start + t, :]
            xi = vim_s[start:start + t, :]
            hr = sre_ref[0, lag:lag + 1, :]
            hi = sim_ref[0, lag:lag + 1, :]
            a = lag % nacc
            if lag < nacc:
                acc_s[2 * a] = xr * hr - xi * hi
                acc_s[2 * a + 1] = xr * hi + xi * hr
            else:
                acc_s[2 * a] = acc_s[2 * a] + (xr * hr - xi * hi)
                acc_s[2 * a + 1] = acc_s[2 * a + 1] + (xr * hi + xi * hr)
        re = acc_s[0]
        im = acc_s[1]
        for a in range(1, nacc):
            re = re + acc_s[2 * a]
            im = im + acc_s[2 * a + 1]
        yre_ref[0] = re
        yim_ref[0] = im
    else:
        width = yre_ref.shape[-1]
        accs = [[jnp.zeros((t, width), jnp.float32) for _ in range(2)]
                for _ in range(nacc)]
        for lag in range(p):
            start = p - 1 - lag
            xr = vre_s[start:start + t, :]
            xi = vim_s[start:start + t, :]
            hr = sre_ref[0, lag:lag + 1, :]
            hi = sim_ref[0, lag:lag + 1, :]
            a = accs[lag % nacc]
            a[0] = a[0] + (xr * hr - xi * hi)
            a[1] = a[1] + (xr * hi + xi * hr)
        yre_ref[0] = sum(a[0] for a in accs)
        yim_ref[0] = sum(a[1] for a in accs)
    # New ring = V[T : T+P), oldest-first, pos 0.
    nre_ref[0] = vre_s[t:, :]
    nim_ref[0] = vim_s[t:, :]


def _pick_bin_tile_ring(t: int, p: int, bins: int) -> int:
    # Double-buffered io blocks + the (P+T, tile) x2 virtual-rows scratch,
    # plus per-form terms:
    # - acc form: the (2*nacc, t, tile) accumulator scratch + ONE iteration's
    #   product temporaries + an empirical 4*t*p*tile residual Mosaic
    #   allocates beyond the nominal live set (calibrated round 5 on v5e
    #   against the 16 MB scoped limit: (t=16,p=58,tile=2048) aborts at
    #   16.18 MB where this model says 17.4; (t=4,p=14,tile=8192) compiles
    #   at a modeled 11.1). Budget 14 MiB of the 16 MB hardware limit.
    # - register form: cumulative unrolled-lag temporaries (16*t*p*tile — the
    #   scoped stack does not reuse across unrolled iterations), original
    #   10 MiB budget (validated through rounds 2-4).
    # HISSTOOLS_VMEM_SCALE scales both; tools/vmem_probe.py is the gate.
    nacc = min(_RING_NACC, p)
    tile = min(bins, 8192)
    while tile >= 128:
        if _ring_use_acc(p):
            need = (4 * 2 * 2 * (3 * p + 2 * t) * tile
                    + 4 * 2 * (p + t) * tile
                    + 4 * 2 * nacc * t * tile
                    + 16 * t * tile
                    + 4 * t * p * tile)
            budget = vmem_budget(14)
        else:
            need = (4 * 2 * 2 * (3 * p + 3 * t) * tile
                    + 4 * 2 * (p + t) * tile
                    + 16 * t * p * tile)
            budget = _VMEM_BUDGET
        if need <= budget and bins % tile == 0:
            return tile
        tile //= 2
    return 0


def lag_mac_ring_fits(t: int, p: int, bins: int) -> bool:
    return (t <= p <= _MAX_MAC_PARTITIONS
            and _pick_bin_tile_ring(t, p, bins) > 0)


def lag_mac_ring(hist_re: jax.Array, hist_im: jax.Array,
                 x_re: jax.Array, x_im: jax.Array,
                 h_re: jax.Array, h_im: jax.Array,
                 interpret: bool = False):
    """Streaming partition MAC with in-place ring reads.

    ``hist_*``: (C, P, K) oldest-first ring (pos == 0 convention);
    ``x_*``: (C, T, K) new hop spectra (T <= P); ``h_*``: (C, P, K) natural
    order. Returns (y_re, y_im, new_hist_re, new_hist_im): the T outputs
    Y_t = sum_p V[P+t-1-p] H_p over virtual rows V = [hist | X], and the
    last P virtual rows as the new ring."""
    c, p, k = hist_re.shape
    t = x_re.shape[-2]
    tile = _pick_bin_tile_ring(t, p, k)
    if tile == 0 or t > p:
        raise ValueError("lag_mac_ring infeasible; check lag_mac_ring_fits")

    grid = (c, k // tile)
    h_spec = pl.BlockSpec((1, p, tile), lambda ci, ki: (ci, 0, ki),
                          memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((1, t, tile), lambda ci, ki: (ci, 0, ki),
                          memory_space=pltpu.VMEM)
    use_acc = _ring_use_acc(p)
    scratch = [pltpu.VMEM((p + t, tile), jnp.float32)] * 2
    if use_acc:
        scratch += [pltpu.VMEM((2 * min(_RING_NACC, p), t, tile),
                               jnp.float32)]
    yre, yim, nre, nim = pl.pallas_call(
        functools.partial(_lag_mac_ring_kernel, t=t, p=p, use_acc=use_acc),
        grid=grid,
        in_specs=[h_spec, h_spec, x_spec, x_spec, h_spec, h_spec],
        out_specs=[x_spec, x_spec, h_spec, h_spec],
        out_shape=[jax.ShapeDtypeStruct((c, t, k), x_re.dtype)] * 2 +
                  [jax.ShapeDtypeStruct((c, p, k), x_re.dtype)] * 2,
        scratch_shapes=scratch,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=8 * c * t * p * k,
            bytes_accessed=4 * c * k * (4 * p + 4 * t),
            transcendentals=0,
        ),
    )(hist_re, hist_im, x_re, x_im, h_re, h_im)
    # Packed DC/Nyquist lane, computed in XLA over the (C, P+T) bin-0 column
    # (the kernel's bin 0 holds the plain complex product — see the kernel
    # comment; the special lane is 1/K of the data and O(C*T*P) scalar work
    # here, vs a doubled VPU instruction stream in the kernel).
    # Accumulate the special lane in float32 regardless of the caller's dtype
    # (a bf16/f16 caller would otherwise lose the kernel's f32-accumulation
    # precision on exactly this lane — ADVICE r4); cast back at the splice.
    v0_re = jnp.concatenate([hist_re[..., 0], x_re[..., 0]],
                            axis=-1).astype(jnp.float32)
    v0_im = jnp.concatenate([hist_im[..., 0], x_im[..., 0]],
                            axis=-1).astype(jnp.float32)
    idx = np.arange(t)[:, None] + (p - 1 - np.arange(p))[None, :]  # (T, P)
    y0_re = jnp.sum(v0_re[..., idx] * h_re[..., None, :, 0].astype(jnp.float32),
                    axis=-1)
    y0_im = jnp.sum(v0_im[..., idx] * h_im[..., None, :, 0].astype(jnp.float32),
                    axis=-1)
    yre = jnp.concatenate([y0_re[..., None].astype(yre.dtype), yre[..., 1:]],
                          axis=-1)
    yim = jnp.concatenate([y0_im[..., None].astype(yim.dtype), yim[..., 1:]],
                          axis=-1)
    return yre, yim, nre, nim
