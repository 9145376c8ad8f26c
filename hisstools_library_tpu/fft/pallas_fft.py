"""Fused Pallas TPU FFT kernels: real/complex four-step transforms in VMEM.

The reference FFT (/root/reference/HISSTools_FFT/HISSTools_FFT_Core.h:1293-1374) is
an in-place radix-4/2 pipeline whose passes all hit cache; the XLA FFT HLO and the
staged matmul backend (matmul_fft.py) both stream every intermediate through HBM.
These kernels are the TPU speed-of-light formulation for batched mid/large sizes:
the whole four-step factorisation runs inside VMEM, so each signal is read from HBM
exactly once and written exactly once, with both DFT stages on the MXU.

Forward real transform (``rfft_packed``), N = n1*n2, x real:

    A[a, b]  = x[a*n2 + b]                      free bitcast outside the kernel
    B[k1, b] = sum_a A[a, b] * W_n1^(a k1)      MXU: 2 real matmuls (A is real)
    C[k1, b] = B * W_N^(b k1)                   VPU twiddle
    E[k2,k1] = sum_b C[k1, b] * W_n2^(b k2)     MXU, transpose folded into the
                                                dot_general dimension numbers
    X[k1 + n1*k2] = E[k2, k1]

Only rows k2 in [0, n2/2] are computed (Hermitian symmetry); the kernel emits the
HISSTools/vDSP packed layout directly — x2 scale folded into the stage-1 DFT
matrix, DC in re[0], Nyquist (row n2/2, col 0) packed into im[0]
(HISSTools_FFT_Core.h:934-988). No deinterleave or recombination pass exists at
all: the zip/real-conversion passes of the reference become *indexing* here.

Inverse (``rifft_packed``), output n = r + n2*s, unscaled (rifft(rfft(x)) = 2N x):

    H[k1, r] = sum_k2 X[k2, k1] * W_n2^(-r k2)      MXU
    H'[k1,r] = H * W_N^(-r k1)                      VPU
    S[s, r]  = sum_k1 W_n1^(-s k1) * H'[k1, r]      MXU (real part only)
    y[n]     = 2 Re(S) - X[0] + (-1)^n * Nyq

DFT matrices and twiddles are generated in float64 on the host and cast (the
reference generates twiddles in f64 too, HISSTools_FFT_Core.h:437-444). They enter
the kernel through HBM and are DMA'd ONCE into persistent VMEM scratch on grid
step 0 — keeping them out of the pipeline's double-buffered block path (which
would both re-fetch them per step and double their VMEM footprint).

MXU modes (``set_mode``): float32 operands on TPU lower to bf16 multi-pass
matmuls. "highest" = Precision.HIGHEST (6 passes, ~f32-exact). "bf16x3" = manual
3-pass split (a = hi + lo in bf16; drop lo*lo) — 2x faster, error ~2^-16 relative
(>95 dB SNR), still far above the 80 dB framework target.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import matmul_fft

# Real sizes handled by the fused real kernels; complex sizes by the complex one.
# Below MIN the XLA-fused dense matmul (matmul_fft direct path) is already one
# pass. Up to MAX_SINGLE_REAL the whole four-step transform runs in ONE kernel;
# 2^18..2^20 (the engine's full validated range, PartitionedConvolve.h:18-19)
# exceed the 16 MB scoped-VMEM limit in one kernel (tables alone reach ~22 MB
# at 2^20), so they run as a SPLIT pair of kernels — stage-1+twiddle and
# stage-2+packing — with the k1 axis chunked across grid steps: two HBM round
# trips instead of the staged matmul path's four-plus.
MIN_REAL_SIZE = 4096
MAX_SINGLE_REAL = 1 << 17
MAX_REAL_SIZE = 1 << 20
MIN_COMPLEX_SIZE = 2048
MAX_COMPLEX_SIZE = 1 << 17

# All byte budgets below are analytic VMEM models validated at their claimed
# boundaries by tools/vmem_probe.py (hardware compile probes — run it after any
# kernel or tile-model change). HISSTOOLS_VMEM_SCALE (default 1.0) uniformly
# tightens/loosens every budget: the operational escape hatch if a Mosaic or
# XLA update shifts the real per-kernel ceiling before the models are re-tuned.
_VMEM_SCALE = float(os.environ.get("HISSTOOLS_VMEM_SCALE", "1.0"))


def vmem_budget(mib: float) -> int:
    """``mib`` MiB scaled by HISSTOOLS_VMEM_SCALE, in bytes."""
    return int(mib * 1024 * 1024 * _VMEM_SCALE)


_VMEM_TARGET = vmem_budget(13)

_MODE = "highest"  # or "bf16x3"


def set_mode(mode: str) -> None:
    """Set the default MXU matmul mode for the fused kernels AND the staged
    matmul backend's f32 dots (matmul_fft serves the small-N sizes the fused
    kernels don't cover — keeping the modes in sync keeps the quality/speed
    trade uniform across the size range)."""
    global _MODE
    if mode not in ("highest", "bf16x3"):
        raise ValueError(f"unknown pallas fft mode {mode!r}")
    _MODE = mode
    matmul_fft.set_f32_dot_mode(mode)


def get_mode() -> str:
    return _MODE


def _interpret_default() -> bool:
    return jax.default_backend() == "cpu"


def _bsplit(x):
    """hi/lo bf16 split of an f32 operand (the bf16x3 decomposition)."""
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    return xh, xl


class _Dot:
    """Mode-aware dot_general. In bf16x3 mode the three partial products
    ah@bh + ah@bl + al@bh fuse into ONE dot over a 3x contraction:
    [ah|ah|al] @ [bh;bl;bh] — three separate dots with f32 adds in between
    run the MXU at ~38% of peak (pipeline drains between small matmuls)
    while a single long-contraction dot reaches ~70%. ``lhs``/``rhs`` stack
    an operand once along its contraction axis; stacked values are tagged so
    they are built once per kernel invocation (tables) or per use (data)."""

    def __init__(self, mode: str):
        self.split = mode == "bf16x3"

    def lhs(self, x, axis: int):
        if not self.split:
            return x
        xh, xl = _bsplit(x)
        return ("L", jnp.concatenate([xh, xh, xl], axis=axis))

    def rhs(self, x, axis: int):
        if not self.split:
            return x
        xh, xl = _bsplit(x)
        return ("R", jnp.concatenate([xh, xl, xh], axis=axis))

    def __call__(self, lhs, rhs, dims):
        if self.split:
            (lt, la) = lhs if isinstance(lhs, tuple) else ("raw", lhs)
            (rt, ra) = rhs if isinstance(rhs, tuple) else ("raw", rhs)
            if lt == "raw":
                la = self.lhs(la, dims[0][0][0])[1]
            if rt == "raw":
                ra = self.rhs(ra, dims[0][1][0])[1]
            return jax.lax.dot_general(la, ra, dimension_numbers=dims,
                                       preferred_element_type=jnp.float32)
        return jax.lax.dot_general(lhs, rhs, dimension_numbers=dims,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)


def _dg(lhs, rhs, dims, mode):
    """dot_general in the selected MXU mode (f32 accumulate either way)."""
    return _Dot(mode)(lhs, rhs, dims)

_MM = (((1,), (0,)), ((), ()))    # standard matmul
_T2 = (((0,), (1,)), ((), ()))    # lhs^T @ rhs^T -> folded output transpose
_T0 = (((0,), (0,)), ((), ()))    # lhs^T @ rhs


def _pad8(n: int) -> int:
    return -(-n // 8) * 8


def _load_tables_once(hbm_refs, vmem_refs, sems, grid_rank: int = 1):
    """DMA the constant tables HBM -> persistent scratch on the FIRST grid
    step only — the predicate must cover every grid dimension or later steps
    re-issue (and block on) the multi-MB copies."""
    first = pl.program_id(0) == 0
    for d in range(1, grid_rank):
        first = first & (pl.program_id(d) == 0)

    @pl.when(first)
    def _():
        dmas = [pltpu.make_async_copy(h, v, sems.at[i])
                for i, (h, v) in enumerate(zip(hbm_refs, vmem_refs))]
        for d in dmas:
            d.start()
        for d in dmas:
            d.wait()


# -----------------------------------------------------------------------------
# Host-side tables (float64 source, cast to f32)
# -----------------------------------------------------------------------------

def _split_real(n: int) -> Tuple[int, int]:
    # One square-split heuristic for the whole FFT stack (matmul + kernels).
    return matmul_fft._split_factors(n)


@lru_cache(maxsize=32)
def _fwd_tables(n1: int, n2: int):
    n = n1 * n2
    a = np.arange(n1, dtype=np.float64)
    ang1 = 2.0 * np.pi * np.outer(a, a) / n1
    f1r = (2.0 * np.cos(ang1)).astype(np.float32)     # x2 packed scale folded in
    f1i = (-2.0 * np.sin(ang1)).astype(np.float32)
    k1 = np.arange(n1, dtype=np.float64)[:, None]
    b = np.arange(n2, dtype=np.float64)[None, :]
    angt = 2.0 * np.pi * k1 * b / n
    twr = np.cos(angt).astype(np.float32)
    twi = (-np.sin(angt)).astype(np.float32)
    rows = _pad8(n2 // 2 + 1)
    bb = np.arange(n2, dtype=np.float64)[:, None]
    k2 = np.arange(rows, dtype=np.float64)[None, :]
    ang2 = 2.0 * np.pi * bb * k2 / n2
    f2r = np.cos(ang2).astype(np.float32)
    f2i = (-np.sin(ang2)).astype(np.float32)
    f2s = (np.cos(ang2) - np.sin(ang2)).astype(np.float32)  # Karatsuba sum table
    return f1r, f1i, twr, twi, f2r, f2i, f2s


@lru_cache(maxsize=32)
def _inv_tables(n1: int, n2: int):
    n = n1 * n2
    n2h = n2 // 2
    k2 = np.arange(n2h, dtype=np.float64)[:, None]
    r = np.arange(n2, dtype=np.float64)[None, :]
    angq = 2.0 * np.pi * k2 * r / n2
    qr = np.cos(angq).astype(np.float32)
    qi = np.sin(angq).astype(np.float32)                 # W^(-r k2)
    k1 = np.arange(n1, dtype=np.float64)[:, None]
    angt = 2.0 * np.pi * k1 * r / n
    ctr = np.cos(angt).astype(np.float32)
    cti = np.sin(angt).astype(np.float32)                # conj twiddle
    qs = (np.cos(angq) + np.sin(angq)).astype(np.float32)  # Karatsuba sum table
    s = np.arange(n1, dtype=np.float64)
    angp = 2.0 * np.pi * np.outer(s, s) / n1
    p1r = np.cos(angp).astype(np.float32)
    p1i = np.sin(angp).astype(np.float32)                # W^(-s k1)
    return qr, qi, qs, ctr, cti, p1r, p1i


# -----------------------------------------------------------------------------
# Kernels (tables arrive in HBM; scratch holds the VMEM-resident copies)
# -----------------------------------------------------------------------------

# -----------------------------------------------------------------------------
# Shared in-kernel stages. Every forward/inverse/fused kernel builds its body
# from these four blocks so the packed-lane handling, Karatsuba products, and
# table-stacking discipline live in ONE place (they used to be hand-synced
# copies across _rfft_stream/_rifft_tail/_fastfir/_fastfir_stream).
# -----------------------------------------------------------------------------

def _stack_inv(dot, qr_s, qi_s, qs_s, ctr_s, cti_s, p1r_s, p1i_s,
               tail_from: int = 0):
    """Inverse-table operands, mode-stacked once per kernel invocation.
    ``tail_from``: first stage-C row to keep (n1/2 for tail-only kernels —
    the discarded half-block's rows are never computed)."""
    return (dot.rhs(qr_s[...], 0), dot.rhs(qi_s[...], 0), dot.rhs(qs_s[...], 0),
            ctr_s[...], cti_s[...],
            dot.lhs(p1r_s[...][tail_from:, :], 1),
            dot.lhs(p1i_s[...][tail_from:, :], 1))


def _tail_block(dot, pr, pi, qr, qi, qs, ctr, cti, p1r, p1i, scale: float = 1.0):
    """Packed spectrum (n2h, n1) -> real block rows of the riFFT (all rows or
    the kept tail, per the p1 slice). Step A is a Karatsuba 3-matmul complex
    product (qs = qr + qi); the x2 packed scale is used as-is:
    y = 2 Re(S) - X[0] + (-1)^n Nyq, giving rifft(rfft(x)) == 2N x."""
    x0 = pr[0, 0]
    nyq = pi[0, 0]
    rows = jax.lax.broadcasted_iota(jnp.int32, pr.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, pr.shape, 1)
    pi0 = jnp.where((rows == 0) & (cols == 0), 0.0, pi)
    m1 = dot(dot.lhs(pr, 0), qr, _T0)
    m2 = dot(dot.lhs(pi0, 0), qi, _T0)
    m3 = dot(dot.lhs(pr + pi0, 0), qs, _T0)
    hr = m1 - m2                                             # (n1, n2)
    hi = m3 - m1 - m2
    h2r = hr * ctr - hi * cti
    h2i = hr * cti + hi * ctr
    sr = dot(p1r, dot.rhs(h2r, 0), _MM) - dot(p1i, dot.rhs(h2i, 0), _MM)
    par_cols = jax.lax.broadcasted_iota(jnp.int32, sr.shape, 1)
    parity = jnp.where((par_cols % 2) == 0, 1.0, -1.0).astype(sr.dtype)
    out = 2.0 * sr - x0 + nyq * parity
    return out * scale if scale != 1.0 else out


def _fwd_stage2_pack(dot, br, bi, twr, twi, f2r, f2i, f2s, n2h: int):
    """Stage-1 output -> twiddle -> Karatsuba stage 2 (f2s = f2r + f2i) ->
    packed (re, im-with-Nyquist-in-[0,0]) planes of shape (n2h, n1)."""
    cr = br * twr - bi * twi
    ci = br * twi + bi * twr
    m1 = dot(f2r, dot.rhs(cr, 1), _T2)
    m2 = dot(f2i, dot.rhs(ci, 1), _T2)
    m3 = dot(f2s, dot.rhs(cr + ci, 1), _T2)
    er = m1 - m2                                             # (rows_pad, n1)
    ei = m3 - m1 - m2
    nyq = er[n2h, 0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n2h, er.shape[1]), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n2h, er.shape[1]), 1)
    at00 = (rows == 0) & (cols == 0)
    return er[:n2h, :], jnp.where(at00, nyq, ei[:n2h, :])


def _fwd_frame(dot, prev, cur, f1r_lo, f1r_hi, f1i_lo, f1i_hi,
               twr, twi, f2r, f2i, f2s, n2h: int, pm=None):
    """Forward rFFT of the overlap-save [prev | cur] frame (the reference's
    staged frame, PartitionedConvolve.cpp:304-307, never materialised).
    ``pm`` (0/1) masks the prev contribution on a first hop with no history."""
    bp_r = dot(f1r_lo, prev, _MM)
    bp_i = dot(f1i_lo, prev, _MM)
    if pm is not None:
        bp_r = pm * bp_r
        bp_i = pm * bp_i
    br = bp_r + dot(f1r_hi, cur, _MM)
    bi = bp_i + dot(f1i_hi, cur, _MM)
    return _fwd_stage2_pack(dot, br, bi, twr, twi, f2r, f2i, f2s, n2h)


def _ring_mac(ti, p: int, ring_re, ring_im, hre_s, him_s, n2h: int):
    """Causal partition MAC over the VMEM spectra ring. Slot of lag L's
    spectrum: (ti - 1 - L) mod p; slots never written yet hold zeros, so
    summing all p lags is causal automatically. The packed DC/Nyquist lane
    [0, 0] multiplies real*real independently — accumulated in (1, n1) rows
    (Mosaic cannot broadcast a (1,1) into both sublanes and lanes) and
    selected into the full accumulation at the end."""
    acc_re = jnp.zeros((n2h, ring_re.shape[-1]), jnp.float32)
    acc_im = jnp.zeros_like(acc_re)
    a0_re = jnp.zeros((1, ring_re.shape[-1]), jnp.float32)
    a0_im = jnp.zeros_like(a0_re)
    for lag in range(p):
        slot = jax.lax.rem(ti - 1 - lag + p * 8192, jnp.int32(p))
        rr = ring_re[pl.ds(slot, 1)][0]
        ri = ring_im[pl.ds(slot, 1)][0]
        hr = hre_s[lag]
        hi = him_s[lag]
        acc_re += rr * hr - ri * hi
        acc_im += rr * hi + ri * hr
        a0_re += rr[0:1, :] * hr[0:1, :]
        a0_im += ri[0:1, :] * hi[0:1, :]
    rows = jax.lax.broadcasted_iota(jnp.int32, acc_re.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, acc_re.shape, 1)
    lane0 = (rows == 0) & (cols == 0)
    return jnp.where(lane0, a0_re, acc_re), jnp.where(lane0, a0_im, acc_im)


def _ring_insert(ring_re, ring_im, ti, p: int, er, ei):
    wslot = jax.lax.rem(ti, jnp.int32(p))
    ring_re[pl.ds(wslot, 1)] = er[None]
    ring_im[pl.ds(wslot, 1)] = ei[None]


def _rfft_kernel(x_ref, *refs, n2h: int, mode: str, group: int):
    hbm = refs[:7]
    pr_ref, pi_ref = refs[7:9]
    f1r_s, f1i_s, twr_s, twi_s, f2r_s, f2i_s, f2s_s, sems = refs[9:]
    _load_tables_once(hbm, (f1r_s, f1i_s, twr_s, twi_s, f2r_s, f2i_s, f2s_s),
                      sems)
    dot = _Dot(mode)
    f1r = dot.lhs(f1r_s[...], 1)
    f1i = dot.lhs(f1i_s[...], 1)
    twr = twr_s[...]
    twi = twi_s[...]
    f2r = dot.lhs(f2r_s[...], 0)
    f2i = dot.lhs(f2i_s[...], 0)
    f2s = dot.lhs(f2s_s[...], 0)
    for g in range(group):
        a = dot.rhs(x_ref[g], 0)                   # (n1, n2) real
        br = dot(f1r, a, _MM)                      # stage 1: real input -> 2 matmuls
        bi = dot(f1i, a, _MM)
        pr_ref[g], pi_ref[g] = _fwd_stage2_pack(dot, br, bi, twr, twi,
                                                f2r, f2i, f2s, n2h)


def _rifft_kernel(pr_ref, pi_ref, *refs, mode: str, group: int):
    hbm = refs[:7]
    y_ref = refs[7]
    qr_s, qi_s, qs_s, ctr_s, cti_s, p1r_s, p1i_s, sems = refs[8:]
    _load_tables_once(hbm, (qr_s, qi_s, qs_s, ctr_s, cti_s, p1r_s, p1i_s), sems)
    dot = _Dot(mode)
    inv = _stack_inv(dot, qr_s, qi_s, qs_s, ctr_s, cti_s, p1r_s, p1i_s)
    for g in range(group):
        y_ref[g] = _tail_block(dot, pr_ref[g], pi_ref[g], *inv)


def _cfft_kernel(ar_ref, ai_ref, *refs, mode: str, group: int):
    hbm = refs[:6]
    er_ref, ei_ref = refs[6:8]
    f1r_s, f1i_s, f2r_s, f2i_s, twr_s, twi_s, sems = refs[8:]
    _load_tables_once(hbm, (f1r_s, f1i_s, f2r_s, f2i_s, twr_s, twi_s), sems)
    dot = _Dot(mode)
    # Stack the bf16x3 hi/lo table splits ONCE per kernel invocation — raw
    # operands would be re-split inside every dot of every unrolled group
    # iteration (scoped-VMEM temps are NOT reused across unrolled iterations,
    # so that also inflates the peak beyond what _pick_group models).
    f1r = dot.lhs(f1r_s[...], 1)
    f1i = dot.lhs(f1i_s[...], 1)
    f2r = dot.lhs(f2r_s[...], 0)
    f2i = dot.lhs(f2i_s[...], 0)
    twr = twr_s[...]
    twi = twi_s[...]
    for g in range(group):
        ar = dot.rhs(ar_ref[g], 0)
        ai = dot.rhs(ai_ref[g], 0)
        br = dot(f1r, ar, _MM) - dot(f1i, ai, _MM)
        bi = dot(f1r, ai, _MM) + dot(f1i, ar, _MM)
        cr = dot.rhs(br * twr - bi * twi, 1)
        ci = dot.rhs(br * twi + bi * twr, 1)
        er_ref[g] = dot(f2r, cr, _T2) - dot(f2i, ci, _T2)
        ei_ref[g] = dot(f2r, ci, _T2) + dot(f2i, cr, _T2)


# -----------------------------------------------------------------------------
# Entry points
# -----------------------------------------------------------------------------

def _hbm_specs(k: int):
    return [pl.BlockSpec(memory_space=pl.ANY)] * k


# Every grid dimension is declared "arbitrary" (sequential on one core): the
# persistent-scratch table load (_load_tables_once) writes on the first grid
# step and later steps read it, which a parallel/megacore-partitioned dimension
# would break. Mosaic's default is already arbitrary; this pins the invariant.
def _seq_grid(rank: int):
    return pltpu.CompilerParams(dimension_semantics=("arbitrary",) * rank)


def _pick_group(b: int, per_signal_io: int, temps: int, tables: int,
                highest: bool = False) -> int:
    """Largest group whose (double-buffered io + unrolled temps + tables)
    fits; 0 if not even a single signal does (caller must fall back).

    ``highest``: HIGHEST-precision dots allocate internal hi/lo operand
    splits (~2x the dot-operand bytes — see the module docstring); callers
    whose margins don't already absorb that (fft_split: vmem_probe round 2
    found 2^17 HIGHEST aborts the TPU compiler) pass True to budget it."""
    for g in (8, 4, 2, 1):
        if b % g == 0:
            est = tables + 2 * g * per_signal_io + g * temps
            if highest:
                est += tables + 2 * g * per_signal_io
            if est <= _VMEM_TARGET:
                return g
    return 0


def real_eligible(n: int) -> bool:
    return MIN_REAL_SIZE <= n <= MAX_REAL_SIZE and (n & (n - 1)) == 0


def stream_feasible(n: int) -> bool:
    """True when the streaming/tail kernels for real size n fit VMEM even
    ungrouped (callers must check before choosing the fused offline chain)."""
    if not real_eligible(n):
        return False
    n1, n2 = _split_real(n)
    rows = _pad8(n2 // 2 + 1)
    fwd = 4 * (2 * n1 * n1 + 2 * n1 * n2 + 3 * n2 * rows)
    inv = 4 * (3 * (n2 // 2) * n2 + 2 * n1 * n2 + 2 * n1 * n1)
    return max(fwd, inv) + 96 * (n // 2) <= vmem_budget(14)


def rfft_packed(x: jax.Array, interpret: bool | None = None,
                mode: str | None = None) -> Tuple[jax.Array, jax.Array]:
    """Real FFT -> packed N/2 bins (x2 scale, Nyquist in im[0]), fully fused."""
    n = x.shape[-1]
    if small_real_eligible(n) and x.dtype != jnp.float64:
        y = _rfft_small(x, _interpret_default() if interpret is None
                        else interpret, mode or _MODE)
        if y is not None:
            return y
    if not real_eligible(n) or x.dtype == jnp.float64:
        return matmul_fft.rfft_packed(x, core=fft_split)
    if interpret is None:
        interpret = _interpret_default()
    if n > MAX_SINGLE_REAL:
        m = mode or _MODE
        if m == "highest" and n >= (1 << 20):
            # HIGHEST-precision dots split both operands internally; at 2^20
            # the n1=2048 resident operands push that internal scratch past
            # VMEM (the TPU compiler aborts — measured round 2). The staged
            # matmul path keeps HIGHEST quality with XLA-managed temps.
            return matmul_fft.rfft_packed(x, core=fft_split)
        return _rfft_packed_split(x, interpret, m)
    n1, n2 = _split_real(n)
    n2h = n2 // 2
    rows = _pad8(n2h + 1)
    lead = x.shape[:-1]
    b = int(np.prod(lead)) if lead else 1
    tables = [jnp.asarray(t) for t in _fwd_tables(n1, n2)]
    table_bytes = sum(int(t.size) * 4 for t in tables)
    g = _pick_group(b, 8 * n, 8 * 4 * n1 * n2, table_bytes)
    if g == 0:
        return matmul_fft.rfft_packed(x, core=fft_split)
    a = x.reshape(b, n1, n2).astype(jnp.float32)

    in_spec = pl.BlockSpec((g, n1, n2), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((g, n2h, n1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    pr, pi = pl.pallas_call(
        partial(_rfft_kernel, n2h=n2h, mode=mode or _MODE, group=g),
        grid=(b // g,),
        compiler_params=_seq_grid(1),
        in_specs=[in_spec] + _hbm_specs(7),
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((b, n2h, n1), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM(t.shape, jnp.float32) for t in tables] +
                       [pltpu.SemaphoreType.DMA((7,))],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * (4 * n1 * n1 * n2 + 8 * n1 * n2 * rows),
            bytes_accessed=8 * b * n, transcendentals=0),
    )(a, *tables)
    # Preserve the input dtype (bf16/f16 in -> same out, matching the xla path).
    return (pr.reshape(*lead, n // 2).astype(x.dtype),
            pi.reshape(*lead, n // 2).astype(x.dtype))


def rifft_packed(re: jax.Array, im: jax.Array, interpret: bool | None = None,
                 mode: str | None = None) -> jax.Array:
    """Unscaled inverse of the packed layout: rifft(rfft(x)) == 2N x, fully fused."""
    nbins = re.shape[-1]
    n = nbins * 2
    if small_real_eligible(n) and re.dtype != jnp.float64:
        y = _rifft_small(re, im, _interpret_default() if interpret is None
                         else interpret, mode or _MODE)
        if y is not None:
            return y
    if not real_eligible(n) or re.dtype == jnp.float64:
        return matmul_fft.rifft_packed(re, im, core=fft_split)
    if interpret is None:
        interpret = _interpret_default()
    if n > MAX_SINGLE_REAL:
        m = mode or _MODE
        if m == "highest" and n >= (1 << 20):
            return matmul_fft.rifft_packed(re, im, core=fft_split)
        return _rifft_packed_split(re, im, interpret, m)
    n1, n2 = _split_real(n)
    n2h = n2 // 2
    lead = re.shape[:-1]
    b = int(np.prod(lead)) if lead else 1
    tables = [jnp.asarray(t) for t in _inv_tables(n1, n2)]
    table_bytes = sum(int(t.size) * 4 for t in tables)
    g = _pick_group(b, 8 * n, 8 * 4 * n1 * n2, table_bytes)
    if g == 0:
        return matmul_fft.rifft_packed(re, im, core=fft_split)
    pr = re.reshape(b, n2h, n1).astype(jnp.float32)
    pi = im.reshape(b, n2h, n1).astype(jnp.float32)

    in_spec = pl.BlockSpec((g, n2h, n1), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((g, n1, n2), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        partial(_rifft_kernel, mode=mode or _MODE, group=g),
        grid=(b // g,),
        compiler_params=_seq_grid(1),
        in_specs=[in_spec, in_spec] + _hbm_specs(7),
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, n1, n2), jnp.float32),
        scratch_shapes=[pltpu.VMEM(t.shape, jnp.float32) for t in tables] +
                       [pltpu.SemaphoreType.DMA((7,))],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * (8 * n2h * n2 * n1 + 4 * n1 * n1 * n2),
            bytes_accessed=8 * b * n, transcendentals=0),
    )(pr, pi, *tables)
    return y.reshape(*lead, n).astype(re.dtype)


# -----------------------------------------------------------------------------
# Split-pair kernels for N = 2^18..2^20: stage-1+twiddle, then stage-2+packing,
# with the k1 axis chunked over grid steps. Tables that stay whole inside a
# kernel are PRE-STACKED host-side for bf16x3 (the in-kernel concat would be
# re-executed every grid step and double the scratch); chunked tables and data
# blocks stack in-kernel as usual (small).
# -----------------------------------------------------------------------------

def _prep_operand(t, axis: int, side: str, mode: str) -> jax.Array:
    """Mode-ready dense operand: f32 passthrough, or the bf16x3 stacked layout
    ([h|h|l] for lhs, [h|l|h] for rhs) along the contraction axis.

    Delegates to matmul_fft's stacking helpers, whose hi/lo split goes through
    ``lax.reduce_precision`` (matmul_fft._bsplit_xla), NOT the in-kernel
    ``x - bf16(x).astype(f32)`` form: outside Mosaic, XLA's excess-precision
    simplification folds the upcast-after-downcast pair to identity, making
    lo == 0 and silently degrading the whole pipeline to single-pass bf16
    (~55 dB — measured on hardware, round 2)."""
    t = jnp.asarray(t, jnp.float32)
    if mode != "bf16x3":
        return t
    stack = matmul_fft._stack_lhs if side == "L" else matmul_fft._stack_rhs
    return stack(t, axis)


def _tag(dot: "_Dot", side: str, x):
    """Wrap a pre-stacked operand so _Dot skips the in-kernel stack."""
    return (side, x) if dot.split else x


def _split_real_pair(n: int) -> Tuple[int, int]:
    """Factorisation for the split-pair path. At 2^20 the square split's
    per-stage working sets sit at the scoped-VMEM edge (the remote compiler
    aborts); an asymmetric n1 = 4*n2 split shrinks the f2/q tables (~n2^2)
    and the stage-C resident block (n1*n2 is fixed = N) enough to compile."""
    if n >= (1 << 20):
        log2n = n.bit_length() - 1
        n1 = 1 << ((log2n + 2) // 2)
        return n1, n // n1
    return _split_real(n)


def _pick_k1_rows(n1: int, resident_bytes: int, per_row_bytes: int) -> int:
    """Largest k1 chunk (rows per grid step, dividing n1) whose resident
    working set + double-buffered per-row blocks fit the VMEM target. Chunks
    are multiples of 128 (Mosaic requires block minor dims divisible by 128
    unless equal to the array dim — the chunked axis is minor in some specs)."""
    for r in (n1, 512, 256, 128):
        if r <= n1 and n1 % r == 0:
            if resident_bytes + 2 * r * per_row_bytes <= _VMEM_TARGET:
                return r
    return 0


def _rfft_stage1_kernel(a_ref, f1r_ref, f1i_ref, twr_ref, twi_ref,
                        cr_ref, ci_ref, *, mode: str):
    """C[k1_blk, b] = (F1[k1_blk, :] @ a) * W_N^(b k1): one k1 chunk per step.
    ``a`` is resident (same block revisited across the k1 grid dim)."""
    dot = _Dot(mode)
    a = _tag(dot, "R", a_ref[0])
    f1r = dot.lhs(f1r_ref[...], 1)
    f1i = dot.lhs(f1i_ref[...], 1)
    br = dot(f1r, a, _MM)
    bi = dot(f1i, a, _MM)
    twr = twr_ref[...]
    twi = twi_ref[...]
    cr_ref[0] = br * twr - bi * twi
    ci_ref[0] = br * twi + bi * twr


def _rfft_stage2_kernel(cr_ref, ci_ref, *refs, n2h: int, mode: str):
    """E[k2, k1_blk] = sum_b C[k1_blk, b] F2[b, k2] with the packed layout
    emitted directly (Nyquist into im[0] on the k1 block containing column 0).
    4-matmul complex product (not Karatsuba): at 2^20 the third (sum) table
    would push the whole-table scratch past VMEM."""
    hbm = refs[:2]
    pr_ref, pi_ref = refs[2:4]
    f2r_s, f2i_s, sems = refs[4:]
    _load_tables_once(hbm, (f2r_s, f2i_s), sems, grid_rank=2)
    dot = _Dot(mode)
    f2r = _tag(dot, "L", f2r_s[...])
    f2i = _tag(dot, "L", f2i_s[...])
    cr = dot.rhs(cr_ref[0], 1)
    ci = dot.rhs(ci_ref[0], 1)
    er = dot(f2r, cr, _T2) - dot(f2i, ci, _T2)    # (rows_pad, R)
    ei = dot(f2r, ci, _T2) + dot(f2i, cr, _T2)
    nyq = er[n2h, 0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n2h, er.shape[1]), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n2h, er.shape[1]), 1)
    at00 = (rows == 0) & (cols == 0) & (pl.program_id(1) == 0)
    pr_ref[0] = er[:n2h, :]
    pi_ref[0] = jnp.where(at00, nyq, ei[:n2h, :])


def _rfft_packed_split(x: jax.Array, interpret: bool, mode: str
                       ) -> Tuple[jax.Array, jax.Array]:
    n = x.shape[-1]
    n1, n2 = _split_real_pair(n)
    n2h = n2 // 2
    rows = _pad8(n2h + 1)
    lead = x.shape[:-1]
    b = int(np.prod(lead)) if lead else 1
    f1r, f1i, twr, twi, f2r, f2i, f2s = _fwd_tables(n1, n2)

    # Stage 1: a resident per signal (pre-stacked for bf16x3), k1 chunked.
    a = _prep_operand(x.reshape(b, n1, n2), 1, "R", mode)
    a_rows = a.shape[1]
    resident = 2 * a_rows * n2 * (2 if mode == "bf16x3" else 4) // 2
    r1 = _pick_k1_rows(n1, resident, per_row_bytes=8 * (n1 + n2) + 8 * n2)
    if r1 == 0:
        raise ValueError(f"split stage-1 infeasible for N={n}")
    spec_a = pl.BlockSpec((1, a_rows, n2), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_f1 = pl.BlockSpec((r1, n1), lambda i, j: (j, 0),
                           memory_space=pltpu.VMEM)
    spec_tw = pl.BlockSpec((r1, n2), lambda i, j: (j, 0),
                           memory_space=pltpu.VMEM)
    spec_c = pl.BlockSpec((1, r1, n2), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    cr, ci = pl.pallas_call(
        partial(_rfft_stage1_kernel, mode=mode),
        grid=(b, n1 // r1),
        compiler_params=_seq_grid(2),
        in_specs=[spec_a, spec_f1, spec_f1, spec_tw, spec_tw],
        out_specs=[spec_c, spec_c],
        out_shape=[jax.ShapeDtypeStruct((b, n1, n2), jnp.float32)] * 2,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(flops=b * 4 * n1 * n1 * n2,
                                      bytes_accessed=12 * b * n,
                                      transcendentals=0),
    )(a, jnp.asarray(f1r), jnp.asarray(f1i), jnp.asarray(twr),
      jnp.asarray(twi))

    # Stage 2: f2 tables whole (scratch DMA, pre-stacked), k1 chunked.
    f2rj = _prep_operand(f2r, 0, "L", mode)
    f2ij = _prep_operand(f2i, 0, "L", mode)
    tbytes = sum(int(t.size) * t.dtype.itemsize for t in (f2rj, f2ij))
    r2 = _pick_k1_rows(n1, tbytes, per_row_bytes=8 * n2 + 8 * n2h + 16 * rows)
    if r2 == 0:
        raise ValueError(f"split stage-2 infeasible for N={n}")
    spec_cin = pl.BlockSpec((1, r2, n2), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    spec_p = pl.BlockSpec((1, n2h, r2), lambda i, j: (i, 0, j),
                          memory_space=pltpu.VMEM)
    pr, pi = pl.pallas_call(
        partial(_rfft_stage2_kernel, n2h=n2h, mode=mode),
        grid=(b, n1 // r2),
        compiler_params=_seq_grid(2),
        in_specs=[spec_cin, spec_cin] + _hbm_specs(2),
        out_specs=[spec_p, spec_p],
        out_shape=[jax.ShapeDtypeStruct((b, n2h, n1), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM(t.shape, t.dtype)
                        for t in (f2rj, f2ij)] +
                       [pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(flops=b * 8 * n1 * n2 * rows,
                                      bytes_accessed=12 * b * n,
                                      transcendentals=0),
    )(cr, ci, f2rj, f2ij)
    return (pr.reshape(*lead, n // 2).astype(x.dtype),
            pi.reshape(*lead, n // 2).astype(x.dtype))


def _rifft_stageA_kernel(pr_ref, pi_ref, ctr_ref, cti_ref, *refs, mode: str):
    """H'[k1_blk, r] = (sum_k2 X[k2, k1_blk] Q[k2, r]) * W_N^(-r k1): step A +
    conjugate twiddle for one k1 chunk (X column block). 4-matmul complex
    product (see _rfft_stage2_kernel)."""
    hbm = refs[:2]
    h2r_ref, h2i_ref = refs[2:4]
    qr_s, qi_s, sems = refs[4:]
    _load_tables_once(hbm, (qr_s, qi_s), sems, grid_rank=2)
    dot = _Dot(mode)
    qr = _tag(dot, "R", qr_s[...])
    qi = _tag(dot, "R", qi_s[...])
    pr = pr_ref[0]                                # (n2h, R)
    pi = pi_ref[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, pr.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, pr.shape, 1)
    at00 = (rows == 0) & (cols == 0) & (pl.program_id(1) == 0)
    pi0 = jnp.where(at00, 0.0, pi)
    prs = dot.lhs(pr, 0)
    pis = dot.lhs(pi0, 0)
    hr = dot(prs, qr, _T0) - dot(pis, qi, _T0)    # (R, n2)
    hi = dot(prs, qi, _T0) + dot(pis, qr, _T0)
    ctr = ctr_ref[...]
    cti = cti_ref[...]
    h2r_ref[0] = hr * ctr - hi * cti
    h2i_ref[0] = hr * cti + hi * ctr


def _rifft_stageC_kernel(h2r_ref, h2i_ref, p1r_ref, p1i_ref, s_ref, *,
                         mode: str):
    """S[s, r] += Re(P1[s, k1_blk] H'[k1_blk, r]): k1-chunked contraction
    accumulated into the resident output block (index constant over k1)."""
    dot = _Dot(mode)
    part = (dot(dot.lhs(p1r_ref[...], 1), dot.rhs(h2r_ref[0], 0), _MM) -
            dot(dot.lhs(p1i_ref[...], 1), dot.rhs(h2i_ref[0], 0), _MM))

    @pl.when(pl.program_id(1) == 0)
    def _():
        s_ref[0] = jnp.zeros_like(s_ref[0])

    s_ref[0] += part


def _rifft_packed_split(re: jax.Array, im: jax.Array, interpret: bool,
                        mode: str) -> jax.Array:
    nbins = re.shape[-1]
    n = nbins * 2
    n1, n2 = _split_real_pair(n)
    n2h = n2 // 2
    lead = re.shape[:-1]
    b = int(np.prod(lead)) if lead else 1
    qr, qi, qs, ctr, cti, p1r, p1i = _inv_tables(n1, n2)

    pr = re.reshape(b, n2h, n1).astype(jnp.float32)
    pi = im.reshape(b, n2h, n1).astype(jnp.float32)

    # Stage A: q tables whole (pre-stacked rhs), X column-chunked over k1.
    qrj = _prep_operand(qr, 0, "R", mode)
    qij = _prep_operand(qi, 0, "R", mode)
    tbytes = sum(int(t.size) * t.dtype.itemsize for t in (qrj, qij))
    rA = _pick_k1_rows(n1, tbytes, per_row_bytes=8 * n2h + 24 * n2)
    if rA == 0:
        raise ValueError(f"split stage-A infeasible for N={n}")
    spec_x = pl.BlockSpec((1, n2h, rA), lambda i, j: (i, 0, j),
                          memory_space=pltpu.VMEM)
    spec_ct = pl.BlockSpec((rA, n2), lambda i, j: (j, 0),
                           memory_space=pltpu.VMEM)
    spec_h = pl.BlockSpec((1, rA, n2), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    h2r, h2i = pl.pallas_call(
        partial(_rifft_stageA_kernel, mode=mode),
        grid=(b, n1 // rA),
        compiler_params=_seq_grid(2),
        in_specs=[spec_x, spec_x, spec_ct, spec_ct] + _hbm_specs(2),
        out_specs=[spec_h, spec_h],
        out_shape=[jax.ShapeDtypeStruct((b, n1, n2), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM(t.shape, t.dtype)
                        for t in (qrj, qij)] +
                       [pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(flops=b * 8 * n2h * n2 * n1,
                                      bytes_accessed=12 * b * n,
                                      transcendentals=0),
    )(pr, pi, jnp.asarray(ctr), jnp.asarray(cti), qrj, qij)

    # Stage C: k1-chunked accumulation into a resident (n1, n2) block.
    # Resident = the output block + the per-step partial-product temp (same
    # size); per-row = one buffer of the h2 (8*n2) and p1 (8*n1) blocks — the
    # chooser doubles it for pipelining.
    rC = _pick_k1_rows(n1, 8 * n1 * n2, per_row_bytes=8 * (n1 + n2))
    if rC == 0:
        raise ValueError(f"split stage-C infeasible for N={n}")
    spec_hin = pl.BlockSpec((1, rC, n2), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    spec_p1 = pl.BlockSpec((n1, rC), lambda i, j: (0, j),
                           memory_space=pltpu.VMEM)
    spec_s = pl.BlockSpec((1, n1, n2), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    sr = pl.pallas_call(
        partial(_rifft_stageC_kernel, mode=mode),
        grid=(b, n1 // rC),
        compiler_params=_seq_grid(2),
        in_specs=[spec_hin, spec_hin, spec_p1, spec_p1],
        out_specs=spec_s,
        out_shape=jax.ShapeDtypeStruct((b, n1, n2), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(flops=b * 4 * n1 * n1 * n2,
                                      bytes_accessed=16 * b * n,
                                      transcendentals=0),
    )(h2r, h2i, jnp.asarray(p1r), jnp.asarray(p1i))

    # Combine outside the kernel (one fused XLA elementwise pass):
    # y = 2 Re(S) - X[0] + (-1)^r Nyq  with n = r + n2*s, n2 even.
    x0 = pr[:, 0, 0][:, None, None]
    nyq = pi[:, 0, 0][:, None, None]
    parity = jnp.where((jnp.arange(n2) % 2) == 0, 1.0, -1.0).astype(sr.dtype)
    y = 2.0 * sr - x0 + nyq * parity[None, None, :]
    return y.reshape(*lead, n).astype(re.dtype)


def eligible(n: int) -> bool:
    return MIN_COMPLEX_SIZE <= n <= MAX_COMPLEX_SIZE and (n & (n - 1)) == 0


def fft_split(re: jax.Array, im: jax.Array, inverse: bool = False,
              interpret: bool | None = None,
              mode: str | None = None) -> Tuple[jax.Array, jax.Array]:
    """Unscaled complex (i)DFT along the last axis, split layout, fused in VMEM.

    Same semantics as matmul_fft.fft_split (forward = hisstools_fft; inverse =
    unscaled N x IDFT = hisstools_ifft). Falls back to the staged matmul backend
    for sizes outside [MIN_COMPLEX_SIZE, MAX_COMPLEX_SIZE] and for f64 (CPU
    parity-testing) inputs.
    """
    n = re.shape[-1]
    if not eligible(n) or re.dtype == jnp.float64:
        return matmul_fft.fft_split(re, im, inverse=inverse)
    if interpret is None:
        interpret = _interpret_default()

    n1, n2 = matmul_fft._split_factors(n)
    lead = re.shape[:-1]
    b = int(np.prod(lead)) if lead else 1
    f1r, f1i = matmul_fft._dft_matrix(n1, "float32", inverse)
    f2r, f2i = matmul_fft._dft_matrix(n2, "float32", inverse)
    twr, twi = matmul_fft._twiddle(n1, n2, "float32", inverse)
    tables = [jnp.asarray(t) for t in (f1r, f1i, f2r, f2i, twr, twi)]
    table_bytes = sum(int(t.size) * 4 for t in tables)
    g = _pick_group(b, 16 * n, 8 * 4 * n1 * n2, table_bytes,
                    highest=(mode or _MODE) == "highest")
    if g == 0:
        return matmul_fft.fft_split(re, im, inverse=inverse)
    ar = re.reshape(b, n1, n2).astype(jnp.float32)
    ai = im.reshape(b, n1, n2).astype(jnp.float32)

    sig_spec = pl.BlockSpec((g, n1, n2), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((g, n2, n1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    er, ei = pl.pallas_call(
        partial(_cfft_kernel, mode=mode or _MODE, group=g),
        grid=(b // g,),
        compiler_params=_seq_grid(1),
        in_specs=[sig_spec, sig_spec] + _hbm_specs(6),
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((b, n2, n1), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM(t.shape, jnp.float32) for t in tables] +
                       [pltpu.SemaphoreType.DMA((6,))],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * 8 * (n1 * n1 * n2 + n2 * n2 * n1),
            bytes_accessed=16 * b * n, transcendentals=0),
    )(ar, ai, *tables)
    return (er.reshape(*lead, n).astype(re.dtype),
            ei.reshape(*lead, n).astype(re.dtype))


# -----------------------------------------------------------------------------
# Batched small-N dense kernels (N = 128..2048).
#
# Below MIN_REAL_SIZE the four-step split degenerates to 16..32-wide factor
# matmuls that idle >= 75% of the MXU's 128 lanes, and the XLA dense path
# (matmul_fft.rfft_packed over zipped halves) spends more time in the
# real<->complex conversion passes and un-fused dots than in the DFT itself
# (BASELINE config 1 measured ~17% of physical MXU). At these sizes the DENSE
# transform is near FLOP-optimal given the 128-lane floor, and the packed
# layout can be baked INTO the DFT tables so each direction is exactly TWO
# real matmuls with the batch as the row dimension:
#
#   fwd:  pr = x @ Cr,  pi = x @ Ci'    Cr[t,k]     = 2 cos(2 pi t k / N)
#                                       Ci'[t,k>=1] = -2 sin(2 pi t k / N)
#                                       Ci'[t,0]    = 2 (-1)^t  (Nyquist lane)
#   inv:  y = re @ Ar + im @ Ai         Ar[0,t] = 1,       Ar[k,t] = 2 cos
#                                       Ai[0,t] = (-1)^t,  Ai[k,t] = -2 sin
#
# (expand y[t] = 2N x[t] over the packed half-spectrum: the DC/Nyquist
# rows/columns ARE the packing special cases, so no fixup pass exists at
# all). Contraction >= 128 and batch rows put every dot in good MXU shape;
# tables are pre-stacked host-side for bf16x3 and DMA'd to scratch once per
# column chunk (N = 2048's stacked tables exceed VMEM whole, so its output
# columns chunk across the first grid dim). Serves the reference's
# matched-size batched shape (- Test/FFT_Tester/FFT_Tester/main.cpp:143-199).
# -----------------------------------------------------------------------------

SMALL_MIN_REAL = 128


@lru_cache(maxsize=32)
def _small_fwd_tables(n: int):
    t = np.arange(n, dtype=np.float64)[:, None]
    k = np.arange(n // 2, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * t * k / n
    cr = 2.0 * np.cos(ang)
    ci = -2.0 * np.sin(ang)
    ci[:, 0] = np.where((np.arange(n) % 2) == 0, 2.0, -2.0)
    return cr.astype(np.float32), ci.astype(np.float32)


@lru_cache(maxsize=32)
def _small_inv_tables(n: int):
    k = np.arange(n // 2, dtype=np.float64)[:, None]
    t = np.arange(n, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * t / n
    ar = 2.0 * np.cos(ang)
    ai = -2.0 * np.sin(ang)
    ar[0, :] = 1.0
    ai[0, :] = np.where((np.arange(n) % 2) == 0, 1.0, -1.0)
    return ar.astype(np.float32), ai.astype(np.float32)


@lru_cache(maxsize=8)
def _small_fwd_tables_odd(n: int):
    """Odd-bin forward tables for the folded N = 2048 path (h = n/2 rows,
    h/2 columns): the dense DFT of v = x[:h] - x[h:] with the odd-k twiddle
    absorbed — X[2m+1] = sum_t v[t] e^(-2 pi i t (2m+1) / n). No DC/Nyquist
    specials: both packed specials are even-class bins."""
    h = n // 2
    t = np.arange(h, dtype=np.float64)[:, None]
    m = np.arange(h // 2, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * t * (2.0 * m + 1.0) / n
    return ((2.0 * np.cos(ang)).astype(np.float32),
            (-2.0 * np.sin(ang)).astype(np.float32))


@lru_cache(maxsize=8)
def _small_inv_tables_odd(n: int):
    """Odd-bin inverse tables (h/2 rows, h = n/2 columns): the odd-k half of
    the unscaled packed inverse, anti-periodic over the output fold
    (y[t + h] flips sign — applied in _rifft_small_folded's combine)."""
    h = n // 2
    m = np.arange(h // 2, dtype=np.float64)[:, None]
    t = np.arange(h, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * (2.0 * m + 1.0) * t / n
    return ((2.0 * np.cos(ang)).astype(np.float32),
            (-2.0 * np.sin(ang)).astype(np.float32))


def _small_tables_dma(t1_hbm, t2_hbm, t1_s, t2_s, sems, ct: int):
    """Both tables HBM -> scratch once, on the first grid step of the batch
    dim. _small_plan only emits whole-table layouts (ct == all columns — the
    chunked variant measured slower, ROADMAP dead end 6), so this is a whole-
    ref copy: a column-sliced `.at[:, pl.ds(...)]` DMA would also violate
    Mosaic's 128-lane slice tiling at N <= 256 (cols = 64: caught on hardware,
    round 3 — interpret mode does not check it)."""
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        d1 = pltpu.make_async_copy(t1_hbm, t1_s, sems.at[0])
        d2 = pltpu.make_async_copy(t2_hbm, t2_s, sems.at[1])
        d1.start()
        d2.start()
        d1.wait()
        d2.wait()


def _small_fwd_kernel(x_ref, *refs, ct: int, mode: str, fold: str = ""):
    t1_hbm, t2_hbm, pr_ref, pi_ref, t1_s, t2_s, sems = refs
    _small_tables_dma(t1_hbm, t2_hbm, t1_s, t2_s, sems, ct)
    dot = _Dot(mode)
    x = x_ref[...]
    if fold:
        # Folded-input variant (N = 2048): the block holds the FULL frame and
        # the kernel folds it to u = x[:h] + x[h:] (even bins) or
        # v = x[:h] - x[h:] (odd bins) before the half-size contraction.
        # Static half-width lane slices (1024 is a 128-multiple).
        h = x.shape[-1] // 2
        x = x[:, :h] + x[:, h:] if fold == "sum" else x[:, :h] - x[:, h:]
    a = dot.lhs(x, 1)
    pr_ref[...] = dot(a, _tag(dot, "R", t1_s[...]), _MM)
    pi_ref[...] = dot(a, _tag(dot, "R", t2_s[...]), _MM)


def _small_inv_kernel(re_ref, im_ref, *refs, ct: int, mode: str):
    t1_hbm, t2_hbm, y_ref, t1_s, t2_s, sems = refs
    _small_tables_dma(t1_hbm, t2_hbm, t1_s, t2_s, sems, ct)
    dot = _Dot(mode)
    y_ref[...] = (dot(dot.lhs(re_ref[...], 1), _tag(dot, "R", t1_s[...]), _MM)
                  + dot(dot.lhs(im_ref[...], 1), _tag(dot, "R", t2_s[...]), _MM))


_SMALL_FFT_ENABLED = os.environ.get("HISSTOOLS_SMALL_FFT", "1") != "0"


def small_real_eligible(n: int) -> bool:
    return (_SMALL_FFT_ENABLED and SMALL_MIN_REAL <= n < MIN_REAL_SIZE
            and (n & (n - 1)) == 0)


def _small_plan(k_dim: int, c_dim: int, n_in: int, n_out: int, mode: str,
                in_w: int = 0):
    """(tile_b, ct) for the dense small kernels, or None if infeasible.

    ``k_dim``/``c_dim``: contraction / output-column extents. ``n_in``/
    ``n_out``: distinct (tile_b, in_w) inputs and (tile_b, ct) outputs;
    ``in_w`` is the input block width (defaults to the contraction — the
    folded N = 2048 kernels stage a 2x-wide block and fold in-kernel).
    Budget: scratch tables + double-buffered io blocks + the in-kernel
    stacked-lhs temps (bf16x3) or the HIGHEST dots' internal operand splits
    (~2x operand bytes — see _pick_group)."""
    item = 2 if mode == "bf16x3" else 4
    sk = 3 * k_dim if mode == "bf16x3" else k_dim
    in_w = in_w or k_dim
    # Only whole-table plans: column-chunked variants (N = 2048's tables
    # exceed VMEM) measured 1.11e6 roundtrips/s on v5e — SLOWER than the
    # staged matmul fallback. N = 2048 instead runs the FOLDED form (two
    # half-size table pairs in two kernels — see _rfft_small_folded).
    cts = [c_dim]
    for ct in cts:
        tables = 2 * sk * ct * item
        for tb in (512, 256, 128, 64, 32, 16, 8):
            est = tables + n_in * 2 * tb * in_w * 4 + n_out * 2 * tb * ct * 4
            if mode == "bf16x3":
                est += n_in * tb * 3 * k_dim * 2
            else:
                est += 2 * (n_in * tb * k_dim + 2 * sk * ct) * 4
            if est <= _VMEM_TARGET:
                return tb, ct
    return None


def _small_pad_rows(a: jax.Array, tb: int) -> Tuple[jax.Array, int]:
    b = a.shape[0]
    bp = -(-b // tb) * tb
    if bp != b:
        a = jnp.pad(a, ((0, bp - b), (0, 0)))
    return a, bp


def _small_fwd_call(a: jax.Array, t1np, t2np, interpret: bool, mode: str,
                    fold: str = ""):
    """Two-matmul forward kernel on a 2-D f32 batch: (b, W) -> (pr, pi)
    (b, C) with C = t1np.shape[1]. ``fold`` stages the full frame (W = 2K)
    and folds to u/v in-kernel (the N = 2048 path). None if no VMEM plan."""
    b, w = a.shape
    k_dim, c = t1np.shape
    plan = _small_plan(k_dim, c, 1, 2, mode, in_w=w)
    if plan is None:
        return None
    tb, ct = plan
    a, bp = _small_pad_rows(a, tb)
    t1 = _prep_operand(t1np, 0, "R", mode)
    t2 = _prep_operand(t2np, 0, "R", mode)
    spec_x = pl.BlockSpec((tb, w), lambda j, i: (i, 0), memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((tb, ct), lambda j, i: (i, j),
                          memory_space=pltpu.VMEM)
    pr, pi = pl.pallas_call(
        partial(_small_fwd_kernel, ct=ct, mode=mode, fold=fold),
        grid=(c // ct, bp // tb),
        compiler_params=_seq_grid(2),
        in_specs=[spec_x] + _hbm_specs(2),
        out_specs=[spec_o, spec_o],
        out_shape=[jax.ShapeDtypeStruct((bp, c), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((t1.shape[0], ct), t1.dtype),
                        pltpu.VMEM((t2.shape[0], ct), t2.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(flops=bp * 4 * k_dim * c,
                                      bytes_accessed=4 * bp * (w + 2 * c),
                                      transcendentals=0),
    )(a, t1, t2)
    return pr[:b], pi[:b]


def _small_inv_call(re2: jax.Array, im2: jax.Array, t1np, t2np,
                    interpret: bool, mode: str):
    """Two-matmul inverse kernel on 2-D f32 spectra halves: (b, K) x2 ->
    (b, C) with C = t1np.shape[1]. None if no VMEM plan."""
    b, k_dim = re2.shape
    c = t1np.shape[1]
    plan = _small_plan(k_dim, c, 2, 1, mode)
    if plan is None:
        return None
    tb, ct = plan
    ar, bp = _small_pad_rows(re2, tb)
    ai, _ = _small_pad_rows(im2, tb)
    t1 = _prep_operand(t1np, 0, "R", mode)
    t2 = _prep_operand(t2np, 0, "R", mode)
    spec_p = pl.BlockSpec((tb, k_dim), lambda j, i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_y = pl.BlockSpec((tb, ct), lambda j, i: (i, j),
                          memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        partial(_small_inv_kernel, ct=ct, mode=mode),
        grid=(c // ct, bp // tb),
        compiler_params=_seq_grid(2),
        in_specs=[spec_p, spec_p] + _hbm_specs(2),
        out_specs=spec_y,
        out_shape=jax.ShapeDtypeStruct((bp, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((t1.shape[0], ct), t1.dtype),
                        pltpu.VMEM((t2.shape[0], ct), t2.dtype),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(flops=bp * 4 * k_dim * c,
                                      bytes_accessed=4 * bp * (2 * k_dim + c),
                                      transcendentals=0),
    )(ar, ai, t1, t2)
    return y[:b]


def _rfft_small_folded(a: jax.Array, interpret: bool, mode: str):
    """N = 2048 forward via the even/odd input fold: the whole-table dense
    form's stacked tables exceed VMEM (ROADMAP dead end 6), but folding
    x -> u = x[:h] + x[h:], v = x[:h] - x[h:] halves both tables AND FLOPs:
    even bins are EXACTLY the packed h-point transform of u (DC/Nyquist
    packing included — both specials are even-class), odd bins are v against
    twiddle-absorbed odd tables. One XLA column-interleave pass reassembles
    the packed order."""
    h = a.shape[-1] // 2
    even = _small_fwd_call(a, *_small_fwd_tables(h), interpret, mode,
                           fold="sum")
    odd = _small_fwd_call(a, *_small_fwd_tables_odd(2 * h), interpret, mode,
                          fold="diff")
    if even is None or odd is None:
        return None
    b = a.shape[0]
    pr = jnp.stack([even[0], odd[0]], axis=-1).reshape(b, h)
    pi = jnp.stack([even[1], odd[1]], axis=-1).reshape(b, h)
    return pr, pi


def _rifft_small_folded(re2: jax.Array, im2: jax.Array, interpret: bool,
                        mode: str):
    """N = 2048 inverse, fold transposed: deinterleave the packed spectrum
    by bin parity (XLA), run the h-point packed inverse on the even half and
    the odd-table inverse on the odd half, combine y = [a + b | a - b]."""
    b, c = re2.shape
    q = c // 2
    re3 = re2.reshape(b, q, 2)
    im3 = im2.reshape(b, q, 2)
    a_part = _small_inv_call(re3[..., 0], im3[..., 0], *_small_inv_tables(c),
                             interpret, mode)
    b_part = _small_inv_call(re3[..., 1], im3[..., 1],
                             *_small_inv_tables_odd(2 * c), interpret, mode)
    if a_part is None or b_part is None:
        return None
    return jnp.concatenate([a_part + b_part, a_part - b_part], axis=-1)


def _rfft_small(x: jax.Array, interpret: bool, mode: str):
    n = x.shape[-1]
    c = n // 2
    lead = x.shape[:-1]
    b = int(np.prod(lead)) if lead else 1
    a = x.reshape(b, n).astype(jnp.float32)
    if n == 2048:
        out = _rfft_small_folded(a, interpret, mode)
    else:
        out = _small_fwd_call(a, *_small_fwd_tables(n), interpret, mode)
    if out is None:
        return None
    return (out[0].reshape(*lead, c).astype(x.dtype),
            out[1].reshape(*lead, c).astype(x.dtype))


# -- Windowed variants for fused STFT (ops/stft.py) ---------------------------
# An analysis window is a diagonal left factor of the frame: (x*w) @ C ==
# x @ (diag(w) C) — so the window (and on the inverse side the synthesis
# window AND the 0.5/N scale) folds into the DFT tables for free, removing a
# whole HBM pass over the frames. Built in f64 like the plain tables.
# Reference composition: WindowFunctions.hpp windows applied around
# hisstools_rfft/rifft, as Window_Tester + SpectralProcessor do.

@lru_cache(maxsize=16)
def _small_fwd_tables_windowed(n: int, wbytes: bytes):
    w = np.frombuffer(wbytes, np.float64)[:, None]
    t = np.arange(n, dtype=np.float64)[:, None]
    k = np.arange(n // 2, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * t * k / n
    cr = 2.0 * np.cos(ang) * w
    ci = -2.0 * np.sin(ang) * w
    ci[:, 0] = np.where((np.arange(n) % 2) == 0, 2.0, -2.0) * w[:, 0]
    return cr.astype(np.float32), ci.astype(np.float32)


@lru_cache(maxsize=16)
def _small_inv_tables_windowed(n: int, wbytes: bytes, scale: float):
    w = np.frombuffer(wbytes, np.float64)[None, :] * scale
    k = np.arange(n // 2, dtype=np.float64)[:, None]
    t = np.arange(n, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * t / n
    ar = 2.0 * np.cos(ang)
    ai = -2.0 * np.sin(ang)
    ar[0, :] = 1.0
    ai[0, :] = np.where((np.arange(n) % 2) == 0, 1.0, -1.0)
    return (ar * w).astype(np.float32), (ai * w).astype(np.float32)


def rfft_small_windowed(x: jax.Array, window64: np.ndarray,
                        interpret: bool | None = None,
                        mode: str | None = None):
    """Packed rFFT of pre-framed rows with the analysis window folded into
    the tables: rfft(x * window). None when the dense small path does not
    serve this size (caller applies the window and uses the standard path).
    N = 2048 is excluded: its folded kernels fold the INPUT before the
    contraction, which does not commute with a per-sample window."""
    n = x.shape[-1]
    if not small_real_eligible(n) or n == 2048:
        return None
    if interpret is None:
        interpret = _interpret_default()
    mode = mode or _MODE
    lead = x.shape[:-1]
    b = int(np.prod(lead)) if lead else 1
    a = x.reshape(b, n).astype(jnp.float32)
    tabs = _small_fwd_tables_windowed(
        n, np.ascontiguousarray(window64[:n], np.float64).tobytes())
    out = _small_fwd_call(a, *tabs, interpret, mode)
    if out is None:
        return None
    c = n // 2
    return (out[0].reshape(*lead, c).astype(x.dtype),
            out[1].reshape(*lead, c).astype(x.dtype))


def rifft_small_windowed(re: jax.Array, im: jax.Array, window64: np.ndarray,
                         scale: float, interpret: bool | None = None,
                         mode: str | None = None):
    """scale * rifft(spec) * window in one kernel (synthesis side of the
    fused STFT). None when the dense small path does not serve the size."""
    c = re.shape[-1]
    n = c * 2
    if not small_real_eligible(n) or n == 2048:
        return None
    if interpret is None:
        interpret = _interpret_default()
    mode = mode or _MODE
    lead = re.shape[:-1]
    b = int(np.prod(lead)) if lead else 1
    ar = re.reshape(b, c).astype(jnp.float32)
    ai = im.reshape(b, c).astype(jnp.float32)
    tabs = _small_inv_tables_windowed(
        n, np.ascontiguousarray(window64[:n], np.float64).tobytes(),
        float(scale))
    y = _small_inv_call(ar, ai, *tabs, interpret, mode)
    if y is None:
        return None
    return y.reshape(*lead, n).astype(re.dtype)


def _rifft_small(re: jax.Array, im: jax.Array, interpret: bool, mode: str):
    c = re.shape[-1]
    n = c * 2
    lead = re.shape[:-1]
    b = int(np.prod(lead)) if lead else 1
    ar = re.reshape(b, c).astype(jnp.float32)
    ai = im.reshape(b, c).astype(jnp.float32)
    if n == 2048:
        y = _rifft_small_folded(ar, ai, interpret, mode)
    else:
        y = _small_inv_call(ar, ai, *_small_inv_tables(n), interpret, mode)
    if y is None:
        return None
    return y.reshape(*lead, n).astype(re.dtype)


# -----------------------------------------------------------------------------
# Convolution-fused variants: streaming forward + overlap-save tail inverse.
#
# These serve the partitioned-convolution hot path (models/partitioned.py).
# The reference engine stages each hop's [previous block | current block] frame
# into a scratch buffer before the rFFT (PartitionedConvolve.cpp:304-307) and
# discards the first half of each iFFT output (overlap-save, :352-377). Here
# both become kernel index arithmetic: the forward kernel reads the two
# overlapping hop blocks directly from the signal (stage-1 matmul split into
# two half-width matmuls, same FLOPs), and the inverse kernel only computes the
# kept second half-block (rows s >= n1/2 of stage C - HALF the stage-C FLOPs)
# with the 1/(4N) overlap-save scale folded in. No frames buffer, no discard
# slice, no separate scale pass exist in HBM at all.
# -----------------------------------------------------------------------------

def _rfft_stream_kernel(prevblk_ref, cur_ref, *refs, n2h: int, mode: str,
                        group: int):
    hbm = refs[:7]
    pr_ref, pi_ref = refs[7:9]
    f1r_s, f1i_s, twr_s, twi_s, f2r_s, f2i_s, f2s_s, sems = refs[9:]
    _load_tables_once(hbm, (f1r_s, f1i_s, twr_s, twi_s, f2r_s, f2i_s, f2s_s),
                      sems, grid_rank=2)
    dot = _Dot(mode)
    nh = cur_ref.shape[-2]
    f1r_lo = dot.lhs(f1r_s[...][:, :nh], 1)
    f1r_hi = dot.lhs(f1r_s[...][:, nh:], 1)
    f1i_lo = dot.lhs(f1i_s[...][:, :nh], 1)
    f1i_hi = dot.lhs(f1i_s[...][:, nh:], 1)
    twr = twr_s[...]
    twi = twi_s[...]
    f2r = dot.lhs(f2r_s[...], 0)
    f2i = dot.lhs(f2i_s[...], 0)
    f2s = dot.lhs(f2s_s[...], 0)
    # Zero the previous-hop contribution only on the very first hop (t == 0):
    # the previous group block is clamped there, so its last hop is garbage.
    first = (pl.program_id(1) == 0)
    prev_cached = None
    for g in range(group):
        cur = dot.rhs(cur_ref[0, g], 0)            # (n1/2, n2): second half-frame
        if g == 0:
            prev = dot.rhs(prevblk_ref[0, group - 1], 0)
            pm = jnp.where(first, 0.0, 1.0).astype(jnp.float32)
        else:
            prev = prev_cached
            pm = None
        pr_ref[0, g], pi_ref[0, g] = _fwd_frame(
            dot, prev, cur, f1r_lo, f1r_hi, f1i_lo, f1i_hi,
            twr, twi, f2r, f2i, f2s, n2h, pm=pm)
        prev_cached = cur


def _pick_hop_group(t: int, hop: int, table_bytes: int) -> int:
    """Hops per grid step: double-buffered io ~32*G*hop bytes + cumulative
    unrolled temps ~64*G*hop (Mosaic does not reuse across iterations). The
    bound is tighter to the 16M scoped limit than _VMEM_TARGET — g=4 at
    hop=32768 (13.9M estimated) compiles and is ~35% faster than g=2."""
    for g in (8, 4, 2, 1):
        if t % g == 0 and table_bytes + 96 * g * hop <= vmem_budget(14):
            return g
    return 0


def rfft_packed_stream(x2d: jax.Array, interpret: bool | None = None,
                       mode: str | None = None) -> Tuple[jax.Array, jax.Array]:
    """Overlap-save forward: hop-blocked signal -> per-hop packed spectra.

    ``x2d``: (..., T, H) hop blocks of the signal itself (no history block).
    Returns packed Split planes of shape (..., T, N/2) where N = 2H; spectrum t
    equals rfft([x2d[t-1], x2d[t]]) with x2d[-1] = zeros — the reference's
    staged [previous | current] frame (PartitionedConvolve.cpp:304-307) without
    ever materialising it. Several hops are processed per grid step (the
    previous group's block supplies the overlap for the first frame).
    """
    t, hop = x2d.shape[-2], x2d.shape[-1]
    n = 2 * hop
    if not real_eligible(n) or x2d.dtype == jnp.float64:
        raise ValueError(f"stream rFFT needs an eligible non-f64 size, got "
                         f"N={n} dtype={x2d.dtype}")
    if interpret is None:
        interpret = _interpret_default()
    n1, n2 = _split_real(n)
    n1h = n1 // 2
    n2h = n2 // 2
    rows = _pad8(n2h + 1)
    lead = x2d.shape[:-2]
    b = int(np.prod(lead)) if lead else 1
    tables = [jnp.asarray(tb) for tb in _fwd_tables(n1, n2)]
    table_bytes = sum(int(tb.size) * 4 for tb in tables)
    g = _pick_hop_group(t, hop, table_bytes)
    if g == 0:
        raise ValueError(f"stream kernel infeasible for N={n}; check "
                         "stream_feasible() before calling")
    x4 = x2d.reshape(b, t, n1h, n2).astype(jnp.float32)

    prev_spec = pl.BlockSpec((1, g, n1h, n2),
                             lambda c, i: (c, jnp.maximum(i - 1, 0), 0, 0),
                             memory_space=pltpu.VMEM)
    cur_spec = pl.BlockSpec((1, g, n1h, n2), lambda c, i: (c, i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, g, n2h, n1), lambda c, i: (c, i, 0, 0),
                            memory_space=pltpu.VMEM)
    pr, pi = pl.pallas_call(
        partial(_rfft_stream_kernel, n2h=n2h, mode=mode or _MODE, group=g),
        grid=(b, t // g),
        compiler_params=_seq_grid(2),
        in_specs=[prev_spec, cur_spec] + _hbm_specs(7),
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((b, t, n2h, n1), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM(tb.shape, jnp.float32) for tb in tables] +
                       [pltpu.SemaphoreType.DMA((7,))],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * t * (4 * n1 * n1 * n2 + 8 * n1 * n2 * rows),
            bytes_accessed=b * t * 12 * hop, transcendentals=0),
    )(x4, x4, *tables)
    kk = n // 2
    return (pr.reshape(*lead, t, kk), pi.reshape(*lead, t, kk))


def _rifft_tail_kernel(pr_ref, pi_ref, *refs, scale: float, mode: str,
                       group: int):
    hbm = refs[:7]
    y_ref = refs[7]
    qr_s, qi_s, qs_s, ctr_s, cti_s, p1r_s, p1i_s, sems = refs[8:]
    _load_tables_once(hbm, (qr_s, qi_s, qs_s, ctr_s, cti_s, p1r_s, p1i_s),
                      sems, grid_rank=2)
    dot = _Dot(mode)
    inv = _stack_inv(dot, qr_s, qi_s, qs_s, ctr_s, cti_s, p1r_s, p1i_s,
                     tail_from=y_ref.shape[-2])
    for g in range(group):
        y_ref[0, g] = _tail_block(dot, pr_ref[0, g], pi_ref[0, g], *inv,
                                  scale=scale)


def rifft_packed_tail(re: jax.Array, im: jax.Array, scale: float = 1.0,
                      interpret: bool | None = None,
                      mode: str | None = None) -> jax.Array:
    """Overlap-save inverse: packed per-hop spectra -> kept second half-blocks.

    ``re``/``im``: (..., T, N/2). Returns (..., T, H) = scale * rifft(X_t)[H:]
    for each hop — the discarded first half is never computed (rows s < n1/2 of
    stage C are skipped entirely), and the scale is folded into the kernel.
    """
    t, nbins = re.shape[-2], re.shape[-1]
    n = nbins * 2
    hop = n // 2
    if not real_eligible(n) or re.dtype == jnp.float64:
        raise ValueError(f"tail riFFT needs an eligible non-f64 size, got "
                         f"N={n} dtype={re.dtype}")
    if interpret is None:
        interpret = _interpret_default()
    n1, n2 = _split_real(n)
    n1h = n1 // 2
    n2h = n2 // 2
    lead = re.shape[:-2]
    b = int(np.prod(lead)) if lead else 1
    tables = [jnp.asarray(tb) for tb in _inv_tables(n1, n2)]
    table_bytes = sum(int(tb.size) * 4 for tb in tables)
    g = _pick_hop_group(t, hop, table_bytes)
    if g == 0:
        raise ValueError(f"tail kernel infeasible for N={n}; check "
                         "stream_feasible() before calling")
    pr = re.reshape(b, t, n2h, n1).astype(jnp.float32)
    pi = im.reshape(b, t, n2h, n1).astype(jnp.float32)

    in_spec = pl.BlockSpec((1, g, n2h, n1), lambda c, i: (c, i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, g, n1h, n2), lambda c, i: (c, i, 0, 0),
                            memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        partial(_rifft_tail_kernel, scale=float(scale), mode=mode or _MODE,
                group=g),
        grid=(b, t // g),
        compiler_params=_seq_grid(2),
        in_specs=[in_spec, in_spec] + _hbm_specs(7),
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, n1h, n2), jnp.float32),
        scratch_shapes=[pltpu.VMEM(tb.shape, jnp.float32) for tb in tables] +
                       [pltpu.SemaphoreType.DMA((7,))],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=b * t * (8 * n2h * n2 * n1 + 2 * n1 * n1 * n2),
            bytes_accessed=b * t * 12 * hop, transcendentals=0),
    )(pr, pi, *tables)
    return y.reshape(*lead, t, hop).astype(re.dtype)


# -----------------------------------------------------------------------------
# Whole-chain FastFIR mega-kernel: rFFT -> spectra ring -> causal partition MAC
# -> tail riFFT, one hop per grid step, everything VMEM-resident.
#
# The three-kernel chain writes the hop spectra to HBM (fwd), reads them plus
# the accumulations back (MAC), and reads the accumulations again (tail) —
# ~2.5 GB of intermediate traffic per bench pass. Here the only HBM motion is
# x in, y out, and ONE DMA of each channel's impulse spectra: the hop spectrum
# goes straight into a VMEM ring (circular slot indexing on the leading dim),
# the causal MAC reads the ring, and the kept half-block leaves through the
# output pipeline. Per-channel state (ring, spectra) lives in persistent
# scratch, reset at each channel's first hop step — the grid is
# (channels, hops), both dimensions sequential ("arbitrary").
#
# Semantics identical to _process_offline_fused's staged chain: hop t emits
# Y_t = sum_lag X_{t-1-lag} Hhat_lag (zero ring at t=0 -> Y_0 = 0), matching
# lag_mac_causal; the caller keeps the same pad/shift/trim envelope.
# -----------------------------------------------------------------------------

def _fastfir_kernel(curb_ref, hre_hbm, him_hbm, *refs,
                    n2h: int, p: int, g_hops: int, scale: float, mode: str,
                    ablate: tuple = (), prefetch: bool = False):
    fwd_hbm = refs[:7]
    inv_hbm = refs[7:14]
    y_ref = refs[14]
    (f1r_s, f1i_s, twr_s, twi_s, f2r_s, f2i_s, f2s_s,
     qr_s, qi_s, qs_s, ctr_s, cti_s, p1r_s, p1i_s,
     hre_s, him_s, ring_re, ring_im, prev_s, tsem, hsem) = refs[15:]
    _load_tables_once(fwd_hbm + inv_hbm,
                      (f1r_s, f1i_s, twr_s, twi_s, f2r_s, f2i_s, f2s_s,
                       qr_s, qi_s, qs_s, ctr_s, cti_s, p1r_s, p1i_s),
                      tsem, grid_rank=2)
    ci = pl.program_id(0)
    tj = pl.program_id(1)

    if prefetch:
        # Ping-pong spectra scratch (2, P, n2h, n1): each channel start WAITS
        # the DMA its predecessor issued and issues the NEXT channel's fetch,
        # so the ~4 MB spectra copy overlaps the predecessor's hop compute
        # instead of stalling step 0 (HISSTOOLS_FASTFIR_PREFETCH experiment —
        # the channel-start fetch is the one serial DMA left in the skeleton).
        par = jax.lax.rem(ci, jnp.int32(2))

        @pl.when(tj == 0)
        def _():
            @pl.when(ci == 0)
            def _():
                d1 = pltpu.make_async_copy(hre_hbm.at[0], hre_s.at[0],
                                           hsem.at[0])
                d2 = pltpu.make_async_copy(him_hbm.at[0], him_s.at[0],
                                           hsem.at[1])
                d1.start()
                d2.start()
                d1.wait()
                d2.wait()

            @pl.when(ci > 0)
            def _():
                pltpu.make_async_copy(hre_hbm.at[ci], hre_s.at[par],
                                      hsem.at[2 * par]).wait()
                pltpu.make_async_copy(him_hbm.at[ci], him_s.at[par],
                                      hsem.at[2 * par + 1]).wait()

            @pl.when(ci + 1 < pl.num_programs(0))
            def _():
                pn = jax.lax.rem(ci + 1, jnp.int32(2))
                pltpu.make_async_copy(hre_hbm.at[ci + 1], hre_s.at[pn],
                                      hsem.at[2 * pn]).start()
                pltpu.make_async_copy(him_hbm.at[ci + 1], him_s.at[pn],
                                      hsem.at[2 * pn + 1]).start()

            ring_re[...] = jnp.zeros_like(ring_re)
            ring_im[...] = jnp.zeros_like(ring_im)
            prev_s[...] = jnp.zeros_like(prev_s)
        hre_s = hre_s.at[par]
        him_s = him_s.at[par]
    else:
        @pl.when(tj == 0)
        def _():
            # New channel: fetch its impulse spectra, clear the ring+history.
            d1 = pltpu.make_async_copy(hre_hbm.at[ci], hre_s, hsem.at[0])
            d2 = pltpu.make_async_copy(him_hbm.at[ci], him_s, hsem.at[1])
            d1.start()
            d2.start()
            ring_re[...] = jnp.zeros_like(ring_re)
            ring_im[...] = jnp.zeros_like(ring_im)
            prev_s[...] = jnp.zeros_like(prev_s)
            d1.wait()
            d2.wait()

    dot = _Dot(mode)

    # Mode-stacking of the table operands happens ONCE per grid step and
    # amortizes over the g_hops in-kernel hops (with one hop per step the
    # bf16x3 re-stacking was a measurable slice of the per-step skeleton).
    nh = curb_ref.shape[-2]
    f1r_lo = dot.lhs(f1r_s[...][:, :nh], 1)
    f1r_hi = dot.lhs(f1r_s[...][:, nh:], 1)
    f1i_lo = dot.lhs(f1i_s[...][:, :nh], 1)
    f1i_hi = dot.lhs(f1i_s[...][:, nh:], 1)
    f2r = dot.lhs(f2r_s[...], 0)
    f2i = dot.lhs(f2i_s[...], 0)
    f2s = dot.lhs(f2s_s[...], 0)
    twr = twr_s[...]
    twi = twi_s[...]
    inv = _stack_inv(dot, qr_s, qi_s, qs_s, ctr_s, cti_s, p1r_s, p1i_s,
                     tail_from=nh)

    # ``ablate`` (DIAGNOSTIC ONLY — output is wrong with any stage removed):
    # static stage-skip set for in-situ time attribution at square splits
    # (tools/chain_ablate.py); "mac"/"inv"/"fwd" drop that stage's work while
    # keeping the grid, pipelines, and HBM traffic identical.
    # Hops unroll with STATIC in-step indices (a fori_loop form with dynamic
    # pl.ds block indexing measured SLOWER than one hop per grid step — 17.3
    # vs 16.3 ms/pass — and compiled 4x slower; static slices let Mosaic
    # software-pipeline the step). g_hops stays small (<= 4, VMEM-bounded).
    for g in range(g_hops):
        ti = tj * g_hops + g

        # -- causal MAC from the ring (state BEFORE this hop's insert) -------
        if "mac" not in ablate:
            pr, pi = _ring_mac(ti, p, ring_re, ring_im, hre_s, him_s, n2h)
        else:
            pr = ring_re[0] * 0.0
            pi = ring_im[0] * 0.0

        # -- tail riFFT of the accumulation (kept half-block, scale folded) --
        if "inv" not in ablate:
            y_ref[0, g] = _tail_block(dot, pr, pi, *inv, scale=scale)
        else:
            y_ref[0, g] = pr[:nh, :] * scale

        # -- forward rFFT of [prev | cur] -> ring slot ti % p -----------------
        # The previous hop's block lives in-block for g > 0 and in the carried
        # prev_s scratch for g == 0 (zeroed on a channel's first step; the pm
        # mask additionally zeroes the contribution on the very first hop).
        cur_blk = curb_ref[0, g]
        prev_blk = prev_s[...] if g == 0 else curb_ref[0, g - 1]
        if "fwd" not in ablate:
            prev = dot.rhs(prev_blk, 0)
            cur = dot.rhs(cur_blk, 0)
            pm = jnp.where(ti == 0, 0.0, 1.0).astype(jnp.float32)
            er, ei = _fwd_frame(dot, prev, cur, f1r_lo, f1r_hi, f1i_lo,
                                f1i_hi, twr, twi, f2r, f2i, f2s, n2h, pm=pm)
            _ring_insert(ring_re, ring_im, ti, p, er, ei)
        else:
            _ring_insert(ring_re, ring_im, ti, p,
                         prev_blk[:n2h, :], cur_blk[:n2h, :])
    prev_s[...] = curb_ref[0, g_hops - 1]


def _fastfir_vmem(n: int, p: int, g: int = 1) -> int:
    """Tables + per-channel state + stage temporaries of the chain kernel.

    ``g`` hops per grid step scale BOTH the double-buffered io blocks and the
    unrolled stage temporaries (scoped VMEM does not reuse temporaries across
    unrolled iterations — the round-1 gotcha that made G=4 abort on hardware
    while the g-blind model passed it)."""
    n1, n2 = _split_real(n)
    rows = _pad8(n2 // 2 + 1)
    tables = 4 * (2 * n1 * n1 + 2 * n1 * n2 + 3 * n2 * rows)      # fwd
    tables += 4 * (3 * (n2 // 2) * n2 + 2 * n1 * n2 + 2 * n1 * n1)  # inv
    state = 2 * 4 * p * (n // 2) * 2                               # H + ring
    state += 4 * (n // 2)                                          # prev_s
    temps = 40 * n * g
    return tables + state + temps


def fastfir_feasible(n: int, p: int, g: int = 1) -> bool:
    """VMEM model for the whole-chain kernel: both table sets + the spectra
    scratch + the ring + stage temporaries. Requires n1 >= 128: the
    per-channel `.at[ci]` spectra DMA slices the (C, P, n2h, n1) array on a
    lane-padded memref, and Mosaic rejects lane-dim slices narrower than the
    128 tile (measured: the Zero preset's <=4096 sections fail to compile)."""
    if not ((1 << 14) <= n <= MAX_SINGLE_REAL) or (n & (n - 1)):
        return False
    return _fastfir_vmem(n, p, g) <= vmem_budget(13)


def _fastfir_pick_g(n: int, p: int, t: int) -> int:
    """Hops per grid step for the chain kernel — 1. Merging hops into one
    grid step to amortize the ~7 ms "skeleton" (the pass time with every
    compute stage ablated, tools/chain_ablate.py) is a MEASURED DEAD END:
    G=2 ran 16.7 ms/pass unrolled and 17.3 via fori_loop vs 16.3 at G=1,
    so the skeleton is io/DMA-bound, not per-step-overhead-bound (G=4 also
    overflows scoped VMEM — unrolled hops do not reuse stage temporaries).
    HISSTOOLS_FASTFIR_G overrides for probing; the G-generalised kernel and
    this chooser stay for that."""
    del n, p, t
    return 1


def fastfir_chain(x2d: jax.Array, h_re: jax.Array, h_im: jax.Array,
                  scale: float, interpret: bool | None = None,
                  mode: str | None = None) -> jax.Array:
    """Whole FastFIR chain as one kernel. ``x2d``: (C, T, H) hop blocks;
    ``h_*``: (C, P, N/2) packed impulse spectra. Returns (C, T, H) =
    scale * rifft(sum_lag X_{t-1-lag} Hhat_lag)[H:] per hop."""
    c, t, hop = x2d.shape
    n = 2 * hop
    p = h_re.shape[-2]
    n1, n2 = _split_real(n)
    n1h, n2h = n1 // 2, n2 // 2
    if interpret is None:
        interpret = _interpret_default()
    mode = mode or _MODE
    fwd = [jnp.asarray(tb) for tb in _fwd_tables(n1, n2)]
    inv = [jnp.asarray(tb) for tb in _inv_tables(n1, n2)]

    g = int(os.environ.get("HISSTOOLS_FASTFIR_G", "0")) or \
        _fastfir_pick_g(n, p, t)
    # Clamp a probing override through the g-aware VMEM model: unrolled hops
    # do not reuse stage temporaries, so G multiplies them (G=4 aborted on
    # hardware when the model ignored g).
    while g > 1 and not fastfir_feasible(n, p, g):
        g -= 1
    tp = -(-t // g) * g
    x4 = x2d.reshape(c, t, n1h, n2).astype(jnp.float32)
    if tp != t:
        # Pad to a G multiple: the extra hops run on zeros after each
        # channel's real hops (their ring pollution dies with the channel
        # reset) and their outputs are sliced off below.
        x4 = jnp.pad(x4, ((0, 0), (0, tp - t), (0, 0), (0, 0)))
    h4_re = h_re.reshape(c, p, n2h, n1).astype(jnp.float32)
    h4_im = h_im.reshape(c, p, n2h, n1).astype(jnp.float32)

    cur_spec = pl.BlockSpec((1, g, n1h, n2), lambda ci, i: (ci, i, 0, 0),
                            memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec((1, g, n1h, n2), lambda ci, i: (ci, i, 0, 0),
                          memory_space=pltpu.VMEM)
    # Stage ablation (HISSTOOLS_FASTFIR_ABLATE="mac,inv,..."): DIAGNOSTIC
    # ONLY — output is wrong with any stage removed; see tools/chain_ablate.py.
    ablate = tuple(a for a in os.environ.get(
        "HISSTOOLS_FASTFIR_ABLATE", "").split(",") if a)
    # Prefetch doubles both impulse-spectra scratch planes; budget them at the
    # PADDED plane size (2 x 4 bytes x (p, _pad8(n2//2+1), n1), ~6% larger
    # than 8*p*(n//2) at n=2^16 — ADVICE r4) so boundary configs can't slip
    # past the model.
    prefetch = (os.environ.get("HISSTOOLS_FASTFIR_PREFETCH", "0") == "1"
                and _fastfir_vmem(n, p, g)
                + 2 * 4 * p * _pad8(n2 // 2 + 1) * n1
                <= vmem_budget(13))
    h_shape = ((2, p, n2h, n1) if prefetch else (p, n2h, n1))
    y = pl.pallas_call(
        partial(_fastfir_kernel, n2h=n2h, p=p, g_hops=g, scale=float(scale),
                mode=mode, ablate=ablate, prefetch=prefetch),
        grid=(c, tp // g),
        compiler_params=_seq_grid(2),
        in_specs=[cur_spec] + _hbm_specs(2) + _hbm_specs(14),
        out_specs=y_spec,
        out_shape=jax.ShapeDtypeStruct((c, tp, n1h, n2), jnp.float32),
        scratch_shapes=[pltpu.VMEM(tb.shape, jnp.float32) for tb in fwd] +
                       [pltpu.VMEM(tb.shape, jnp.float32) for tb in inv] +
                       [pltpu.VMEM(h_shape, jnp.float32)] * 2 +
                       [pltpu.VMEM((p, n2h, n1), jnp.float32)] * 2 +
                       [pltpu.VMEM((n1h, n2), jnp.float32),
                        pltpu.SemaphoreType.DMA((14,)),
                        pltpu.SemaphoreType.DMA((4,))],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=c * tp * (6 * n1 * n1 * n2 + 16 * n1 * n2 * n2h + 8 * p * (n // 2)),
            bytes_accessed=4 * c * (2 * tp * hop + 2 * p * (n // 2)),
            transcendentals=0),
    )(x4, h4_re, h4_im, *fwd, *inv)
    return y[:, :t].reshape(c, t, hop).astype(x2d.dtype)


# -----------------------------------------------------------------------------
# Streaming variant of the whole-chain kernel: the spectra ring is PRELOADED
# from the carried state (oldest-first, pos == 0 — slot s holds X_{s-P}, i.e.
# exactly the StreamState layout) and the final ring is emitted back, slot-
# normalised, for the next block. The first hop's frame overlap comes from the
# carried previous time block instead of the zero mask.
# -----------------------------------------------------------------------------

def _fastfir_stream_kernel(curb_ref, pstate_ref, ring_hbm_re,
                           ring_hbm_im, hre_hbm, him_hbm, *refs,
                           n2h: int, p: int, t: int, g_hops: int,
                           scale: float, mode: str, lag0: bool):
    if lag0:
        l0re_hbm, l0im_hbm = refs[:2]
        refs = refs[2:]
    fwd_hbm = refs[:7]
    inv_hbm = refs[7:14]
    y_ref = refs[14]
    oring_re = refs[15]
    oring_im = refs[16]
    refs = refs[17:]
    if lag0:
        l0re_s, l0im_s = refs[:2]
        refs = refs[2:]
    (f1r_s, f1i_s, twr_s, twi_s, f2r_s, f2i_s, f2s_s,
     qr_s, qi_s, qs_s, ctr_s, cti_s, p1r_s, p1i_s,
     hre_s, him_s, ring_re, ring_im, prev_s, tsem, hsem, osem) = refs
    _load_tables_once(fwd_hbm + inv_hbm,
                      (f1r_s, f1i_s, twr_s, twi_s, f2r_s, f2i_s, f2s_s,
                       qr_s, qi_s, qs_s, ctr_s, cti_s, p1r_s, p1i_s),
                      tsem, grid_rank=2)
    ci = pl.program_id(0)
    tj = pl.program_id(1)

    @pl.when(tj == 0)
    def _():
        # New channel: impulse spectra + carried ring state into scratch, and
        # the carried previous time block into the cross-step prev scratch.
        dmas = [pltpu.make_async_copy(hre_hbm.at[ci], hre_s, hsem.at[0]),
                pltpu.make_async_copy(him_hbm.at[ci], him_s, hsem.at[1]),
                pltpu.make_async_copy(ring_hbm_re.at[ci], ring_re, hsem.at[2]),
                pltpu.make_async_copy(ring_hbm_im.at[ci], ring_im, hsem.at[3])]
        if lag0:
            dmas += [pltpu.make_async_copy(l0re_hbm.at[ci], l0re_s,
                                           hsem.at[4]),
                     pltpu.make_async_copy(l0im_hbm.at[ci], l0im_s,
                                           hsem.at[5])]
        for d in dmas:
            d.start()
        prev_s[...] = pstate_ref[0, 0]
        for d in dmas:
            d.wait()

    dot = _Dot(mode)

    # Table operands mode-stacked once per grid step, amortized over the
    # g_hops in-kernel hops (exactly the offline chain kernel's pattern —
    # hops unroll with STATIC in-step indices).
    nh = curb_ref.shape[-2]
    f1r_lo = dot.lhs(f1r_s[...][:, :nh], 1)
    f1r_hi = dot.lhs(f1r_s[...][:, nh:], 1)
    f1i_lo = dot.lhs(f1i_s[...][:, :nh], 1)
    f1i_hi = dot.lhs(f1i_s[...][:, nh:], 1)
    f2r = dot.lhs(f2r_s[...], 0)
    f2i = dot.lhs(f2i_s[...], 0)
    f2s = dot.lhs(f2s_s[...], 0)
    twr = twr_s[...]
    twi = twi_s[...]
    inv = _stack_inv(dot, qr_s, qi_s, qs_s, ctr_s, cti_s, p1r_s, p1i_s,
                     tail_from=nh)
    if lag0:
        l0r = l0re_s[...]
        l0i = l0im_s[...]

    for g in range(g_hops):
        ti = tj * g_hops + g

        # -- forward rFFT of hop ti's [prev | cur] frame. Runs BEFORE the MAC
        # so the lag-0 partition can use the hop's own spectrum; the ring
        # insert still happens after the MAC reads the pre-insert state.
        prev_blk = prev_s[...] if g == 0 else curb_ref[0, g - 1]
        prev = dot.rhs(prev_blk, 0)
        cur = dot.rhs(curb_ref[0, g], 0)
        er, ei = _fwd_frame(dot, prev, cur, f1r_lo, f1r_hi, f1i_lo, f1i_hi,
                            twr, twi, f2r, f2i, f2s, n2h)

        # -- causal MAC: virtual rows X_j; j < 0 live in the preloaded ring at
        # slot j mod p (oldest-first state layout), j >= 0 at slot j mod p
        # after earlier writes this call — one uniform slot rule.
        pr, pi = _ring_mac(ti, p, ring_re, ring_im, hre_s, him_s, n2h)

        if lag0:
            # Zero-delay partition Y_t += X_t * lag0 on the hop's OWN
            # spectrum — the collapsed non-uniform scheme's
            # head+small-sections term (mono._process_block_collapsed).
            # Packed lane [0, 0] multiplies DC*DC (re) and Nyquist*Nyquist
            # (im) independently, like _ring_mac.
            zr = er * l0r - ei * l0i
            zi = er * l0i + ei * l0r
            z0r = er[0:1, :] * l0r[0:1, :]
            z0i = ei[0:1, :] * l0i[0:1, :]
            rows = jax.lax.broadcasted_iota(jnp.int32, zr.shape, 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, zr.shape, 1)
            lane0 = (rows == 0) & (cols == 0)
            pr = pr + jnp.where(lane0, z0r, zr)
            pi = pi + jnp.where(lane0, z0i, zi)

        _ring_insert(ring_re, ring_im, ti, p, er, ei)

        # -- tail riFFT (identical to the offline kernel) --------------------
        y_ref[0, g] = _tail_block(dot, pr, pi, *inv, scale=scale)
    prev_s[...] = curb_ref[0, g_hops - 1]

    # -- last hop: emit the new ring, slot-normalised to oldest-first --------
    @pl.when(tj == t // g_hops - 1)
    def _():
        # New state slot s must hold X_{t-p+s}, which lives at scratch slot
        # (t + s) mod p — a rotation by r = t mod p, i.e. TWO contiguous
        # DMAs per plane (the per-slot loop this replaces issued p serialized
        # round trips per plane).
        r = t % p
        if r == 0:
            dmas = [pltpu.make_async_copy(ring_re, oring_re.at[ci],
                                          osem.at[0]),
                    pltpu.make_async_copy(ring_im, oring_im.at[ci],
                                          osem.at[1])]
        else:
            dmas = [
                pltpu.make_async_copy(ring_re.at[pl.ds(r, p - r)],
                                      oring_re.at[ci, pl.ds(0, p - r)],
                                      osem.at[0]),
                pltpu.make_async_copy(ring_im.at[pl.ds(r, p - r)],
                                      oring_im.at[ci, pl.ds(0, p - r)],
                                      osem.at[1]),
                pltpu.make_async_copy(ring_re.at[pl.ds(0, r)],
                                      oring_re.at[ci, pl.ds(p - r, r)],
                                      osem.at[2]),
                pltpu.make_async_copy(ring_im.at[pl.ds(0, r)],
                                      oring_im.at[ci, pl.ds(p - r, r)],
                                      osem.at[3]),
            ]
        for d in dmas:
            d.start()
        for d in dmas:
            d.wait()


def fastfir_stream_feasible(n: int, p: int, g: int = 1,
                            lag0: bool = False) -> bool:
    """VMEM model for the streaming chain kernel: the offline model plus the
    lag0 scratch (2 extra (n2h, n1) f32 planes) when the zero-delay partition
    is carried — an unmodeled lag0 would let :func:`_stream_pick_g` choose a
    G at a VMEM boundary that aborts on hardware (ADVICE r4)."""
    if not fastfir_feasible(n, p, g):
        return False
    if not lag0:
        return True
    n1, n2 = _split_real(n)
    return (_fastfir_vmem(n, p, g) + 2 * 4 * _pad8(n2 // 2 + 1) * n1
            <= vmem_budget(13))


def _stream_pick_g(n: int, p: int, t: int, lag0: bool = False) -> int:
    """Hops per grid step for the STREAMING chain kernel: the largest
    divisor of t (the emitted ring must see exactly t true hops — padded
    hops would pollute it) that fits the g-aware VMEM model, capped at 8.

    Unlike the offline kernel (whose G-merge is a measured dead end at
    N = 2^16 — the per-hop compute already hides the per-step skeleton),
    streaming hops are small (N = final-section size, e.g. 2^14) and the
    2048-step grid at G = 1 measured 17.5 ms vs the staged chain's 15.25
    (round 4): grouping is exactly the lever the offline shape didn't need.
    """
    g = int(os.environ.get("HISSTOOLS_STREAM_G", "0"))
    if g:
        return g if t % g == 0 else 1
    best = 1
    for cand in (2, 4, 8):
        if t % cand == 0 and fastfir_stream_feasible(n, p, cand, lag0=lag0):
            best = cand
    return best


def fastfir_chain_stream(x2d: jax.Array, prev: jax.Array,
                         ring_re: jax.Array, ring_im: jax.Array,
                         h_re: jax.Array, h_im: jax.Array, scale: float,
                         interpret: bool | None = None,
                         mode: str | None = None,
                         l0_re: jax.Array | None = None,
                         l0_im: jax.Array | None = None):
    """Whole streaming process_block as one kernel. ``x2d``: (C, T, H) hop
    blocks; ``prev``: (C, H) the carried previous block; ``ring_*``:
    (C, P, N/2) oldest-first spectra ring (pos == 0). ``l0_*``: optional
    (C, N/2) packed zero-delay partition multiplied with each hop's OWN
    spectrum (the collapsed scheme's block0). Hops run grouped G per grid
    step (_stream_pick_g — streaming hops are small, so the per-step
    skeleton dominates at G = 1; HISSTOOLS_STREAM_G overrides). Returns
    (y (C, T, H), new_ring_re, new_ring_im) with the new ring oldest-first."""
    c, t, hop = x2d.shape
    n = 2 * hop
    p = ring_re.shape[-2]
    n1, n2 = _split_real(n)
    n1h, n2h = n1 // 2, n2 // 2
    if interpret is None:
        interpret = _interpret_default()
    mode = mode or _MODE
    lag0 = l0_re is not None
    fwd = [jnp.asarray(tb) for tb in _fwd_tables(n1, n2)]
    inv = [jnp.asarray(tb) for tb in _inv_tables(n1, n2)]

    g = _stream_pick_g(n, p, t, lag0=lag0)

    x4 = x2d.reshape(c, t, n1h, n2).astype(jnp.float32)
    pv4 = prev.reshape(c, 1, n1h, n2).astype(jnp.float32)
    r4_re = ring_re.reshape(c, p, n2h, n1).astype(jnp.float32)
    r4_im = ring_im.reshape(c, p, n2h, n1).astype(jnp.float32)
    h4_re = h_re.reshape(c, p, n2h, n1).astype(jnp.float32)
    h4_im = h_im.reshape(c, p, n2h, n1).astype(jnp.float32)
    l0 = ()
    l0_scratch = []
    if lag0:
        l0 = (l0_re.reshape(c, n2h, n1).astype(jnp.float32),
              l0_im.reshape(c, n2h, n1).astype(jnp.float32))
        l0_scratch = [pltpu.VMEM((n2h, n1), jnp.float32)] * 2

    cur_spec = pl.BlockSpec((1, g, n1h, n2), lambda ci, i: (ci, i, 0, 0),
                            memory_space=pltpu.VMEM)
    pst_spec = pl.BlockSpec((1, 1, n1h, n2), lambda ci, i: (ci, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec((1, g, n1h, n2), lambda ci, i: (ci, i, 0, 0),
                          memory_space=pltpu.VMEM)
    y, nr_re, nr_im = pl.pallas_call(
        partial(_fastfir_stream_kernel, n2h=n2h, p=p, t=t, g_hops=g,
                scale=float(scale), mode=mode, lag0=lag0),
        grid=(c, t // g),
        compiler_params=_seq_grid(2),
        in_specs=[cur_spec, pst_spec] + _hbm_specs(4)
                 + _hbm_specs(2 if lag0 else 0) + _hbm_specs(14),
        out_specs=[y_spec, pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=[jax.ShapeDtypeStruct((c, t, n1h, n2), jnp.float32),
                   jax.ShapeDtypeStruct((c, p, n2h, n1), jnp.float32),
                   jax.ShapeDtypeStruct((c, p, n2h, n1), jnp.float32)],
        scratch_shapes=l0_scratch +
                       [pltpu.VMEM(tb.shape, jnp.float32) for tb in fwd] +
                       [pltpu.VMEM(tb.shape, jnp.float32) for tb in inv] +
                       [pltpu.VMEM((p, n2h, n1), jnp.float32)] * 4 +
                       [pltpu.VMEM((n1h, n2), jnp.float32),
                        pltpu.SemaphoreType.DMA((14,)),
                        pltpu.SemaphoreType.DMA((6,)),
                        pltpu.SemaphoreType.DMA((4,))],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=c * t * (6 * n1 * n1 * n2 + 16 * n1 * n2 * n2h
                           + 8 * p * (n // 2)),
            bytes_accessed=4 * c * (2 * t * hop + 4 * p * (n // 2)),
            transcendentals=0),
    )(x4, pv4, r4_re, r4_im, h4_re, h4_im, *l0, *fwd, *inv)
    # Preserve the caller's dtypes: the kernel computes in f32; a bf16/f16
    # state carried through lax.scan must come back in its own dtype.
    return (y.reshape(c, t, hop).astype(x2d.dtype),
            nr_re.reshape(c, p, n // 2).astype(ring_re.dtype),
            nr_im.reshape(c, p, n // 2).astype(ring_im.dtype))
