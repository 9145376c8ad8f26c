#!/usr/bin/env python
"""Hardware compile-probe for the VMEM feasibility models.

Every fused Pallas kernel gates itself on an analytic VMEM byte model
(fft/pallas_fft.py: stream_feasible, fastfir_feasible, _pick_group,
_pick_k1_rows; fft/pallas_kernels.py: lag_mac*_fits, hop_fire_fits). Those
models are hand-tuned byte counts — and the pytest suite runs Pallas interpret
mode on CPU, which accepts programs the Mosaic TPU compiler rejects. A model
that drifts permissive therefore only fails on real hardware, at first use.

This tool closes that gap: for each kernel family it finds the LARGEST
configuration the feasibility predicate claims is feasible and compiles the
kernel exactly there (jit ``lower().compile()`` on abstract shapes — no
execution, no host<->device data). A too-permissive model fails HERE, with a
named check, instead of aborting a production entry point.

    python tools/vmem_probe.py           # ~3-5 min first run (remote compiles)
                                         # seconds when the persistent
                                         # compilation cache is warm

If a probe fails (e.g. after a Mosaic/XLA upgrade shifts the real ceiling),
set HISSTOOLS_VMEM_SCALE=<0.x> to uniformly tighten every budget while the
models are re-tuned (see pallas_fft.vmem_budget).

Run this alongside tools/tpu_smoke.py after any kernel or tile-model change.
On CPU the probes compile in interpret mode — still a structural check, but
only the TPU run validates the VMEM models (Mosaic does the allocation).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAILURES = []


def _probe(name, fn, *avals):
    import jax
    t0 = time.time()
    try:
        jax.jit(fn).lower(*avals).compile()
        print(f"[PASS] {name} ({time.time() - t0:.1f}s)", flush=True)
    except Exception as e:  # noqa: BLE001 — report any compile failure
        msg = " ".join(str(e).split())[:200]
        print(f"[FAIL] {name}: {msg}", flush=True)
        FAILURES.append(name)


def _max_true(pred, lo, hi):
    """Largest v in [lo, hi] with pred(v) true (pred monotone in v), or None."""
    if not pred(lo):
        return None
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if pred(mid):
            lo = mid
        else:
            hi = mid - 1
    return lo


def main():
    import jax

    from hisstools_library_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()

    from hisstools_library_tpu.fft import pallas_fft as pf
    from hisstools_library_tpu.fft import pallas_kernels as pk

    f32 = jax.numpy.float32

    def S(*shape):
        return jax.ShapeDtypeStruct(shape, f32)

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    label = "VALIDATED" if on_tpu else "NOT validated — interpret mode"
    print(f"device: {dev} (VMEM models {label})", flush=True)
    t0 = time.time()

    # --- single-kernel real FFTs at the claimed size ceiling, both modes ---
    n_max = pf.MAX_SINGLE_REAL
    for mode in ("bf16x3", "highest"):
        _probe(f"rfft_packed single-kernel N=2^{n_max.bit_length()-1} b=8 "
               f"{mode}",
               lambda x, m=mode: pf.rfft_packed(x, mode=m), S(8, n_max))
        _probe(f"rifft_packed single-kernel N=2^{n_max.bit_length()-1} b=8 "
               f"{mode}",
               lambda r, i, m=mode: pf.rifft_packed(r, i, mode=m),
               S(8, n_max // 2), S(8, n_max // 2))

    # --- batched small-N dense kernels at the largest whole-table size ---
    for mode in ("bf16x3", "highest"):
        for n_small in (1024,):
            plan_f = pf._small_plan(n_small, n_small // 2, 1, 2, mode)
            plan_i = pf._small_plan(n_small // 2, n_small, 2, 1, mode)
            assert plan_f and plan_i, f"small plan infeasible at {n_small}"
            print(f"  small dense N={n_small} {mode}: fwd tile/ct {plan_f}, "
                  f"inv {plan_i}")
            _probe(f"rfft_small N={n_small} b=4096 {mode}",
                   lambda x, m=mode: pf.rfft_packed(x, mode=m),
                   S(4096, n_small))
            _probe(f"rifft_small N={n_small} b=4096 {mode}",
                   lambda r, i, m=mode: pf.rifft_packed(r, i, mode=m),
                   S(4096, n_small // 2), S(4096, n_small // 2))
        # Folded N = 2048 (round 3): two half-table kernel pairs per
        # direction, the forward staging a full-width (tb, 2048) input block.
        for k, c, n_in, n_out, in_w in ((1024, 512, 1, 2, 2048),
                                        (512, 1024, 2, 1, 0)):
            plan = pf._small_plan(k, c, n_in, n_out, mode, in_w=in_w)
            assert plan, f"folded small plan infeasible k={k} {mode}"
        _probe(f"rfft_small folded N=2048 b=4096 {mode}",
               lambda x, m=mode: pf.rfft_packed(x, mode=m), S(4096, 2048))
        _probe(f"rifft_small folded N=2048 b=4096 {mode}",
               lambda r, i, m=mode: pf.rifft_packed(r, i, mode=m),
               S(4096, 1024), S(4096, 1024))

    # --- split-pair kernels at the top of the engine's validated range ---
    for mode, n in (("bf16x3", pf.MAX_REAL_SIZE), ("highest", 1 << 19)):
        _probe(f"split rfft/rifft N=2^{n.bit_length()-1} {mode}",
               lambda x, m=mode: pf.rifft_packed(*pf.rfft_packed(x, mode=m),
                                                 mode=m), S(2, n))

    # --- complex fused kernel at its per-mode ceiling (the largest size the
    # group model still routes to the pallas path, b=4) ---
    from hisstools_library_tpu.fft import matmul_fft

    def cfft_group(n, mode, b=4):
        n1, n2 = matmul_fft._split_factors(n)
        tables = 4 * (2 * n1 * n1 + 2 * n2 * n2 + 2 * n1 * n2)
        return pf._pick_group(b, 16 * n, 32 * n1 * n2, tables,
                              highest=(mode == "highest"))

    for mode in ("bf16x3", "highest"):
        nc = max((n for n in (1 << k for k in range(11, 21))
                  if pf.eligible(n) and cfft_group(n, mode) > 0), default=None)
        if nc is None:
            print(f"  fft_split {mode}: no pallas-eligible size — skipped")
            continue
        print(f"  fft_split {mode} pallas ceiling: N=2^{nc.bit_length()-1} "
              f"(group {cfft_group(nc, mode)})")
        _probe(f"fft_split N=2^{nc.bit_length()-1} {mode}",
               lambda r, i, m=mode: pf.fft_split(r, i, mode=m),
               S(4, nc), S(4, nc))

    # --- streaming forward + tail inverse at the largest stream_feasible n ---
    n_stream = max(n for n in (1 << k for k in range(12, 21))
                   if pf.stream_feasible(n))
    h = n_stream // 2
    print(f"  stream_feasible ceiling: N=2^{n_stream.bit_length()-1}")
    _probe(f"rfft_packed_stream N=2^{n_stream.bit_length()-1}",
           pf.rfft_packed_stream, S(2, 8, h))
    _probe(f"rifft_packed_tail N=2^{n_stream.bit_length()-1}",
           lambda r, i: pf.rifft_packed_tail(r, i, scale=0.25 / n_stream),
           S(2, 8, h), S(2, 8, h))

    # --- whole-chain FastFIR kernels at max partition count per size ---
    for n in (1 << 14, pf.MAX_SINGLE_REAL):
        p = _max_true(lambda q: pf.fastfir_feasible(n, q), 1, 4096)
        if p is None:
            print(f"  fastfir N=2^{n.bit_length()-1}: no feasible p — skipped")
            continue
        hh = n // 2
        print(f"  fastfir_feasible ceiling: N=2^{n.bit_length()-1} P={p}")
        _probe(f"fastfir_chain N=2^{n.bit_length()-1} P={p}",
               lambda x, hr, hi, nn=n: pf.fastfir_chain(
                   x, hr, hi, scale=0.25 / nn),
               S(2, 4, hh), S(2, p, hh), S(2, p, hh))
        _probe(f"fastfir_chain_stream N=2^{n.bit_length()-1} P={p}",
               lambda x, pv, rr, ri, hr, hi, nn=n: pf.fastfir_chain_stream(
                   x, pv, rr, ri, hr, hi, scale=0.25 / nn),
               S(2, 4, hh), S(2, hh), S(2, p, hh), S(2, p, hh),
               S(2, p, hh), S(2, p, hh))

    # --- fused single-hop engine kernel (streaming latency path) ---
    nh, ch = 1024, 128
    ph = _max_true(lambda q: pk.hop_fire_fits(nh, ch, q), 1, 4096)
    assert ph is not None, "hop_fire_fits claims nothing feasible at N=1024"
    print(f"  hop_fire ceiling: N={nh} C={ch} P={ph}")
    interp = not on_tpu
    _probe(f"hop_fire N={nh} C={ch} P={ph}",
           lambda *a: pk.hop_fire(*a, interpret=interp),
           S(ch, nh), S(ch, ph, nh // 2), S(ch, ph, nh // 2),
           S(ch, ph, nh // 2), S(ch, ph, nh // 2))

    # --- lag-MAC family at max partition count (bench-like bins) ---
    t, k = 16, 16384
    p = _max_true(lambda q: pk.lag_mac_fits(t, q, k), 1, 4096)
    assert p is not None, "lag_mac_fits claims nothing feasible at T=16"
    print(f"  lag_mac ceiling: T={t} K={k} P={p}")
    _probe(f"lag_mac T={t} K={k} P={p}",
           lambda xr, xi, hr, hi: pk.lag_mac(xr, xi, hr, hi, t,
                                              interpret=interp),
           S(2, t + p, k), S(2, t + p, k), S(2, p, k), S(2, p, k))
    p = _max_true(lambda q: pk.lag_mac_causal_fits(t, q, k), 1, 4096)
    assert p is not None, "lag_mac_causal_fits claims nothing feasible at T=16"
    print(f"  lag_mac_causal ceiling: T={t} K={k} P={p}")
    _probe(f"lag_mac_causal T={t} K={k} P={p}",
           lambda *a: pk.lag_mac_causal(*a, interpret=interp),
           S(2, t, k), S(2, t, k), S(2, p, k), S(2, p, k))
    p = _max_true(lambda q: pk.lag_mac_ring_fits(t, q, k), t, 4096)
    assert p is not None, "lag_mac_ring_fits claims nothing feasible"
    print(f"  lag_mac_ring ceiling: T={t} K={k} P={p}")
    _probe(f"lag_mac_ring T={t} K={k} P={p}",
           lambda *a: pk.lag_mac_ring(*a, interpret=interp),
           S(2, p, k), S(2, p, k), S(2, t, k), S(2, t, k),
           S(2, p, k), S(2, p, k))

    print(f"\n{len(FAILURES)} failures; {time.time() - t0:.0f}s total",
          flush=True)
    if FAILURES:
        print("FAILED:", ", ".join(FAILURES))
        sys.exit(1)
    print("VMEM probe: all boundary compiles passed")


if __name__ == "__main__":
    main()
