"""Latency-floor diagnostic: device time vs tunnel RPC, one session (TPU).

Round-3/4 question (VERDICT weak #5): the r2-recorded 0.151 ms/block device
floor re-measured at 0.38-0.46 ms after the tunnel outage, attributed to "rig
drift" — but no diagnostic separated device time from RPC. This tool runs, in
a SINGLE session, for block sizes {64, 256, 1024}:

- the device-only cost per block via ONE ``lax.scan`` of M vs 2M
  sample-granular steps (slope cancels the fixed sync; no per-step dispatch),
- the dispatch-chain cost (per-callback jitted calls; includes the axon
  tunnel's per-call RPC),
- a pure-RPC reference: the slope of chains of a trivial jitted op (the
  per-call tunnel cost with ~zero device work).

device-only ≈ scan slope; RPC ≈ dispatch slope − scan slope ≈ trivial-op
slope. If the scan slope itself moved vs a past record, that IS a device/
toolchain change, not rig drift. Reference match: the per-callback budget
discipline of MonoConvolve::process (MonoConvolve.cpp:179-201).
"""

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from hisstools_library_tpu.utils.profiling import enable_compile_cache, sync
    enable_compile_cache()

    from hisstools_library_tpu.models import mono
    from hisstools_library_tpu.models.mono import LatencyMode, PartitionScheme

    channels = int(os.environ.get("BENCH_CHANNELS", "128"))
    fs = 48000
    scheme = PartitionScheme.from_latency(LatencyMode.Zero)
    rng = np.random.default_rng(1)
    ir_len = 480000
    irs = (rng.standard_normal((channels, ir_len)) *
           np.exp(-np.arange(ir_len) / (0.5 * fs))).astype(np.float32)
    ir = mono.prepare_ir(scheme, irs, dtype=jnp.float32, offline_tail=False)
    jax.block_until_ready(ir.head_taps)
    backend = "pallas"
    print(f"device: {jax.devices()[0]}  channels={channels}", flush=True)

    # Pure-RPC reference: trivial op dispatch chains.
    v = jnp.zeros((8,), jnp.float32)
    triv = jax.jit(lambda a: a + 1.0)

    def triv_chain(k):
        a = v
        for _ in range(k):
            a = triv(a)
        return a

    sync(triv_chain(4))

    def best(fn, k, rounds=3):
        b = np.inf
        for _ in range(rounds):
            t0 = time.time()
            sync(fn(k))
            b = min(b, time.time() - t0)
        return b

    m0 = 256
    t1, t2 = best(triv_chain, m0), best(triv_chain, 2 * m0)
    rpc = (t2 - t1) / m0
    print(f"trivial-op dispatch slope: {rpc * 1e3:.3f} ms/call "
          f"(pure tunnel RPC + dispatch)", flush=True)

    for block in (64, 256, 1024):
        big_hop = scheme.sizes[-1] >> 1
        m = max(2 * big_hop // block, 16)
        blocks = [jnp.asarray(rng.standard_normal((channels, block)),
                              jnp.float32) for _ in range(8)]
        step = jax.jit(lambda i, s, xx: mono.process_any(i, s, xx,
                                                         backend=backend),
                       donate_argnums=(1,))

        def chain(steps):
            s = mono.init_stream_state(scheme, ir, (channels,))
            y = None
            for k in range(steps):
                s, y = step(ir, s, blocks[k % len(blocks)])
            return y

        xs_scan = jnp.stack([blocks[k % len(blocks)] for k in range(2 * m)])

        @partial(jax.jit, static_argnums=(3,))
        def scan_chain(i, s0, xs, steps):
            def body(s, xb):
                s, y = mono.process_any(i, s, xb, backend=backend)
                return s, y[..., :1]
            return jax.lax.scan(body, s0, xs[:steps])

        def scan_run(steps):
            s0 = mono.init_stream_state(scheme, ir, (channels,))
            return scan_chain(ir, s0, xs_scan, steps)[1]

        t0 = time.time()
        sync(chain(4)); sync(scan_run(m)); sync(scan_run(2 * m))
        print(f"block {block}: compile {time.time() - t0:.1f}s", flush=True)

        d1, d2 = best(chain, m), best(chain, 2 * m)
        disp = (d2 - d1) / m
        s1, s2 = best(scan_run, m), best(scan_run, 2 * m)
        dev = (s2 - s1) / m
        budget = block / fs
        print(f"block {block:5d}: device-only {dev * 1e3:7.3f} ms/block  "
              f"dispatch {disp * 1e3:7.3f}  (disp-dev {1e3 * (disp - dev):6.3f}"
              f" vs pure-RPC {rpc * 1e3:.3f})  budget {budget * 1e3:6.3f} ms"
              f"  headroom {budget / dev:5.1f}x", flush=True)


if __name__ == "__main__":
    main()
