"""Does per-grid-step cost scale with BLOCK-SPEC COUNT at fixed bytes? (TPU)

The ring MAC moves ~3.3 MB/grid-step yet costs ~15 us/step (~220 GB/s
effective vs the 571 GB/s pure-copy probe). Hypothesis: each of its ~10
double-buffered block specs contributes ~1 us of DMA issue latency per step.
This probe copies the SAME bytes per step through N separate arrays (2N
specs) for N in {1, 2, 4, 8}: if ms scales with N at fixed bytes, spec count
is the knob and merging planes (interleaved re|im layouts) pays.
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from hisstools_library_tpu.utils.profiling import enable_compile_cache, sync
    enable_compile_cache()
    print(f"device: {jax.devices()[0]}", flush=True)

    C, TILE = 128, 4096
    K = 32768
    ROWS_TOTAL = 32          # rows per step across all arrays (512 KB/step/dir)
    rng = np.random.default_rng(0)

    for n_arrays in (1, 2, 4, 8):
        rows = ROWS_TOTAL // n_arrays

        def kernel(*refs):
            ins = refs[:n_arrays]
            outs = refs[n_arrays:]
            for i, o in zip(ins, outs):
                o[...] = i[...] * 1.0001

        spec = pl.BlockSpec((1, rows, TILE), lambda ci, ki: (ci, 0, ki),
                            memory_space=pltpu.VMEM)
        xs = [jnp.asarray(rng.standard_normal((C, rows, K)), jnp.float32)
              for _ in range(n_arrays)]
        call = pl.pallas_call(
            kernel,
            grid=(C, K // TILE),
            in_specs=[spec] * n_arrays,
            out_specs=[spec] * n_arrays,
            out_shape=[jax.ShapeDtypeStruct((C, rows, K), jnp.float32)
                       ] * n_arrays,
        )
        f = jax.jit(lambda *a: call(*a)[0])
        sync(f(*xs))

        def best(k):
            b = np.inf
            for _ in range(3):
                t0 = time.time()
                o = None
                for _ in range(k):
                    o = f(*xs)
                sync(o)
                b = min(b, time.time() - t0)
            return b

        t1, t2 = best(6), best(12)
        ms = (t2 - t1) / 6 * 1e3
        steps = C * (K // TILE)
        gb = 2 * n_arrays * rows * TILE * 4 * steps / 1e9
        print(f"arrays={n_arrays:2d} (specs {2*n_arrays:2d}): {ms:7.2f} ms "
              f"= {1e3*ms/steps:5.2f} us/step, {gb/ms*1e3:6.0f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
