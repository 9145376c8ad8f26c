"""Determinism: same inputs -> bitwise-identical outputs.

The reference's concurrency-safety story is lock discipline (MemorySwap +
thread_lock); the functional TPU equivalent per SURVEY.md §5 is proving that
repeated evaluation is bitwise reproducible — no nondeterministic reduction
orders or uninitialised memory anywhere in the engines (Pallas kernels
included; on CPU they run in interpret mode, the same program the TPU runs).
"""

import numpy as np

import jax
import jax.numpy as jnp

from hisstools_library_tpu.models import mono
from hisstools_library_tpu.models.mono import PartitionScheme
from hisstools_library_tpu.models.offline import FastFIR


def _bitwise_equal(a, b):
    return np.array_equal(np.asarray(a).view(np.uint32),
                          np.asarray(b).view(np.uint32))


def test_fused_offline_chain_bitwise_reproducible(rng):
    ir = (rng.standard_normal(9000) * 0.2).astype(np.float32)
    x = rng.standard_normal((2, 20000)).astype(np.float32)
    eng = FastFIR(ir[None], fft_size=4096, backend="pallas")
    f = jax.jit(lambda s, xx: FastFIR.apply(s, xx, backend="pallas"))
    y1 = f(eng.spectra, jnp.asarray(x))
    y2 = f(eng.spectra, jnp.asarray(x))
    assert _bitwise_equal(y1, y2)


def test_streaming_scan_bitwise_reproducible(rng):
    scheme = PartitionScheme((64, 256), zero_latency=True)
    blk = 128
    ir = mono.prepare_ir(scheme, (rng.standard_normal((2, 500)) * 0.3
                                  ).astype(np.float32), offline_tail=False)
    x = jnp.asarray(rng.standard_normal((2, blk * 6)).astype(np.float32))
    f = jax.jit(mono.process)
    s0 = mono.init_state(scheme, ir, batch_shape=(2,))
    _, y1 = f(ir, s0, x)
    _, y2 = f(ir, s0, x)
    assert _bitwise_equal(y1, y2)


def test_sharded_bitwise_reproducible(rng):
    from hisstools_library_tpu.parallel import make_mesh, scheme_offline_sharded

    mesh = make_mesh(channel=2, block=4)
    scheme = PartitionScheme((4096,), zero_latency=False)
    ir = mono.prepare_ir(scheme, (rng.standard_normal((4, 5000)) * 0.2
                                  ).astype(np.float32), offline_tail=False)
    x = jnp.asarray(rng.standard_normal((4, 2048 * 8)).astype(np.float32))
    y1 = scheme_offline_sharded(mesh, scheme, ir, x, backend="pallas")
    y2 = scheme_offline_sharded(mesh, scheme, ir, x, backend="pallas")
    assert _bitwise_equal(y1, y2)


def test_checkpoint_resume_bitexact(rng):
    """Restarting the scan from a saved (checkpointed) state pytree continues
    bitwise-identically — checkpoint/resume per SURVEY.md §5."""
    scheme = PartitionScheme((64, 256), zero_latency=True)
    blk = 128
    ir = mono.prepare_ir(scheme, (rng.standard_normal(700) * 0.3
                                  ).astype(np.float32)[None],
                         offline_tail=False)
    x = rng.standard_normal((1, blk * 8)).astype(np.float32)
    f = jax.jit(mono.process)

    s = mono.init_state(scheme, ir, batch_shape=(1,))
    s, y_a = f(ir, s, jnp.asarray(x[:, :blk * 4]))

    # "Checkpoint": round-trip the state pytree through host numpy.
    leaves, treedef = jax.tree_util.tree_flatten(s)
    restored = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(np.asarray(l)) for l in leaves])

    _, y_b1 = f(ir, s, jnp.asarray(x[:, blk * 4:]))
    _, y_b2 = f(ir, restored, jnp.asarray(x[:, blk * 4:]))
    assert _bitwise_equal(y_b1, y_b2)
