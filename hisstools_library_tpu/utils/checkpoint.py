"""Durable checkpoint/restore for engine state pytrees (orbax-backed).

The reference library is stateless-by-API: its streaming state (RW counters,
input-spectra ring, accumulators — PartitionedConvolve.h:62-81) lives in
private buffers and cannot be persisted. Here every engine's state is an
explicit pytree, so long-running streams (broadcast processing, multi-hour IR
renders) can checkpoint mid-stream and resume bit-exactly after a restart —
including across process boundaries and onto a different host count (arrays
are saved replicated; reshard after restore if needed).

What gets saved: any pytree of jax/numpy arrays — MonoState/MonoStreamState/
PartitionedState, MonoIR spectra, TrackerState, or a dict combining them.
Scalar leaves and nested tuples survive because the treedef is reconstructed
from the pytree structure saved alongside the arrays.

Bit-exact resume is proven by tests/test_determinism.py-style checks in
tests/test_checkpoint.py: stream N hops = stream k, checkpoint, restore in a
fresh process-like context, stream N-k.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def save(path: str, state: Any) -> None:
    """Write ``state`` (any pytree of arrays/scalars) atomically to ``path``.

    Uses orbax's StandardCheckpointer (async-capable; this call waits so the
    checkpoint is durable on return). ``path`` must not already contain a
    checkpoint unless overwriting is intended — existing checkpoints are
    replaced atomically.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckpt:
        ckpt.save(path, state, force=True)
        ckpt.wait_until_finished()


def restore(path: str, like: Any) -> Any:
    """Read a checkpoint written by :func:`save` back into the structure of
    ``like`` (an exemplar pytree with the right treedef/shapes/dtypes — e.g.
    a freshly-initialised state from ``init_state``/``init_stream_state``)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, like)
    with ocp.StandardCheckpointer() as ckpt:
        return ckpt.restore(path, target)


def save_npz(path: str, state: Any) -> None:
    """Dependency-light alternative: flatten to numpy and write one .npz.
    Suited to small states and environments without orbax; not atomic."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    np.savez(path, *[np.asarray(l) for l in leaves])


def restore_npz(path: str, like: Any) -> Any:
    leaves, treedef = jax.tree_util.tree_flatten(like)
    with np.load(path) as z:
        arrays = [z[k] for k in z.files]
    if len(arrays) != len(leaves):
        raise ValueError(f"checkpoint has {len(arrays)} leaves, "
                         f"exemplar has {len(leaves)}")
    import jax.numpy as jnp

    def _cast(a, l):
        # Python-scalar leaves (ints/floats in configs) come back as 0-d
        # arrays from npz — restore them as the exemplar's Python type.
        if not hasattr(l, "dtype"):
            return type(l)(a.item())
        return jnp.asarray(a, l.dtype)

    restored = [_cast(a, l) for a, l in zip(arrays, leaves)]
    return jax.tree_util.tree_unflatten(treedef, restored)
