"""Multi-host (multi-process) scale-out utilities.

The reference's distribution story is Ray actor RPC (SURVEY.md §2.6); the
TPU-native equivalent is single-controller-per-host JAX: every host calls
:func:`init_multihost`, builds the same global mesh over
``jax.devices()``, and materializes its local shard of the env batch —
stepping needs no cross-host communication at all, and learner gradients
all-reduce over ICI/DCN through the jitted train step.

Tested with CPU process fakes in tests/test_multihost.py (2 processes x 4
virtual devices), per the SURVEY §4 test strategy.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> None:
    """``jax.distributed.initialize`` wrapper (no-op args on TPU pods,
    where the runtime autodetects)."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def _make_global(x, mesh: Mesh, spec: P):
    """Build one global array from this process's local slice of ``x``
    (``x`` is the FULL global value computed redundantly per host — fine
    for env states and task banks, which are cheap host-side)."""
    is_key = jnp.issubdtype(x.dtype, jax.dtypes.prng_key) \
        if hasattr(x, "dtype") else False
    raw = jax.random.key_data(x) if is_key else x
    sharding = NamedSharding(mesh, spec)
    n_proc = jax.process_count()
    pid = jax.process_index()
    if spec and spec[0] is not None:
        per = raw.shape[0] // n_proc
        local = np.asarray(raw[pid * per:(pid + 1) * per])
    else:
        local = np.asarray(raw)
    g = jax.make_array_from_process_local_data(sharding, local)
    return jax.random.wrap_key_data(g) if is_key else g


def shard_global_leading(tree, mesh: Mesh, axis: str = "data"):
    """Shard every leaf's leading dim over ``axis`` across ALL hosts.
    Leaves must be full global values (computed identically per host);
    leading dims not divisible by the axis size are replicated."""
    size = mesh.shape[axis]

    def put(x):
        if x.ndim >= 1 and x.shape[0] % size == 0:
            spec = P(axis)
        else:
            spec = P()
        return _make_global(x, mesh, spec)

    return jax.tree.map(put, tree)


def replicate_global(tree, mesh: Mesh):
    return jax.tree.map(lambda x: _make_global(x, mesh, P()), tree)
