"""Mesh construction helpers.

The scaling axes (SURVEY.md §2 parallelism table): `data` shards signature
batches (pure DP — every lane is independent), `points` shards MSM inputs
(the "shard a big op" axis).  Multi-host extends the same mesh over DCN via
`jax.distributed.initialize` — the collective layout is unchanged.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the `data` axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def init_distributed(**kwargs) -> None:
    """Multi-host entry: call once per process before building meshes
    (thin wrapper over jax.distributed.initialize)."""
    jax.distributed.initialize(**kwargs)


def barrier(name: str, timeout_s: float = 600.0) -> None:
    """Cross-process barrier via the JAX coordination service.

    Unlike a device collective, this is a pure RPC — safe to call with
    arbitrary inter-process skew.  Use it to absorb per-host compile-time
    differences before the FIRST execution of a collective module:
    XLA:CPU's gloo transport exchanges connection keys with a hard 30 s
    timeout, so a process reaching an all_gather minutes before its peer
    (e.g. one host compiles while the other hits the compile cache) dies
    in context init.  Real multi-host TPU pods have the same
    compile-skew hazard over DCN.  No-op in single-process runs."""
    from jax._src import distributed
    client = getattr(distributed.global_state, "client", None)
    if client is None:
        return
    client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))


def shard_batch(mesh: Mesh, tree):
    """Place a pytree of [16, *batch] planes with the batch dim(s) sharded
    over `data`."""
    def put(x):
        spec = (None,) + ("data",) + (None,) * (x.ndim - 2)
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))
    return jax.tree_util.tree_map(put, tree)
