"""Sharded pipelines: data-parallel batch verify and sharded Pippenger MSM.

The distributed design the reference has no analog for (SURVEY.md §2/§5
"distributed communication backend"):

- **Batch verify / sign / ECDH** are embarrassingly data-parallel: shard the
  lane axis over the `data` mesh axis with pjit; XLA inserts zero
  collectives.  Throughput scales linearly with chips as long as the host
  feeds batches.

- **Pippenger MSM**: points are partitioned per device under `shard_map`;
  each device runs bucket accumulation + weighted bucket aggregation on its
  slice (ops/msm.py), producing per-window partial sums (W tiny points).
  Those are combined with one `all_gather` over ICI/DCN + a log-depth
  point-add reduction, then the Horner window fold runs replicated.  The
  all_gather payload is W x 96B per device — communication is negligible
  next to bucket work, which is what makes >=85% multi-host scaling
  realistic.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..ops import msm as msm_ops
from ..ops import point as pt


_VERIFY_CACHE: dict = {}


def sharded_verify_jit(mesh: Mesh, ndim: int = 2):
    """The jitted data-parallel ECDSA verify core (inputs [16, *batch]
    planes with the leading batch dim sharded over `data`).  Cached per
    (mesh, ndim) so tests/dryruns/services share one compile; AOT-compile
    with `.lower(*args).compile()` when compile latency must be overlapped."""
    from ..models.ecdsa import _verify_core

    key = (mesh, ndim)
    if key not in _VERIFY_CACHE:
        spec = NamedSharding(mesh, P(*((None, "data") + (None,) * (ndim - 2))))
        out_sharding = NamedSharding(
            mesh, P(*(("data",) + (None,) * (ndim - 2))))
        _VERIFY_CACHE[key] = jax.jit(_verify_core.__wrapped__,
                                     in_shardings=(spec,) * 5,
                                     out_shardings=out_sharding)
    return _VERIFY_CACHE[key]


def sharded_verify_fn(mesh: Mesh):
    """Returns a callable dispatching to `sharded_verify_jit` by rank."""
    def f(qx, qy, e, r, s):
        return sharded_verify_jit(mesh, qx.ndim)(qx, qy, e, r, s)
    return f


_MSM_CACHE: dict = {}


def sharded_msm_jit(mesh: Mesh, window_bits: int = 8):
    """Jitted sharded-Pippenger callable (scalars [16, N], points Point(N,)
    partitioned over `data`; N % mesh size == 0).  Cached per
    (mesh, window_bits); AOT-compile with `.lower(...).compile()`."""
    key = (mesh, window_bits)
    if key in _MSM_CACHE:
        return _MSM_CACHE[key]

    in_specs = (P(None, "data"),
                pt.Point(P(None, "data"), P(None, "data"), P(None, "data")))
    out_specs = pt.Point(P(), P(), P())

    @partial(shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
             check_vma=False)
    def run(k_shard, p_shard):
        # Local bucket accumulation + weighted sums: [W, 3, 16].
        wsums = msm_ops.pippenger_window_sums(k_shard, p_shard, window_bits)
        # Combine across devices: tiny all_gather + a log-depth tree of
        # *batched* point-adds over the device axis (one traced add per
        # level — both faster and a much smaller graph than a chain).
        gathered = lax.all_gather(wsums, "data")          # [D, W, 3, 16]
        d = gathered.shape[0]
        while d > 1:
            half = d // 2
            a = jnp.moveaxis(gathered[:half], -1, 0)      # [16, half, W, 3]
            b = jnp.moveaxis(gathered[half:2 * half], -1, 0)
            summed = pt.add(pt.Point(a[..., 0], a[..., 1], a[..., 2]),
                            pt.Point(b[..., 0], b[..., 1], b[..., 2]))
            merged = jnp.moveaxis(
                jnp.stack([summed.x, summed.y, summed.z], axis=-1),
                0, -2)                                    # [half, W, 16, 3]
            merged = jnp.moveaxis(merged, -1, -2)         # [half, W, 3, 16]
            if d % 2:
                merged = jnp.concatenate([merged, gathered[2 * half:]], 0)
            gathered = merged
            d = gathered.shape[0]
        # Fold windows (replicated, negligible work).
        return msm_ops.combine_windows(gathered[0], window_bits)

    _MSM_CACHE[key] = jax.jit(run)
    return _MSM_CACHE[key]


def sharded_msm_split_jits(mesh: Mesh, window_bits: int = 8):
    """(local_fn, combine_fn): the two stages of `sharded_msm_jit` as
    separate jits, for per-stage timing in the scaling artifact — local
    per-device bucket accumulation vs the all_gather + log-tree + window
    fold.  local_fn(scalars, points) -> [D, W, 3, 16] (device-sharded);
    combine_fn(wsums) -> replicated Point.  Semantics composed equal the
    fused `sharded_msm_jit` (asserted in tests/test_parallel.py)."""
    in_specs = (P(None, "data"),
                pt.Point(P(None, "data"), P(None, "data"), P(None, "data")))

    @partial(shard_map, mesh=mesh, in_specs=in_specs,
             out_specs=P("data", None, None, None), check_vma=False)
    def local(k_shard, p_shard):
        return msm_ops.pippenger_window_sums(k_shard, p_shard,
                                             window_bits)[None]

    @partial(shard_map, mesh=mesh,
             in_specs=P("data", None, None, None),
             out_specs=pt.Point(P(), P(), P()), check_vma=False)
    def combine(wsums_shard):
        gathered = lax.all_gather(wsums_shard[0], "data")  # [D, W, 3, 16]
        d = gathered.shape[0]
        while d > 1:
            half = d // 2
            a = jnp.moveaxis(gathered[:half], -1, 0)
            b = jnp.moveaxis(gathered[half:2 * half], -1, 0)
            summed = pt.add(pt.Point(a[..., 0], a[..., 1], a[..., 2]),
                            pt.Point(b[..., 0], b[..., 1], b[..., 2]))
            merged = jnp.moveaxis(
                jnp.stack([summed.x, summed.y, summed.z], axis=-1), 0, -2)
            merged = jnp.moveaxis(merged, -1, -2)
            if d % 2:
                merged = jnp.concatenate([merged, gathered[2 * half:]], 0)
            gathered = merged
            d = gathered.shape[0]
        return msm_ops.combine_windows(gathered[0], window_bits)

    return jax.jit(local), jax.jit(combine)


def sharded_msm(mesh: Mesh, scalars, points: pt.Point,
                window_bits: int = 8) -> pt.Point:
    """sum_i k_i * P_i with points partitioned over the mesh's `data` axis.

    Returns a replicated single Point."""
    n = scalars.shape[-1]
    n_dev = mesh.shape["data"]
    assert n % n_dev == 0, (n, n_dev)
    return sharded_msm_jit(mesh, window_bits)(scalars, points)
