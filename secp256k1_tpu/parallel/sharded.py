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


def sharded_verify_fn(mesh: Mesh):
    """Returns a jitted ECDSA verify-core function sharded over `data`.

    The jitted callable is cached per (mesh, ndim) at module level so
    repeated constructions (tests, dryruns, services) share one compile."""
    from ..models.ecdsa import _verify_core

    def spec(ndim):
        return NamedSharding(mesh, P(*((None, "data") + (None,) * (ndim - 2))))

    def make(ndim):
        key = (mesh, ndim)
        if key not in _VERIFY_CACHE:
            shardings = tuple(spec(ndim) for _ in range(5))
            out_sharding = NamedSharding(
                mesh, P(*(("data",) + (None,) * (ndim - 2))))
            _VERIFY_CACHE[key] = jax.jit(_verify_core.__wrapped__,
                                         in_shardings=shardings,
                                         out_shardings=out_sharding)
        return _VERIFY_CACHE[key]

    def f(qx, qy, e, r, s):
        return make(qx.ndim)(qx, qy, e, r, s)
    return f


_MSM_CACHE: dict = {}


def sharded_msm(mesh: Mesh, scalars, points: pt.Point,
                window_bits: int = 8) -> pt.Point:
    """sum_i k_i * P_i with points partitioned over the mesh's `data` axis.

    scalars: [16, N]; points: Point batch (N,); N divisible by mesh size.
    Returns a replicated single Point.  The shard_map callable is cached per
    (mesh, window_bits) so repeated invocations reuse one trace/compile.
    """
    n = scalars.shape[-1]
    n_dev = mesh.shape["data"]
    assert n % n_dev == 0, (n, n_dev)

    key = (mesh, window_bits)
    if key in _MSM_CACHE:
        return _MSM_CACHE[key](scalars, points)

    in_specs = (P(None, "data"),
                pt.Point(P(None, "data"), P(None, "data"), P(None, "data")))
    out_specs = pt.Point(P(), P(), P())

    def stack_to_point(s):
        """[W, 3, 16] window-sum stack -> Point batch (W,)."""
        return pt.Point(s[:, 0].T, s[:, 1].T, s[:, 2].T)

    def point_to_stack(p):
        return jnp.stack([p.x.T, p.y.T, p.z.T], axis=1)

    @partial(shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
             check_vma=False)
    def run(k_shard, p_shard):
        # Local bucket accumulation + weighted sums: [W, 3, 16].
        wsums = msm_ops.pippenger_window_sums(k_shard, p_shard, window_bits)
        # Combine across devices: tiny all_gather + point-add reduction
        # (batched over the W windows).
        gathered = lax.all_gather(wsums, "data")          # [D, W, 3, 16]
        acc = stack_to_point(gathered[0])
        for i in range(1, gathered.shape[0]):  # D is small; chain is fine
            acc = pt.add(acc, stack_to_point(gathered[i]))
        # Fold windows (replicated, negligible work).
        return msm_ops.combine_windows(point_to_stack(acc), window_bits)

    _MSM_CACHE[key] = run
    return run(scalars, points)
