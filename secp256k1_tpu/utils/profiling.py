"""Profiling / roofline helpers (SURVEY.md §5 tracing).

The reference's only perf tooling is Go benchmarks; here the first-class
tools are the JAX profiler (traces viewable in XProf/TensorBoard) and a
per-kernel roofline estimator for the fused Pallas ops.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/secp256k1_tpu_trace"):
    """Capture a device trace around a block: view with xprof/tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def timed_chain(fn, args, n_reps_small: int = 1, n_reps_big: int = 4,
                reps: int = 3):
    """Slope-timed throughput for a jitted chainable fn (tunnel-safe).

    Returns seconds per rep, cancelling constant dispatch/readback overhead
    by differencing two chain lengths.
    """
    import jax.numpy as jnp
    from jax import lax

    def chain(n):
        def f(*a):
            def body(i, carry):
                acc, a0 = carry
                out = fn(a0, *a[1:])
                leaf = jax.tree_util.tree_leaves(out)[0]
                # Loop-carried dependence (runtime no-op, opaque to XLA) so
                # the body cannot be hoisted out of the loop.
                mix = leaf.reshape(-1)[0]
                return (acc + mix.astype(jnp.float32),
                        a0 ^ (mix.astype(a0.dtype) & a0.dtype.type(1)))
            acc, _ = lax.fori_loop(0, n, body, (jnp.float32(0), a[0]))
            return acc
        return jax.jit(f)

    f_small, f_big = chain(n_reps_small), chain(n_reps_big)
    _ = np.asarray(f_small(*args))
    _ = np.asarray(f_big(*args))

    def best(f):
        b = float("inf")
        for _ in range(reps):
            t = time.time()
            _ = np.asarray(f(*args))
            b = min(b, time.time() - t)
        return b

    return max((best(f_big) - best(f_small)) / (n_reps_big - n_reps_small),
               1e-9)


# Rough per-op cost model for the fused kernels (v5e-class VPU).
POINT_ADD_VREG_OPS = 12 * 1800 + 21 * 300     # 12 modmul + adds, per lane
POINT_DBL_VREG_OPS = 8 * 1800 + 14 * 300
HBM_BYTES_PER_POINT_OP = 9 * 16 * 4            # 9 limb planes in+out


def roofline_report(lanes: int, measured_s: float, op: str = "point_add"):
    """Compare a measured per-op time against compute/memory bounds."""
    ops = {"point_add": POINT_ADD_VREG_OPS,
           "point_double": POINT_DBL_VREG_OPS}[op]
    vpu_ops_per_s = 0.94e9 * 1024 * 2          # clock * lanes * ~ALUs
    hbm_bytes_per_s = 800e9
    compute_bound = lanes * ops / vpu_ops_per_s
    memory_bound = lanes * HBM_BYTES_PER_POINT_OP / hbm_bytes_per_s
    return {
        "op": op,
        "lanes": lanes,
        "measured_s": measured_s,
        "compute_bound_s": compute_bound,
        "memory_bound_s": memory_bound,
        "pct_of_compute_roofline": round(100 * compute_bound / measured_s, 1),
    }
