"""Component-level timing of the ECDSA verify core at bench lanes.

Breaks the 'where does the time go' question into the actual pipeline
stages: scalar inversion, fixed-base mult, GLV split, lane-table build,
the mega GLV kernel, and the final add/compare.  Slope-timed dependent
chains per stage (tunnel-safe).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from secp256k1_tpu.ops import glv, point as pt, scalar as sc, table as tbl
    from secp256k1_tpu.ops import field as fe
    from secp256k1_tpu.utils import batching as bt
    from secp256k1_tpu.utils import hostcurve as hc

    lanes = int(os.environ.get("BENCH_LANES", "65536"))
    b = bt.bucket(lanes)
    shape = (16,) + bt.batch_shape(b)
    rng = np.random.default_rng(3)

    def mk():
        x = rng.integers(0, 1 << 16, size=shape).astype(np.uint32)
        x[15] &= 0x7FFF
        return jnp.asarray(x)

    k = mk()
    qx = bt.plane([hc.GX] * 4, b, fill=hc.GX)
    qy = bt.plane([hc.GY] * 4, b, fill=hc.GY)
    q = pt.Point(qx, qy, fe.one(qx.shape[1:]))

    def timed(name, step, n1=1, n2=3):
        def chain(n):
            @jax.jit
            def f(x):
                def body(_, v):
                    out = step(v)
                    leaf = jax.tree_util.tree_leaves(out)[0]
                    mix = (leaf.reshape(-1)[0].astype(jnp.uint32)
                           & jnp.uint32(1))
                    return v ^ mix
                return lax.fori_loop(0, n, body, x)
            return f

        f1, f2 = chain(n1), chain(n2)
        np.asarray(f1(k)[0].reshape(-1)[:1])
        np.asarray(f2(k)[0].reshape(-1)[:1])

        def t(fn):
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                np.asarray(fn(k)[0].reshape(-1)[:1])
                best = min(best, time.time() - t0)
            return best

        per = max((t(f2) - t(f1)) / (n2 - n1), 1e-12)
        print(json.dumps({"stage": name,
                          "ns_per_lane": round(per / b * 1e9, 1),
                          "us_total": round(per * 1e6, 1)}), flush=True)

    timed("scalar_invert", lambda v: sc.invert(v))
    timed("scalar_base_mult_w8", lambda v: tbl.scalar_base_mult(v))
    timed("glv_split", lambda v: glv.split(v)[0])
    timed("build_lane_table", lambda v: tbl.build_lane_table(
        pt.Point(v, qy, fe.one(v.shape[1:]))))
    timed("glv_scalar_mult_full", lambda v: glv.scalar_mult(v, q))
    timed("point_add", lambda v: pt.add(
        pt.Point(v, qy, fe.one(v.shape[1:])), q))
    timed("to_affine_batchinv", lambda v: pt.to_affine(
        pt.Point(v, qy, fe.one(v.shape[1:]))))


if __name__ == "__main__":
    main()
