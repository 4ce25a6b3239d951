"""Focused timing of the GLV scalar-mult hot path on the real chip.

Times `glv.scalar_mult` alone (the dominant stage of the verify pipeline)
under the current kernel-config env knobs, so multiply-strategy and
block-size experiments don't pay a full verify-pipeline compile:

  SECP256K1_TPU_F32POINT=1 SECP256K1_TPU_MEGA_BLK=4 python tools/bench_glv.py

Slope-timed dependent chains (two lengths) to cancel tunnel readback
latency; see CLAUDE.md for why block_until_ready is not trusted here.
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

    from secp256k1_tpu.ops import field as fe
    from secp256k1_tpu.ops import glv
    from secp256k1_tpu.ops import point as pt
    from secp256k1_tpu.ops.pallas import kernels as pk
    from secp256k1_tpu.utils import batching as bt
    from secp256k1_tpu.utils import hostcurve as hc

    lanes = int(os.environ.get("BENCH_LANES", "65536"))
    b = bt.bucket(lanes)
    shape = (16,) + bt.batch_shape(b)
    rng = np.random.default_rng(3)

    x = rng.integers(0, 1 << 16, size=shape).astype(np.uint32)
    x[15] &= 0x7FFF
    k = jnp.asarray(x)
    qx = bt.plane([hc.GX] * 4, b, fill=hc.GX)
    qy = bt.plane([hc.GY] * 4, b, fill=hc.GY)
    q = pt.Point(qx, qy, fe.one(qx.shape[1:]))

    def chain(n):
        @jax.jit
        def f(v):
            def body(_, v):
                out = glv.scalar_mult(v, q)
                mix = (out.x.reshape(-1)[0].astype(jnp.uint32)
                       & jnp.uint32(1))
                return v ^ mix
            return lax.fori_loop(0, n, body, v)
        return f

    n1, n2 = 1, 3
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
    print(json.dumps({
        "stage": "glv_scalar_mult_full",
        "lanes": b,
        "f32_point": pk._F32_POINT,
        "mega_blk": pk._MEGA_BLK,
        "mega": pk.mega_enabled(),
        "ns_per_lane": round(per / b * 1e9, 1),
        "us_total": round(per * 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
