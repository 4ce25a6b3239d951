"""Pippenger MSM throughput on one chip: points/s at 2^16..2^20.

Usage: python tools/bench_msm.py [log2_n ...]
Prints one JSON line per size.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(sizes):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from secp256k1_tpu.ops import limbs as lb
    from secp256k1_tpu.ops import msm
    from secp256k1_tpu.ops import point as pt

    for log2n in sizes:
        n = 1 << log2n
        rng = np.random.default_rng(42)
        scalars = rng.integers(0, 1 << 16, size=(16, n)).astype(np.uint32)
        scalars[15] &= 0x7FFF
        # Device-resident (a numpy arg would re-upload 16n*4 B through the
        # ~100 MB/s tunnel on EVERY timed call — measured ~2.7 s at 2^21,
        # several times the actual device time).
        scalars = jnp.asarray(scalars)
        # Random-looking points: k*G for small k is fine for throughput
        # (the kernel cost is input-independent); build from a base point
        # replicated with per-lane Z randomization to avoid degenerate adds.
        from secp256k1_tpu.utils import hostcurve as hc
        base = [hc.mul(i % 509 + 1, hc.G) for i in range(min(n, 509))]
        xs = np.tile(lb.int_to_limbs_batch([p[0] for p in base]),
                     (1, (n + len(base) - 1) // len(base)))[:, :n]
        ys = np.tile(lb.int_to_limbs_batch([p[1] for p in base]),
                     (1, (n + len(base) - 1) // len(base)))[:, :n]
        points = pt.Point(jnp.asarray(xs), jnp.asarray(ys),
                          jnp.asarray(np.broadcast_to(
                              lb.int_to_limbs(1)[:, None], (16, n)).copy()))

        # None = auto-select: fused w=4 bucket accumulation on TPU, else
        # sort+scan (w=8 large / w=4 small).
        window_bits = (int(os.environ["MSM_WINDOW_BITS"])
                       if "MSM_WINDOW_BITS" in os.environ else None)
        f = jax.jit(lambda k, p: msm.multi_scalar_mult(k, p, window_bits))
        t = time.time()
        out = f(scalars, points)
        _ = np.asarray(out.x[:1])
        compile_and_run = time.time() - t
        best = float("inf")
        for _ in range(2):
            t = time.time()
            out = f(scalars, points)
            _ = np.asarray(out.x[:1])
            best = min(best, time.time() - t)
        print(json.dumps({
            "metric": f"pippenger_msm_points_per_s_2e{log2n}",
            "value": round(n / best, 1),
            "unit": "points/s",
            "n": n,
            "window_bits": window_bits,
            "warm_s": round(best, 3),
            "first_s": round(compile_and_run, 1),
        }), flush=True)


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [16, 18, 20]
    main(sizes)
