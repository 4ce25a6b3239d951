"""Stage breakdown of one Pippenger window at a given size (default 2^20).

Separates the data-movement stages (argsort, gather-by-order) from the
point-add stages (segmented scan, bucket scatter, weighted sum) so kernel
work can be aimed at the real bottleneck.

Usage: python tools/bench_msm_parts.py [log2_n]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(log2n: int):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from secp256k1_tpu.ops import limbs as lb
    from secp256k1_tpu.ops import msm
    from secp256k1_tpu.utils import hostcurve as hc
    from secp256k1_tpu.ops import point as pt

    n = 1 << log2n
    rng = np.random.default_rng(7)
    digits = jnp.asarray(rng.integers(0, 256, size=(n,)).astype(np.uint32))
    base = [hc.mul(i % 509 + 1, hc.G) for i in range(min(n, 509))]
    xs = np.tile(lb.int_to_limbs_batch([p[0] for p in base]),
                 (1, (n + len(base) - 1) // len(base)))[:, :n]
    ys = np.tile(lb.int_to_limbs_batch([p[1] for p in base]),
                 (1, (n + len(base) - 1) // len(base)))[:, :n]
    ones = np.broadcast_to(lb.int_to_limbs(1)[:, None], (16, n)).copy()
    planes = jnp.asarray(np.stack([xs, ys, ones], axis=0))   # [3, 16, N]

    def timed(name, fn, *args):
        f = jax.jit(fn)
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = f(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0].reshape(-1)[:1])
            best = min(best, time.time() - t0)
        print(json.dumps({"stage": name, "ms": round(best * 1e3, 2),
                          "log2n": log2n}), flush=True)
        return out

    order = timed("argsort_digits", jnp.argsort, digits)
    timed("gather_planes_by_order", lambda p, o: p[..., o], planes, order)
    sorted_digits = digits[order]
    prev = jnp.concatenate([sorted_digits[:1] + 1, sorted_digits[:-1]])
    seg = sorted_digits != prev
    sorted_planes = planes[..., order]
    timed("segmented_point_scan",
          msm._segmented_point_scan, seg, sorted_planes)
    timed("bucket_accumulate_full",
          lambda p, d: msm._bucket_accumulate(p, d, 256), planes, digits)
    timed("one_window_total",
          lambda p, d: msm._weighted_bucket_sum(
              msm._bucket_accumulate(p, d, 256)), planes, digits)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
