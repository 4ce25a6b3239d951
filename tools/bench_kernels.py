"""A/B microbenchmarks of the fused Pallas field kernels on the real chip.

Times dependent chains (x <- op(x, b)) so XLA cannot hoist the body; slope
method over two chain lengths cancels the tunnel dispatch/readback constant
(CLAUDE.md timing discipline).  Reports ns/lane for:
  - mod_mul / mod_square, u32-schoolbook vs f32-FMA variants
  - fused mod_pow2k(16) vs 16 chained mod_square launches
plus a VPU-roofline estimate for the f32 multiply.

Usage: python tools/bench_kernels.py [both|u32|f32]
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

    from secp256k1_tpu.ops.pallas import kernels as pk

    s = int(os.environ.get("BENCH_S", "512"))
    lanes = s * 128
    rng = np.random.default_rng(7)

    def mk():
        x = rng.integers(0, 1 << 16, size=(16, s, 128)).astype(np.uint32)
        x[15] &= 0x7FFF  # < p, canonical enough for timing
        return jnp.asarray(x)

    a, b = mk(), mk()

    def readback(x):
        # Force completion through the tunnel with a 4-byte transfer.
        return np.asarray(x[0, 0, :1])

    def time_chain(step, n1=4, n2=16):
        def chain(n):
            @jax.jit
            def f(x, y):
                return lax.fori_loop(0, n, lambda _, v: step(v, y), x)
            return f

        f1, f2 = chain(n1), chain(n2)
        readback(f1(a, b))
        readback(f2(a, b))

        def t(fn):
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                readback(fn(a, b))
                best = min(best, time.time() - t0)
            return best

        return max((t(f2) - t(f1)) / (n2 - n1), 1e-12)

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    variants = {"both": (False, True), "u32": (False,), "f32": (True,)}[which]

    for f32 in variants:
        pk.set_f32(f32)
        tag = "f32" if f32 else "u32"
        per_mul = time_chain(lambda v, y: pk.mod_mul(v, y, pk.P))
        print(json.dumps({"metric": f"mod_mul_{tag}_ns_per_lane",
                          "value": round(per_mul / lanes * 1e9, 3),
                          "lanes": lanes}), flush=True)
        per_sqr = time_chain(lambda v, y: pk.mod_square(v, pk.P))
        print(json.dumps({"metric": f"mod_square_{tag}_ns_per_lane",
                          "value": round(per_sqr / lanes * 1e9, 3),
                          "lanes": lanes}), flush=True)
        per_p16 = time_chain(lambda v, y: pk.mod_pow2k(v, 16, pk.P),
                             n1=1, n2=4)
        print(json.dumps({"metric": f"pow2k16_{tag}_ns_per_lane_per_sqr",
                          "value": round(per_p16 / 16 / lanes * 1e9, 3),
                          "lanes": lanes}), flush=True)

        # Roofline: FMAs per lane per modmul (schoolbook core only).
        fmas = 1024 if f32 else 256 * 4  # u32 mul ~ 4 internal ops (est.)
        vpu_flops = 0.94e9 * 8 * 128 * 4  # clock * vregs * est. ALUs
        bound = lanes * fmas / vpu_flops
        print(json.dumps({"metric": f"mod_mul_{tag}_x_off_fma_bound",
                          "value": round(per_mul / bound, 2)}), flush=True)


if __name__ == "__main__":
    main()
