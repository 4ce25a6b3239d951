"""Apples-to-apples sweep of the reference's five headline benchmarks.

The reference publishes exactly five numbers (`/root/reference/README.md:75-79`,
mirrored in BASELINE.md): ScalarMult, ScalarBaseMult,
DoubleScalarMultBasepointVartime, UncompressedBytes, CompressedBytes — all
single-core ns/op on a Ryzen 7 5700G.  This tool measures the batched
TPU equivalent of each row on one chip and prints one JSON line per row with
`vs_baseline` = our per-chip throughput over the reference's 1/ns figure.

Methodology matches bench.py / tools/bench_all.py: slope method over two
dependence-chained loop lengths (cancels the ~25 ms tunnel readback and
dispatch latency), loop bodies data-depend on the previous iteration so XLA
cannot hoist them, one tiny readback per measurement.
"""

import hashlib
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

    from secp256k1_tpu.models import keys
    from secp256k1_tpu.ops import glv
    from secp256k1_tpu.ops import point as pt
    from secp256k1_tpu.ops import s11n
    from secp256k1_tpu.ops import table as tbl
    from secp256k1_tpu.utils import batching as bt

    lanes = int(os.environ.get("BENCH_LANES", "16384"))
    b = bt.bucket(lanes)

    def plane(v):
        return bt.plane([v] * 4, b, fill=v)

    priv = keys.PrivateKey(0x1234567890ABCDEF1234567890ABCDEF)
    qx_i, qy_i = priv.public_key.point
    k_i = int.from_bytes(hashlib.sha256(b"headline").digest(), "big") % keys.N

    k = plane(k_i)
    qx, qy = plane(qx_i), plane(qy_i)
    one = plane(1)

    # Each case: (name, reference ns/op from BASELINE.md, core fn).  Every
    # core takes the mutable u32 plane as its FIRST argument so the chain
    # harness can feed the previous iteration's digest back into it
    # (flipping bit 0 of limb 0 of a canonical scalar/coordinate keeps it
    # canonical: the chosen constants are far from N/p).
    def scalar_mult_core(kk):
        p = glv.scalar_mult(kk, pt.Point(qx, qy, one))
        return p.x

    def base_mult_core(kk):
        p = tbl.scalar_base_mult(kk)
        return p.x

    def dsmb_core(kk):
        p = glv.double_scalar_mult_basepoint(kk, kk, pt.Point(qx, qy, one))
        return p.x

    def uncompressed_core(xx):
        out, _ = s11n.uncompressed_bytes(pt.Point(xx, qy, one))
        return out

    def compressed_core(xx):
        out, _ = s11n.compressed_bytes(pt.Point(xx, qy, one))
        return out

    # Chain lengths per case: the slope (n_hi - n_lo loop bodies) must be
    # long enough that the measured delta clears the ~ms tunnel jitter —
    # the byte codecs are ~25x cheaper per lane than the multiplies, so
    # they need proportionally longer chains.
    cases = [
        ("scalar_mult", 64955, scalar_mult_core, k, 1, 3),
        ("scalar_base_mult", 24230, base_mult_core, k, 1, 3),
        ("double_scalar_mult_basepoint", 78549, dsmb_core, k, 1, 3),
        ("uncompressed_bytes", 5517, uncompressed_core, qx, 4, 64),
        ("compressed_bytes", 5520, compressed_core, qx, 4, 64),
    ]

    only = os.environ.get("BENCH_CASES")
    if only:
        wanted = set(only.split(","))
        cases = [c for c in cases if c[0] in wanted]

    for name, ref_ns, core, arg0, n_lo, n_hi in cases:
        def chain(n, core=core):
            def f(a0):
                def body(i, carry):
                    acc, a = carry
                    out = core(a)
                    mix = jnp.sum(out.astype(jnp.int32)).astype(jnp.uint32)
                    return (acc + mix.astype(jnp.int32),
                            a0.at[0].set(a0[0] ^ (mix & 1)))
                acc, _ = lax.fori_loop(0, n, body, (jnp.int32(0), a0))
                return acc
            return jax.jit(f)

        f1, f3 = chain(n_lo), chain(n_hi)
        _ = np.asarray(f1(arg0))
        _ = np.asarray(f3(arg0))

        def t(fn, arg0=arg0):
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                _ = np.asarray(fn(arg0))
                best = min(best, time.time() - t0)
            return best

        per = max((t(f3) - t(f1)) / (n_hi - n_lo), 1e-9)
        ops = b / per
        ref_ops = 1e9 / ref_ns
        print(json.dumps({
            "metric": f"{name}_ops_per_s_per_chip",
            "value": round(ops, 1),
            "unit": "ops/s",
            "lanes": b,
            "ns_per_op_ref": ref_ns,
            "ns_per_lane": round(per / b * 1e9, 2),
            "vs_baseline": round(ops / ref_ops, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
