"""Benchmark: batched ECDSA verify throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's single-core `DoubleScalarMultBasepointVartime`
(ECDSA-verify core) at 78,549 ns/op => 12,731 verifies/s
(`/root/repo/BASELINE.md`).

Timing notes for the tunneled TPU ("axon"): dispatch is async and
block_until_ready is unreliable through the tunnel, so completion is forced
by a small readback, and the constant tunnel overhead is cancelled by timing
two different chain lengths (slope method).
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from secp256k1_tpu.models.ecdsa import _verify_core
    from secp256k1_tpu.utils import batching as bt
    from secp256k1_tpu.utils import hostcurve as hc
    from secp256k1_tpu.models import ecdsa, keys, codecs
    from secp256k1_tpu.models.rfc6979 import RFC6979SHA256
    import hashlib

    lanes = int(os.environ.get("BENCH_LANES", str(65536)))
    b = bt.bucket(lanes)
    shape = bt.batch_shape(b)

    # One real signature replicated across the batch (verification work is
    # input-independent — uniform schedule).
    priv = keys.PrivateKey(0x1234567890ABCDEF1234567890ABCDEF)
    digest = hashlib.sha256(b"bench").digest()
    sig = ecdsa.sign(priv, digest, rand=RFC6979SHA256())
    r_i, s_i = codecs.parse_asn1_signature(sig)
    e_i = ecdsa.hash_to_scalar_int(digest)

    distinct = os.environ.get("BENCH_DISTINCT", "0") != "0"
    if distinct:
        # Distinct (key, digest, signature) per lane, generated on device:
        # random 128-bit d/k/e planes (canonical, nonzero), pubkeys via
        # batched fixed-base mult, signatures via the batched sign core.
        # Timing-invariance check vs the replicated default: uniform
        # schedules mean both must measure the same.
        from secp256k1_tpu.ops import limbs as lb
        from secp256k1_tpu.ops import point as ptm
        from secp256k1_tpu.ops import table as tblm
        from secp256k1_tpu.models.ecdsa import _sign_core
        rng = np.random.default_rng(7)

        def rand128(nonzero=False):
            pl = np.zeros((16,) + shape, dtype=np.uint32)
            pl[:8] = rng.integers(0, 1 << 16, (8,) + shape, dtype=np.uint32)
            if nonzero:
                pl[0] |= 1
            return jnp.asarray(pl)

        d, k, e = rand128(True), rand128(True), rand128()
        pub = ptm.to_affine(tblm.scalar_base_mult(d))
        qx, qy = pub.x, pub.y
        r, s, _, _ = _sign_core(k, e, d)
    else:
        qx = bt.plane([priv.public_key.point[0]] * 4, b,
                      fill=priv.public_key.point[0])
        qy = bt.plane([priv.public_key.point[1]] * 4, b,
                      fill=priv.public_key.point[1])
        e = bt.plane([e_i] * 4, b, fill=e_i)
        r = bt.plane([r_i] * 4, b, fill=r_i)
        s = bt.plane([s_i] * 4, b, fill=s_i)

    core = _verify_core.__wrapped__

    def chain(n_reps):
        # The status sum (0 at runtime for valid sigs) is XORed into the next
        # iteration's hash-scalar so XLA cannot hoist the loop-invariant body.
        def f(qx, qy, e, r, s):
            def body(i, carry):
                acc, e_cur = carry
                st = core(qx, qy, e_cur, r, s)
                ssum = jnp.sum(st)
                e_next = e_cur ^ ssum.astype(jnp.uint32)
                return acc + ssum, e_next
            acc, _ = lax.fori_loop(0, n_reps, body, (jnp.int32(0), e))
            return acc
        return jax.jit(f)

    f1 = chain(1)
    f4 = chain(4)

    # Warm up (compiles both).
    _ = np.asarray(f1(qx, qy, e, r, s))
    _ = np.asarray(f4(qx, qy, e, r, s))

    def timed(f):
        best = float("inf")
        for _ in range(3):
            t = time.time()
            out = f(qx, qy, e, r, s)
            val = np.asarray(out)
            best = min(best, time.time() - t)
        assert int(val) == 0, "verify failed in bench"
        return best

    t1 = timed(f1)
    t4 = timed(f4)
    per_rep = max((t4 - t1) / 3, 1e-9)
    ops_per_s = b / per_rep

    baseline = 1e9 / 78549.0  # reference verify core, ops/s single core
    out = {
        "metric": "batched_ecdsa_verify_ops_per_s_per_chip",
        "value": round(ops_per_s, 1),
        "unit": "verify/s",
        "vs_baseline": round(ops_per_s / baseline, 2),
    }
    if distinct:
        out["inputs"] = "distinct"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
