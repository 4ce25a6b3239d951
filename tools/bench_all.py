"""Extended benchmark sweep on one chip, one JSON line per metric.

Device-core metrics (slope method, dependence-chained so XLA cannot hoist
the body) plus honest END-TO-END metrics: distinct signatures, host codec
work included (batched C++ ASN.1 parse / tagged hashes), wall-clock from
raw bytes in to status out.  Finishes with a roofline report for the fused
point-add kernel (utils/profiling.py).
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
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from secp256k1_tpu.models import codecs, ecdsa, keys, schnorr
    from secp256k1_tpu.models.ecdsa import _sign_core, _verify_core
    from secp256k1_tpu.models.schnorr import _schnorr_verify_core
    from secp256k1_tpu.models.ecdh import _ecdh_core
    from secp256k1_tpu.models.rfc6979 import RFC6979SHA256
    from secp256k1_tpu.utils import batching as bt
    from secp256k1_tpu.utils import profiling

    # 64k lanes: the measured throughput sweet spot (16k pays ~2 ms of fixed
    # dispatch/readback latency against ~18 ms of work; 128k regresses).
    lanes = int(os.environ.get("BENCH_LANES", "65536"))
    b = bt.bucket(lanes)

    priv = keys.PrivateKey(0x1234567890ABCDEF1234567890ABCDEF)
    digest = hashlib.sha256(b"bench").digest()
    sig = ecdsa.sign(priv, digest, rand=RFC6979SHA256())
    r_i, s_i = codecs.parse_asn1_signature(sig)
    e_i = ecdsa.hash_to_scalar_int(digest)
    spriv = schnorr.SchnorrPrivateKey.from_ecdsa(priv)
    msg = b"schnorr bench"
    ssig = schnorr.sign(spriv, msg)
    sr = int.from_bytes(ssig[:32], "big")
    ss = int.from_bytes(ssig[32:], "big")
    se = int.from_bytes(schnorr.tagged_hash(
        schnorr.TAG_CHALLENGE, ssig[:32], spriv.public_key.bytes(), msg),
        "big") % keys.N

    def plane(v):
        return bt.plane([v] * 4, b, fill=v)

    qx = plane(priv.public_key.point[0])
    qy = plane(priv.public_key.point[1])
    spx = plane(spriv.public_key.point[0])
    spy = plane(spriv.public_key.point[1])

    cases = {
        "ecdsa_verify": (_verify_core.__wrapped__,
                         (qx, qy, plane(e_i), plane(r_i), plane(s_i))),
        "ecdsa_sign_core": (_sign_core.__wrapped__,
                            (plane(7), plane(e_i), plane(priv.scalar))),
        "schnorr_verify": (_schnorr_verify_core.__wrapped__,
                           (spx, spy, plane(ss), plane((keys.N - se) % keys.N),
                            plane(sr))),
        "ecdh": (_ecdh_core.__wrapped__,
                 (plane(priv.scalar), qx, qy)),
    }

    point_add_per = None
    for name, (core, args) in cases.items():
        def chain(n, core=core):
            def f(*a):
                def body(i, carry):
                    acc, a0 = carry
                    out = core(a0, *a[1:])
                    leaf = jax.tree_util.tree_leaves(out)[0]
                    # Genuine loop-carried dependence: the (runtime-zero-ish)
                    # status/output sum feeds the next iteration's first arg,
                    # opaque to XLA so the body cannot be hoisted.
                    mix = jnp.sum(leaf.astype(jnp.int32)).astype(jnp.uint32)
                    return acc + mix.astype(jnp.int32), a0 ^ (mix & 1)
                acc, _ = lax.fori_loop(0, n, body, (jnp.int32(0), a[0]))
                return acc
            return jax.jit(f)

        f1, f3 = chain(1), chain(3)
        _ = np.asarray(f1(*args))
        _ = np.asarray(f3(*args))

        def t(fn):
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                _ = np.asarray(fn(*args))
                best = min(best, time.time() - t0)
            return best

        per = max((t(f3) - t(f1)) / 2, 1e-9)
        print(json.dumps({
            "metric": f"{name}_ops_per_s_per_chip",
            "value": round(b / per, 1),
            "unit": "ops/s",
            "lanes": b,
        }), flush=True)

    # ------------------------------------------------------------------
    # End-to-end (host-inclusive) verify with DISTINCT signatures.
    # ------------------------------------------------------------------
    # 64k lanes: measured 315k/s vs 176k/s at 16k — the per-dispatch tunnel
    # latency and fixed host costs amortize with batch size (chunked
    # pipelining measured SLOWER: dispatches serialize through the tunnel).
    n_e2e = int(os.environ.get("BENCH_E2E_LANES", "65536"))
    msgs = np.frombuffer(os.urandom(32 * n_e2e), np.uint8).reshape(n_e2e, 32)
    privs = [keys.PrivateKey(2 + i) for i in range(256)]
    digests = [hashlib.sha256(msgs[i % 256].tobytes()).digest()
               for i in range(256)]
    base_sigs = ecdsa.sign_batch(privs, digests, rand=RFC6979SHA256())
    # Tile the 256 distinct (pub, digest, sig) rows to n_e2e lanes: inputs
    # vary per lane; everything is re-parsed and re-verified per call.
    max_len = max(len(s) for s in base_sigs)
    sig_arr = np.zeros((n_e2e, max_len), np.uint8)
    len_arr = np.zeros((n_e2e,), np.int32)
    pub_arr = np.zeros((n_e2e, 33), np.uint8)
    dig_arr = np.zeros((n_e2e, 32), np.uint8)
    from secp256k1_tpu.utils import hostcurve as hc
    for i in range(n_e2e):
        j = i % 256
        s_b = base_sigs[j]
        sig_arr[i, :len(s_b)] = np.frombuffer(s_b, np.uint8)
        len_arr[i] = len(s_b)
        pub_arr[i] = np.frombuffer(
            hc.encode_point(privs[j].public_key.point, compressed=True),
            np.uint8)
        dig_arr[i] = np.frombuffer(digests[j], np.uint8)

    st = ecdsa.verify_batch_arrays(pub_arr, dig_arr, sig_arr, len_arr)
    assert (st == 0).all(), "e2e verify setup failed"
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        st = ecdsa.verify_batch_arrays(pub_arr, dig_arr, sig_arr, len_arr)
        best = min(best, time.time() - t0)
    assert (st == 0).all()
    print(json.dumps({
        "metric": "end_to_end_ecdsa_verify_ops_per_s",
        "value": round(n_e2e / best, 1),
        "unit": "ops/s", "lanes": n_e2e,
        "note": "256 distinct sigs tiled; host ASN.1 parse + device verify",
    }), flush=True)

    # Schnorr end-to-end (distinct messages, native tagged-hash batch).
    smsgs = [msgs[i % 256].tobytes() for i in range(256)]
    sprivs = [schnorr.SchnorrPrivateKey(2 + i) for i in range(256)]
    ssigs = schnorr.sign_batch(sprivs, smsgs)
    spub_arr = np.zeros((n_e2e, 32), np.uint8)
    ssig_arr = np.zeros((n_e2e, 64), np.uint8)
    smsg_arr = np.zeros((n_e2e, 32), np.uint8)
    for i in range(n_e2e):
        j = i % 256
        spub_arr[i] = np.frombuffer(sprivs[j].public_key.bytes(), np.uint8)
        ssig_arr[i] = np.frombuffer(ssigs[j], np.uint8)
        smsg_arr[i] = np.frombuffer(smsgs[j], np.uint8)
    ok = schnorr.verify_batch_arrays(spub_arr, smsg_arr, ssig_arr)
    assert ok.all(), "schnorr e2e setup failed"
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        ok = schnorr.verify_batch_arrays(spub_arr, smsg_arr, ssig_arr)
        best = min(best, time.time() - t0)
    print(json.dumps({
        "metric": "end_to_end_schnorr_verify_ops_per_s",
        "value": round(n_e2e / best, 1),
        "unit": "ops/s", "lanes": n_e2e,
    }), flush=True)

    # ------------------------------------------------------------------
    # Roofline: fused point-add kernel vs compute/memory bounds.
    # ------------------------------------------------------------------
    from secp256k1_tpu.ops import point as pt
    gx, gy = plane(hc.GX), plane(hc.GY)
    one = plane(1)

    def step(x, y):
        p = pt.add(pt.Point(x, gy, one), pt.Point(gx, gy, one))
        return p.x

    def chain2(n):
        @jax.jit
        def f(x, y):
            return lax.fori_loop(0, n, lambda _, v: step(v, y), x)
        return f
    f1, f3 = chain2(2), chain2(8)
    _ = np.asarray(f1(gx, gy)[0].reshape(-1)[:1])
    _ = np.asarray(f3(gx, gy)[0].reshape(-1)[:1])

    def t2(fn):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            _ = np.asarray(fn(gx, gy)[0].reshape(-1)[:1])
            best = min(best, time.time() - t0)
        return best
    per_add = max((t2(f3) - t2(f1)) / 6, 1e-9)
    print(json.dumps(profiling.roofline_report(b, per_add, "point_add")),
          flush=True)


if __name__ == "__main__":
    main()
