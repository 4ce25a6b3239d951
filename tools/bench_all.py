"""Extended benchmark sweep: verify / sign / Schnorr verify / ECDH on one
chip, one JSON line per metric (bench.py prints only the headline metric).
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

    lanes = int(os.environ.get("BENCH_LANES", "16384"))
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

    for name, (core, args) in cases.items():
        def chain(n, core=core, nargs=len(args)):
            def f(*a):
                def body(i, carry):
                    acc, a0 = carry
                    out = core(a0, *a[1:])
                    leaf = jax.tree_util.tree_leaves(out)[0]
                    mix = leaf.reshape(-1)[0].astype(jnp.uint32) & jnp.uint32(0)
                    return acc + leaf.reshape(-1)[0].astype(jnp.int32), a0 ^ mix
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


if __name__ == "__main__":
    main()
