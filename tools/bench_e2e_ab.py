"""A/B the end-to-end arrays verify: total lanes x chunk_lanes grid.

Each cell times `ecdsa.verify_batch_arrays` (host parse + upload + device
verify + status readback) with distinct tiled signatures.  Chunked runs
overlap chunk i+1 upload with chunk i compute.

Run on the TPU chip:  python tools/bench_e2e_ab.py
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

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from secp256k1_tpu.models import ecdsa, keys
    from secp256k1_tpu.models.rfc6979 import RFC6979SHA256
    from secp256k1_tpu.utils import hostcurve as hc

    n_max = 65536
    privs = [keys.PrivateKey(2 + i) for i in range(256)]
    digests = [hashlib.sha256(bytes([i % 256]) * 32).digest()
               for i in range(256)]
    base_sigs = ecdsa.sign_batch(privs, digests, rand=RFC6979SHA256())
    max_len = max(len(s) for s in base_sigs)
    sig_arr = np.zeros((n_max, max_len), np.uint8)
    len_arr = np.zeros((n_max,), np.int32)
    pub_arr = np.zeros((n_max, 33), np.uint8)
    dig_arr = np.zeros((n_max, 32), np.uint8)
    for i in range(n_max):
        j = i % 256
        s_b = base_sigs[j]
        sig_arr[i, :len(s_b)] = np.frombuffer(s_b, np.uint8)
        len_arr[i] = len(s_b)
        pub_arr[i] = np.frombuffer(
            hc.encode_point(privs[j].public_key.point, compressed=True),
            np.uint8)
        dig_arr[i] = np.frombuffer(digests[j], np.uint8)

    grid = [(16384, None), (16384, 8192),
            (65536, None), (65536, 8192), (65536, 16384)]
    for lanes, chunk in grid:
        args = (pub_arr[:lanes], dig_arr[:lanes], sig_arr[:lanes],
                len_arr[:lanes])
        st = ecdsa.verify_batch_arrays(*args, chunk_lanes=chunk)  # warm
        assert (st == 0).all()
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            st = ecdsa.verify_batch_arrays(*args, chunk_lanes=chunk)
            best = min(best, time.perf_counter() - t0)
        assert (st == 0).all()
        print(json.dumps({
            "lanes": lanes, "chunk": chunk,
            "ms": round(best * 1e3, 2),
            "ops_per_s": round(lanes / best, 1),
        }), flush=True)

    # Keyed mode: 256 distinct signers reused across the batch (256
    # sigs/key at 64k lanes) — the device-resident pubkey cache drops the
    # 33-byte key from the per-lane transfer (VERDICT r4 #7).
    cache = ecdsa.PubkeyCache([p.public_key for p in privs])
    idx_arr = (np.arange(n_max, dtype=np.int32) % 256)
    for lanes, chunk in grid:
        args = (cache, idx_arr[:lanes], dig_arr[:lanes], sig_arr[:lanes],
                len_arr[:lanes])
        st = ecdsa.verify_batch_arrays_keyed(*args, chunk_lanes=chunk)
        assert (st == 0).all()
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            st = ecdsa.verify_batch_arrays_keyed(*args, chunk_lanes=chunk)
            best = min(best, time.perf_counter() - t0)
        assert (st == 0).all()
        print(json.dumps({
            "mode": "keyed", "lanes": lanes, "chunk": chunk,
            "ms": round(best * 1e3, 2),
            "ops_per_s": round(lanes / best, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
