"""Stage-level timing of the end-to-end (host-inclusive) ECDSA verify.

Splits `ecdsa.verify_batch_arrays` into its real stages so the e2e gap vs
the device core (`bench.py`) is attributable:

  parse    — native batched strict-DER parse + numpy status masking
  marshal  — numpy byte-plane packing ([n,W] u8 -> [W,S,128] planes)
  transfer — host->device upload of the packed planes (tunnel-bound)
  compute  — `_verify_e2e_core` on device-resident planes
  e2e      — the whole `verify_batch_arrays` call (cross-check)

Run on the TPU chip:  python tools/bench_e2e_parts.py [lanes]
"""

import hashlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _force(x):
    # Tunnel-safe completion: tiny readback (CLAUDE.md).
    np.asarray(x).ravel()[:1]


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from secp256k1_tpu.models import ecdsa, keys
    from secp256k1_tpu.models.rfc6979 import RFC6979SHA256
    from secp256k1_tpu import native
    from secp256k1_tpu.utils import batching as bt
    from secp256k1_tpu.utils import errors as ec
    from secp256k1_tpu.utils import hostcurve as hc

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384

    privs = [keys.PrivateKey(2 + i) for i in range(256)]
    digests = [hashlib.sha256(bytes([i % 256]) * 32).digest()
               for i in range(256)]
    base_sigs = ecdsa.sign_batch(privs, digests, rand=RFC6979SHA256())
    max_len = max(len(s) for s in base_sigs)
    sig_arr = np.zeros((n, max_len), np.uint8)
    len_arr = np.zeros((n,), np.int32)
    pub_arr = np.zeros((n, 33), np.uint8)
    dig_arr = np.zeros((n, 32), np.uint8)
    for i in range(n):
        j = i % 256
        s_b = base_sigs[j]
        sig_arr[i, :len(s_b)] = np.frombuffer(s_b, np.uint8)
        len_arr[i] = len(s_b)
        pub_arr[i] = np.frombuffer(
            hc.encode_point(privs[j].public_key.point, compressed=True),
            np.uint8)
        dig_arr[i] = np.frombuffer(digests[j], np.uint8)

    def best(fn, reps=5):
        out = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            out = min(out, time.perf_counter() - t0)
        return out

    # Full path first (also warms the compile).
    st = ecdsa.verify_batch_arrays(pub_arr, dig_arr, sig_arr, len_arr)
    assert (st == 0).all()
    t_e2e = best(lambda: ecdsa.verify_batch_arrays(pub_arr, dig_arr,
                                                   sig_arr, len_arr))

    # Stage 1: parse + numpy masking (host only).
    def parse():
        r_arr, s_arr, pstat = native.asn1_sig_parse_batch(sig_arr, len_arr)
        host_status = np.where(
            pstat == 0, ec.OK,
            np.where(pstat == 1, ec.ERR_INVALID_ENCODING,
                     ec.ERR_INVALID_SCALAR)).astype(np.int32)
        return r_arr, s_arr, host_status

    t_parse = best(parse)
    r_arr, s_arr, host_status = parse()
    prefix = pub_arr[:, 0]

    # Stage 2: numpy packing to plane layout (host only — pack on host
    # numpy, no device involvement).
    b = bt.bucket(n)
    shp = bt.batch_shape(b)

    def pack_np(arr):
        w = arr.shape[1]
        out = np.zeros((w, b), np.uint8)
        out[:, :n] = arr.T
        return out.reshape((w,) + shp)

    def marshal():
        return (pack_np(pub_arr[:, 1:]), pack_np(dig_arr), pack_np(r_arr),
                pack_np(s_arr))

    t_marshal = best(marshal)
    packs = marshal()
    want_odd_np = np.zeros((b,), np.int32)
    want_odd_np[:n] = (prefix == 0x03).astype(np.int32)
    hs_np = np.full((b,), ec.OK, np.int32)
    hs_np[:n] = host_status
    smalls = (want_odd_np.reshape(shp), hs_np.reshape(shp))

    # Stage 3: transfer (device_put all planes, block).
    def transfer():
        devs = [jax.device_put(p) for p in packs + smalls]
        for d in devs:
            d.block_until_ready()
        _force(devs[0])
        return devs

    t_transfer = best(transfer)
    dev = transfer()
    dpub, ddig, dr, ds, dwo, dhs = dev

    # Stage 4: device compute on resident planes.
    def compute():
        st = ecdsa._verify_e2e_core(dwo != 0, dpub, ddig, dr, ds,
                                    False, dhs)
        _force(st)

    compute()
    t_compute = best(compute)

    bytes_per_lane = (33 + 32 + 32 + 32 + 8)
    print(json.dumps({
        "lanes": n,
        "e2e_ms": round(t_e2e * 1e3, 2),
        "e2e_ops_per_s": round(n / t_e2e, 1),
        "parse_ms": round(t_parse * 1e3, 2),
        "marshal_ms": round(t_marshal * 1e3, 2),
        "transfer_ms": round(t_transfer * 1e3, 2),
        "transfer_MBps": round(n * bytes_per_lane / t_transfer / 1e6, 1),
        "compute_ms": round(t_compute * 1e3, 2),
        "sum_stages_ms": round(
            (t_parse + t_marshal + t_transfer + t_compute) * 1e3, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
